from .cms import CountMinSketch
from .hll import HllSketch
from .kll import KllSketch
from .tdigest import TDigestSketch
from .theta import ThetaSketch

__all__ = ["HllSketch", "CountMinSketch", "TDigestSketch", "KllSketch",
           "ThetaSketch"]
