"""fastbloom_spark — PySpark-native distributed sketch / approximate-aggregation
library with the capabilities of tomtomwombat/fastbloom, grown to cluster scale.

Built from scratch Spark-first (NOT a port): sketches are mergeable aggregators
over DataFrames — per-partition numpy builds inside Arrow-vectorized pandas
UDFs, associative word-wise merges, broadcast probes registered for SQL.
"""

from .config import (
    BloomConfig,
    expected_density,
    expected_false_pos,
    optimal_hashes,
    optimal_size,
)
from .local import BloomFilter

__version__ = "0.1.0"

__all__ = [
    "BloomConfig",
    "BloomFilter",
    "optimal_hashes",
    "optimal_size",
    "expected_density",
    "expected_false_pos",
]
