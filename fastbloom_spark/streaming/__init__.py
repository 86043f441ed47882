from .dedup_stream import streaming_bloom_dedup, windowed_distinct_estimate
from .sketch_stream import streaming_sketch_agg
from .window_stream import streaming_windowed_sketch_agg

__all__ = ["streaming_bloom_dedup", "streaming_sketch_agg",
           "streaming_windowed_sketch_agg", "windowed_distinct_estimate"]
