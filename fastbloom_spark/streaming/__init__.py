from .decontam_stream import streaming_contamination_matches
from .dedup_stream import streaming_bloom_dedup, windowed_distinct_estimate
from .index_stream import indexed_ingest_batch_fn, write_stream_indexed
from .sketch_stream import streaming_sketch_agg
from .window_stream import streaming_windowed_sketch_agg

__all__ = ["streaming_bloom_dedup", "streaming_sketch_agg",
           "streaming_windowed_sketch_agg", "windowed_distinct_estimate",
           "indexed_ingest_batch_fn", "write_stream_indexed",
           "streaming_contamination_matches"]
