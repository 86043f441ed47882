from .dedup_stream import streaming_bloom_dedup, windowed_distinct_estimate

__all__ = ["streaming_bloom_dedup", "windowed_distinct_estimate"]
