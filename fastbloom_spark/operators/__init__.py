from .bloom import (
    bloom_agg,
    bloom_build,
    bloom_contains_col,
    bloom_merge,
    bloom_merge_sharded,
    bloom_partials,
    bloom_partials_sharded,
    bloom_semi_join,
    register_bloom_sql,
    sketch_row_to_filter,
)

__all__ = [
    "bloom_agg",
    "bloom_build",
    "bloom_contains_col",
    "bloom_merge",
    "bloom_merge_sharded",
    "bloom_partials",
    "bloom_partials_sharded",
    "bloom_semi_join",
    "register_bloom_sql",
    "sketch_row_to_filter",
]
