from .checkpoint import (read_checkpoint, resume_bloom_agg,
                         resume_bloom_build, write_checkpoint)
from .codetable import synth_code_table
from .index import (
    PruneStats,
    append_to_indexed_table,
    compact_indexed_table,
    describe_index,
    index_filter,
    index_parquet_files,
    prune_index,
    pruned_range_read,
    pruned_read,
    pruned_read_files,
    pruned_semi_join,
    write_indexed_table,
)
from .sink import (
    read_code_table,
    read_repo,
    repo_bucket_col,
    write_code_table,
    write_sketch_table,
)

__all__ = [
    "synth_code_table",
    "write_checkpoint",
    "read_checkpoint",
    "resume_bloom_agg",
    "resume_bloom_build",
    "write_code_table",
    "read_code_table",
    "read_repo",
    "repo_bucket_col",
    "write_sketch_table",
    "PruneStats",
    "append_to_indexed_table",
    "compact_indexed_table",
    "describe_index",
    "index_filter",
    "write_indexed_table",
    "index_parquet_files",
    "prune_index",
    "pruned_range_read",
    "pruned_read",
    "pruned_semi_join",
    "pruned_read_files",
]
