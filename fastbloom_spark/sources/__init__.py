from .checkpoint import read_checkpoint, resume_bloom_build, write_checkpoint
from .codetable import synth_code_table

__all__ = [
    "synth_code_table",
    "write_checkpoint",
    "read_checkpoint",
    "resume_bloom_build",
]
