"""Iceberg-style partitioned layout: bucketed corpus + sketch tables."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fastbloom_spark import BloomConfig
from fastbloom_spark.operators import bloom_agg, sketch_row_to_filter
from fastbloom_spark.sources import (
    read_code_table,
    read_repo,
    synth_code_table,
    write_code_table,
    write_sketch_table,
)


def test_bucketed_corpus_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "corpus")
    code = synth_code_table(spark, 5000, num_repos=40, num_partitions=8)
    write_code_table(code, path, num_buckets=16)

    back = read_code_table(spark, path)
    assert back.count() == 5000
    assert "repo_bucket" in back.columns
    # layout sanity: <= 16 bucket directories, not one per repo
    import os
    dirs = [d for d in os.listdir(path) if d.startswith("repo_bucket=")]
    assert 0 < len(dirs) <= 16

    # single-repo read prunes partitions and matches a full-scan filter
    one = read_repo(spark, path, "repo-00000", num_buckets=16)
    full = back.filter(F.col("repo") == "repo-00000")
    assert one.count() == full.count() > 0
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "repo_bucket" in plan


def test_sketch_table_roundtrip(spark, tmp_path):
    path = str(tmp_path / "sketches")
    code = synth_code_table(spark, 2000, num_repos=10, num_partitions=4)
    cfg = BloomConfig.with_num_bits(1 << 12, num_hashes=4, seed=5)
    sketches = bloom_agg(code, ["lang"], "content", cfg)
    write_sketch_table(sketches, path, sketch_kind="bloom", group_col="lang")

    back = spark.read.parquet(path)
    assert back.count() == sketches.count()
    orig = {r.lang: sketch_row_to_filter(r) for r in sketches.collect()}
    for r in back.collect():
        assert np.array_equal(sketch_row_to_filter(r).words,
                              orig[r.lang].words)
