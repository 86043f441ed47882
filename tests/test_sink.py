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


def test_sketch_table_multi_kind_overwrite_is_dynamic(spark, tmp_path):
    """Writing a second sketch_kind with mode='overwrite' must not destroy
    the first kind's partitions (STATIC overwrite truncates the whole
    path; the writer pins dynamic partition overwrite)."""
    from fastbloom_spark.operators import bloom_agg
    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sketch import HllSketch
    from fastbloom_spark.sources import write_sketch_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "sketches")
    cfg = BloomConfig.with_num_bits(1 << 12, num_hashes=4, seed=1)
    write_sketch_table(bloom_agg(docs, ["lang"], "text", cfg), path,
                       sketch_kind="bloom")
    write_sketch_table(
        sketch_agg(docs, ["lang"], "text", HllSketch(precision=10, seed=1)),
        path, sketch_kind="hll")
    kinds = {r.sketch_kind for r in
             spark.read.parquet(path).select("sketch_kind")
             .distinct().collect()}
    assert kinds == {"bloom", "hll"}


def test_code_table_duplicate_pool_spreads(spark):
    """The shared-content duplicate pool genuinely spans ~64 keys (the
    old pmod-on-masked-bits expression silently collapsed it to 4)."""
    from fastbloom_spark.sources import synth_code_table
    import pyspark.sql.functions as F

    code = synth_code_table(spark, 60_000, num_repos=50, num_partitions=8)
    # duplicate contents = those appearing more than ~5 times
    dup_pool = code.groupBy("content").count().filter("count > 5").count()
    assert dup_pool > 32, dup_pool
