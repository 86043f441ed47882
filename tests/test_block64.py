"""Register-blocked (block64) layout — the beyond-reference ingest path.

Same correctness contract as flat (zero FN, FPR within ITS published
Poisson-mixture bound, merge associativity, distributed==local parity);
one memory touch per row instead of k.
"""

from __future__ import annotations

import numpy as np
import pytest

from fastbloom_spark import BloomConfig, BloomFilter
from fastbloom_spark.config import expected_false_pos_block64

from .test_local_bloom import false_pos_rate, member_stream, non_member_stream


def test_zero_false_negatives_block64():
    for n in (100, 10_000, 200_000):
        cfg = BloomConfig.block64_from_false_pos(
            0.01, expected_items=n, seed=5)
        f = BloomFilter(cfg)
        members = member_stream(n).view(np.int64)
        f.insert_digests(members)
        assert f.contains_digests(members).all()


@pytest.mark.parametrize("fp", [0.1, 0.01, 0.001])
def test_fpr_within_block_bound(fp):
    n = 50_000
    cfg = BloomConfig.block64_from_false_pos(fp, expected_items=n, seed=11)
    f = BloomFilter(cfg)
    f.insert_digests(member_stream(n).view(np.int64))
    measured = false_pos_rate(f, trials=500_000)
    bound = cfg.expected_false_pos(n)
    assert bound <= fp
    if measured > bound:
        assert (measured - bound) / bound < 1.0, (measured, bound)


def test_block64_sizing_overhead_reasonable():
    """block64 trades bits for speed: more bits than flat, but bounded."""
    n = 1_000_000
    flat = BloomConfig.from_false_pos(0.001, expected_items=n)
    blocked = BloomConfig.block64_from_false_pos(0.001, expected_items=n)
    assert blocked.layout == "block64"
    ratio = blocked.num_bits / flat.num_bits
    assert 1.0 <= ratio < 3.0, ratio


def test_merge_associativity_block64():
    n = 30_000
    cfg = BloomConfig.block64_from_false_pos(0.01, expected_items=n, seed=3)
    data = member_stream(n).view(np.int64)
    whole = BloomFilter(cfg)
    whole.insert_digests(data)
    parts = np.array_split(data, 7)
    import functools

    def build(chunk):
        f = BloomFilter(cfg)
        f.insert_digests(chunk)
        return f

    fwd = functools.reduce(lambda a, b: a.union(b), [build(p) for p in parts])
    rev = functools.reduce(lambda a, b: a.union(b),
                           [build(p) for p in reversed(parts)])
    assert np.array_equal(fwd.words, whole.words)
    assert np.array_equal(rev.words, whole.words)


def test_layout_mismatch_rejected():
    a = BloomFilter(BloomConfig(4096, 5, seed=1, layout="flat"))
    b = BloomFilter(BloomConfig(4096, 5, seed=1, layout="block64"))
    with pytest.raises(ValueError):
        a.union(b)
    with pytest.raises(ValueError):
        BloomConfig(4096, 5, layout="bogus")


def test_poisson_bound_sanity():
    # more bits -> lower bound; more items -> higher bound
    assert expected_false_pos_block64(8, 1 << 22, 100_000) < \
        expected_false_pos_block64(8, 1 << 20, 100_000)
    assert expected_false_pos_block64(8, 1 << 20, 200_000) > \
        expected_false_pos_block64(8, 1 << 20, 100_000)
    # degenerate empty filter: bound ~ 0
    assert expected_false_pos_block64(8, 1 << 20, 0) == 0.0


def test_distributed_block64_equals_local(spark, sf_dir):
    from fastbloom_spark.kernel import digest64_bytes
    from fastbloom_spark.operators import bloom_build, bloom_contains_col
    from fastbloom_spark.functions import digest64
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    cfg = BloomConfig.block64_from_false_pos(
        0.001, expected_items=len(texts), seed=42)
    local = BloomFilter(cfg)
    local.insert_digests(np.array(
        [digest64_bytes(t.encode()) for t in texts], dtype=np.int64))
    dist = bloom_build(docs.repartition(6), "text", cfg)
    assert np.array_equal(dist.words, local.words)
    # zero FN through the Spark probe
    n_true = docs.select(digest64("text").alias("d")) \
        .filter(bloom_contains_col(spark, dist, "d")).count()
    assert n_true == len(texts)


def test_block64_sketch_rows_hydrate_correctly(spark, sf_dir):
    """bloom_agg sketch rows carry the layout: hydrating a block64 grouped
    sketch probes correctly (regression for layout-less sketch rows)."""
    from fastbloom_spark.operators import bloom_agg, sketch_row_to_filter
    from fastbloom_spark.kernel import digest64_bytes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = BloomConfig(num_bits=1 << 15, num_hashes=6, seed=42,
                      layout="block64")
    rows = bloom_agg(docs, ["lang"], "text", cfg).collect()
    texts_by_lang = {}
    for r in docs.select("lang", "text").collect():
        texts_by_lang.setdefault(r.lang, []).append(r.text)
    for r in rows:
        f = sketch_row_to_filter(r)
        assert f.config.layout == "block64"
        digests = np.array([digest64_bytes(t.encode())
                            for t in texts_by_lang[r.lang]], dtype=np.int64)
        assert f.contains_digests(digests).all(), r.lang


def test_block64_bytes_roundtrip():
    cfg = BloomConfig(num_bits=1 << 13, num_hashes=6, seed=9,
                      layout="block64")
    f = BloomFilter(cfg)
    data = member_stream(2000).view(np.int64)
    f.insert_digests(data)
    g = BloomFilter.from_bytes(f.to_bytes(), num_hashes=6, seed=9,
                               layout="block64")
    assert g.config.layout == "block64"
    assert np.array_equal(g.words, f.words)
    assert g.contains_digests(data).all()


def test_block64_xxh64_combination_distributed_equals_local(spark, sf_dir):
    """Orthogonal variants compose: block64 layout x xxh64 digest is
    bitwise distributed==local with zero FN (each variant rides a separate
    code path; the combination is what a layout-plumbing bug would break)."""
    import numpy as np

    from fastbloom_spark import BloomConfig, BloomFilter
    from fastbloom_spark.kernel import digest64_bytes
    from fastbloom_spark.operators import bloom_build

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = BloomConfig(num_bits=1 << 14, num_hashes=6, seed=11,
                      layout="block64", digest="xxh64")
    dist = bloom_build(docs.repartition(5), "text", cfg)

    local = BloomFilter(cfg)
    digests = np.array(
        [digest64_bytes(r.text.encode("utf-8"), "xxh64")
         for r in docs.select("text").collect()], dtype=np.int64)
    local.insert_digests(digests)
    assert np.array_equal(dist.words, local.words)
    assert local.contains_digests(digests).all()
