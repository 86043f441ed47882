"""Distributed sketch aggregation: HLL / CMS / t-digest / KLL on Spark,
checked against exact Spark/DataFrame oracles and error bounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.sketch_agg import (
    sketch_agg,
    sketch_build,
    sketch_partials,
    sketch_merge,
)
from fastbloom_spark.sketch import (
    CountMinSketch,
    HllSketch,
    KllSketch,
    TDigestSketch,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def test_hll_global_vs_exact(spark, events):
    impl = HllSketch(precision=12, seed=42)
    state, rows = sketch_build(
        events, F.col("user_id").cast("string"), impl)
    exact = events.select("user_id").distinct().count()
    assert rows == events.count()
    est = impl.estimate(state)
    assert abs(est - exact) / exact < 4 * impl.relative_error(), (est, exact)


def test_hll_grouped_vs_exact(spark, events):
    impl = HllSketch(precision=12, seed=42)
    got = sketch_agg(events, ["event_type"],
                     F.col("user_id").cast("string"), impl).collect()
    exact = {r.event_type: r.n for r in events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    assert {r.event_type for r in got} == set(exact)
    for r in got:
        est = impl.estimate(impl.deserialize(bytes(r.sketch)))
        e = exact[r.event_type]
        assert abs(est - e) / e < 5 * impl.relative_error(), (r.event_type,)


def test_hll_state_partition_invariant(spark, events):
    """HLL register-max merge is bitwise order-invariant (like Bloom OR)."""
    impl = HllSketch(precision=11, seed=7)
    col = F.col("user_id").cast("string")
    s1, _ = sketch_build(events.repartition(2), col, impl)
    s2, _ = sketch_build(events.repartition(13), col, impl)
    assert np.array_equal(s1, s2)


def test_cms_grouped_counts_vs_exact(spark, events):
    """CMS point queries per event_type: never under, within bound over."""
    impl = CountMinSketch(depth=5, log2_width=14, seed=42)
    state, total = sketch_build(events, "event_type", impl)
    exact = {r.event_type: r.n for r in events.groupBy("event_type").agg(
        F.count("*").alias("n")).collect()}
    types = sorted(exact)
    from fastbloom_spark.kernel import digest64_bytes
    digests = np.array([digest64_bytes(t.encode()) for t in types],
                       dtype=np.int64)
    est = impl.query(state, digests)
    for t, e in zip(types, est.tolist()):
        assert e >= exact[t]
        assert e - exact[t] <= max(impl.error_bound(total), 1)


def test_cms_state_partition_invariant(spark, events):
    impl = CountMinSketch(depth=4, log2_width=12, seed=3)
    s1, _ = sketch_build(events.repartition(3), "event_type", impl)
    s2, _ = sketch_build(events.repartition(11), "event_type", impl)
    assert np.array_equal(s1, s2)  # integer addition: exact, order-free


@pytest.mark.parametrize("impl_factory", [
    lambda: TDigestSketch(delta=200),
    lambda: KllSketch(k=200, seed=42),
], ids=["tdigest", "kll"])
def test_quantile_sketches_vs_exact(spark, customer, impl_factory):
    impl = impl_factory()
    state, rows = sketch_build(customer, "c_acctbal", impl)
    n = customer.count()
    assert rows == n
    vals = np.sort(np.array(
        [r.c_acctbal for r in customer.select("c_acctbal").collect()]))
    for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
        est = impl.quantile(state, q)
        rank = np.searchsorted(vals, est) / n
        assert abs(rank - q) < 0.025, (impl.name, q, rank)


def test_quantile_sketch_grouped(spark, customer):
    impl = TDigestSketch(delta=200)
    got = sketch_agg(customer, ["c_mktsegment"], "c_acctbal", impl).collect()
    by_seg = {}
    for r in customer.select("c_mktsegment", "c_acctbal").collect():
        by_seg.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    for r in got:
        st = impl.deserialize(bytes(r.sketch))
        vals = np.sort(np.array(by_seg[r.c_mktsegment]))
        est = impl.quantile(st, 0.5)
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - 0.5) < 0.05, r.c_mktsegment


def test_partials_then_merge_explicit(spark, events):
    """The two stages compose: partial rows per partition, merge reduces to
    one row with all input accounted."""
    impl = HllSketch(precision=10, seed=1)
    parts = sketch_partials(events.repartition(5),
                            F.col("user_id").cast("string"), impl)
    assert parts.count() == 5
    merged = sketch_merge(parts, impl).collect()
    assert len(merged) == 1
    assert merged[0].rows_seen == events.count()


def test_sparse_partials_shrink_shuffle_bytes(spark):
    """VERDICT r04 #6: high-group-count map-side aggs shuffle zlib-sparse
    partial states (KBs), not 2^p dense bytes per (group, partition) — and
    the merged results are bitwise-identical to the dense single-partition
    fold, with final rows still in the canonical self-describing format."""
    from fastbloom_spark.sketch import CountMinSketch, HllSketch

    df = spark.range(20000).select(
        (F.col("id") % 500).cast("string").alias("k"),
        F.col("id").cast("string").alias("v"))
    for impl in (HllSketch(precision=12, seed=7),
                 CountMinSketch(depth=5, log2_width=12, seed=7)):
        dense_bytes = len(impl.serialize(impl.empty())) + 1  # + tag byte
        parts = sketch_partials(df.repartition(8), "v", impl, ["k"])
        sizes = [len(bytes(r.sketch)) for r in
                 parts.select("sketch").collect()]
        assert sizes and max(sizes) < dense_bytes // 3, (
            impl.name, max(sizes), dense_bytes)
        merged = {r.k: (r.rows_seen, bytes(r.sketch))
                  for r in sketch_merge(parts, impl, ["k"]).collect()}
        single = {r.k: (r.rows_seen, bytes(r.sketch))
                  for r in sketch_agg(df.coalesce(1), ["k"], "v", impl,
                                      strategy="partial").collect()}
        assert merged == single, impl.name
        # final rows stay canonical: the consumer-side from_buffer entry
        # (SQL UDFs, persisted sketch tables) reads them with no envelope
        some = next(iter(merged.values()))[1]
        impl2, state = type(impl).from_buffer(some)
        assert impl.estimate(state) >= 0 if hasattr(impl, "estimate") \
            else state is not None


def test_sketch_agg_shuffle_strategy_matches_partial(spark, events):
    """Shuffle and partial strategies produce identical HLL/CMS states."""
    for impl in (HllSketch(precision=11, seed=4),
                 CountMinSketch(depth=4, log2_width=12, seed=4)):
        a = {r.event_type: (r.rows_seen, bytes(r.sketch))
             for r in sketch_agg(events, ["event_type"],
                                 F.col("user_id").cast("string"), impl,
                                 strategy="partial").collect()}
        b = {r.event_type: (r.rows_seen, bytes(r.sketch))
             for r in sketch_agg(events, ["event_type"],
                                 F.col("user_id").cast("string"), impl,
                                 strategy="shuffle").collect()}
        assert a.keys() == b.keys()
        for key in a:
            assert a[key][0] == b[key][0]
            assert np.array_equal(impl.deserialize(a[key][1]),
                                  impl.deserialize(b[key][1])), (impl.name, key)


def test_sketch_rollup_hll(spark, events):
    """HLL rollup: per-(type, bucket) sketches union exactly to per-type and
    global registers (register max is associative)."""
    from fastbloom_spark.operators.sketch_agg import sketch_rollup

    impl = HllSketch(precision=11, seed=6)
    ev = events.withColumn("bucket", (F.col("user_id") % 3).cast("string"))
    out = sketch_rollup(ev, ["event_type", "bucket"],
                        F.col("user_id").cast("string"), impl).collect()
    levels = {}
    for r in out:
        levels.setdefault(r.rollup_level, []).append(r)
    assert set(levels) == {0, 1, 2}
    assert len(levels[0]) == 1 and levels[0][0].event_type is None

    # level-0 state == direct global build, bitwise
    global_state, _ = sketch_build(ev, F.col("user_id").cast("string"), impl)
    assert np.array_equal(
        impl.deserialize(bytes(levels[0][0].sketch)), global_state)
    # rows_seen conserved at every level
    n = ev.count()
    for lv, rows in levels.items():
        assert sum(r.rows_seen for r in rows) == n, lv
    # per-type estimates at level 1 track exact distincts
    exact = {r.event_type: r.c for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("c")).collect()}
    for r in levels[1]:
        est = impl.estimate(impl.deserialize(bytes(r.sketch)))
        assert abs(est - exact[r.event_type]) / exact[r.event_type] \
            < 5 * impl.relative_error()


def test_quantile_merge_tree_estimates_stable(spark, customer):
    """t-digest/KLL are not bitwise order-invariant (randomized/clustered
    compaction) — but estimates from ANY merge tree stay within bounds."""
    import functools

    vals = np.sort(np.array(
        [r.c_acctbal for r in customer.select("c_acctbal").collect()]))
    n = len(vals)
    rng = np.random.default_rng(13)
    for impl in (TDigestSketch(delta=200), KllSketch(k=200, seed=3)):
        data = np.array(vals)
        for trial in range(3):
            shuffled = data[rng.permutation(n)]
            parts = np.array_split(shuffled, int(rng.integers(2, 9)))
            order = rng.permutation(len(parts))
            states = [impl.update(impl.empty(), parts[i]) for i in order]
            merged = functools.reduce(impl.merge, states)
            for q in (0.1, 0.5, 0.9):
                est = impl.quantile(merged, q)
                rank = np.searchsorted(vals, est) / n
                assert abs(rank - q) < 0.03, (impl.name, trial, q, rank)


def test_salted_sketch_agg_exact_families_bitwise(spark):
    """salt>1 shuffle builds for the exactly-mergeable families (HLL
    register-max, CMS counter-add) byte-equal the unsalted build on a
    skewed corpus; quantile sketches stay within their rank bound."""
    n = 20_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), F.col("id") % 23)).alias("key"),
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 1000).cast("double").alias("x")).repartition(8)

    for impl in (HllSketch(precision=12, seed=42),
                 CountMinSketch(depth=5, log2_width=12, seed=42)):
        base = {r.key: (r.rows_seen, bytes(r.sketch)) for r in sketch_agg(
            skewed, ["key"], "v", impl, strategy="shuffle").collect()}
        salted = {r.key: (r.rows_seen, bytes(r.sketch)) for r in sketch_agg(
            skewed, ["key"], "v", impl, strategy="shuffle",
            salt=8).collect()}
        assert base == salted, type(impl).__name__

    # t-digest: merge-order-dependent state, but the estimate contract holds
    td = TDigestSketch(delta=200)
    rows = sketch_agg(skewed, ["key"], "x", td, strategy="shuffle",
                      salt=8).collect()
    got = {r.key: td.quantile(td.deserialize(bytes(r.sketch)), 0.5)
           for r in rows}
    # hot key sees ids 0..n with id%10<9 -> x = (id % 1000) roughly uniform
    assert abs(got["hot"] - 500.0) < 50.0, got["hot"]
