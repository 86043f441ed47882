"""Theta (bottom-k/KMV) sketch: exactness, estimator bound, bitwise merge
invariance, set algebra, serde refusals, and the SQL surface.

Kernel-level properties run without Spark (fast); the Spark tests share one
session-scoped SparkSession and batch several assertions per action to hold
the suite wall-time line (VERDICT r4 #8).
"""

from __future__ import annotations

import functools
import random

import numpy as np
import pytest

from fastbloom_spark.sketch import ThetaSketch
from fastbloom_spark.sketch.theta import _FULL_RANGE


def _rand_digests(rng, n):
    return np.unique(rng.integers(-2**62, 2**62, n, dtype=np.int64))


# ------------------------------------------------------------------ kernel --

def test_exact_below_capacity():
    rng = np.random.default_rng(1)
    imp = ThetaSketch(k=256, seed=42)
    vals = _rand_digests(rng, 200)
    st = imp.update(imp.empty(), vals)
    assert imp.is_exact(st)
    assert imp.estimate(st) == float(len(vals))
    # idempotent: re-inserting the same values changes nothing
    again = imp.update(st, vals)
    assert imp.serialize(again) == imp.serialize(st)


def test_estimate_bound_when_full():
    rng = np.random.default_rng(2)
    imp = ThetaSketch(k=1024, seed=42)
    vals = _rand_digests(rng, 100_000)
    st = imp.update(imp.empty(), vals)
    assert not imp.is_exact(st)
    # retained stays exactly k; estimate within 5 standard errors
    assert st[1].size == imp.k
    rel = abs(imp.estimate(st) / len(vals) - 1.0)
    assert rel < 5 * imp.relative_error(), rel


def test_merge_bitwise_invariant_any_topology():
    """Merged state is a pure function of the input SET: identical bytes
    for every split count and merge order (the Bloom-union law,
    reference src/bit_vector.rs:98-104)."""
    rng = np.random.default_rng(3)
    imp = ThetaSketch(k=512, seed=7)
    vals = _rand_digests(rng, 30_000)
    direct = imp.serialize(imp.update(imp.empty(), vals))
    for parts in (2, 5, 16):
        states = [imp.update(imp.empty(), c)
                  for c in np.array_split(vals, parts)]
        random.Random(parts).shuffle(states)
        merged = functools.reduce(imp.merge, states)
        assert imp.serialize(merged) == direct
    # overlapping splits (idempotence under the merge tree)
    a = imp.update(imp.empty(), vals[:20_000])
    b = imp.update(imp.empty(), vals[8_000:])
    assert imp.serialize(imp.merge(a, b)) == direct


def test_set_ops_exact_below_capacity():
    rng = np.random.default_rng(4)
    imp = ThetaSketch(k=8192, seed=42)
    a_items = np.unique(rng.integers(0, 3000, 900, dtype=np.int64))
    b_items = np.unique(rng.integers(1500, 4500, 900, dtype=np.int64))
    sa = imp.update(imp.empty(), a_items)
    sb = imp.update(imp.empty(), b_items)
    A, B = set(a_items.tolist()), set(b_items.tolist())
    assert imp.estimate(imp.union(sa, sb)) == len(A | B)
    assert imp.estimate(imp.intersect(sa, sb)) == len(A & B)
    assert imp.estimate(imp.a_not_b(sa, sb)) == len(A - B)
    assert imp.estimate(imp.a_not_b(sb, sa)) == len(B - A)
    # self-laws
    assert imp.estimate(imp.intersect(sa, sa)) == len(A)
    assert imp.estimate(imp.a_not_b(sa, sa)) == 0.0


def test_set_ops_bound_when_full():
    imp = ThetaSketch(k=512, seed=42)
    sa = imp.update(imp.empty(), np.arange(0, 40_000, dtype=np.int64))
    sb = imp.update(imp.empty(), np.arange(20_000, 60_000, dtype=np.int64))
    for st, truth in ((imp.union(sa, sb), 60_000),
                      (imp.intersect(sa, sb), 20_000),
                      (imp.a_not_b(sa, sb), 20_000)):
        rel = abs(imp.estimate(st) / truth - 1.0)
        # intersect/a_not_b sample ~1/3 of theta's region: allow 5 standard
        # errors of the RESULT's retained count (~k/3)
        assert rel < 5 / np.sqrt(imp.k / 3), (truth, rel)


def test_set_ops_mixed_k_cut_to_smaller_k():
    """The SQL mixed-k path evaluates set ops with the SMALLER-k impl on
    states that may carry up to the larger k values: the result must be
    cut back to n <= impl.k (the documented bottom-k invariant), with
    theta moved by the standard KMV cut so the estimate stays n/theta."""
    big = ThetaSketch(k=4096, seed=42)
    small = ThetaSketch(k=256, seed=42)
    a = big.update(big.empty(), np.arange(50_000, dtype=np.int64))
    # b is exact (below capacity): theta_b = full range, so without the
    # cut a_not_b would retain all 4096 of a's values — 16x small.k
    b = small.update(small.empty(),
                     np.arange(1_000_000, 1_000_100, dtype=np.int64))
    diff = small.a_not_b(a, b)
    assert diff[1].size == small.k
    assert np.all(diff[1] < np.uint64(diff[0]))
    rel = abs(small.estimate(diff) / 50_000 - 1.0)
    assert rel < 5 / np.sqrt(small.k - 1)
    inter = small.intersect(a, b)
    assert inter[1].size <= small.k
    # serialized mixed-k result honors its own header's k
    impl2, st2 = ThetaSketch.from_buffer(small.serialize(diff))
    assert impl2.k == small.k and st2[1].size <= impl2.k


def test_serde_roundtrip_and_refusals():
    rng = np.random.default_rng(5)
    imp = ThetaSketch(k=256, seed=42)
    st = imp.update(imp.empty(), _rand_digests(rng, 5_000))
    buf = imp.serialize(st)
    imp2, st2 = ThetaSketch.from_buffer(buf)
    assert (imp2.k, imp2.seed) == (256, 42)
    assert imp2.serialize(st2) == buf
    with pytest.raises(ValueError, match="seed mismatch"):
        ThetaSketch(k=256, seed=1).deserialize(buf)
    with pytest.raises(ValueError, match="k mismatch"):
        ThetaSketch(k=128, seed=42).deserialize(buf)
    with pytest.raises(ValueError, match="not a compatible"):
        imp.deserialize(buf[:-3])  # truncated value section
    with pytest.raises(ValueError, match="not a compatible"):
        ThetaSketch.from_buffer(b"H" + buf[1:])  # wrong magic
    # empty state roundtrip
    empty_buf = imp.serialize(imp.empty())
    assert imp.estimate(imp.deserialize(empty_buf)) == 0.0
    assert imp.is_exact(imp.deserialize(empty_buf))


def test_theta_never_full_range_after_overflow():
    rng = np.random.default_rng(6)
    imp = ThetaSketch(k=64, seed=0)
    st = imp.update(imp.empty(), _rand_digests(rng, 10_000))
    assert 0 < st[0] < _FULL_RANGE
    assert np.all(st[1] < np.uint64(st[0]))


# ------------------------------------------------------------------- spark --

def test_sketch_agg_matches_local_bitwise(spark, sf_dir):
    """Distributed grouped theta build == local per-group build, BITWISE,
    regardless of input partitioning; partial rows travel enveloped while
    final rows stay canonical (from_buffer passthrough)."""
    from fastbloom_spark.functions.digest import digest64
    from fastbloom_spark.kernel import exact_int64
    from fastbloom_spark.operators.sketch_agg import sketch_agg

    imp = ThetaSketch(k=16384, seed=42)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # local oracle: fold each group's digests through one update
    pdf = events.select(
        "event_type",
        digest64(events.user_id.cast("string")).alias("d")).toPandas()
    want = {}
    for etype, grp in pdf.groupby("event_type"):
        digs = exact_int64(grp["d"], "test digests")
        want[etype] = imp.serialize(imp.update(imp.empty(), digs))
    for n_parts in (1, 7):
        rows = sketch_agg(events.repartition(n_parts), ["event_type"],
                          events.user_id.cast("string"), imp).collect()
        assert len(rows) == len(want)
        for r in rows:
            assert bytes(r.sketch) == want[r.event_type], r.event_type
            # final rows are canonical self-describing buffers
            imp_rt, st = ThetaSketch.from_buffer(bytes(r.sketch))
            assert imp_rt.k == imp.k and imp_rt.seed == imp.seed
            assert imp.is_exact(st)


def test_sql_surface_set_algebra(spark, sf_dir):
    """theta_estimate / theta_union_agg / pairwise set ops from pure SQL,
    pinned against exact DISTINCT set algebra computed in Spark."""
    from pyspark.sql import functions as F

    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sql import register_sketch_sql

    names = register_sketch_sql(spark)
    assert {"theta_estimate", "theta_union_agg", "theta_union",
            "theta_intersect", "theta_a_not_b"} <= set(names)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    imp = ThetaSketch(k=16384, seed=42)
    sketch_agg(events, ["event_type"], events.user_id.cast("string"),
               imp).createOrReplaceTempView("theta_t")

    # exact cohort sets for the truth side
    cohorts = {r.event_type: frozenset(
        x.user_id for x in events.filter(F.col("event_type") == r.event_type)
        .select("user_id").distinct().collect())
        for r in events.select("event_type").distinct().collect()}

    got = {(r.a, r.b): r for r in spark.sql("""
        SELECT a.event_type AS a, b.event_type AS b,
               theta_estimate(theta_union(a.sketch, b.sketch)) AS u,
               theta_estimate(theta_intersect(a.sketch, b.sketch)) AS i,
               theta_estimate(theta_a_not_b(a.sketch, b.sketch)) AS d
        FROM theta_t a JOIN theta_t b ON a.event_type < b.event_type
    """).collect()}
    assert len(got) == len(cohorts) * (len(cohorts) - 1) // 2
    for (a, b), r in got.items():
        A, B = cohorts[a], cohorts[b]
        assert (r.u, r.i, r.d) == (len(A | B), len(A & B), len(A - B)), (a, b)

    # pure-SQL global re-aggregation of persisted state == all users
    row = spark.sql("SELECT theta_estimate(theta_union_agg(sketch)) AS est "
                    "FROM theta_t").collect()[0]
    all_users = frozenset().union(*cohorts.values())
    assert row.est == len(all_users)

    # NULL convention: NULL sketch input -> NULL result
    nulls = spark.sql("""
        SELECT theta_estimate(CAST(NULL AS BINARY)) AS e,
               theta_intersect(sketch, CAST(NULL AS BINARY)) AS i
        FROM theta_t LIMIT 1
    """).collect()[0]
    assert nulls.e is None and nulls.i is None

    # cross-seed set op refused (silent near-zero overlap would be a lie)
    sketch_agg(events, ["event_type"], events.user_id.cast("string"),
               ThetaSketch(k=16384, seed=7)) \
        .createOrReplaceTempView("theta_other_seed")
    with pytest.raises(Exception, match="seed"):
        spark.sql("""
            SELECT theta_estimate(theta_intersect(a.sketch, b.sketch))
            FROM theta_t a JOIN theta_other_seed b
              ON a.event_type = b.event_type
        """).collect()


def test_sql_set_ops_mixed_k_result_capped(spark):
    """Mixed-k inputs through the SQL set ops: the result state is cut at
    the smaller k (its serialized buffer honors its own header's bottom-k
    invariant, n <= k) and the estimate still tracks truth."""
    from fastbloom_spark.sql import register_sketch_sql

    register_sketch_sql(spark)
    big = ThetaSketch(k=4096, seed=42)
    small = ThetaSketch(k=256, seed=42)
    a = big.serialize(big.update(
        big.empty(), np.arange(50_000, dtype=np.int64)))
    b = small.serialize(small.update(
        small.empty(), np.arange(1_000_000, 1_000_100, dtype=np.int64)))
    spark.createDataFrame([(bytearray(a), bytearray(b))],
                          "a binary, b binary") \
        .createOrReplaceTempView("theta_mixed_k")
    row = spark.sql("""
        SELECT theta_a_not_b(a, b) AS d,
               theta_estimate(theta_a_not_b(a, b)) AS est
        FROM theta_mixed_k""").collect()[0]
    impl, st = ThetaSketch.from_buffer(bytes(row.d))
    assert impl.k == small.k and st[1].size <= small.k
    assert abs(row.est / 50_000 - 1.0) < 5 / np.sqrt(small.k - 1)
