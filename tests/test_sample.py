"""Deterministic hash-driven sampling / splitting (operators/sample.py).

The load-bearing properties: assignments and samples are pure functions of
(key, seed) — invariant under repartitioning, row order, and appends of
unrelated rows — and the DuckDB xxh64 replica reproduces them bit-exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.sample import (key_hash, sample_distinct,
                                              split_assign,
                                              split_thresholds,
                                              stratified_sample)
from fastbloom_spark.oracle_sql import sql_key_hash

SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# -- key_hash -----------------------------------------------------------------


def test_key_hash_duckdb_parity_multi_col(spark, sf_dir):
    got = {(r.doc_id, r.lang): r.h for r in
           _docs(spark, sf_dir)
           .select("doc_id", "lang",
                   key_hash(["lang", "doc_id"], 99).alias("h")).collect()}
    exp = {(a, b): c for a, b, c in duckdb.sql(
        f"SELECT doc_id, lang, {sql_key_hash(['lang', 'doc_id'], 99)} AS h "
        f"FROM '{sf_dir}/documents.parquet'").fetchall()}
    assert got == exp


def test_key_hash_null_propagates(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "v"])
    rows = {r.id: r.h for r in
            df.select("id", key_hash(["v", "id"], 1).alias("h")).collect()}
    assert rows[2] is None and rows[1] is not None


# -- split_assign -------------------------------------------------------------


def test_split_thresholds_validation():
    with pytest.raises(ValueError, match=">= 2|at least 2"):
        split_thresholds([1.0])
    with pytest.raises(ValueError, match="> 0"):
        split_thresholds([1.0, -0.5])
    ts = split_thresholds([0.5, 0.5])
    assert ts == [-(1 << 63) + (1 << 63)]  # midpoint == 0


def test_split_thresholds_extreme_weights_clamped(spark):
    # float cum rounds to 1.0 here; the raw threshold 2^63 would not fit a
    # Spark LongType literal — must clamp to i64 max and still plan
    ts = split_thresholds([1e9, 1e-9])
    assert ts[0] == (1 << 63) - 1
    df = spark.range(50).withColumnRenamed("id", "k")
    out = split_assign(df, ["k"], [("a", 1e9), ("b", 1e-9)], seed=1)
    assert {r.split for r in out.collect()} == {"a"}


def test_split_assign_partition_invariant_and_weighted(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.split for r in
         split_assign(docs, ["doc_id"], SPLITS, seed=7).collect()}
    b = {r.doc_id: r.split for r in
         split_assign(docs.repartition(13), ["doc_id"], SPLITS,
                      seed=7).collect()}
    assert a == b
    n = len(a)
    share = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < share < 0.9  # 500 keys: binomial(0.8) stays well inside


def test_split_assign_same_key_same_split(spark):
    # leakage-safety: every row of a key lands in ONE split
    df = spark.createDataFrame(
        [(i % 17, j) for i in range(200) for j in range(3)], ["uid", "j"])
    out = split_assign(df, ["uid"], SPLITS, seed=3)
    assert out.groupBy("uid").agg(
        F.countDistinct("split").alias("k")).filter("k > 1").count() == 0


def test_split_assign_null_key_null_split(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], ["id", "key"])
    rows = {r.id: r.split for r in
            split_assign(df, ["key"], SPLITS).collect()}
    assert rows[2] is None and rows[1] in {"train", "val", "test"}


def test_split_assign_rejects_bad_splits(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="duplicate"):
        split_assign(docs, ["doc_id"], [("a", 1.0), ("a", 1.0)])
    with pytest.raises(ValueError, match="at least 2"):
        split_assign(docs, ["doc_id"], [("only", 1.0)])


def test_split_assign_is_pure_projection(spark, sf_dir):
    plan = split_assign(_docs(spark, sf_dir), ["doc_id"], SPLITS) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: free at any scale


# -- sample_distinct ----------------------------------------------------------


def test_sample_distinct_deterministic_and_nested(spark, sf_dir):
    ev = _events(spark, sf_dir)
    s50 = {r.event_id for r in
           sample_distinct(ev, ["event_id"], 50, seed=5).collect()}
    s50b = {r.event_id for r in
            sample_distinct(ev.repartition(7), ["event_id"], 50,
                            seed=5).collect()}
    assert s50 == s50b and len(s50) == 50
    s80 = {r.event_id for r in
           sample_distinct(ev, ["event_id"], 80, seed=5).collect()}
    assert s50 < s80  # bottom-k nesting: smaller sample ⊂ larger


def test_sample_distinct_k_above_domain_returns_all(spark):
    df = spark.createDataFrame([(i,) for i in range(10)] * 3, ["k"])
    out = sample_distinct(df, ["k"], 100)
    assert sorted(r.k for r in out.collect()) == list(range(10))


def test_sample_distinct_excludes_null_and_takes_ordered(spark):
    df = spark.createDataFrame([(None,), ("a",), ("b",)],
                               "v: string")
    out = sample_distinct(df, ["v"], 5)
    assert sorted(r.v for r in out.collect()) == ["a", "b"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k merge, not global sort


# -- stratified_sample --------------------------------------------------------


def test_stratified_sample_quota_and_salt_equivalence(spark, sf_dir):
    ev = _events(spark, sf_dir)
    base = stratified_sample(ev, ["event_type"], ["event_id"], 20, seed=11)
    got = {(r.event_type, r.event_id) for r in base.collect()}
    salted = stratified_sample(ev.repartition(9), ["event_type"],
                               ["event_id"], 20, seed=11, salt=4)
    assert {(r.event_type, r.event_id) for r in salted.collect()} == got
    counts = base.groupBy("event_type").count().collect()
    assert all(r["count"] == 20 for r in counts)


def test_stratified_sample_duckdb_parity(spark, sf_dir):
    got = {(r.event_type, r.event_id) for r in
           stratified_sample(_events(spark, sf_dir), ["event_type"],
                             ["event_id"], 5, seed=11).collect()}
    h = sql_key_hash(["event_id"], 11)
    exp = set(duckdb.sql(f"""
        SELECT event_type, event_id FROM (
          SELECT event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY {h}, event_id) AS rn
          FROM '{sf_dir}/events.parquet') WHERE rn <= 5
    """).fetchall())
    assert got == exp


# -- sample_fraction ----------------------------------------------------------


def test_sample_fraction_deterministic_nested_and_leakage_safe(spark,
                                                               sf_dir):
    from fastbloom_spark.operators.sample import sample_fraction

    docs = _docs(spark, sf_dir)
    n = docs.count()
    s20 = {r.doc_id for r in
           sample_fraction(docs, ["doc_id"], 0.2, seed=9).collect()}
    # repartition-invariant (df.sample is NOT)
    s20b = {r.doc_id for r in
            sample_fraction(docs.repartition(13), ["doc_id"], 0.2,
                            seed=9).collect()}
    assert s20 == s20b
    # binomial(n, 0.2) stays well inside at 500 keys
    assert 0.12 < len(s20) / n < 0.28
    # nesting: larger fractions are supersets (fixed hash order)
    s40 = {r.doc_id for r in
           sample_fraction(docs, ["doc_id"], 0.4, seed=9).collect()}
    assert s20 <= s40
    # leakage-consistency: all rows of a key kept or dropped together
    multi = spark.createDataFrame(
        [(i % 17, j) for i in range(100) for j in range(3)], ["uid", "j"])
    kept = sample_fraction(multi, ["uid"], 0.5, seed=3)
    per_uid = {r.uid: r.n for r in
               kept.groupBy("uid").agg(F.count("*").alias("n")).collect()}
    full = {r.uid: r.n for r in
            multi.groupBy("uid").agg(F.count("*").alias("n")).collect()}
    # every sampled key keeps ALL its rows (none partially sampled)
    assert per_uid and all(per_uid[u] == full[u] for u in per_uid)
    # NULL keys excluded
    withnull = spark.createDataFrame([(1, "a"), (2, None)], ["id", "k"])
    assert {r.id for r in
            sample_fraction(withnull, ["k"], 0.999999).collect()} <= {1}
    with pytest.raises(ValueError, match="fraction"):
        sample_fraction(docs, ["doc_id"], 0.0)


def test_sample_fraction_duckdb_parity(spark, sf_dir):
    """The sampled SET is replayable bit-exactly in DuckDB: same xxh64,
    same integer threshold."""
    import duckdb

    from fastbloom_spark.operators.sample import sample_fraction

    got = sorted(r.doc_id for r in
                 sample_fraction(_docs(spark, sf_dir), ["doc_id"], 0.25,
                                 seed=11).collect())
    t = -(1 << 63) + int(0.25 * float(1 << 64))
    exp = sorted(x for (x,) in duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        f"WHERE {sql_key_hash(['doc_id'], 11)} < {t}").fetchall())
    assert got == exp


def test_sample_fraction_one_keeps_every_nonnull_key_row(spark, sf_dir):
    """fraction=1.0 must keep EVERY non-NULL-key row — the clamped
    threshold with strict '<' could drop a key hashing to exactly
    2^63-1 (ADVICE r06)."""
    from fastbloom_spark.operators.sample import sample_fraction

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_nonnull = docs.filter(F.col("doc_id").isNotNull()).count()
    assert sample_fraction(docs, ["doc_id"], 1.0).count() == n_nonnull
