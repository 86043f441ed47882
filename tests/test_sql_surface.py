"""Pure-SQL queries over persisted sketch tables."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastbloom_spark import BloomConfig
from fastbloom_spark.operators import bloom_agg
from fastbloom_spark.operators.sketch_agg import sketch_agg
from fastbloom_spark.sketch import (CountMinSketch, HllSketch, KllSketch,
                                    TDigestSketch)
from fastbloom_spark.sql import register_sketch_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_sketch_sql(spark)
    assert names == ["bloom_intersect", "bloom_probe", "bloom_union",
                     "cms_estimate", "hll_estimate", "kll_quantile",
                     "tdigest_quantile"]


def test_sql_hll_estimate(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    impl = HllSketch(precision=12, seed=42)
    sketch_agg(events, ["event_type"], F.col("user_id").cast("string"),
               impl).createOrReplaceTempView("hll_by_type")
    got = {r.event_type: r.est for r in spark.sql(
        "SELECT event_type, hll_estimate(sketch) AS est FROM hll_by_type"
    ).collect()}
    exact = {r.event_type: r.n for r in events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    for t, e in exact.items():
        assert abs(got[t] - e) / e < 5 * impl.relative_error(), t


def test_sql_bloom_probe(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = BloomConfig.with_num_bits(1 << 15, num_hashes=5, seed=42)
    bloom_agg(docs, ["lang"], "text", cfg) \
        .createOrReplaceTempView("bloom_by_lang")
    from fastbloom_spark.functions import digest64

    docs.select("doc_id", "lang", digest64("text").alias("d")) \
        .createOrReplaceTempView("doc_digests")
    # every doc probes true in ITS OWN lang's filter (zero FN via pure SQL)
    n = spark.sql("""
        SELECT count(*) AS c
        FROM doc_digests d JOIN bloom_by_lang b ON d.lang = b.lang
        WHERE bloom_probe(b.sketch, b.k, b.seed, b.layout, d.d)
    """).collect()[0].c
    assert n == docs.count()


def test_sql_quantiles(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    vals = np.sort(np.array(
        [r.c_acctbal for r in cust.select("c_acctbal").collect()]))
    for impl, fn in [(TDigestSketch(delta=200), "tdigest_quantile"),
                     (KllSketch(k=200, seed=42), "kll_quantile")]:
        sketch_agg(cust, [], "c_acctbal", impl) \
            .createOrReplaceTempView("qsketch")
        got = spark.sql(
            f"SELECT {fn}(sketch, 0.5) AS med FROM qsketch").collect()[0].med
        rank = np.searchsorted(vals, got) / len(vals)
        assert abs(rank - 0.5) < 0.03, (fn, rank)


def test_sql_cms_estimate(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    impl = CountMinSketch(depth=5, log2_width=14, seed=42)
    sketch_agg(events, [], "event_type", impl) \
        .createOrReplaceTempView("cms_events")
    from fastbloom_spark.functions import digest64

    events.select("event_type").distinct() \
        .select("event_type", digest64("event_type").alias("d")) \
        .createOrReplaceTempView("type_digests")
    got = {r.event_type: r.est for r in spark.sql("""
        SELECT t.event_type, cms_estimate(c.sketch, t.d) AS est
        FROM type_digests t CROSS JOIN cms_events c
    """).collect()}
    exact = {r.event_type: r.n for r in events.groupBy("event_type").agg(
        F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    for t, e in exact.items():
        assert got[t] >= e
        assert got[t] - e <= max(impl.error_bound(total), 1)


def test_sql_union_intersect(spark, sf_dir):
    """bloom_union / bloom_intersect as SQL expressions over sketch rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = BloomConfig.with_num_bits(1 << 14, num_hashes=5, seed=42)
    bloom_agg(docs, ["lang"], "text", cfg).createOrReplaceTempView("bl")
    # union of all per-lang sketches == global sketch, probed via SQL
    from fastbloom_spark.functions import digest64
    from fastbloom_spark.operators import bloom_build
    import numpy as np
    from fastbloom_spark.kernel import decode_words

    row = spark.sql("""
        SELECT bloom_union(a.sketch, b.sketch) AS u,
               bloom_intersect(a.sketch, b.sketch) AS i,
               a.sketch AS sa, b.sketch AS sb
        FROM bl a CROSS JOIN bl b
        WHERE a.lang = 'en' AND b.lang = 'de'
    """).collect()[0]
    wa, wb = decode_words(bytes(row.sa)), decode_words(bytes(row.sb))
    assert np.array_equal(decode_words(bytes(row.u)), wa | wb)
    assert np.array_equal(decode_words(bytes(row.i)), wa & wb)


def test_sql_bloom_probe_block64(spark, sf_dir):
    """SQL probe honors the layout column for block64 sketch tables."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = BloomConfig(num_bits=1 << 15, num_hashes=6, seed=42,
                      layout="block64")
    bloom_agg(docs, ["lang"], "text", cfg) \
        .createOrReplaceTempView("blk_by_lang")
    from fastbloom_spark.functions import digest64

    docs.select("lang", digest64("text").alias("d")) \
        .createOrReplaceTempView("dd2")
    n = spark.sql("""
        SELECT count(*) AS c
        FROM dd2 d JOIN blk_by_lang b USING (lang)
        WHERE bloom_probe(b.sketch, b.k, b.seed, b.layout, d.d)
    """).collect()[0].c
    assert n == docs.count()
