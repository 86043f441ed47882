"""Structured Streaming: stateful Bloom dedup and windowed sketches.

Deterministic harness: parquet file source + availableNow trigger + memory
sink; state persistence proven by running a second batch against the same
checkpoint and asserting cross-batch dedup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

from fastbloom_spark import BloomConfig
from fastbloom_spark.streaming import (
    streaming_bloom_dedup,
    windowed_distinct_estimate,
)

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("payload", StringType()),
])


def run_stream(spark, src_dir, ckpt_dir, out_dir):
    """File sink (supports checkpoint recovery, unlike the memory sink)."""
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    cfg = BloomConfig.with_num_bits(1 << 14, num_hashes=5, seed=9)
    deduped = streaming_bloom_dedup(stream, "payload", cfg,
                                    num_shards=4, id_cols=["event_id"])
    q = (deduped.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_streaming_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(i, f"doc-{i % 50}") for i in range(200)]  # 50 distinct
    spark.createDataFrame(batch1, SCHEMA).coalesce(2) \
        .write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "out")
    out1 = run_stream(spark, src, ckpt, out_dir)
    n1 = out1.count()
    assert n1 == 50  # one survivor per distinct payload
    assert out1.select("digest64").distinct().count() == 50

    # batch 2: 30 repeats of batch-1 payloads + 20 brand new
    batch2 = [(1000 + i, f"doc-{i}") for i in range(30)] + \
             [(2000 + i, f"new-{i}") for i in range(20)]
    spark.createDataFrame(batch2, SCHEMA).coalesce(2) \
        .write.mode("append").parquet(src)
    out2 = run_stream(spark, src, ckpt, out_dir)
    # file sink accumulates: batch-1 survivors + only NEW batch-2 payloads
    survivors2 = [r.event_id for r in out2.collect()]
    new_rows = [e for e in survivors2 if e >= 1000]
    assert all(e >= 2000 for e in new_rows), new_rows  # repeats dropped
    assert len(new_rows) == 20  # all new payloads pass
    assert len(survivors2) == 70  # 50 from batch 1 + 20 new


def test_streaming_state_bounded(spark, tmp_path):
    """State is exactly num_shards filters regardless of row volume —
    verified via the row-count invariance of output determinism (no OOM or
    growth path exists: state schema is (long, fixed binary))."""
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    rows = [(i, f"p-{i}") for i in range(5000)]
    spark.createDataFrame(rows, SCHEMA).coalesce(4) \
        .write.mode("overwrite").parquet(src)
    out = run_stream(spark, src, ckpt, str(tmp_path / "out2"))
    assert out.count() == 5000  # all distinct -> all pass (no false pos here)


def test_windowed_distinct_estimate(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ])
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for minute in range(3):
        for u in range(100 * (minute + 1)):
            rows.append((base + dt.timedelta(minutes=minute,
                                             seconds=u % 60), u))
    spark.createDataFrame(rows, schema).coalesce(2) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_distinct_estimate(stream, "ts", "user_id",
                                     window="1 minute", rsd=0.02)
    # complete mode: a single availableNow micro-batch never advances the
    # watermark, so append mode would emit nothing — complete shows every
    # window (production streams use append + flowing watermarks)
    q = (agg.writeStream.format("memory").queryName("win_sink")
         .option("checkpointLocation", str(tmp_path / "wckpt"))
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.window_start.minute: r.approx_distinct
           for r in spark.sql("select * from win_sink").collect()}
    assert len(got) == 3
    for minute, est in got.items():
        exact = 100 * (minute + 1)
        assert abs(est - exact) / exact < 0.1, (minute, est)


def test_streaming_dedup_block64_layout(spark, tmp_path):
    """The streaming dedup honors a block64 config (layout audit)."""
    from fastbloom_spark.streaming import streaming_bloom_dedup

    src = str(tmp_path / "bsrc")
    rows = [(i, f"v-{i % 40}") for i in range(160)]
    spark.createDataFrame(rows, SCHEMA).coalesce(2) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    cfg = BloomConfig(num_bits=1 << 14, num_hashes=6, seed=3,
                      layout="block64")
    deduped = streaming_bloom_dedup(stream, "payload", cfg, num_shards=2,
                                    id_cols=["event_id"])
    out_dir = str(tmp_path / "bout")
    q = (deduped.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "bck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 40


def test_streaming_sketch_agg_matches_batch(spark, tmp_path):
    """Custom HLL state per key via applyInPandasWithState: after two
    triggers over the same checkpoint, each key's state equals the batch
    sketch_agg over all rows seen (update/merge associativity makes the
    result batch-boundary independent)."""
    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sketch import HllSketch
    from fastbloom_spark.streaming import streaming_sketch_agg

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("lang", F.col("text").alias("val"))
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.coalesce(2).write.mode("overwrite").parquet(src)

    impl = HllSketch(precision=12, seed=42)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        agged = streaming_sketch_agg(stream, ["lang"], "val", impl)
        q = (agged.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    # second trigger: append the same rows — distinct estimate must not
    # move, rows_seen must double (state resumed from checkpoint)
    docs.coalesce(2).write.mode("append").parquet(src)
    run_once()

    # latest state row per key = the one with max rows_seen
    res = spark.read.parquet(out).collect()
    latest = {}
    for r in res:
        if r.lang not in latest or r.rows_seen > latest[r.lang].rows_seen:
            latest[r.lang] = r

    batch = {r.lang: r for r in
             sketch_agg(docs, ["lang"], "val", impl).collect()}
    for lang, b in batch.items():
        s = latest[lang]
        assert s.rows_seen == 2 * b.rows_seen, lang
        est_stream = impl.estimate(impl.deserialize(bytes(s.sketch)))
        est_batch = impl.estimate(impl.deserialize(bytes(b.sketch)))
        assert est_stream == est_batch, lang  # identical registers


def test_streaming_rejects_randomly_seeded_config(spark, tmp_path):
    """A randomly-drawn seed cannot be re-derived after a driver restart,
    so streaming state built with it would silently re-emit everything —
    the operator must refuse it up front."""
    import pytest as _pytest

    cfg = BloomConfig.with_num_bits(1 << 12, num_hashes=4)  # seed drawn
    assert cfg.seed_drawn
    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    with _pytest.raises(ValueError, match="explicit seed"):
        streaming_bloom_dedup(stream, "payload", cfg)


def test_streaming_sketch_agg_cms(spark, tmp_path):
    """streaming_sketch_agg is impl-agnostic: CMS counters accumulated in
    streaming state equal the batch build exactly (counter add is exact)."""
    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sketch import CountMinSketch
    from fastbloom_spark.streaming import streaming_sketch_agg

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet") \
        .select("event_type", F.col("event_type").alias("val"))
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    events.coalesce(2).write.mode("overwrite").parquet(src)

    impl = CountMinSketch(depth=5, log2_width=12, seed=42)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agged = streaming_sketch_agg(stream, ["event_type"], "val", impl)
    q = (agged.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r.event_type: bytes(r.sketch)
           for r in spark.read.parquet(out).collect()}
    want = {r.event_type: bytes(r.sketch) for r in
            sketch_agg(events, ["event_type"], "val", impl).collect()}
    assert got == want  # byte-identical counter states


# ---------------------------------------------------- windowed finalization --

W_SCHEMA = StructType([
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
    StructField("uid", LongType()),
])


def _run_windowed(spark, src, ckpt, out, impl, **kw):
    from fastbloom_spark.streaming import streaming_windowed_sketch_agg

    stream = spark.readStream.schema(W_SCHEMA).parquet(src)
    agg = streaming_windowed_sketch_agg(
        stream, "ts", F.col("uid").cast("string"), impl, **kw)
    q = (agg.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_windowed_sketch_finalizes_on_watermark(spark, tmp_path):
    """A window emits exactly ONE row — when the watermark passes its end —
    and its state is removed (exactly-once finalization across restarts
    from the same checkpoint)."""
    from datetime import datetime

    from fastbloom_spark.sketch import HllSketch

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    rows = [(datetime(2024, 1, 1, h, m, 0), "a", (h * 100 + m) % 37)
            for h in range(3) for m in range(0, 60, 5)]
    spark.createDataFrame(rows, W_SCHEMA).coalesce(2) \
        .write.mode("overwrite").parquet(src)

    impl = HllSketch(precision=10, seed=1)
    r1 = _run_windowed(spark, src, ckpt, out, impl,
                       window="1 hour", watermark="10 minutes")
    got1 = sorted((str(r.window_start), r.rows_seen) for r in r1.collect())
    # watermark = 02:55 - 10 min: hours 0 and 1 finalized, hour 2 open
    assert got1 == [("2024-01-01 00:00:00", 12), ("2024-01-01 01:00:00", 12)]

    # a later event pushes the watermark past hour 2; no re-emits of 0/1
    spark.createDataFrame([(datetime(2024, 1, 1, 9, 0, 0), "a", 999)],
                          W_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    r2 = _run_windowed(spark, src, ckpt, out, impl,
                       window="1 hour", watermark="10 minutes")
    got2 = sorted((str(r.window_start), r.rows_seen) for r in r2.collect())
    assert got2 == [("2024-01-01 00:00:00", 12), ("2024-01-01 01:00:00", 12),
                    ("2024-01-01 02:00:00", 12)]


def test_windowed_sketch_byte_equals_batch(spark, tmp_path):
    """Finalized window sketches byte-equal the batch sketch_agg over the
    same rows for order-independent state (HLL register maxima), keyed
    windows included."""
    from datetime import datetime

    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sketch import HllSketch

    src, ckpt, out = (str(tmp_path / d) for d in ("s2", "c2", "o2"))
    rows = [(datetime(2024, 1, 1, h, m, 0), "ab"[m % 2], h * 59 + m)
            for h in range(2) for m in range(0, 60, 3)]
    df = spark.createDataFrame(rows, W_SCHEMA)
    df.coalesce(3).write.mode("overwrite").parquet(src)
    # nudge so both hours finalize
    spark.createDataFrame([(datetime(2024, 1, 2), "a", 0)], W_SCHEMA) \
        .write.mode("append").parquet(src)

    impl = HllSketch(precision=9, seed=7)
    got_df = _run_windowed(spark, src, ckpt, out, impl,
                           window="1 hour", watermark="1 minute",
                           key_cols=["event_type"])
    got = {(str(r.window_start), r.event_type): bytes(r.sketch)
           for r in got_df.collect()}

    batch = sketch_agg(
        df.withColumn("win_start", F.window("ts", "1 hour").getField("start")),
        ["win_start", "event_type"], F.col("uid").cast("string"), impl)
    want = {(str(r.win_start), r.event_type): bytes(r.sketch)
            for r in batch.collect()}
    assert got == want and len(got) == 4


def test_windowed_sketch_cms_byte_equals_batch(spark, tmp_path):
    """Counter sketches through the windowed rollup: CMS adds are exact
    and order-independent, so finalized windows byte-equal batch state."""
    from datetime import datetime

    from fastbloom_spark.operators.sketch_agg import sketch_agg
    from fastbloom_spark.sketch import CountMinSketch

    src, ckpt, out = (str(tmp_path / d) for d in ("s3", "c3", "o3"))
    rows = [(datetime(2024, 1, 1, h, m, 0), "a", (h * 13 + m) % 9)
            for h in range(2) for m in range(0, 60, 4)]
    df = spark.createDataFrame(rows, W_SCHEMA)
    df.coalesce(2).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(datetime(2024, 1, 3), "a", 0)], W_SCHEMA) \
        .write.mode("append").parquet(src)

    impl = CountMinSketch(depth=4, log2_width=10, seed=3)
    got_df = _run_windowed(spark, src, ckpt, out, impl,
                           window="1 hour", watermark="1 minute")
    got = {str(r.window_start): bytes(r.sketch) for r in got_df.collect()}
    batch = sketch_agg(
        df.withColumn("ws", F.window("ts", "1 hour").getField("start")),
        ["ws"], F.col("uid").cast("string"), impl)
    want = {str(r.ws): bytes(r.sketch) for r in batch.collect()}
    assert got == want and len(got) == 2


def test_streaming_decontam_equals_batch(spark, tmp_path):
    """Stateless streaming decontamination emits EXACTLY the batch overlap
    pairs — same operator stack run as a stream (availableNow over a file
    source) and as a batch frame."""
    from pyspark.sql import functions as F

    from fastbloom_spark.streaming import streaming_contamination_matches

    rows = [(i, " ".join(f"t{(i * 11 + j) % 37}" for j in range(14)))
            for i in range(80)]
    rows += [(80, ""), (81, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    bench = docs.filter(F.col("doc_id") % 9 == 0)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    pairs = streaming_contamination_matches(stream, bench, ngram_n=3,
                                            fp=0.05)
    q = (pairs.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.doc_id, r.gram)
           for r in spark.read.parquet(out).collect()}

    batch = streaming_contamination_matches(docs, bench, ngram_n=3,
                                            fp=0.05)
    want = {(r.doc_id, r.gram) for r in batch.collect()}
    assert got == want and len(want) > 0

    # and the batch run of the streaming operator equals the naive join
    from fastbloom_spark.operators.decontam import benchmark_grams
    from fastbloom_spark.operators.text import word_ngrams_col

    dg = docs.select("doc_id",
                     F.explode(word_ngrams_col("text", 3)).alias("gram"))
    naive = {(r.doc_id, r.gram) for r in dg.join(
        benchmark_grams(bench, "text", ngram_n=3), "gram").collect()}
    assert want == naive


def test_streaming_decontam_rejects_streaming_bench(spark, tmp_path):
    from fastbloom_spark.streaming import streaming_contamination_matches

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    src = str(tmp_path / "s2")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="static"):
        streaming_contamination_matches(stream, stream)
