"""spark-submit job: the composed corpus preprocessing pipeline.

Usage:
    spark-submit --py-files fastbloom_spark.zip jobs/run_pipeline.py \
        <input_parquet> <output_parquet> [bench_parquet|-] \
        [min_quality=0.35] [ngram=5] [capacity=2048] [shards=64]

Runs quality gate -> PII redaction -> exact dedup -> benchmark
decontamination (skipped when bench is '-') -> 90/5/5 split -> per-
(split, shard) packing over <input_parquet> (columns doc_id, text),
writes the packed corpus partitioned by split, and prints one JSON line
of per-stage counts plus per-split fill stats — the deployment entry
point for the headline `corpus_pipeline` operator
(fastbloom_spark/operators/pipeline.py; scale shape documented there:
full documents shuffle exactly twice end to end).
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, out = sys.argv[1:3]
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "-"
    min_quality = float(sys.argv[4]) if len(sys.argv) > 4 else 0.35
    ngram = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    capacity = int(sys.argv[6]) if len(sys.argv) > 6 else 2048
    shards = int(sys.argv[7]) if len(sys.argv) > 7 else 64
    spark = SparkSession.builder.appName("fastbloom-pipeline").getOrCreate()

    from pyspark.sql import functions as F

    from fastbloom_spark.operators.pipeline import (CorpusPipelineConfig,
                                                    corpus_pipeline)

    docs = spark.read.parquet(inp)
    n_in = docs.count()
    bench = None if bench_path == "-" else spark.read.parquet(bench_path)
    cfg = CorpusPipelineConfig(min_quality=min_quality,
                               decontam_ngram=ngram,
                               pack_capacity=capacity, pack_shards=shards)
    packed = corpus_pipeline(docs, bench=bench, cfg=cfg).persist()
    n_packed = packed.count()
    packed.write.mode("overwrite").partitionBy("split").parquet(out)
    if n_packed == 0:
        # everything dropped (e.g. aggressive min_quality): the write
        # leaves only _SUCCESS and a parquet read-back cannot infer a
        # schema — report the honest zeros instead of crashing
        print(json.dumps({
            "rows_in": n_in, "rows_packed": 0, "rows_dropped": n_in,
            "splits": {}, "blocks": 0, "oversize_blocks": 0,
            "fill_ratio": None,
        }))
        spark.stop()
        return

    written = spark.read.parquet(out)
    n_out = written.count()
    splits = {r.split: r.n for r in
              written.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    # block identity is (split, shard, block_id) — pack_stats' per-shard
    # grouping would merge same-numbered blocks across splits here
    per_block = written.groupBy("split", "shard", "block_id").agg(
        F.sum("n_tokens").alias("block_tokens"),
        F.max(F.col("oversize").cast("int")).alias("over"))
    fill = per_block.agg(
        F.count("*").alias("blocks"),
        F.sum("over").alias("oversize"),
        F.round(F.sum("block_tokens") /
                (F.count("*") * F.lit(float(capacity))), 4)
        .alias("fill_ratio")).collect()[0]
    print(json.dumps({
        "rows_in": n_in,
        "rows_packed": n_out,
        "rows_dropped": n_in - n_out,
        "splits": splits,
        "blocks": fill.blocks,
        "oversize_blocks": fill.oversize,
        "fill_ratio": fill.fill_ratio,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
