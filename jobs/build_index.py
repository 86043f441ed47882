"""spark-submit job: write a Bloom data-skipping index over a parquet table.

Usage:
    spark-submit --py-files fastbloom_spark.zip jobs/build_index.py \
        <input_parquet> <out_path> <index_col[,col2,...]> <bucket_source> \
        <num_buckets> <fp> [zones=<col,col>] [rg=1] [probe_value ...]

Writes ``<out_path>/data`` (bucket-partitioned copy) plus a versioned,
atomically-published index under ``<out_path>/index_versions/`` (one sketch
row per bucket over digest64(index_col); readers resolve the highest
committed version); if probe values are
given, runs a pruned read for them and reports the prune stats — the
cluster entry point for building skip indexes over landed tables.
Per-bucket expected_items is sized from one count() of the input.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, out_path, index_col, bucket_source, num_buckets, fp = sys.argv[1:7]
    # optional trailing args: zones=<col,col> then probe values
    rest = sys.argv[7:]
    zone_cols: list[str] = []
    if rest and rest[0].startswith("zones="):
        zone_cols = [c for c in rest[0][len("zones="):].split(",") if c]
        rest = rest[1:]
    row_group_index = False
    if rest and rest[0] == "rg=1":
        row_group_index = True
        rest = rest[1:]
    probes = rest
    num_buckets = int(num_buckets)
    spark = SparkSession.builder.appName("fastbloom-index").getOrCreate()

    from fastbloom_spark import BloomConfig
    from fastbloom_spark.sources import pruned_read, write_indexed_table

    df = spark.read.parquet(inp)
    n = df.count()
    cfg = BloomConfig.from_false_pos(
        float(fp), expected_items=max(1, n // num_buckets), seed=42)
    write_indexed_table(df, out_path,
                        index_col=[c for c in index_col.split(",") if c],
                        cfg=cfg, bucket_source=bucket_source,
                        num_buckets=num_buckets, zone_cols=zone_cols,
                        row_group_index=row_group_index)
    report = {
        "rows": n, "num_buckets": num_buckets,
        "bits_per_bucket": cfg.num_bits, "num_hashes": cfg.num_hashes,
        "index_bytes": num_buckets * cfg.num_words * 8,
    }
    if probes:
        pruned, stats = pruned_read(spark, out_path, probes,
                                    on=index_col.split(",")[0])
        report.update({
            "probe_rows_matched": pruned.count(),
            "buckets_survived": stats.units_survived,
            "skipped_fraction": round(stats.skipped_fraction, 4),
        })
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
