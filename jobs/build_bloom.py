"""spark-submit job: global Bloom build over a corpus parquet table.

Usage:
    spark-submit --py-files fastbloom_spark.zip jobs/build_bloom.py \
        <input_parquet> <value_col> <fp> <seed> <checkpoint_out>

Prints one JSON line with the built filter's geometry and stats — the
cluster-deployment entry point the north rule's --py-files contract names.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, value_col, fp, seed, ckpt_out = sys.argv[1:6]
    spark = SparkSession.builder.appName("fastbloom-build").getOrCreate()

    from fastbloom_spark import BloomConfig
    from fastbloom_spark.functions import digest64
    from fastbloom_spark.operators import bloom_build, bloom_partials
    from fastbloom_spark.sources import write_checkpoint

    df = spark.read.parquet(inp)
    n = df.count()
    cfg = BloomConfig.from_false_pos(float(fp), expected_items=max(n, 1),
                                     seed=int(seed))
    bloom = bloom_build(df, value_col, cfg)
    # persist partial checkpoint for resumability
    prepared = df.select(digest64(value_col).alias("__digest64"))
    write_checkpoint(bloom_partials(prepared, "__digest64", cfg), ckpt_out)
    print(json.dumps({
        "rows": bloom.rows_seen, "m": bloom.num_bits, "k": bloom.num_hashes,
        "seed": bloom.seed, "expected_fpp": bloom.expected_false_pos(n),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
