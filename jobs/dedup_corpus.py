"""spark-submit job: corpus dedup pipeline (exact + MinHash-LSH near-dup).

Usage:
    spark-submit --py-files fastbloom_spark.zip jobs/dedup_corpus.py \
        <input_parquet> <id_col> <text_col> <threshold> <output_parquet>

Runs the full training-data dedup sequence a 100 TB corpus job runs:
exact sha256 dedup first (cheap, one hash shuffle), then MinHash+LSH
near-dup with exact-Jaccard verification over the survivors; writes the
deduped rows and prints one JSON line of counts.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, id_col, text_col, threshold, out = sys.argv[1:6]
    spark = SparkSession.builder.appName("fastbloom-dedup").getOrCreate()

    from fastbloom_spark.operators.dedup import minhash_dedup
    from fastbloom_spark.operators.text import dedup_exact

    df = spark.read.parquet(inp)
    n_in = df.count()
    exact = dedup_exact(df, id_col, text_col)
    n_exact = exact.count()
    near = minhash_dedup(exact, id_col, text_col,
                         threshold=float(threshold))
    near.write.mode("overwrite").parquet(out)
    n_out = spark.read.parquet(out).count()
    print(json.dumps({
        "rows_in": n_in,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_out,
        "exact_dups_removed": n_in - n_exact,
        "near_dups_removed": n_exact - n_out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
