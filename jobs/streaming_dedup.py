"""spark-submit job: continuous Bloom dedup over a file-source stream.

Usage:
    spark-submit --py-files fastbloom_spark.zip jobs/streaming_dedup.py \
        <input_dir> <value_col> <m_bits> <k> <seed> <output_dir> <ckpt_dir> \
        [id_cols_csv]

Structured Streaming: new parquet files landing in <input_dir> are
first-occurrence-filtered against sharded Bloom state (fixed
num_shards * m/8 bytes forever); exactly-once via the checkpoint dir —
restarting the job resumes the filter state. Runs availableNow (drain
what exists, then exit) so it composes with external schedulers; swap the
trigger for a processing-time interval for an always-on daemon.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, value_col, m_bits, k, seed, out, ckpt = sys.argv[1:8]
    id_cols = sys.argv[8].split(",") if len(sys.argv) > 8 else []
    spark = SparkSession.builder.appName("fastbloom-stream-dedup").getOrCreate()

    from fastbloom_spark import BloomConfig
    from fastbloom_spark.streaming import streaming_bloom_dedup

    schema = spark.read.parquet(inp).schema
    cfg = BloomConfig.with_num_bits(int(m_bits), num_hashes=int(k),
                                    seed=int(seed))
    stream = spark.readStream.schema(schema).parquet(inp)
    deduped = streaming_bloom_dedup(stream, value_col, cfg,
                                    id_cols=id_cols)
    q = (deduped.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n_out = spark.read.parquet(out).count()
    print(json.dumps({"emitted_total": n_out, "state_bytes_fixed":
                      32 * cfg.num_words * 8}))
    spark.stop()


if __name__ == "__main__":
    main()
