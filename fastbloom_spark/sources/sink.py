"""Iceberg-style table layout: partitioned/bucketed writes for corpus + sketches.

No Iceberg runtime ships in this container, so the layout discipline is
expressed with Spark's native writers (the code paths are identical when an
Iceberg catalog is attached — swap ``.parquet(path)`` for
``.writeTo(table).using("iceberg")``):

* corpus tables partition by a **repo bucket** (stable hash of repo, fixed
  bucket count) — co-locates a repo's files for per-repo scans without
  creating a directory per repo (10^6 repos must not mean 10^6 partitions);
* sketch tables partition by ``sketch_kind`` and group column — sketch rows
  are tiny, reading one group's sketch touches one file;
* writes are deterministic for a given input (no timestamps in data paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def repo_bucket_col(repo_col: str = "repo", num_buckets: int = 64):
    """Stable bucket id for a repo — delegates to the index module's
    engine-replayable bucket function (one bucketing definition repo-wide;
    its string cast pins one byte representation per value so DuckDB
    oracles can replay the layout)."""
    from .index import bucket_col

    return bucket_col(repo_col, num_buckets)


def write_code_table(
    df: DataFrame,
    path: str,
    *,
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write a `(repo, path, commit, lang, content)` corpus partitioned by
    repo bucket (Iceberg-style bucketed layout on the filesystem)."""
    # explicit partition count: AQE coalesces column-only repartitions
    # of small exchanges into 1-2 tasks, serializing the write (CLAUDE.md)
    df.withColumn("repo_bucket", repo_bucket_col("repo", num_buckets)) \
        .repartition(num_buckets, F.col("repo_bucket")) \
        .write.mode(mode).partitionBy("repo_bucket").parquet(path)


def read_code_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_repo(spark: SparkSession, path: str, repo: str,
              num_buckets: int = 64) -> DataFrame:
    """Partition-pruned single-repo scan: the bucket predicate prunes to one
    directory; the repo predicate pushes into the parquet scan."""
    df = spark.read.parquet(path)
    bucket = F.pmod(F.xxhash64(F.lit(repo)), F.lit(num_buckets)).cast("int")
    return df.filter((F.col("repo_bucket") == bucket)
                     & (F.col("repo") == repo))


def write_sketch_table(
    sketches: DataFrame,
    path: str,
    *,
    sketch_kind: str,
    group_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist merged sketch rows (output of bloom_agg / sketch_agg) as a
    queryable sketch table partitioned by kind (and small group column).

    Overwrites are DYNAMIC at the partition level: writing sketch_kind
    'hll' next to an existing 'bloom' replaces only the hll partitions —
    Spark's default STATIC overwrite would truncate the whole table path
    and silently destroy every other kind's rows."""
    out = sketches.withColumn("sketch_kind", F.lit(sketch_kind))
    parts = ["sketch_kind"] + ([group_col] if group_col else [])
    out.write.mode(mode) \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy(*parts).parquet(path)
