"""SparkSession helpers with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def shuffle_partition_count(spark: SparkSession) -> int:
    """``spark.sql.shuffle.partitions`` as an int, falling back to
    ``defaultParallelism`` when the conf is non-numeric — platforms that
    manage the value through AQE (e.g. set it to ``"auto"``) would
    otherwise blow up every explicit-width repartition (salted shuffles
    pin a partition count because AQE coalesces column-only repartitions
    back into few tasks)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def get_spark(
    app_name: str = "fastbloom_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the sketch workload.

    On a real cluster this is spark-submit's job; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``. AQE stays on (runtime re-plan + skew-join
    splitting); Arrow is forced on (every sketch kernel rides Arrow batches);
    shuffle partition count defaults to the core count — sketch shuffles move
    tiny partial-sketch rows, so more partitions only add scheduling overhead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus) if cpus.isdigit() else 32),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
