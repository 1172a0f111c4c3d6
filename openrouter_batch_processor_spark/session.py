"""SparkSession factory tuned for both local testing and cluster scale.

The settings below are the ones that matter at 100 TB:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join demotion/promotion. At sf0.1 locally this
  collapses 32 shuffle partitions to a handful; at 100 TB it splits the
  skewed ones instead. Same code, both scales.
- Arrow on: every pandas UDF / applyInPandas crosses the JVM<->Python
  boundary in columnar Arrow batches instead of pickled rows.
- shuffle.partitions is a *default*, not a plan: AQE re-coalesces. On a
  real cluster set it ~2-3x total cores; the engine never hard-codes it
  inside an operator.
- maxPartitionBytes 128m keeps scan partitions executor-memory-sized; at
  100 TB that is ~800k input splits, which is what you want — parallelism
  comes from the data, not from repartition() calls.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "openrouter_batch_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Register every testdata parquet as a temp view; return the dict.

    Reading parquet (not CSV/JSON) is the scale decision: columnar scans
    with predicate pushdown + column pruning, visible as PushedFilters /
    ReadSchema in .explain("formatted").
    """
    tables = {}
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            tables[name] = df
    return tables
