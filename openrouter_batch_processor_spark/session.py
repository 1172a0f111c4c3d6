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


# The driver's testdata stores timestamps as parquet TIMESTAMP(NANOS),
# which Spark refuses by default (PARQUET_TYPE_ILLEGAL) while DuckDB
# silently truncates to micros. We read nanos as longs and truncate with
# integer division (`div`, NOT `/` — epoch nanos ~1.7e18 exceed a
# double's 53-bit mantissa, so float division corrupts the low digits).
NANOS_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = (
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
)


# Plan memo for load_table, keyed on (session, dir, table). A DataFrame
# is a LAZY PLAN, not a result: every consumer still scans the parquet
# at execution time — the memo only skips re-running schema inference /
# footer reads and the py4j conf round-trips on every one of the
# registry's ~700 load_table calls per bench pass (guide §1: the scan
# itself is unchanged; this removes repeated plan-BUILD work). Inputs
# are immutable testdata snapshots (see operators/staging.py for the
# same contract); rewriting a directory in-place within one session
# requires clear_table_cache().
_TABLE_CACHE: dict[tuple, "object"] = {}


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata parquet with nanos->micros timestamp repair.

    Also pins the session timezone to UTC so timestamp rendering and
    collection match the oracle's naive-timestamp semantics regardless
    of the driver session's locale.
    """
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in NANOS_TS_COLS.get(name, []):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Register every testdata parquet as a temp view; return the dict.

    Reading parquet (not CSV/JSON) is the scale decision: columnar scans
    with predicate pushdown + column pruning, visible as PushedFilters /
    ReadSchema in .explain("formatted").
    """
    tables = {}
    for name in TABLE_NAMES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            tables[name] = df
    return tables
