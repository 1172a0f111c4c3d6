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
        # Floor for AQE's partition coalescing (default 1 MB). The
        # within-cell / within-bucket pair joins EXPAND |bucket|-fold
        # past their shuffled bytes, which the byte-based coalescer
        # cannot see: a 1 MB pre-join exchange folds to ONE partition
        # and the whole pair explosion + verify work lands on one task
        # (measured: bucketed near-dup 2.6 s -> 1.5 s at sf0.1 with the
        # 64 KB floor). parallelismFirst (default on) already targets
        # total/parallelism; this floor only stops the 1 MB minimum
        # from overriding it on small shuffles — large shuffles are
        # governed by the advisory size at any scale, so cluster plans
        # are unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
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
    """Invalidate the load_table plan memo AND the dependent auto-dial
    count memo (a re-pointed/rewritten path must re-count — ADVICE
    r13 #3) plus the footer-metadata memo."""
    _TABLE_CACHE.clear()
    _FOOTER_CACHE.clear()
    from openrouter_batch_processor_spark.operators.neighbors import (
        clear_count_cache,
    )

    clear_count_cache()


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
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in NANOS_TS_COLS.get(name, []):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    df = _respread_unsplittable(spark, df, path)
    _TABLE_CACHE[key] = df
    return df


# Sizing for re-spread unsplittable inputs: ~5k rows or ~250 KB
# (uncompressed) per task — small tasks, but the point is to get the
# heavy per-row expression work (tokenize, shingle+md5, n-gram
# explodes) off a single core; the cap keeps the count tied to the
# cluster's parallelism, not a local constant.
#
# The fire condition is measured, not guessed, and it is deliberately
# NARROW — fat text rows only (>=100 B/row uncompressed AND >=1 MB per
# row group). A blanket re-spread of the big NARROW tables (lineitem/
# orders/events, 23-26 B/row) was measured as a net LOSS across the
# suite: the few map-heavy consumers (f12's regex round-trip, q1's
# decimal folds) won 2-4x, but ~30 filter/join/agg-first queries paid
# the extra full-table exchange without unlocking anything (q21
# 1.1 s -> 1.9 s, q3 0.8 -> 1.3, events_type_lift 0.5 -> 1.0 …).
# Those few map-heavy consumers re-spread THEIR OWN projection instead
# (respread_for_narrow_work below — guide §8: use what the caller
# knows that the optimizer does not). The 0.8 MB embeddings table
# (fixed-width doubles, heavy work after its own shuffles) also
# measured a regression and stays out via the bytes/row gate.
_RESPREAD_ROWS_PER_TASK = 5_000
_RESPREAD_BYTES_PER_TASK = 250_000
_RESPREAD_MIN_BYTES_PER_GROUP = 1_000_000
_RESPREAD_MIN_BYTES_PER_ROW = 100


# Footer-metadata memo: (path) -> (num_rows, num_row_groups,
# uncompressed_bytes) or None (multi-file dir / unreadable footer).
# Shared by the load-time fat-row respread and the per-query
# narrow-work respread gate so neither re-reads footers per call.
_FOOTER_CACHE: dict[str, tuple | None] = {}


def _footer_meta(path: str) -> tuple | None:
    if path in _FOOTER_CACHE:
        return _FOOTER_CACHE[path]
    meta = None
    if os.path.isfile(path):
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            rgs = max(md.num_row_groups, 1)
            unc = sum(md.row_group(i).total_byte_size for i in range(rgs))
            meta = (md.num_rows, rgs, unc)
        except Exception:  # noqa: BLE001 — unreadable footer: leave as-is
            meta = None
    _FOOTER_CACHE[path] = meta
    return meta


def _respread_unsplittable(spark, df, path: str):
    """Fix guide-§2.5 input skew: the testdata tables are single parquet
    files with ONE row group each, which the reader cannot split — every
    scan-side stage (and everything narrow above it: explodes, shingle
    md5s, partial aggregations) would run as ONE task regardless of
    cores. Re-spread fat-row (text) such tables right after the read
    with a round-robin repartition sized from footer metadata, capped
    at defaultParallelism (see the threshold rationale above). At
    production scale tables have many files/row groups and this branch
    never fires.

    Contract note (order): the round-robin exchange makes row order
    within downstream partitions nondeterministic. Every registered
    query above load_table is order-insensitive (certified by the full
    3-SF oracle sweep); any FUTURE operator relying on first/limit-style
    arrival order above load_table must pin its own ordering."""
    meta = _footer_meta(path)
    if meta is None:
        return df  # multi-file directory / unreadable footer
    n, rgs, unc = meta
    if (
        unc // rgs < _RESPREAD_MIN_BYTES_PER_GROUP
        or unc // max(n, 1) < _RESPREAD_MIN_BYTES_PER_ROW
    ):
        return df
    parts = min(
        max(-(-n // _RESPREAD_ROWS_PER_TASK), -(-unc // _RESPREAD_BYTES_PER_TASK)),
        spark.sparkContext.defaultParallelism,
    )
    if parts <= rgs:
        return df
    return df.repartition(parts)


def respread_for_narrow_work(df, source_path: str | None = None):
    """Per-query re-spread for a MAP-HEAVY projection over an
    unsplittable input (guide §8): the caller knows the work that
    follows is narrow and expensive per row (regex render/parse,
    many decimal folds), so one round-robin exchange of the pruned
    projection buys full-cluster parallelism for it. Use on the
    narrow projection (after column pruning), not on the raw table.

    ``source_path``: the dominant input's parquet path. When given,
    the re-spread is gated on the same footer-metadata unsplittability
    check as load_table's — a well-split production input (multi-file
    directory, or more row groups than cluster parallelism) returns
    ``df`` unchanged, so clusters never pay a pointless full-table
    exchange (ADVICE r13 #2)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if source_path is not None:
        meta = _footer_meta(source_path)
        if meta is None or meta[1] >= parallelism:
            return df  # splittable enough already: no-op
    return df.repartition(parallelism)


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
