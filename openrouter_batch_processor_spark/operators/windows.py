"""Event-time window analytics over the events table (batch forms).

The reference has no true windows — its closest behaviors are the
per-group progress checkpoint loop (T1/T2). These operators are the
idiomatic Spark upgrades: tumbling-window aggregation and gap-based
sessionization. The Structured Streaming twins (readStream + watermark)
live in streaming/windows.py; these batch forms share the semantics and
are the DuckDB-oracle-checked ones.

Scale notes:
- tumbling: one shuffle on (window, event_type); partial aggs combine
  map-side. At 100 TB, time-partitioned input makes the window grouping
  mostly partition-local.
- sessionize: one shuffle on user_id (the window partition key), then
  per-user ordering — the classic sessionization shape. Skewed users
  (bots) are the risk at scale; AQE skew handling or a per-user event
  cap handles them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (hour, event_type): event count + exact value sum."""
    return (
        events.groupBy(
            F.window(F.col("ts"), width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    lag -> boundary flag -> running sum (the standard two-window
    sessionization); both windows share the user_id partitioning so
    there is exactly one shuffle."""
    epoch = F.col("ts").cast("timestamp").cast("long")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_flag = events.withColumn("_ep", epoch).withColumn(
        "_new",
        F.when(
            F.lag("_ep").over(w).isNull()
            | ((F.col("_ep") - F.lag("_ep").over(w)) > gap_seconds),
            1,
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn("session_id", F.sum("_new").over(wrun))
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            (F.max("_ep") - F.min("_ep")).alias("duration_sec"),
        )
    )


def peak_concurrency(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Daily peak number of concurrently-open sessions — the classic
    interval sweep: emit +1 at each session start and -1 at each end,
    order boundaries by time (starts before ends on ties, so a session
    ending exactly when another starts counts as overlap), running-sum
    the deltas, take the max per day.

    The running sum is NOT a global single-task window: it reuses the
    two-phase distributed prefix sum from the stream packer
    (range-partition on the boundary key, O(partitions) totals to the
    driver, partition-local cumsum + broadcast base offsets) — so the
    sweep scales to any boundary count. Per-day max is tie-order
    invariant: within an equal (ts, delta) run the prefix values are a
    fixed multiset regardless of permutation.

    Output: (day, peak_concurrency) measured at boundary instants."""
    from openrouter_batch_processor_spark.operators.chunking import pack_token_counts

    epoch = F.col("ts").cast("timestamp").cast("long")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        events.withColumn("_ep", epoch)
        .withColumn(
            "_new",
            F.when(
                F.lag("_ep").over(w).isNull()
                | ((F.col("_ep") - F.lag("_ep").over(w)) > gap_seconds),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("_new").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(F.min("_ep").alias("s_ep"), F.max("_ep").alias("e_ep"))
    )
    bounds = sess.select(
        F.col("s_ep").alias("ep"), F.lit(1).alias("delta"), "user_id", "session_id"
    ).unionByName(
        sess.select(
            F.col("e_ep").alias("ep"), F.lit(-1).alias("delta"), "user_id", "session_id"
        )
    ).withColumn("sk", -F.col("delta"))  # asc sk => starts (+1) first on ties
    swept = pack_token_counts(
        bounds, "delta", ["ep", "sk", "user_id", "session_id"], capacity=1 << 40
    )
    conc = F.col("start_offset") + F.col("delta")  # inclusive prefix sum
    day = F.date_add(
        F.to_date(F.lit("1970-01-01")), F.floor(F.col("ep") / 86400).cast("int")
    )
    return (
        swept.select(
            F.date_format(day, "yyyy-MM-dd").alias("day"), conc.alias("conc")
        )
        .groupBy("day")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
    )


def session_paths(
    events: DataFrame, gap_seconds: int = 1800, depth: int = 3, topn: int = 10
) -> DataFrame:
    """Top-N session-opening paths: the first ``depth`` event types of
    each gap-session, joined as 'a>b>c', counted across all sessions.

    Session assignment is the same two-window pattern as sessionize
    (shared user_id partitioning, one shuffle). The path is built from
    an array_sort(collect_list(struct(rn, type))) — collect_list order
    is nondeterministic under parallel merge, so the rn key, not
    arrival order, defines the sequence. The final top-N is
    TakeOrdered over the (tiny) distinct-path counts."""
    epoch = F.col("ts").cast("timestamp").cast("long")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = (
        events.withColumn("_ep", epoch)
        .withColumn(
            "_new",
            F.when(
                F.lag("_ep").over(w).isNull()
                | ((F.col("_ep") - F.lag("_ep").over(w)) > gap_seconds),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("_new").over(wrun))
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(*order)
    first_k = with_sid.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= depth
    )
    paths = first_k.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(topn)
    )
