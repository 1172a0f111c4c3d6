"""Cost/usage/progress aggregation (reference ops G2-G6, worker.py:110-176).

The reference folds per-request usage dicts into a 20-field accumulator
with per-field error tolerance (malformed values skipped) and 12-dp
rounding per float add. Distributed shape: one groupBy with partial
(map-side) aggregation — sums and conditional counts are all
combiner-friendly, so the shuffle carries one row per (job, partition),
not per request. try_cast gives the per-field tolerance.

Note on rounding parity: the reference rounds after *every* add;
floating-point sum order differs across partitions, so bit-exact parity
with a sequential fold is not a distributed-sound contract. We sum then
round once — associative, deterministic at any partition count — and pin
the 12-dp display precision at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tolerant_long(col: str) -> "F.Column":
    return F.coalesce(F.col(col).try_cast("long"), F.lit(0))


def _tolerant_double(col: str) -> "F.Column":
    return F.coalesce(F.col(col).try_cast("double"), F.lit(0.0))


TOKEN_FIELDS = [
    "prompt_tokens",
    "completion_tokens",
    "total_tokens",
    "reasoning_tokens",
    "cached_tokens",
    "cache_write_tokens",
    "audio_tokens",
    "video_tokens",
    "image_tokens",
]

COST_FIELDS = ["cost", "upstream_inference_cost", "discount", "upstream_cost"]


def usage_summary(usage: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """G2 + G6: counters, token sums, cost sums per job (or globally).

    Expects an `ok` boolean and optional `is_byok`; any missing numeric
    field may simply be absent from the frame — only present columns are
    aggregated (the reference skips absent nested fields the same way).
    """
    present = set(usage.columns)
    aggs = [
        F.count(F.lit(1)).alias("api_requests"),
        F.count(F.when(F.col("ok"), 1)).alias("successful_requests"),
        F.count(F.when(~F.col("ok"), 1)).alias("failed_requests"),
    ]
    if "is_byok" in present:
        aggs.append(F.count(F.when(F.col("is_byok") == True, 1)).alias("byok_requests"))  # noqa: E712
    for f in TOKEN_FIELDS:
        if f in present:
            aggs.append(F.sum(_tolerant_long(f)).alias(f"{f}_sum"))
    for f in COST_FIELDS:
        if f in present:
            # Sum in DECIMAL(28,12): exact and associative, so the total is
            # identical at any partition count (a double sum is neither).
            aggs.append(
                F.round(
                    F.sum(_tolerant_double(f).cast("decimal(28,12)")).cast("double"),
                    12,
                ).alias(f"{f}_sum")
            )
    grouped = usage.groupBy(*group_cols) if group_cols else usage.groupBy()
    return grouped.agg(*aggs)


# ---------------------------------------------------------------------------
# Per-group linear trend (one-pass OLS)
# ---------------------------------------------------------------------------

# Fixed epoch offset (2024-01-01 UTC): centering x keeps x*x sums small
# enough for exact DECIMAL accumulation. A constant, not a computed min —
# computed centering would need a pre-pass or a non-deterministic plan.
TREND_EPOCH0 = 1704067200


def linear_trend(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    y_col: str = "value",
) -> DataFrame:
    """Per-group OLS slope/intercept of value vs time in ONE aggregation
    pass: the classic mergeable-moments trick (n, sum x, sum y, sum xy,
    sum x^2), then the closed form on the driver-side projection.

    Why not regr_slope(): portability. The moment sums accumulate in
    DECIMAL — exact and associative, so the result is identical at any
    partition count and bit-equal to the DuckDB oracle; a double
    accumulator would drift with partitioning. Slope/intercept are
    evaluated in double only at the very end, from identical decimal
    sums, and rounded at the edge.

    Map-side combine applies (all five moments are sums), so the shuffle
    carries one 5-tuple per (partition, group) — this is the pattern for
    any streaming-friendly statistic at 100 TB."""
    x = (F.unix_timestamp(F.col(ts_col)) - F.lit(TREND_EPOCH0)).alias("x")
    y = F.col(y_col).cast("double").alias("y")
    base = events.select(F.col(group_col), x, y)
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,10)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,10)")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    intercept = (d("sy") - slope * d("sx")) / d("n")
    return agg.select(
        group_col,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def anomaly_zscore(
    events: DataFrame,
    group_col: str = "event_type",
    y_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outliers in two phases: one combiner-friendly
    moments pass (n, sum y, sum y^2 in exact DECIMAL), then a broadcast
    join of the tiny per-group stats back onto the stream and a narrow
    filter |z| > threshold.

    The per-group stats table is O(groups) rows — broadcast, never a
    window over the raw data (a global window would shuffle the full
    dataset per group). Sample std via the sum-of-squares identity on
    exact sums keeps both engines bit-identical."""
    y = F.col(y_col).cast("double")
    stats = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y.cast("decimal(28,10)")).alias("sy"),
        F.sum((y * y).cast("decimal(38,10)")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("sy") / d("n")
    std = F.sqrt((d("n") * d("syy") - d("sy") * d("sy")) / (d("n") * (d("n") - 1)))
    enriched = events.join(
        F.broadcast(stats.select(group_col, mean.alias("_mean"), std.alias("_std"))),
        group_col,
    )
    z = (F.col(y_col).cast("double") - F.col("_mean")) / F.col("_std")
    # _std > 0 guard: a zero-variance group yields z = 0/0 = NaN, and
    # NaN compares GREATER than any threshold in both engines — without
    # the guard every row of a constant group would be "anomalous".
    return (
        enriched.withColumn("z", F.round(z, 6))
        .filter((F.col("_std") > 0) & (F.abs(F.col("z")) > threshold))
        .select("event_id", group_col, F.col(y_col).cast("double").alias(y_col), "z")
    )


def pearson_corr(
    events: DataFrame,
    group_col: str = "event_type",
    x_expr: Column | None = None,
    y_col: str = "value",
) -> DataFrame:
    """Per-group Pearson correlation via the same mergeable-moments
    trick as linear_trend: one pass accumulating (n, sum x, sum x^2,
    sum y, sum y^2, sum xy) with integer/DECIMAL sums, closed form +
    round only at the edge. Identical at any partition count; bit-equal
    to the oracle (a double corr() builtin would drift with the
    reduction order on both engines).

    Default x is hour-of-day — "does this metric correlate with time
    of day per event type" — but any integer Column works. Groups with
    zero variance on either side are filtered (corr undefined)."""
    x = (x_expr if x_expr is not None else F.hour("ts")).cast("long").alias("x")
    y = F.col(y_col).cast("double").alias("y")
    base = events.select(F.col(group_col), x, y)
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(28,10)")).alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,10)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,10)")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * d("syy") - d("sy") * d("sy")
    corr = (d("n") * d("sxy") - d("sx") * d("sy")) / (F.sqrt(var_x) * F.sqrt(var_y))
    return (
        agg.filter((var_x > 0) & (var_y > 0))
        .select(group_col, "n", F.round(corr, 6).alias("corr_x_value"))
    )
