"""Ordered-sequence analytics: per-group EWMA (the applyInPandas
showcase) and event-transition counts.

EWMA is the engine's canonical "genuinely needs Python" operator: the
recurrence e_i = a*x_i + (1-a)*e_{i-1} is order-recursive, so no
built-in window aggregate expresses it. It runs as grouped-map
applyInPandas — each group arrives as ONE Arrow batch, the fold is a
tight numpy-backed loop, and the output is one row per group. State is
bounded by the largest single group (same contract as G1 grouping; a
pathological group would use the salted split). Everything around it —
grouping, shuffle, output schema — stays in the JVM plan.

The fold arithmetic is plain IEEE double multiply-add in a fixed order,
so the DuckDB oracle reproduces it exactly with list_reduce over
array_agg(... ORDER BY ts, event_id) — a real value oracle for a pandas
UDF, not a rows-only smoke.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EWMA_ALPHA = 0.3


def _round_away(x: float, nd: int = 6) -> float:
    """round-half-away-from-zero on the scaled double — the semantics
    DuckDB's round(DOUBLE, n) and Spark's F.round share at ties.
    Python's built-in round() is banker's (half-even) and diverges on
    dyadic values like 1/128 = 0.0078125 (py: 0.007812, engines:
    0.007813), so pandas-side folds must round with THIS before their
    values meet an oracle hash."""
    import math

    s = 10.0 ** nd
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def ewma_last(
    events: DataFrame,
    group_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    y_col: str = "value",
    alpha: float = EWMA_ALPHA,
) -> DataFrame:
    """Final EWMA value per group after folding the full ordered series.

    Output: (group, n, ewma). Deterministic: the intra-group order is
    pinned by ``order_cols`` (sorted inside the pandas batch, not by the
    shuffle, which guarantees nothing)."""
    import pandas as pd

    one_minus = 1.0 - alpha
    cols = [group_col, *order_cols, y_col]

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(list(order_cols))
        e = None
        for x in pdf[y_col].astype("float64"):
            e = x if e is None else alpha * x + one_minus * e
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "n": [len(pdf)], "ewma": [_round_away(e)]}
        )

    return (
        events.select(*cols)
        .groupBy(group_col)
        .applyInPandas(fold, schema=f"{group_col} string, n long, ewma double")
    )


def transition_counts(
    events: DataFrame,
    group_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: lag within the (user, time) window, then one
    combiner-friendly groupBy on (from_state, to_state).

    The window partitions by user — parallel across the cluster, state
    per task is one user's in-flight rows. Output is |states|^2 rows max."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    pairs = events.withColumn("from_state", F.lag(state_col).over(w)).filter(
        F.col("from_state").isNotNull()
    )
    return (
        pairs.groupBy(F.col("from_state"), F.col(state_col).alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event log:
    collapse consecutive identical states per key into [valid_from,
    valid_to) intervals, open-ended for the current state.

    Classic two-window gaps-and-islands: lag() marks state *changes*,
    the filtered change rows get their close timestamp from lead().
    Both windows share one partitioning (key, ordered by ts+tiebreak
    for determinism under equal timestamps), so Spark shuffles ONCE on
    the key and evaluates both functions in the same sort — exactly the
    shape that scales: no global sort, per-key streams, and the second
    window runs on the already-thinned change rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = events.select(
        key_col, state_col, ts_col, tiebreak_col,
        F.lag(state_col).over(w).alias("prev_state"),
    ).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col(state_col))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead(ts_col).over(w2), "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


FUNNEL_EPOCH0 = "2024-01-01 00:00:00"


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each stage k, how many users
    performed stage k STRICTLY AFTER their entry into stage k-1 (entry
    = the earliest qualifying timestamp). Returns (stage_idx, stage,
    n_users, conv_from_prev) with conversion rounded at the edge.

    Execution: stage 1 is a filtered groupBy(user) min(ts); each later
    stage filters the raw stream to its event type and joins the
    (shrinking) previous-stage entry table on user_id before its own
    min — k-1 joins total, each keyed on the same user_id, so under AQE
    they reuse one exchange of the event stream per stage and the
    survivor tables get small enough to broadcast within a few stages.
    No windows, no per-user sequence materialization: at 100 TB the
    event stream is never sorted, only filtered + hash-aggregated."""
    prev_entry: DataFrame | None = None
    counts: list[DataFrame] = []
    for i, stage in enumerate(stages):
        cur = events.filter(F.col(type_col) == stage)
        if prev_entry is not None:
            cur = cur.join(prev_entry, user_col).filter(F.col(ts_col) > F.col("_entry_ts"))
        entry = cur.groupBy(user_col).agg(F.min(ts_col).alias("_entry_ts"))
        counts.append(
            entry.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col("n_users"),
            )
        )
        prev_entry = entry
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    from pyspark.sql.window import Window

    w = Window.orderBy("stage_idx")
    prev_n = F.lag("n_users").over(w)
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(prev_n.isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_users") / prev_n, 6))
        .alias("conv_from_prev"),
    )


def retention_cohorts(
    events: DataFrame,
    epoch0: str = FUNNEL_EPOCH0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = the week of a user's first
    event; a user counts as retained in week_offset w if they have any
    event in cohort_week + w. Returns (cohort_week, week_offset,
    n_users).

    Two aggregations and one join: first-event week per user (shuffle
    on user), then the DISTINCT (user, week) activity pairs join the
    cohort table on user — same key, same partitioning, AQE coalesces —
    and the final count groups by the tiny (cohort, offset) pair. The
    distinct-before-count keeps multi-event weeks from inflating
    retention, and it's the only dedup the plan needs."""
    week = lambda c: F.floor(  # noqa: E731
        (F.unix_timestamp(c) - F.unix_timestamp(F.lit(epoch0).cast("timestamp_ntz")))
        / 604800
    ).cast("long")
    first = events.groupBy(user_col).agg(week(F.min(ts_col)).alias("cohort_week"))
    active = events.select(F.col(user_col), week(F.col(ts_col)).alias("week")).distinct()
    return (
        active.join(first, user_col)
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def linear_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    conversion_type: str = "purchase",
    horizon_hours: int = 24,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value is split
    equally across the user's touch events in the preceding horizon
    (strictly before the conversion); conversions with no touches are
    attributed whole to the '(direct)' channel.

    Execution: one equi-join on user_id carries the time predicate as a
    residual (never a nested-loop range join), then a count window
    keyed by the conversion id (second shuffle), then a tiny per-channel
    rollup. Determinism: the per-touch share value/n is one IEEE
    division, rounded to 12 dp and summed as DECIMAL so the channel
    totals are partition-order invariant.

    Output: (channel, n_attributions, n_purchases, attributed_value).
    n_attributions counts attribution ROWS, not touch events: purchases
    with zero in-horizon touches contribute one '(direct)' row each, so
    for the '(direct)' channel it counts orphan conversions."""
    p = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        F.col("value"),
    )
    t = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("event_id").alias("tid"),
        F.col("user_id"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    horizon = F.expr(f"INTERVAL {horizon_hours} HOURS")
    j = p.join(
        t,
        (p.user_id == t.user_id)
        & (t.tts < p.pts)
        & (t.tts >= p.pts - horizon),
        "left",
    ).select("pid", "value", "tid", "channel")
    n = F.count("tid").over(Window.partitionBy("pid"))
    shares = j.select(
        "pid",
        F.coalesce("channel", F.lit("(direct)")).alias("channel"),
        F.round(
            F.when(n == 0, F.col("value")).otherwise(F.col("value") / n), 12
        )
        .cast("decimal(28,12)")
        .alias("share"),
    )
    return shares.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_attributions"),
        F.count_distinct("pid").alias("n_purchases"),
        F.round(F.sum("share").cast("double"), 6).alias("attributed_value"),
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """CUSUM changepoint detection per event_type (Page 1954): the
    point where the cumulative deviation from the series mean peaks —
    the standard drift/level-shift detector for pipeline telemetry
    (ingest-rate regressions, quality-score drift across a crawl).

    Exactness: cusum_k = prefix_k - k*total/n involves a division, so
    it is computed SCALED as dev_k = n*prefix_k - k*total entirely in
    DECIMAL (exact, associative, partition-count invariant); only the
    final report divides back by n and rounds at the edge. The argmax
    is a row_number over (|dev| DESC, k ASC) — deterministic tie-break
    on the earliest peak.

    Scale shape: one window pass partitioned by event_type (series
    count bounds parallelism; a single monster series is the documented
    windows.py skew case), then a 1-row-per-type reduction. Nothing
    driver-side, state = the window frame."""
    v = F.col("value").cast("decimal(18,6)")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type")
    scored = events.select(
        "event_type",
        "ts",
        "event_id",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
        F.sum(v).over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    ).select(
        "event_type",
        "ts",
        "k",
        "n",
        (F.col("n") * F.col("prefix") - F.col("k") * F.col("total")).alias("dev"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("dev")).desc(), F.col("k").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n"),
            F.col("k").alias("cp_index"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("cp_ts"),
            F.round(F.abs(F.col("dev")).cast("double") / F.col("n"), 6).alias(
                "max_abs_cusum"
            ),
        )
    )


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def holt_linear(
    events: DataFrame,
    group_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    y_col: str = "value",
    alpha: float = HOLT_ALPHA,
    beta: float = HOLT_BETA,
) -> DataFrame:
    """Holt double-exponential smoothing per group (Holt 1957): level
    and trend folded over the ordered series —
      l_i = a*x_i + (1-a)*(l_{i-1} + b_{i-1})
      b_i = g*(l_i - l_{i-1}) + (1-g)*b_{i-1}
    init l_0 = x_0, b_0 = 0 — plus the one-step-ahead forecast
    level + trend. The trend-aware sibling of ewma_last for telemetry
    drift (the reference polls flat progress counters; a trending
    ingest-rate forecast is what a pipeline scheduler actually wants).

    Same contract as ewma_last: grouped-map applyInPandas, intra-group
    order pinned by sorting inside the batch, doubly-recursive fold
    (why no built-in window expresses it), and a true VALUE oracle —
    DuckDB's list_reduce over {level, trend} structs reproduces the
    identical IEEE operation order, with the multiply-add sequence
    written identically on both engines. State per task is one group's
    rows; parallelism = group count (windows.py skew contract)."""
    import pandas as pd

    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    cols = [group_col, *order_cols, y_col]

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(list(order_cols))
        level = None
        trend = 0.0
        for x in pdf[y_col].astype("float64"):
            if level is None:
                level = x
                continue
            new_level = alpha * x + one_minus_a * (level + trend)
            trend = beta * (new_level - level) + one_minus_b * trend
            level = new_level
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [len(pdf)],
                "level": [_round_away(level)],
                "trend": [_round_away(trend)],
                "forecast_1": [_round_away(level + trend)],
            }
        )

    return (
        events.select(*cols)
        .groupBy(group_col)
        .applyInPandas(
            fold,
            schema=f"{group_col} string, n long, level double, trend double, forecast_1 double",
        )
    )


def _hourly_series(events: DataFrame) -> DataFrame:
    """Per-(event_type, hour) counts with a contiguous rank index —
    the shared series frame under ACF / PACF / seasonal decomposition /
    periodogram / Hurst. One shuffle on event_type (a handful of small
    series; each easily fits an executor at any corpus scale because
    the series length is bounded by the time span, not the event
    volume).

    SESSION-STAGED (operators/staging.py): five registry queries (and
    hurst_rs four times internally) derive the same bounded series from
    the same events scan — materializing it once replaces five
    full-table scan+groupBy subtrees with one artifact read, the same
    discipline as the dedup pair tables."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    def _build(ev: DataFrame) -> DataFrame:
        hourly = (
            ev.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("x"))
        )
        w = Window.partitionBy("event_type").orderBy("hour")
        return hourly.withColumn("rn", F.row_number().over(w))

    return staged_from(
        events.select("event_type", "ts"), "hourly_series", _build
    )


def acf_lags(events: DataFrame, max_lag: int = 6) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series per
    event_type, lags 1..max_lag (Box-Jenkins estimator: full-series
    mean and variance in the denominator). Missing hours are skipped —
    the ACF is over the ordered OBSERVED sequence.

    Exactness: counts are integers, so every sum (S = Σx, Q = Σx²,
    Sxy_k = Σ x_t·x_{t-k}, and the lag-trimmed edge sums) is exact in
    DECIMAL(38,0); the estimator is algebraically cleared of the
    rational mean —

        r_k = (n²·Sxy − n·S·(S1k+S2k) + (n−k)·S²) / (n·(n·Q − S²))

    — so num and den are exact integers on both engines, and their
    nearest-double images (and the final IEEE division) are
    bit-identical. Shape: one window pass computes all max_lag lag
    columns, one combiner groupBy folds the sums, the lag unpivot is
    max_lag rows per type."""
    ser = _hourly_series(events)
    w = Window.partitionBy("event_type").orderBy("rn")
    lagged = ser.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"xl{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    ]
    for k in range(1, max_lag + 1):
        xl = F.col(f"xl{k}")
        aggs += [
            F.sum(F.col("x") * xl).cast("long").alias(f"sxy{k}"),
            F.sum(F.when(xl.isNotNull(), F.col("x"))).cast("long").alias(f"s2_{k}"),
            F.sum(xl).cast("long").alias(f"s1_{k}"),
        ]
    folded = lagged.groupBy("event_type").agg(*aggs)
    per_lag = []
    for k in range(1, max_lag + 1):
        dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
        num = (
            dec("n") * dec("n") * dec(f"sxy{k}")
            - dec("n") * dec("s") * (dec(f"s1_{k}") + dec(f"s2_{k}"))
            + (dec("n") - F.lit(k)) * dec("s") * dec("s")
        )
        den = dec("n") * (dec("n") * dec("q") - dec("s") * dec("s"))
        per_lag.append(
            folded.select(
                "event_type",
                F.lit(k).cast("long").alias("lag_k"),
                F.col("n"),
                F.round(num.cast("double") / den.cast("double"), 6).alias("acf"),
            )
        )
    out = per_lag[0]
    for df in per_lag[1:]:
        out = out.unionByName(df)
    return out


def staged_acf_lags(events: DataFrame, max_lag: int = 6) -> DataFrame:
    """Session-staged ACF table (event_type, lag_k, n, acf) at
    max_lag=6, keyed on the events plan: the ACF, PACF and Ljung-Box
    diagnostics all fold the SAME integer lag sums over the same
    hourly series — a production monitoring pass materializes the ACF
    once and every downstream test reads it. Per-lag values are
    independent of max_lag (each lag has its own closed-form
    estimator), so consumers needing fewer lags filter the staged
    table. Output is |event_types| * max_lag rows — trivially bounded."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    return staged_from(
        events.select("event_type", "ts"),
        f"acf_lags:{max_lag}",
        lambda d: acf_lags(d, max_lag),
    )


def seasonal_decompose_hod(events: DataFrame, window_h: int = 25) -> DataFrame:
    """Classic additive seasonal decomposition (the moving-average
    method behind STL's initial pass): per event_type, hourly counts,
    trend = centered 25-hour moving average (only FULL windows count),
    seasonal(hour-of-day) = mean of the detrended series grouped by
    hour-of-day.

    Exactness: detrended values are rationals with denominator 25, so
    the operator carries d25 = 25·x − sum25 (exact BIGINT) and divides
    once at the edge with the integer-micros floor (see bigram_nll) —
    seasonal = ((Σd25 · 10⁷) div (25·cnt)) / 10⁷. Window shuffle on
    event_type only, then a combiner groupBy on (type, hod)."""
    ser = _hourly_series(events)
    half = (window_h - 1) // 2
    w = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-half, half)
    )
    d = ser.select(
        "event_type",
        F.hour("hour").cast("long").alias("hod"),
        (
            F.lit(window_h) * F.col("x") - F.sum("x").over(w)
        ).alias("d25"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == window_h)
    return (
        d.groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("d25").cast("long").alias("_sd"),
        )
        .select(
            "event_type",
            "hod",
            "n_windows",
            (
                F.expr(f"(_sd * 10000000) div ({window_h} * n_windows)").cast("double")
                / F.lit(10000000.0)
            ).alias("seasonal"),
        )
    )


def mad_anomalies(events: DataFrame, k_sigma: float = 3.0) -> DataFrame:
    """Robust anomaly counts per event_type via the median absolute
    deviation: med = lower-median of value, mad = lower-median of
    |value − med|, outlier ⟺ |value − med| > k·1.4826·mad (1.4826
    scales MAD to σ under normality — Hampel's rule). Lower-medians by
    rank are order statistics, so every reported number is an element
    of the data (or an exact |difference| of two doubles) — no
    interpolation, no float-summation order anywhere; the z-score
    variant (events_anomaly_zscore) is the non-robust sibling.

    Shape: two rank-median window passes and the final count all
    shuffle on event_type alone; AQE coalesces the tiny frames."""
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("med"), F.col("n").alias("n_events"))
    )
    dev = events.join(med, "event_type").select(
        "event_type",
        "event_id",
        "n_events",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        dev.select(
            "event_type",
            "dev",
            F.row_number().over(wd).alias("rn"),
            F.col("n_events").alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("dev").alias("mad"))
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(
                F.when(
                    F.col("dev") > F.lit(k_sigma) * F.lit(1.4826) * F.col("mad"), 1
                )
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD = 0.5, 0.3, 0.2, 24
# Fold the LAST window points only (r08): with these parameters the
# additive recurrence is divergent on long series — at sf0.1 (~40k
# points/type) the state reaches ~1e9, where one double ulp (~1e-6)
# equals the 6-dp report grid and cross-engine bit parity of the
# 6-dp-rounded output is no longer guaranteed. A bounded recent window
# is also the defensible forecasting choice (stale history shouldn't
# steer next-step forecasts); magnitudes stay ~series scale, far from
# the ulp cliff.
HW_WINDOW = 4096


def holt_winters_additive(
    events: DataFrame,
    group_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    y_col: str = "value",
    alpha: float = HW_ALPHA,
    beta: float = HW_BETA,
    gamma: float = HW_GAMMA,
    period: int = HW_PERIOD,
) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing per group
    (Winters 1960) — the seasonal third equation on top of
    holt_linear:
      l_i = a*(x_i - s_{i-m}) + (1-a)*(l_{i-1} + b_{i-1})
      b_i = g*(l_i - l_{i-1}) + (1-g)*b_{i-1}
      s_i = c*(x_i - l_i) + (1-c)*s_{i-m}
    init l_0 = x_0, b_0 = 0, s = 0 (the first m steps behave like
    Holt while the seasonal ring warms up — documented simple init so
    the oracle can reproduce it). Forecast_1 = l + b + s_{next}.

    The seasonal state is a ROTATING ring: s_{i-m} is always the ring
    head, the update appends at the tail — which is exactly what makes
    the DuckDB oracle expressible: list_reduce over 2+m-wide list
    accumulators ([l, b] || acc[4:m+2] || [s_new]), every element
    evaluated against the OLD accumulator (the struct-accumulator
    field-leak bug in DuckDB 1.0 does not apply to list construction;
    see events_holt_forecast). IEEE multiply-add order is written
    identically in the pandas fold and the SQL lambda — verified
    bit-identical. Same scale contract as ewma_last/holt_linear:
    grouped-map applyInPandas, state = one group's series."""
    import pandas as pd

    cols = [group_col, *order_cols, y_col]

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from collections import deque

        pdf = pdf.sort_values(list(order_cols))
        n_total = len(pdf)
        pdf = pdf.tail(HW_WINDOW)
        level = None
        trend = 0.0
        ring: deque = deque([0.0] * period)
        for x in pdf[y_col].astype("float64"):
            if level is None:
                level = x
                continue
            s_tm = ring[0]
            new_level = alpha * (x - s_tm) + (1.0 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            s_new = gamma * (x - new_level) + (1.0 - gamma) * s_tm
            ring.popleft()
            ring.append(s_new)
            level = new_level
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n_total],
                "level": [_round_away(level)],
                "trend": [_round_away(trend)],
                "s_next": [_round_away(ring[0])],
                "forecast_1": [_round_away(level + trend + ring[0])],
            }
        )

    return (
        events.select(*cols)
        .groupBy(group_col)
        .applyInPandas(
            fold,
            schema=(
                f"{group_col} string, n long, level double, trend double, "
                "s_next double, forecast_1 double"
            ),
        )
    )


def mann_kendall_sen(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope per event-type daily
    series (Mann 1945; Kendall 1975; Sen 1968) — the nonparametric
    trend audit for metric series (no normality assumption, robust to
    outliers, the standard for monitoring drift in operational
    counts): S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, continuity-
    corrected Z, and Sen's slope = median of all pairwise slopes.

    Exactness: daily values are order-independent DECIMAL sums, so
    sign comparisons and tie groups are integer-exact cross-engine; S,
    the tie term and Var's numerator are BIGINTs; only Z and the slope
    touch doubles (identical per-row IEEE ops). The pairwise median
    picks order statistics by row_number — slope ties straddling the
    middle ranks yield equal values, so tie order cannot change the
    result.

    Scale: the daily aggregate is ONE combiner groupBy (the only
    corpus-sized pass); everything after runs on the dimension-sized
    (type × day) table — the O(n²) pair join is n = days-per-series,
    bounded by the calendar, never by event volume. Windows partition
    by event_type, so frame state is series-bounded."""
    daily = (
        events.select(
            F.col("event_type"),
            F.to_date("ts").alias("day"),
            F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("x"))
    )
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    sgn = (
        F.when(F.col("x2") > F.col("x1"), F.lit(1))
        .when(F.col("x2") < F.col("x1"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    slope = (F.col("x2") - F.col("x1")).cast("double") / F.datediff(
        F.col("d2"), F.col("d1")
    )
    p = pairs.select("event_type", sgn.alias("sg"), slope.alias("slope"))
    s_stat = p.groupBy("event_type").agg(
        F.sum("sg").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    mw = Window.partitionBy("event_type").orderBy("slope")
    ranked = p.select(
        "event_type", "slope", F.row_number().over(mw).alias("rk")
    ).join(s_stat.select("event_type", "m"), "event_type")
    lo = (F.col("m") + 1) / 2
    sen = (
        ranked.filter(
            (F.col("rk") == F.floor(lo)) | (F.col("rk") == F.ceil(lo))
        )
        .groupBy("event_type")
        .agg((F.sum("slope") / F.count(F.lit(1))).alias("sen_raw"))
    )
    j = (
        s_stat.join(nd, "event_type")
        .join(ties, "event_type")
        .join(sen, "event_type")
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (F.lit(2) * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.round(F.col("sen_raw"), 6).alias("sen_slope"),
        F.when(z > 1.959964, F.lit("increasing"))
        .when(z < -1.959964, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


def pacf_lags(events: DataFrame, max_lag: int = 5) -> DataFrame:
    """Partial autocorrelation (lags 1..max_lag) of the hourly
    event-count series per event type, via the Durbin-Levinson
    recursion (Box-Jenkins 1970 §3.2.36) unrolled over the ACF values
    — the AR-order diagnostic that complements acf_lags (an AR(p)
    series shows PACF cut-off after lag p where the ACF only decays).

    Exactness: inputs are the 6-dp-rounded ACF values (already
    engine-agreed by acf_lags' integer estimator), and the recursion
    is pure per-row double arithmetic on one dimension-sized row per
    event type with every sum written in fixed left-to-right order —
    deterministic cross-engine per the repo's float-parity recipe.

    Shape: acf_lags' one window pass + one combiner groupBy, then a
    |event_types|-row pivot and an unpivot back to max_lag rows per
    type. No corpus-sized operation beyond the ACF's own."""
    if not (1 <= max_lag <= 5):
        raise ValueError("pacf_lags supports max_lag in 1..5 (unrolled)")
    acf = staged_acf_lags(events, 6).filter(F.col("lag_k") <= max_lag)
    piv = acf.groupBy("event_type").agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("lag_k") == k, F.col("acf"))).alias(f"r{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    # Durbin-Levinson, unrolled: phi[k][j] columns named p{k}{j}
    cur = piv.withColumn("p11", F.col("r1"))
    phis = {(1, 1): "p11"}
    for k in range(2, max_lag + 1):
        num = F.col(f"r{k}")
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - F.col(phis[(k - 1, j)]) * F.col(f"r{k - j}")
            den = den - F.col(phis[(k - 1, j)]) * F.col(f"r{j}")
        cur = cur.withColumn(f"p{k}{k}", num / den)
        phis[(k, k)] = f"p{k}{k}"
        for j in range(1, k):
            cur = cur.withColumn(
                f"p{k}{j}",
                F.col(phis[(k - 1, j)])
                - F.col(f"p{k}{k}") * F.col(phis[(k - 1, k - j)]),
            )
            phis[(k, j)] = f"p{k}{j}"
    arms = [
        cur.select(
            "event_type",
            F.lit(k).cast("long").alias("lag_k"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col(phis[(k, k)]), 6).alias("pacf"),
        )
        for k in range(1, max_lag + 1)
    ]
    out = arms[0]
    for df in arms[1:]:
        out = out.unionByName(df)
    return out


def ljung_box(events: DataFrame, max_lag: int = 6) -> DataFrame:
    """Ljung-Box portmanteau white-noise test per event type over the
    hourly count series (Ljung & Box 1978): Q = n(n+2)·Σ r_k²/(n−k)
    from the integer-exact ACF values, plus the Wilson-Hilferty
    normal approximation of the chi-square tail as a closed-form
    z-score (no incomplete-gamma needed — deterministic cross-engine).

    Exactness: r_k are acf_lags' 6-dp-agreed doubles; each summand
    r_k²/(n−k) is rounded to 12 dp and decimal-summed, the n(n+2)
    scaling stays in DECIMAL, and the z transform is per-row double
    arithmetic from the agreed Q.

    Shape: one read of the staged ACF table + a max_lag-row-per-type
    pivot sum."""
    acf = staged_acf_lags(events, 6).filter(F.col("lag_k") <= max_lag)
    contrib = F.round(
        (F.col("acf") * F.col("acf"))
        / (F.col("n") - F.col("lag_k")).cast("double"),
        12,
    ).cast("decimal(28,12)")
    agg = acf.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(contrib).alias("ssum"),
    )
    # n(n+2) stays in BIGINT (exact to n ~ 3e9, ANSI raises past it);
    # the product with the agreed decimal sum is ONE double multiply —
    # chained decimal multiplication would hit Spark's precision-cap
    # scale reduction, which silently rounds and breaks oracle parity
    q = (F.col("n") * (F.col("n") + 2)).cast("double") * F.col("ssum").cast(
        "double"
    )
    m = float(max_lag)
    # Wilson-Hilferty: ((Q/m)^(1/3) − (1 − 2/(9m))) / sqrt(2/(9m))
    z = (
        F.pow(q / F.lit(m), F.lit(1.0 / 3.0))
        - F.lit(1.0 - 2.0 / (9.0 * m))
    ) / F.lit((2.0 / (9.0 * m)) ** 0.5)
    return agg.select(
        "event_type",
        "n",
        F.lit(max_lag).cast("long").alias("df"),
        F.round(q, 6).alias("q_stat"),
        F.round(z, 6).alias("z_wh"),
    )


def runs_test(events: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test per event-type daily series (Wald &
    Wolfowitz 1940) — the nonparametric randomness check that
    complements Mann-Kendall (trend) and Ljung-Box (autocorrelation):
    too FEW runs of above/below-median days means clustering/regimes,
    too many means negative serial dependence. The monitoring question
    it answers: "is this metric stream exchangeable, or does it have
    structure my sampler should know about?"

    Construction: daily DECIMAL sums (integer-exact cross-engine);
    the reference cut is the LOWER MEDIAN by (value, day) row_number —
    deterministic under ties; days equal to the median value drop
    (the classical treatment). R = 1 + sign changes over day order;
    E[R] = 2·n1·n2/(n1+n2) + 1 and Var[R] =
    2·n1·n2·(2·n1·n2 − n1 − n2) / ((n1+n2)² · (n1+n2−1)) are exact
    integer arithmetic until the final division; z touches doubles
    once. Scale: one combiner groupBy to days, then everything is
    calendar-bounded; windows partition per series.

    Output: (event_type, n_days, n_above, n_below, n_runs, z)."""
    daily = (
        events.select(
            F.col("event_type"),
            F.to_date("ts").alias("day"),
            F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("x"))
    )
    wv = Window.partitionBy("event_type").orderBy(F.asc("x"), F.asc("day"))
    ranked = daily.withColumn("rnk", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    med = ranked.filter(
        F.col("rnk") == F.floor((F.col("n") + 1) / 2)
    ).select("event_type", F.col("x").alias("med"))
    lab = (
        daily.join(med, "event_type")
        .filter(F.col("x") != F.col("med"))
        .select(
            "event_type",
            "day",
            (F.col("x") > F.col("med")).cast("int").alias("s"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    runs = lab.withColumn(
        "chg",
        F.when(
            F.lag("s").over(wd).isNull() | (F.col("s") != F.lag("s").over(wd)),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("s").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n_below"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    n1, n2, r = F.col("n_above"), F.col("n_below"), F.col("n_runs")
    nn = n1 + n2
    two = F.lit(2.0)
    mean_r = two * n1 * n2 / nn + F.lit(1.0)
    var_r = (
        two * n1 * n2 * (two * n1 * n2 - n1 - n2)
        / (nn.cast("double") * nn.cast("double") * (nn - F.lit(1)))
    )
    return agg.select(
        "event_type",
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        F.round((r - mean_r) / F.sqrt(var_r), 6).alias("z"),
    )


def page_hinkley(events: DataFrame) -> DataFrame:
    """Page-Hinkley upward-drift detector per event_type (Page 1954;
    Hinkley 1971; the streaming-drift test of Gama et al.'s
    concept-drift survey): PH_t = G_t − min_{s≤t} G_s where
    G_t = Σ(x_i − μ) — unlike CUSUM's global |peak| this RESETS at the
    running minimum, so it measures the largest sustained upward run,
    the shape of a rate/quality regression that starts mid-series.

    Exactness: G is computed SCALED as D_k = n·prefix_k − k·total in
    DECIMAL (exact, partition-count invariant; the cusum_changepoints
    discipline), the running min is a second window pass over the same
    order, and the single division by n happens at the report edge.
    Argmax tie-break: earliest k.

    Output: one row per event_type — (event_type, n, alarm_index,
    alarm_ts, max_ph)."""
    v = F.col("value").cast("decimal(18,6)")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type")
    scored = events.select(
        "event_type",
        "ts",
        "event_id",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
        F.sum(v).over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    ).select(
        "event_type",
        "ts",
        "k",
        "n",
        (F.col("n") * F.col("prefix") - F.col("k") * F.col("total")).alias("dev"),
    )
    wmin = Window.partitionBy("event_type").orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ph = scored.withColumn("runmin", F.min("dev").over(wmin)).withColumn(
        "ph", F.col("dev") - F.col("runmin")
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("ph").desc(), F.col("k").asc()
    )
    return (
        ph.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n",
            F.col("k").alias("alarm_index"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("alarm_ts"),
            F.round(F.col("ph").cast("double") / F.col("n"), 6).alias("max_ph"),
        )
    )


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend per event_type over the DAILY count
    series (Theil 1950; Sen 1968): the median of all pairwise slopes
    (c_j − c_i)/(d_j − d_i) — the slope estimator with a 29.3%
    breakdown point that one crawler outage day cannot drag the way
    OLS's single leverage point can; the standard companion to the
    Mann-Kendall test already in the registry.

    Exactness: slopes are single double divisions of exact integers
    (count delta over whole-day delta); the median follows the
    stats_exact_median convention — lower/upper middle by row_number
    over (slope, i, j), averaged, so even-count ties are deterministic.

    Scale: the pair stage is O(days²) per type — days, not events
    (90 days → ~4k pairs); the day rollup is one combiner groupBy."""
    daily = (
        events.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "event_type",
            F.datediff(F.col("day"), F.lit("2024-01-01")).cast("long").alias("d"),
            "c",
        )
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("c").alias("c2")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            "d1",
            "d2",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
        )
    )
    wcnt = Window.partitionBy("event_type")
    wrank = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wrank).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wcnt).cast("long").alias("m"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("m") / 2) + 1)
    )
    return mid.groupBy("event_type").agg(
        F.min("m").alias("n_pairs"),
        F.round(
            F.sum(F.col("slope").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("sen_slope"),
    )


BENFORD_P = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}


def benford_digits(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Benford's-law first-digit audit over the event values (Benford
    1938; the classic fabricated/synthetic-data detector — organically
    generated magnitudes follow P(d) = log10(1 + 1/d), generator
    artifacts don't): per leading digit, observed count/share vs the
    Benford share and the chi-square contribution.

    Exactness without logs: values carry 2 decimals, so the leading
    digit is the first character of the exact integer cents
    round(v·100) — pure string/integer work, no log10 boundary risk.
    The Benford shares are embedded 12-dp literals (identical on both
    engines). Output: (digit, n_obs, frac_obs, benford_p, chi2_term),
    one row per observed digit 1-9."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    d = F.substring(cents.cast("string"), 1, 1).cast("long")
    obs = (
        events.filter(F.col(value_col) > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    p = F.create_map(
        *[F.lit(x) for kv in BENFORD_P.items() for x in kv]
    )[F.col("digit")]
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("n"), 6).alias("frac_obs"),
            p.alias("benford_p"),
            F.round(
                (F.col("n_obs") - F.col("n") * p)
                * (F.col("n_obs") - F.col("n") * p)
                / (F.col("n") * p),
                6,
            ).alias("chi2_term"),
        )
    )


def interarrival_exp_fit(events: DataFrame) -> DataFrame:
    """Inter-arrival exponential-fit audit per event_type: MLE rate
    λ = 1/mean(gap) and the Kolmogorov-Smirnov distance between the
    empirical gap distribution and Exp(λ) — the Poisson-process sanity
    check on event streams (a KS far from 0 means bursty or scheduled
    traffic, which changes watermark and sessionization tuning).

    Gaps are exact integer microseconds (unix_micros lag); the mean is
    an exact integer sum divided once; F(gap) = 1 − exp(−λ·gap) is
    per-row double (the validated exp parity path); the KS max is over
    both one-sided deviations at each sorted gap (row_number ordered
    by (gap, arrival index) — deterministic ties). Output:
    (event_type, n_gaps, mean_gap_s, ks_d)."""
    # epoch micros is monotone in ts, so ordering by (us, event_id)
    # equals the (ts, event_id) arrival order
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    g = (
        events.select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
        .withColumn("prev", F.lag("us").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "event_type", (F.col("us") - F.col("prev")).alias("gap_us")
        )
    )
    n = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_us"),
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    r = (
        g.join(n, "event_type")
        .withColumn("rn", F.row_number().over(wr).cast("long"))
        .select(
            "event_type",
            "n_gaps",
            "sum_us",
            "rn",
            (
                F.lit(1.0)
                - F.exp(
                    -F.col("gap_us")
                    * F.col("n_gaps")
                    / F.col("sum_us")
                )
            ).alias("fx"),
        )
        .select(
            "event_type",
            "n_gaps",
            "sum_us",
            F.greatest(
                F.abs(F.col("rn") / F.col("n_gaps") - F.col("fx")),
                F.abs((F.col("rn") - 1) / F.col("n_gaps") - F.col("fx")),
            ).alias("dev"),
        )
    )
    return r.groupBy("event_type").agg(
        F.min("n_gaps").alias("n_gaps"),
        F.round(
            (F.min("sum_us") / F.min("n_gaps")) / F.lit(1_000_000.0), 6
        ).alias("mean_gap_s"),
        F.round(F.max("dev"), 6).alias("ks_d"),
    )


# ===========================================================================
# Round 9: spectral / long-memory / robust-dispersion diagnostics
# ===========================================================================

import math

PERIODOGRAM_PERIODS = (3, 4, 6, 8, 12, 24, 48, 168)


def _trig_table(period: int, fn) -> list[float]:
    """cos/sin of 2*pi*phase/period for phase 0..period-1, computed
    ONCE in Python and embedded as literals on both engines — the trig
    values never touch either engine's libm, so the periodogram sums
    are bit-identical cross-engine by construction."""
    w = 2.0 * math.pi / period
    return [fn(w * t) for t in range(period)]


def periodogram_topk(events: DataFrame) -> DataFrame:
    """Schuster periodogram of the hourly event-count series per
    event_type at the calendar candidate periods (3h..weekly): power
    P(T) = (C_T^2 + S_T^2)/n with C_T = sum x_t*cos(2*pi*t/T), ranked
    per type — the seasonality detector that tells the rollup/window
    layer which cycle lengths are real before it materializes them.

    Exactness: trig factors come from an embedded Python-computed
    table indexed by t mod T (integer phase), so each addend is
    x_t (integer) times an identical double literal on both engines;
    addends round to 9 dp and fold in DECIMAL(28,9) — order-free and
    engine-free. Scale: one hourly rollup (combiner groupBy), then one
    pass emitting |periods| addend pairs per point; series length is
    bounded by the time span, never the event volume."""
    ser = _hourly_series(events)  # event_type, hour, x, rn
    t = F.col("rn") - 1
    rows = []
    from openrouter_batch_processor_spark.functions.litarrays import (
        lit_double_array,
    )

    for p in PERIODOGRAM_PERIODS:
        cos_t = lit_double_array(_trig_table(p, math.cos))
        sin_t = lit_double_array(_trig_table(p, math.sin))
        phase = (t % p).cast("int")
        rows.append(
            ser.select(
                "event_type",
                F.lit(p).cast("long").alias("period_h"),
                F.col("x"),
                F.round(F.col("x") * F.element_at(cos_t, phase + 1), 9)
                .cast("decimal(28,9)").alias("xc"),
                F.round(F.col("x") * F.element_at(sin_t, phase + 1), 9)
                .cast("decimal(28,9)").alias("xs"),
            )
        )
    u = rows[0]
    for df in rows[1:]:
        u = u.unionByName(df)
    agg = u.groupBy("event_type", "period_h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xc").cast("double").alias("c"),
        F.sum("xs").cast("double").alias("s"),
    )
    power = F.round(
        (F.col("c") * F.col("c") + F.col("s") * F.col("s")) / F.col("n"), 6
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("power"), F.asc("period_h")
    )
    return (
        agg.select("event_type", "period_h", "n", power.alias("power"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


HURST_SIZES = (8, 16, 32, 64)


def hurst_rs(events: DataFrame) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
    Mandelbrot & Wallis 1969) of the hourly count series per
    event_type: for each block size n, the series splits into full
    blocks, each block's R/S is the range of its cumulative
    mean-deviations over its population std, and H is the log-log
    slope of mean R/S against n — H≈0.5 memoryless, H>0.5 long-range
    dependent (bursty crawl traffic), H<0.5 mean-reverting.

    Exactness: with S,Q the block's integer sum/sum-of-squares and
    cum_i the integer prefix sum, n*R = max_i(n*cum_i - i*S) -
    min_i(...) and n^2*var = n*Q - S^2 are EXACT integers, and
    R/S = (n*R)/sqrt(n*Q - S^2) — one sqrt and one division of exact
    integers, bit-identical cross-engine. ln(R/S) is the validated
    per-row ln path (the regression is scale-free, so natural log
    works as well as log2 and avoids the engines' differing log2
    implementations); the ln(n) abscissae are Python-computed literals
    embedded on both engines; block means fold 9-dp DECIMAL; the final
    slope is a closed-form regression on exact conditional-agg sums.

    Scale: series length is span-bounded (not volume-bounded); every
    stage is a combiner groupBy or a bounded window within (type,
    block)."""
    ser = _hourly_series(events)  # event_type, x, rn
    # ALL block sizes in ONE window pass (guide §2.4 "remove shuffles
    # outright"): the per-size union re-ran the identical
    # window+groupBy chain over the same bounded series four times
    # (4x3 window frames, 4 unioned subtrees, ~14 AQE stages); with nb
    # exploded into the partition key it is one window chain and one
    # aggregation chain. Per-(nb, blk) arithmetic is unchanged — nb is
    # the same exact long, blocks and their integer sums identical —
    # so every lrs and the regression inputs are bit-identical.
    blk = ser.select(
        "event_type",
        "x",
        "rn",
        F.explode(
            F.array(*[F.lit(nb).cast("long") for nb in HURST_SIZES])
        ).alias("nb"),
    ).select(
        "event_type",
        "nb",
        "x",
        ((F.col("rn") - 1) / F.col("nb")).cast("long").alias("blk"),
        "rn",
    )
    wb = Window.partitionBy("event_type", "nb", "blk")
    wcum = (
        Window.partitionBy("event_type", "nb", "blk")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wi = Window.partitionBy("event_type", "nb", "blk").orderBy("rn")
    scored = blk.select(
        "event_type",
        "nb",
        "blk",
        F.count(F.lit(1)).over(wb).cast("long").alias("cnt"),
        F.sum("x").over(wb).cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("long").alias("q"),
        F.sum("x").over(wcum).cast("long").alias("cum"),
        F.row_number().over(wi).cast("long").alias("i"),
    ).filter(F.col("cnt") == F.col("nb"))
    dev = (F.col("nb") * F.col("cum") - F.col("i") * F.col("s")).alias("dev")
    rs = (
        scored.select("event_type", "nb", "blk", "s", "q", dev)
        .groupBy("event_type", "nb", "blk", "s", "q")
        .agg((F.max("dev") - F.min("dev")).cast("long").alias("rn_range"))
        .withColumn(
            "varn",
            (F.col("nb") * F.col("q") - F.col("s") * F.col("s")).cast("long"),
        )
        .filter((F.col("varn") > 0) & (F.col("rn_range") > 0))
        .select(
            "event_type",
            "nb",
            (
                F.log(
                    F.col("rn_range").cast("double")
                    / F.sqrt(F.col("varn").cast("double"))
                )
            ).alias("lrs"),
        )
    )
    u = rs.groupBy("event_type", "nb").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (
            F.sum(F.round(F.col("lrs"), 9).cast("decimal(28,9)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("mean_lrs"),
    ).withColumnRenamed("nb", "block_n")
    lx = F.create_map(
        *[F.lit(v) for nb in HURST_SIZES for v in (nb, math.log(nb))]
    )[F.col("block_n")]
    pts = u.select("event_type", "block_n", "n_blocks", "mean_lrs", lx.alias("lx"))
    reg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.round(F.col("lx"), 9).cast("decimal(28,9)")).cast("double").alias("sx"),
        F.sum(F.round(F.col("mean_lrs"), 9).cast("decimal(28,9)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("mean_lrs"), 9).cast("decimal(28,9)"))
        .cast("double").alias("sxy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 9).cast("decimal(28,9)"))
        .cast("double").alias("sxx"),
    )
    hurst = F.round(
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return pts.join(
        reg.select("event_type", hurst.alias("hurst")), "event_type"
    ).select(
        "event_type",
        "block_n",
        "n_blocks",
        F.round("mean_lrs", 6).alias("mean_ln_rs"),
        "hurst",
    )


def tukey_fences(events: DataFrame, k_iqr: float = 1.5) -> DataFrame:
    """Tukey box-plot outlier fences per event_type (Tukey 1977):
    exact rank-based quartiles (q1 at ceil(n/4), q3 at ceil(3n/4),
    ties broken by event_id — the engine-portable stats_exact_median
    convention, no interpolation), fences at q +/- 1.5*IQR, and the
    outlier counts outside them — the robust-dispersion screen that
    flags value-distribution drift without moment assumptions.

    Both quartiles are REAL data values picked by rank, so every
    downstream comparison is on identical doubles cross-engine. Two
    shuffles on event_type (rank window + count join), both
    combiner-friendly."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    )
    q1r = F.floor((F.col("n") + 3) / 4)
    q3r = F.floor((3 * F.col("n") + 3) / 4)
    quarts = (
        ranked.filter((F.col("rn") == q1r) | (F.col("rn") == q3r))
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min(F.when(F.col("rn") == q1r, F.col("value"))).alias("q1"),
            F.max(F.when(F.col("rn") == q3r, F.col("value"))).alias("q3"),
        )
    )
    lo = F.col("q1") - F.lit(k_iqr) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(k_iqr) * (F.col("q3") - F.col("q1"))
    fenced = quarts.select(
        "event_type", "n", "q1", "q3", lo.alias("lo"), hi.alias("hi")
    )
    joined = events.select("event_type", "value").join(
        F.broadcast(fenced), "event_type"
    )
    return joined.groupBy("event_type").agg(
        F.min("n").alias("n_events"),
        F.round(F.min("q1"), 6).alias("q1"),
        F.round(F.min("q3"), 6).alias("q3"),
        F.round(F.min(F.col("q3") - F.col("q1")), 6).alias("iqr"),
        F.round(F.min("lo"), 6).alias("lo_fence"),
        F.round(F.min("hi"), 6).alias("hi_fence"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("long").alias("n_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("long").alias("n_high"),
        F.round(
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
                ).otherwise(0)
            )
            / F.min("n"),
            6,
        ).alias("outlier_frac"),
    )


def mood_median_test(events: DataFrame) -> DataFrame:
    """Mood's median test across event_types (Mood 1950): counts above
    vs at-or-below the GRAND lower median of value per type, expected
    counts under homogeneity, per-type chi-square contributions and
    the overall statistic — the nonparametric "do these streams share
    a location?" check (df = k-1).

    The grand median is exact WITHOUT a global row window: values
    carry 2 decimals (the Benford integer-cents invariant), so the
    median is read off a cents-histogram cumulative — the histogram is
    value-domain-bounded, never event-volume-bounded, which is what
    keeps this shape alive at 100 TB. All cell counts and margins are
    exact integers; expected counts and chi2 terms are double
    arithmetic on those integers (identical cross-engine); the k-term
    chi2 total folds 9-dp DECIMAL."""
    cents = events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    )
    hist = cents.groupBy("cv").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("cv").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cv",
        F.sum("cnt").over(wcum).cast("long").alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("nn_all"),
    )
    med = (
        cum.filter(F.col("cum") >= F.floor((F.col("nn_all") + 1) / 2))
        .agg(F.min("cv").alias("med_cv"))
    )
    cells = (
        cents.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            (F.min("med_cv") / F.lit(100.0)).alias("grand_median"),
            F.sum(F.when(F.col("cv") > F.col("med_cv"), 1).otherwise(0))
            .cast("long").alias("n_above"),
            F.sum(F.when(F.col("cv") <= F.col("med_cv"), 1).otherwise(0))
            .cast("long").alias("n_below"),
        )
    )
    tot = cells.agg(
        F.sum("n_above").cast("long").alias("ta"),
        F.sum("n_below").cast("long").alias("tb"),
        (F.sum("n_above") + F.sum("n_below")).cast("long").alias("nn"),
    )
    t = cells.crossJoin(F.broadcast(tot))
    ea = F.col("ta") * (F.col("n_above") + F.col("n_below")) / F.col("nn")
    eb = F.col("tb") * (F.col("n_above") + F.col("n_below")) / F.col("nn")
    term = (F.col("n_above") - ea) * (F.col("n_above") - ea) / ea + (
        F.col("n_below") - eb
    ) * (F.col("n_below") - eb) / eb
    scored = t.select(
        "event_type",
        "grand_median",
        "n_above",
        "n_below",
        F.round(ea, 6).alias("exp_above"),
        F.round(term, 6).alias("chi2_term"),
        F.round(term, 9).cast("decimal(28,9)").alias("_t9"),
    )
    chi2 = scored.agg(
        F.round(F.sum("_t9").cast("double"), 6).alias("chi2_stat")
    )
    return scored.drop("_t9").crossJoin(F.broadcast(chi2))


def seasonal_strength(events: DataFrame, window_h: int = 25) -> DataFrame:
    """Seasonal-strength score per event_type (Hyndman &
    Athanasopoulos, FPP: F_S = max(0, 1 − Var(remainder)/
    Var(detrended))): how much of the detrended hourly variance the
    hour-of-day seasonal component actually explains — the one number
    that says whether the rollup layer should materialize the daily
    cycle (events_seasonal_decompose reports the component; this
    scores it).

    Exactness: detrended carries the decompose's exact ×25 integer
    (d25); the seasonal component is the same 7-dp floored rational
    (s7/1e7); remainder r = d25/25 − s7/1e7 is built from
    engine-identical doubles; both variances fold 9-dp DECIMAL sums
    of r/r² (and d/d²) and close with the (n·Q − S²)/n² double form.
    Shape: the decompose's window pass + one (type,hod) broadcast
    join + one combiner groupBy."""
    ser = _hourly_series(events)
    half = (window_h - 1) // 2
    w = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-half, half)
    )
    d = ser.select(
        "event_type",
        F.hour("hour").cast("long").alias("hod"),
        (F.lit(window_h) * F.col("x") - F.sum("x").over(w)).alias("d25"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == window_h)
    seas = (
        d.groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("d25").cast("long").alias("sd"))
        .select(
            "event_type",
            "hod",
            F.expr(f"(sd * 10000000) div ({window_h} * cnt)").cast("long").alias("s7"),
        )
    )
    j = d.join(F.broadcast(seas), ["event_type", "hod"])
    dd = F.col("d25") / F.lit(float(window_h))
    r = dd - F.col("s7") / F.lit(1e7)
    dec = lambda c: F.sum(F.round(c, 9).cast("decimal(28,9)")).cast("double")  # noqa: E731
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dec(dd).alias("sd_"),
        dec(dd * dd).alias("qd"),
        dec(r).alias("sr"),
        dec(r * r).alias("qr"),
    )
    var_d = (F.col("n") * F.col("qd") - F.col("sd_") * F.col("sd_")) / (
        F.col("n") * F.col("n")
    )
    var_r = (F.col("n") * F.col("qr") - F.col("sr") * F.col("sr")) / (
        F.col("n") * F.col("n")
    )
    return agg.select(
        "event_type",
        "n",
        F.round(var_d, 6).alias("var_detrended"),
        F.round(var_r, 6).alias("var_remainder"),
        F.round(F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_d), 6).alias(
            "seasonal_strength"
        ),
    )


def welch_ttest(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Welch's unequal-variance t-test between every event_type pair
    (Welch 1947): t = (m_a − m_b)/sqrt(v_a/n_a + v_b/n_b) with the
    Welch-Satterthwaite df — the location-shift screen that, unlike
    Mood's median test, quantifies the shift in value units.

    Values are exact integer cents (the Benford invariant), so each
    group's (n, S, Q) triple is exact BIGINT and mean/variance are
    single double expressions of exact integers — engine-identical.
    The pair stage is a k²-row broadcast over the k-row group table."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    g = events.select("event_type", cents.alias("cv")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cv").cast("long").alias("s"),
        F.sum(F.col("cv") * F.col("cv")).cast("long").alias("q"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na"),
        F.col("s").alias("sa"), F.col("q").alias("qa"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb"),
        F.col("s").alias("sb"), F.col("q").alias("qb"),
    )
    p = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    # means in value units; sample variances (n-1) in value^2 units
    ma = F.col("sa") / (F.lit(100.0) * F.col("na"))
    mb = F.col("sb") / (F.lit(100.0) * F.col("nb"))
    va = (
        (F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).cast("double")
        / (F.col("na").cast("double") * (F.col("na") - 1))
    ) / F.lit(10000.0)
    vb = (
        (F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).cast("double")
        / (F.col("nb").cast("double") * (F.col("nb") - 1))
    ) / F.lit(10000.0)
    se2a = va / F.col("na")
    se2b = vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2a + se2b)
    df = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (F.col("na") - 1) + se2b * se2b / (F.col("nb") - 1)
    )
    return p.select(
        "type_a", "type_b", "na", "nb",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


def kruskal_wallis(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Kruskal-Wallis H test of value across event_types (Kruskal &
    Wallis 1952): the rank-based k-sample location test — the
    nonparametric ANOVA that backs "do these streams draw from the
    same distribution?" without normality assumptions.

    Midranks come off the integer-cents VALUE HISTOGRAM (the Mood's
    median shape): rank2(cv) = 2*cum - cnt + 1 is twice the midrank,
    an exact BIGINT, so rank sums are exact integers and the tie
    correction folds cnt^3 terms as DECIMAL(38,0). The histogram is
    value-domain-bounded, never event-volume-bounded — the only
    corpus-sized stages are two combiner groupBys (cv histogram,
    per-type rank sums) and a broadcast rank-lookup join. H and the
    tie-corrected H are double expressions of exact integers, folded
    9-dp across the k group terms."""
    cents = events.select(
        "event_type", F.round(F.col(value_col) * 100).cast("long").alias("cv")
    )
    hist = cents.groupBy("cv").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("cv").rowsBetween(Window.unboundedPreceding, 0)
    ranks = hist.select(
        "cv",
        "cnt",
        (2 * F.sum("cnt").over(wcum) - F.col("cnt") + 1).cast("long").alias("mr2"),
    )
    tot = hist.agg(
        F.sum("cnt").cast("long").alias("nn"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * F.col("cnt").cast("decimal(38,0)")
            * F.col("cnt").cast("decimal(38,0)")
            - F.col("cnt").cast("decimal(38,0)")
        ).alias("tie_sum"),
    )
    grp = (
        cents.join(F.broadcast(ranks.select("cv", "mr2")), "cv")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("mr2").cast("long").alias("r2"),
        )
    )
    # per-group H term: R_j^2 / n_j with R_j = r2/2 (exact-int doubles)
    term = (
        F.col("r2").cast("double") * F.col("r2").cast("double")
        / (F.lit(4.0) * F.col("n"))
    )
    scored = grp.select(
        "event_type",
        "n",
        (F.col("r2") / F.lit(2.0)).alias("rank_sum"),
        F.round(F.col("r2") / (F.lit(2.0) * F.col("n")), 6).alias("mean_rank"),
        # decimal(38,9): the H term grows ~N^2*n_j (bounded only by
        # N^3), so (28,9)'s 1e19 integral ceiling would overflow to
        # NULL past a few million events under non-ANSI Spark — 38,9
        # is the same headroom linear_cka_split uses (ADVICE r10)
        F.round(term, 9).cast("decimal(38,9)").alias("_t9"),
    )
    folded = scored.agg(F.sum("_t9").cast("double").alias("term_sum"))
    h = folded.crossJoin(F.broadcast(tot)).select(
        (
            F.lit(12.0)
            / (F.col("nn").cast("double") * (F.col("nn") + 1))
            * F.col("term_sum")
            - 3 * (F.col("nn").cast("double") + 1)
        ).alias("_h"),
        (
            F.lit(1.0)
            - F.col("tie_sum").cast("double")
            / (
                F.col("nn").cast("double") * F.col("nn").cast("double")
                * F.col("nn").cast("double")
                - F.col("nn").cast("double")
            )
        ).alias("_c"),
    )
    stats = h.select(
        F.round(F.col("_h"), 6).alias("h_stat"),
        F.round(F.col("_h") / F.col("_c"), 6).alias("h_tie_corrected"),
    )
    return scored.drop("_t9").crossJoin(F.broadcast(stats))


def brown_forsythe(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Brown-Forsythe test of variance homogeneity across event_types
    (Brown & Forsythe 1974): one-way ANOVA F on absolute deviations
    from each GROUP MEDIAN — the robust Levene variant that screens
    "equal spread?" before pooled-variance tests.

    Group medians come off per-type integer-cents histograms
    (cumulative window PARTITIONED BY event_type — colocated,
    domain-bounded), using the LOWER-MEDIAN convention for even-sized
    groups (first cv with cum >= floor((ng+1)/2)) rather than the
    interpolated sample median scipy uses — both engines here agree
    and tests pin the convention (ADVICE r10); |cv - med| keeps
    everything BIGINT through the
    (n, S, Q) group triples, so the F statistic is a double expression
    of exact integers with the k between/within terms folded 9-dp."""
    cents = events.select(
        "event_type", F.round(F.col(value_col) * 100).cast("long").alias("cv")
    )
    ghist = cents.groupBy("event_type", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wg = (
        Window.partitionBy("event_type")
        .orderBy("cv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = ghist.select(
        "event_type",
        "cv",
        F.sum("cnt").over(wg).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("ng"),
    )
    meds = (
        cum.filter(F.col("cum") >= F.floor((F.col("ng") + 1) / 2))
        .groupBy("event_type")
        .agg(F.min("cv").alias("med_cv"))
    )
    z = cents.join(F.broadcast(meds), "event_type").select(
        "event_type", F.abs(F.col("cv") - F.col("med_cv")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("qz"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sz").cast("long").alias("szz"),
    )
    t = g.crossJoin(F.broadcast(tot))
    zbar_g = F.col("sz").cast("double") / F.col("n")
    zbar = F.col("szz").cast("double") / F.col("nn")
    between = F.col("n") * (zbar_g - zbar) * (zbar_g - zbar)
    within = F.col("qz").cast("double") - F.col("sz").cast("double") * F.col(
        "sz"
    ).cast("double") / F.col("n")
    scored = t.select(
        "event_type",
        "n",
        "k",
        "nn",
        F.round(between, 9).cast("decimal(28,9)").alias("_b9"),
        F.round(within, 9).cast("decimal(28,9)").alias("_w9"),
        F.round(zbar_g / F.lit(100.0), 6).alias("mean_absdev"),
    )
    fst = scored.groupBy("k", "nn").agg(
        F.sum("_b9").cast("double").alias("bsum"),
        F.sum("_w9").cast("double").alias("wsum"),
    )
    fval = fst.select(
        F.round(
            (F.col("bsum") / (F.col("k") - 1))
            / (F.col("wsum") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("nn") - F.col("k")).cast("long").alias("df2"),
    )
    meds_out = meds.select(
        "event_type", (F.col("med_cv") / F.lit(100.0)).alias("group_median")
    )
    return (
        scored.select("event_type", "n", "mean_absdev")
        .join(F.broadcast(meds_out), "event_type")
        .crossJoin(F.broadcast(fval))
        .select(
            "event_type", "n", "group_median", "mean_absdev",
            "f_stat", "df1", "df2",
        )
    )


def kendall_tau_binned(
    events: DataFrame, value_col: str = "value", value_bin_cents: int = 1000
) -> DataFrame:
    """Kendall's tau-b between hour-of-day and value, on binned data
    (Kendall 1945's tau-b handles the ties binning creates; midrank
    pair-counting over a JOINT HISTOGRAM is the standard grouped-data
    form). Complements the Pearson (events_corr_hour_value) and
    Spearman (audit_spearman_quality_len) screens with the
    concordance-based monotonic-association measure.

    The corpus pass is ONE combiner groupBy into a (24 x value-bins)
    joint histogram; concordant/discordant weights come from the
    histogram's self-join — cell-count-squared work on a
    domain-bounded table (never an event-pair join), the shape that
    survives any corpus size. Counts and pair sums are exact BIGINT;
    tau-b's denominator is a double sqrt of exact-int doubles (each
    < 2^53 before the multiply)."""
    cells = (
        events.select(
            F.hour("ts").cast("long").alias("x"),
            # F.floor, not cast('long'): the cast truncates toward zero
            # while the DuckDB oracle's // floors, and the two diverge
            # on negative cents (-1500/1000 -> -1 vs -2). Testdata is
            # all-positive today; floor keeps parity for any input
            # (ADVICE r10)
            F.floor(
                F.round(F.col(value_col) * 100).cast("long") / value_bin_cents
            )
            .cast("long")
            .alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("cnt").alias("na")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("cnt").alias("nb")
    )
    # ordered cell pairs with xa < xb: each unordered event pair with
    # distinct x appears exactly once
    pairs = a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
    cd = pairs.agg(
        F.sum(
            F.when(F.col("ya") < F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("concordant"),
        F.sum(
            F.when(F.col("ya") > F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("discordant"),
    )
    xm = cells.groupBy("x").agg(F.sum("cnt").cast("long").alias("t"))
    ym = cells.groupBy("y").agg(F.sum("cnt").cast("long").alias("t"))
    tx = xm.agg(
        F.sum("t").cast("long").alias("nn"),
        F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("n1"),
    )
    ty = ym.agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("n2"))
    j = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n0 = F.col("nn").cast("double") * (F.col("nn") - 1) / 2
    return j.select(
        "nn",
        "concordant",
        "discordant",
        "n1",
        "n2",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
            6,
        ).alias("tau_b"),
    )


def theta_forecast(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Theta-method one-step forecast of the daily event count per
    event_type (Assimakopoulos & Nikolopoulos 2000, the M3 winner;
    Hyndman & Billah 2003 show it equals SES-with-drift): theta0 line
    = OLS trend, theta2 line z_t = 2*y_t - (a + b*t), SES(alpha) on z,
    forecast = (SES + trend extension) / 2.

    The daily rollup is a combiner groupBy; t-indexing and the SES
    fold are windows PARTITIONED BY event_type over day-count-bounded
    series. OLS moments (St, Stt, Sy, Sty) are exact BIGINT; the SES
    closed form sum_t w_t z_t uses alpha = 0.5 so every weight is an
    exact power of two, and the day-bounded fold is 9-dp-decimal
    summed — engine-identical."""
    daily = (
        events.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type", "y", F.row_number().over(wt).cast("long").alias("t")
    )
    ols = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
    )
    slope = (
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    )
    # n >= 2: a one-day series has zero trend denominator
    # (n*stt - st^2 = 0), so it would only emit unlabeled-NaN slope/
    # forecast rows — exclude it instead (ADVICE r10)
    fit = ols.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        slope.alias("b"),
        ((F.col("sy") - slope * F.col("st")) / F.col("n")).alias("a"),
    )
    z = idx.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "n",
        "a",
        "b",
        F.col("t"),
        (2 * F.col("y") - (F.col("a") + F.col("b") * F.col("t"))).alias("z"),
    )
    # SES closed form: l_n = sum_{t=2..n} a(1-a)^{n-t} z_t + (1-a)^{n-1} z_1
    w = F.when(
        F.col("t") == 1, F.pow(F.lit(1.0 - alpha), F.col("n") - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(1.0 - alpha), F.col("n") - F.col("t")))
    terms = z.select(
        "event_type",
        "n",
        "a",
        "b",
        F.round(w * F.col("z"), 9).cast("decimal(28,9)").alias("_t9"),
    )
    ses = terms.groupBy("event_type", "n", "a", "b").agg(
        F.sum("_t9").cast("double").alias("ses_theta2")
    )
    return ses.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round("b", 6).alias("slope"),
        F.round("a", 6).alias("intercept"),
        F.round("ses_theta2", 6).alias("ses_theta2"),
        F.round(
            (F.col("ses_theta2") + F.col("a") + F.col("b") * (F.col("n") + 1))
            / 2.0,
            6,
        ).alias("forecast_next"),
    )


def _session_risk_table(
    events: DataFrame, gap_s: int, censor_tail_s: int
) -> DataFrame:
    """Shared survival-analysis base: 30-min-gap sessionization
    (the events_session_paths shape, per-user colocated windows),
    right-censoring against the corpus tail, and the at-risk table
    over the DURATION HISTOGRAM — duration-domain-bounded, never
    session-volume-bounded. Rows: (dur, d deaths, c censored,
    n_at_risk)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.floor(F.unix_timestamp("ts")).cast("long")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        ep.alias("ep"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (ep - F.floor(F.unix_timestamp(F.lag("ts").over(w))).cast("long") > gap_s),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "ep",
        F.sum("new_s")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_id"),
    )
    gmax = events.agg(F.max(ep).alias("gmax"))
    durs = (
        sess.groupBy("user_id", "session_id")
        .agg(F.min("ep").alias("smin"), F.max("ep").alias("smax"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.floor((F.col("smax") - F.col("smin")) / 60).cast("long").alias("dur"),
            (F.col("smax") > F.col("gmax") - censor_tail_s)
            .cast("int")
            .alias("censored"),
        )
    )
    hist = durs.groupBy("dur").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "dur",
        "d",
        "c",
        (
            F.sum("m").over(wall).cast("long")
            - F.sum("m").over(wcum).cast("long")
            + F.col("m")
        ).alias("n_at_risk"),
    )


def kaplan_meier_sessions(
    events: DataFrame, gap_s: int = 1800, censor_tail_s: int = 1800
) -> DataFrame:
    """Kaplan-Meier survival curve of user-session durations (Kaplan &
    Meier 1958, the product-limit estimator): sessions are 30-min-gap
    sessionized event runs; a session whose last event falls within
    ``censor_tail_s`` of the corpus end is RIGHT-CENSORED (it may
    still be running — dropping it would bias long sessions down,
    the classic survival-analysis trap).

    The estimator runs on the _session_risk_table duration histogram:
    S(t) folds ln((n-d)/n) per death time 9-dp-decimal through a
    cumulative window before one exp at the edge. Output: one row per
    distinct observed-death duration."""
    risk = _session_risk_table(events, gap_s, censor_tail_s)
    deaths = risk.filter(F.col("d") > 0)
    wsurv = Window.orderBy("duration_min").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # a death time that empties the risk set would be ln(0): flag it
    # instead (survival is exactly 0 from there on) so the decimal fold
    # never sees -inf
    lnterm = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            ),
            9,
        ).cast("decimal(28,9)"),
    )
    return deaths.select(
        F.col("dur").alias("duration_min"),
        "n_at_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        lnterm.alias("_ln9"),
        (F.col("d") >= F.col("n_at_risk")).cast("int").alias("_zero"),
    ).select(
        "duration_min",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.when(F.max("_zero").over(wsurv) == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("_ln9").over(wsurv).cast("double")), 6))
        .alias("survival"),
    )


def nelson_aalen_sessions(
    events: DataFrame, gap_s: int = 1800, censor_tail_s: int = 1800
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same censored
    session durations as kaplan_meier_sessions (Nelson 1972, Aalen
    1978): H(t) = sum_{s<=t} d_s/n_s with variance sum d_s/n_s^2 —
    the hazard-scale twin of the product-limit curve (preferred when
    hazards are the modeling target; exp(-H) is the Fleming-Harrington
    survival variant, emitted for comparison against the KM curve).

    Same scale shape as KM: everything reduces on the duration-domain
    histogram; the two running sums fold exact-integer-ratio doubles
    9-dp-decimal through one cumulative window."""
    risk = _session_risk_table(events, gap_s, censor_tail_s)
    deaths = risk.filter(F.col("d") > 0)
    wcum = Window.orderBy("duration_min").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hterm = F.round(
        F.col("d").cast("double") / F.col("n_at_risk").cast("double"), 9
    ).cast("decimal(28,9)")
    vterm = F.round(
        F.col("d").cast("double")
        / (F.col("n_at_risk").cast("double") * F.col("n_at_risk").cast("double")),
        9,
    ).cast("decimal(28,9)")
    base = deaths.select(
        F.col("dur").alias("duration_min"),
        "n_at_risk",
        F.col("d").alias("n_events"),
        hterm.alias("_h9"),
        vterm.alias("_v9"),
    )
    return base.select(
        "duration_min",
        "n_at_risk",
        "n_events",
        F.round(F.sum("_h9").over(wcum).cast("double"), 6).alias("cum_hazard"),
        F.round(F.sum("_v9").over(wcum).cast("double"), 6).alias("hazard_var"),
        F.round(
            F.exp(-F.sum("_h9").over(wcum).cast("double")), 6
        ).alias("fh_survival"),
    )


def cohens_d_pairs(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Cohen's d standardized effect size between every event_type pair
    (Cohen 1988), with Hedges' small-sample correction g — the "is the
    shift MEANINGFUL?" companion to Welch's t (significance says
    nothing about magnitude on large corpora, where t grows with
    sqrt(n) but d does not).

    Same exact-integer plumbing as welch_ttest: per-type (n, S, Q)
    BIGINT cents triples, pooled SD from exact moments, the k²-row
    pair stage broadcast over the k-row aggregate. Types with n < 2
    are excluded before pairing — a single-observation group has no
    sample variance, so it would only contribute unlabeled-NaN rows
    (ADVICE r10)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    g = (
        events.select("event_type", cents.alias("cv"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cv").cast("long").alias("s"),
            F.sum(F.col("cv") * F.col("cv")).cast("long").alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    a = g.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na"),
        F.col("s").alias("sa"), F.col("q").alias("qa"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb"),
        F.col("s").alias("sb"), F.col("q").alias("qb"),
    )
    p = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    ma = F.col("sa") / (F.lit(100.0) * F.col("na"))
    mb = F.col("sb") / (F.lit(100.0) * F.col("nb"))
    va = (
        (F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).cast("double")
        / (F.col("na").cast("double") * (F.col("na") - 1))
    ) / F.lit(10000.0)
    vb = (
        (F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).cast("double")
        / (F.col("nb").cast("double") * (F.col("nb") - 1))
    ) / F.lit(10000.0)
    sp2 = ((F.col("na") - 1) * va + (F.col("nb") - 1) * vb) / (
        F.col("na") + F.col("nb") - 2
    )
    d = (ma - mb) / F.sqrt(sp2)
    # Hedges' g: the exact-gamma correction's standard approximation
    corr = F.lit(1.0) - F.lit(3.0) / (
        4 * (F.col("na") + F.col("nb")) - 9
    )
    return p.select(
        "type_a",
        "type_b",
        "na",
        "nb",
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"),
        F.round(F.sqrt(sp2), 6).alias("pooled_sd"),
    )
