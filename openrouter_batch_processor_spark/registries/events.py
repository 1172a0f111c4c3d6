"""Event time-series queries: windows, sessionization, forecasting,
statistical tests (ACF/PACF, Mann-Kendall, Ljung-Box, runs test).

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "events_ewma",
    """
    WITH ordered AS (
      SELECT event_type, array_agg(value ORDER BY ts, event_id) AS xs, count(*) AS n
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           round(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
    FROM ordered
    """,
    ops=["S10", "T5", "G2", "EXT-windows"],
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-recursive EWMA per event type via grouped-map
    applyInPandas — a pandas-UDF operator with a true VALUE oracle
    (identical IEEE fold order in DuckDB's list_reduce)."""
    return ewma_last(_t(spark, sf_dir, "events"))


@register(
    "events_transitions",
    """
    WITH p AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_state
      FROM events)
    SELECT from_state, event_type AS to_state, count(*) AS n_transitions
    FROM p WHERE from_state IS NOT NULL
    GROUP BY from_state, to_state
    """,
    ops=["O3", "G2", "EXT-sessions"],
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences."""
    return transition_counts(_t(spark, sf_dir, "events"))


@register(
    "events_props_json",
    """
    WITH x AS (SELECT event_type,
                      json_extract_string(props, '$.k')::BIGINT AS k
               FROM events)
    SELECT event_type,
           count(*) AS n,
           count(*) FILTER (WHERE k IS NULL) AS n_unparsed,
           sum(k)::BIGINT AS k_sum, min(k) AS k_min, max(k) AS k_max
    FROM x GROUP BY event_type
    """,
    ops=["F13", "D5", "G2", "EXT-quality"],
)
def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the semi-structured props column: from_json
    with an explicit schema (PERMISSIVE — malformed rows surface as
    nulls, counted, never failing the job: the engine's errors-as-data
    rule applied to JSON parsing)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").getField("k").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@register(
    "events_tumbling",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value::DECIMAL(28,10))::DOUBLE, 6) AS value_sum
    FROM events GROUP BY window_start, event_type
    """,
    ops=["T1", "T2", "EXT-windows"],
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_t(spark, sf_dir, "events"))


@register(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, floor(epoch(ts))::BIGINT AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, ep,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           max(ep) - min(ep) AS duration_sec
    FROM sess GROUP BY user_id, session_id
    """,
    ops=["T1", "W2", "EXT-sessions"],
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_t(spark, sf_dir, "events"))


@register(
    "events_linear_trend",
    f"""
    WITH b AS (SELECT event_type,
                      floor(epoch(ts))::BIGINT - {TREND_EPOCH0} AS x,
                      value::DOUBLE AS y
               FROM events),
    a AS (SELECT event_type, count(*) AS n, sum(x)::BIGINT AS sx,
                 sum(y::DECIMAL(28,10)) AS sy,
                 sum((x * y)::DECIMAL(38,10)) AS sxy,
                 sum(x::DECIMAL(38,0) * x) AS sxx
          FROM b GROUP BY event_type)
    SELECT event_type, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
           round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                 / n::DOUBLE, 6) AS intercept
    FROM a
    """,
    ops=["EXT-relational", "G2", "T1"],
)
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-group OLS via exact decimal moment sums — identical
    result at any partition count (associative accumulation), bit-equal
    to the oracle."""
    return linear_trend(_t(spark, sf_dir, "events"))


@register(
    "events_anomaly_zscore",
    f"""
    WITH s AS (SELECT event_type, count(*) AS n,
                      sum((value::DOUBLE)::DECIMAL(28,10)) AS sy,
                      sum((value::DOUBLE * value::DOUBLE)::DECIMAL(38,10)) AS syy
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value::DOUBLE AS value,
           round({_Z_SQL}, 6) AS z
    FROM events e JOIN s USING (event_type)
    WHERE sqrt((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
               / (n::DOUBLE * (n::DOUBLE - 1))) > 0
      AND abs(round({_Z_SQL}, 6)) > 3.0
    """,
    ops=["EXT-quality", "G2", "J3", "P1"],
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers: moments pass + broadcast stats join
    back — never a window over the raw stream."""
    return anomaly_zscore(_t(spark, sf_dir, "events"), threshold=3.0)


@register(
    "events_pivot_daily",
    f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY day
    """,
    ops=["EXT-relational", "G2", "F11"],
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts pivoted to one column per event type. Explicit pivot
    values keep the schema static (no extra distinct pass); absent
    combinations filled to 0 to match conditional-count semantics."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return (
        ev.groupBy("day").pivot("event_type", EVENT_TYPES).count().na.fill(0)
    )


@register(
    "events_sliding",
    # A sliding window (2h width, 1h slide) is the union of 2 shifted
    # tumbling assignments — each event belongs to exactly 2 windows.
    """
    WITH assigned AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, value
      FROM events
      UNION ALL
      SELECT strftime(date_trunc('hour', ts - INTERVAL 1 HOUR), '%Y-%m-%d %H:%M:%S'),
             event_type, value
      FROM events)
    SELECT window_start, event_type,
           count(*) AS n_events,
           round(sum(value::DECIMAL(28,10))::DOUBLE, 6) AS value_sum
    FROM assigned
    GROUP BY window_start, event_type
    """,
    ops=["EXT-windows", "T1"],
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@register(
    "events_corr_hour_value",
    """
    WITH b AS (SELECT event_type, extract(hour FROM ts)::BIGINT AS x,
                      value::DOUBLE AS y
               FROM events),
    a AS (SELECT event_type, count(*) AS n, sum(x)::BIGINT AS sx,
                 sum(x::DECIMAL(38,0) * x) AS sxx,
                 sum(y::DECIMAL(28,10)) AS sy,
                 sum((y * y)::DECIMAL(38,10)) AS syy,
                 sum((x * y)::DECIMAL(38,10)) AS sxy
          FROM b GROUP BY 1)
    SELECT event_type, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
                 6) AS corr_x_value
    FROM a
    WHERE (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
      AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
    """,
    ops=["G2", "EXT-relational", "T1"],
)
def q_corr_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pearson_corr(_t(spark, sf_dir, "events"))


@register(
    "events_funnel",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
    c AS (SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM s1
          UNION ALL SELECT 2, 'click', count(*) FROM s2
          UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
    SELECT stage_idx, stage, n_users,
           round(n_users / lag(n_users) OVER (ORDER BY stage_idx), 6) AS conv_from_prev
    FROM c
    """,
    ops=["G2", "J2", "O1", "EXT-sessions"],
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel; each stage must happen
    strictly after the user's ENTRY (first qualifying event) into the
    previous stage, not merely after any earlier-stage event."""
    return funnel_counts(_t(spark, sf_dir, "events"), ["view", "click", "purchase"])


@register(
    "events_retention_cohorts",
    """
    WITH f AS (SELECT user_id,
                      floor((epoch(min(ts))
                             - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 604800)::BIGINT
                        AS cohort_week
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id,
                 floor((epoch(ts)
                        - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 604800)::BIGINT AS week
          FROM events)
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset, count(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    ops=["G2", "J2", "X1", "EXT-sessions"],
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle over the event log: cohort = first-
    event week, retained = any event in cohort_week + offset."""
    return retention_cohorts(_t(spark, sf_dir, "events"))


# ===========================================================================
# Grouping sets, range-frame windows, stream-static enrichment
# ===========================================================================


@register(
    "events_grouping_sets",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           (grouping(event_type) * 2 + grouping(date_trunc('day', ts)))::INTEGER AS gid,
           count(*) AS n_events,
           sum(value::DECIMAL(28,10))::DOUBLE AS value_sum
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)),
                            (event_type, date_trunc('day', ts)), ())
    """,
    ops=["G2", "EXT-rollup"],
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not just the rollup/cube lattices):
    per-type, per-day, per-(type, day), and grand total in ONE pass.
    Spark expands the sets into a single Expand + hash aggregate — the
    input is scanned once and each row fans out to its 4 grouping
    combinations map-side, which is the scalable form of 4 separate
    GROUP BYs + UNION (4 scans, 4 shuffles). gid is computed from
    grouping() bits explicitly — grouping_id()'s bit order is an
    engine-specific detail we don't depend on."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day_ts"), "value"
    )
    grouped = ev.groupingSets(
        [[F.col("event_type")], [F.col("day_ts")], [F.col("event_type"), F.col("day_ts")], []],
        F.col("event_type"),
        F.col("day_ts"),
    ).agg(
        (F.grouping("event_type") * 2 + F.grouping("day_ts")).cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("value_sum"),
    )
    return grouped.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.date_format("day_ts", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
        "gid",
        "n_events",
        "value_sum",
    )


@register(
    "events_rolling_hour",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_in_hour,
           sum(value::DECIMAL(18,6)) OVER w::DOUBLE AS sum_in_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    ops=["O1", "O3", "T1", "EXT-windows"],
)
def q_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity via a RANGE window frame (value
    range on event-time seconds, not N rows — the frame an N-rows frame
    cannot express on irregular streams).

    DECIMAL sums inside the frame: engines implement sliding frames
    differently (recompute vs segment tree), so double accumulation
    would differ in addition ORDER; decimal is associative, making the
    frame sum implementation-independent. One shuffle on user_id; the
    sort is per-partition."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_in_hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_in_hour"),
    )


@register(
    "events_type_lift",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    tc AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS n_ab
              FROM ut a JOIN ut b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab,
           round(p.n_ab::DOUBLE * n.n_users / (ta.n_t::DOUBLE * tb.n_t), 6) AS lift
    FROM pairs p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b
    CROSS JOIN n
    """,
    ops=["G2", "J2", "X1", "EXT-relational"],
)
def q_events_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types: P(a,b)/(P(a)P(b)) over
    per-user distinct type sets. The self-join runs on the DISTINCT
    (user, type) table — bounded by types-per-user^2 rows per user, not
    events^2; type counts and the user-count scalar broadcast."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.count_distinct("user_id").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = tc.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = tc.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .join(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n_users")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "events_session_paths",
    """
    WITH flagged AS (
      SELECT user_id, event_id, event_type, ts, floor(epoch(ts))::BIGINT AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts))::BIGINT
                          - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, event_type, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged),
    ranked AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM sess),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC LIMIT 10
    """,
    ops=["T1", "W2", "O3", "O4", "EXT-sessions"],
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session-opening event-type paths (first 3 events per
    gap-session) — funnel discovery, the inverse of events_funnel's
    fixed-stage counting."""
    return session_paths(_t(spark, sf_dir, "events"))


# ===========================================================================
# Sliding distinct cardinality + referential-integrity data-quality audit
# ===========================================================================


@register(
    "events_rolling_7d_users",
    """
    WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
    offs AS (SELECT unnest(range(7)) AS off),
    contrib AS (SELECT user_id, day + off::INTEGER AS target_day
                FROM ud CROSS JOIN offs),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT strftime(c.target_day, '%Y-%m-%d') AS day,
           count(DISTINCT c.user_id) AS users_7d
    FROM contrib c JOIN days d ON d.day = c.target_day
    GROUP BY 1
    """,
    ops=["G2", "X1", "T1", "EXT-windows", "EXT-sketch"],
)
def q_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    COUNT(DISTINCT) that a RANGE window frame cannot express.

    Shape: dedup to (user, day) FIRST (the only pass over raw events),
    then each activity day fans out to the <=7 window-end days it
    contributes to (a 7-row literal explode — narrow), and the distinct
    count groups by target day. The fan-out bounds work at 7x the
    deduped (user, day) table regardless of raw event volume — the
    scalable alternative to re-scanning a 7-day range per day. Days
    with no activity in the trailing week emit nothing (join against
    observed days, not a calendar spine)."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.expr("date_add(day, off)").alias("target_day"))
    days = ud.select("day").distinct()
    return (
        contrib.join(F.broadcast(days), contrib.target_day == days.day)
        .groupBy("target_day")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .select(F.date_format("target_day", "yyyy-MM-dd").alias("day"), "users_7d")
    )


@register(
    "events_time_weighted_avg",
    """
    WITH t AS (SELECT user_id, value, floor(epoch(ts))::BIGINT AS ep,
                      lead(floor(epoch(ts))::BIGINT)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
               FROM events)
    SELECT user_id, count(*) AS n_intervals,
           sum(nxt - ep)::BIGINT AS total_sec,
           round(sum((value * (nxt - ep))::DECIMAL(38,10))::DOUBLE
                 / sum(nxt - ep), 6) AS twa_value
    FROM t WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
    ops=["O1", "G2", "T1", "EXT-windows"],
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value: each reading holds until
    the next one, so it weighs by its holding duration (the correct
    average for irregularly-sampled gauges; the unweighted mean
    over-counts bursts). lead() gives the interval, decimal value x
    integer-seconds products make the reduction exact. One user_id
    shuffle shared by the window and the aggregate."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    t = ev.select(
        "user_id",
        "value",
        ep.alias("ep"),
        F.lead(ep).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("ep")
    return t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(dt).cast("long").alias("total_sec"),
        F.round(
            F.sum((F.col("value") * dt).cast("decimal(38,10)")).cast("double")
            / F.sum(dt),
            6,
        ).alias("twa_value"),
    )


# ===========================================================================
# User growth accounting: daily new / returning / cumulative
# ===========================================================================


@register(
    "events_user_growth",
    """
    WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
    f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
    daily AS (
      SELECT u.day,
             count(*) AS active_users,
             sum(CASE WHEN u.day = f.first_day THEN 1 ELSE 0 END)::BIGINT AS new_users
      FROM ud u JOIN f USING (user_id)
      GROUP BY u.day)
    SELECT strftime(day, '%Y-%m-%d') AS day, active_users, new_users,
           (active_users - new_users)::BIGINT AS returning_users,
           sum(new_users) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
    FROM daily
    """,
    ops=["G2", "J2", "O1", "X1", "EXT-sessions"],
)
def q_events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily audience accounting: active, new (first-ever day),
    returning, and the cumulative user count — the growth dashboard
    spine. The raw stream is touched once (dedup to (user, day)); the
    first-day table joins back on user_id reusing that partitioning;
    the running total windows over the ~days-sized daily table, so the
    global ordered window is bounded by the calendar, not the corpus."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    f = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ud.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).cast("long").alias("returning_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@register(
    "events_peak_concurrency",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, floor(epoch(ts))::BIGINT AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ep,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    spans AS (SELECT user_id, session_id, min(ep) AS s_ep, max(ep) AS e_ep
              FROM sess GROUP BY 1, 2),
    bounds AS (
      SELECT s_ep AS ep, 1 AS delta, user_id, session_id FROM spans
      UNION ALL
      SELECT e_ep, -1, user_id, session_id FROM spans),
    swept AS (
      SELECT ep, sum(delta) OVER (ORDER BY ep, -delta, user_id, session_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM bounds)
    SELECT strftime(DATE '1970-01-01' + (ep // 86400)::INT, '%Y-%m-%d') AS day,
           max(conc)::BIGINT AS peak_concurrency
    FROM swept GROUP BY 1
    """,
    ops=["EXT-sessions", "EXT-rangejoin", "W1", "O1", "G2"],
)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent sessions via the +1/-1 boundary sweep with
    a two-phase distributed prefix sum (no single-task global window).
    See operators/windows.peak_concurrency; the oracle restates the
    sweep as one ordered window over the boundary list."""
    return peak_concurrency(_t(spark, sf_dir, "events"))


@register(
    "events_attribution",
    """
    WITH p AS (SELECT event_id AS pid, user_id, ts AS pts, value
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
          FROM events WHERE event_type IN ('click', 'view', 'signup')),
    j AS (SELECT p.pid, p.value, t.tid, t.channel
          FROM p LEFT JOIN t ON t.user_id = p.user_id
                            AND t.tts < p.pts
                            AND t.tts >= p.pts - INTERVAL 24 HOURS),
    n AS (SELECT pid, count(tid) AS n_touch FROM j GROUP BY pid),
    shares AS (SELECT j.pid, coalesce(j.channel, '(direct)') AS channel,
                      round(CASE WHEN n.n_touch = 0 THEN j.value
                                 ELSE j.value / n.n_touch END, 12)::DECIMAL(28,12) AS share
               FROM j JOIN n USING (pid))
    SELECT channel, count(*) AS n_attributions, count(DISTINCT pid) AS n_purchases,
           round(sum(share)::DOUBLE, 6) AS attributed_value
    FROM shares GROUP BY channel
    """,
    ops=["EXT-sessions", "EXT-rangejoin", "J2", "G2"],
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: purchase value split equally
    over the user's click/view/signup touches in the trailing 24 h
    (strictly before the purchase); orphan purchases go to '(direct)'.
    See operators/timeseries.linear_attribution for the join shape and
    the decimal-sum determinism contract."""
    return linear_attribution(_t(spark, sf_dir, "events"))


@register(
    "events_mann_kendall",
    f"""
    WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day,
                          sum(round(value, 6)::DECIMAL(18,6)) AS x
                   FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END AS sg,
                 (b.x - a.x)::DOUBLE / date_diff('day', a.day, b.day) AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.day < b.day),
    s AS (SELECT event_type, sum(sg)::BIGINT AS s_stat,
                 count(*)::BIGINT AS m FROM p GROUP BY 1),
    nd AS (SELECT event_type, count(*)::BIGINT AS n FROM daily GROUP BY 1),
    ties AS (SELECT event_type, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
             FROM (SELECT event_type, x, count(*)::BIGINT AS t
                   FROM daily GROUP BY 1, 2) GROUP BY 1),
    rk AS (SELECT p.event_type, slope,
                  row_number() OVER (PARTITION BY p.event_type
                                     ORDER BY slope) AS rk, s.m
           FROM p JOIN s USING (event_type)),
    sen AS (SELECT event_type, sum(slope) / count(*) AS sen_raw
            FROM rk
            WHERE rk = floor((m + 1) / 2.0) OR rk = ceil((m + 1) / 2.0)
            GROUP BY 1),
    j AS (SELECT s.event_type, s.s_stat, nd.n, sen.sen_raw,
                 (n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0 AS var_s
          FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)
          JOIN sen USING (event_type))
    SELECT event_type, n AS n_days, s_stat,
           round(var_s, 6) AS var_s,
           round({_MK_Z_SQL}, 6) AS z,
           round(sen_raw, 6) AS sen_slope,
           CASE WHEN ({_MK_Z_SQL}) > 1.959964 THEN 'increasing'
                WHEN ({_MK_Z_SQL}) < -1.959964 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM j
    """,
    ops=["EXT-timeseries", "G2", "J3", "W2"],
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope per event-type daily
    series (Mann 1945; Sen 1968): integer-exact S and tie-corrected
    variance over DECIMAL daily sums, continuity-corrected Z, median
    pairwise slope — the only corpus-sized pass is the daily combiner
    groupBy; the O(n²) pair join is calendar-bounded
    (operators/timeseries.mann_kendall_sen)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        mann_kendall_sen,
    )

    return mann_kendall_sen(_t(spark, sf_dir, "events"))


@register(
    "events_changepoint_cusum",
    """
    WITH o AS (SELECT event_type, ts, event_id, value::DECIMAL(18,6) AS v,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id)::BIGINT AS k,
                      sum(value::DECIMAL(18,6)) OVER (PARTITION BY event_type
                                                      ORDER BY ts, event_id
                                                      ROWS UNBOUNDED PRECEDING) AS prefix,
                      sum(value::DECIMAL(18,6)) OVER (PARTITION BY event_type) AS total,
                      count(*) OVER (PARTITION BY event_type)::BIGINT AS n
               FROM events),
    d AS (SELECT event_type, ts, k, n, n * prefix - k * total AS dev FROM o),
    p AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(dev) DESC, k ASC) AS rn FROM d)
    SELECT event_type, n, k AS cp_index,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS cp_ts,
           round(abs(dev)::DOUBLE / n, 6) AS max_abs_cusum
    FROM p WHERE rn = 1
    """,
    ops=["EXT-windows", "O3", "G2"],
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event_type: the peak cumulative deviation
    from the series mean, computed scaled in DECIMAL (exact) with the
    division rounded only at the report edge — see
    operators/timeseries.cusum_changepoints."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        cusum_changepoints,
    )

    return cusum_changepoints(_t(spark, sf_dir, "events"))


@register(
    "events_holt_forecast",
    """
    WITH ordered AS (
      SELECT event_type, array_agg(value ORDER BY ts, event_id) AS xs,
             count(*) AS n
      FROM events GROUP BY event_type),
    f AS (SELECT event_type, n,
                 -- acc is a [level, trend] LIST, not a struct: DuckDB
                 -- 1.0's struct-acc list_reduce leaks already-computed
                 -- fields into later field expressions from the second
                 -- iteration on (slot reuse); list construction
                 -- evaluates both elements against the old acc.
                 list_reduce(list_transform(xs, x -> [x, 0.0::DOUBLE]),
                   (acc, e) -> [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                                0.3 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                                + 0.7 * acc[2]]) AS st
          FROM ordered)
    SELECT event_type, n, round(st[1], 6) AS level, round(st[2], 6) AS trend,
           round(st[1] + st[2], 6) AS forecast_1
    FROM f
    """,
    ops=["S10", "T5", "G2", "EXT-windows"],
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level+trend) smoothing per event type
    via grouped-map applyInPandas, with the one-step forecast — the
    doubly-recursive fold no built-in window expresses, value-checked
    against DuckDB's identical-IEEE list_reduce over {l, b} structs.
    See operators/timeseries.holt_linear."""
    from openrouter_batch_processor_spark.operators.timeseries import holt_linear

    return holt_linear(_t(spark, sf_dir, "events"))


@register(
    "events_acf",
    f"""
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),
    lg AS (
      SELECT event_type, x,
             {", ".join(f"lag(x, {k}) OVER w AS xl{k}" for k in range(1, 7))}
      FROM idx WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
    f AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
             sum(x*x)::HUGEINT AS q,
{_ACF_LAG_COLS}
      FROM lg GROUP BY 1)
    {_ACF_ARMS}
    """,
    ops=["EXT-windows", "G2", "W1", "O3"],
)
def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1-6) of the hourly event-count series per
    type, exact integer Box-Jenkins estimator —
    operators/timeseries.acf_lags."""
    from openrouter_batch_processor_spark.operators.timeseries import acf_lags

    from openrouter_batch_processor_spark.operators.timeseries import (
        staged_acf_lags,
    )

    return staged_acf_lags(_t(spark, sf_dir, "events"))


@register(
    "events_seasonal_decompose",
    """
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, hour, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),
    d AS (
      SELECT event_type, extract(hour FROM hour)::BIGINT AS hod,
             25 * x - sum(x) OVER w AS d25,
             count(*) OVER w AS wn
      FROM idx
      WINDOW w AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING))
    SELECT event_type, hod, count(*)::BIGINT AS n_windows,
           ((sum(d25)::BIGINT * 10000000) // (25 * count(*)))::DOUBLE
             / 10000000.0 AS seasonal
    FROM d WHERE wn = 25 GROUP BY 1, 2
    """,
    ops=["EXT-windows", "G2", "W1"],
)
def q_events_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition: centered 25-h moving-average
    trend, hour-of-day seasonal means, exact ×25 integer carry —
    operators/timeseries.seasonal_decompose_hod. (Both engines'
    integer div truncates toward zero, verified — negative detrended
    sums are safe.)"""
    from openrouter_batch_processor_spark.operators.timeseries import (
        seasonal_decompose_hod,
    )

    return seasonal_decompose_hod(_t(spark, sf_dir, "events"))


@register(
    "events_mad_anomaly",
    """
    WITH ranked AS (
      SELECT event_type, value, event_id,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (SELECT event_type, value AS med, n AS n_events
            FROM ranked WHERE rn = (n + 1) // 2),
    dev AS (SELECT e.event_type, e.event_id, m.n_events, m.med,
                   abs(e.value - m.med) AS dev
            FROM events e JOIN med m USING (event_type)),
    r2 AS (SELECT event_type, dev,
                  row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
                  n_events AS n
           FROM dev),
    mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type, max(d.n_events)::BIGINT AS n_events,
           max(d.med) AS med, max(m.mad) AS mad,
           count(CASE WHEN d.dev > 3.0 * 1.4826 * m.mad THEN 1 END)::BIGINT AS n_outliers
    FROM dev d JOIN mad m USING (event_type) GROUP BY 1
    """,
    ops=["EXT-windows", "G2", "O3", "G6"],
)
def q_events_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-rule robust anomaly counts (3·1.4826·MAD) per event
    type, rank-median order statistics only —
    operators/timeseries.mad_anomalies."""
    from openrouter_batch_processor_spark.operators.timeseries import mad_anomalies

    return mad_anomalies(_t(spark, sf_dir, "events"))


# ===========================================================================
# Round-4 second wave: Holt-Winters additive (rotating seasonal ring)
# ===========================================================================


@register(
    "events_holt_winters",
    """
    WITH ordered AS (
      SELECT event_type, array_agg(value ORDER BY ts, event_id) AS xs,
             count(*) AS n
      FROM events GROUP BY event_type),
    f AS (SELECT event_type, n,
                 -- acc = [l, b] || 24-slot seasonal RING (head = s_{t-m});
                 -- every element evaluated against the OLD acc (list
                 -- construction; the DuckDB 1.0 struct-acc field leak
                 -- does not apply — see events_holt_forecast)
                 -- fold the LAST 4096 points only (HW_WINDOW): the
                 -- divergent long-series state would otherwise outgrow
                 -- the 6-dp grid's cross-engine ulp safety (r08)
                 list_reduce(
                   list_transform(xs[greatest(len(xs) - 4095, 1):],
                                  x -> ([x] || list_transform(range(0, 25),
                                                              i -> 0.0::DOUBLE))),
                   (acc, e) ->
                     [0.5 * (e[1] - acc[3]) + 0.5 * (acc[1] + acc[2]),
                      0.3 * ((0.5 * (e[1] - acc[3]) + 0.5 * (acc[1] + acc[2]))
                             - acc[1]) + 0.7 * acc[2]]
                     || acc[4:26]
                     || [0.2 * (e[1] - (0.5 * (e[1] - acc[3])
                                        + 0.5 * (acc[1] + acc[2])))
                         + 0.8 * acc[3]]) AS st
          FROM ordered)
    SELECT event_type, n, round(st[1], 6) AS level, round(st[2], 6) AS trend,
           round(st[3], 6) AS s_next,
           round(st[1] + st[2] + st[3], 6) AS forecast_1
    FROM f
    """,
    ops=["S10", "T5", "G2", "EXT-windows"],
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive (level+trend+24-slot seasonal ring) per
    event type via grouped-map applyInPandas, value-checked against a
    DuckDB list_reduce over rotating 26-wide list accumulators —
    operators/timeseries.holt_winters_additive."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        holt_winters_additive,
    )

    return holt_winters_additive(_t(spark, sf_dir, "events"))


@register(
    "events_pacf",
    f"""
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),
    lg AS (
      SELECT event_type, x,
             {", ".join(f"lag(x, {k}) OVER w AS xl{k}" for k in range(1, 6))}
      FROM idx WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
    f AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
             sum(x*x)::HUGEINT AS q,
{",".join(chr(10) + f'''           sum(x*xl{k})::HUGEINT AS sxy{k},
           sum(CASE WHEN xl{k} IS NOT NULL THEN x END)::HUGEINT AS s2_{k},
           sum(xl{k})::HUGEINT AS s1_{k}''' for k in range(1, 6))}
      FROM lg GROUP BY 1),
    {_pacf_sql(5)}
    """,
    ops=["EXT-windows", "EXT-timeseries", "G2", "W1"],
)
def q_events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1-5) of the hourly event-count
    series per type: Durbin-Levinson recursion unrolled over the
    integer-exact ACF values, every accumulation left-associative on
    both engines (operators/timeseries.pacf_lags)."""
    from openrouter_batch_processor_spark.operators.timeseries import pacf_lags

    return pacf_lags(_t(spark, sf_dir, "events"))


@register(
    "events_ljung_box",
    f"""
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),
    lg AS (
      SELECT event_type, x,
             {", ".join(f"lag(x, {k}) OVER w AS xl{k}" for k in range(1, 7))}
      FROM idx WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
    f AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
             sum(x*x)::HUGEINT AS q,
{_ACF_LAG_COLS}
      FROM lg GROUP BY 1),
    acfv AS ({_ACF_ARMS}),
    a AS (SELECT event_type, max(n)::BIGINT AS n,
                 sum(round((acf * acf) / (n - lag_k)::DOUBLE,
                           12)::DECIMAL(28,12)) AS ssum
          FROM acfv GROUP BY 1),
    qq AS (SELECT event_type, n,
                  (n * (n + 2))::DOUBLE * ssum::DOUBLE AS q_raw
           FROM a)
    SELECT event_type, n, 6::BIGINT AS df,
           round(q_raw, 6) AS q_stat,
           round((pow(q_raw / 6.0, 1.0/3.0) - {1.0 - 2.0 / 54.0!r})
                 / {(2.0 / 54.0) ** 0.5!r}, 6) AS z_wh
    FROM qq
    """,
    ops=["EXT-windows", "EXT-timeseries", "G2", "W1"],
)
def q_events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau white-noise Q (lags 1-6) per event type
    over the hourly count series, with the Wilson-Hilferty chi-square
    z approximation — 12-dp decimal-summed summands over the
    integer-exact ACF (operators/timeseries.ljung_box)."""
    from openrouter_batch_processor_spark.operators.timeseries import ljung_box

    return ljung_box(_t(spark, sf_dir, "events"))


@register(
    "events_runs_test",
    """
    WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day,
                          sum(round(value, 6)::DECIMAL(18,6)) AS x
                   FROM events GROUP BY 1, 2),
    rk AS (SELECT event_type, day, x,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY x, day) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
    med AS (SELECT event_type, x AS med FROM rk
            WHERE rnk = floor((n + 1) / 2)),
    lab AS (SELECT d.event_type, d.day,
                   CASE WHEN d.x > m.med THEN 1 ELSE 0 END AS s
            FROM daily d JOIN med m USING (event_type)
            WHERE d.x != m.med),
    runs AS (SELECT event_type, s,
                    CASE WHEN lag(s) OVER (PARTITION BY event_type
                                           ORDER BY day) IS NULL
                              OR s != lag(s) OVER (PARTITION BY event_type
                                                   ORDER BY day)
                         THEN 1 ELSE 0 END AS chg
             FROM lab),
    agg AS (SELECT event_type,
                   count(*)::BIGINT AS n_days,
                   sum(s)::BIGINT AS n_above,
                   (count(*) - sum(s))::BIGINT AS n_below,
                   sum(chg)::BIGINT AS n_runs
            FROM runs GROUP BY 1)
    SELECT event_type, n_days, n_above, n_below, n_runs,
           round((n_runs - (2.0 * n_above * n_below
                            / (n_above + n_below) + 1.0))
                 / sqrt(2.0 * n_above * n_below
                        * (2.0 * n_above * n_below - n_above - n_below)
                        / ((n_above + n_below)::DOUBLE
                           * (n_above + n_below)::DOUBLE
                           * ((n_above + n_below) - 1))),
                 6) AS z
    FROM agg
    """,
    ops=["EXT-timeseries", "G2", "W2", "J3"],
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event-type daily series:
    above/below-lower-median labeling (deterministic tie cut), runs
    counted by one lag window, exact-integer moments, one double z —
    the exchangeability audit beside Mann-Kendall and Ljung-Box
    (operators/timeseries.runs_test)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        runs_test,
    )

    return runs_test(_t(spark, sf_dir, "events"))


@register(
    "events_page_hinkley",
    """
    WITH o AS (SELECT event_type, ts, event_id, value::DECIMAL(18,6) AS v,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id)::BIGINT AS k,
                      sum(value::DECIMAL(18,6)) OVER (PARTITION BY event_type
                                                      ORDER BY ts, event_id
                                                      ROWS UNBOUNDED PRECEDING) AS prefix,
                      sum(value::DECIMAL(18,6)) OVER (PARTITION BY event_type) AS total,
                      count(*) OVER (PARTITION BY event_type)::BIGINT AS n
               FROM events),
    d AS (SELECT event_type, ts, k, n, n * prefix - k * total AS dev FROM o),
    r AS (SELECT *, min(dev) OVER (PARTITION BY event_type ORDER BY k
                                   ROWS UNBOUNDED PRECEDING) AS runmin
          FROM d),
    p AS (SELECT event_type, ts, k, n, dev - runmin AS ph,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY (dev - runmin) DESC, k ASC) AS rn
          FROM r)
    SELECT event_type, n, k AS alarm_index,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS alarm_ts,
           round((ph / n)::DOUBLE, 6) AS max_ph
    FROM p WHERE rn = 1
    """,
    ops=["EXT-windows", "O3", "G2"],
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector per event_type: largest
    sustained run above the series mean (cumulative deviation minus its
    running minimum), exact scaled-DECIMAL algebra, divide-at-the-edge
    (operators/timeseries.page_hinkley)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        page_hinkley,
    )

    return page_hinkley(_t(spark, sf_dir, "events"))


@register(
    "stats_theil_sen",
    """
    WITH daily AS (SELECT event_type,
                          date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d,
                          count(*)::BIGINT AS c
                   FROM events GROUP BY 1, 2),
    s AS (SELECT a.event_type,
                 a.d AS d1, b.d AS d2,
                 (b.c - a.c)::DOUBLE / (b.d - a.d)::DOUBLE AS slope
          FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d),
    r AS (SELECT event_type, slope,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY slope, d1, d2)::BIGINT AS rn,
                 count(*) OVER (PARTITION BY event_type)::BIGINT AS m
          FROM s),
    mid AS (SELECT * FROM r
            WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1)
    SELECT event_type, min(m)::BIGINT AS n_pairs,
           round((sum(slope::DECIMAL(28,9)) / count(*))::DOUBLE, 6) AS sen_slope
    FROM mid GROUP BY event_type
    """,
    ops=["EXT-windows", "G2", "O3", "J1"],
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of the daily event-count series per
    type: exact median (stats_exact_median convention) of O(days²)
    pairwise slopes — days, not events, so the pair stage is bounded
    (operators/timeseries.theil_sen_trend)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        theil_sen_trend,
    )

    return theil_sen_trend(_t(spark, sf_dir, "events"))


@register(
    "events_interarrival_fit",
    """
    WITH g AS (SELECT event_type,
                      epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
               FROM events),
    g2 AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
    n AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
                 sum(gap_us)::BIGINT AS sum_us
          FROM g2 GROUP BY 1),
    r AS (SELECT g2.event_type, n_gaps, sum_us,
                 row_number() OVER (PARTITION BY g2.event_type
                                    ORDER BY gap_us)::BIGINT AS rn,
                 1.0 - exp(-((gap_us * n_gaps)::DOUBLE) / sum_us) AS fx
          FROM g2 JOIN n USING (event_type)),
    d AS (SELECT event_type, n_gaps, sum_us,
                 greatest(abs(rn::DOUBLE / n_gaps - fx),
                          abs((rn - 1)::DOUBLE / n_gaps - fx)) AS dev
          FROM r)
    SELECT event_type, min(n_gaps)::BIGINT AS n_gaps,
           round((min(sum_us)::DOUBLE / min(n_gaps)) / 1000000.0, 6)
             AS mean_gap_s,
           round(max(dev), 6) AS ks_d
    FROM d GROUP BY event_type
    """,
    ops=["EXT-windows", "G2", "O3", "W2"],
)
def q_interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-process audit per event_type: MLE exponential rate over
    exact integer-microsecond inter-arrival gaps and the KS distance of
    the empirical gap CDF from Exp(lambda) — bursty/scheduled traffic
    shows up as a large ks_d
    (operators/timeseries.interarrival_exp_fit)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        interarrival_exp_fit,
    )

    return interarrival_exp_fit(_t(spark, sf_dir, "events"))


# ===========================================================================
# Round 9: spectral / long-memory / robust-dispersion diagnostics
# ===========================================================================

from openrouter_batch_processor_spark.operators.timeseries import (  # noqa: E402
    HURST_SIZES,
    PERIODOGRAM_PERIODS,
    _trig_table,
)
import math as _math  # noqa: E402


def _periodogram_sql() -> str:
    def lits(p, fn):
        return "[" + ", ".join(repr(v) for v in _trig_table(p, fn)) + "]"

    arms = "\n    UNION ALL\n".join(
        f"""
    SELECT event_type, {p}::BIGINT AS period_h, x,
           round(x * ({lits(p, _math.cos)})[(t % {p})::INT + 1], 9)::DECIMAL(28,9) AS xc,
           round(x * ({lits(p, _math.sin)})[(t % {p})::INT + 1], 9)::DECIMAL(28,9) AS xs
    FROM idx"""
        for p in PERIODOGRAM_PERIODS
    )
    return f"""
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) - 1 AS t
      FROM ser),
    terms AS ({arms}),
    a AS (SELECT event_type, period_h, count(*)::BIGINT AS n,
                 sum(xc)::DOUBLE AS c, sum(xs)::DOUBLE AS s
          FROM terms GROUP BY 1, 2)
    SELECT event_type, period_h, n,
           round((c * c + s * s) / n, 6) AS power,
           (row_number() OVER (PARTITION BY event_type
              ORDER BY round((c * c + s * s) / n, 6) DESC, period_h))::BIGINT
             AS "rank"
    FROM a
    """


@register(
    "events_periodogram",
    _periodogram_sql(),
    ops=["EXT-timeseries", "EXT-windows", "G2", "O3", "W2"],
)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the hourly count series per event_type
    at calendar candidate periods (3h..weekly), power-ranked — the
    seasonality detector; trig factors are Python-computed literals
    indexed by integer phase, so the spectral sums are bit-identical
    cross-engine (operators/timeseries.periodogram_topk)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        periodogram_topk,
    )

    return periodogram_topk(_t(spark, sf_dir, "events"))


def _hurst_sql() -> str:
    size_ctes, unions = [], []
    for nb in HURST_SIZES:
        size_ctes.append(f"""
    b{nb} AS (SELECT event_type, x, (rn - 1) // {nb} AS blk, rn FROM idx1),
    g{nb} AS (SELECT event_type, blk, count(*)::BIGINT AS cnt,
                     sum(x)::BIGINT AS s, sum(x * x)::BIGINT AS q
              FROM b{nb} GROUP BY 1, 2),
    c{nb} AS (SELECT b.event_type, b.blk, g.s, g.q,
                     (sum(b.x) OVER (PARTITION BY b.event_type, b.blk
                                     ORDER BY b.rn))::BIGINT AS cum,
                     (row_number() OVER (PARTITION BY b.event_type, b.blk
                                         ORDER BY b.rn))::BIGINT AS i
              FROM b{nb} b JOIN g{nb} g
                ON g.event_type = b.event_type AND g.blk = b.blk
              WHERE g.cnt = {nb}),
    r{nb} AS (SELECT event_type, blk, s, q,
                     (max({nb} * cum - i * s) - min({nb} * cum - i * s))::BIGINT
                       AS rn_range
              FROM c{nb} GROUP BY 1, 2, 3, 4),
    m{nb} AS (SELECT event_type, {nb}::BIGINT AS block_n,
                     count(*)::BIGINT AS n_blocks,
                     sum(round(ln(rn_range::DOUBLE
                                  / sqrt(({nb} * q - s * s)::DOUBLE)), 9)
                         ::DECIMAL(28,9))::DOUBLE / count(*) AS mean_lrs
              FROM r{nb}
              WHERE {nb} * q - s * s > 0 AND rn_range > 0 GROUP BY 1)""")
        unions.append(f"SELECT * FROM m{nb}")
    lx_case = " ".join(
        f"WHEN {nb} THEN {_math.log(nb)!r}" for nb in HURST_SIZES
    )
    return f"""
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx1 AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),{",".join(size_ctes)},
    pts AS ({" UNION ALL ".join(unions)}),
    px AS (SELECT event_type, block_n, n_blocks, mean_lrs,
                  CASE block_n {lx_case} END AS lx
           FROM pts),
    reg AS (SELECT event_type, count(*)::BIGINT AS k,
                   sum(round(lx, 9)::DECIMAL(28,9))::DOUBLE AS sx,
                   sum(round(mean_lrs, 9)::DECIMAL(28,9))::DOUBLE AS sy,
                   sum(round(lx * mean_lrs, 9)::DECIMAL(28,9))::DOUBLE AS sxy,
                   sum(round(lx * lx, 9)::DECIMAL(28,9))::DOUBLE AS sxx
            FROM px GROUP BY 1)
    SELECT px.event_type, block_n, n_blocks,
           round(mean_lrs, 6) AS mean_ln_rs,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst
    FROM px JOIN reg ON reg.event_type = px.event_type
    """


@register(
    "events_hurst_rs",
    _hurst_sql(),
    ops=["EXT-timeseries", "G2", "W2"],
)
def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis of the hourly count
    series per event_type: exact-integer block R/S (n*R and n^2*var
    are BIGINT), validated per-row ln, closed-form log-log slope —
    the long-range-dependence detector for bursty traffic
    (operators/timeseries.hurst_rs)."""
    from openrouter_batch_processor_spark.operators.timeseries import hurst_rs

    return hurst_rs(_t(spark, sf_dir, "events"))


@register(
    "stats_tukey_fences",
    """
    WITH r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM events),
    q AS (SELECT event_type, min(n)::BIGINT AS n,
                 min(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
                 max(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS q3
          FROM r GROUP BY 1),
    f AS (SELECT event_type, n, q1, q3,
                 q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
          FROM q)
    SELECT e.event_type, min(f.n)::BIGINT AS n_events,
           round(min(q1), 6) AS q1, round(min(q3), 6) AS q3,
           round(min(q3 - q1), 6) AS iqr,
           round(min(lo), 6) AS lo_fence, round(min(hi), 6) AS hi_fence,
           sum((e.value < f.lo)::INT)::BIGINT AS n_low,
           sum((e.value > f.hi)::INT)::BIGINT AS n_high,
           round(sum((e.value < f.lo OR e.value > f.hi)::INT)::DOUBLE
                 / min(f.n), 6) AS outlier_frac
    FROM events e JOIN f USING (event_type) GROUP BY 1
    """,
    ops=["EXT-quality", "G2", "O3"],
)
def q_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot fences per event_type: exact rank quartiles
    (no interpolation — engine-portable), 1.5*IQR fences, outlier
    counts/fraction (operators/timeseries.tukey_fences)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        tukey_fences,
    )

    return tukey_fences(_t(spark, sf_dir, "events"))


@register(
    "stats_mood_median",
    """
    WITH c AS (SELECT event_type, (round(value * 100))::BIGINT AS cv FROM events),
    h AS (SELECT cv, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
    cm AS (SELECT cv,
                  (sum(cnt) OVER (ORDER BY cv ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
                  (sum(cnt) OVER ())::BIGINT AS nn FROM h),
    md AS (SELECT min(cv)::BIGINT AS med_cv FROM cm WHERE cum >= (nn + 1) // 2),
    cl AS (SELECT event_type, min(med_cv) / 100.0 AS grand_median,
                  sum((cv > med_cv)::INT)::BIGINT AS n_above,
                  sum((cv <= med_cv)::INT)::BIGINT AS n_below
           FROM c CROSS JOIN md GROUP BY 1),
    t AS (SELECT sum(n_above)::BIGINT AS ta, sum(n_below)::BIGINT AS tb,
                 (sum(n_above) + sum(n_below))::BIGINT AS nn FROM cl),
    s AS (SELECT event_type, grand_median, n_above, n_below,
                 round(ta * (n_above + n_below) / nn, 6) AS exp_above,
                 round((n_above - ta * (n_above + n_below) / nn)
                       * (n_above - ta * (n_above + n_below) / nn)
                       / (ta * (n_above + n_below) / nn)
                     + (n_below - tb * (n_above + n_below) / nn)
                       * (n_below - tb * (n_above + n_below) / nn)
                       / (tb * (n_above + n_below) / nn), 6) AS chi2_term,
                 round((n_above - ta * (n_above + n_below) / nn)
                       * (n_above - ta * (n_above + n_below) / nn)
                       / (ta * (n_above + n_below) / nn)
                     + (n_below - tb * (n_above + n_below) / nn)
                       * (n_below - tb * (n_above + n_below) / nn)
                       / (tb * (n_above + n_below) / nn), 9)::DECIMAL(28,9) AS t9
          FROM cl CROSS JOIN t),
    tt AS (SELECT round(sum(t9)::DOUBLE, 6) AS chi2_stat FROM s)
    SELECT event_type, grand_median, n_above, n_below, exp_above, chi2_term,
           chi2_stat
    FROM s CROSS JOIN tt
    """,
    ops=["EXT-audit", "G2", "O3"],
)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event_types: grand median read off a
    value-domain-bounded integer-cents histogram (no global row
    window — the 100-TB-safe exact-median shape), integer cell counts,
    per-type chi-square terms + overall statistic
    (operators/timeseries.mood_median_test)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        mood_median_test,
    )

    return mood_median_test(_t(spark, sf_dir, "events"))


@register(
    "events_seasonal_strength",
    """
    WITH ser AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT event_type, hour, x,
             row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
      FROM ser),
    d AS (
      SELECT event_type, extract(hour FROM hour)::BIGINT AS hod,
             25 * x - sum(x) OVER w AS d25,
             count(*) OVER w AS wn
      FROM idx
      WINDOW w AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    dk AS (SELECT event_type, hod, d25 FROM d WHERE wn = 25),
    seas AS (SELECT event_type, hod,
                    ((sum(d25)::BIGINT * 10000000) // (25 * count(*)))::BIGINT AS s7
             FROM dk GROUP BY 1, 2),
    j AS (SELECT dk.event_type,
                 dk.d25 / 25.0 AS dd,
                 dk.d25 / 25.0 - seas.s7 / 10000000.0 AS r
          FROM dk JOIN seas ON seas.event_type = dk.event_type
                           AND seas.hod = dk.hod),
    ag AS (SELECT event_type, count(*)::BIGINT AS n,
                  sum(round(dd, 9)::DECIMAL(28,9))::DOUBLE AS sd_,
                  sum(round(dd * dd, 9)::DECIMAL(28,9))::DOUBLE AS qd,
                  sum(round(r, 9)::DECIMAL(28,9))::DOUBLE AS sr,
                  sum(round(r * r, 9)::DECIMAL(28,9))::DOUBLE AS qr
           FROM j GROUP BY 1)
    SELECT event_type, n,
           round((n * qd - sd_ * sd_) / (n * n), 6) AS var_detrended,
           round((n * qr - sr * sr) / (n * n), 6) AS var_remainder,
           round(greatest(0.0, 1.0 - ((n * qr - sr * sr) / (n * n))
                                   / ((n * qd - sd_ * sd_) / (n * n))), 6)
             AS seasonal_strength
    FROM ag
    """,
    ops=["EXT-windows", "EXT-timeseries", "G2", "W1"],
)
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength score F_S = max(0, 1 - Var(remainder)/
    Var(detrended)) per event_type over the decompose's exact x25
    integer carry — scores whether the daily cycle is worth
    materializing (operators/timeseries.seasonal_strength)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        seasonal_strength,
    )

    return seasonal_strength(_t(spark, sf_dir, "events"))


@register(
    "stats_welch_ttest",
    """
    WITH c AS (SELECT event_type, (round(value * 100))::BIGINT AS cv FROM events),
    g AS (SELECT event_type, count(*)::BIGINT AS n, sum(cv)::BIGINT AS s,
                 sum(cv * cv)::BIGINT AS q FROM c GROUP BY 1),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
                 a.q AS qa, b.q AS qb
          FROM g a JOIN g b ON a.event_type < b.event_type),
    s2 AS (SELECT type_a, type_b, na, nb,
                  sa / (100.0 * na) AS ma, sb / (100.0 * nb) AS mb,
                  (((na * qa - sa * sa)::DOUBLE
                    / (na::DOUBLE * (na - 1))) / 10000.0) / na AS se2a,
                  (((nb * qb - sb * sb)::DOUBLE
                    / (nb::DOUBLE * (nb - 1))) / 10000.0) / nb AS se2b
           FROM p)
    SELECT type_a, type_b, na, nb,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           round((ma - mb) / sqrt(se2a + se2b), 6) AS t_stat,
           round((se2a + se2b) * (se2a + se2b)
                 / (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1)), 6)
             AS welch_df
    FROM s2
    """,
    ops=["EXT-audit", "EXT-timeseries", "G2", "J2"],
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between every event_type pair
    from exact integer-cents (n, sum, sum-sq) triples — quantifies
    the location shift Mood's median test only detects
    (operators/timeseries.welch_ttest)."""
    from openrouter_batch_processor_spark.operators.timeseries import welch_ttest

    return welch_ttest(_t(spark, sf_dir, "events"))


@register(
    "stats_kruskal_wallis",
    """
    WITH c AS (SELECT event_type, (round(value * 100))::BIGINT AS cv FROM events),
    h AS (SELECT cv, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
    r AS (SELECT cv, cnt,
                 (2 * sum(cnt) OVER (ORDER BY cv ROWS UNBOUNDED PRECEDING)
                  - cnt + 1)::BIGINT AS mr2
          FROM h),
    tot AS (SELECT sum(cnt)::BIGINT AS nn,
                   sum(cnt::HUGEINT * cnt * cnt - cnt) AS tie_sum FROM h),
    g AS (SELECT event_type, count(*)::BIGINT AS n, sum(mr2)::BIGINT AS r2
          FROM c JOIN r USING (cv) GROUP BY 1),
    s AS (SELECT event_type, n, r2 / 2.0 AS rank_sum,
                 round(r2 / (2.0 * n), 6) AS mean_rank,
                 round(r2::DOUBLE * r2::DOUBLE / (4.0 * n), 9)::DECIMAL(38,9) AS t9
          FROM g),
    f AS (SELECT sum(t9)::DOUBLE AS term_sum FROM s),
    hh AS (SELECT 12.0 / (nn::DOUBLE * (nn + 1)) * term_sum
                    - 3 * (nn::DOUBLE + 1) AS h_,
                  1.0 - tie_sum::DOUBLE
                        / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE) AS c_
           FROM f CROSS JOIN tot)
    SELECT event_type, n, rank_sum, mean_rank,
           round(h_, 6) AS h_stat, round(h_ / c_, 6) AS h_tie_corrected
    FROM s CROSS JOIN hh
    """,
    ops=["EXT-audit", "G2", "O3"],
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test across event_types: midranks off the
    integer-cents value histogram (domain-bounded, the Mood's-median
    shape), exact BIGINT rank sums, tie-corrected H
    (operators/timeseries.kruskal_wallis)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        kruskal_wallis,
    )

    return kruskal_wallis(_t(spark, sf_dir, "events"))


@register(
    "stats_brown_forsythe",
    """
    WITH c AS (SELECT event_type, (round(value * 100))::BIGINT AS cv FROM events),
    gh AS (SELECT event_type, cv, count(*)::BIGINT AS cnt FROM c GROUP BY 1, 2),
    cm AS (SELECT event_type, cv,
                  (sum(cnt) OVER (PARTITION BY event_type ORDER BY cv
                                  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
                  (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS ng
           FROM gh),
    md AS (SELECT event_type, min(cv)::BIGINT AS med_cv
           FROM cm WHERE cum >= (ng + 1) // 2 GROUP BY 1),
    z AS (SELECT c.event_type, abs(cv - med_cv)::BIGINT AS z
          FROM c JOIN md USING (event_type)),
    g AS (SELECT event_type, count(*)::BIGINT AS n, sum(z)::BIGINT AS sz,
                 sum(z * z)::BIGINT AS qz
          FROM z GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
                   sum(sz)::BIGINT AS szz FROM g),
    sc AS (SELECT event_type, n, k, nn,
                  round(n * (sz::DOUBLE / n - szz::DOUBLE / nn)
                          * (sz::DOUBLE / n - szz::DOUBLE / nn),
                        9)::DECIMAL(28,9) AS b9,
                  round(qz::DOUBLE - sz::DOUBLE * sz::DOUBLE / n,
                        9)::DECIMAL(28,9) AS w9,
                  round(sz::DOUBLE / n / 100.0, 6) AS mean_absdev
           FROM g CROSS JOIN tot),
    fv AS (SELECT round((sum(b9)::DOUBLE / (k - 1))
                        / (sum(w9)::DOUBLE / (nn - k)), 6) AS f_stat,
                  (k - 1)::BIGINT AS df1, (nn - k)::BIGINT AS df2
           FROM sc GROUP BY k, nn)
    SELECT sc.event_type, sc.n, md.med_cv / 100.0 AS group_median,
           sc.mean_absdev, fv.f_stat, fv.df1, fv.df2
    FROM sc JOIN md USING (event_type) CROSS JOIN fv
    """,
    ops=["EXT-audit", "G2", "O3"],
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity F across event_types:
    per-type exact medians off colocated cents histograms, BIGINT
    absolute-deviation moments
    (operators/timeseries.brown_forsythe)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        brown_forsythe,
    )

    return brown_forsythe(_t(spark, sf_dir, "events"))


@register(
    "stats_kendall_tau",
    """
    WITH cells AS (
      SELECT extract(hour FROM ts)::BIGINT AS x,
             ((round(value * 100))::BIGINT // 1000)::BIGINT AS y,
             count(*)::BIGINT AS cnt
      FROM events GROUP BY 1, 2),
    cd AS (SELECT sum(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END)::BIGINT
                    AS concordant,
                  sum(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END)::BIGINT
                    AS discordant
           FROM cells a JOIN cells b ON a.x < b.x),
    tx AS (SELECT sum(t)::BIGINT AS nn, sum(t * (t - 1) // 2)::BIGINT AS n1
           FROM (SELECT sum(cnt)::BIGINT AS t FROM cells GROUP BY x) mx),
    ty AS (SELECT sum(t * (t - 1) // 2)::BIGINT AS n2
           FROM (SELECT sum(cnt)::BIGINT AS t FROM cells GROUP BY y) my)
    SELECT nn, concordant, discordant, n1, n2,
           round((concordant - discordant)
                 / sqrt((nn::DOUBLE * (nn - 1) / 2 - n1)
                        * (nn::DOUBLE * (nn - 1) / 2 - n2)), 6) AS tau_b
    FROM cd CROSS JOIN tx CROSS JOIN ty
    """,
    ops=["EXT-audit", "G2", "J2"],
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between hour-of-day and binned value: pair
    counting over the domain-bounded joint histogram's self-join —
    never an event-pair join (operators/timeseries.kendall_tau_binned)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        kendall_tau_binned,
    )

    return kendall_tau_binned(_t(spark, sf_dir, "events"))


@register(
    "events_theta_forecast",
    """
    WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                          count(*)::BIGINT AS y
                   FROM events GROUP BY 1, 2),
    idx AS (SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type ORDER BY day)::BIGINT
                     AS t
            FROM daily),
    ols AS (SELECT event_type, count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
                   sum(t * t)::BIGINT AS stt, sum(y)::BIGINT AS sy,
                   sum(t * y)::BIGINT AS sty
            FROM idx GROUP BY 1),
    fit AS (SELECT event_type, n,
                   (n * sty - st * sy)::DOUBLE / (n * stt - st * st)::DOUBLE AS b,
                   (sy - (n * sty - st * sy)::DOUBLE
                           / (n * stt - st * st)::DOUBLE * st) / n AS a
            FROM ols WHERE n >= 2),
    z AS (SELECT i.event_type, f.n, f.a, f.b, i.t,
                 2 * i.y - (f.a + f.b * i.t) AS z
          FROM idx i JOIN fit f USING (event_type)),
    terms AS (SELECT event_type, n, a, b,
                     round(CASE WHEN t = 1 THEN pow(0.5, n - 1)
                                ELSE 0.5 * pow(0.5, n - t) END * z,
                           9)::DECIMAL(28,9) AS t9
              FROM z),
    ses AS (SELECT event_type, n, a, b, sum(t9)::DOUBLE AS ses_theta2
            FROM terms GROUP BY 1, 2, 3, 4)
    SELECT event_type, n AS n_days, round(b, 6) AS slope,
           round(a, 6) AS intercept, round(ses_theta2, 6) AS ses_theta2,
           round((ses_theta2 + a + b * (n + 1)) / 2.0, 6) AS forecast_next
    FROM ses
    """,
    ops=["EXT-timeseries", "G2", "W1"],
)
def q_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method one-step daily forecast per event_type: exact
    BIGINT OLS moments + alpha=0.5 SES whose weights are exact powers
    of two (operators/timeseries.theta_forecast)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        theta_forecast,
    )

    return theta_forecast(_t(spark, sf_dir, "events"))


@register(
    "events_kaplan_meier",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, floor(epoch(ts))::BIGINT AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts))::BIGINT
                          - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (SELECT user_id, ep,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
             FROM flagged),
    gm AS (SELECT max(floor(epoch(ts))::BIGINT) AS gmax FROM events),
    durs AS (SELECT ((max(ep) - min(ep)) // 60)::BIGINT AS dur,
                    (max(ep) > (SELECT gmax FROM gm) - 1800)::INT AS censored
             FROM sess GROUP BY user_id, session_id),
    hist AS (SELECT dur, sum(1 - censored)::BIGINT AS d,
                    sum(censored)::BIGINT AS c, count(*)::BIGINT AS m
             FROM durs GROUP BY dur),
    risk AS (SELECT dur, d, c,
                    (sum(m) OVER ()
                     - sum(m) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                     + m)::BIGINT AS n_at_risk
             FROM hist),
    death AS (SELECT dur, d, c, n_at_risk,
                     CASE WHEN d < n_at_risk
                          THEN round(ln((n_at_risk - d)::DOUBLE
                                        / n_at_risk::DOUBLE), 9)::DECIMAL(28,9)
                     END AS ln9,
                     (d >= n_at_risk)::INT AS zero
              FROM risk WHERE d > 0)
    SELECT dur AS duration_min, n_at_risk, d AS n_events, c AS n_censored,
           CASE WHEN max(zero) OVER wc = 1 THEN 0.0
                ELSE round(exp((sum(ln9) OVER wc)::DOUBLE), 6) END AS survival
    FROM death WINDOW wc AS (ORDER BY dur ROWS UNBOUNDED PRECEDING)
    """,
    ops=["EXT-sessions", "EXT-audit", "G2", "T1", "W1"],
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of 30-min-gap session durations with
    right-censoring at the corpus tail: product-limit over the
    duration-domain-bounded histogram
    (operators/timeseries.kaplan_meier_sessions)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        kaplan_meier_sessions,
    )

    return kaplan_meier_sessions(_t(spark, sf_dir, "events"))


@register(
    "events_nelson_aalen",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, floor(epoch(ts))::BIGINT AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts))::BIGINT
                          - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (SELECT user_id, ep,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
             FROM flagged),
    gm AS (SELECT max(floor(epoch(ts))::BIGINT) AS gmax FROM events),
    durs AS (SELECT ((max(ep) - min(ep)) // 60)::BIGINT AS dur,
                    (max(ep) > (SELECT gmax FROM gm) - 1800)::INT AS censored
             FROM sess GROUP BY user_id, session_id),
    hist AS (SELECT dur, sum(1 - censored)::BIGINT AS d,
                    sum(censored)::BIGINT AS c, count(*)::BIGINT AS m
             FROM durs GROUP BY dur),
    risk AS (SELECT dur, d,
                    (sum(m) OVER ()
                     - sum(m) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                     + m)::BIGINT AS n_at_risk
             FROM hist),
    death AS (SELECT dur, d, n_at_risk,
                     round(d::DOUBLE / n_at_risk::DOUBLE, 9)::DECIMAL(28,9) AS h9,
                     round(d::DOUBLE / (n_at_risk::DOUBLE * n_at_risk::DOUBLE),
                           9)::DECIMAL(28,9) AS v9
              FROM risk WHERE d > 0)
    SELECT dur AS duration_min, n_at_risk, d AS n_events,
           round((sum(h9) OVER wc)::DOUBLE, 6) AS cum_hazard,
           round((sum(v9) OVER wc)::DOUBLE, 6) AS hazard_var,
           round(exp(-((sum(h9) OVER wc)::DOUBLE)), 6) AS fh_survival
    FROM death WINDOW wc AS (ORDER BY dur ROWS UNBOUNDED PRECEDING)
    """,
    ops=["EXT-sessions", "EXT-audit", "G2", "T1", "W1"],
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard (+ variance and the Fleming-
    Harrington survival) over the same censored session durations as
    events_kaplan_meier (operators/timeseries.nelson_aalen_sessions)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        nelson_aalen_sessions,
    )

    return nelson_aalen_sessions(_t(spark, sf_dir, "events"))


@register(
    "stats_cohens_d",
    """
    WITH c AS (SELECT event_type, (round(value * 100))::BIGINT AS cv FROM events),
    g AS (SELECT event_type, count(*)::BIGINT AS n, sum(cv)::BIGINT AS s,
                 sum(cv * cv)::BIGINT AS q
          FROM c GROUP BY 1 HAVING count(*) >= 2),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.n AS na, b.n AS nb,
                 a.s / (100.0 * a.n) - b.s / (100.0 * b.n) AS md,
                 (((a.n - 1) * (((a.n * a.q - a.s * a.s)::DOUBLE
                                 / (a.n::DOUBLE * (a.n - 1))) / 10000.0)
                   + (b.n - 1) * (((b.n * b.q - b.s * b.s)::DOUBLE
                                   / (b.n::DOUBLE * (b.n - 1))) / 10000.0))
                  / (a.n + b.n - 2)) AS sp2
          FROM g a JOIN g b ON a.event_type < b.event_type)
    SELECT type_a, type_b, na, nb,
           round(md / sqrt(sp2), 6) AS cohens_d,
           round(md / sqrt(sp2) * (1.0 - 3.0 / (4 * (na + nb) - 9)), 6)
             AS hedges_g,
           round(sqrt(sp2), 6) AS pooled_sd
    FROM p
    """,
    ops=["EXT-audit", "G2", "J2"],
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g standardized effect sizes between every
    event_type pair — the magnitude companion to stats_welch_ttest
    (operators/timeseries.cohens_d_pairs)."""
    from openrouter_batch_processor_spark.operators.timeseries import (
        cohens_d_pairs,
    )

    return cohens_d_pairs(_t(spark, sf_dir, "events"))


# ===========================================================================
# Round 11 (second batch): randomization (permutation) test
# ===========================================================================


@register(
    "stats_permutation_test",
    """
    WITH base AS (SELECT doc_id::VARCHAR AS k, lang = 'en' AS in_a,
                         n_chars::BIGINT AS val
                  FROM documents),
    obs AS (SELECT sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
                   sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS n_b,
                   sum(CASE WHEN in_a THEN val END)::DOUBLE
                     / sum(CASE WHEN in_a THEN 1 END)
                   - sum(CASE WHEN NOT in_a THEN val END)::DOUBLE
                     / sum(CASE WHEN NOT in_a THEN 1 END) AS obs_diff
            FROM base),
    pr AS (SELECT k, val, unnest(range(1, 201))::BIGINT AS p FROM base),
    co AS (SELECT val, p,
                  ('0x' || substr(md5(k || ':' || p::VARCHAR), 1, 8))::BIGINT
                    % 2 = 0 AS a
           FROM pr),
    pd AS (SELECT p,
                  sum(CASE WHEN a THEN val END)::DOUBLE
                    / sum(CASE WHEN a THEN 1 END)
                  - sum(CASE WHEN NOT a THEN val END)::DOUBLE
                    / sum(CASE WHEN NOT a THEN 1 END) AS diff
           FROM co GROUP BY p)
    SELECT obs.n_a, obs.n_b, round(obs.obs_diff, 6) AS obs_diff,
           count(diff)::BIGINT AS n_perms,
           sum(CASE WHEN abs(diff) >= abs(obs.obs_diff) THEN 1 ELSE 0
               END)::BIGINT AS n_extreme,
           round((1 + sum(CASE WHEN abs(diff) >= abs(obs.obs_diff)
                               THEN 1 ELSE 0 END))
                 / (1.0 + count(diff)), 6) AS p_value
    FROM pd CROSS JOIN obs
    GROUP BY obs.n_a, obs.n_b, obs.obs_diff
    """,
    ops=["EXT-quality", "F4", "G2"],
)
def q_stats_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-style randomization test: is mean n_chars of lang='en'
    docs different from the rest? 200 deterministic md5-coin
    reassignments build the null; p = (1+#extreme)/(1+P). One corpus
    pass, combiner groupBy on perm id — shuffle is P×partitions rows
    at any corpus size (operators/sampling.permutation_test)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        permutation_test,
    )

    return permutation_test(_t(spark, sf_dir, "documents"))
