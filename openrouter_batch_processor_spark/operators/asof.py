"""As-of (point-in-time) join — the classic custom operator Spark lacks
natively (reference has no such op; this is a north-star extension for
event-stream enrichment: 'the latest quote at or before each trade').

Spark-first implementation: the UNION + window form, NOT a range join.

    left (trades)  tagged side=1 ─┐
    right (quotes) tagged side=0 ─┴─ union
      -> window over (keys) ordered by (ts, side, seq)
      -> last(quote cols, ignorenulls) up to current row
      -> keep side=1 rows

One shuffle on the join keys, state = one row per partition-order
position — O(n log n) per key group and no quadratic candidate
explosion, which is what a naive `l.ts >= r.ts` range join gives you
(every trade x every earlier quote). At 100 TB the shuffle is the same
hash partitioning any equi-join needs, and AQE handles skewed keys.

Tie semantics: a right row at ts == left ts IS visible ('at or
before'), because side=0 sorts before side=1 at equal ts — matching
DuckDB's ASOF JOIN ON l.ts >= r.ts, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Enrich each left row with the value_cols of the latest right row
    (same keys) whose ts <= left ts. Right rows must be unique per
    (keys, ts) — pre-dedup with `latest_per_ts` if needed.

    seq_col breaks ordering ties deterministically (e.g. an event id).
    Output: all left columns + value_cols (renamed asof_<col>) +
    asof_ts (the matched right timestamp, null if none)."""
    lcols = left.columns
    ts_type = dict(right.dtypes)[ts_col]
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(ts_type).alias("_r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in keys and c != ts_col],
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*l.columns)  # align column order
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if seq_col:
        order.append(F.col(seq_col).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        F.col("_side"),
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def latest_per_ts(df: DataFrame, keys: list[str], ts_col: str, seq_col: str) -> DataFrame:
    """Dedup to one row per (keys, ts): highest seq_col wins — makes the
    as-of match deterministic when the right side has same-instant rows."""
    w = Window.partitionBy(*keys, ts_col).orderBy(F.desc(seq_col))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
