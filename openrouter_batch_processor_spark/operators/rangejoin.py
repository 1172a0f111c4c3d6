"""Banded range join — 'rows within a time window of each other'.

A naive `l.user = r.user AND r.ts BETWEEN l.ts - W AND l.ts + W` range
join degenerates to per-key quadratic candidate enumeration (Spark
executes the range residual inside a shuffled equi-join on user only —
every purchase x every click of that user). The scale shape is BANDING:

    bucket both sides by floor(ts / W);
    explode the probe side to buckets {b-1, b, b+1};
    equi-join on (keys..., bucket)  — hash shuffle, no range residual
      over full key groups;
    filter |l.ts - r.ts| <= W exactly.

Every true match is within one bucket of the probe row (|dt| <= W), so
banding loses nothing; candidates per row are bounded by 3 buckets'
occupancy instead of the whole key group's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_count(
    probe: DataFrame,
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    window_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each probe row: count of `events` rows with matching keys and
    |event.ts - probe.ts| <= window_seconds. Probe rows with no matches
    are kept with 0 (left semantics)."""
    w = window_seconds
    p_ep = F.unix_timestamp(F.col(ts_col))
    bucket = F.floor(p_ep / w)
    p = probe.withColumn("_ep", p_ep).withColumn(
        "_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    e = events.select(
        *[F.col(k).alias(f"_e_{k}") for k in keys],
        F.unix_timestamp(F.col(ts_col)).alias("_e_ep"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / w).alias("_bucket"),
    )
    cond = [p[f"_bucket"] == e["_bucket"]] + [
        p[k] == e[f"_e_{k}"] for k in keys
    ]
    joined = p.join(e, cond, "left").filter(
        F.col("_e_ep").isNull() | (F.abs(F.col("_e_ep") - F.col("_ep")) <= w)
    )
    return (
        joined.groupBy(*probe.columns)
        .agg(F.count(F.col("_e_ep")).alias(count_alias))
    )
