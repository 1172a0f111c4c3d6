"""Snapshot diff (CDC-style change detection) between two versions of
a keyed dataset.

The reference's closest behavior is the ingest registry probe — "is
this exact content already stored?" (X1, app.py:191-203) — which is a
whole-dataset membership test. The scale generalization a training-data
pipeline needs is the per-row version: given yesterday's snapshot and
today's, emit exactly what was added / removed / changed, so downstream
stages (dedup registries, embedding indexes, rollups) can be maintained
incrementally instead of rebuilt.

Execution shape: both sides reduce to (key, row_fingerprint) — one
narrow projection each, no data movement beyond the single full-outer
equi-join on the key (shuffle or broadcast, Catalyst/AQE's choice).
The fingerprint is md5 over unit-separator-joined columns with a NULL
sentinel, so "changed" is detected on one 32-byte comparison per key
regardless of row width. Column rendering caveat: only pass compare
columns whose string form is engine-portable (ints/strings/bools —
NOT raw doubles or timestamps) when an external oracle must reproduce
the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00"
FIELD_SEP = "\x1f"


def row_fingerprint(cols: list[str]) -> F.Column:
    """md5 of the unit-separator-joined, NULL-sentineled column values."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in cols]
    return F.md5(F.concat_ws(FIELD_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(key_cols..., change_type) for every key that differs between
    snapshots; change_type in {'added', 'removed', 'changed'}.

    PRECONDITION: key_cols must be unique within each snapshot (one row
    per key). Duplicate keys fan out through the full-outer join and
    emit duplicate — possibly contradictory — change rows; pre-aggregate
    to one row per key (or assert uniqueness) before calling if the
    source can carry duplicates. Downstream consumers (registry MERGEs,
    index maintenance) assume one change row per key.

    Unchanged keys are filtered out before the result ever leaves the
    join stage — at 100 TB the output is proportional to the churn, not
    the snapshot."""
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("_h_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("_h_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def incremental_agg_maintenance(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    value_col: str,
    value_type: str = "long",
) -> DataFrame:
    """Maintain a per-group (n_rows, value_sum) rollup under a snapshot
    change WITHOUT re-aggregating the new snapshot: combine the old
    aggregate with signed delta contributions from only the
    added/removed/changed keys.

    Why it matters at 100 TB: the full snapshot re-aggregation is
    O(snapshot); this path is O(churn) past the one-time old aggregate
    (which in a real deployment is the already-materialized rollup).
    Work shape: snapshot_diff (churn rows) -> two churn-sized semi/inner
    joins to fetch old and new row values -> one combiner-friendly
    groupBy of signed deltas -> union with the old aggregate and one
    final combine. Every sum is exact (LongType / DECIMAL), so the
    maintained rollup is bit-identical to the direct aggregate of the
    new snapshot — which is exactly how the oracle checks it.

    Same key-uniqueness precondition as snapshot_diff.
    """
    changes = snapshot_diff(old, new, key_cols, [*group_cols, value_col])
    old_rows = old.select(*key_cols, *group_cols, F.col(value_col))
    new_rows = new.select(*key_cols, *group_cols, F.col(value_col))
    # removed + changed keys contribute their OLD row negatively
    neg = (
        changes.filter(F.col("change_type").isin("removed", "changed"))
        .select(*key_cols)
        .join(old_rows, key_cols)
        .select(
            *group_cols,
            F.lit(-1).cast("long").alias("_dn"),
            (-F.col(value_col)).cast(value_type).alias("_dv"),
        )
    )
    # added + changed keys contribute their NEW row positively
    pos = (
        changes.filter(F.col("change_type").isin("added", "changed"))
        .select(*key_cols)
        .join(new_rows, key_cols)
        .select(
            *group_cols,
            F.lit(1).cast("long").alias("_dn"),
            F.col(value_col).cast(value_type).alias("_dv"),
        )
    )
    base = old.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_dn"),
        F.sum(F.col(value_col).cast(value_type)).alias("_dv"),
    )
    return (
        base.unionByName(neg.unionByName(pos))
        .groupBy(*group_cols)
        .agg(F.sum("_dn").alias("n_rows"), F.sum("_dv").alias("value_sum"))
        .filter(F.col("n_rows") > 0)
    )
