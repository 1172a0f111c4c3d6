"""Skew-resilient aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (a bot user_id, an empty-string group,
a viral document) can pin one reducer while 999 executors idle. AQE's
skew-join splitting covers joins; for AGGREGATIONS whose per-key state
is mergeable, the classic fix is salting:

    phase 1: groupBy(key, salt = hash(row) % S) — partial aggregate,
             hot key's rows spread over S reducers;
    phase 2: groupBy(key) — merge the S partials.

Spark's map-side partial aggregation already handles most of this for
algebraic aggs (sum/count/min/max), because partials combine before the
shuffle — salting matters for HOLISTIC aggs whose map-side state is
large or unbounded: collect_list/collect_set, exact distinct counts,
or the sorted-members grouping (G1) with a pathological giant group.

`salted_agg` keeps the same semantics as a plain groupBy for any
merge-decomposable aggregation given as (partial_exprs, merge_exprs).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    n_salts: int = DEFAULT_SALTS,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    partial_aggs(): aggregate exprs for phase 1 (aliased);
    merge_aggs(): exprs merging phase-1 columns in phase 2 (aliased).
    The salt defaults to a hash of all non-key columns — deterministic
    for a given row, uniform across a hot key's rows.
    """
    if salt_col is None:
        non_keys = [c for c in df.columns if c not in keys]
        salt = F.pmod(F.hash(*[F.col(c) for c in non_keys]), F.lit(n_salts))
    else:
        salt = F.pmod(F.col(salt_col), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs())
    )
    return phase1.groupBy(*keys).agg(*merge_aggs()).drop("_salt")


def salted_distinct_count(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe.

    Phase 1 collects distinct values per (key, salt) — a hot key's
    distinct-set is partitioned across salts by the VALUE hash, so no
    single task holds the whole set; phase 2 sums disjoint counts
    (disjoint because the same value always hashes to the same salt)."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("n_distinct"))


def salted_collect_sorted(
    df: DataFrame,
    keys: Sequence[str],
    struct_cols: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """G1's sort_array(collect_list(...)) made skew-safe: collect per
    (key, salt), then flatten + re-sort the S partial arrays — each
    phase-1 task holds at most ~1/S of a giant group."""
    salt = F.pmod(F.hash(*[F.col(c) for c in struct_cols]), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_list(F.struct(*[F.col(c) for c in struct_cols])).alias("_part"))
    )
    return phase1.groupBy(*keys).agg(
        F.sort_array(F.flatten(F.collect_list("_part"))).alias("members"),
        F.sum(F.size("_part")).alias("n_members"),
    )


def topk_per_group_agg(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Top-k rows per group WITHOUT a window: collect (neg order, tie,
    payload) structs per group, sort_array, slice k, posexplode.

    The window form (row_number over partitionBy) sorts every group's
    full row set; this form's per-group state after map-side combine is
    the rows themselves but the final sort is per-group in the agg, and
    a pre-aggregated input (as in top-suppliers-per-nation) makes the
    collect_list small. For unbounded groups, cap state first with
    salted partial top-k (per (key, salt) slice, then merge) — same
    algebra, the slice is the combiner.

    Descending order with ascending tiebreak is encoded as
    struct(-order, tiebreak) under sort_array ASC (exact for doubles).
    Output: group, rank (1-based), order_col, payload_cols."""
    tiebreak = payload_cols[0]
    packed = df.groupBy(group_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col(order_col)).alias("_neg"),
                        F.col(tiebreak).alias("_tb"),
                        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
                    )
                )
            ),
            1,
            k,
        ).alias("_top")
    )
    ex = packed.select(
        group_col, F.posexplode("_top").alias("_pos", "_s")
    )
    return ex.select(
        group_col,
        (F.col("_pos") + 1).cast("long").alias("rank"),
        (-F.col("_s._neg")).alias(order_col),
        *[F.col(f"_s._p.{c}").alias(c) for c in payload_cols],
    )
