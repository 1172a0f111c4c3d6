"""W1/K5 — global sequence renumbering, scalably.

The reference replaces the literal token '000000001' in each group's
output with the group's 1-based global position, zero-padded to the
token width (worker.py:220-236, Aleph/MARC record numbering).

A bare row_number() over an unpartitioned window funnels every row
through ONE task — fine at 10k rows, dead at 10B. The scale-safe shape
(zipWithIndex without RDDs):

  1. sort within partitions by the global key (range partitioning via
     repartitionByRange keeps the key ordered ACROSS partitions),
  2. count rows per partition (a tiny per-partition agg -> driver:
     O(num_partitions), not O(rows)),
  3. broadcast cumulative offsets, add to the within-partition rank.

Both paths are provided: `renumber_small` (single-window, exact
reference shape, used when the plan is known tiny) and `renumber`
(range-partitioned, used by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _padded(rn: "F.Column", width: int) -> "F.Column":
    return F.lpad(rn.cast("string"), width, "0")


def renumber_small(
    df: DataFrame,
    order_col: str,
    token: str = "000000001",
    text_col: str = "output",
) -> DataFrame:
    """Single-window variant: exact, simple, single-task. Keep for small
    result sets (the LLM-pipeline output: one row per group)."""
    w = Window.orderBy(order_col)
    rn = F.row_number().over(w)
    return df.withColumn("seq", _padded(rn, len(token))).withColumn(
        text_col, F.replace(F.col(text_col), F.lit(token), F.col("seq"))
    )


def renumber(
    df: DataFrame,
    order_col: str,
    token: str = "000000001",
    text_col: str = "output",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global renumbering: range partition + partition-local
    row_number + broadcast cumulative offsets. No global single-task
    window; the only driver traffic is num_partitions longs."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # O(num_partitions) rows to the driver — this is metadata, not data.
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    rn = F.row_number().over(w) + offset_map[F.col("_pid")]
    return (
        ranged.withColumn("seq", _padded(rn, len(token)))
        .withColumn(text_col, F.replace(F.col(text_col), F.lit(token), F.col("seq")))
        .drop("_pid")
    )
