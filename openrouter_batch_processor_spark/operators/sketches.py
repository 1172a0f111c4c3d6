"""KMV (k-minimum-values) distinct sketch — a DETERMINISTIC cardinality
sketch, so unlike HLL it is bit-for-bit reproducible on any engine and
can sit on the oracle-checked correctness path.

Estimator: hash every value to uniform [0,1) (md5 -> uint32 / 2^32);
keep the k smallest distinct hashes; if the k-th smallest is x_k, the
density of distinct hashes is ~(k-1)/x_k, which is the estimate. With
fewer than k distinct values the sketch degrades to exact counting.

Mergeability (why it scales): the union of two sketches' value sets,
re-truncated to the k smallest, is exactly the sketch of the union —
a classic mergeable summary. The implementation below computes the
k-smallest via sort_array(collect_set(...)) per group, which bounds
per-group state at the number of distinct hashes; a production variant
caps state at k per partition with an aggregator, same estimator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 4294967296.0  # 2^32


def _uhash(col: Column) -> Column:
    """Deterministic uint32 hash of a value (md5 prefix), as long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 16,
    estimate_alias: str = "distinct_est",
) -> DataFrame:
    """Per key group: KMV estimate of COUNT(DISTINCT value_col).

    Output: keys..., n_hashes (exact distinct hash count, = exact
    distinct count up to md5 collisions), distinct_est (the sketch
    estimate; equals the exact count when fewer than k distincts)."""
    hashed = df.select(*[F.col(c) for c in keys], _uhash(F.col(value_col)).alias("_h"))
    per_group = hashed.groupBy(*keys).agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_kmin"),
        F.count_distinct(F.col("_h")).alias("n_hashes"),
    )
    kth = F.element_at(F.col("_kmin"), k)
    est = F.round((k - 1) / (kth / F.lit(HASH_SPACE)), 6)
    return per_group.select(
        *keys,
        F.col("n_hashes"),
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(est)
        .alias(estimate_alias),
    )
