"""Per-group weighted sampling: deterministic Efraimidis–Spirakis
reservoir (A-Res) keys.

The global-top-k weighted sample lives in the registry as
sample_weighted_priority (Duffield-Lund-Thorup priority sampling, no
pow/ln at all). A-Res is the PER-GROUP standard: key_i = u_i^(1/w_i),
keep the k largest keys per group — a weighted-without-replacement
sample inside every group in one window pass. We rank by ln(u)/w
(monotone in the key, avoids pow), with u a deterministic md5-derived
uniform — the same hash-uniform + round(·, 6) contract as the DSIR
Gumbel keys (operators/textanalysis.dsir_select), so the sample is
reproducible across runs, engines, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_reservoir_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis–Spirakis (2006) A-Res weighted reservoir sample of
    size k per group, deterministic: u = (hash52(md5(id)) + 0.5)/2^52,
    rank key = round(ln(u)/w, 6) ASCENDING (ln(u) < 0, so the largest
    u^(1/w) is the LEAST negative ln(u)/w — ordering asc on -ln(u)/w
    equals desc on the paper's key), ties broken by id. Returns the
    selected rows with their in-group rank.

    Scale: map-only key computation + one window shuffle on the group
    key; k rows per group survive. At 100 TB this is the standard
    per-source / per-domain subsampling step (e.g. mixture building)
    and the window never sees more than a group's rows."""
    from pyspark.sql.window import Window

    hv = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = (hv + F.lit(0.5)) / F.lit(4503599627370496.0)
    key = F.round(-F.log(u) / F.col(weight_col), 6)
    w = Window.partitionBy(group_col).orderBy(F.asc("_akey"), F.asc(id_col))
    return (
        df.withColumn("_akey", key)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_akey")
    )
