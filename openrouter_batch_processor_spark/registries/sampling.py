"""Sampling queries: stratified/reservoir/weighted and split policies.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "sample_stratified",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN 20 ELSE 10 END
    """,
    ops=["P1", "EXT-sampling"],
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates via a hash
    gate (md5 of the id) — reproducible on any engine and any partition
    layout, unlike rand()-based sampling. The standard way to cut
    per-source/per-language quotas into a 100 TB corpus."""
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    rate = F.when(F.col("lang") == "en", 20).otherwise(10)
    return docs.filter(h % 100 < rate).select("doc_id", "lang", "source")


# ===========================================================================
# Weighted priority sampling + dimension-wise embedding statistics
# ===========================================================================


@register(
    "sample_weighted_priority",
    """
    WITH h AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS hv
      FROM documents WHERE n_chars > 0),
    keyed AS (
      SELECT doc_id, n_chars,
             n_chars::DOUBLE / ((hv + 1)::DOUBLE / 4503599627370496.0) AS priority
      FROM h)
    SELECT doc_id, n_chars, round(priority, 6) AS priority
    FROM keyed
    ORDER BY priority DESC, doc_id ASC
    LIMIT 50
    """,
    ops=["EXT-sampling", "O3", "F4"],
)
def q_sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield-Lund-Thorup): priority = weight / u with u a md5-derived
    uniform in (0,1], take the top-k priorities. Longer documents are
    proportionally more likely to be drawn — the quality/length-weighted
    corpus subsampling step of a training pipeline, but DETERMINISTIC:
    u comes from a hash, not an RNG, so the sample is reproducible
    across runs, engines, and partitionings (md5 -> 52-bit dyadic
    rational -> one IEEE division; no pow/ln whose last-ulp behavior
    differs between libm implementations).

    Map-only scoring + TakeOrdered top-k: no shuffle before the k-row
    heap merge. At 100 TB, k-per-stratum variants reuse the same key
    with a per-group window."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    u = (hv + 1).cast("double") / F.lit(4503599627370496.0)
    priority = F.col("n_chars").cast("double") / u
    return (
        docs.select("doc_id", "n_chars", F.round(priority, 6).alias("priority"))
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(50)
    )


@register(
    "sample_train_val_test_split",
    """
    WITH assigned AS (
      SELECT lang,
             CASE WHEN ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                    THEN 'train'
                  WHEN ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 95
                    THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents)
    SELECT lang, split,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS n_chars_sum
    FROM assigned GROUP BY lang, split
    """,
    ops=["P1", "G2", "F4", "EXT-sampling"],
)
def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: assignment is a salted
    hash gate on the document id — reproducible on any engine, any
    partitioning, any run, and STABLE under corpus growth (a document
    never migrates between splits when new ones arrive; a rand() or
    row_number split would reshuffle everything). Per-(lang, split)
    accounting verifies the stratification proportions. The salt keeps
    this gate independent of any other hash-sampled subset of the same
    ids (unsalted gates correlate: doc_id % 100 < 20 and < 90 are
    nested, not independent)."""
    docs = _t(spark, sf_dir, "documents")
    gate = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(gate < 90, F.lit("train")).when(gate < 95, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("n_chars_sum"),
        )
    )


# ===========================================================================
# Round-4 second wave: per-group weighted reservoir sampling +
# SSL-prototype pruning
# ===========================================================================


@register(
    "sample_reservoir_group",
    """
    WITH h AS (
      SELECT doc_id, source, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS hv
      FROM documents WHERE n_chars > 0),
    keyed AS (
      SELECT doc_id, source, n_chars,
             round(-ln((hv + 0.5) / 4503599627370496.0) / n_chars, 6) AS akey
      FROM h),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY akey ASC, doc_id ASC) AS sel_rank
          FROM keyed)
    SELECT doc_id, source, n_chars, sel_rank::BIGINT AS sel_rank
    FROM r WHERE sel_rank <= 10
    """,
    ops=["EXT-sampling", "O3", "F4", "W1"],
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Efraimidis–Spirakis weighted reservoir sample (k=10,
    weight = n_chars), deterministic hash-uniform keys —
    operators/sampling.weighted_reservoir_per_group."""
    from openrouter_batch_processor_spark.operators.sampling import (
        weighted_reservoir_per_group,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return weighted_reservoir_per_group(
        docs, "source", "n_chars", k=10, id_col="doc_id"
    ).select(
        "doc_id", "source", "n_chars", F.col("rank").cast("long").alias("sel_rank")
    )


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled greedy k-center oracle: per round one MATERIALIZED
    min-dist table update + a 1-row farthest-point pick (round CTEs
    materialized — the BPE/k-core inlining lesson)."""

    def d(a: str, b: str) -> str:
        return (
            f"round(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b}), 6)"
        )

    ctes = [
        "e AS MATERIALIZED (SELECT vec_id AS vid, embedding::DOUBLE[] AS vd"
        " FROM embeddings)",
        "c0 AS (SELECT vid AS cid, vd AS cv FROM e ORDER BY vid LIMIT 1)",
        f"md0 AS MATERIALIZED (SELECT e.vid, e.vd, {d('e.vd', 'c.cv')} AS mind"
        " FROM e, c0 c)",
    ]
    rows = ["SELECT 0::BIGINT AS rank, cid AS center_id, 0.0 AS radius FROM c0"]
    for r in range(1, k):
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT vid AS cid, vd AS cv, mind"
            f" FROM md{r - 1} ORDER BY mind DESC, vid LIMIT 1)"
        )
        rows.append(f"SELECT {r}::BIGINT, cid, round(mind, 6) FROM s{r}")
        if r < k - 1:
            ctes.append(
                f"md{r} AS MATERIALIZED (SELECT m.vid, m.vd,"
                f" least(m.mind, {d('m.vd', 's.cv')}) AS mind"
                f" FROM md{r - 1} m, s{r} s)"
            )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(rows)


@register(
    "sample_kcenter_greedy",
    _kcenter_sql(8),
    ops=["EXT-sampling", "EXT-simsearch", "G2", "O3"],
)
def q_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset over the embeddings —
    the deterministic diversity-first subset selector (Sener & Savarese
    2018 coreset active learning); emits the selection order and the
    non-increasing covering-radius curve
    (operators/sampling.kcenter_greedy)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        kcenter_greedy,
    )

    return kcenter_greedy(_t(spark, sf_dir, "embeddings"), k=8)
