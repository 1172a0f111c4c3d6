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


@register(
    "sample_max_coverage",
    f"""
    WITH b0 AS MATERIALIZED (SELECT DISTINCT doc_id, u.term
                FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                      FROM documents) t,
                     unnest(list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i + 1]))
                       AS u(term)),
    g1 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b0 GROUP BY 1),
    s1 AS MATERIALIZED (SELECT 1::BIGINT AS step, doc_id, gain FROM g1
             ORDER BY gain DESC, doc_id LIMIT 1),
    t1 AS MATERIALIZED (SELECT b.term FROM b0 b JOIN s1 USING (doc_id)),
    b1 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b0 b
             LEFT JOIN t1 ON t1.term = b.term WHERE t1.term IS NULL),
    g2 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b1 GROUP BY 1),
    s2 AS MATERIALIZED (SELECT 2::BIGINT AS step, doc_id, gain FROM g2
             ORDER BY gain DESC, doc_id LIMIT 1),
    t2 AS MATERIALIZED (SELECT b.term FROM b1 b JOIN s2 USING (doc_id)),
    b2 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b1 b
             LEFT JOIN t2 ON t2.term = b.term WHERE t2.term IS NULL),
    g3 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b2 GROUP BY 1),
    s3 AS MATERIALIZED (SELECT 3::BIGINT AS step, doc_id, gain FROM g3
             ORDER BY gain DESC, doc_id LIMIT 1),
    t3 AS MATERIALIZED (SELECT b.term FROM b2 b JOIN s3 USING (doc_id)),
    b3 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b2 b
             LEFT JOIN t3 ON t3.term = b.term WHERE t3.term IS NULL),
    g4 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b3 GROUP BY 1),
    s4 AS MATERIALIZED (SELECT 4::BIGINT AS step, doc_id, gain FROM g4
             ORDER BY gain DESC, doc_id LIMIT 1),
    t4 AS MATERIALIZED (SELECT b.term FROM b3 b JOIN s4 USING (doc_id)),
    b4 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b3 b
             LEFT JOIN t4 ON t4.term = b.term WHERE t4.term IS NULL),
    g5 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b4 GROUP BY 1),
    s5 AS MATERIALIZED (SELECT 5::BIGINT AS step, doc_id, gain FROM g5
             ORDER BY gain DESC, doc_id LIMIT 1),
    t5 AS MATERIALIZED (SELECT b.term FROM b4 b JOIN s5 USING (doc_id)),
    b5 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b4 b
             LEFT JOIN t5 ON t5.term = b.term WHERE t5.term IS NULL),
    g6 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b5 GROUP BY 1),
    s6 AS MATERIALIZED (SELECT 6::BIGINT AS step, doc_id, gain FROM g6
             ORDER BY gain DESC, doc_id LIMIT 1),
    t6 AS MATERIALIZED (SELECT b.term FROM b5 b JOIN s6 USING (doc_id)),
    b6 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b5 b
             LEFT JOIN t6 ON t6.term = b.term WHERE t6.term IS NULL),
    g7 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b6 GROUP BY 1),
    s7 AS MATERIALIZED (SELECT 7::BIGINT AS step, doc_id, gain FROM g7
             ORDER BY gain DESC, doc_id LIMIT 1),
    t7 AS MATERIALIZED (SELECT b.term FROM b6 b JOIN s7 USING (doc_id)),
    b7 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b6 b
             LEFT JOIN t7 ON t7.term = b.term WHERE t7.term IS NULL),
    g8 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM b7 GROUP BY 1),
    s8 AS MATERIALIZED (SELECT 8::BIGINT AS step, doc_id, gain FROM g8
             ORDER BY gain DESC, doc_id LIMIT 1),
    t8 AS MATERIALIZED (SELECT b.term FROM b7 b JOIN s8 USING (doc_id)),
    b8 AS MATERIALIZED (SELECT b.doc_id, b.term FROM b7 b
             LEFT JOIN t8 ON t8.term = b.term WHERE t8.term IS NULL),
    pk AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5 UNION ALL SELECT * FROM s6 UNION ALL SELECT * FROM s7 UNION ALL SELECT * FROM s8)
    SELECT step, doc_id, gain,
           (sum(gain) OVER (ORDER BY step ROWS UNBOUNDED PRECEDING))::BIGINT
             AS covered_total
    FROM pk
    """,
    ops=["EXT-sampling", "EXT-curation", "EXT-tokens", "G2", "O3", "J2"],
)
def q_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage selection of k=8 documents over the
    distinct-vocabulary objective (the 1-1/e submodular baseline,
    facility-location family) — per-step pick, marginal gain and
    cumulative coverage; rounds stop naturally once the vocabulary is
    exhausted (operators/sampling.max_coverage_greedy)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        max_coverage_greedy,
    )

    return max_coverage_greedy(_t(spark, sf_dir, "documents"))


@register(
    "sample_cluster_quota",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
           FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
    {_km_assign_sql('c0', 'a1')},
    {_km_recompute_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    pri AS (SELECT vec_id, cluster_id,
                   ('0x' || substr(md5(vec_id::VARCHAR), 1, 13))::BIGINT AS h
            FROM a2),
    ranked AS (SELECT cluster_id, vec_id,
                      row_number() OVER (PARTITION BY cluster_id
                                         ORDER BY h, vec_id)::BIGINT
                        AS pick_rank
               FROM pri),
    sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
           FROM a2 GROUP BY cluster_id)
    SELECT r.cluster_id, r.vec_id, r.pick_rank, s.cluster_size
    FROM ranked r JOIN sz s USING (cluster_id)
    WHERE r.pick_rank <= 10
    """,
    ops=["EXT-sampling", "EXT-ivf", "G2", "O3", "J4"],
)
def q_cluster_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced quota sampling (VERDICT r09 #8 frontier): a
    fixed quota per Lloyd cluster by deterministic hash priority — the
    diversity-preserving subset selector, reusing the session-staged
    clustering artifact the validity/pruning consumers share
    (operators/sampling.cluster_quota_sample)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        cluster_quota_sample,
    )

    return cluster_quota_sample(_t(spark, sf_dir, "embeddings"), quota=10)


# ===========================================================================
# UniMax language-balanced sampling quotas (r11)
# ===========================================================================

_LANGID_CASE = """
           CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_zh THEN 'de'
                WHEN score_en > score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                WHEN score_es > score_de AND score_es > score_en AND score_es >= score_zh THEN 'es'
                WHEN score_zh > score_de AND score_zh > score_en AND score_zh > score_es THEN 'zh'
                ELSE 'und' END"""


@register(
    "sample_unimax_quotas",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tok,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x)))::BIGINT AS score_de,
             len(list_filter(toks, x -> list_contains(['the','and','of','fast','slow','small','big'], x)))::BIGINT AS score_en,
             len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x)))::BIGINT AS score_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x)))::BIGINT AS score_zh
      FROM t),
    l AS (SELECT {_LANGID_CASE} AS lang, n_tok FROM s),
    per AS (SELECT lang, sum(n_tok)::BIGINT AS n_tokens,
                   (sum(n_tok) * 4)::BIGINT AS cap_tokens
            FROM l GROUP BY 1),
    w AS (SELECT lang, n_tokens, cap_tokens,
                 sum(n_tokens) OVER ()::BIGINT AS total,
                 count(*) OVER ()::BIGINT AS k,
                 row_number() OVER (ORDER BY cap_tokens, lang)::BIGINT AS i,
                 sum(cap_tokens) OVER (ORDER BY cap_tokens, lang
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
          FROM per),
    w2 AS (SELECT *, floor(total * 0.5)::BIGINT AS b,
                  max(CASE WHEN cum + cap_tokens * (k - i)
                                <= floor(total * 0.5)::BIGINT
                           THEN i ELSE 0 END) OVER ()::BIGINT AS istar,
                  max(CASE WHEN cum + cap_tokens * (k - i)
                                <= floor(total * 0.5)::BIGINT
                           THEN cum ELSE 0 END) OVER ()::BIGINT AS cumstar
           FROM w),
    fin AS (SELECT lang, n_tokens, cap_tokens, b,
                   CASE WHEN i <= istar OR istar = k THEN cap_tokens::DOUBLE
                        ELSE (b - cumstar)::DOUBLE / (k - istar) END AS alloc
            FROM w2)
    SELECT lang, n_tokens, cap_tokens, round(alloc, 6) AS alloc_tokens,
           round(alloc / n_tokens, 6) AS epochs,
           round(alloc / b, 6) AS budget_share
    FROM fin
    """,
    ops=["EXT-sampling", "EXT-langid", "G2", "O3"],
)
def q_unimax_quotas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-balanced token quotas (Chung et al. 2023):
    water-filling a budget of half the corpus tokens across the langid
    languages under a 4-epoch cap, in closed form over the k-row
    language table (operators/sampling.unimax_quotas)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        unimax_quotas,
    )

    return unimax_quotas(_t(spark, sf_dir, "documents"))


@register(
    "sample_lang_temperature",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tok,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x)))::BIGINT AS score_de,
             len(list_filter(toks, x -> list_contains(['the','and','of','fast','slow','small','big'], x)))::BIGINT AS score_en,
             len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x)))::BIGINT AS score_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x)))::BIGINT AS score_zh
      FROM t),
    l AS (SELECT {_LANGID_CASE} AS lang, n_tok FROM s),
    per AS (SELECT lang, sum(n_tok)::BIGINT AS n_tokens FROM l GROUP BY 1),
    p AS (SELECT lang, n_tokens, pow(n_tokens::DOUBLE, 0.3) AS pw,
                 sum(n_tokens) OVER ()::BIGINT AS total
          FROM per),
    z AS (SELECT *, sum(pw) OVER () AS zz,
                 floor(total * 0.5)::BIGINT AS b
          FROM p)
    SELECT lang, n_tokens, round(pw / zz, 6) AS share,
           round(pw / zz * b, 6) AS alloc_tokens,
           round(pw / zz * b / n_tokens, 6) AS epochs
    FROM z
    """,
    ops=["EXT-sampling", "EXT-langid", "G2"],
)
def q_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language shares (share ∝ n^0.3, the mT5/XLM-R
    convention) with the implied-epochs column — the over-repetition
    baseline unimax_quotas' epoch cap fixes
    (operators/sampling.language_temperature_shares)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        language_temperature_shares,
    )

    return language_temperature_shares(_t(spark, sf_dir, "documents"))


@register(
    "sample_unimax_apply",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tok,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x)))::BIGINT AS score_de,
             len(list_filter(toks, x -> list_contains(['the','and','of','fast','slow','small','big'], x)))::BIGINT AS score_en,
             len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x)))::BIGINT AS score_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x)))::BIGINT AS score_zh
      FROM t),
    l AS (SELECT doc_id, {_LANGID_CASE} AS lang, n_tok FROM s),
    per AS (SELECT lang, sum(n_tok)::BIGINT AS n_tokens,
                   (sum(n_tok) * 4)::BIGINT AS cap_tokens
            FROM l GROUP BY 1),
    w AS (SELECT lang, n_tokens, cap_tokens,
                 sum(n_tokens) OVER ()::BIGINT AS total,
                 count(*) OVER ()::BIGINT AS k,
                 row_number() OVER (ORDER BY cap_tokens, lang)::BIGINT AS i,
                 sum(cap_tokens) OVER (ORDER BY cap_tokens, lang
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
          FROM per),
    w2 AS (SELECT *, floor(total * 0.5)::BIGINT AS b,
                  max(CASE WHEN cum + cap_tokens * (k - i)
                                <= floor(total * 0.5)::BIGINT
                           THEN i ELSE 0 END) OVER ()::BIGINT AS istar,
                  max(CASE WHEN cum + cap_tokens * (k - i)
                                <= floor(total * 0.5)::BIGINT
                           THEN cum ELSE 0 END) OVER ()::BIGINT AS cumstar
           FROM w),
    q AS (SELECT lang,
                 round(CASE WHEN i <= istar OR istar = k THEN cap_tokens::DOUBLE
                            ELSE (b - cumstar)::DOUBLE / (k - istar) END
                       / n_tokens, 6) AS epochs
          FROM w2),
    drawn AS (
      SELECT l.doc_id, l.lang, q.epochs,
             (floor(q.epochs)
              + CASE WHEN ('0x' || substr(md5(l.doc_id::VARCHAR), 1, 8))::BIGINT
                          % 1000000
                        < floor((q.epochs - floor(q.epochs)) * 1000000)
                     THEN 1 ELSE 0 END)::BIGINT AS n_copies
      FROM l JOIN q USING (lang))
    SELECT doc_id, lang, epochs, n_copies FROM drawn WHERE n_copies >= 1
    """,
    ops=["EXT-sampling", "EXT-langid", "G2", "J3", "P1"],
)
def q_unimax_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax quotas materialized at document granularity: floor(epochs)
    whole copies per doc + one more through the deterministic md5
    fraction gate — the training-mix draw a packing stage consumes
    (operators/sampling.unimax_apply)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        unimax_apply,
    )

    return unimax_apply(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round 11 (second batch): RHO-loss-style learnability selection
# ===========================================================================


@register(
    "sample_rho_select",
    f"""
    WITH {_TF_SQL},
    ctf AS (SELECT term, sum(tf)::BIGINT AS ctf FROM tf GROUP BY term),
    tot AS (SELECT sum(ctf)::DOUBLE AS total_tokens,
                   count(*)::DOUBLE AS vocab FROM ctf),
    ttf AS (SELECT t.term, sum(t.tf)::BIGINT AS ttf
            FROM tf t JOIN documents d USING (doc_id)
            WHERE d.lang = 'en' GROUP BY 1),
    ttot AS (SELECT coalesce(sum(ttf), 0)::DOUBLE AS t_total FROM ttf),
    c AS (SELECT t.doc_id, t.tf,
                 round(t.tf * ln(tot.total_tokens / ctf.ctf), 6)::DECIMAL(18,6)
                   AS nll_c,
                 round(t.tf * ln((ttot.t_total + tot.vocab)
                                 / (coalesce(ttf.ttf, 0) + 1)),
                       6)::DECIMAL(18,6) AS nll_t
          FROM tf t JOIN ctf USING (term) LEFT JOIN ttf USING (term)
          CROSS JOIN tot CROSS JOIN ttot),
    s AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                 round((sum(nll_c) - sum(nll_t))::DOUBLE / sum(tf), 6)
                   AS rho_score
          FROM c GROUP BY 1)
    SELECT s.doc_id, d.lang, s.n_tokens, s.rho_score
    FROM s JOIN documents d USING (doc_id)
    ORDER BY rho_score DESC, doc_id ASC LIMIT 50
    """,
    ops=["EXT-sampling", "EXT-quality", "EXT-tokens", "G2", "O3"],
)
def q_sample_rho_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-loss-style selection (Mindermann et al. 2022) with unigram
    LMs as the proxy models: top-50 docs by (corpus-LM avg NLL −
    target-LM avg NLL), target = the lang='en' slice with add-one
    smoothing over the corpus vocabulary. Selects docs that are hard
    for the generalist but easy for the target domain — learnable and
    worth learning (operators/textanalysis.rho_loss_scores)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        rho_loss_scores,
    )

    return rho_loss_scores(_t(spark, sf_dir, "documents"))


@register(
    "sample_coreset_lightweight",
    """
    WITH x AS (SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS xd
               FROM embeddings),
    dims AS (SELECT u.pos, u.v FROM (
               SELECT unnest(list_transform(range(1, len(xd) + 1),
                             i -> struct_pack(pos := i, v := xd[i]))) AS u
               FROM x) t),
    mu AS (SELECT array_agg(m ORDER BY pos) AS mu FROM (
             SELECT pos, sum(v::DECIMAL(38,12))::DOUBLE / count(*) AS m
             FROM dims GROUP BY pos) q),
    d AS (SELECT vec_id,
                 greatest(round(list_dot_product(xd, xd)
                                - 2 * list_dot_product(xd, mu.mu)
                                + list_dot_product(mu.mu, mu.mu), 6),
                          0.0) AS d2
          FROM x CROSS JOIN mu),
    t AS (SELECT sum(round(d2, 9)::DECIMAL(28,9))::DOUBLE AS total_d2,
                 count(*)::DOUBLE AS n FROM d),
    k AS (SELECT vec_id, d2,
                 0.5 / t.n + 0.5 * d2 / t.total_d2 AS q,
                 (0.5 / t.n + 0.5 * d2 / t.total_d2)
                   / ((('0x' || substr(md5(vec_id::VARCHAR), 1, 13))::BIGINT
                       + 1)::DOUBLE / 4503599627370496.0) AS priority
          FROM d CROSS JOIN t)
    SELECT vec_id, round(d2, 6) AS dist2, round(q, 12) AS sensitivity,
           round(1.0 / (50.0 * q), 6) AS coreset_w,
           round(priority, 12) AS priority
    FROM k ORDER BY priority DESC, vec_id ASC LIMIT 50
    """,
    ops=["EXT-sampling", "EXT-simsearch", "F4", "G2", "O3"],
)
def q_sample_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lightweight k-means coreset (Bachem, Lucic & Krause 2018):
    sensitivity ½/n + ½·d(x,μ)²/Σd², deterministic md5-priority draw
    of 50 points with unbiased coreset weights — no clustering pass
    needed (operators/sampling.lightweight_coreset)."""
    from openrouter_batch_processor_spark.operators.sampling import (
        lightweight_coreset,
    )

    return lightweight_coreset(_t(spark, sf_dir, "embeddings"))


# ===========================================================================
# KNN-Shapley data valuation (r11)
# ===========================================================================


@register(
    "sample_knn_shapley",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                      list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[]) AS nn
               FROM embeddings),
    t AS (SELECT vec_id AS t_id, label AS t_lbl, v AS tv, nn AS tn
          FROM e WHERE vec_id % 10 = 0),
    tr AS (SELECT * FROM e WHERE vec_id % 10 != 0),
    p AS (SELECT tr.vec_id, tr.label, t.t_id, t.t_lbl,
                 round(tr.nn
                       - 2 * list_dot_product(tr.v, t.tv)
                       + t.tn, 6) AS d2
          FROM tr CROSS JOIN t),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY t_id ORDER BY d2, vec_id) AS rnk,
                 count(*) OVER (PARTITION BY t_id) AS n,
                 CASE WHEN label = t_lbl THEN 1 ELSE 0 END AS hit
          FROM p),
    g AS (SELECT *, lead(hit) OVER (PARTITION BY t_id ORDER BY rnk) AS hitn
          FROM r),
    tm AS (SELECT vec_id, label, t_id, rnk,
                  CASE WHEN rnk = n
                       THEN round(hit::DOUBLE / n, 12)::DECIMAL(28,12)
                       ELSE round((hit - hitn)::DOUBLE * least(5, rnk)
                                  / (5.0 * rnk), 12)::DECIMAL(28,12)
                  END AS term
           FROM g),
    s AS (SELECT vec_id, label,
                 sum(term) OVER (PARTITION BY t_id ORDER BY rnk DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sv
          FROM tm)
    SELECT vec_id, label, count(*)::BIGINT AS n_test,
           round(sum(sv)::DOUBLE / count(*), 6) AS mean_shapley
    FROM s GROUP BY 1, 2
    ORDER BY mean_shapley DESC, vec_id ASC LIMIT 30
    """,
    ops=["EXT-sampling", "EXT-simsearch", "EXT-quality", "G2", "O3", "W2"],
)
def q_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al. 2019): every
    training point's closed-form Shapley value for the 5-NN label
    utility, averaged over the deterministic vec_id%10 test split —
    top-30 most valuable points; negative values mark mislabeled or
    contaminating data (operators/neighbors.knn_shapley)."""
    from openrouter_batch_processor_spark.operators.neighbors import knn_shapley

    return knn_shapley(_t(spark, sf_dir, "embeddings"))


@register(
    "sample_density_peaks",
    f"""
    WITH {_cell_knn_sql(5)},
    dc AS (SELECT round(sum(dist::DECIMAL(18,6))::DOUBLE / count(*), 6) AS dc
           FROM knn),
    trm AS (SELECT k.a_id, k.cluster_id, k.b_id, k.dist,
                   round(exp(-(k.dist / dc.dc) * (k.dist / dc.dc)),
                         9)::DECIMAL(18,9) AS kern
            FROM knn k CROSS JOIN dc),
    rho AS (SELECT a_id, cluster_id, count(*)::BIGINT AS n_nb,
                   round(sum(kern)::DOUBLE, 9) AS rho
            FROM trm GROUP BY 1, 2),
    ee AS (SELECT k.a_id, k.b_id, k.dist, ra.rho AS rho_a, rb.rho AS rho_b
           FROM prs k
           JOIN rho ra ON ra.a_id = k.a_id
           JOIN rho rb ON rb.a_id = k.b_id),
    dlt AS (SELECT a_id,
                   coalesce(min(CASE WHEN rho_b > rho_a
                                       OR (rho_b = rho_a AND b_id < a_id)
                                     THEN dist END),
                            max(dist)) AS delta
            FROM ee GROUP BY 1)
    SELECT r.a_id AS vec_id, r.cluster_id, r.n_nb, r.rho,
           round(d.delta, 6) AS delta,
           round(r.rho * d.delta, 6) AS gamma
    FROM rho r JOIN dlt d ON d.a_id = r.a_id
    ORDER BY gamma DESC, vec_id ASC LIMIT 20
    """,
    ops=["EXT-sampling", "EXT-simsearch", "G2", "J3", "O3"],
)
def q_density_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-peaks prototype selection (Rodriguez & Laio 2014),
    kNN-localized: gamma = rho * delta over the staged kNN table with a
    self-tuning gaussian dc — top-20 cluster-center prototypes for
    diversity selection (operators/neighbors.density_peaks)."""
    from openrouter_batch_processor_spark.operators.neighbors import (
        density_peaks,
    )

    return density_peaks(_t(spark, sf_dir, "embeddings"))
