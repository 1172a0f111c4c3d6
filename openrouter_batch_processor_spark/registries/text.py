"""Text-analysis queries: token stats, LM quality (KN/SB/JM, perplexity),
fingerprinting, BPE, keyness and vocabulary-curve families.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403




@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len(text) AS n_chars_exact,
           CASE WHEN {_NORM_SQL} = '' THEN 0
                ELSE len(string_split({_NORM_SQL}, ' ')) END AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_re_tokens
    FROM documents
    """,
    ops=["EXT-tokens"],
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_quality",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             len(text)::DOUBLE AS n_chars,
             string_split({_NORM_SQL}, ' ') AS toks,
             len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE AS n_punct
      FROM documents),
    r AS (
      SELECT doc_id,
             n_chars::BIGINT AS n_chars_exact,
             len(toks)::BIGINT AS n_tokens,
             n_punct / greatest(n_chars, 1.0) AS punct_raw,
             len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it'], t)))::DOUBLE
                   / greatest(len(toks)::DOUBLE, 1.0) AS stop_raw,
             len(list_distinct(toks))::DOUBLE / greatest(len(toks)::DOUBLE, 1.0) AS uniq_raw,
             round(n_chars / greatest(len(toks)::DOUBLE, 1.0), 6) AS mean_token_len
      FROM base)
    SELECT doc_id, n_chars_exact, n_tokens,
           round(punct_raw, 6) AS punct_ratio,
           round(stop_raw, 6) AS stopword_ratio,
           round(uniq_raw, 6) AS unique_ratio,
           mean_token_len,
           round(least(greatest(0.3*stop_raw + 0.4*uniq_raw
                                + 0.3*(1.0 - least(punct_raw*4, 1.0)), 0.0), 1.0), 6) AS quality_score
    FROM r
    """,
    ops=["EXT-quality"],
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_t(spark, sf_dir, "documents"))


@register(
    "text_langid",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x)))::BIGINT AS score_de,
             len(list_filter(toks, x -> list_contains(['the','and','of','fast','slow','small','big'], x)))::BIGINT AS score_en,
             len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x)))::BIGINT AS score_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x)))::BIGINT AS score_zh
      FROM t)
    SELECT doc_id, score_de, score_en, score_es, score_zh,
           CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_zh THEN 'de'
                WHEN score_en > score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                WHEN score_es > score_de AND score_es > score_en AND score_es >= score_zh THEN 'es'
                WHEN score_zh > score_de AND score_zh > score_en AND score_zh > score_es THEN 'zh'
                ELSE 'und' END AS pred_lang
    FROM s
    """,
    ops=["EXT-langid"],
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_t(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents)
    SELECT doc_id,
           md5(norm) AS fp_md5,
           list_reduce(
             list_transform(string_split(norm, ' '),
                            tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1000000007),
             (acc, x) -> (acc * 131 + x) % 1000000007) AS fp_rolling
    FROM t
    """,
    ops=["EXT-fingerprint", "F4", "F5"],
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "text_tfidf_topk",
    f"""
    WITH {_TF_SQL},
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             round(t.tf * ln(n.n_docs / d.df), 6) AS tfidf
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, df, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 5
    """,
    ops=["EXT-tfidf", "EXT-tokens", "G2", "O3"],
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(_t(spark, sf_dir, "documents"), k=5)


@register(
    "text_heavy_hitters",
    f"""
    WITH {_TF_SQL}
    SELECT term, sum(tf)::BIGINT AS total_count, count(*) AS doc_freq
    FROM tf GROUP BY term
    ORDER BY total_count DESC, term ASC LIMIT 50
    """,
    ops=["EXT-heavyhitters", "EXT-tokens", "G2", "O4"],
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(_t(spark, sf_dir, "documents"), n=50)


# ===========================================================================
# EXT-quality — Gopher-style repetition signals over documents
# ===========================================================================


@register(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    tri AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks) - 1),
                                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                        ELSE [] END AS tr
            FROM t),
    pd AS (SELECT doc_id, len(tr) AS n_trigrams,
                  CASE WHEN len(tr) = 0 THEN 0.0
                       ELSE round(1.0 - len(list_distinct(tr)) / len(tr), 6) END AS dup_trigram_frac
           FROM tri),
    bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                                      THEN list_transform(range(1, len(toks)),
                                                          i -> toks[i] || ' ' || toks[i+1])
                                      ELSE [] END) AS bg
           FROM t),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
    tb AS (SELECT doc_id, round(max(c) / sum(c), 6) AS top_bigram_frac FROM bc GROUP BY 1)
    SELECT p.doc_id, n_trigrams, dup_trigram_frac,
           coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
           (dup_trigram_frac > 0.2 OR coalesce(top_bigram_frac, 0.0) > 0.18) AS repetitive
    FROM pd p LEFT JOIN tb USING (doc_id)
    """,
    ops=["EXT-quality", "G2", "G4", "EXT-tokens"],
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openrouter_batch_processor_spark.operators.textanalysis import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


# ===========================================================================
# EXT-tokens — top-k vocabulary coverage / OOV rate
# ===========================================================================


@register(
    "text_vocab_coverage",
    f"""
    WITH tok AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
    vocab AS (SELECT term FROM (SELECT term, sum(tf) AS total FROM tf GROUP BY 1)
              ORDER BY total DESC, term LIMIT 20),
    pd AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens FROM tf GROUP BY 1),
    iv AS (SELECT tf.doc_id, sum(tf)::BIGINT AS n_in_vocab
           FROM tf JOIN vocab USING (term) GROUP BY 1)
    SELECT p.doc_id, n_tokens, coalesce(n_in_vocab, 0) AS n_in_vocab,
           round(coalesce(n_in_vocab, 0) / n_tokens, 6) AS coverage
    FROM pd p LEFT JOIN iv ON iv.doc_id = p.doc_id
    """,
    ops=["EXT-tokens", "G2", "J2", "O4"],
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openrouter_batch_processor_spark.operators.textanalysis import vocab_coverage

    return vocab_coverage(_t(spark, sf_dir, "documents"))


@register(
    "text_unigram_nll",
    f"""
    WITH {_TF_SQL},
    ctf AS (SELECT term, sum(tf)::BIGINT AS ctf FROM tf GROUP BY term),
    tot AS (SELECT sum(ctf)::DOUBLE AS total_tokens FROM ctf),
    c AS (SELECT t.doc_id, t.tf,
                 round(t.tf * ln(tot.total_tokens / ctf.ctf), 6)::DECIMAL(18,6) AS contrib
          FROM tf t JOIN ctf USING (term) CROSS JOIN tot)
    SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
           round(sum(contrib)::DOUBLE / sum(tf), 6) AS avg_nll
    FROM c GROUP BY doc_id
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "J2"],
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_nll(_t(spark, sf_dir, "documents"))


@register(
    "text_bm25_topk",
    f"""
    WITH {_TF_SQL},
    dl AS (SELECT doc_id,
                  CASE WHEN {_NORM_SQL} = '' THEN 0
                       ELSE len(string_split({_NORM_SQL}, ' ')) END AS dl
           FROM documents),
    s AS (SELECT count(*)::DOUBLE AS n_docs,
                 sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    qtf AS (SELECT * FROM tf WHERE term IN ('table','scan','window','vector')),
    dfreq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
    c AS (SELECT q.doc_id,
                 round(ln(1::DOUBLE + (s.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE))
                       * (q.tf * 2.2::DOUBLE)
                       / (q.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / s.avgdl)),
                       6)::DECIMAL(18,6) AS contrib
          FROM qtf q JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN s)
    SELECT doc_id, sum(contrib)::DOUBLE AS bm25, count(*) AS n_terms_hit
    FROM c GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
    ops=["EXT-tfidf", "EXT-tokens", "G2", "O3", "O4"],
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the shared tf base; k1=1.2, b=0.75 (so the length
    normalizer is 0.25 + 0.75*dl/avgdl — the oracle pre-folds 1-b)."""
    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_QUERY, k=10)


@register(
    "text_pii_redaction",
    f"""
    WITH synth AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))::BIGINT AS n_emails,
           len(regexp_extract_all(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                              '<EMAIL>', 'g'),
               '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}'))::BIGINT AS n_phones,
           length(regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                              '<EMAIL>', 'g'),
               '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g'))::BIGINT AS redacted_len,
           md5(regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                              '<EMAIL>', 'g'),
               '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g')) AS redacted_md5
    FROM synth
    """,
    ops=["EXT-quality", "F4", "P1"],
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over deterministically PII-injected documents (the raw
    corpus has none, so the injection IS the fixture; doc_id % 3 == 0
    rows stay clean to exercise the zero path)."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pii = F.concat(
        F.col("text"),
        F.lit(" reach user"), did.cast("string"),
        F.lit("@mail"), (did % 7).cast("string"),
        F.lit(".example.com or 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    synth = docs.select(
        did, F.when(did % 3 == 0, F.col("text")).otherwise(pii).alias("text")
    )
    return pii_redaction(synth)


@register(
    "text_dsir_weights",
    f"""
    WITH {_DSIR_LW_SQL}
    SELECT doc_id, lang, n_tokens, log_weight FROM dsirw
    """,
    ops=["EXT-quality", "EXT-tokens", "EXT-sampling", "G2"],
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-unigram importance log-weights against the lang='en'
    target slice (512 buckets, add-one smoothing). High log_weight =
    target-like; feeds importance resampling (the weighted-sample step
    sample_weighted_priority already certifies). See
    operators/textanalysis.dsir_logweights for the broadcast-lookup
    scale shape."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        dsir_logweights,
    )

    return dsir_logweights(_t(spark, sf_dir, "documents"))


@register(
    "text_bigram_perplexity",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2),
    bf AS (SELECT doc_id, bigram, count(*)::BIGINT AS bf FROM bg GROUP BY 1, 2),
    c12 AS (SELECT bigram, sum(bf)::BIGINT AS c12 FROM bf GROUP BY 1),
    uni AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents),
    ctf AS (SELECT term, count(*)::BIGINT AS c1 FROM uni WHERE term != '' GROUP BY 1),
    v AS (SELECT count(*)::DOUBLE AS vsz FROM ctf),
    sc AS (SELECT f.doc_id, f.bf,
                  round(-ln((c.c12 + 0.5) / (t.c1 + 0.5 * v.vsz)), 6) AS nb
           FROM bf f JOIN c12 c USING (bigram)
           JOIN ctf t ON t.term = string_split(f.bigram, ' ')[1]
           CROSS JOIN v),
    agg AS (SELECT doc_id, sum(bf)::BIGINT AS n_bigrams,
                   ((sum(round(bf * nb, 6)::DECIMAL(18,6)) * 1000000)::BIGINT * 10)
                     // sum(bf)::BIGINT AS sm7
            FROM sc GROUP BY 1)
    SELECT doc_id, n_bigrams,
           sm7 / 10000000.0 AS avg_nll,
           round(exp(sm7 / 10000000.0), 6) AS ppl
    FROM agg
    """,
    ops=["EXT-quality", "EXT-tokens", "G2"],
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram-LM perplexity (add-k smoothing, corpus-fit) — the
    CCNet-style LM quality filter beside the unigram proxy
    (text_unigram_nll). operators/textanalysis.bigram_nll cites the
    paper and the vocab-vs-corpus join scale shape; the per-doc score
    table is session-staged (staged_bigram_nll) and shared with the
    CCNet bucketing and the FineWeb gate."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        staged_bigram_nll,
    )

    return staged_bigram_nll(_t(spark, sf_dir, "documents"))


@register(
    "text_pmi_topk",
    f"""
    WITH t AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    bg AS (SELECT toks[u.i] AS w1, toks[u.i+1] AS w2
           FROM t, unnest(range(1, len(toks))) AS u(i)
           WHERE len(toks) >= 2),
    c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12
            FROM bg WHERE w1 != '' AND w2 != ''
            GROUP BY 1, 2 HAVING count(*) >= 5),
    c1 AS (SELECT u.w, count(*)::BIGINT AS c
           FROM t, unnest(toks) AS u(w) WHERE u.w != '' GROUP BY 1),
    tot AS (SELECT (SELECT sum(greatest(len(toks) - 1, 0)) FROM t)::DOUBLE AS nb,
                   (SELECT count(*) FROM (SELECT unnest(toks) AS w FROM t) x
                    WHERE w != '')::DOUBLE AS nu)
    SELECT b.w1, b.w2, b.c12,
           round(ln((b.c12::DOUBLE * tot.nu * tot.nu)
                    / (tot.nb * a1.c * a2.c)), 6) AS pmi
    FROM c12 b
    JOIN c1 a1 ON a1.w = b.w1
    JOIN c1 a2 ON a2.w = b.w2
    CROSS JOIN tot
    ORDER BY pmi DESC, w1, w2 LIMIT 100
    """,
    ops=["EXT-tokens", "G2", "O3", "J3"],
)
def q_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 collocations by PMI (Church & Hanks 1990) over adjacent
    token pairs, c12 >= 5, deterministic (pmi, w1, w2) ordering
    (operators/textanalysis.pmi_topk: counting groupBys + TakeOrdered
    top-k, no full pair-table sort)."""
    from openrouter_batch_processor_spark.operators.textanalysis import pmi_topk

    return pmi_topk(_t(spark, sf_dir, "documents"), k=100, min_count=5)


@register(
    "text_stupid_backoff",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, toks[u.i] AS w1, toks[u.i+1] AS w2, toks[u.i+2] AS w3
            FROM tk, unnest(range(1, len(toks) - 1)) AS u(i)
            WHERE len(toks) >= 3),
    tf3 AS (SELECT doc_id, w1, w2, w3, count(*)::BIGINT AS tf
            FROM pos GROUP BY 1, 2, 3, 4),
    ttk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks
            FROM documents WHERE lang = 'en'),
    c1 AS (SELECT u.w, count(*)::BIGINT AS c1
           FROM ttk, unnest(toks) AS u(w) WHERE u.w != '' GROUP BY 1),
    c2 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, count(*)::BIGINT AS c2
           FROM ttk, unnest(range(1, len(toks))) AS u(i)
           WHERE len(toks) >= 2 GROUP BY 1, 2),
    c3 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, toks[u.i+2] AS c,
                  count(*)::BIGINT AS c3
           FROM ttk, unnest(range(1, len(toks) - 1)) AS u(i)
           WHERE len(toks) >= 3 GROUP BY 1, 2, 3),
    nv AS (SELECT sum(c1)::DOUBLE AS bign, count(*)::DOUBLE AS vsz FROM c1),
    j AS (SELECT f.doc_id, f.tf, t3.c3, cc.c2 AS c2_ctx, cb.c2 AS c2_bi,
                 u2.c1 AS c1_w2, u3.c1 AS c1_w3, nv.bign, nv.vsz
          FROM tf3 f
          LEFT JOIN c3 t3 ON t3.a = f.w1 AND t3.b = f.w2 AND t3.c = f.w3
          LEFT JOIN c2 cc ON cc.a = f.w1 AND cc.b = f.w2
          LEFT JOIN c2 cb ON cb.a = f.w2 AND cb.b = f.w3
          LEFT JOIN c1 u2 ON u2.w = f.w2
          LEFT JOIN c1 u3 ON u3.w = f.w3
          CROSS JOIN nv),
    sc AS (SELECT doc_id, tf,
                  CASE WHEN c3 IS NOT NULL THEN tf ELSE 0 END AS tri_hit,
                  CASE WHEN c3 IS NULL AND c2_bi IS NOT NULL THEN tf ELSE 0 END AS bi_hit,
                  round(tf * round(-ln(
                      CASE WHEN c3 IS NOT NULL THEN c3 / c2_ctx
                           WHEN c2_bi IS NOT NULL THEN 0.4::DOUBLE * c2_bi / c1_w2
                           ELSE 0.16::DOUBLE * (coalesce(c1_w3, 0) + 1) / (bign + vsz)
                      END), 6), 6)::DECIMAL(18,6) AS contrib
           FROM j),
    agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_trigrams,
                   sum(tri_hit)::BIGINT AS n_tri_hits,
                   sum(bi_hit)::BIGINT AS n_bi_hits,
                   ((sum(contrib) * 1000000)::BIGINT * 10) // sum(tf)::BIGINT AS sm7
            FROM sc GROUP BY 1)
    SELECT doc_id, n_trigrams, n_tri_hits, n_bi_hits,
           (n_trigrams - n_tri_hits - n_bi_hits)::BIGINT AS n_uni_backoffs,
           sm7 / 10000000.0 AS avg_nls
    FROM agg
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "J3"],
)
def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007): trigram →
    bigram → smoothed-unigram cascade with α=0.4, LM fit on the
    lang='en' slice and scored over every doc, so off-slice docs
    exercise the backoff path. The count-ratio-only formulation is the
    canonical distributed LM (operators/textanalysis.
    stupid_backoff_scores has the scale shape)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        stupid_backoff_scores,
    )

    return stupid_backoff_scores(_t(spark, sf_dir, "documents"))


@register(
    "text_kneser_ney",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, toks[u.i] AS w1, toks[u.i+1] AS w2
            FROM tk, unnest(range(1, len(toks))) AS u(i)
            WHERE len(toks) >= 2),
    tf2 AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf
            FROM pos GROUP BY 1, 2, 3),
    ttk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks
            FROM documents WHERE lang = 'en'),
    c12 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, count(*)::BIGINT AS c12
            FROM ttk, unnest(range(1, len(toks))) AS u(i)
            WHERE len(toks) >= 2 GROUP BY 1, 2),
    ctx AS (SELECT a, sum(c12)::BIGINT AS ctx_total, count(*)::BIGINT AS n1_fwd
            FROM c12 GROUP BY 1),
    hist AS (SELECT b, count(*)::BIGINT AS n1_bwd FROM c12 GROUP BY 1),
    bv AS (SELECT (SELECT count(*) FROM c12)::DOUBLE AS btypes,
                  (SELECT count(DISTINCT u.w) FROM ttk, unnest(toks) AS u(w)
                   WHERE u.w != '')::DOUBLE AS vsz),
    j AS (SELECT f.doc_id, f.tf, g.c12, x.ctx_total, x.n1_fwd, h.n1_bwd,
                 bv.btypes, bv.vsz
          FROM tf2 f
          LEFT JOIN c12 g ON g.a = f.w1 AND g.b = f.w2
          LEFT JOIN ctx x ON x.a = f.w1
          LEFT JOIN hist h ON h.b = f.w2
          CROSS JOIN bv),
    sc AS (SELECT doc_id, tf,
                  CASE WHEN c12 IS NOT NULL THEN tf ELSE 0 END AS kn_hit,
                  CASE WHEN c12 IS NULL AND ctx_total IS NOT NULL THEN tf
                       ELSE 0 END AS ctx_hit,
                  round(tf * round(-ln(
                      CASE WHEN ctx_total IS NOT NULL
                           THEN greatest(coalesce(c12, 0) - 0.75, 0.0) / ctx_total
                                + 0.75 * n1_fwd / ctx_total
                                  * (coalesce(n1_bwd, 0) + 1) / (btypes + vsz + 1)
                           ELSE (coalesce(n1_bwd, 0) + 1) / (btypes + vsz + 1)
                      END), 6), 6)::DECIMAL(18,6) AS contrib
           FROM j),
    agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
                   sum(kn_hit)::BIGINT AS n_kn_hits,
                   sum(ctx_hit)::BIGINT AS n_ctx_hits,
                   ((sum(contrib) * 1000000)::BIGINT * 10) // sum(tf)::BIGINT AS sm7
            FROM sc GROUP BY 1)
    SELECT doc_id, n_bigrams, n_kn_hits, n_ctx_hits,
           (n_bigrams - n_kn_hits - n_ctx_hits)::BIGINT AS n_cont_backoffs,
           sm7 / 10000000.0 AS avg_nll
    FROM agg
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "J3"],
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen
    & Goodman 1998): absolute discount D=0.75 interpolated with the
    continuation probability, LM fit on the lang='en' slice and scored
    over every doc so the discount/interpolation/unseen-context paths
    all execute (operators/textanalysis.kneser_ney_scores — the
    relational three-table formulation of the smoothing MapReduce
    folklore calls hard to distribute)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        kneser_ney_scores,
    )

    return kneser_ney_scores(_t(spark, sf_dir, "documents"))


@register(
    "text_winnow_stats",
    f"""
    WITH {_WINNOW_SQL},
    per AS (SELECT doc_id, count(*)::BIGINT AS n_selected,
                   count(DISTINCT fp)::BIGINT AS n_fp
            FROM sel GROUP BY 1),
    sz AS (SELECT doc_id, (len(toks) - 3)::BIGINT AS n_grams,
                  (len(toks) - 6)::BIGINT AS n_windows
           FROM el)
    SELECT doc_id, n_grams, n_windows, n_selected, n_fp,
           ((n_selected * 10000000) // n_windows) / 10000000.0 AS density
    FROM sz JOIN per USING (doc_id)
    """,
    ops=["EXT-dedup", "EXT-tokens", "G2", "W2"],
)
def q_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing sketch accounting (Schleimer, Wilkerson & Aiken
    2003 / MOSS): per-doc selected-fingerprint counts and observed
    density vs the paper's 2/(w+1) expectation. The rightmost-min
    tie-break is one arithmetic key in one per-doc window frame
    (operators/dedup.winnow_fingerprints)."""
    from openrouter_batch_processor_spark.operators.dedup import winnow_stats

    return winnow_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_good_turing",
    f"""
    WITH tf AS (SELECT u.term, count(*)::BIGINT AS c
                FROM (SELECT string_split({_NORM_SQL}, ' ') AS toks
                      FROM documents) t,
                     unnest(toks) AS u(term)
                WHERE u.term != '' GROUP BY 1),
    fof AS (SELECT c, count(*)::BIGINT AS n_r FROM tf GROUP BY 1),
    tot AS (SELECT sum(c * n_r)::BIGINT AS n_tokens FROM fof),
    nxt AS (SELECT c - 1 AS c, n_r AS n_r_next FROM fof)
    SELECT f.c AS r, f.n_r,
           round((f.c + 1) * nxt.n_r_next / f.n_r, 6) AS r_star,
           ((f.c * f.n_r * 10000000) // tot.n_tokens) / 10000000.0 AS mass_frac
    FROM fof f LEFT JOIN nxt ON nxt.c = f.c CROSS JOIN tot
    """,
    ops=["EXT-tokens", "EXT-quality", "G2"],
)
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies (Good 1953; Gale & Sampson
    1995): N_r per occurrence count r, raw Turing adjusted counts
    r* = (r+1)N_{{r+1}}/N_r, and per-r corpus mass share — the r=1 row
    is the missing-mass estimate P0 = N_1/N
    (operators/textanalysis.good_turing)."""
    from openrouter_batch_processor_spark.operators.textanalysis import good_turing

    return good_turing(_t(spark, sf_dir, "documents"))


@register(
    "text_jelinek_mercer_em",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
    ttk AS (SELECT toks FROM tk WHERE doc_id % 10 != 0),
    htk AS (SELECT toks FROM tk WHERE doc_id % 10 = 0),
    c12 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, count(*)::BIGINT AS c12
            FROM ttk, unnest(range(1, len(toks))) AS u(i)
            WHERE len(toks) >= 2 GROUP BY 1, 2),
    c1 AS (SELECT u.w, count(*)::BIGINT AS c1
           FROM ttk, unnest(toks) AS u(w) WHERE u.w != '' GROUP BY 1),
    nt AS (SELECT sum(c1)::DOUBLE AS bign FROM c1),
    hf AS (SELECT toks[u.i] AS w1, toks[u.i+1] AS w2, count(*)::BIGINT AS tf
           FROM htk, unnest(range(1, len(toks))) AS u(i)
           WHERE len(toks) >= 2 GROUP BY 1, 2),
    j AS MATERIALIZED (
      SELECT hf.tf,
             CASE WHEN u1.c1 IS NOT NULL
                  THEN coalesce(g.c12, 0) / u1.c1 ELSE 0.0 END AS pb,
             u2.c1 / nt.bign AS pu
      FROM hf
      LEFT JOIN c12 g ON g.a = hf.w1 AND g.b = hf.w2
      LEFT JOIN c1 u1 ON u1.w = hf.w1
      JOIN c1 u2 ON u2.w = hf.w2
      CROSS JOIN nt),
    {_jm_em_sql(3)}
    SELECT 1::BIGINT AS em_iter, lam, n_bigrams FROM l1
    UNION ALL SELECT 2::BIGINT, lam, n_bigrams FROM l2
    UNION ALL SELECT 3::BIGINT, lam, n_bigrams FROM l3
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "J3"],
)
def q_jelinek_mercer_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deleted-interpolation λ by EM on a held-out split (Jelinek &
    Mercer 1980; Chen & Goodman 1998 §2.4): ML bigram/unigram on
    doc_id%10!=0, three E/M rounds on the held-out bigrams with λ as
    a 1-row crossJoined DataFrame — no driver scalar, 9-dp grid
    re-rounding each round
    (operators/textanalysis.jelinek_mercer_em)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        jelinek_mercer_em,
    )

    return jelinek_mercer_em(_t(spark, sf_dir, "documents"))


@register(
    "text_burstiness",
    f"""
    WITH per AS (SELECT doc_id, u.term, count(*)::BIGINT AS c
                 FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                       FROM documents) t,
                      unnest(toks) AS u(term)
                 WHERE u.term != '' GROUP BY 1, 2),
    mom AS (SELECT term, count(*)::BIGINT AS df, sum(c)::BIGINT AS tf,
                   sum(c * c)::BIGINT AS s2
            FROM per GROUP BY 1),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
    SELECT term, df, tf, round(s2 / tf - tf / n_docs, 6) AS vmr
    FROM mom CROSS JOIN n WHERE tf >= 10
    ORDER BY vmr DESC, term ASC LIMIT 50
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "O3"],
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bursty terms by index of dispersion over per-doc counts,
    zeros included (Church & Gale 1995): VMR = s2/tf − tf/N exactly
    from three count sums; the extreme tail is template chrome — the
    boilerplate finder (operators/textanalysis.burstiness_topk)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        burstiness_topk,
    )

    return burstiness_topk(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round-4 second wave: published filter stacks (Gopher rules, CCNet
# perplexity buckets, char entropy) — text curation v3
# ===========================================================================


@register(
    "text_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
    b AS (SELECT doc_id, len(norm)::BIGINT AS n_norm_chars,
                 string_split(norm, ' ') AS toks
          FROM t),
    base AS (SELECT doc_id, n_norm_chars,
                    len(toks)::BIGINT AS n_words,
                    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha_words,
                    len(list_distinct(list_filter(toks,
                        x -> list_contains(['the','a'], x))))::BIGINT AS n_stops,
                    toks
             FROM b),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS bg
           FROM base WHERE len(toks) >= 2),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
    tm AS (SELECT doc_id, max(c * len(bg))::BIGINT AS top_mass FROM bc GROUP BY 1),
    r AS (SELECT b.doc_id, n_words,
                 (n_words >= 15 AND n_words <= 90) AS rule_word_count,
                 (n_norm_chars - (n_words - 1) >= 3 * n_words
                  AND n_norm_chars - (n_words - 1) <= 10 * n_words) AS rule_mean_word_len,
                 (n_alpha_words * 5 >= n_words * 4) AS rule_alpha_words,
                 (n_stops >= 2) AS rule_stopwords,
                 (coalesce(top_mass, 0) * 5 <= n_norm_chars) AS rule_repetition
          FROM base b LEFT JOIN tm USING (doc_id))
    SELECT doc_id, n_words, rule_word_count, rule_mean_word_len,
           rule_alpha_words, rule_stopwords, rule_repetition,
           (rule_word_count AND rule_mean_word_len AND rule_alpha_words
            AND rule_stopwords AND rule_repetition) AS gopher_pass
    FROM r
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "G4"],
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021) per document, all
    in integer arithmetic — operators/textanalysis.gopher_rules. The
    stopword-presence set is corpus-adapted to ('the', 'a'): the
    synthetic closed vocabulary contains no other common stopword, so
    the published 8-word set (the operator's default) would make the
    rule constant-false here."""
    from openrouter_batch_processor_spark.operators.textanalysis import gopher_rules

    return gopher_rules(
        _t(spark, sf_dir, "documents"), stopwords=("the", "a"), min_stopwords=2
    )


@register(
    "text_char_entropy",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
    b AS (SELECT doc_id, norm, len(norm)::BIGINT AS n,
                 list_sort(list_distinct(string_split(norm, ''))) AS dchars
          FROM t),
    m AS (SELECT doc_id, n, len(dchars)::BIGINT AS n_distinct,
                 list_aggregate(
                   list_transform(dchars,
                     c -> round(len(list_filter(string_split(norm, ''), x -> x = c)) *
                                log2(len(list_filter(string_split(norm, ''), x -> x = c))),
                                6)::DECIMAL(18,6)),
                   'sum') AS mass
          FROM b)
    SELECT doc_id, n AS n_chars_norm, n_distinct AS n_distinct_chars,
           round(log2(n::DOUBLE) - mass::DOUBLE / n::DOUBLE, 6) AS char_entropy_bits
    FROM m
    """,
    ops=["EXT-quality", "EXT-tokens"],
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per doc, map-side sorted-fold
    (no explode shuffle) — operators/textanalysis.char_entropy."""
    from openrouter_batch_processor_spark.operators.textanalysis import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


@register(
    "text_ccnet_buckets",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM tk WHERE len(toks) >= 2),
    bf AS (SELECT doc_id, bigram, count(*)::BIGINT AS bf FROM bg GROUP BY 1, 2),
    c12 AS (SELECT bigram, sum(bf)::BIGINT AS c12 FROM bf GROUP BY 1),
    uni AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents),
    ctf AS (SELECT term, count(*)::BIGINT AS c1 FROM uni WHERE term != '' GROUP BY 1),
    v AS (SELECT count(*)::DOUBLE AS vsz FROM ctf),
    sc AS (SELECT f.doc_id, f.bf,
                  round(-ln((c.c12 + 0.5) / (t.c1 + 0.5 * v.vsz)), 6) AS nb
           FROM bf f JOIN c12 c USING (bigram)
           JOIN ctf t ON t.term = string_split(f.bigram, ' ')[1]
           CROSS JOIN v),
    agg AS (SELECT doc_id,
                   ((sum(round(bf * nb, 6)::DECIMAL(18,6)) * 1000000)::BIGINT * 10)
                     // sum(bf)::BIGINT AS sm7
            FROM sc GROUP BY 1),
    nll AS (SELECT doc_id, sm7 / 10000000.0 AS avg_nll FROM agg),
    ranked AS (SELECT d.source, n.avg_nll,
                      ntile(3) OVER (PARTITION BY d.source
                                     ORDER BY n.avg_nll ASC, n.doc_id ASC) AS tercile
               FROM nll n JOIN documents d USING (doc_id)),
    named AS (SELECT source,
                     CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                          ELSE 'tail' END AS bucket,
                     avg_nll
              FROM ranked)
    SELECT source, bucket, count(*)::BIGINT AS n_docs,
           (((sum(avg_nll::DECIMAL(18,7)) * 10000000)::BIGINT * 10)
              // count(*)) / 100000000.0 AS mean_nll,
           min(avg_nll) AS min_nll,
           max(avg_nll) AS max_nll
    FROM named GROUP BY 1, 2
    """,
    ops=["EXT-quality", "W1", "O3", "G2"],
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity terciles per source (Wenzek
    et al. 2020) over the add-k bigram LM —
    operators/textanalysis.ccnet_buckets."""
    from openrouter_batch_processor_spark.operators.textanalysis import ccnet_buckets

    return ccnet_buckets(_t(spark, sf_dir, "documents"))


@register(
    "text_nb_langid",
    f"""
    WITH tk AS (SELECT doc_id, lang,
                       ('0x' || substr(md5(u.term), 1, 8))::BIGINT % 512 AS bucket
                FROM (SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
                      FROM documents) t,
                     unnest(toks) AS u(term)
                WHERE u.term != ''),
    lb AS (SELECT lang, bucket, count(*)::BIGINT AS cnt FROM tk GROUP BY 1, 2),
    lt AS (SELECT lang, count(*)::BIGINT AS tot FROM tk GROUP BY 1),
    langs AS (SELECT lang, count(*)::BIGINT AS nl FROM documents GROUP BY 1),
    nn AS (SELECT count(*)::BIGINT AS n_all FROM documents),
    ob AS (SELECT DISTINCT bucket FROM tk),
    model AS (SELECT lt.lang AS m_lang, ob.bucket,
                     round(ln((coalesce(lb.cnt, 0) + 1) / (lt.tot + 512.0)),
                           9)::DECIMAL(28,9) AS lnp
              FROM lt CROSS JOIN ob
              LEFT JOIN lb ON lb.lang = lt.lang AND lb.bucket = ob.bucket),
    dt AS (SELECT doc_id, bucket, count(*)::BIGINT AS c FROM tk GROUP BY 1, 2),
    lik AS (SELECT dt.doc_id, m.m_lang,
                   sum(dt.c::DECIMAL(10,0) * m.lnp) AS ll
            FROM dt JOIN model m USING (bucket) GROUP BY 1, 2),
    pri AS (SELECT l.lang AS m_lang,
                   round(ln(l.nl / n_all::DOUBLE), 9)::DECIMAL(28,9) AS lnprior
            FROM langs l CROSS JOIN nn),
    sc AS (SELECT d.doc_id, d.lang AS true_lang, p.m_lang,
                  p.lnprior + coalesce(k.ll, 0::DECIMAL(28,9)) AS score
           FROM documents d CROSS JOIN pri p
           LEFT JOIN lik k ON k.doc_id = d.doc_id AND k.m_lang = p.m_lang),
    pred AS (SELECT doc_id, true_lang, m_lang AS pred_lang FROM (
               SELECT *, row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, m_lang ASC) AS rn
               FROM sc) WHERE rn = 1)
    SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
    FROM pred GROUP BY 1, 2
    """,
    ops=["EXT-langid", "EXT-quality", "G2", "J3", "W2"],
)
def q_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identifier over the 512-bucket
    hashed unigram space (add-one, log-domain, resubstitution
    confusion matrix) — how separable the corpus's languages are in
    the DSIR feature space; decimal-summed 9-dp log scores make the
    argmax engine-exact (operators/textanalysis.nb_langid_confusion)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        staged_nb_confusion,
    )

    return staged_nb_confusion(_t(spark, sf_dir, "documents"))


@register(
    "text_bpe_merges",
    _bpe_sql(4),
    ops=["EXT-tokens", "EXT-curation", "G2", "O3", "X2"],
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 BPE merges learned from the corpus vocabulary (Sennrich
    et al. 2016): per round, frequency-weighted adjacent-symbol pair
    counts, lexicographic-tiebreak top-1, greedy delimited-string
    replace; loop state is the vocab table, lineage pinned per round
    (operators/textanalysis.bpe_merges)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        bpe_merges,
    )

    return bpe_merges(_t(spark, sf_dir, "documents"))


@register(
    "text_bpe_compression",
    _bpe_compression_sql(4),
    ops=["EXT-tokens", "EXT-curation", "G2"],
)
def q_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer compression curve over the 4 learned BPE merges:
    integer-exact corpus symbol totals per round (n_syms derived
    arithmetically from the delimited string) and the cumulative
    chars-per-token ratio (operators/textanalysis.bpe_compression)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        bpe_compression,
    )

    return bpe_compression(_t(spark, sf_dir, "documents"))


@register(
    "text_rake_keyphrases",
    f"""
    WITH tk AS (
      SELECT doc_id, u.i AS pos, toks[u.i + 1] AS tok,
             toks[u.i + 1] IN ('a', 'the') AS is_stop
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
            FROM documents),
           unnest(range(0, len(toks))) AS u(i)),
    runs AS (SELECT doc_id, pos, tok, is_stop,
                    sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
             FROM tk),
    w AS (SELECT doc_id, run_id, pos, tok,
                 count(*) OVER (PARTITION BY doc_id, run_id) AS plen
          FROM runs WHERE NOT is_stop),
    wdim AS (SELECT tok, sum(plen)::DOUBLE / count(*)::DOUBLE AS wscore
             FROM w GROUP BY 1),
    occ AS (SELECT doc_id, run_id,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase,
                   count(*)::BIGINT AS n_words,
                   sum(round(wscore, 9)::DECIMAL(28,9))::DOUBLE AS score
            FROM w JOIN wdim USING (tok) GROUP BY 1, 2),
    agg AS (SELECT phrase, max(n_words) AS n_words,
                   count(*)::BIGINT AS n_occurrences, max(score) AS score
            FROM occ GROUP BY 1)
    SELECT phrase, n_words, n_occurrences, round(score, 6) AS score
    FROM agg ORDER BY score DESC, phrase LIMIT 15
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "W2", "O3"],
)
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): stopword-run
    segmentation by one cumulative window per doc, deg/freq word
    scores, decimal-summed phrase scores, corpus top-15
    (operators/textanalysis.rake_keyphrases)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        rake_keyphrases,
    )

    return rake_keyphrases(_t(spark, sf_dir, "documents"))


@register(
    "text_topp_vocab",
    f"""
    WITH tf AS (
      SELECT term, count(*)::BIGINT AS c
      FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term
            FROM documents)
      GROUP BY 1),
    nn AS (SELECT sum(c)::BIGINT AS n FROM tf),
    ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, term)::BIGINT AS r,
             sum(c) OVER (ORDER BY c DESC, term
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      FROM tf),
    tgt AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
                           0.95::DOUBLE, 0.99::DOUBLE]) AS p_target),
    j AS (SELECT p_target, min(r) AS n_types
          FROM ranked, nn, tgt
          WHERE cum >= ceil(p_target * nn.n::DOUBLE)::BIGINT
          GROUP BY 1)
    SELECT j.p_target, j.n_types, round(ranked.cum / nn.n, 6) AS coverage
    FROM j JOIN ranked ON ranked.r = j.n_types, nn
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "W2", "O3"],
)
def q_topp_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) vocabulary coverage: minimum type count
    reaching each coverage target over the corpus unigram
    distribution — integer-exact running sums, one vocabulary-sized
    global window (the zipf-fit precedent)
    (operators/textanalysis.topp_vocab_coverage)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        topp_vocab_coverage,
    )

    return topp_vocab_coverage(_t(spark, sf_dir, "documents"))


@register(
    "text_fightin_words",
    f"""
    WITH tf AS (
      SELECT lang AS grp, tok, count(*)::BIGINT AS ylw
      FROM (SELECT lang, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    yw AS (SELECT tok, sum(ylw)::BIGINT AS yw FROM tf GROUP BY 1),
    nl AS (SELECT grp, sum(ylw)::BIGINT AS nl FROM tf GROUP BY 1),
    nn AS (SELECT sum(ylw)::BIGINT AS n FROM tf),
    sc AS (
      SELECT grp AS lang, tok AS token, ylw AS n_in_group,
             round(
               (ln((ylw + 100.0 * yw.yw / nn.n)
                   / (nl.nl + 100.0 - ylw - 100.0 * yw.yw / nn.n))
                - ln(((yw.yw - ylw) + 100.0 * yw.yw / nn.n)
                     / ((nn.n - nl.nl) + 100.0 - (yw.yw - ylw)
                        - 100.0 * yw.yw / nn.n)))
               / sqrt(1.0 / (ylw + 100.0 * yw.yw / nn.n)
                      + 1.0 / ((yw.yw - ylw) + 100.0 * yw.yw / nn.n)),
               6) AS z_score
      FROM tf JOIN yw USING (tok) JOIN nl USING (grp), nn),
    rk AS (SELECT lang, token, n_in_group, z_score,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY z_score DESC, token) AS rn
           FROM sc)
    SELECT lang, token, n_in_group, z_score FROM rk WHERE rn <= 5
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "J3", "O3", "W2"],
)
def q_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language signature vocabulary by log-odds with informative
    Dirichlet prior (Monroe et al. 2008 'Fightin' Words'): z-scored
    group-vs-rest log-odds with corpus-proportional prior mass, top-5
    per language — the principled keyness statistic over raw TF-IDF
    (operators/textanalysis.fightin_words)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        fightin_words,
    )

    return fightin_words(_t(spark, sf_dir, "documents"))


@register(
    "text_bpe_encode",
    "WITH "
    + ",\n    ".join(_bpe_encode_ctes())
    + """
    SELECT doc_id,
           sum(n_syms)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_words,
           string_agg(wenc, ' ' ORDER BY pos) AS encoded
    FROM wrd JOIN enc USING (tok)
    GROUP BY doc_id
    """,
    ops=["EXT-tokens", "EXT-curation", "G2", "J3", "O3"],
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer ENCODE (VERDICT r07 #5): apply the learned merges
    to every document via an equi-join of the word stream against the
    session-staged encoded vocabulary — the apply step a training
    pipeline ships, emitting the exact subword count and the full
    subword stream per document
    (operators/textanalysis.bpe_encode)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        bpe_encode,
    )

    return bpe_encode(_t(spark, sf_dir, "documents"))


@register(
    "text_yule_k",
    f"""
    WITH tf AS (SELECT lang, tok, count(*)::BIGINT AS f
                FROM (SELECT lang, unnest(string_split({_NORM_SQL}, ' ')) AS tok
                      FROM documents)
                GROUP BY 1, 2),
    a AS (SELECT lang, sum(f)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
                 sum(f::DECIMAL(38,0) * f::DECIMAL(38,0)) AS sf2
          FROM tf GROUP BY 1)
    SELECT lang, n_tokens, vocab,
           round(10000.0 * (sf2 - n_tokens)::DOUBLE /
                 (n_tokens::DECIMAL(38,0) * n_tokens::DECIMAL(38,0))::DOUBLE,
                 6) AS yule_k
    FROM a
    """,
    ops=["EXT-tokens", "EXT-quality", "G2"],
)
def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per language — the corpus-size-invariant
    vocabulary-richness constant over the token frequency spectrum;
    exact integer Σf²/N algebra, one final double division
    (operators/textanalysis.yule_k)."""
    from openrouter_batch_processor_spark.operators.textanalysis import yule_k

    return yule_k(_t(spark, sf_dir, "documents"))


@register(
    "text_flesch_reading_ease",
    f"""
    WITH tk AS (SELECT doc_id, lang,
                       unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents),
    sy AS (SELECT doc_id, lang,
                  len(regexp_extract_all(tok, '[aeiouy]+'))::BIGINT AS syl
           FROM tk),
    pd AS (SELECT doc_id, lang, count(*)::BIGINT AS w, sum(syl)::BIGINT AS s
           FROM sy GROUP BY 1, 2),
    fr AS (SELECT lang, w,
                  round(206.835 - 1.015 * w - 84.6 * (s::DOUBLE / w), 9) AS fre
           FROM pd)
    SELECT lang, count(*)::BIGINT AS n_docs,
           round((sum(w::DECIMAL(28,9)) / count(*))::DOUBLE, 6) AS avg_words,
           round((sum(fre::DECIMAL(28,9)) / count(*))::DOUBLE, 6) AS avg_fre
    FROM fr GROUP BY lang
    """,
    ops=["EXT-tokens", "EXT-quality", "G2"],
)
def q_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per language — vowel-group syllable
    heuristic, per-doc double arithmetic on the 9-dp grid, decimal-
    summed means (operators/textanalysis.flesch_reading_ease)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        flesch_reading_ease,
    )

    return flesch_reading_ease(_t(spark, sf_dir, "documents"))


def _textrank_sql(iterations: int = 4, topk: int = 15) -> str:
    """Unrolled weighted-PageRank oracle over the word co-occurrence
    graph; iteration CTEs MATERIALIZED (each referenced by the next).
    (1.0 - 0.85) is written as the SUBTRACTION so both engines use the
    same computed double (0.15000000000000002), not the 0.15 literal."""
    ctes = [
        f"tk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM documents)",
        """pr AS (SELECT toks[i] AS a, toks[i + 1] AS b
          FROM tk, unnest(range(1, len(toks))) AS t(i)
          WHERE len(toks) >= 2 AND toks[i] <> toks[i + 1])""",
        "und AS (SELECT a, b, count(*)::BIGINT AS w FROM pr GROUP BY 1, 2)",
        """edges AS MATERIALIZED (SELECT src, dst, sum(w)::BIGINT AS w FROM (
            SELECT a AS src, b AS dst, w FROM und
            UNION ALL SELECT b, a, w FROM und) GROUP BY 1, 2)""",
        "deg AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS wdeg FROM edges GROUP BY 1)",
        "r0 AS (SELECT src AS node, 1.0 AS r FROM deg)",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
          SELECT dst AS node,
                 round((1.0 - 0.85) + 0.85 *
                       (sum(((w * r) / wdeg)::DECIMAL(28,12)))::DOUBLE,
                       12) AS r
          FROM edges JOIN deg USING (src)
          JOIN r{t - 1} ON r{t - 1}.node = edges.src
          GROUP BY dst)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT token, wdeg, textrank FROM (
      SELECT r{iterations}.node AS token, deg.wdeg,
             round(r{iterations}.r, 6) AS textrank,
             row_number() OVER (ORDER BY round(r{iterations}.r, 6) DESC,
                                r{iterations}.node) AS rn
      FROM r{iterations} JOIN deg ON deg.src = r{iterations}.node)
    WHERE rn <= {topk}"""
    )


@register(
    "text_textrank_keywords",
    _textrank_sql(),
    ops=["EXT-tokens", "EXT-quality", "EXT-graph", "G2", "J3", "O3", "W2"],
)
def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: weighted PageRank over the corpus word
    co-occurrence graph (adjacent tokens, corpus-count weights), 4
    unrolled iterations on the decimal-summed 12-dp grid, top-15 —
    graph centrality as the third keyness signal beside RAKE and
    Fightin' Words (operators/textanalysis.textrank_keywords)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        textrank_keywords,
    )

    return textrank_keywords(_t(spark, sf_dir, "documents"))


@register(
    "text_bigram_entropy_rate",
    f"""
    WITH tk AS (SELECT lang, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
    bg AS (SELECT lang, toks[i] AS w1, toks[i + 1] AS w2
           FROM tk, unnest(range(1, len(toks))) AS t(i)
           WHERE len(toks) >= 2),
    bc AS (SELECT lang, w1, w2, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2, 3),
    n AS (SELECT lang, sum(c)::BIGINT AS n FROM bc GROUP BY 1),
    hb AS (SELECT bc.lang,
                  sum(round(-(c::DOUBLE / n) * ln(c::DOUBLE / n),
                            9)::DECIMAL(28,9))::DOUBLE AS h_bigram
           FROM bc JOIN n USING (lang) GROUP BY 1),
    uc AS (SELECT lang, w1, sum(c)::BIGINT AS c FROM bc GROUP BY 1, 2),
    hu AS (SELECT uc.lang,
                  sum(round(-(c::DOUBLE / n) * ln(c::DOUBLE / n),
                            9)::DECIMAL(28,9))::DOUBLE AS h_unigram
           FROM uc JOIN n USING (lang) GROUP BY 1)
    SELECT lang, n AS n_bigrams,
           round(h_bigram, 6) AS h_bigram,
           round(h_unigram, 6) AS h_unigram,
           round(h_bigram - h_unigram, 6) AS h_cond
    FROM n JOIN hb USING (lang) JOIN hu USING (lang)
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "J3"],
)
def q_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy rate H(W2|W1) per language via the
    chain rule over one bigram count table — the word-order
    predictability audit beside burstiness and repetition
    (operators/textanalysis.bigram_entropy_rate)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        bigram_entropy_rate,
    )

    return bigram_entropy_rate(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round 9: windowed lexical diversity + fog readability
# ===========================================================================


@register(
    "text_mattr",
    f"""
    WITH tt AS (SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
    tk AS (SELECT doc_id, lang, u.j::BIGINT AS j, toks[u.j] AS term
           FROM tt, unnest(range(1, len(toks) + 1)) AS u(j)
           WHERE toks[u.j] != ''),
    lagd AS (SELECT doc_id, lang, j,
                    coalesce(lag(j) OVER (PARTITION BY doc_id, term ORDER BY j),
                             0)::BIGINT AS prev,
                    count(*) OVER (PARTITION BY doc_id)::BIGINT AS ll
             FROM tk),
    per_doc AS (SELECT doc_id, lang, min(ll) AS ll,
                       sum(greatest(least(j, ll - 19) -
                                    greatest(j - 19, prev + 1, 1) + 1,
                                    0))::BIGINT AS types_sum,
                       sum((prev = 0)::INT)::BIGINT AS n_types
                FROM lagd WHERE ll >= 20 GROUP BY 1, 2),
    sc AS (SELECT lang,
                  round(types_sum / (20 * (ll - 19)), 9) AS mattr_doc,
                  round(n_types / ll, 9) AS ttr_doc
           FROM per_doc)
    SELECT lang, count(*)::BIGINT AS n_docs,
           round(sum(mattr_doc::DECIMAL(28,9))::DOUBLE / count(*), 6)
             AS mean_mattr,
           round(sum(ttr_doc::DECIMAL(28,9))::DOUBLE / count(*), 6) AS mean_ttr
    FROM sc GROUP BY 1
    """,
    ops=["EXT-tokens", "EXT-quality", "G2", "W2"],
)
def q_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio per language (window 20): the
    length-invariant lexical-diversity score, computed by a
    closed-form per-token contribution formula off one lag window —
    no range join over window starts (operators/textanalysis.mattr)."""
    from openrouter_batch_processor_spark.operators.textanalysis import mattr

    return mattr(_t(spark, sf_dir, "documents"))


@register(
    "text_gunning_fog",
    f"""
    WITH tt AS (SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
                FROM documents),
    tk AS (SELECT doc_id, lang,
                  len(regexp_extract_all(u.term, '[aeiouy]+'))::BIGINT AS syl
           FROM (SELECT doc_id, lang, unnest(toks) AS term FROM tt) u),
    per_doc AS (SELECT doc_id, lang, count(*)::BIGINT AS w,
                       sum((syl >= 3)::INT)::BIGINT AS cx
                FROM tk GROUP BY 1, 2),
    sc AS (SELECT lang, w, cx,
                  round(0.4 * (w + 100.0 * cx / w), 9) AS fog
           FROM per_doc)
    SELECT lang, count(*)::BIGINT AS n_docs,
           round(sum(cx::DECIMAL(28,9))::DOUBLE
                 / sum(w::DECIMAL(28,9))::DOUBLE * 100, 6) AS pct_complex,
           round(sum(fog::DECIMAL(28,9))::DOUBLE / count(*), 6) AS avg_fog
    FROM sc GROUP BY 1
    """,
    ops=["EXT-quality", "EXT-tokens", "G2"],
)
def q_gunning_fog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gunning fog readability per language: 0.4*(words/sentence +
    100*complex/words), complex = >=3 vowel-group syllables — the
    Flesch companion using the same syllable heuristic
    (operators/textanalysis.gunning_fog)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        gunning_fog,
    )

    return gunning_fog(_t(spark, sf_dir, "documents"))


@register(
    "text_distinct_ngrams",
    f"""
    WITH t AS (SELECT source, string_split({_NORM_SQL}, ' ') AS tk
               FROM documents),
    uni AS (SELECT source, unnest(tk) AS g FROM t),
    u AS (SELECT source, count(*)::BIGINT AS n_unigrams,
                 count(DISTINCT g)::BIGINT AS v_unigrams
          FROM uni WHERE g != '' GROUP BY 1),
    bi AS (SELECT source,
                  unnest(list_transform(range(1, len(tk)),
                                        i -> tk[i] || ' ' || tk[i + 1])) AS g
           FROM t WHERE len(tk) >= 2),
    b AS (SELECT source, count(*)::BIGINT AS n_bigrams,
                 count(DISTINCT g)::BIGINT AS v_bigrams
          FROM bi GROUP BY 1)
    SELECT source, n_unigrams, v_unigrams,
           round(v_unigrams / n_unigrams, 6) AS dist1,
           n_bigrams, v_bigrams,
           round(v_bigrams / n_bigrams, 6) AS dist2
    FROM u JOIN b USING (source)
    """,
    ops=["EXT-text", "EXT-quality", "G2", "G4"],
)
def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dist-1/Dist-2 n-gram diversity per source (Li et al. 2016): the
    templated-content screen — distinct over total unigrams and
    bigrams, two combiner groupBys
    (operators/textanalysis.distinct_ngram_diversity)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        distinct_ngram_diversity,
    )

    return distinct_ngram_diversity(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round 11 (second batch): Self-BLEU corpus diversity
# ===========================================================================


@register(
    "text_self_bleu",
    f"""
    WITH {_TF_SQL},
    tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])) AS gram
           FROM tk WHERE len(t) >= 2),
    btf AS (SELECT doc_id, gram, count(*) AS tf FROM bg GROUP BY 1, 2),
    u1 AS (SELECT term AS gram, max(tf) AS m1 FROM tf GROUP BY 1),
    us AS (SELECT t.term AS gram, u1.m1,
                  max(CASE WHEN t.tf < u1.m1 THEN t.tf END) AS m2,
                  sum(CASE WHEN t.tf = u1.m1 THEN 1 ELSE 0 END) AS c1
           FROM tf t JOIN u1 ON u1.gram = t.term GROUP BY 1, 2),
    ud AS (SELECT t.doc_id,
                  sum(least(t.tf, CASE WHEN t.tf < s.m1 THEN s.m1
                                       WHEN s.c1 >= 2 THEN s.m1
                                       ELSE coalesce(s.m2, 0) END))::DOUBLE
                  / sum(t.tf) AS p1
           FROM tf t JOIN us s ON s.gram = t.term GROUP BY 1),
    b1 AS (SELECT gram, max(tf) AS m1 FROM btf GROUP BY 1),
    bs AS (SELECT t.gram, b1.m1,
                  max(CASE WHEN t.tf < b1.m1 THEN t.tf END) AS m2,
                  sum(CASE WHEN t.tf = b1.m1 THEN 1 ELSE 0 END) AS c1
           FROM btf t JOIN b1 USING (gram) GROUP BY 1, 2),
    bd AS (SELECT t.doc_id,
                  sum(least(t.tf, CASE WHEN t.tf < s.m1 THEN s.m1
                                       WHEN s.c1 >= 2 THEN s.m1
                                       ELSE coalesce(s.m2, 0) END))::DOUBLE
                  / sum(t.tf) AS p2
           FROM btf t JOIN bs s USING (gram) GROUP BY 1),
    sc AS (SELECT d.source, u.p1, b.p2, sqrt(u.p1 * b.p2) AS bleu
           FROM ud u JOIN bd b USING (doc_id) JOIN documents d USING (doc_id))
    SELECT source, count(*)::BIGINT AS n_docs,
           round(sum(round(p1, 9)::DECIMAL(28,9))::DOUBLE / count(*), 6) AS mean_p1,
           round(sum(round(p2, 9)::DECIMAL(28,9))::DOUBLE / count(*), 6) AS mean_p2,
           round(sum(round(bleu, 9)::DECIMAL(28,9))::DOUBLE / count(*), 6)
             AS mean_self_bleu
    FROM sc GROUP BY source
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "J2", "G4"],
)
def q_self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU-2 per source (Zhu et al. 2018): clipped 1/2-gram
    precision of each doc against every other doc as references, no
    per-pair join — the clip ceiling is a vocabulary-sized
    max-excluding-self aggregate. High mean = the source repeats
    itself (operators/textanalysis.self_bleu for the scale shape)."""
    from openrouter_batch_processor_spark.operators.textanalysis import self_bleu

    return self_bleu(_t(spark, sf_dir, "documents"))


@register(
    "text_template_prefixes",
    f"""
    WITH p AS (SELECT doc_id, source,
                      array_to_string(
                        list_slice(string_split({_NORM_SQL}, ' '), 1, 8),
                        ' ') AS prefix
               FROM documents)
    SELECT prefix,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT source)::BIGINT AS n_sources,
           min(doc_id)::BIGINT AS example_doc
    FROM p
    GROUP BY prefix
    HAVING count(*) >= 3
    ORDER BY n_docs DESC, prefix ASC
    LIMIT 25
    """,
    ops=["EXT-quality", "EXT-dedup-policy", "G2", "G4", "O3"],
)
def q_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by shared normalized 8-token
    PREFIX: generated or form-letter documents open identically even
    when their tails differ enough to dodge whole-doc dedup — the
    prefix-group rollup (n_docs, n_sources, an example id) is the cut
    a curation pass reviews for template farms. One combiner groupBy;
    top-25 is TakeOrdered."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    prefix = F.array_join(F.slice(F.split(norm, " "), 1, 8), " ")
    return (
        docs.select(prefix.alias("prefix"), "source", "doc_id")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), F.asc("prefix"))
        .limit(25)
    )
