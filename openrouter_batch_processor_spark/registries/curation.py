"""Training-data curation queries: quality gates, mixtures (DSIR,
DoReMi), dup-span removal, packing/chunking and the full pipeline.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "chunk_documents_sliding",
    f"""
    WITH {_TOKS_N_SQL},
    c AS (SELECT doc_id, toks, n_tokens,
                 unnest(range(0, (n_tokens + 29) // 30)) AS chunk_id
          FROM tk WHERE n_tokens >= 1)
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(toks, chunk_id * 30 + 1,
                                      least(chunk_id * 30 + 40, n_tokens)), ' ')
             AS chunk_text,
           least(chunk_id * 30 + 40, n_tokens) - chunk_id * 30 AS n_chunk_tokens
    FROM c
    """,
    ops=["EXT-tokens", "EXT-quality", "G1"],
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (width 40, overlap 10): the
    corpus->training-sequence explode."""
    return chunk_documents(_t(spark, sf_dir, "documents"), chunk_tokens=40, overlap=10)


@register(
    "pack_documents_stream",
    f"""
    WITH {_TOKS_N_SQL},
    c AS (SELECT doc_id, n_tokens,
                 (sum(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING))::BIGINT - n_tokens
                   AS start_offset
          FROM tk)
    SELECT doc_id, n_tokens, start_offset,
           floor(start_offset / 512.0)::BIGINT AS bin_id,
           start_offset % 512 AS offset_in_bin
    FROM c
    """,
    ops=["EXT-tokens", "W1", "W2"],
)
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-stream packing into 512-token context windows
    via the distributed prefix-sum (range partition + broadcast offsets,
    no single-task global window) — same scale pattern as renumber."""
    return pack_documents(_t(spark, sf_dir, "documents"), capacity=512)


@register(
    "corpus_to_training_stream",
    f"""
    WITH norm AS (SELECT doc_id, lang, source, n_chars, {_NORM_SQL} AS nt
                  FROM documents),
    fp AS (SELECT *, md5(nt) AS f FROM norm),
    sv AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
    dd AS (SELECT fp.* FROM fp JOIN sv ON sv.doc_id = fp.doc_id AND sv.f = fp.f),
    g AS (SELECT doc_id, nt FROM dd
          WHERE lang IN ('en', 'fr', 'de') AND n_chars >= 100),
    tk AS (SELECT doc_id, string_split(nt, ' ') AS toks,
                  CASE WHEN nt = '' THEN 0
                       ELSE len(string_split(nt, ' ')) END AS n
           FROM g),
    c AS (SELECT doc_id, unnest(range(0, (n + 29) // 30)) AS chunk_id, n
          FROM tk WHERE n >= 1),
    cc AS (SELECT doc_id, chunk_id,
                  least(chunk_id * 30 + 40, n) - chunk_id * 30 AS nct
           FROM c),
    p AS (SELECT doc_id, chunk_id, nct,
                 (sum(nct) OVER (ORDER BY doc_id, chunk_id
                                 ROWS UNBOUNDED PRECEDING))::BIGINT - nct AS so
          FROM cc)
    SELECT floor(so / 512.0)::BIGINT AS bin_id, count(*) AS n_chunks,
           sum(nct)::BIGINT AS bin_tokens, count(DISTINCT doc_id) AS n_docs
    FROM p GROUP BY 1
    """,
    ops=["X1", "P1", "G2", "EXT-tokens", "EXT-dedup-policy", "EXT-quality", "W1"],
)
def q_corpus_to_training_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus->model-input pipeline as ONE plan: exact
    dedup (keep-first) -> language/length quality gate -> sliding-window
    chunking -> contiguous packing into 512-token context windows ->
    per-window accounting. Composes four operator families; every stage
    is the same implementation the standalone queries check."""
    from openrouter_batch_processor_spark.operators.chunking import (
        pack_token_counts,
    )
    from openrouter_batch_processor_spark.operators.dedup import dedup_keep_first

    docs = _t(spark, sf_dir, "documents")
    deduped = dedup_keep_first(docs)
    gated = deduped.filter(
        F.col("lang").isin("en", "fr", "de") & (F.col("n_chars") >= 100)
    )
    chunks = chunk_documents(gated, chunk_tokens=40, overlap=10)
    packed = pack_token_counts(
        chunks.select("doc_id", "chunk_id", "n_chunk_tokens"),
        "n_chunk_tokens",
        ["doc_id", "chunk_id"],
        capacity=512,
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("bin_tokens"),
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
    )


@register(
    "curation_boilerplate_ngrams",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id,
                 list_transform(range(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
          FROM t WHERE len(toks) >= 3),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh_set GROUP BY 1),
    boiler AS (SELECT shingle FROM dfreq WHERE df >= 20),
    per_doc AS (SELECT doc_id, count(*) AS n_ngrams FROM sh_set GROUP BY 1),
    nb AS (SELECT doc_id, count(*) AS n_boiler
           FROM sh_set JOIN boiler USING (shingle) GROUP BY doc_id)
    SELECT p.doc_id, p.n_ngrams,
           coalesce(nb.n_boiler, 0)::BIGINT AS n_boiler,
           round(coalesce(nb.n_boiler, 0) / p.n_ngrams, 6) AS boiler_ratio
    FROM per_doc p LEFT JOIN nb USING (doc_id)
    """,
    ops=["EXT-quality", "EXT-boilerplate", "G4", "J2"],
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate: shingles in >= 20 docs are template chrome;
    per-doc boilerplate ratio for the cleaning gate
    (operators/curation.py boilerplate_ngrams)."""
    from openrouter_batch_processor_spark.operators.curation import boilerplate_ngrams

    return boilerplate_ngrams(_t(spark, sf_dir, "documents"), min_df=20)


@register(
    "curation_dup_windows",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    w AS (SELECT doc_id,
                 list_transform(range(1, len(toks) - 8 + 2),
                                i -> md5(array_to_string(toks[i:i+7], ' '))) AS whs
          FROM t WHERE len(toks) >= 8),
    ws AS (SELECT DISTINCT doc_id, unnest(whs) AS wh FROM w),
    dfreq AS (SELECT wh, count(*) AS df FROM ws GROUP BY 1),
    dup AS (SELECT wh FROM dfreq WHERE df >= 2),
    per_doc AS (SELECT doc_id, count(*) AS n_windows FROM ws GROUP BY 1),
    nd AS (SELECT doc_id, count(*) AS n_dup
           FROM ws JOIN dup USING (wh) GROUP BY 1)
    SELECT p.doc_id, p.n_windows,
           coalesce(nd.n_dup, 0)::BIGINT AS n_dup,
           round(coalesce(nd.n_dup, 0) / p.n_windows, 6) AS dup_fraction
    FROM per_doc p LEFT JOIN nd USING (doc_id)
    """,
    ops=["X1", "EXT-dedup-policy", "EXT-boilerplate", "G4"],
)
def q_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal: fraction of each doc's 8-token
    windows that occur in another doc — copied-passage detection, the
    window-hash approximation of suffix-array substring dedup
    (operators/curation.py duplicated_window_fraction)."""
    from openrouter_batch_processor_spark.operators.curation import (
        duplicated_window_fraction,
    )

    return duplicated_window_fraction(_t(spark, sf_dir, "documents"), window_tokens=8)


@register(
    "curation_remove_dup_spans",
    f"""
    WITH {_span_sql("documents")}
    SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
           coalesce(s.n_removed, 0)::BIGINT AS n_removed,
           coalesce(s.n_spans_removed, 0)::BIGINT AS n_spans_removed,
           round(coalesce(s.n_removed, 0) / len(t.toks), 6) AS removed_fraction,
           coalesce(c.cleaned_text, '') AS cleaned_text
    FROM spt t
    LEFT JOIN spstats s USING (doc_id)
    LEFT JOIN spclean c USING (doc_id)
    """,
    ops=["X1", "EXT-dedup-policy", "EXT-boilerplate", "G4", "O1"],
)
def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The back half of substring dedup (VERDICT r03 item 3): REMOVE
    duplicated 8-token window spans, keeping each window's global first
    occurrence, and re-emit the cleaned text plus per-doc removal stats
    (operators/curation.py remove_duplicate_spans). curation_dup_windows
    is the report; this is the edit."""
    from openrouter_batch_processor_spark.operators.curation import (
        remove_duplicate_spans,
    )

    return remove_duplicate_spans(_t(spark, sf_dir, "documents"), window_tokens=8)


@register(
    "curation_dup_span_discovery",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    w AS (SELECT doc_id, u.i - 1 AS pos,
                 md5(array_to_string(list_slice(toks, u.i, u.i + 7), ' ')) AS wh
          FROM t, unnest(range(1, len(toks) - 8 + 2)) AS u(i)
          WHERE len(toks) >= 8),
    dup AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2),
    seed AS (SELECT doc_id, pos FROM w JOIN dup USING (wh)),
    r AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
                      THEN 0 ELSE 1 END AS new_run
          FROM seed),
    rid AS (SELECT doc_id, pos,
                   sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
            FROM r),
    spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
                     (max(pos) - min(pos) + 8)::BIGINT AS span_len
              FROM rid GROUP BY doc_id, run_id
              HAVING max(pos) - min(pos) + 8 >= 12),
    sp AS (SELECT s.doc_id, s.span_start, s.span_len,
                  md5(array_to_string(
                      list_slice(t.toks, s.span_start + 1, s.span_start + s.span_len),
                      ' ')) AS span_hash
           FROM spans s JOIN t USING (doc_id)),
    occ AS (SELECT span_hash, count(*)::BIGINT AS n_span_occ FROM sp GROUP BY 1)
    SELECT sp.doc_id, sp.span_start, sp.span_len, sp.span_hash, occ.n_span_occ
    FROM sp JOIN occ USING (span_hash)
    """,
    ops=["X1", "EXT-dedup-policy", "G4", "W2", "O1"],
)
def q_dup_span_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-equivalent duplicate-substring DISCOVERY (Lee et al.
    ExactSubstr front half, VERDICT r04 item 5): every maximal
    duplicated substring of >= 12 tokens, found via sorted 8-gram
    rank/adjacency — maximal runs of consecutive duplicated seed
    positions. curation_remove_dup_spans is the edit this inventory
    feeds (operators/curation.py dup_span_discovery)."""
    from openrouter_batch_processor_spark.operators.curation import dup_span_discovery

    return dup_span_discovery(
        _t(spark, sf_dir, "documents"), min_tokens=12, seed_tokens=8
    )


@register(
    "curation_mixture_weights",
    """
    WITH c AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
    s AS (SELECT source, n_docs,
                 round(pow(n_docs, 0.5), 6)::DECIMAL(28,10) AS w
          FROM c),
    z AS (SELECT sum(w) AS z, sum(n_docs)::BIGINT AS n FROM s)
    SELECT source, n_docs,
           round(w::DOUBLE / z::DOUBLE, 6) AS weight,
           round((w::DOUBLE / z::DOUBLE) * n, 6) AS expected_docs,
           round((w::DOUBLE / z::DOUBLE) * n / n_docs, 6) AS sample_rate
    FROM s CROSS JOIN z
    """,
    ops=["G2", "EXT-sampling", "EXT-mixture"],
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (T=0.5) source mixture weights — the standard
    up-weighting of small sources when composing a training mixture
    (operators/curation.py source_mixture_weights)."""
    from openrouter_batch_processor_spark.operators.curation import (
        source_mixture_weights,
    )

    return source_mixture_weights(_t(spark, sf_dir, "documents"), temperature=0.5)


@register(
    "curation_quality_sweep",
    f"""
    WITH q AS (SELECT n_tokens, quality_score
               FROM {_quality_sql("documents", "doc_id")}),
    b AS (SELECT least(floor(quality_score * 10), 9)::BIGINT AS bucket, n_tokens FROM q),
    a AS (SELECT bucket, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
          FROM b GROUP BY 1),
    g AS (SELECT i AS bucket FROM range(0, 10) r(i)),
    f AS (SELECT g.bucket, coalesce(a.n_docs, 0)::BIGINT AS n_docs,
                 coalesce(a.n_tokens, 0)::BIGINT AS n_tokens
          FROM g LEFT JOIN a USING (bucket))
    SELECT round(bucket / 10.0, 1) AS threshold,
           (sum(n_docs) OVER (ORDER BY bucket DESC))::BIGINT AS n_docs_surviving,
           (sum(n_tokens) OVER (ORDER BY bucket DESC))::BIGINT AS n_tokens_surviving
    FROM f
    """,
    ops=["EXT-quality", "G2", "W2"],
)
def q_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate yield curve: docs/tokens surviving each threshold in
    one corpus pass — bucket + cumulative sum, not one filter per τ
    (operators/curation.py quality_threshold_sweep)."""
    from openrouter_batch_processor_spark.operators.curation import (
        quality_threshold_sweep,
    )

    return quality_threshold_sweep(_t(spark, sf_dir, "documents"))


@register(
    "curation_dedup_funnel",
    f"""
    WITH RECURSIVE
    survivors AS (
      SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
    {_shingles_sql("survivors")},
    {_CC_SQL},
    removed AS (SELECT count(*) - count(DISTINCT cluster_id) AS n_removed FROM labels),
    n_exact AS (SELECT count(*) AS n FROM survivors)
    SELECT 'raw' AS stage, count(*)::BIGINT AS n_docs_surviving FROM documents
    UNION ALL
    SELECT 'exact_dedup', n::BIGINT FROM n_exact
    UNION ALL
    SELECT 'neardup_dedup', n_exact.n::BIGINT - removed.n_removed::BIGINT
    FROM n_exact, removed
    """,
    ops=["X1", "EXT-minhash", "EXT-dedup-policy", "G2"],
)
def q_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline yield through the dedup stages as a SEQUENTIAL funnel:
    raw corpus -> exact-content keep-first survivors -> keep-first LSH
    near-dup survivors OF THOSE — so n_docs_surviving is monotone
    non-increasing down the stages (ADVICE r03: the near-dup stage
    previously ran over the raw corpus, making the rows independent
    per-policy yields rather than a funnel). The near-dup stage is the
    same minhash/CC definition as dedup_clusters, applied to the
    exact-dedup output; the oracle chains the identical stages."""
    from openrouter_batch_processor_spark.operators.dedup import duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    raw = docs.agg(F.count(F.lit(1)).alias("n_docs_surviving")).select(
        F.lit("raw").alias("stage"), "n_docs_surviving"
    )
    # exact keep-first on the raw-text fingerprint (min doc_id per
    # md5(text)); semi-join back keeps all columns for the next stage
    surv_ids = (
        docs.select("doc_id", F.md5(F.col("text")).alias("_fp"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(surv_ids, "doc_id", "leftsemi")
    n_exact = survivors.agg(F.count(F.lit(1)).alias("_n"))
    exact = n_exact.select(
        F.lit("exact_dedup").alias("stage"),
        F.col("_n").cast("long").alias("n_docs_surviving"),
    )
    clusters = duplicate_clusters(survivors)
    removed = clusters.agg(
        (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias("_rm")
    )
    near = (
        n_exact.crossJoin(F.broadcast(removed))
        .select(
            F.lit("neardup_dedup").alias("stage"),
            (F.col("_n") - F.col("_rm")).cast("long").alias("n_docs_surviving"),
        )
    )
    return raw.unionByName(exact).unionByName(near)


# ===========================================================================
# Composite training-corpus preparation: dedup -> language filter ->
# quality gate -> per-source stats (the end-to-end LLM-data-prep chain)
# ===========================================================================


@register(
    "corpus_prep_pipeline",
    """
    WITH norm AS (
      SELECT doc_id, lang, source, n_chars,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
      FROM documents),
    fp AS (
      SELECT *, md5(array_to_string(list_slice(string_split(norm_text, ' '), 1, 5), ' ')) AS fingerprint
      FROM norm),
    survivors AS (SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
    deduped AS (
      SELECT f.* FROM fp f
      JOIN survivors s ON f.doc_id = s.doc_id AND f.fingerprint = s.fingerprint),
    gated AS (
      SELECT *,
             CASE WHEN norm_text = '' THEN 0
                  ELSE len(string_split(norm_text, ' ')) END AS n_tokens
      FROM deduped
      WHERE lang IN ('en', 'fr', 'de') AND n_chars >= 100),
    final AS (SELECT * FROM gated WHERE n_tokens >= 20)
    SELECT source, lang,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           round(sum(n_chars)::DOUBLE / sum(n_tokens), 6) AS chars_per_token
    FROM final
    GROUP BY source, lang
    """,
    ops=["X1", "P1", "G2", "EXT-tokens", "EXT-quality", "EXT-dedup-policy"],
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain every pretraining-data pipeline runs: exact-dedup (keep
    first by boilerplate-prefix fingerprint), language whitelist, length
    quality gates, then per-(source, lang) token accounting. One Spark
    plan: narrow fingerprint -> one dedup shuffle -> pushed-down filters
    -> one agg shuffle."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text
    from openrouter_batch_processor_spark.operators.dedup import dedup_keep_first

    docs = _t(spark, sf_dir, "documents").withColumn(
        "_norm", normalize_text(F.col("text"))
    )
    keyed = docs.withColumn(
        "_k", F.concat_ws(" ", F.slice(F.split(F.col("_norm"), " "), 1, 5))
    )
    deduped = dedup_keep_first(keyed, id_col="doc_id", text_col="_k")
    gated = deduped.filter(
        F.col("lang").isin("en", "fr", "de") & (F.col("n_chars") >= 100)
    ).withColumn(
        "n_tokens",
        F.when(F.col("_norm") == "", F.lit(0)).otherwise(
            F.size(F.split(F.col("_norm"), " "))
        ),
    )
    final = gated.filter(F.col("n_tokens") >= 20)
    return final.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
        ).alias("chars_per_token"),
    )


@register(
    "curation_full_pipeline",
    f"""
    WITH RECURSIVE
    gated AS (
      SELECT doc_id, source, text, n_tokens
      FROM {_quality_sql("documents", "doc_id, source, text")}
      WHERE quality_score >= 0.5),
    bt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM gated),
    bs AS (SELECT doc_id,
                  list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
           FROM bt WHERE len(toks) >= 3),
    b_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM bs),
    b_df AS (SELECT shingle, count(*) AS df FROM b_set GROUP BY 1),
    boiler AS (SELECT shingle FROM b_df WHERE df >= 20),
    b_pd AS (SELECT doc_id, count(*) AS n_ngrams FROM b_set GROUP BY 1),
    b_nb AS (SELECT doc_id, count(*) AS n_boiler
             FROM b_set JOIN boiler USING (shingle) GROUP BY 1),
    ratios AS (SELECT p.doc_id,
                      round(coalesce(nb.n_boiler, 0) / p.n_ngrams, 6) AS br
               FROM b_pd p LEFT JOIN b_nb nb USING (doc_id)),
    cleaned AS (
      SELECT g.doc_id, g.source, g.text, g.n_tokens
      FROM gated g LEFT JOIN ratios r USING (doc_id)
      WHERE coalesce(r.br, 0.0) <= 0.5),
    ex AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM cleaned),
    sv AS (SELECT doc_id, source, text, n_tokens FROM ex WHERE rn = 1),
    {_shingles_sql("sv")},
    {_CC_SQL},
    dropped AS (SELECT node AS doc_id FROM labels WHERE node != cluster_id),
    finaldocs AS (
      SELECT sv.* FROM sv LEFT JOIN dropped d ON d.doc_id = sv.doc_id
      WHERE d.doc_id IS NULL),
    softsz AS (SELECT cluster_id, count(*)::BIGINT AS csz
               FROM labels GROUP BY 1),
    softw AS (SELECT sv.source,
                     sum(round(sv.n_tokens / coalesce(z.csz, 1), 6)::DECIMAL(28,6))::DOUBLE
                       AS soft
              FROM sv
              LEFT JOIN labels l ON l.node = sv.doc_id
              LEFT JOIN softsz z ON z.cluster_id = l.cluster_id
              GROUP BY 1),
    {_span_sql("finaldocs")}
    SELECT f.source, count(*)::BIGINT AS n_docs, sum(f.n_tokens)::BIGINT AS n_tokens,
           sum(coalesce(s.n_removed, 0))::BIGINT AS n_span_tokens_removed,
           (sum(len(t.toks)) - sum(coalesce(s.n_removed, 0)))::BIGINT AS n_tokens_clean,
           round(min(sw.soft), 6) AS n_tokens_soft
    FROM finaldocs f
    JOIN spt t USING (doc_id)
    LEFT JOIN spstats s USING (doc_id)
    JOIN softw sw ON sw.source = f.source
    GROUP BY f.source
    """,
    ops=["X1", "EXT-quality", "EXT-boilerplate", "EXT-minhash", "EXT-dedup-policy", "G2"],
)
def q_curation_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole cleaning DAG in ONE declarative plan: quality gate ->
    boilerplate filter -> exact dedup -> LSH near-dup keep-first ->
    duplicated-span removal over the survivors (r04) -> per-source
    docs/tokens yield incl. the post-span-removal token volume AND the
    soft-dedup effective token mass (r11: the cluster table consumed as
    1/|cluster| weights instead of a kill list, so both dedup policies'
    budgets come from one pass) — cheap row-local gates first, the
    expensive joins last over the smallest survivor set
    (operators/curation.py corpus_curation_pipeline)."""
    from openrouter_batch_processor_spark.operators.curation import (
        corpus_curation_pipeline,
    )

    return corpus_curation_pipeline(_t(spark, sf_dir, "documents"))


@register(
    "curation_moore_lewis",
    f"""
    WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, toks[u.i] AS w1, toks[u.i+1] AS w2
            FROM tk, unnest(range(1, len(toks))) AS u(i)
            WHERE len(toks) >= 2),
    tf2 AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf
            FROM pos GROUP BY 1, 2, 3),
    itk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks
            FROM documents WHERE lang = 'en'),
    ci12 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, count(*)::BIGINT AS c
             FROM itk, unnest(range(1, len(toks))) AS u(i)
             WHERE len(toks) >= 2 GROUP BY 1, 2),
    ci1 AS (SELECT u.w, count(*)::BIGINT AS c
            FROM itk, unnest(toks) AS u(w) WHERE u.w != '' GROUP BY 1),
    gt12 AS (SELECT toks[u.i] AS a, toks[u.i+1] AS b, count(*)::BIGINT AS c
             FROM tk, unnest(range(1, len(toks))) AS u(i)
             WHERE len(toks) >= 2 GROUP BY 1, 2),
    gt1 AS (SELECT u.w, count(*)::BIGINT AS c
            FROM tk, unnest(toks) AS u(w) WHERE u.w != '' GROUP BY 1),
    vv AS (SELECT (SELECT count(*) FROM ci1)::DOUBLE AS v_in,
                  (SELECT count(*) FROM gt1)::DOUBLE AS v_gen),
    j AS (SELECT f.doc_id, f.tf,
                 coalesce(i2.c, 0) AS c12_in, coalesce(i1.c, 0) AS c1_in,
                 coalesce(g2.c, 0) AS c12_gen, coalesce(g1.c, 0) AS c1_gen,
                 vv.v_in, vv.v_gen
          FROM tf2 f
          LEFT JOIN ci12 i2 ON i2.a = f.w1 AND i2.b = f.w2
          LEFT JOIN ci1 i1 ON i1.w = f.w1
          LEFT JOIN gt12 g2 ON g2.a = f.w1 AND g2.b = f.w2
          LEFT JOIN gt1 g1 ON g1.w = f.w1
          CROSS JOIN vv),
    sc AS (SELECT doc_id, tf,
                  round(tf * round(-ln((c12_in + 0.5) / (c1_in + 0.5 * v_in)), 6),
                        6)::DECIMAL(18,6) AS nb_in,
                  round(tf * round(-ln((c12_gen + 0.5) / (c1_gen + 0.5 * v_gen)), 6),
                        6)::DECIMAL(18,6) AS nb_gen
           FROM j),
    agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
                   ((sum(nb_in) * 1000000)::BIGINT * 10) // sum(tf)::BIGINT AS s7i,
                   ((sum(nb_gen) * 1000000)::BIGINT * 10) // sum(tf)::BIGINT AS s7g
            FROM sc GROUP BY 1)
    SELECT a.doc_id, d.lang, a.n_bigrams,
           s7i / 10000000.0 AS ce_in, s7g / 10000000.0 AS ce_gen,
           (s7i - s7g) / 10000000.0 AS ce_diff,
           s7i < s7g AS selected
    FROM agg a JOIN documents d USING (doc_id)
    """,
    ops=["EXT-curation", "EXT-quality", "G2", "J3"],
)
def q_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis cross-entropy difference selection (Moore & Lewis
    2010): per-doc H_in − H_gen under an in-domain (lang='en') vs
    general (whole corpus) add-k bigram LM; selected = negative
    difference, the paper's keep criterion at the natural zero cut
    (operators/curation.moore_lewis_select — one bigram pass feeds
    both scorings, selection flag is row-local)."""
    from openrouter_batch_processor_spark.operators.curation import (
        moore_lewis_select,
    )

    return moore_lewis_select(_t(spark, sf_dir, "documents"))


@register(
    "curation_dsir_select",
    f"""
    WITH {_DSIR_LW_SQL},
    keyed AS (SELECT doc_id, log_weight,
                     round(log_weight
                           + -ln(-ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 0.5)
                                      / 4503599627370496.0)), 6) AS gkey
              FROM dsirw),
    sel AS (SELECT doc_id FROM keyed ORDER BY gkey DESC, doc_id ASC LIMIT 100),
    c AS (SELECT d.source, w.doc_id, w.log_weight,
                 s.doc_id IS NOT NULL AS is_sel
          FROM dsirw w JOIN documents d USING (doc_id)
          LEFT JOIN sel s ON s.doc_id = w.doc_id)
    SELECT source, count(*)::BIGINT AS n_docs,
           count(CASE WHEN is_sel THEN 1 END)::BIGINT AS n_selected,
           ((count(CASE WHEN is_sel THEN 1 END) * 10000000) // count(*))
             / 10000000.0 AS sel_rate,
           coalesce(sum(CASE WHEN is_sel THEN log_weight::DECIMAL(18,6) END),
                    0::DECIMAL(18,6))::DOUBLE AS sum_logw_selected
    FROM c GROUP BY source
    """,
    ops=["EXT-sampling", "EXT-quality", "O4", "G2"],
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING end-to-end: Gumbel-top-k (k=100) over
    the hashed-unigram log-weights in log domain (no exp anywhere),
    reported as per-source selection yield — the mixture a DSIR-curated
    corpus actually ships. See operators/textanalysis.dsir_select."""
    from openrouter_batch_processor_spark.operators.textanalysis import dsir_select

    return dsir_select(_t(spark, sf_dir, "documents"), k=100)


@register(
    "curation_prototype_prune",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    centroids AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                  FROM embeddings ORDER BY vec_id LIMIT 8),
    asg AS ({_MULTIPROBE_ASG_SQL.format(cent="centroids", nprobe=1)}),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
          FROM e),
    cu AS (SELECT centroid_id,
                  list_transform(cvec, x -> x / sqrt(list_dot_product(cvec, cvec))) AS cunit
           FROM centroids),
    cs AS (SELECT a.centroid_id, a.vec_id,
                  round(list_dot_product(u.unit, cu.cunit), 6) AS cos
           FROM asg a JOIN u USING (vec_id) JOIN cu USING (centroid_id)),
    r AS (SELECT centroid_id, cos,
                 row_number() OVER (PARTITION BY centroid_id
                                    ORDER BY cos DESC, vec_id ASC) AS rn,
                 count(*) OVER (PARTITION BY centroid_id) AS n
          FROM cs)
    SELECT centroid_id, max(n)::BIGINT AS n_vectors,
           count(CASE WHEN rn <= (3 * n) // 10 THEN 1 END)::BIGINT AS n_pruned,
           (max(n) - count(CASE WHEN rn <= (3 * n) // 10 THEN 1 END))::BIGINT AS n_kept,
           min(CASE WHEN rn <= (3 * n) // 10 THEN cos END) AS cut_cos
    FROM r GROUP BY 1
    """,
    ops=["EXT-ivf", "EXT-dedup-policy", "G2", "W1"],
)
def q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype pruning report (Sorscher et al. 2022): prune the
    most prototypical 3/10 of every IVF cell by cosine-to-centroid —
    operators/similarity.prototype_prune_report."""
    from openrouter_batch_processor_spark.operators.similarity import (
        prototype_prune_report,
    )

    return prototype_prune_report(
        _t(spark, sf_dir, "embeddings"), prune_num=3, prune_den=10, n_centroids=8
    )


# ===========================================================================
# Round-4 second wave: the FineWeb-style AND-ed filter-stack composite
# ===========================================================================


@register(
    "curation_fineweb_gate",
    f"""
    WITH t AS (SELECT doc_id, source, {_NORM_SQL} AS norm FROM documents),
    bse AS (SELECT doc_id, source, norm, len(norm)::BIGINT AS n_norm_chars,
                   string_split(norm, ' ') AS toks FROM t),
    gb AS (SELECT doc_id, source, n_norm_chars, toks,
                  len(toks)::BIGINT AS n_words,
                  len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
                  len(list_distinct(list_filter(toks,
                      x -> list_contains(['the','a'], x))))::BIGINT AS n_stops
           FROM bse),
    bgx AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i+1])) AS bgr
            FROM gb WHERE len(toks) >= 2),
    bcx AS (SELECT doc_id, bgr, count(*) AS c FROM bgx GROUP BY 1, 2),
    tmx AS (SELECT doc_id, max(c * len(bgr))::BIGINT AS top_mass FROM bcx GROUP BY 1),
    gflag AS (SELECT g.doc_id,
                     ((n_words >= 15 AND n_words <= 90)
                      AND (n_norm_chars - (n_words - 1) >= 3 * n_words
                           AND n_norm_chars - (n_words - 1) <= 10 * n_words)
                      AND (n_alpha * 5 >= n_words * 4)
                      AND (n_stops >= 2)
                      AND (coalesce(top_mass, 0) * 5 <= n_norm_chars)) AS gp
              FROM gb g LEFT JOIN tmx USING (doc_id)),
    em AS (SELECT doc_id, len(norm)::BIGINT AS n,
                  list_aggregate(list_transform(
                    list_sort(list_distinct(string_split(norm, ''))),
                    c -> round(len(list_filter(string_split(norm, ''), x -> x = c)) *
                               log2(len(list_filter(string_split(norm, ''), x -> x = c))),
                               6)::DECIMAL(18,6)), 'sum') AS mass
           FROM t),
    eflag AS (SELECT doc_id,
                     (round(log2(n::DOUBLE) - mass::DOUBLE / n::DOUBLE, 6) >= 4.0) AS ep
              FROM em),
    tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    bgm AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1])) AS bigram
            FROM tk WHERE len(toks) >= 2),
    bf AS (SELECT doc_id, bigram, count(*)::BIGINT AS bf FROM bgm GROUP BY 1, 2),
    c12 AS (SELECT bigram, sum(bf)::BIGINT AS c12 FROM bf GROUP BY 1),
    uni AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents),
    ctf AS (SELECT term, count(*)::BIGINT AS c1 FROM uni WHERE term != '' GROUP BY 1),
    v AS (SELECT count(*)::DOUBLE AS vsz FROM ctf),
    sc AS (SELECT f.doc_id, f.bf,
                  round(-ln((c.c12 + 0.5) / (t2.c1 + 0.5 * v.vsz)), 6) AS nb
           FROM bf f JOIN c12 c USING (bigram)
           JOIN ctf t2 ON t2.term = string_split(f.bigram, ' ')[1]
           CROSS JOIN v),
    agg AS (SELECT doc_id,
                   ((sum(round(bf * nb, 6)::DECIMAL(18,6)) * 1000000)::BIGINT * 10)
                     // sum(bf)::BIGINT AS sm7
            FROM sc GROUP BY 1),
    nllx AS (SELECT doc_id, sm7 / 10000000.0 AS avg_nll FROM agg),
    pflag AS (SELECT n.doc_id,
                     (ntile(3) OVER (PARTITION BY d.source
                                     ORDER BY n.avg_nll ASC, n.doc_id ASC) != 3) AS pp
              FROM nllx n JOIN documents d USING (doc_id)),
    flags AS (SELECT d.source,
                     coalesce(g.gp, FALSE) AS gp,
                     coalesce(e.ep, FALSE) AS ep,
                     coalesce(p.pp, FALSE) AS pp
              FROM documents d
              LEFT JOIN gflag g USING (doc_id)
              LEFT JOIN eflag e USING (doc_id)
              LEFT JOIN pflag p USING (doc_id)),
    rep AS (SELECT source, count(*)::BIGINT AS n_docs,
                   count(CASE WHEN gp THEN 1 END)::BIGINT AS n_gopher,
                   count(CASE WHEN ep THEN 1 END)::BIGINT AS n_entropy,
                   count(CASE WHEN pp THEN 1 END)::BIGINT AS n_ppl,
                   count(CASE WHEN gp AND ep AND pp THEN 1 END)::BIGINT AS n_kept
            FROM flags GROUP BY 1)
    SELECT source, n_docs, n_gopher, n_entropy, n_ppl, n_kept,
           ((n_kept * 10000000) // n_docs)::DOUBLE / 10000000.0 AS kept_frac
    FROM rep
    """,
    ops=["EXT-quality", "EXT-tokens", "G2", "W1", "O3"],
)
def q_fineweb_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style AND-ed filter stack per source: Gopher rules +
    char-entropy floor + CCNet not-tail perplexity gate, intersection
    yield with exact kept_frac — operators/curation.fineweb_gate."""
    from openrouter_batch_processor_spark.operators.curation import fineweb_gate

    return fineweb_gate(_t(spark, sf_dir, "documents"), entropy_min=4.0)


@register(
    "curation_blocklist_filter",
    f"""
    WITH toks AS (SELECT doc_id, source,
                         string_split({_NORM_SQL}, ' ') AS toks
                  FROM documents),
    hits AS (SELECT doc_id, source, t.tok
             FROM toks, unnest(toks.toks) AS t(tok)
             WHERE t.tok IN ('bad', 'crash', 'dup'))
    SELECT doc_id, source,
           count(*)::BIGINT AS n_blocked_tokens,
           count(DISTINCT tok)::BIGINT AS n_distinct_blocked,
           string_agg(DISTINCT tok, ',' ORDER BY tok) AS blocked_csv
    FROM hits GROUP BY 1, 2
    """,
    ops=["EXT-curation", "P1", "F1", "G2"],
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2): flag docs
    whose normalized tokens hit the blocklist, with the matched-word
    audit trail. Membership is a literal-array filter inside one
    map-only pass — no join, no shuffle before the final row set
    (operators/curation.blocklist_filter)."""
    from openrouter_batch_processor_spark.operators.curation import (
        blocklist_filter,
    )

    return blocklist_filter(_t(spark, sf_dir, "documents"))


@register(
    "curation_quality_logreg",
    _logreg_sql(6),
    ops=["EXT-curation", "EXT-quality", "G2", "J3"],
)
def q_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style quality classifier trained in-engine: 6 steps of
    full-batch logistic gradient descent on (bias, token count,
    stopword ratio, mean word length) with label lang='en' — weight
    vector as a 1-row broadcast, one combiner aggregation per step,
    9-dp-grid trajectory bit-identical to the unrolled oracle
    (operators/curation.quality_logreg)."""
    from openrouter_batch_processor_spark.operators.curation import (
        quality_logreg,
    )

    return quality_logreg(_t(spark, sf_dir, "documents"))


@register(
    "curation_doremi_weights",
    f"""
    WITH tf AS (
      SELECT source, tok, count(*)::BIGINT AS cnt
      FROM (SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    cw AS (SELECT tok, sum(cnt)::BIGINT AS cw FROM tf GROUP BY 1),
    ns AS (SELECT source, sum(cnt)::BIGINT AS n_s FROM tf GROUP BY 1),
    nn AS (SELECT sum(cnt)::BIGINT AS n FROM tf),
    sc AS (
      SELECT tf.source, min(ns.n_s) AS n_s,
             sum(round(cnt * -ln(cw.cw::DOUBLE / nn.n), 9)::DECIMAL(28,9))
               AS s_corpus,
             sum(round(cnt * -ln(cnt::DOUBLE / ns.n_s), 9)::DECIMAL(28,9))
               AS s_own
      FROM tf JOIN cw USING (tok) JOIN ns USING (source), nn
      GROUP BY 1),
    ex AS (SELECT source,
                  (s_corpus - s_own)::DOUBLE / n_s AS excess
           FROM sc),
    wr AS (SELECT source, excess, exp(excess) AS w_raw FROM ex),
    nrm AS (SELECT sum(round(w_raw, 9)::DECIMAL(28,9))::DOUBLE AS norm
            FROM wr)
    SELECT source, round(excess, 9) AS excess_kl,
           round(w_raw / nrm.norm, 6) AS weight
    FROM wr, nrm
    """,
    ops=["EXT-curation", "EXT-quality", "G2", "J3"],
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain reweighting (Xie et al. 2023 with unigram
    proxy/reference LMs — per-domain excess loss = KL(p_d || p_corpus)
    in nats): exp-excess softmax over domains, decimal-summed
    cross-entropies, 1-row total/normalizer broadcasts
    (operators/curation.doremi_weights)."""
    from openrouter_batch_processor_spark.operators.curation import (
        doremi_weights,
    )

    return doremi_weights(_t(spark, sf_dir, "documents"))


@register(
    "curation_softdedup_weights",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CC_SQL},
    sizes AS (SELECT cluster_id, count(*) AS cluster_size
              FROM labels GROUP BY 1)
    SELECT d.doc_id,
           coalesce(s.cluster_size, 1)::BIGINT AS cluster_size,
           round(1.0 / coalesce(s.cluster_size, 1), 6) AS weight
    FROM documents d
    LEFT JOIN labels l ON l.node = d.doc_id
    LEFT JOIN sizes s ON s.cluster_id = l.cluster_id
    """,
    ops=["EXT-dedup-policy", "EXT-minhash", "EXT-curation", "J1", "G2"],
)
def q_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: per-doc sampling weight 1/|duplicate
    cluster| (singletons 1) from the LSH connected-component cluster
    table — reweight instead of remove, preserving long-tail variants
    (operators/dedup.softdedup_weights)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        softdedup_weights,
    )

    return softdedup_weights(_t(spark, sf_dir, "documents"))


@register(
    "curation_difficulty_topk",
    _logreg_difficulty_sql(6, 25),
    ops=["EXT-curation", "EXT-quality", "G2", "O3"],
)
def q_logreg_difficulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Example-difficulty ranking under the trained linear probe
    (EL2N/margin recipe, Paul et al. 2021): |p − y| after the 6-step
    logistic GD, top-25 hardest docs — the mislabeled/ambiguous
    review queue of a data-pruning loop; scoring is one weight-row
    broadcast over the staged features
    (operators/curation.logreg_difficulty)."""
    from openrouter_batch_processor_spark.operators.curation import (
        logreg_difficulty,
    )

    return logreg_difficulty(_t(spark, sf_dir, "documents"))


@register(
    "pack_documents_bpe",
    "WITH "
    + ",\n    ".join(_bpe_encode_ctes())
    + """,
    per_doc AS (SELECT doc_id, sum(n_syms)::BIGINT AS n_tokens
                FROM wrd JOIN enc USING (tok) GROUP BY 1),
    c AS (SELECT doc_id, n_tokens,
                 (sum(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING))::BIGINT
                   - n_tokens AS start_offset
          FROM per_doc)
    SELECT doc_id, n_tokens, start_offset,
           floor(start_offset / 512.0)::BIGINT AS bin_id,
           start_offset % 512 AS offset_in_bin
    FROM c
    """,
    ops=["EXT-tokens", "EXT-curation", "W1", "W2"],
)
def q_pack_documents_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-stream packing over REAL subword counts (VERDICT r07 #5):
    pack_documents_stream's distributed prefix sum, but each document
    contributes its BPE token count from the staged encoded vocabulary,
    so a 512-token bin holds 512 model tokens, not 512 whitespace words
    (operators/chunking.pack_documents_bpe)."""
    from openrouter_batch_processor_spark.operators.chunking import (
        pack_documents_bpe,
    )

    return pack_documents_bpe(_t(spark, sf_dir, "documents"), capacity=512)


@register(
    "curation_temperature_mix",
    """
    WITH c AS (SELECT lang AS domain, count(*)::BIGINT AS n_docs
               FROM documents GROUP BY 1),
    t AS (SELECT sum(n_docs)::BIGINT AS total FROM c),
    p AS (SELECT domain, n_docs, n_docs::DOUBLE / total AS pl,
                 round(exp(0.3 * ln(n_docs::DOUBLE / total)), 9) AS pa
          FROM c, t),
    z AS (SELECT sum(pa::DECIMAL(28,9))::DOUBLE AS zsum FROM p)
    SELECT domain AS lang, n_docs, round(pl, 6) AS p_raw,
           round(pa / zsum, 6) AS p_temp,
           round((pa / zsum) / pl, 6) AS upsample
    FROM p, z
    """,
    ops=["EXT-curation", "G2"],
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling weights (XLM-R's
    α = 0.3 flattening): per-language raw share, tempered share and
    the upsampling factor the data scheduler applies — exp/ln parity
    path, decimal-summed normalizer
    (operators/curation.temperature_mixture)."""
    from openrouter_batch_processor_spark.operators.curation import (
        temperature_mixture,
    )

    return temperature_mixture(_t(spark, sf_dir, "documents"), alpha=0.3)


@register(
    "curation_hashed_features",
    f"""
    WITH tk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    bg AS (SELECT toks[i] || ' ' || toks[i + 1] AS bg
           FROM tk, unnest(range(1, len(toks))) AS t(i)
           WHERE len(toks) >= 2)
    SELECT (('0x' || substr(md5(bg), 1, 4))::BIGINT % 256)::BIGINT AS bucket,
           count(*)::BIGINT AS n_occurrences,
           count(DISTINCT bg)::BIGINT AS n_distinct_bigrams
    FROM bg GROUP BY 1
    """,
    ops=["EXT-curation", "EXT-tokens", "F4", "G2"],
)
def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bigram feature-table profile: md5-bucketed slots
    with occurrence mass and collision load — the featurizer sizing
    audit before a hashed linear probe
    (operators/textanalysis.hashed_ngram_features)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        hashed_ngram_features,
    )

    return hashed_ngram_features(_t(spark, sf_dir, "documents"))


@register(
    "curation_minipile_prune",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
           FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
    {_km_assign_sql('c0', 'a1')},
    {_km_recompute_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    q AS (SELECT doc_id, quality_score
          FROM {_quality_sql('documents', 'doc_id')} qq),
    j AS (SELECT a.cluster_id, q.quality_score
          FROM a2 a JOIN q ON q.doc_id = a.vec_id),
    pc AS (SELECT cluster_id, count(*)::BIGINT AS n_docs,
                  round(sum(quality_score::DECIMAL(28,9))::DOUBLE / count(*), 6)
                    AS mean_quality
           FROM j GROUP BY 1),
    rk AS (SELECT *, row_number() OVER (ORDER BY mean_quality ASC, cluster_id ASC)
                       AS rn
           FROM pc),
    kd AS (SELECT cluster_id, n_docs, mean_quality, rn > 2 AS kept FROM rk),
    t AS (SELECT sum(CASE WHEN kept THEN n_docs ELSE 0 END)::BIGINT
                   AS total_kept_docs FROM kd)
    SELECT cluster_id, n_docs, mean_quality, kept, total_kept_docs
    FROM kd CROSS JOIN t
    """,
    ops=["EXT-curation", "EXT-simsearch", "EXT-quality", "G2", "J2", "O3"],
)
def q_minipile_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MiniPile-style cluster pruning: k-means the embedding space,
    score clusters by mean document quality, drop the 2 worst whole —
    cluster-level curation that removes entire junk modes
    (operators/curation.minipile_prune)."""
    from openrouter_batch_processor_spark.operators.curation import (
        minipile_prune,
    )

    return minipile_prune(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


@register(
    "curation_decontamination_report",
    f"""
    WITH spt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                 FROM documents),
    spw AS (SELECT doc_id,
                   md5(array_to_string(list_slice(toks, u.i, u.i + 7), ' ')) AS wh
            FROM spt, unnest(range(1, len(toks) - 8 + 2)) AS u(i)
            WHERE len(toks) >= 8),
    bwh AS (SELECT DISTINCT wh FROM spw WHERE doc_id % 7 = 0),
    fn AS (SELECT DISTINCT s.doc_id FROM spw s JOIN bwh USING (wh)
           WHERE s.doc_id % 7 != 0),
    {_WINNOW_SQL},
    bfp AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 7 = 0),
    fw AS (SELECT DISTINCT s.doc_id FROM sel s JOIN bfp USING (fp)
           WHERE s.doc_id % 7 != 0),
    corpus AS (SELECT doc_id, source FROM documents WHERE doc_id % 7 != 0),
    fl AS (SELECT c.source,
                  (fn.doc_id IS NOT NULL)::INT AS f_n,
                  (fw.doc_id IS NOT NULL)::INT AS f_w
           FROM corpus c
           LEFT JOIN fn ON fn.doc_id = c.doc_id
           LEFT JOIN fw ON fw.doc_id = c.doc_id)
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(f_n)::BIGINT AS n_ngram,
           sum(f_w)::BIGINT AS n_winnow,
           sum(f_n * f_w)::BIGINT AS n_both,
           sum(((f_n + f_w) > 0)::INT)::BIGINT AS n_union,
           CASE WHEN sum(((f_n + f_w) > 0)::INT) > 0
                THEN round(sum(f_n * f_w) / sum(((f_n + f_w) > 0)::INT), 6)
           END AS method_jaccard
    FROM fl GROUP BY 1
    """,
    ops=["EXT-curation", "EXT-audit", "EXT-tokens", "X1", "G2", "J2"],
)
def q_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination ensemble audit: exact 8-gram window collisions
    vs winnow fingerprint overlap against the doc_id%7 benchmark
    slice, per-source counts + between-method Jaccard — both flag
    stages ride the session-staged sketch tables
    (operators/curation.decontamination_report)."""
    from openrouter_batch_processor_spark.operators.curation import (
        decontamination_report,
    )

    return decontamination_report(_t(spark, sf_dir, "documents"))


@register(
    "curation_crossdoc_suffix",
    f"""
    WITH {_span_sql("documents", cross_doc=True)}
    SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
           coalesce(s.n_removed, 0)::BIGINT AS n_removed,
           coalesce(s.n_spans_removed, 0)::BIGINT AS n_spans_removed,
           round(coalesce(s.n_removed, 0) / len(t.toks), 6) AS removed_fraction,
           coalesce(c.cleaned_text, '') AS cleaned_text
    FROM spt t
    LEFT JOIN spstats s USING (doc_id)
    LEFT JOIN spclean c USING (doc_id)
    """,
    ops=["X1", "EXT-dedup-policy", "EXT-decontam", "G4", "O1"],
)
def q_crossdoc_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document suffix dedup, Lee et al. §4 front-to-back
    (VERDICT r09 #8): remove every 8-token window that recurs in >= 2
    DISTINCT documents, keeping the global first occurrence — the
    cross-doc contamination edit, where curation_remove_dup_spans is
    the within-corpus repetition edit (within-doc repeats survive
    here). Shares the staged span-window artifact with discovery and
    removal (operators/curation.remove_duplicate_spans
    cross_doc_only=True)."""
    from openrouter_batch_processor_spark.operators.curation import (
        remove_duplicate_spans,
    )

    return remove_duplicate_spans(
        _t(spark, sf_dir, "documents"), window_tokens=8, cross_doc_only=True
    )


@register(
    "curation_maximal_dup_spans",
    f"""
    WITH spt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
                 FROM documents),
    spw AS (SELECT doc_id, u.i - 1 AS pos,
                   md5(array_to_string(list_slice(toks, u.i, u.i + 7), ' ')) AS wh
            FROM spt, unnest(range(1, len(toks) - 8 + 2)) AS u(i)
            WHERE len(toks) >= 8),
    spd AS (SELECT wh FROM spw GROUP BY wh HAVING count(*) >= 2),
    runs AS (SELECT doc_id, pos,
                    pos - row_number() OVER (
                      PARTITION BY doc_id ORDER BY pos) AS grp
             FROM (SELECT s.doc_id, s.pos FROM spw s JOIN spd USING (wh))),
    spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
                     (max(pos) - min(pos) + 8)::BIGINT AS span_tokens,
                     count(*)::BIGINT AS n_seeds
              FROM runs GROUP BY doc_id, grp)
    SELECT sp.doc_id, sp.span_start, sp.span_tokens, sp.n_seeds,
           md5(array_to_string(list_slice(
               t.toks, (sp.span_start + 1)::INTEGER,
               (sp.span_start + sp.span_tokens)::INTEGER), ' ')) AS span_md5
    FROM spans sp JOIN spt t USING (doc_id)
    ORDER BY span_tokens DESC, doc_id ASC, span_start ASC LIMIT 25
    """,
    ops=["X1", "EXT-dedup-policy", "EXT-tokens", "G2", "O3"],
)
def q_maximal_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 MAXIMAL duplicated spans (Lee et al. 2022 ExactSubstr
    granularity, VERDICT r11 #8): maximal runs of 8-token windows each
    occurring >= 2 times corpus-wide (within-doc repeats count, the
    paper's definition), with the exact span token-run hashed so span
    IDENTITY — not just coverage — sits under the driver's value hash;
    closes the cross-doc substring family next to the first-occurrence
    policy (curation_crossdoc_suffix) and the removal edit
    (operators/curation.maximal_dup_spans)."""
    from openrouter_batch_processor_spark.operators.curation import (
        maximal_dup_spans,
    )

    return maximal_dup_spans(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round 11 (second batch): competence-based curriculum pacing
# ===========================================================================


@register(
    "curation_curriculum_pacing",
    f"""
    WITH {_TF_SQL},
    ctf AS (SELECT term, sum(tf)::BIGINT AS ctf FROM tf GROUP BY term),
    tot AS (SELECT sum(ctf)::DOUBLE AS total_tokens FROM ctf),
    c AS (SELECT t.doc_id, t.tf,
                 round(t.tf * ln(tot.total_tokens / ctf.ctf), 6)::DECIMAL(18,6)
                   AS contrib
          FROM tf t JOIN ctf USING (term) CROSS JOIN tot),
    nll AS (SELECT doc_id, round(sum(contrib)::DOUBLE / sum(tf), 6) AS avg_nll
            FROM c GROUP BY doc_id),
    b AS (SELECT floor(avg_nll * 100)::BIGINT AS bin, count(*)::BIGINT AS cnt
          FROM nll GROUP BY 1),
    cum AS (SELECT bin, cnt,
                   (sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING))::BIGINT
                     AS cum
            FROM b),
    nt AS (SELECT sum(cnt)::DOUBLE AS n FROM b),
    comp AS (SELECT t,
                    least(1.0, sqrt((t / 10.0) * (1.0 - 0.01 * 0.01)
                                    + 0.01 * 0.01)) AS c
             FROM (SELECT unnest(range(1, 11))::BIGINT AS t))
    SELECT s.t AS step, round(s.c, 6) AS competence,
           coalesce(sum(CASE WHEN cum.cum / nt.n <= s.c THEN cum.cnt END),
                    0)::BIGINT AS n_eligible,
           round(coalesce(sum(CASE WHEN cum.cum / nt.n <= s.c THEN cum.cnt END),
                          0) / nt.n, 6) AS frac_eligible
    FROM comp s CROSS JOIN cum CROSS JOIN nt
    GROUP BY s.t, s.c, nt.n
    """,
    ops=["EXT-curation", "EXT-sampling", "EXT-tokens", "G2", "W2"],
)
def q_curriculum_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competence-based curriculum schedule (Platanios et al. 2019):
    difficulty = unigram-LM rarity, CDF at cent-bin granularity,
    competence c(t) = min(1, sqrt(t/T·(1−c0²)+c0²)) — one pacing row
    per step with the eligible-pool size
    (operators/curation.curriculum_pacing; conditional sums + explode,
    no step×bin join)."""
    from openrouter_batch_processor_spark.operators.curation import (
        curriculum_pacing,
    )

    return curriculum_pacing(_t(spark, sf_dir, "documents"))


@register(
    "audit_logreg_calibration",
    "WITH "
    + ",\n    ".join(_logreg_ctes(6, with_ids=True))
    + """,
    scored AS (
      SELECT y,
             round(1.0 / (1.0 + exp(-round(x0 * a0 + x1 * a1 + x2 * a2
                                           + x3 * a3, 9))), 9) AS p
      FROM feats, wt6),
    b AS (SELECT least(floor(p * 10)::BIGINT, 9) AS bin, y, p FROM scored),
    g AS (SELECT bin, count(*)::BIGINT AS n_docs,
                 round(sum(p::DECIMAL(28,9))::DOUBLE / count(*), 6) AS mean_p,
                 round(sum(y)::BIGINT / count(*), 6) AS frac_pos
          FROM b GROUP BY 1),
    g2 AS (SELECT bin, n_docs, mean_p, frac_pos,
                  round(abs(mean_p - frac_pos), 6) AS abs_gap
           FROM g),
    t AS (SELECT sum(n_docs)::DOUBLE AS nn FROM g2),
    e AS (SELECT round(sum(round(abs_gap * n_docs / t.nn,
                                 9)::DECIMAL(28,9))::DOUBLE, 6) AS ece
          FROM g2, t)
    SELECT g2.bin, g2.n_docs, g2.mean_p, g2.frac_pos, g2.abs_gap, e.ece
    FROM g2 CROSS JOIN e
    """,
    ops=["EXT-curation", "EXT-quality", "EXT-audit", "G2", "J3"],
)
def q_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability deciles + ECE of the trained quality classifier
    (Guo et al. 2017): per-bin mean confidence vs empirical positive
    rate — the audit that keeps a quality gate's threshold honest
    (operators/curation.logreg_calibration)."""
    from openrouter_batch_processor_spark.operators.curation import (
        logreg_calibration,
    )

    return logreg_calibration(_t(spark, sf_dir, "documents"))


@register(
    "curation_packing_frontier",
    f"""
    WITH {_TOKS_N_SQL},
    ne AS (SELECT doc_id, n_tokens::BIGINT AS n_tokens FROM tk
           WHERE n_tokens > 0),
    offs AS (SELECT doc_id, n_tokens,
                    (sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens)::BIGINT AS start_offset
             FROM ne),
    caps AS (SELECT unnest([256, 512, 1024, 2048])::BIGINT AS capacity),
    j AS (SELECT c.capacity, o.n_tokens,
                 CASE WHEN o.start_offset // c.capacity
                        != (o.start_offset + o.n_tokens - 1) // c.capacity
                      THEN 1 ELSE 0 END AS straddles
          FROM offs o CROSS JOIN caps c),
    per_cap AS (SELECT capacity, count(*)::BIGINT AS n_docs,
                       sum(n_tokens)::BIGINT AS total_tokens,
                       sum(straddles)::BIGINT AS n_straddling
                FROM j GROUP BY 1)
    SELECT capacity, n_docs, total_tokens,
           ((total_tokens - 1) // capacity + 1)::BIGINT AS n_bins,
           n_straddling,
           round(n_straddling / n_docs, 6) AS straddle_frac,
           round((((total_tokens - 1) // capacity + 1) * capacity
                  - total_tokens)
                 / (((total_tokens - 1) // capacity + 1) * capacity),
                 6) AS padding_frac
    FROM per_cap
    """,
    ops=["EXT-curation", "EXT-tokens", "EXT-audit", "G2", "W1"],
)
def q_packing_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length frontier for stream packing: per candidate
    capacity (256/512/1024/2048), the fraction of documents straddling
    a window boundary (cross-contamination / split cost, Krell et al.
    2021) vs the tail-padding fraction — the table that picks a
    pipeline's context length
    (operators/chunking.packing_frontier)."""
    from openrouter_batch_processor_spark.operators.chunking import (
        packing_frontier,
    )

    return packing_frontier(_t(spark, sf_dir, "documents"))


def _carto_conf(t: int) -> str:
    z = f"x0 * wt{t}.a0 + x1 * wt{t}.a1 + x2 * wt{t}.a2 + x3 * wt{t}.a3"
    return (
        f"round(CASE WHEN y = 1.0 THEN 1.0 / (1.0 + exp(-round({z}, 9))) "
        f"ELSE 1.0 - 1.0 / (1.0 + exp(-round({z}, 9))) END, 9) AS c{t}"
    )


@register(
    "curation_cartography",
    "WITH "
    + ",\n    ".join(_logreg_ctes(6, with_ids=True))
    + f""",
    scored AS (
      SELECT doc_id, lang, y,
             {', '.join(_carto_conf(t) for t in range(1, 7))}
      FROM feats, wt1, wt2, wt3, wt4, wt5, wt6),
    m AS (SELECT doc_id, lang,
                 (c1 + c2 + c3 + c4 + c5 + c6) / 6.0 AS mean_c,
                 c1, c2, c3, c4, c5, c6
          FROM scored),
    v AS (SELECT doc_id, lang, round(mean_c, 6) AS mean_conf,
                 round(sqrt(((c1 - mean_c) * (c1 - mean_c)
                             + (c2 - mean_c) * (c2 - mean_c)
                             + (c3 - mean_c) * (c3 - mean_c)
                             + (c4 - mean_c) * (c4 - mean_c)
                             + (c5 - mean_c) * (c5 - mean_c)
                             + (c6 - mean_c) * (c6 - mean_c)) / 6.0),
                       6) AS variability
          FROM m)
    SELECT doc_id, lang, mean_conf, variability,
           CASE WHEN variability <= 0.05 AND mean_conf >= 0.5 THEN 'easy'
                WHEN variability <= 0.05 AND mean_conf < 0.5 THEN 'hard'
                ELSE 'ambiguous' END AS region
    FROM v
    ORDER BY variability DESC, doc_id ASC LIMIT 20
    """,
    ops=["EXT-curation", "EXT-quality", "EXT-audit", "G2", "O3"],
)
def q_cartography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cartography (Swayamdipta et al. 2020) over the quality
    classifier's 6-step trajectory: per-example mean true-class
    confidence x variability, with the easy / hard / ambiguous region
    tags — top-20 most-variable examples, the slice the paper shows
    carries OOD generalization
    (operators/curation.logreg_cartography)."""
    from openrouter_batch_processor_spark.operators.curation import (
        logreg_cartography,
    )

    return logreg_cartography(_t(spark, sf_dir, "documents"))
