"""Shared oracle-SQL builders and helper constants used across the
registry family modules (split from registry.py r08). Family modules
star-import this module; __all__ below therefore enumerates EVERY
top-level binding, including underscore-prefixed helpers."""

from __future__ import annotations

import os  # noqa: F401
from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.registries.base import (
    REGISTRY,
    QuerySpec,
    register,
    _t,
)



# ===========================================================================
# Flagship: the whole LLM batch pipeline, mock transport (S10,G1,F9,F10,D4,T5)
# ===========================================================================

from openrouter_batch_processor_spark.plans.pipeline import (  # noqa: E402
    PIPELINE_ORACLE_SQL,
    run_llm_pipeline,
)


# ===========================================================================
# S2 + F1 + F2 + P1 — file inventory scan shape over documents
# ===========================================================================

from openrouter_batch_processor_spark.functions.paths import file_extension  # noqa: E402


# ===========================================================================
# F3 — human file size ladder
# ===========================================================================

from openrouter_batch_processor_spark.functions.sizes import human_file_size  # noqa: E402


# ===========================================================================
# F17 + F18 — status derivation / route label (when-otherwise chains)
# ===========================================================================

from openrouter_batch_processor_spark.functions.status import (  # noqa: E402
    derive_status,
    route_label,
)


# ===========================================================================
# F12 — elapsed-time compute + str(timedelta) render + parse round-trip
# ===========================================================================

from openrouter_batch_processor_spark.functions.timeops import (  # noqa: E402
    format_timedelta,
    parse_timedelta,
)


# ===========================================================================
# F11 — timestamp format patterns (meta / zip / results)
# ===========================================================================

from openrouter_batch_processor_spark.functions.timeops import ts_format  # noqa: E402


# ===========================================================================
# W1/K5 — global sequence renumbering (distributed, no single-task window)
# ===========================================================================

from openrouter_batch_processor_spark.operators.renumber import renumber  # noqa: E402


# ===========================================================================
# G2 + G6 — usage/cost fold with per-field tolerance and 12-dp costs
# ===========================================================================

from openrouter_batch_processor_spark.operators.aggregates import usage_summary  # noqa: E402


# ===========================================================================
# X1 — exact dedup machinery on a boilerplate-prefix key
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import exact_duplicates  # noqa: E402


# ===========================================================================
# X2 + F16 — order-preserving dedup + format normalization over events
# ===========================================================================

from openrouter_batch_processor_spark.functions.textops import normalize_formats  # noqa: E402


# ===========================================================================
# Text analysis extensions: token stats, quality, langid, fingerprints
# ===========================================================================

from openrouter_batch_processor_spark.operators.textanalysis import (  # noqa: E402
    fingerprints,
    heavy_hitters,
    language_id,
    quality_scores,
    tfidf_topk,
    token_stats,
)

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _quality_sql(src: str, cols: str) -> str:
    """Subquery computing the ONE quality-score formula every quality
    oracle shares (mirrors operators/textanalysis.quality_scores),
    emitting ``cols`` + n_tokens + quality_score over table ``src``.
    text_quality's oracle keeps its own full-ratio SQL; every other
    consumer MUST use this fragment so a formula change is one edit."""
    return f"""(
      SELECT {cols}, n_tokens,
             round(least(greatest(0.3*stop_raw + 0.4*uniq_raw
                                  + 0.3*(1.0 - least(punct_raw*4, 1.0)), 0.0), 1.0), 6) AS quality_score
      FROM (
        SELECT {cols}, len(toks)::BIGINT AS n_tokens,
               len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','it'], t)))::DOUBLE
                     / greatest(len(toks)::DOUBLE, 1.0) AS stop_raw,
               len(list_distinct(toks))::DOUBLE / greatest(len(toks)::DOUBLE, 1.0) AS uniq_raw,
               n_punct / greatest(n_chars, 1.0) AS punct_raw
        FROM (
          SELECT {cols}, len(text)::DOUBLE AS n_chars,
                 string_split({_NORM_SQL}, ' ') AS toks,
                 len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE AS n_punct
          FROM {src})))"""


# Transitive closure of the banded-LSH candidate pairs (requires the
# `bands` CTE from _SHINGLES_SQL in scope; WITH RECURSIVE on the outer
# query). Shared by every cluster-consuming oracle so the closure
# semantics are one edit.
_CC_SQL = """cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION
      SELECT id_b AS src, id_a AS dst FROM cand),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
    labels AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)"""


from openrouter_batch_processor_spark.operators.chunking import (  # noqa: E402
    chunk_documents,
    pack_documents,
)
from openrouter_batch_processor_spark.operators.timeseries import (  # noqa: E402
    ewma_last,
    transition_counts,
)

_TOKS_N_SQL = f"""
    tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks,
                  CASE WHEN {_NORM_SQL} = '' THEN 0
                       ELSE len(string_split({_NORM_SQL}, ' ')) END AS n_tokens
           FROM documents)
"""


def _span_sql(src: str, cross_doc: bool = False) -> str:
    """CTE chain for substring SPAN REMOVAL over relation ``src`` (must
    expose doc_id + text) — mirrors operators/curation.py
    remove_duplicate_spans stage by stage (8-token windows, the
    operator's default): window hashes -> occurrence rank (global
    first-occurrence = min (doc_id, pos)) -> removable occurrences ->
    covered token set -> run boundaries -> per-doc span stats + cleaned
    text. Shared by curation_remove_dup_spans and the full-pipeline
    composite so the two can never diverge. ``cross_doc`` mirrors the
    operator's cross_doc_only: duplication evidence is the number of
    DISTINCT documents holding the window, not raw occurrences."""
    n_occ = "count(DISTINCT doc_id)" if cross_doc else "count(*)"
    return f"""
    spt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM {src}),
    spw AS (SELECT doc_id, u.i - 1 AS pos,
                   md5(array_to_string(list_slice(toks, u.i, u.i + 7), ' ')) AS wh
            FROM spt, unnest(range(1, len(toks) - 8 + 2)) AS u(i)
            WHERE len(toks) >= 8),
    spnd AS (SELECT wh, {n_occ} AS n_occ FROM spw GROUP BY wh),
    spr AS (SELECT doc_id, pos, wh,
                   row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn
            FROM spw),
    sprm AS (SELECT r.doc_id, r.pos FROM spr r JOIN spnd d USING (wh)
             WHERE d.n_occ >= 2 AND r.rn > 1),
    spcov AS (SELECT DISTINCT doc_id, pos + u.k AS j
              FROM sprm, unnest(range(0, 8)) AS u(k)),
    spruns AS (SELECT doc_id, j,
                      CASE WHEN j - lag(j) OVER (PARTITION BY doc_id ORDER BY j) = 1
                           THEN 0 ELSE 1 END AS new_run
               FROM spcov),
    spstats AS (SELECT doc_id, sum(new_run)::BIGINT AS n_spans_removed,
                       count(*)::BIGINT AS n_removed
                FROM spruns GROUP BY doc_id),
    sptok AS (SELECT doc_id, u.j - 1 AS j, toks[u.j] AS tok
              FROM spt, unnest(range(1, len(toks) + 1)) AS u(j)),
    spkept AS (SELECT k.doc_id, k.j, k.tok
               FROM sptok k LEFT JOIN spcov c ON c.doc_id = k.doc_id AND c.j = k.j
               WHERE c.j IS NULL),
    spclean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS cleaned_text
                FROM spkept GROUP BY doc_id)"""


_TF_SQL = f"""
    toks AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
             FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM toks WHERE term != '' GROUP BY doc_id, term)
"""


# ===========================================================================
# Dedup extensions: MinHash-LSH bands, candidate pairs + Jaccard, SimHash
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import (  # noqa: E402
    duplicate_clusters,
    lsh_bands,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)

# Minhash oracle mirrors operators/dedup.py: one md5->uint32 per shingle,
# k affine permutations (A[i]*h + B[i]) % 1e9+7, min per permutation.
from openrouter_batch_processor_spark.operators.dedup import (  # noqa: E402
    MINHASH_A,
    MINHASH_B,
)

_MH_COLS = ",\n".join(
    f"                 list_min(list_transform(hs, h -> ({MINHASH_A[i]} * h + {MINHASH_B[i]}) % 1000000007)) AS mh{i}"
    for i in range(8)
)

def _shingles_sql(src: str = "documents") -> str:
    """The shared shingle->minhash->bands oracle fragment, parameterized
    by its input relation so chained pipelines (curation_dedup_funnel's
    exact-dedup survivors) reuse the exact same minhash definition."""
    return f"""
    t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM {src}),
    s AS (SELECT doc_id,
                 list_transform(range(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
          FROM t WHERE len(toks) >= 3),
    m AS (SELECT doc_id,
                 list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs,
{_MH_COLS}
          FROM s),
    bands AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR || '|' || mh1::VARCHAR) AS band_key FROM m UNION ALL
      SELECT doc_id, 1, md5(mh2::VARCHAR || '|' || mh3::VARCHAR) FROM m UNION ALL
      SELECT doc_id, 2, md5(mh4::VARCHAR || '|' || mh5::VARCHAR) FROM m UNION ALL
      SELECT doc_id, 3, md5(mh6::VARCHAR || '|' || mh7::VARCHAR) FROM m)
"""


_SHINGLES_SQL = _shingles_sql()


# ===========================================================================
# Similarity search: brute-force top-k, IVF top-k, near-dup pairs
# ===========================================================================

from openrouter_batch_processor_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
    neardup_pairs_bruteforce,
    topk_bruteforce,
)

_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b}))"
)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = _t(spark, sf_dir, "embeddings")
    row = emb.orderBy("vec_id").select("embedding").limit(1).collect()[0]
    return [float(x) for x in row["embedding"]]


def neardup_pairsbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_pairs_bruteforce(_t(spark, sf_dir, "embeddings"), threshold=0.4)


# ===========================================================================
# Event-time windows: tumbling aggregation + gap sessionization
# ===========================================================================

from openrouter_batch_processor_spark.operators.windows import (  # noqa: E402
    sessionize,
    tumbling_counts,
)


# ===========================================================================
# F13 json repair, F14/F15 encoding+redaction, F6/F7 naming, F8 footer
# ===========================================================================

from openrouter_batch_processor_spark.functions.hashing import data_url  # noqa: E402
from openrouter_batch_processor_spark.functions.paths import (  # noqa: E402
    output_filename,
    storage_name,
)
from openrouter_batch_processor_spark.functions.textops import (  # noqa: E402
    append_footer,
    json_repair_parse,
)


# D10/J3/J4: the model-catalog dimension — a tiny static table broadcast
# against fact rows (the reference renders it as a grouped dropdown and
# probes it per job; app.py:24-71, templates/_model_dropdown.html:1-11).
MODEL_CATALOG = [
    (0, "openai/gpt-4o", "GPT-4o", "OpenAI"),
    (1, "anthropic/claude-sonnet", "Claude Sonnet", "Anthropic"),
    (2, "google/gemini-pro", "Gemini Pro", "Google"),
    (3, "meta-llama/llama-3", "Llama 3", "Meta"),
    (4, "mistralai/mistral-large", "Mistral Large", "Mistral"),
]


from openrouter_batch_processor_spark.operators.aggregates import (  # noqa: E402
    TREND_EPOCH0,
    linear_trend,
)


from openrouter_batch_processor_spark.operators.aggregates import (  # noqa: E402
    anomaly_zscore,
)

_Z_SQL = """(e.value::DOUBLE - sy::DOUBLE / n::DOUBLE)
             / sqrt((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    / (n::DOUBLE * (n::DOUBLE - 1)))"""


from openrouter_batch_processor_spark.operators.skew import (  # noqa: E402
    topk_per_group_agg,
)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ===========================================================================
# P1/P7 sentinels through the LLM map: empty groups and unsupported-only
# groups short-circuit to data rows, never reaching the transport
# ===========================================================================

from openrouter_batch_processor_spark.operators.llm import (  # noqa: E402
    EMPTY_FOLDER,
    UNSUPPORTED,
    LLMConfig,
    MockTransport,
    llm_map,
)


# ===========================================================================
# Scale-path near-dedup: IVF-bucketed within-cell pairs (the shape that
# replaces sim_neardup_pairs' cross join on a cluster)
# ===========================================================================

from openrouter_batch_processor_spark.operators.similarity import (  # noqa: E402
    neardup_pairs_bucketed,
)


_MULTIPROBE_ASG_SQL = """
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, e.v)
                                - 2 * list_dot_product(e.v, c.cvec)
                                + list_dot_product(c.cvec, c.cvec), 6), c.centroid_id) AS rn
        FROM e CROSS JOIN {cent} c) WHERE rn <= {nprobe}"""


from openrouter_batch_processor_spark.operators.similarity import (  # noqa: E402
    rp_candidate_pairs,
    rp_weights,
)


def _rp_sig_sql() -> str:
    cases = []
    for p, row in enumerate(rp_weights()):
        lit = "[" + ", ".join(repr(w) for w in row) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, 65), i -> ({lit})[i] * v[i]),"
            " (a, b) -> a + b)"
        )
        cases.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(cases)


from openrouter_batch_processor_spark.operators.kmeans import kmeans_lite  # noqa: E402


def _km_assign_sql(cent_cte: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, e.v)
                                - 2 * list_dot_product(e.v, c.c)
                                + list_dot_product(c.c, c.c), 6), c.cid) AS rn
        FROM e CROSS JOIN {cent_cte} c) WHERE rn = 1)"""


def _km_probe_sql(cent_cte: str, name: str, nprobe: int) -> str:
    """Multiprobe twin of _km_assign_sql: each point's `nprobe` nearest
    centroids (oracle side of kmeans.lloyd_multiprobe_staged)."""
    return f"""
    {name} AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, e.v)
                                - 2 * list_dot_product(e.v, c.c)
                                + list_dot_product(c.c, c.c), 6), c.cid) AS rn
        FROM e CROSS JOIN {cent_cte} c) WHERE rn <= {nprobe})"""


def _cell_knn_sql(k: int = 5, nprobe: int = 2) -> str:
    """CTE chain ending in `knn` (a_id, cluster_id, b_id, dist, rnk):
    the oracle twin of operators/neighbors.cell_knn_staged — the same
    2-iteration Lloyd assignment (seed = first 8 ids; the operator's
    corpus-size auto-dial resolves to 8 cells at every judged scale,
    which this pinned LIMIT 8 certifies), a MULTIPROBE
    b-side (each point indexed into its `nprobe` nearest c1 centroids,
    the IVF convention: single-probe measured ~28% recall@5 on this
    near-uniform synthetic corpus), then kNN over the within-cell
    candidates, distances rounded 6dp BEFORE ranking with b_id
    tiebreak so both engines rank identically."""
    return f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                 list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[]) AS nn
          FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS c
           FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
    {_km_assign_sql('c0', 'a1')},
    {_km_recompute_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_probe_sql('c1', 'p2', nprobe)},
    mm AS (SELECT a2.vec_id AS pid, a2.cluster_id, e.v, e.nn
           FROM a2 JOIN e ON e.vec_id = a2.vec_id),
    bb AS (SELECT p2.vec_id AS pid, p2.cluster_id, e.v, e.nn
           FROM p2 JOIN e ON e.vec_id = p2.vec_id),
    prs AS (SELECT a.pid AS a_id, a.cluster_id, b.pid AS b_id,
                   round(sqrt(greatest(
                       a.nn
                       - 2 * list_dot_product(a.v, b.v)
                       + b.nn, 0.0)), 6) AS dist
            FROM mm a JOIN bb b
              ON a.cluster_id = b.cluster_id AND a.pid != b.pid),
    knn AS MATERIALIZED (SELECT * FROM (
              SELECT prs.*, row_number() OVER (
                       PARTITION BY a_id ORDER BY dist, b_id) AS rnk
              FROM prs) WHERE rnk <= {k})"""


def _km_recompute_sql(assign_cte: str, name: str) -> str:
    return f"""
    {name}_m AS (
      SELECT a.cluster_id AS cid, u.pos,
             (sum(u.x::DECIMAL(38,12))::DOUBLE / count(*)) AS m
      FROM {assign_cte} a JOIN (
        SELECT vec_id,
               unnest(list_transform(range(1, 65),
                                     i -> struct_pack(pos := i, x := v[i]))) AS u
        FROM e) t ON t.vec_id = a.vec_id
      GROUP BY a.cluster_id, u.pos),
    {name} AS (SELECT cid, array_agg(m ORDER BY pos) AS c FROM {name}_m GROUP BY cid)"""


# ===========================================================================
# Sliding event-time windows + keep-first dedup policy
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import dedup_keep_first  # noqa: E402


# ===========================================================================
# As-of join, SimHash hamming candidate pairs, window ranking/lag,
# skew-safe exact distinct — extension operators round 2
# ===========================================================================

from openrouter_batch_processor_spark.operators.asof import (  # noqa: E402
    asof_join,
    latest_per_ts,
)
from openrouter_batch_processor_spark.operators.skew import (  # noqa: E402
    salted_distinct_count,
)


_SIMHASH_CTE = """
    t AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM t),
    cnts AS (SELECT doc_id, tok, count(*) AS cnt FROM toks WHERE tok != '' GROUP BY doc_id, tok),
    h AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM cnts),
    votes AS (
      SELECT doc_id, r.bit, sum(cnt * (((hv >> r.bit) & 1) * 2 - 1)) AS v
      FROM h CROSS JOIN range(0, 32) r(bit)
      GROUP BY doc_id, r.bit),
    sh AS (
      SELECT doc_id,
             sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS simhash
      FROM votes GROUP BY doc_id)
"""


# ===========================================================================
# Range join (banded), time-hierarchy rollup, KMV distinct sketch
# ===========================================================================

from openrouter_batch_processor_spark.operators.rangejoin import (  # noqa: E402
    banded_range_count,
)
from openrouter_batch_processor_spark.operators.sketches import kmv_distinct  # noqa: E402


from openrouter_batch_processor_spark.operators.sketches import (  # noqa: E402
    binned_quantiles,
)


# ===========================================================================
# Unigram-LM scoring, BM25 retrieval, PII redaction, Pearson correlation
# ===========================================================================

from openrouter_batch_processor_spark.operators.textanalysis import (  # noqa: E402
    bm25_topk,
    pii_redaction,
    unigram_nll,
)


BM25_QUERY = ["table", "scan", "window", "vector"]


# Synthetic-PII injection shared by both engines: 2 of every 3 docs get
# a deterministic email + phone appended, derived from doc_id.
_PII_TEXT_SQL = """
      CASE WHEN doc_id % 3 = 0 THEN text
           ELSE text || ' reach user' || doc_id::VARCHAR || '@mail'
                || (doc_id % 7)::VARCHAR || '.example.com or 555-'
                || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
                || lpad((doc_id % 10000)::VARCHAR, 4, '0')
      END"""


from openrouter_batch_processor_spark.operators.aggregates import (  # noqa: E402
    pearson_corr,
)


# ===========================================================================
# Product-analytics shapes: ordered funnel + weekly retention cohorts
# ===========================================================================

from openrouter_batch_processor_spark.operators.timeseries import (  # noqa: E402
    funnel_counts,
    retention_cohorts,
)


# ===========================================================================
# ANN quality audit: recall@k of the IVF path vs exact brute force
# ===========================================================================

from openrouter_batch_processor_spark.operators.similarity import ann_recall  # noqa: E402


# ===========================================================================
# Prefix-filter similarity join, event-type lift, session path analysis
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import prefix_filter_pairs  # noqa: E402
from openrouter_batch_processor_spark.operators.windows import session_paths  # noqa: E402


# ===========================================================================
# PageRank-lite over the near-duplicate graph (iterative numeric op)
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import pagerank_lite  # noqa: E402


# ===========================================================================
# Triangle participation over the near-duplicate graph
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import (  # noqa: E402
    triangle_participation,
)


# ===========================================================================
# HLL distinct sketch (mergeable O(1) registers, engine-reproducible)
# ===========================================================================

from openrouter_batch_processor_spark.operators.sketches import (  # noqa: E402
    hll_distinct,
)


# ===========================================================================
# Containment / overlap-coefficient near-dup (asymmetric Jaccard)
# ===========================================================================

from openrouter_batch_processor_spark.operators.dedup import containment_pairs  # noqa: E402


# ===========================================================================
# Daily peak session concurrency (interval sweep, distributed prefix sum)
# ===========================================================================

from openrouter_batch_processor_spark.operators.windows import peak_concurrency  # noqa: E402


# ===========================================================================
# Linear multi-touch attribution (conversion value split over touches)
# ===========================================================================

from openrouter_batch_processor_spark.operators.timeseries import linear_attribution  # noqa: E402


# Shared DSIR oracle fragment: ends in the CTE `dsirw(doc_id, lang,
# n_tokens, log_weight)` — text_dsir_weights reads it out verbatim,
# curation_dsir_select resamples from it.
_DSIR_LW_SQL = f"""
    toks AS (SELECT doc_id, lang, unnest(string_split({_NORM_SQL}, ' ')) AS term
             FROM documents),
    tk AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(term), 1, 8))::BIGINT % 512 AS bucket
           FROM toks WHERE term != ''),
    cb AS (SELECT bucket, count(*)::BIGINT AS cb FROM tk GROUP BY 1),
    tb AS (SELECT bucket, count(*)::BIGINT AS ct FROM tk WHERE lang = 'en' GROUP BY 1),
    tot AS (SELECT (SELECT sum(cb) FROM cb)::DOUBLE AS tc,
                   (SELECT coalesce(sum(ct), 0) FROM tb)::DOUBLE AS tt),
    lr AS (SELECT c.bucket,
                  round(ln((coalesce(t.ct, 0) + 1) / (tot.tt + 512))
                        - ln((c.cb + 1) / (tot.tc + 512)), 6) AS lr
           FROM cb c LEFT JOIN tb t USING (bucket) CROSS JOIN tot),
    dfb AS (SELECT doc_id, bucket, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
    sc AS (SELECT d.doc_id, d.tf, round(d.tf * l.lr, 6)::DECIMAL(18,6) AS contrib
           FROM dfb d JOIN lr l USING (bucket)),
    dsirw AS (SELECT s.doc_id, any_value(dd.lang) AS lang,
                     sum(s.tf)::BIGINT AS n_tokens,
                     round(sum(s.contrib)::DOUBLE, 6) AS log_weight
              FROM sc s JOIN documents dd ON dd.doc_id = s.doc_id
              GROUP BY s.doc_id)
"""


# Shared CTE chain for the winnowing queries (Schleimer et al. 2003):
# k=4-gram hashes, w=4 window, robust rightmost-min tie-break encoded
# as min(h*2^20 + (2^20-1-pos)).
_WINNOW_SQL = f"""
    tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
    el AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 7),
    g AS (SELECT doc_id, u.i AS pos,
                 ('0x' || substr(md5(array_to_string(toks[u.i+1:u.i+4], ' ')),
                                 1, 8))::BIGINT AS h,
                 least(len(toks) - 4, 1048575) + 1 AS n_grams
          FROM el, unnest(range(0, least(len(toks) - 4, 1048575) + 1)) AS u(i)),
    s AS (SELECT doc_id, pos, n_grams,
                 min(h * 1048576 + (1048575 - pos))
                     OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel_key
          FROM g),
    sel AS (SELECT DISTINCT doc_id,
                   (1048575 - (sel_key % 1048576))::BIGINT AS pos,
                   (sel_key // 1048576)::BIGINT AS fp
            FROM s WHERE pos <= n_grams - 4)
"""


def _power_prelude_sql() -> str:
    """Shared centered-long-table CTEs for every power-iteration
    oracle. d is MATERIALIZED: the chains reference it 2x per
    iteration and DuckDB inlines plain CTEs."""
    return """d0 AS (SELECT e.vec_id, o.dim, (e.embedding::DOUBLE[])[o.dim + 1] AS x
           FROM embeddings e
           CROSS JOIN (SELECT unnest(range(64))::INTEGER AS dim) o),
    m AS (SELECT dim, round(sum(x::DECIMAL(28,10))::DOUBLE / count(*), 9) AS mean_val
          FROM d0 GROUP BY dim),
    d AS MATERIALIZED (SELECT vec_id, d0.dim, x - mean_val AS xc
         FROM d0 JOIN m USING (dim)),
    v0 AS (SELECT dim, 0.125::DOUBLE AS v FROM m)"""


def _power_chain_sql(src: str, sfx: str, iters: int) -> str:
    """Unrolled power-iteration CTE chain over centered long table
    ``src`` (vec_id, dim, xc), CTE names suffixed ``sfx``: v0 = 1/8
    (all-ones normalized for D=64), each iteration z = X·v, y = X^T·z,
    v = y/||y|| with round-then-DECIMAL cross-row sums so the
    trajectory is order-independent on both engines."""
    ctes = []
    for t in range(1, iters + 1):
        prev = "v0" if t == 1 else f"v{sfx}{t-1}"
        ctes.append(
            f"""z{sfx}{t} AS (SELECT vec_id, sum(round(xc * v, 9)::DECIMAL(28,9))::DOUBLE AS z
           FROM {src} JOIN {prev} USING (dim) GROUP BY vec_id),
    y{sfx}{t} AS (SELECT dim, sum(round(xc * z, 9)::DECIMAL(38,9))::DOUBLE AS y
           FROM {src} JOIN z{sfx}{t} USING (vec_id) GROUP BY dim),
    n{sfx}{t} AS (SELECT sqrt(sum(round(y * y, 9)::DECIMAL(38,9))::DOUBLE) AS nrm
           FROM y{sfx}{t}),
    v{sfx}{t} AS (SELECT dim, round(y / nrm, 9) AS v
           FROM y{sfx}{t} CROSS JOIN n{sfx}{t})"""
        )
    return ",\n    ".join(ctes)


def _power_sql(iters: int) -> str:
    return _power_prelude_sql() + ",\n    " + _power_chain_sql("d", "", iters)


def _jm_em_sql(iters: int) -> str:
    """Unrolled Jelinek-Mercer EM rounds: λ as a 1-row CTE per round."""
    parts = ["l0 AS (SELECT 0.5::DOUBLE AS lam)"]
    for t in range(1, iters + 1):
        parts.append(
            f"""s{t} AS (SELECT sum(tf)::BIGINT AS n_bigrams,
               sum(round(tf * (lam * pb / (lam * pb + (1 - lam) * pu)),
                         9)::DECIMAL(28,9))::DOUBLE AS s
         FROM j CROSS JOIN l{t-1}),
    l{t} AS (SELECT round(s / n_bigrams, 9) AS lam, n_bigrams FROM s{t})"""
        )
    return ",\n    ".join(parts)


def _kcore_sql(rounds: int, k: int) -> str:
    """Unrolled k-core peel CTEs over the LSH candidate graph (needs
    the `bands` CTE from _SHINGLES_SQL in scope)."""
    # every round CTE is MATERIALIZED: DuckDB inlines plain CTEs, so
    # an unrolled peel would re-derive the whole shingle/band chain
    # O(3^rounds) times without it
    ctes = [
        """cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    e0 AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM cand
           UNION ALL SELECT id_b AS src, id_a AS dst FROM cand)"""
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""k{t} AS MATERIALIZED (SELECT src FROM e{t-1}
           GROUP BY src HAVING count(*) >= {k}),
    e{t} AS MATERIALIZED (SELECT e.src, e.dst FROM e{t-1} e
           JOIN k{t} a ON a.src = e.src JOIN k{t} b ON b.src = e.dst)"""
        )
    return ",\n    ".join(ctes)


_MK_Z_SQL = """CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                    ELSE 0.0 END"""


# ===========================================================================
# Round-4 second wave: time-series analytics (ACF, classical seasonal
# decomposition, MAD-robust anomalies)
# ===========================================================================

_ACF_ARMS = "\n    UNION ALL\n".join(
    f"""
    SELECT event_type, {k}::BIGINT AS lag_k, n::BIGINT AS n,
           round(((n*n*sxy{k} - n*s*(s1_{k}+s2_{k}) + (n-{k})*s*s)::DOUBLE)
                 / ((n*(n*q - s*s))::DOUBLE), 6) AS acf
    FROM f"""
    for k in range(1, 7)
)

_ACF_LAG_COLS = ",\n".join(
    f"""           sum(x*xl{k})::HUGEINT AS sxy{k},
           sum(CASE WHEN xl{k} IS NOT NULL THEN x END)::HUGEINT AS s2_{k},
           sum(xl{k})::HUGEINT AS s1_{k}"""
    for k in range(1, 7)
)


def _pacf_sql(max_lag: int = 5) -> str:
    """Durbin-Levinson CTE chain over the pivoted ACF values (needs the
    `f` CTE from the events_acf oracle in scope). Expressions are
    generated LEFT-ASSOCIATIVELY — ((r3 - p21*r2) - p22*r1) — to match
    the Spark loop's accumulation order term for term, so both engines
    run the identical IEEE operation sequence."""
    arms = "\n    UNION ALL\n".join(
        f"""
    SELECT event_type, {k}::BIGINT AS lag_k, n::BIGINT AS n,
           round((((n*n*sxy{k} - n*s*(s1_{k}+s2_{k}) + (n-{k})*s*s)::DOUBLE)
                 / ((n*(n*q - s*s))::DOUBLE)), 6) AS acf
    FROM f"""
        for k in range(1, max_lag + 1)
    )
    rcols = ",\n           ".join(
        f"max(CASE WHEN lag_k = {k} THEN acf END) AS r{k}"
        for k in range(1, max_lag + 1)
    )
    ctes = [
        f"acfv AS ({arms})",
        f"piv AS (SELECT event_type, max(n) AS n,\n           {rcols}\n    FROM acfv GROUP BY 1)",
        "s1 AS (SELECT *, r1 AS p11 FROM piv)",
    ]
    prev = "s1"
    step = 1
    for k in range(2, max_lag + 1):
        num = f"r{k}"
        den = "1.0"
        for j in range(1, k):
            num = f"({num} - p{k-1}{j}*r{k-j})"
            den = f"({den} - p{k-1}{j}*r{j})"
        step += 1
        ctes.append(f"s{step} AS (SELECT *, {num} / {den} AS p{k}{k} FROM {prev})")
        prev = f"s{step}"
        if k < max_lag:
            cols = ", ".join(
                f"p{k-1}{j} - p{k}{k}*p{k-1}{k-j} AS p{k}{j}" for j in range(1, k)
            )
            step += 1
            ctes.append(f"s{step} AS (SELECT *, {cols} FROM {prev})")
            prev = f"s{step}"
    out_arms = "\n    UNION ALL\n".join(
        f"SELECT event_type, {k}::BIGINT AS lag_k, n::BIGINT AS n, round(p{k}{k}, 6) AS pacf FROM {prev}"
        for k in range(1, max_lag + 1)
    )
    return ",\n    ".join(ctes) + f"\n    {out_arms}"


def _bpe_ctes(rounds: int, last_w: bool) -> list[str]:
    """Shared unrolled-BPE CTE chain: per round, adjacent-pair counts
    over the delimited symbol strings, top-1 with lexicographic
    tiebreak, greedy replace. Round CTEs are MATERIALIZED — DuckDB
    inlines plain CTEs and each w{r} references w{r-1} once per pair
    column, so the chain would otherwise re-derive the whole corpus
    vocabulary O(3^rounds) times (the k-core lesson). ``last_w``
    materializes w{rounds} too (the compression curve reads it; the
    merge list doesn't need it)."""
    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT tok, count(*)::BIGINT AS freq,
             '|' || array_to_string(string_split(tok, ''), '||') || '|' AS s
      FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents)
      GROUP BY 1)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""pairs{r} AS (
      SELECT freq, syms[i] AS a, syms[i + 1] AS b
      FROM (SELECT freq, string_split(trim(s, '|'), '||') AS syms FROM w{r - 1}),
           unnest(range(1, len(syms))) AS t(i))"""
        )
        ctes.append(
            f"""best{r} AS MATERIALIZED (
      SELECT {r}::BIGINT AS merge_rank, a, b, sum(freq)::BIGINT AS cnt
      FROM pairs{r} GROUP BY 2, 3 ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        if r < rounds or last_w:
            ctes.append(
                f"""w{r} AS MATERIALIZED (
      SELECT tok, freq,
             replace(s, '|' || best{r}.a || '||' || best{r}.b || '|',
                     '|' || best{r}.a || best{r}.b || '|') AS s
      FROM w{r - 1}, best{r})"""
            )
    return ctes


def _bpe_sql(rounds: int = 4) -> str:
    union = " UNION ALL ".join(
        f"SELECT * FROM best{r}" for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(_bpe_ctes(rounds, last_w=False))
        + f"""
    SELECT merge_rank, a AS sym_a, b AS sym_b, cnt AS pair_count
    FROM ({union})"""
    )


def _bpe_compression_sql(rounds: int = 4) -> str:
    per_round = " UNION ALL ".join(
        f"""SELECT {r}::BIGINT AS round,
               sum(freq * ((length(s) - length(replace(s, '|', ''))) // 2))::BIGINT
                 AS total_symbols
        FROM w{r}"""
        for r in range(rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(_bpe_ctes(rounds, last_w=True))
        + f""",
    stats AS ({per_round}),
    base AS (SELECT total_symbols AS chars FROM stats WHERE round = 0)
    SELECT round, total_symbols,
           round(chars::DOUBLE / total_symbols, 6) AS compression_ratio
    FROM stats, base"""
    )


def _logreg_ctes(steps: int = 6, with_ids: bool = False) -> list[str]:
    """Unrolled full-batch logistic-GD oracle: per step one sigmoid
    scan + decimal-summed gradient + 9-dp weight update. Step CTEs
    MATERIALIZED (each wt{t} is referenced 4x by wt{t+1}'s columns —
    plain CTEs would re-derive the chain exponentially). ``with_ids``
    carries (doc_id, lang) through feats for per-doc scoring
    consumers."""
    idc = "doc_id, lang, " if with_ids else ""
    ctes = [
        f"""feats AS MATERIALIZED (
      SELECT {idc}CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             1.0 AS x0,
             len(toks)::DOUBLE / 100.0 AS x1,
             len(list_filter(toks, t -> t IN ('a', 'the')))::DOUBLE
               / len(toks)::DOUBLE AS x2,
             list_sum(list_transform(toks, t -> length(t)))::DOUBLE
               / len(toks)::DOUBLE / 10.0 AS x3
      FROM (SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
            FROM documents))""",
        "wt0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3)",
    ]
    for t in range(1, steps + 1):
        grads = ", ".join(
            f"sum(round((p - y) * x{k}, 9)::DECIMAL(28,9)) AS g{k}"
            for k in range(4)
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
      SELECT {grads}, count(*)::DOUBLE AS n
      FROM (SELECT y, x0, x1, x2, x3,
                   1.0 / (1.0 + exp(-round(x0 * a0 + x1 * a1 + x2 * a2
                                           + x3 * a3, 9))) AS p
            FROM feats, wt{t - 1}))"""
        )
        ws = ", ".join(
            f"round(a{k} - 1.0 * g{k}::DOUBLE / n, 9) AS a{k}" for k in range(4)
        )
        ctes.append(
            f"wt{t} AS MATERIALIZED (SELECT {ws} FROM wt{t - 1}, s{t})"
        )
    return ctes


def _logreg_sql(steps: int = 6) -> str:
    union = " UNION ALL ".join(
        f"SELECT 'x{k}' AS feature, a{k} AS weight FROM wt{steps}"
        for k in range(4)
    )
    return "WITH " + ",\n    ".join(_logreg_ctes(steps)) + f"\n    {union}"


def _logreg_difficulty_sql(steps: int = 6, topk: int = 25) -> str:
    return (
        "WITH "
        + ",\n    ".join(_logreg_ctes(steps, with_ids=True))
        + f""",
    scored AS (
      SELECT doc_id, lang, y,
             round(1.0 / (1.0 + exp(-round(x0 * a0 + x1 * a1 + x2 * a2
                                           + x3 * a3, 9))), 9) AS p
      FROM feats, wt{steps})
    SELECT doc_id, lang, y, p, round(abs(p - y), 9) AS difficulty
    FROM scored ORDER BY round(abs(p - y), 9) DESC, doc_id LIMIT {topk}"""
    )


def _pq_train_sql(iters: int = 2, m_sub: int = 4, sub_dim: int = 16,
                  n_codes: int = 8) -> str:
    """Unrolled joint per-subspace Lloyd oracle for PQ codebook
    training — the kmeans_lite recipe with the subspace id riding
    every group key. Round CTEs MATERIALIZED (k-core lesson)."""

    def assign(cb: str, name: str) -> str:
        d2 = (f"round(list_dot_product(s.sub, s.sub)"
              f" - 2 * list_dot_product(s.sub, c.cw)"
              f" + list_dot_product(c.cw, c.cw), 6)")
        return f"""{name} AS MATERIALIZED (
      SELECT vec_id, m, cid, d2 FROM (
        SELECT s.vec_id, s.m, c.cid, {d2} AS d2,
               row_number() OVER (PARTITION BY s.m, s.vec_id
                                  ORDER BY {d2}, c.cid) AS rn
        FROM subs s JOIN {cb} c ON c.m = s.m) WHERE rn = 1)"""

    def recompute(a: str, name: str) -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT m, cid, array_agg(mu ORDER BY pos) AS cw FROM (
        SELECT a.m, a.cid, u.pos,
               sum(u.x::DECIMAL(38,12))::DOUBLE / count(*) AS mu
        FROM {a} a JOIN (
          SELECT vec_id, m,
                 unnest(list_transform(range(1, {sub_dim + 1}),
                                       i -> struct_pack(pos := i,
                                                        x := sub[i]))) AS u
          FROM subs) t ON t.vec_id = a.vec_id AND t.m = a.m
        GROUP BY 1, 2, 3) GROUP BY 1, 2)"""

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""subs AS MATERIALIZED (
      SELECT vec_id, mm.m,
             list_slice(v, mm.m * {sub_dim} + 1,
                        mm.m * {sub_dim} + {sub_dim}) AS sub
      FROM e, (SELECT unnest(range({m_sub})) AS m) mm)""",
        f"""cb0 AS (
      SELECT mm.m, s.cid,
             list_slice(s.v, mm.m * {sub_dim} + 1,
                        mm.m * {sub_dim} + {sub_dim}) AS cw
      FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_codes})) s,
           (SELECT unnest(range({m_sub})) AS m) mm)""",
    ]
    for r in range(1, iters + 1):
        ctes.append(assign(f"cb{r - 1}", f"a{r}"))
        ctes.append(recompute(f"a{r}", f"cb{r}"))
    ctes.append(assign(f"cb{iters}", "af"))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT m, cid, count(*)::BIGINT AS n_members,
           round(sum(d2::DECIMAL(18,6))::DOUBLE / count(*), 6) AS mse
    FROM af GROUP BY 1, 2"""
    )


def _jl_proj_sql() -> str:
    """The 16 JL projection components as literal-weight folds —
    identical fold order to Spark's aggregate(zip_with(...)) (the
    rp_signatures parity precedent)."""
    comps = []
    for row in rp_weights():
        lit = "[" + ", ".join(repr(w) for w in row) + "]"
        comps.append(
            f"list_reduce(list_transform(range(1, 65), i -> ({lit})[i] * v[i]),"
            " (a, b) -> a + b)"
        )
    return "[" + ", ".join(comps) + "]"


def _bpe_encode_ctes(rounds: int = 4) -> list[str]:
    """_bpe_ctes chain + the encoded-vocab table (enc) and the per-doc
    word stream (wrd) — shared by the encode / fertility / BPE-packing
    oracles. enc is MATERIALIZED (joined by every consumer CTE)."""
    return _bpe_ctes(rounds, last_w=True) + [
        f"""enc AS MATERIALIZED (
      SELECT tok,
             replace(trim(s, '|'), '||', '+') AS wenc,
             ((length(s) - length(replace(s, '|', ''))) // 2)::BIGINT AS n_syms
      FROM w{rounds})""",
        f"""wrd AS (
      SELECT doc_id, lang, i AS pos, toks[i] AS tok
      FROM (SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
            FROM documents),
           unnest(range(1, len(toks) + 1)) AS t(i))""",
    ]


__all__ = [
    "annotations",
    "os",
    "Callable",
    "DataFrame",
    "SparkSession",
    "F",
    "REGISTRY",
    "QuerySpec",
    "register",
    "_t",
    "PIPELINE_ORACLE_SQL",
    "run_llm_pipeline",
    "file_extension",
    "human_file_size",
    "derive_status",
    "route_label",
    "format_timedelta",
    "parse_timedelta",
    "ts_format",
    "renumber",
    "usage_summary",
    "exact_duplicates",
    "normalize_formats",
    "fingerprints",
    "heavy_hitters",
    "language_id",
    "quality_scores",
    "tfidf_topk",
    "token_stats",
    "_NORM_SQL",
    "_quality_sql",
    "_CC_SQL",
    "chunk_documents",
    "pack_documents",
    "ewma_last",
    "transition_counts",
    "_TOKS_N_SQL",
    "_span_sql",
    "_TF_SQL",
    "duplicate_clusters",
    "lsh_bands",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "MINHASH_A",
    "MINHASH_B",
    "_MH_COLS",
    "_shingles_sql",
    "_SHINGLES_SQL",
    "ivf_topk",
    "neardup_pairs_bruteforce",
    "topk_bruteforce",
    "_COS_SQL",
    "_query_vec",
    "neardup_pairsbf",
    "sessionize",
    "tumbling_counts",
    "data_url",
    "output_filename",
    "storage_name",
    "append_footer",
    "json_repair_parse",
    "MODEL_CATALOG",
    "TREND_EPOCH0",
    "linear_trend",
    "anomaly_zscore",
    "_Z_SQL",
    "topk_per_group_agg",
    "EVENT_TYPES",
    "EMPTY_FOLDER",
    "UNSUPPORTED",
    "LLMConfig",
    "MockTransport",
    "llm_map",
    "neardup_pairs_bucketed",
    "_MULTIPROBE_ASG_SQL",
    "rp_candidate_pairs",
    "rp_weights",
    "_rp_sig_sql",
    "kmeans_lite",
    "_km_assign_sql",
    "_km_recompute_sql",
    "_km_probe_sql",
    "_cell_knn_sql",
    "dedup_keep_first",
    "asof_join",
    "latest_per_ts",
    "salted_distinct_count",
    "_SIMHASH_CTE",
    "banded_range_count",
    "kmv_distinct",
    "binned_quantiles",
    "bm25_topk",
    "pii_redaction",
    "unigram_nll",
    "BM25_QUERY",
    "_PII_TEXT_SQL",
    "pearson_corr",
    "funnel_counts",
    "retention_cohorts",
    "ann_recall",
    "prefix_filter_pairs",
    "session_paths",
    "pagerank_lite",
    "triangle_participation",
    "hll_distinct",
    "containment_pairs",
    "peak_concurrency",
    "linear_attribution",
    "_DSIR_LW_SQL",
    "_WINNOW_SQL",
    "_power_prelude_sql",
    "_power_chain_sql",
    "_power_sql",
    "_jm_em_sql",
    "_kcore_sql",
    "_MK_Z_SQL",
    "_ACF_ARMS",
    "_ACF_LAG_COLS",
    "_pacf_sql",
    "_bpe_ctes",
    "_bpe_sql",
    "_bpe_compression_sql",
    "_logreg_ctes",
    "_logreg_sql",
    "_logreg_difficulty_sql",
    "_pq_train_sql",
    "_jl_proj_sql",
    "_bpe_encode_ctes",
]
