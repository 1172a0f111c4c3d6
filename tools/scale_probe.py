"""10x scale probe (VERDICT r04 item 7): run the dedup / similarity /
substring-dedup headline family at sf0.1 and at a synthesized 10x
corpus, and record per-row cost so the staging/skew story is validated
empirically, not just by plan audit.

The 10x corpus is 10 re-keyed copies of the sf0.1 documents (doc_id
offset per copy, one copy-tag token appended to the text so duplicate
SELECTIVITY stays constant while volume grows 10x — replicating text
verbatim would explode the duplicate rate and measure a different
workload) and 10 re-keyed copies of the embeddings. All other tables
are symlinked from sf0.1. Each query runs twice per scale; the WARM
run is reported (same convention as bench.py).

Usage: python tools/scale_probe.py [--fresh] [query ...]
Appends/updates the '## 10x scale probe' section in SCALE.md.

--x100 (VERDICT r07 #6) probes the candidate-pair stages whose 10x
growth exceeded linear (dedup_simhash_pairs 6.6x, sim_rp_lsh_pairs
4.4x) at 100x rows (500k docs / 200k vectors, same constant-selectivity
re-keyed-copy construction), with dedup_minhash_bands as the linear
control, and appends a '## 100x scale probe' section.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/scale_probe_10x"

# --fresh drops the per-cell-MIN floor parsed out of SCALE.md so a
# regression (or a box change) becomes visible instead of being hidden
# behind a stale faster number forever (ADVICE r10). r13: in --only
# mode the reset applies ONLY to the rows probed this invocation —
# previously a subset --fresh run silently deleted every other row's
# accumulated floor from the table.
FRESH = "--fresh" in sys.argv


def _floor_stamp() -> str:
    """One line recording which commit the burst floor is valid for."""
    import subprocess

    try:
        h = subprocess.run(
            ["git", "log", "-1", "--format=%h %cs"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        h = "unknown"
    mode = "RESET by --fresh at" if FRESH else "accumulated through"
    return (
        f"Floor {mode} commit {h}; rerun with --fresh after the code"
        " under measurement changes."
    )
COPIES = 10

QUERIES = [
    "dedup_minhash_bands",
    "dedup_minhash_jaccard",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_prefix_filter_pairs",
    "curation_dup_span_discovery",
    "sim_ivf_topk",
    "sim_rp_lsh_pairs",
    # r06 families
    "text_winnow_stats",
    "dedup_winnow_pairs",
    "graph_kcore_peel",
    "emb_top_pc_power",
    "text_kneser_ney",
    # r07 families
    "streaming_winnow_decontaminate",
    "text_bpe_merges",
    "curation_quality_logreg",
    "audit_lsh_s_curve",
    "curation_softdedup_weights",
    "sim_pq_train",
    # r09 families — the new bucketed pair stages + a span-bounded control
    "multimodal_audio_fingerprint",
    "multimodal_phash_clusters",
    "sim_sq8_search",
    "curation_decontamination_report",
    "events_periodogram",
    # r10: the re-planned greedy max-coverage (VERDICT r09 #1) — per-doc
    # array layout, k map-only argmax rounds; expected ~linear
    "sample_max_coverage",
    # r10 frontier families. retsim runs with the bucket_cap dial at
    # both scales (the banded-pair convention: sign patterns of common
    # trigram buckets cluster, so the uncapped 16-bit bands go
    # superlinear exactly like simhash's 8-bit ones; the cap prunes
    # saturated boilerplate buckets, volume <= n*cap)
    "dedup_retsim_pairs_cap2k",
    # the band-width dial (4x16-bit -> 2x32-bit keys): correlated sign
    # patterns saturate 16-bit buckets at 10x rows (the cap2k row
    # measures that regime); 32-bit keys collide only on real
    # near-dups, the `_wide16` finding one level up
    "dedup_retsim_pairs_wide32",
    # r11: the corpus-size auto-dial end-to-end — 4 bands at sf0.1,
    # 2 bands at 10x; this row is the VERDICT r10 #1 acceptance check
    "dedup_retsim_pairs_auto",
    "curation_crossdoc_suffix",
    # cka: O(n * d^2/2) upper-triangle covariance — expected ~linear
    "audit_cka_split",
    # dist-n: two combiner groupBys — the linear control for text ops
    "text_distinct_ngrams",
    # scene cuts: mapInPandas expansion + colocated lag window
    "multimodal_scene_cuts",
    # r11 kNN-geometry family: the cell-local pair+rank build measured
    # through the UNSTAGED builder (the staged wrapper's warm run is a
    # memo hit). Pinned 8 cells shows the expected |cell|^2 growth
    # (100x pair volume at 10x rows); the cells-dial row scales the
    # cell count with the corpus (8 -> 80), which is the production
    # contract ("|cell| ~constant"), and should restore ~linear wall
    "emb_cell_knn_c8",
    "emb_cell_knn_cdial",
    # r12: the REGISTERED query path (cells=None -> _auto_cells,
    # VERDICT r11 #1) — the dial now lives in the operator default, so
    # this row is the acceptance check that a user calling
    # cell_knn_staged with defaults gets the ~linear regime, count
    # included (expected ≈ the cdial row + one metadata count)
    "emb_cell_knn",
    # knn shapley: |Q| x n_train scored rows — the test split is
    # vec_id%10 so BOTH sides grow 10x here (100x scored rows); the
    # production contract is a FIXED test set, measured by the _q200
    # row (test side pinned to ~200 rows at every scale, so growth
    # tracks n_train only)
    "sample_knn_shapley",
    "sample_knn_shapley_q200",
    # r12 (VERDICT r11 #2): the two brute-force truth audits AS
    # REGISTERED, with the corpus-size-aware sample modulus
    # (~200-query truth side at any scale) — staging cleared per
    # invocation so the row measures the full rebuild, not the memo
    "audit_cell_knn_recall",
    "audit_knn_probe_frontier",
]

N_BASE = {"documents": None, "embeddings": None}  # filled at runtime

# Rows whose probe fn clears the staging memo per invocation (so a
# count would pay the FULL multi-minute rebuild again at 100x) and
# whose output is a fixed-size report anyway — wall growth there is
# never output-volume, so the attribution column adds nothing.
NO_OUT_COUNT = {
    "audit_cell_knn_recall",
    "audit_knn_probe_frontier",
    "sample_knn_shapley",
    "sample_knn_shapley_q200",
}

PROBE_DIR_100 = "/tmp/scale_probe_100x"
# The 10x probe's superlinear tail + the linear control; jaccard and
# kcore are the verdict-named companions (candidate-pair consumers).
# The two banded-LSH pair stages run with the bucket_cap dial — the
# UNCAPPED defaults are Θ(n²/2^band_bits) once 8-bit buckets saturate
# and measurably filled this box's disk at 500k docs (the first --x100
# attempt); the probe's purpose is to show the dial restores
# near-linear growth, so it measures the capped operator at ALL three
# scales (apples-to-apples).
QUERIES_100X = [
    "dedup_minhash_bands",
    "dedup_minhash_jaccard",
    "dedup_simhash_pairs_cap2k",
    "sim_rp_lsh_pairs_cap2k",
    "sim_rp_lsh_pairs_wide16",
    # r13: the REGISTERED query path (planes=None -> _rp_auto_planes,
    # VERDICT r12 #2) — 16 planes at sf0.1, 32 planes (16-bit bands) at
    # 10x/100x, exact-cosine verify included; the acceptance row that a
    # default caller gets the wide regime past the knee
    "sim_rp_lsh_pairs",
    "graph_kcore_peel",
    # r09 pair families (VERDICT r09 #4): the banded tile-pHash pair
    # stage as registered; the audio landmark join at the default 256
    # energy modulus AND at the widened 4096 dial (key space x256 —
    # the parameterized knob on audio_fingerprint_pairs); SQ8 search
    # with a CONSTANT ~20-query set per scale (the registered query's
    # vec_id % 100 filter grows the query count with n, which measures
    # query volume, not the per-query scan the dial table predicts).
    "multimodal_tile_phash_pairs",
    "multimodal_audio_fingerprint",
    "multimodal_audio_fp_wide4096",
    "sim_sq8_search_q20",
    # r10 pair family: the RETSim-style banded trigram-feature stage,
    # measured through the unstaged builder at the PRODUCTION dial
    # (n_bands=2, 32-bit keys): the 10x probe showed 16-bit bands
    # superlinear even capped (17.9x wall at 10x rows), so the wide
    # setting is the only one that can survive 500k docs
    "dedup_retsim_pairs_wide32",
    # r11: the corpus-size auto-dial end-to-end at all three scales —
    # resolves 4 bands at sf0.1 and 2 bands at 10x AND 100x (both past
    # RETSIM_AUTO_THRESHOLD), so the growth columns measure the dial
    # actually flipping plus the plan-build count's cost
    "dedup_retsim_pairs_auto",
    # r12: the registered cell-kNN path with the cells auto-dial at all
    # three scales (8 -> 80 -> 800 cells). The PAIR stage stays linear
    # by construction (|cell| ~constant); what this row prices at 200k
    # vectors is the FLAT Lloyd assignment, whose broadcast argmin is
    # O(n * cells) = O(n^2/250) once cells track the corpus — the
    # documented regime boundary where a production deployment swaps
    # the flat coarse quantizer for a hierarchical one (the IVF
    # convention; see SCALE.md prose)
    "emb_cell_knn",
    # r12: the fixed-count truth audit at 100x — |Q| pinned ~200, so
    # the brute-force side is 200 x n, linear in the corpus
    "audit_cell_knn_recall",
]


def _capped_fns() -> dict:
    from openrouter_batch_processor_spark.operators.dedup import (
        simhash_near_pairs,
    )
    from openrouter_batch_processor_spark.operators.similarity import (
        rp_candidate_set,
    )
    from openrouter_batch_processor_spark.session import load_table

    def simhash_capped(spark, sf_dir):
        return simhash_near_pairs(
            load_table(spark, sf_dir, "documents"), bucket_cap=2048
        )

    def rp_capped(spark, sf_dir):
        # candidate set only (the saturating stage), PINNED to the
        # 8-bit-band regime at all scales (planes=16 explicit — the
        # r13 auto-dial would resolve wide past 20k vectors, and this
        # row exists to measure the narrow regime's saturation)
        return rp_candidate_set(
            load_table(spark, sf_dir, "embeddings"), planes=16, bucket_cap=2048
        )

    def rp_wide(spark, sf_dir):
        # the BAND-WIDTH dial: 32 planes in 2 bands = 16-bit keys
        # (65536 buckets/band) — expected bucket size n/65536, so the
        # self-join stays linear where 8-bit keys go quadratic
        return rp_candidate_set(
            load_table(spark, sf_dir, "embeddings"), planes=32, bands=2
        )

    from pyspark.sql import functions as F

    from openrouter_batch_processor_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )
    from openrouter_batch_processor_spark.operators.similarity import (
        sq8_search_recall,
    )

    def _audio_files(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            F.concat(
                F.lit("aud/doc_"), F.col("doc_id").cast("string"), F.lit(".wav")
            ).alias("rel_path"),
            F.encode(F.col("text"), "UTF-8").alias("content"),
            F.length(F.col("text")).cast("long").alias("length"),
        )

    def audio_wide(spark, sf_dir):
        # the energy-moduli widen dial: 256 -> 4096 multiplies the
        # landmark key space by 256x, collapsing false-collision
        # candidate volume (true duplicate matches are unaffected —
        # duplicates share the key at ANY modulus)
        return audio_fingerprint_pairs(_audio_files(spark, sf_dir), key_mod=4096)

    # constant ~20 queries at every scale: sf0.1 embeddings is 2k rows
    _SQ8_MOD = {BASE: 100, PROBE_DIR: 1_000, PROBE_DIR_100: 10_000}

    def sq8_q20(spark, sf_dir):
        return sq8_search_recall(
            load_table(spark, sf_dir, "embeddings"),
            query_mod=_SQ8_MOD.get(sf_dir, 100),
        )

    from pyspark.sql import functions as FF

    from openrouter_batch_processor_spark.operators.dedup import (
        _retsim_scores,
    )

    def retsim_capped(spark, sf_dir):
        # the UNDERLYING score builder, not the staged wrapper: the
        # registered query's warm run is a memo hit (~0.1 s at any
        # scale), which measures the staging cache, not the operator
        scores = _retsim_scores(
            load_table(spark, sf_dir, "documents"),
            n_bands=4,
            bucket_cap=2048,
            id_col="doc_id",
            text_col="text",
        )
        return scores.filter(FF.col("cosine") >= 0.8)

    def retsim_wide(spark, sf_dir):
        scores = _retsim_scores(
            load_table(spark, sf_dir, "documents"),
            n_bands=2,
            bucket_cap=2048,
            id_col="doc_id",
            text_col="text",
        )
        return scores.filter(FF.col("cosine") >= 0.8)

    from openrouter_batch_processor_spark.operators.dedup import (
        _retsim_auto_bands,
    )

    def retsim_auto(spark, sf_dir):
        # the r11 corpus-size auto-dial end-to-end: resolves 4 bands at
        # sf0.1 (5k docs, full recall) and 2 bands at 10x (50k docs >
        # RETSIM_AUTO_THRESHOLD) — the growth column measures the dial
        # actually flipping, not one pinned regime
        docs = load_table(spark, sf_dir, "documents")
        scores = _retsim_scores(
            docs,
            n_bands=_retsim_auto_bands(docs, "doc_id"),
            bucket_cap=2048,
            id_col="doc_id",
            text_col="text",
        )
        return scores.filter(FF.col("cosine") >= 0.8)

    from pyspark.sql.window import Window

    from openrouter_batch_processor_spark.operators.neighbors import (
        cell_pairs_unstaged,
        knn_shapley,
    )

    def _knn_unstaged(spark, sf_dir, cells):
        # the raw builder, not the staged wrapper: a warm run of the
        # staged table is a memo hit (~0.2 s at any scale), which
        # measures the cache, not the operator
        pairs = cell_pairs_unstaged(load_table(spark, sf_dir, "embeddings"), cells)
        w = Window.partitionBy("a_id").orderBy("dist", "b_id")
        return pairs.withColumn(
            "rnk", FF.row_number().over(w).cast("long")
        ).filter(FF.col("rnk") <= 5)

    # cells ∝ corpus: 2k vecs -> 8 cells, 20k -> 80, 200k -> 800
    _KNN_CELLS = {BASE: 8, PROBE_DIR: 80, PROBE_DIR_100: 800}

    def knn_c8(spark, sf_dir):
        return _knn_unstaged(spark, sf_dir, 8)

    def knn_cdial(spark, sf_dir):
        return _knn_unstaged(spark, sf_dir, _KNN_CELLS.get(sf_dir, 8))

    def knn_auto(spark, sf_dir):
        # cells=None -> the operator's own _auto_cells dial (r12): the
        # map above predicts what it should resolve to at each scale
        return _knn_unstaged(spark, sf_dir, None)

    # fixed ~200-row test side at every scale (the production contract:
    # test sets don't grow with the corpus); vec_id%10==0 would grow it.
    # Both shapley rows run through staging.clear() per invocation so the
    # session-staged means table (added after the r11 probe first ran)
    # is REBUILT, not memo-read — same measure-the-operator rule as
    # cell_pairs_unstaged
    from openrouter_batch_processor_spark.operators import staging as _stg

    _SHAP_MOD = {BASE: 10, PROBE_DIR: 100, PROBE_DIR_100: 1_000}

    def shapley_full(spark, sf_dir):
        _stg.clear()
        return knn_shapley(load_table(spark, sf_dir, "embeddings"))

    def shapley_q200(spark, sf_dir):
        _stg.clear()
        return knn_shapley(
            load_table(spark, sf_dir, "embeddings"),
            test_mod=_SHAP_MOD.get(sf_dir, 10),
        )

    from openrouter_batch_processor_spark.operators.neighbors import (
        cell_knn_recall,
        knn_probe_frontier,
    )

    def recall_as_registered(spark, sf_dir):
        # defaults all the way: cells AND sample_mod auto-dial — the
        # VERDICT r11 #2 acceptance row. Staging cleared so the kNN
        # table rebuild is in the measurement, not a memo hit.
        _stg.clear()
        return cell_knn_recall(load_table(spark, sf_dir, "embeddings"))

    def frontier_as_registered(spark, sf_dir):
        _stg.clear()
        return knn_probe_frontier(load_table(spark, sf_dir, "embeddings"))

    # The registered jaccard/clusters queries are fully session-staged
    # (warm runs are memo reads ~0.03 s — they measure the cache, not
    # the operator; the pre-r13 floors for these rows were accumulated
    # against older, less-staged code). Probe the UNSTAGED builders —
    # candidates/shingle-set inputs stay staged (built once per scale),
    # so the row measures exactly the verify / clustering stage the
    # VERDICT r12 weak-marks name. Both inherit the r13 MinHash band
    # auto-dial through staged_candidate_pairs.
    from openrouter_batch_processor_spark.operators.dedup import (
        _ngram_jaccard_pairs,
        connected_components,
        staged_candidate_pairs,
    )

    def jaccard_unstaged(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return _ngram_jaccard_pairs(docs, "doc_id", "text", 0.1)

    def clusters_unstaged(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        comp = connected_components(
            staged_candidate_pairs(docs, "doc_id", "text")
        )
        from pyspark.sql import functions as FX

        sizes = comp.groupBy("cluster_id").agg(
            FX.count(FX.lit(1)).alias("cluster_size")
        )
        return comp.join(sizes, "cluster_id")

    return {
        "dedup_minhash_jaccard": jaccard_unstaged,
        "dedup_clusters": clusters_unstaged,
        "sample_knn_shapley": shapley_full,
        "emb_cell_knn_c8": knn_c8,
        "emb_cell_knn_cdial": knn_cdial,
        "emb_cell_knn": knn_auto,
        "audit_cell_knn_recall": recall_as_registered,
        "audit_knn_probe_frontier": frontier_as_registered,
        "sample_knn_shapley_q200": shapley_q200,
        "dedup_simhash_pairs_cap2k": simhash_capped,
        "sim_rp_lsh_pairs_cap2k": rp_capped,
        "sim_rp_lsh_pairs_wide16": rp_wide,
        "multimodal_audio_fp_wide4096": audio_wide,
        "sim_sq8_search_q20": sq8_q20,
        "dedup_retsim_pairs_cap2k": retsim_capped,
        "dedup_retsim_pairs_wide32": retsim_wide,
        "dedup_retsim_pairs_auto": retsim_auto,
    }


def build_probe_dir_100(spark) -> None:
    """100 re-keyed copies in ONE pass (a crossJoin against a 100-row
    copies dimension, not a 100-way union): doc_id offset per copy, a
    fixed-width copy tag appended so duplicate selectivity stays
    constant while volume grows 100x."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(PROBE_DIR_100, "_BUILT")):
        return
    shutil.rmtree(PROBE_DIR_100, ignore_errors=True)
    os.makedirs(PROBE_DIR_100)
    for name in os.listdir(BASE):
        if name not in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(BASE, name), os.path.join(PROBE_DIR_100, name))
    ks = spark.range(100).select(F.col("id").alias("k"))
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    tag = F.concat(F.lit(" copytag"), F.lpad(F.col("k").cast("string"), 3, "0"))
    docs.crossJoin(ks).select(
        (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), tag).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.length(tag)).alias("n_chars"),
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR_100, "documents.parquet")
    )
    embs = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    embs.crossJoin(ks).select(
        (F.col("vec_id") + F.col("k") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
        "label",
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR_100, "embeddings.parquet")
    )
    open(os.path.join(PROBE_DIR_100, "_BUILT"), "w").close()


def build_probe_dir(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(PROBE_DIR, "_BUILT")):
        return
    shutil.rmtree(PROBE_DIR, ignore_errors=True)
    os.makedirs(PROBE_DIR)
    for name in os.listdir(BASE):
        if name not in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(BASE, name), os.path.join(PROBE_DIR, name))
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    doc_copies = [
        docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{k}")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(len(f" copytag{k}"))).alias("n_chars"),
        )
        for k in range(COPIES)
    ]
    out = doc_copies[0]
    for c in doc_copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "documents.parquet")
    )
    emb_copies = [
        embs.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for k in range(COPIES)
    ]
    out = emb_copies[0]
    for c in emb_copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "embeddings.parquet")
    )
    open(os.path.join(PROBE_DIR, "_BUILT"), "w").close()


def run(
    spark, sf_dir: str, names: list[str], rows_out: dict | None = None
) -> dict[str, float]:
    from openrouter_batch_processor_spark.registry import REGISTRY
    from openrouter_batch_processor_spark.operators import staging

    extra = _capped_fns()
    out: dict[str, float] = {}
    for name in names:
        fn = extra[name] if name in extra else REGISTRY[name].fn
        best = None
        try:
            # cold + 2 warm; report the warm MIN (the bench.py noise
            # convention: this box shows multi-x co-tenant bursts that
            # poisoned single-warm-run probe tables in r10)
            for i in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                t = round(time.perf_counter() - t0, 3)
                if i > 0:
                    best = t if best is None else min(best, t)
            out[name] = best
        except Exception as exc:  # noqa: BLE001 — partial tables still emit
            out[name] = float("nan")
            print(f"  {sf_dir} {name}: FAILED {type(exc).__name__}", flush=True)
            continue
        print(f"  {sf_dir} {name}: {best}s", flush=True)
        if rows_out is not None and name not in NO_OUT_COUNT:
            # Output-row attribution (VERDICT r12 #4): wall growth on a
            # pairs query whose ANSWER grows (the probe corpus's
            # re-keyed copies make every copy group a true cluster) is
            # output volume, not plan blowup — record |result| per
            # scale so superlinear wall can be attributed honestly.
            # One extra count per (query, scale), outside the timings.
            try:
                rows_out.setdefault(name, {})[sf_dir] = fn(spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                rows_out.setdefault(name, {})[sf_dir] = None
    # staged artifacts are keyed on input plan, so the two scales never
    # collide — but clear between scales to keep memory bounded
    staging.clear()
    return out


def _parse_prev_out_rows(block: str, n_scales: int) -> dict[str, list[str]]:
    """Parse a prior '### Output rows' subsection (carry-over for rows
    not probed this invocation). Cells are decimal counts or 'n/a'."""
    import re as _re

    prev: dict[str, list[str]] = {}
    if "### Output rows" not in block:
        return prev
    sub = block.split("### Output rows", 1)[1]
    pat = r"^\| (\S+) \|" + r" (\d+|n/a) \|" * n_scales + r"$"
    for m in _re.finditer(pat, sub, _re.M):
        prev[m.group(1)] = [m.group(2 + i) for i in range(n_scales)]
    return prev


def _out_rows_lines(
    header_scales: list[str],
    order: list[str],
    measured: dict[str, dict],
    scale_dirs: list[str],
    prev: dict[str, list[str]],
) -> list[str]:
    """Render the output-rows subsection, merging this invocation's
    counts over any prior table's (measured wins; unprobed rows carry)."""
    lines = [
        "",
        "### Output rows (result cardinality per scale)",
        "",
        "Counts are deterministic (same code, same corpus), measured",
        "once per probe invocation outside the timed runs — the",
        "attribution column for the wall-growth tables above (a pairs",
        "query whose answer is N× larger is allowed to cost ~N×).",
        "",
        "| query | " + " | ".join(f"rows @{s}" for s in header_scales) + " |",
        "|---|" + "---|" * len(header_scales),
    ]
    for name in order:
        cells = prev.get(name, ["n/a"] * len(scale_dirs))
        got = measured.get(name)
        if got is not None:
            for i, d in enumerate(scale_dirs):
                v = got.get(d)
                if v is not None:
                    cells[i] = str(v)
        if all(c == "n/a" for c in cells) and got is None:
            continue  # never probed, nothing to carry
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    lines.append("")
    return lines


def main_100x() -> None:
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("scale_probe_100x")
    spark.sparkContext.setLogLevel("ERROR")
    build_probe_dir(spark)
    build_probe_dir_100(spark)

    # positional names = probe ONLY those rows this invocation (same
    # --only contract as main()): a full 15-row x 3-scale sweep in one
    # session accumulates enough shuffle/broadcast state to heap-OOM
    # the 128-partition 100x stages (observed r12 — the OOM then wedges
    # the session and every later row records a false FAILED). Unlisted
    # rows keep their accumulated floor from the existing table.
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [a for a in only if a not in QUERIES_100X]
    if unknown:
        raise SystemExit(f"unknown 100x probe queries: {unknown}")
    names = [n for n in QUERIES_100X if not only or n in only]
    rows_out: dict[str, dict] = {}
    t1 = run(spark, BASE, names, rows_out)
    t10 = run(spark, PROBE_DIR, names, rows_out)
    t100 = run(spark, PROBE_DIR_100, names, rows_out)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    text = open(path).read()
    # per-cell MIN across invocations — same burst-floor convention as
    # the 10x table (see main()). --fresh resets the accumulated floor
    # (ADVICE r10: a never-reset MIN would hide regressions forever).
    import re as _re

    prev: dict[str, tuple[float, float, float]] = {}
    for m in _re.finditer(
        r"^\| (\S+) \| ([0-9.]+) \| ([0-9.]+) \| ([0-9.]+) \| [0-9.]+x \| [0-9.]+x \|$",
        text.split("\n## 100x scale probe", 1)[-1].split("\n## ", 1)[0],
        _re.M,
    ):
        prev[m.group(1)] = (
            float(m.group(2)), float(m.group(3)), float(m.group(4))
        )
    for name in QUERIES_100X:
        if name not in t1:  # not probed this invocation (--only mode)
            if name in prev:
                t1[name], t10[name], t100[name] = prev[name]
            continue
        if name in prev:
            p1, p10, p100 = prev[name]
            # --fresh resets the floor for PROBED rows only; a NaN
            # (failed run) still falls back to the prior floor
            if t1[name] == t1[name]:
                t1[name] = t1[name] if FRESH else min(t1[name], p1)
            else:
                t1[name] = p1
            if t10[name] == t10[name]:
                t10[name] = t10[name] if FRESH else min(t10[name], p10)
            else:
                t10[name] = p10
            if t100[name] == t100[name]:
                t100[name] = t100[name] if FRESH else min(t100[name], p100)
            else:
                t100[name] = p100

    lines = [
        "",
        "## 100x scale probe (measured)",
        "",
        "Documents 5k -> 500k, embeddings 2k -> 200k (100 re-keyed copies,",
        "constant duplicate selectivity; VERDICT r07 #6). Wall seconds:",
        "per-cell MIN of warm runs across probe invocations (the 10x",
        "table's burst-floor convention); growth columns are wall ratios",
        "for 10x and 100x the rows.",
        "The two banded-LSH pair stages run with bucket_cap=2048 at",
        "ALL scales (the `_cap2k` suffix): with the default 8-bit band",
        "keys (256 buckets) candidate volume is Θ(n²/256) once buckets",
        "saturate — the UNCAPPED 100x run measurably filled this box's",
        "disk with shuffle spill (first --x100 attempt, java.io.IOException",
        "No space left on device). The dial (band width via n_bands/planes,",
        "or bucket_cap pruning of saturated=boilerplate buckets, volume",
        "<= n*cap) lives on operators/dedup.simhash_near_pairs and",
        "operators/similarity.rp_candidate_set; at 100 TB the production",
        "setting is 64-bit signatures with 16-bit bands + the cap.",
        "r09 rows: the audio landmark join runs at the default 256",
        "energy modulus and at the parameterized 4096 widen dial",
        "(audio_fingerprint_pairs(key_mod=...) — key space x256, false-",
        "collision volume /256; true-duplicate matches are output, not",
        "overhead, and the probe corpus makes every copy group a true",
        "match). sim_sq8_search_q20 fixes the query set at ~20 per",
        "scale so the row measures the linear per-query scan, not the",
        "registered query's n-proportional query count.",
        "r10 row: dedup_retsim_pairs_wide32 is the unstaged RETSim",
        "builder at the production band dial (2x32-bit keys) — the 10x",
        "probe showed 16-bit bands superlinear even capped, so only the",
        "wide setting is run at 500k docs.",
        "r12 rows: emb_cell_knn is the REGISTERED auto-dial path",
        "(cells 8 -> 80 -> 800): pair volume stays ~linear by",
        "construction and the measured 13.8x wall for 100x rows prices",
        "the flat Lloyd assignment's O(n*cells) term emerging at 200k",
        "vectors — the regime boundary where a production deployment",
        "swaps the flat coarse quantizer for a hierarchical one.",
        "audit_cell_knn_recall keeps |Q| ~200 by the fixed-count",
        "modulus, so its truth side is 200 x n exact HOF dots (40M at",
        "200k vectors): 53.1x wall for 100x rows/work — sublinear in",
        "work, and the audit's price is paid once per certification,",
        "never on the production path.",
        "r13 rows: dedup_minhash_jaccard / dedup_clusters measure the",
        "UNSTAGED verify / clustering builders (the registered queries",
        "are fully session-staged — a warm run is a ~0.03 s memo read",
        "that measures the cache, not the operator; pre-r13 floors for",
        "these rows came from older, less-staged code). Both inherit",
        "the r13 MinHash band auto-dial (4x2 -> 2x4 minhashes past 20k",
        "docs) through staged_candidate_pairs; sim_rp_lsh_pairs is the",
        "registered RP-LSH path whose planes auto-dial 16 -> 32 past",
        "20k vectors. See '## Round-13 scale notes' for the",
        "candidate-volume attribution of the jaccard/kcore rows.",
        "Generated by tools/scale_probe.py --x100.",
        _floor_stamp(),
        "",
        "| query | sf0.1 (s) | 10x (s) | 100x (s) | 10x growth | 100x growth |",
        "|---|---|---|---|---|---|",
    ]
    for name in QUERIES_100X:
        if name not in t1:  # neither probed nor in the prior table
            continue
        g10 = t10[name] / t1[name] if t1[name] else float("nan")
        g100 = t100[name] / t1[name] if t1[name] else float("nan")
        lines.append(
            f"| {name} | {t1[name]:.2f} | {t10[name]:.2f} | {t100[name]:.2f} "
            f"| {g10:.1f}x | {g100:.1f}x |"
        )
    prev_block = text.split("\n## 100x scale probe", 1)[-1].split("\n## ", 1)[0]
    prev_out = _parse_prev_out_rows(prev_block, 3)  # counts are deterministic; measured rows overwrite
    lines.extend(
        _out_rows_lines(
            ["1x", "10x", "100x"],
            QUERIES_100X,
            rows_out,
            [BASE, PROBE_DIR, PROBE_DIR_100],
            prev_out,
        )
    )
    block = "\n".join(lines)

    marker = "\n## 100x scale probe (measured)"
    tail = ""
    if marker in text:
        head, rest = text.split(marker, 1)
        # replace ONLY the old 100x block; later sections (per-round
        # scale notes) survive the rewrite — same discipline as main()
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:]
        text = head
    open(path, "w").write(text.rstrip("\n") + "\n" + block + tail)
    print(block)


def main() -> None:
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_probe_dir(spark)

    # positional names = probe ONLY those queries this invocation (new
    # rows land fast without re-measuring every family); unlisted rows
    # keep their accumulated floor from the existing table. Unknown
    # names are an ERROR, not a silent no-op rewrite from stale floors
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [a for a in only if a not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown probe queries: {unknown}")
    names = [n for n in QUERIES if not only or n in only]
    rows_out: dict[str, dict] = {}
    t1 = run(spark, BASE, names, rows_out)
    t10 = run(spark, PROBE_DIR, names, rows_out)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md")
    text = open(path).read()

    # Merge with any previous table: per-cell MIN across invocations.
    # This box takes multi-minute co-tenant load bursts that a single
    # pass cannot dodge (r10: three different runs each had a clean
    # table except wherever the burst happened to roam); a floor over
    # runs converges on the machine's real numbers — the same reason
    # bench.py reports the per-query min across passes.
    import re as _re

    # --fresh resets the accumulated floor (ADVICE r10: a never-reset
    # MIN would keep reporting a stale faster number after a regression)
    # — for PROBED rows only (r13); unprobed rows keep their floors
    prev: dict[str, tuple[float, float]] = {}
    for m in _re.finditer(
        r"^\| (\S+) \| ([0-9.]+) \| ([0-9.]+) \| [0-9.]+x \|$",
        text.split("\n## 10x scale probe", 1)[-1].split("\n## ", 1)[0],
        _re.M,
    ):
        prev[m.group(1)] = (float(m.group(2)), float(m.group(3)))

    lines = [
        "",
        "## 10x scale probe (measured)",
        "",
        "Documents 5k -> 50k, embeddings 2k -> 20k (10 re-keyed copies,",
        "constant duplicate selectivity). Wall seconds: per-cell MIN of",
        "warm runs across probe invocations (co-tenant bursts roam; the",
        "floor is the machine's real number). `xN` is wall growth for",
        "10x rows — at-or-under ~10x is linear-or-better; candidate-pair",
        "stages may exceed it when pair volume itself grows. Generated",
        "by tools/scale_probe.py.",
        _floor_stamp(),
        "",
        "| query | sf0.1 (s) | 10x (s) | growth |",
        "|---|---|---|---|",
    ]
    for name in QUERIES:
        if name not in t1:  # not probed this invocation (--only mode)
            if name not in prev:
                continue
            v1, v10 = prev[name]
            g = v10 / v1 if v1 else float("nan")
            lines.append(f"| {name} | {v1:.2f} | {v10:.2f} | {g:.1f}x |")
            continue
        v1, v10 = t1[name], t10[name]
        if name in prev:
            p1, p10 = prev[name]
            if FRESH:  # reset floor for probed rows; NaN keeps prior
                v1 = v1 if v1 == v1 else p1
                v10 = v10 if v10 == v10 else p10
            else:
                v1 = min(v1, p1) if v1 == v1 else p1
                v10 = min(v10, p10) if v10 == v10 else p10
        g = v10 / v1 if v1 else float("nan")
        lines.append(f"| {name} | {v1:.2f} | {v10:.2f} | {g:.1f}x |")
    prev_block10 = text.split("\n## 10x scale probe", 1)[-1].split("\n## ", 1)[0]
    prev_out10 = _parse_prev_out_rows(prev_block10, 2)  # counts are deterministic; measured rows overwrite
    lines.extend(
        _out_rows_lines(
            ["1x", "10x"], QUERIES, rows_out, [BASE, PROBE_DIR], prev_out10
        )
    )
    block = "\n".join(lines)
    marker = "\n## 10x scale probe (measured)"
    tail = ""
    if marker in text:
        head, rest = text.split(marker, 1)
        # replace ONLY the old 10x block; later sections (100x probe,
        # per-round scale notes) survive the rewrite
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:]
        text = head
    open(path, "w").write(text.rstrip("\n") + "\n" + block + tail)
    print(block)


if __name__ == "__main__":
    if "--x100" in sys.argv:
        main_100x()
    else:
        main()
