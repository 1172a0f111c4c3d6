"""Similarity operator semantics: cosine properties, top-k ordering,
IVF pruning vs brute force, bucketed vs brute-force near-dup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.similarity import (
    assign_ivf_cells,
    ivf_topk,
    multiprobe_rerank_report,
    neardup_pairs_bruteforce,
    neardup_pairs_bucketed,
    topk_bruteforce,
    union_candidates_report,
    unit_vectors,
)


@pytest.fixture(scope="module")
def emb(spark):
    # 3 tight clusters around orthogonal axes + exact duplicates
    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    # interleaved so vec_ids 0..2 (the deterministic centroid seeds) are
    # one pure vector per cluster
    rows = []
    vid = 0
    for jitter in (0.0, 0.01, 0.02, 0.03):
        for c, v in base.items():
            vec = [x + (jitter if i == (c + 1) % 4 else 0.0) for i, x in enumerate(v)]
            rows.append((vid, vec, c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


class TestUnitVectors:
    def test_unit_norm(self, spark, emb):
        for r in unit_vectors(emb).collect():
            n = math.sqrt(sum(x * x for x in r["unit"]))
            assert abs(n - 1.0) < 1e-9


class TestTopK:
    def test_self_is_top1(self, spark, emb):
        rows = topk_bruteforce(emb, [1.0, 0.0, 0.0, 0.0], k=4).collect()
        assert rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)

    def test_ivf_matches_bruteforce_on_clusters(self, spark, emb):
        q = [0.0, 1.0, 0.0, 0.0]
        bf = [r["vec_id"] for r in topk_bruteforce(emb, q, k=3).collect()]
        ivf = [
            r["vec_id"]
            for r in ivf_topk(emb, q, k=3, n_centroids=3, nprobe=2).collect()
        ]
        # the query's own cluster is within the probed cells
        assert set(bf[:2]) <= set(ivf)


class TestNearDup:
    def test_bucketed_is_subset_of_bruteforce(self, spark, emb):
        bf = {(r["id_a"], r["id_b"]) for r in neardup_pairs_bruteforce(emb, 0.95).collect()}
        bucketed = {
            (r["id_a"], r["id_b"])
            for r in neardup_pairs_bucketed(emb, 0.95, n_centroids=3).collect()
        }
        assert bucketed <= bf
        # within-cluster near-identical pairs are found
        assert any(a % 3 == b % 3 for a, b in bucketed)

    def test_cell_assignment_groups_clusters(self, spark, emb):
        cells = {r["vec_id"]: r["centroid_id"] for r in assign_ivf_cells(emb, 3).collect()}
        # members of each jitter-cluster (ids ≡ c mod 3) share one cell
        for c in range(3):
            ids = [c + 3 * j for j in range(4)]
            assert len({cells[i] for i in ids}) == 1


class TestQuantizeInt8:
    def test_roundtrip_properties(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import quantize_int8

        vecs = spark.createDataFrame(
            [
                (1, [1.0, -0.5, 0.25, 0.0]),
                (2, [0.003, 0.001, -0.002, 0.004]),  # tiny magnitudes still span int8
                (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: dropped (no scale exists)
            ],
            "vec_id long, embedding array<float>",
        )
        rows = {r["vec_id"]: r for r in quantize_int8(vecs).collect()}
        assert set(rows) == {1, 2}
        # max element always quantizes exactly to +/-127 -> saturated
        assert rows[1]["n_saturated"] >= 1
        assert rows[1]["scale"] == 127.0
        # reconstruction error is bounded by half a quantization step
        for r in rows.values():
            assert r["max_abs_err"] <= 0.5 / r["scale"] + 5e-7  # + 6-dp rounding slop
            assert 0.0 <= r["rms_err"] <= r["max_abs_err"]


class TestAnnRecall:
    def test_full_probe_is_exact(self, spark):
        import random

        from openrouter_batch_processor_spark.operators.similarity import ann_recall

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # probing every cell == brute force -> recall must be exactly 1
        out = ann_recall(df, k=3, n_centroids=4, nprobe=4, query_mod=10, query_rem=3)
        rows_out = out.collect()
        assert len(rows_out) == 6  # ids 3,13,...,53
        assert all(r["recall_at_k"] == 1.0 and r["n_hit"] == 3 for r in rows_out)

    def test_pruned_probe_bounded(self, spark):
        import random

        from openrouter_batch_processor_spark.operators.similarity import ann_recall

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["query_id"]: r for r in
               ann_recall(df, k=3, n_centroids=4, nprobe=1, query_mod=10, query_rem=3).collect()}
        assert set(out) == {3, 13, 23, 33, 43, 53}
        for r in out.values():
            assert 0.0 <= r["recall_at_k"] <= 1.0
            assert r["n_hit"] == round(r["recall_at_k"] * 3)


class TestMultiprobeRerank:
    def test_curve_monotone_and_bounded(self, spark, emb):
        """Deeper probing can only ADD candidates: n_cand and recall are
        non-decreasing in p, every config's hits stay within truth, and
        the baseline row is present for the volume ratio."""
        out = multiprobe_rerank_report(
            emb, threshold=0.9, n_centroids=4, max_probe=3
        ).collect()
        rows = {r["mode"]: r for r in out}
        assert set(rows) == {"single_c8", "rerank_c4_p2", "rerank_c4_p3"}
        p2, p3 = rows["rerank_c4_p2"], rows["rerank_c4_p3"]
        assert p3["n_cand"] >= p2["n_cand"]
        assert p3["recall"] >= p2["recall"]
        n_true = p2["n_true"]
        assert all(r["n_pairs"] <= n_true for r in out)
        assert all(r["n_true"] == n_true for r in out)
        # exact-verify stage: recall is a true fraction
        assert all(0.0 <= r["recall"] <= 1.0 for r in out)

    def test_deepest_probe_on_tight_clusters_is_complete(self, spark, emb):
        """With probes covering most cells, the candidate union contains
        every within-cluster pair -> recall 1.0 after exact rerank."""
        out = multiprobe_rerank_report(
            emb, threshold=0.9, n_centroids=3, max_probe=3
        ).collect()
        deepest = [r for r in out if r["mode"] == "rerank_c3_p3"][0]
        assert deepest["recall"] == 1.0


class TestUnionCandidates:
    def test_union_dominates_both_signals(self, spark, emb):
        """The union's candidate set contains each signal's, so its
        n_cand and recall are >= both; hits never exceed truth."""
        out = {r["mode"]: r for r in union_candidates_report(emb, 0.9).collect()}
        assert set(out) == {"ivf_c32_p2", "rp_lsh", "union"}
        u = out["union"]
        for mode in ("ivf_c32_p2", "rp_lsh"):
            assert u["n_cand"] >= out[mode]["n_cand"]
            assert u["n_pairs"] >= out[mode]["n_pairs"]
            assert u["recall"] >= out[mode]["recall"]
        assert all(r["n_pairs"] <= r["n_true"] for r in out.values())
