"""kNN-graph geometry + data valuation (r11): cell-local kNN ranking,
LOF on a planted outlier, TwoNN on a known-dimension manifold, hubness
histogram mass conservation, and KNN-Shapley's efficiency axiom."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from openrouter_batch_processor_spark.operators.neighbors import (
    cell_knn_staged,
    hubness_histogram,
    knn_shapley,
    lof_scores,
    twonn_intrinsic_dim,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _emb_df(spark, vecs, labels=None):
    rows = [
        Row(
            vec_id=i,
            embedding=[float(x) for x in v],
            label=int(labels[i]) if labels is not None else 0,
        )
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _grid_vecs(dim=4):
    # 25 points on a 2-D lattice embedded in `dim` dims (intrinsic
    # dimension 2), deterministic small jitter so no distance ties
    vecs = []
    for i in range(5):
        for j in range(5):
            v = [0.0] * dim
            v[0] = float(i) + 0.01 * ((i * 7 + j * 3) % 5)
            v[1] = float(j) + 0.01 * ((i * 3 + j * 11) % 7)
            vecs.append(v)
    return vecs


def test_cell_knn_rank_contract(spark):
    vecs = _grid_vecs()
    knn = cell_knn_staged(_emb_df(spark, vecs), k=3, cells=1, iters=1)
    rows = knn.collect()
    by_a = {}
    for r in rows:
        by_a.setdefault(r["a_id"], []).append(r)
    X = np.array(vecs)
    for a, nb in by_a.items():
        nb = sorted(nb, key=lambda r: r["rnk"])
        assert len(nb) == 3
        # distances non-decreasing with rank
        dists = [r["dist"] for r in nb]
        assert dists == sorted(dists)
        # rank-1 neighbor is the true nearest
        d = np.sqrt(((X - X[a]) ** 2).sum(axis=1))
        d[a] = np.inf
        assert nb[0]["b_id"] == int(np.argmin(d))


def test_lof_flags_planted_outlier(spark):
    # tight 3x3 cluster + one far point, all in ONE cell so LOF is the
    # exact (non-cell-approximated) value
    vecs = [[float(i % 3), float(i // 3), 0.0, 0.0] for i in range(9)]
    vecs.append([50.0, 50.0, 0.0, 0.0])
    out = lof_scores(_emb_df(spark, vecs), k=3, top=10, cells=1).collect()
    assert out[0]["vec_id"] == 9  # the planted outlier tops the ranking
    assert out[0]["lof"] > 5.0
    others = [r["lof"] for r in out if r["vec_id"] != 9]
    assert all(v < 2.0 for v in others)


def test_twonn_recovers_planar_dimension(spark):
    # 80 seeded-uniform points on a 2-D plane embedded in 4-D: TwoNN
    # assumes locally-Poisson sampling (a regular lattice breaks it —
    # r2/r1 -> 1 and the MLE diverges), so use uniform draws
    rng = np.random.default_rng(7)
    pts = rng.uniform(0.0, 1.0, size=(80, 2))
    vecs = [[float(a), float(b), 0.0, 0.0] for a, b in pts]
    ids = twonn_intrinsic_dim(_emb_df(spark, vecs), cells=1).collect()
    assert len(ids) == 1
    assert 1.2 < ids[0]["id_hat"] < 3.5
    assert ids[0]["n_points"] == 80


def test_hubness_histogram_mass(spark):
    df = _emb_df(spark, _grid_vecs())
    hist = hubness_histogram(df, k=3, cells=1).collect()
    # every point appears exactly once across the histogram
    assert sum(r["n_points"] for r in hist) == 25
    # total k-occurrences equal total kNN edges (25 points x 3)
    assert sum(r["k_occ"] * r["n_points"] for r in hist) == 75


def _shapley_reference(X, y, test_ids, K):
    """Direct numpy transcription of Jia et al. (2019) Theorem 1."""
    n = len(X)
    train = [i for i in range(n) if i not in test_ids]
    vals = {i: [] for i in train}
    for t in test_ids:
        d = np.round(((X[train] - X[t]) ** 2).sum(axis=1), 6)
        order = sorted(range(len(train)), key=lambda j: (d[j], train[j]))
        hit = [1 if y[train[j]] == y[t] else 0 for j in order]
        N = len(train)
        s = [0.0] * N
        s[N - 1] = hit[N - 1] / N
        for i in range(N - 2, -1, -1):
            s[i] = s[i + 1] + (hit[i] - hit[i + 1]) / K * min(K, i + 1) / (
                i + 1
            )
        for j, sv in zip(order, s):
            vals[train[j]].append(sv)
    return {i: sum(v) / len(v) for i, v in vals.items()}


def test_knn_shapley_matches_closed_form_and_efficiency(spark):
    rng_vecs = _grid_vecs()
    labels = [(i * 3 + 1) % 2 for i in range(25)]
    df = _emb_df(spark, rng_vecs, labels)
    out = knn_shapley(df, k=3, top=100, test_mod=5).collect()
    X = np.array(rng_vecs)
    test_ids = {i for i in range(25) if i % 5 == 0}
    ref = _shapley_reference(X, labels, test_ids, K=3)
    got = {r["vec_id"]: r["mean_shapley"] for r in out}
    assert set(got) == set(ref)
    for i, v in ref.items():
        assert math.isclose(got[i], v, abs_tol=5e-6), (i, got[i], v)
    # efficiency axiom: sum over train of mean value == mean over tests
    # of U(D) = fraction of K nearest that match the test label
    utail = []
    for t in sorted(test_ids):
        train = [i for i in range(25) if i not in test_ids]
        d = np.round(((X[train] - X[t]) ** 2).sum(axis=1), 6)
        order = sorted(range(len(train)), key=lambda j: (d[j], train[j]))
        topk = order[:3]
        utail.append(
            sum(1 for j in topk if labels[train[j]] == labels[t]) / 3.0
        )
    assert math.isclose(
        sum(got.values()), sum(utail) / len(utail), abs_tol=1e-4
    )


def test_knn_shapley_negative_for_mislabeled_point(spark):
    # a tight cluster of label-0 points with ONE label-1 impostor right
    # at the center: the impostor should carry negative value for
    # label-0 test points
    vecs = [[float(i % 4) * 0.1, float(i // 4) * 0.1, 0.0, 0.0] for i in range(16)]
    labels = [0] * 16
    labels[7] = 1  # mislabeled impostor (vec_id 7 not in test split)
    df = _emb_df(spark, vecs, labels)
    out = knn_shapley(df, k=3, top=100, test_mod=5).collect()
    got = {r["vec_id"]: r["mean_shapley"] for r in out}
    assert got[7] < 0


def test_knn_label_noise_clean_vs_noisy(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        knn_label_noise,
    )

    # two well-separated blobs: label 0 at origin, label 1 at (10, 10);
    # one mislabeled point inside blob 0 drags label 1's agree_rate down
    vecs, labels = [], []
    for i in range(8):
        vecs.append([float(i % 3) * 0.1, float(i // 3) * 0.1, 0.0, 0.0])
        labels.append(0)
    for i in range(8):
        vecs.append([10.0 + (i % 3) * 0.1, 10.0 + (i // 3) * 0.1, 0.0, 0.0])
        labels.append(1)
    vecs.append([0.05, 0.05, 0.0, 0.0])
    labels.append(1)  # impostor inside blob 0
    out = {
        r["label"]: r
        for r in knn_label_noise(
            _emb_df(spark, vecs, labels), k=3, cells=1
        ).collect()
    }
    assert out[0]["agree_rate"] == 1.0
    assert out[1]["n_agree"] == 8  # everyone but the impostor
    assert out[1]["n_points"] == 9


def test_density_peaks_finds_blob_centers(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        density_peaks,
    )

    # two dense blobs + sparse noise: the top-2 gamma points should be
    # one inside each blob (high rho AND far from any denser point)
    rng = np.random.default_rng(11)
    vecs = []
    for cx, cy in [(0.0, 0.0), (8.0, 8.0)]:
        for _ in range(12):
            x, y = rng.normal(cx, 0.3), rng.normal(cy, 0.3)
            vecs.append([float(x), float(y), 0.0, 0.0])
    for _ in range(4):
        x, y = rng.uniform(3, 5), rng.uniform(3, 5)
        vecs.append([float(x), float(y), 0.0, 0.0])
    out = density_peaks(_emb_df(spark, vecs), top=2, k=5, cells=1).collect()
    tops = {r["vec_id"] for r in out}
    blobs = [set(range(12)), set(range(12, 24))]
    assert any(t in blobs[0] for t in tops)
    assert any(t in blobs[1] for t in tops)
    # gamma ordering holds
    assert out[0]["gamma"] >= out[1]["gamma"]


def test_cell_knn_recall_perfect_on_separated_blobs(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        cell_knn_recall,
    )

    # two well-separated 8-point blobs, 2 cells: Lloyd splits them
    # exactly, every true neighbor is in-blob, so recall@3 = 1.0
    vecs = []
    for cx in (0.0, 100.0):
        for i in range(8):
            vecs.append([cx + (i % 3) * 0.1, (i // 3) * 0.1, 0.0, 0.0])
    # sample_mod=1: audit every point (the registry default auto-dials
    # the modulus to a ~fixed-count query set, max(1, n/200), to keep
    # the truth side linear)
    out = cell_knn_recall(
        _emb_df(spark, vecs), k=3, cells=2, sample_mod=1
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_points"] == 8
        assert r["recall"] == 1.0


def test_outlier_agreement_shape_and_bounds(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        outlier_agreement,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, size=(60, 8)).tolist()
    labels = [i % 3 for i in range(60)]
    out = outlier_agreement(_emb_df(spark, vecs, labels)).collect()
    assert len(out) == 3
    pairs = {(r["method_a"], r["method_b"]) for r in out}
    assert pairs == {
        ("lof_top25", "mahalanobis_top20"),
        ("lof_top25", "shapley_low25"),
        ("mahalanobis_top20", "shapley_low25"),
    }
    for r in out:
        assert 0 <= r["n_overlap"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_source_centroid_drift_flags_shifted_source(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        source_centroid_drift,
    )

    vecs = [[0.0, 0.0, 0.0, 0.0] for _ in range(10)]
    vecs += [[9.0, 9.0, 0.0, 0.0] for _ in range(2)]
    emb = _emb_df(spark, vecs)
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="shifted" if i >= 10 else "base") for i in range(12)]
    )
    out = {r["source"]: r for r in source_centroid_drift(emb, docs).collect()}
    assert out["shifted"]["n_vecs"] == 2
    assert out["base"]["n_vecs"] == 10
    # the shifted source's centroid is much farther from the corpus mean
    assert out["shifted"]["drift_l2"] > 5 * out["base"]["drift_l2"]


def test_multiprobe_rank1_is_the_lloyd_assignment(spark):
    from openrouter_batch_processor_spark.operators.kmeans import (
        lloyd_assign_staged,
        lloyd_multiprobe_staged,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, size=(40, 6)).tolist()
    emb = _emb_df(spark, vecs)
    a = {
        r["vec_id"]: r["cluster_id"]
        for r in lloyd_assign_staged(emb, 4, 2).collect()
    }
    probes = lloyd_multiprobe_staged(emb, 4, 2, nprobe=2).collect()
    p1 = {r["vec_id"]: r["cluster_id"] for r in probes if r["probe_rank"] == 1}
    # the probe_rank=1 rows ARE the single-probe assignment
    assert p1 == a
    # every point gets exactly nprobe distinct cells
    from collections import Counter

    per_point = Counter(r["vec_id"] for r in probes)
    assert set(per_point.values()) == {2}


def test_label_separability_orders_separated_vs_mixed(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        label_separability,
    )

    rng = np.random.default_rng(13)
    # separated: two tight blobs far apart -> huge Fisher F
    vecs, labels = [], []
    for lbl, (cx, cy) in enumerate([(0.0, 0.0), (20.0, 20.0)]):
        for _ in range(15):
            x, y = rng.normal(cx, 0.2), rng.normal(cy, 0.2)
            vecs.append([float(x), float(y), 0.0, 0.0])
            labels.append(lbl)
    sep = label_separability(_emb_df(spark, vecs, labels)).collect()
    f_sep = sep[0]["fisher_f"]
    # mixed: same points, labels shuffled deterministically -> F near 0
    mixed_labels = [i % 2 for i in range(30)]
    mix = label_separability(_emb_df(spark, vecs, mixed_labels)).collect()
    f_mix = mix[0]["fisher_f"]
    assert f_sep > 100 * max(f_mix, 1e-9)
    for r in sep:
        assert r["n_vecs"] == 15
        assert r["within_ms"] < 1.0


def test_streaming_drift_matches_batch_audit(spark):
    """The streaming twin's finished table equals the batch audit's
    rows exactly — arrival order cannot matter because the stateful
    fold is exact decimal sums."""
    from openrouter_batch_processor_spark.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    batch = sorted(
        map(tuple, REGISTRY["audit_source_emb_drift"].fn(spark, sf).collect())
    )
    stream = sorted(
        map(tuple, REGISTRY["streaming_emb_drift"].fn(spark, sf).collect())
    )
    assert stream == batch


def test_graph_expansion_recall_dominates_baseline(spark):
    from openrouter_batch_processor_spark.operators.neighbors import (
        graph_expansion_recall,
    )

    # a 1-D chain of 32 points split across 4 cells: true neighborhoods
    # straddle cell boundaries, so the plain cell-kNN baseline loses
    # recall there and one NN-expansion hop must buy some of it back
    # (graph recall >= base recall by construction: candidates are a
    # superset and the rerank is exact)
    vecs = [[float(i), 0.0, 0.0, 0.0] for i in range(32)]
    out = graph_expansion_recall(
        _emb_df(spark, vecs), k=3, cells=4, sample_mod=1
    ).collect()
    rows = {r["method"]: r for r in out}
    assert set(rows) == {"cell_knn", "graph_expand_1hop"}
    base, graph = rows["cell_knn"], rows["graph_expand_1hop"]
    assert base["n_queries"] == graph["n_queries"] == 32
    assert graph["recall"] >= base["recall"]
    assert graph["n_candidates"] >= base["n_candidates"]
    assert 0.0 <= base["recall"] <= 1.0 and graph["recall"] <= 1.0
    # expansion is bounded by k + k^2 candidates per query
    assert graph["avg_candidates"] <= 3 + 9
