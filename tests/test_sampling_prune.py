"""A-Res weighted reservoir sampling + SSL-prototype pruning:
pure-Python reference parity and paper-contract properties."""

from __future__ import annotations

import hashlib
import math

import pytest

from openrouter_batch_processor_spark.operators.sampling import (
    weighted_reservoir_per_group,
)
from openrouter_batch_processor_spark.operators.similarity import (
    prototype_prune_report,
)


def _py_akey(doc_id: int, w: int) -> float:
    hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
    u = (hv + 0.5) / 4503599627370496.0
    return round(-math.log(u) / w, 6)


class TestWeightedReservoir:
    def test_matches_pure_python_selection(self, spark):
        rows = [(i, "g" + str(i % 2), 10 + 7 * i) for i in range(1, 41)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = weighted_reservoir_per_group(
            df, "source", "n_chars", k=5, id_col="doc_id"
        ).collect()
        by_group: dict[str, list] = {}
        for doc_id, g, w in rows:
            by_group.setdefault(g, []).append((_py_akey(doc_id, w), doc_id, w))
        want = {}
        for g, keyed in by_group.items():
            keyed.sort()
            want[g] = [(doc_id, r + 1) for r, (_, doc_id, _) in enumerate(keyed[:5])]
        got_by_group: dict[str, list] = {}
        for r in sorted(got, key=lambda r: (r["source"], r["rank"])):
            got_by_group.setdefault(r["source"], []).append((r["doc_id"], r["rank"]))
        assert got_by_group == want

    def test_k_rows_per_group_and_weight_bias(self, spark):
        # one heavy item among uniform light ones: selected virtually
        # always (weight ratio 10000:1 -> inclusion prob ~ 1)
        rows = [(i, "g", 10) for i in range(1, 200)] + [(999, "g", 100000)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = weighted_reservoir_per_group(
            df, "source", "n_chars", k=10, id_col="doc_id"
        ).collect()
        assert len(got) == 10
        assert 999 in {r["doc_id"] in (999,) and r["doc_id"] or r["doc_id"] for r in got}
        assert any(r["doc_id"] == 999 for r in got)


class TestPrototypePrune:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        # cell seeds 0,1 orthogonal; 2-7 near seed 0 (prototypical),
        # 8,9 oblique (hard); 10-12 near seed 1
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.01, 0.0, 0.0]),
            (3, [1.0, 0.02, 0.0, 0.0]),
            (4, [1.0, 0.0, 0.01, 0.0]),
            (5, [1.0, 0.0, 0.02, 0.0]),
            (6, [1.0, 0.01, 0.01, 0.0]),
            (7, [1.0, 0.0, 0.0, 0.03]),
            (8, [0.7, 0.0, 0.7, 0.0]),
            (9, [0.7, 0.0, 0.0, 0.7]),
            (10, [0.0, 1.0, 0.01, 0.0]),
            (11, [0.0, 1.0, 0.02, 0.0]),
            (12, [0.0, 0.8, 0.6, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_counts_and_cut(self, emb):
        rep = {
            r["centroid_id"]: r
            for r in prototype_prune_report(
                emb, prune_num=3, prune_den=10, n_centroids=2
            ).collect()
        }
        for r in rep.values():
            assert r["n_pruned"] == (3 * r["n_vectors"]) // 10
            assert r["n_kept"] + r["n_pruned"] == r["n_vectors"]
        assert sum(r["n_vectors"] for r in rep.values()) == 13

    def test_prunes_prototypical_keeps_hard(self, emb):
        # cell 0 has 9 members -> prune floor(27/10)=2: the two highest
        # cosine-to-centroid (the seed itself + the closest copy);
        # the oblique vectors 8,9 must survive
        rep = {
            r["centroid_id"]: r
            for r in prototype_prune_report(
                emb, prune_num=3, prune_den=10, n_centroids=2
            ).collect()
        }
        assert rep[0]["n_pruned"] == 2
        # cut_cos = lowest cosine among pruned: near 1 (prototypes),
        # far above the oblique members' ~0.7
        assert rep[0]["cut_cos"] > 0.99

    def test_zero_prune_fraction(self, emb):
        rep = prototype_prune_report(
            emb, prune_num=0, prune_den=10, n_centroids=2
        ).collect()
        assert all(r["n_pruned"] == 0 and r["cut_cos"] is None for r in rep)
