"""Round-6 batch 2: source-KL drift, Youden-J threshold, burstiness,
k-core peel — hand-verified semantics."""

from __future__ import annotations

import hashlib
import math

import pytest

from openrouter_batch_processor_spark.operators.textanalysis import (
    burstiness_topk,
    quality_youden,
    source_kl,
)


def _bucket(term: str, b: int = 512) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % b


class TestSourceKl:
    def test_matches_pure_python_and_is_nonnegative(self, spark):
        rows = [
            (1, "aa bb cc dd", "s1"),
            (2, "aa bb aa bb", "s1"),
            (3, "xx yy zz ww", "s2"),
            (4, "xx xx yy yy", "s2"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["source"]: r for r in source_kl(docs).collect()}
        # pure-python reference with the same smoothing + rounding
        from collections import Counter

        corpus = Counter()
        per_src: dict[str, Counter] = {}
        for _i, text, s in rows:
            for tok in text.split():
                corpus[_bucket(tok)] += 1
                per_src.setdefault(s, Counter())[_bucket(tok)] += 1
        tc = sum(corpus.values())
        for s, cnts in per_src.items():
            ts = sum(cnts.values())
            kl = 0.0
            for b in range(512):  # full grid: absent buckets still carry mass
                ps = (cnts.get(b, 0) + 1) / (ts + 512.0)
                pc = (corpus.get(b, 0) + 1) / (tc + 512.0)
                kl += round(ps * math.log(ps / pc), 9)
            assert got[s]["kl"] == pytest.approx(round(kl, 6), abs=1e-6)
            assert got[s]["n_tokens"] == ts
            assert got[s]["kl"] >= 0  # disjoint vocabularies diverge


class TestQualityYouden:
    def test_matches_bruteforce_cut_search(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            quality_scores,
        )

        rows = [
            (1, "the fast cat and the small dog run in the big field", "en"),
            (2, "xx yy zz xx yy zz !!! ??? ...", "en"),
            (3, "la casa es grande y el perro es pequeno", "es"),
            (4, "!!! ??? ### $$$ %%% ^^^ &&&", "es"),
            (5, "the quick brown fox jumps over the lazy dog", "en"),
            (6, "der hund ist nicht schnell und die katze ist klein", "de"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = quality_youden(docs).head()
        scores = {r["doc_id"]: r["quality_score"] for r in quality_scores(docs).collect()}
        pos = [scores[d] for d, _t, l in rows if l == "en"]
        neg = [scores[d] for d, _t, l in rows if l != "en"]
        best = None
        for cut in sorted(set(scores.values())):
            tpr = sum(1 for s in pos if s >= cut) / len(pos)
            fpr = sum(1 for s in neg if s >= cut) / len(neg)
            j = tpr - fpr
            if best is None or j > best[0] + 1e-12:
                best = (j, cut, tpr, fpr)
        assert got["cut"] == pytest.approx(best[1], abs=1e-9)
        assert got["youden_j"] == pytest.approx(best[0], abs=1e-6)
        assert got["tpr"] == pytest.approx(best[2], abs=1e-6)
        assert got["fpr"] == pytest.approx(best[3], abs=1e-6)

    def test_single_class_degrades_to_null(self, spark):
        docs = spark.createDataFrame(
            [(1, "solo doc text", "es"), (2, "otra cosa aqui", "de")],
            "doc_id long, text string, lang string",
        )
        row = quality_youden(docs).head()
        assert row["tpr"] is None and row["youden_j"] is None


class TestBurstiness:
    def test_concentrated_term_beats_uniform_term(self, spark):
        n = 12
        rows = [(0, " ".join(["bursty"] * 10))]
        rows += [(i, "uniform filler words") for i in range(1, n)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["term"]: r for r in burstiness_topk(docs, min_tf=10).collect()}
        # bursty: tf=10, s2=100 -> vmr = 100/10 - 10/12
        assert got["bursty"]["vmr"] == pytest.approx(10 - 10 / n, abs=1e-6)
        # uniform: tf=11, s2=11 -> vmr = 1 - 11/12
        assert got["uniform"]["vmr"] == pytest.approx(1 - 11 / n, abs=1e-6)
        assert got["bursty"]["vmr"] > got["uniform"]["vmr"]
        assert got["bursty"]["df"] == 1 and got["uniform"]["df"] == 11


class TestKcorePeel:
    def test_clique_survives_stray_pair_peels(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import kcore_peel

        clique_text = "the fast cat runs over the big field near the old barn today"
        pair_text = "completely different words about boats sailing across the wide sea"
        rows = [(i, clique_text) for i in range(4)]
        rows += [(10, pair_text), (11, pair_text)]
        rows += [(20, "isolated unique document with no duplicate partner anywhere here")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["degree"] for r in kcore_peel(docs, k=2).collect()}
        # 4-clique: degree 3 each, survives k=2; the stray pair (deg 1)
        # and the isolated doc peel away
        assert set(out) == {0, 1, 2, 3}
        assert all(d == 3 for d in out.values())
