"""Round-6 batch 4: PACF (Durbin-Levinson), NDCG ranking audit,
Naive Bayes lang-id — hand-verified against pure-Python references."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from openrouter_batch_processor_spark.operators.timeseries import acf_lags, pacf_lags


def _mk_events(spark, counts):
    """One event row per unit so hourly counts follow `counts`."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((h * 100 + i, "tick", base + dt.timedelta(hours=h), 1.0, "u1", "{}"))
    return spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, value double, "
        "user_id string, props string",
    )


def _durbin_levinson(r):
    """Reference PACF from acf values r[0]=r1... (left-assoc like the op)."""
    out = [r[0]]
    prev = {1: r[0]}
    for k in range(2, len(r) + 1):
        num = r[k - 1]
        den = 1.0
        for j in range(1, k):
            num = num - prev[j] * r[k - 1 - j]
            den = den - prev[j] * r[j - 1]
        pkk = num / den
        cur = {k: pkk}
        for j in range(1, k):
            cur[j] = prev[j] - pkk * prev[k - j]
        out.append(pkk)
        prev = cur
    return out


class TestPacf:
    def test_matches_reference_recursion(self, spark):
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
        ev = _mk_events(spark, counts)
        acf = {
            r["lag_k"]: r["acf"] for r in acf_lags(ev, 5).collect()
        }
        got = {r["lag_k"]: r["pacf"] for r in pacf_lags(ev, 5).collect()}
        ref = _durbin_levinson([acf[k] for k in range(1, 6)])
        for k in range(1, 6):
            assert got[k] == pytest.approx(round(ref[k - 1], 6), abs=1e-6)

    def test_ar1_like_series_cuts_off(self, spark):
        # AR(1)-ish deterministic series: PACF lag1 dominates lags 2+
        x, counts = 200, []
        for _ in range(40):
            x = (x * 4) // 5 + 10
            counts.append(x)  # decays 170 -> ... -> 50: nonzero variance
        got = {r["lag_k"]: r["pacf"] for r in pacf_lags(_mk_events(spark, counts), 3).collect()}
        assert abs(got[1]) > abs(got[2])

    def test_lag1_equals_acf1(self, spark):
        counts = [2, 5, 3, 7, 4, 6, 8, 1, 9, 2]
        ev = _mk_events(spark, counts)
        a1 = {r["lag_k"]: r["acf"] for r in acf_lags(ev, 2).collect()}[1]
        p1 = {r["lag_k"]: r["pacf"] for r in pacf_lags(ev, 2).collect()}[1]
        assert p1 == pytest.approx(a1, abs=1e-6)


class TestNdcg:
    def test_perfect_ranking_gives_one(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import ndcg_report

        # 1 query (id 7 with mod 100), clustered vectors: IVF with
        # nprobe=2 of 2 centroids sees the whole corpus => approx ==
        # exact => ndcg == 1 for every query
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [
            (i, [float(v) for v in rng.randn(8)]) for i in range(40)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = ndcg_report(emb, k=5, n_centroids=2, nprobe=2).collect()
        assert len(got) == 1
        assert got[0]["n_hit"] == 5
        assert got[0]["ndcg"] == pytest.approx(1.0, abs=1e-6)
        # dcg == idcg == the documented 9-dp literal
        assert got[0]["dcg"] == pytest.approx(2.948459, abs=1e-6)

    def test_ndcg_discounts_late_hits(self, spark):
        # pure math check of the discount: a single hit at rank 5 is
        # worth 1/log2(6) / idcg
        idcg = 2.948459119
        assert round(round(1.0 / math.log2(6), 9) / idcg, 6) < round(
            round(1.0 / math.log2(2), 9) / idcg, 6
        )


class TestNbLangid:
    def test_separable_corpus_perfect_diagonal(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            nb_langid_confusion,
        )

        rows = [
            (1, "der hund und die katze", "de", "s", 22),
            (2, "die der und ist nicht", "de", "s", 21),
            (3, "the cat and the dog", "en", "s", 19),
            (4, "the of and to in", "en", "s", 16),
            (5, "el la de que y", "es", "s", 14),
            (6, "la el en de que", "es", "s", 15),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {(r["true_lang"], r["pred_lang"]): r["n_docs"]
               for r in nb_langid_confusion(docs).collect()}
        assert got == {("de", "de"): 2, ("en", "en"): 2, ("es", "es"): 2}

    def test_prior_decides_empty_docs(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            nb_langid_confusion,
        )

        # token-less doc (normalizes to '') falls back to the prior:
        # majority lang wins
        rows = [
            (1, "the cat and dog", "en", "s", 15),
            (2, "the of and to", "en", "s", 13),
            (3, "el la de que", "es", "s", 12),
            (4, "   ", "es", "s", 3),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {(r["true_lang"], r["pred_lang"]): r["n_docs"]
               for r in nb_langid_confusion(docs).collect()}
        assert got[("es", "en")] == 1  # empty doc predicted by the en-majority prior
