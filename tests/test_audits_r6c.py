"""Round-6 batch 5: Cramér's V, Chao1, Ljung-Box, Mahalanobis
outliers — hand-verified against pure-Python references."""

from __future__ import annotations

import math

import pytest

from openrouter_batch_processor_spark.operators.corpusaudit import (
    chao1_vocab,
    cramers_v,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestCramersV:
    def test_matches_bruteforce_chi2(self, spark):
        rows = [
            (1, "a", "en", "s1", 1),
            (2, "b", "en", "s1", 1),
            (3, "c", "es", "s1", 1),
            (4, "d", "en", "s2", 1),
            (5, "e", "es", "s2", 1),
            (6, "f", "es", "s2", 1),
            (7, "g", "de", "s2", 1),
        ]
        got = cramers_v(_mk_docs(spark, rows)).collect()[0]
        from collections import Counter

        obs = Counter((s, l) for (_i, _t, l, s, _n) in rows)
        rm = Counter(s for (_i, _t, _l, s, _n) in rows)
        cm = Counter(l for (_i, _t, l, _s, _n) in rows)
        n = len(rows)
        chi2 = 0.0
        for s in rm:
            for l in cm:  # noqa: E741
                o = obs.get((s, l), 0)
                chi2 += round(
                    (o * n - rm[s] * cm[l]) ** 2 / (n * rm[s] * cm[l]), 9
                )
        v = math.sqrt(chi2 / (n * (min(len(rm), len(cm)) - 1)))
        assert got["n_docs"] == n
        assert got["n_rows"] == 2 and got["n_cols"] == 3
        assert got["dof"] == 2
        assert got["chi2"] == pytest.approx(round(chi2, 6), abs=1e-6)
        assert got["cramers_v"] == pytest.approx(round(v, 6), abs=1e-6)

    def test_independent_table_gives_zero(self, spark):
        # perfectly proportional margins => chi2 == 0
        rows = []
        i = 0
        for s in ("s1", "s2"):
            for l, k in (("en", 2), ("es", 2)):  # noqa: E741
                for _ in range(k):
                    i += 1
                    rows.append((i, "x", l, s, 1))
        got = cramers_v(_mk_docs(spark, rows)).collect()[0]
        assert got["chi2"] == 0.0
        assert got["cramers_v"] == 0.0


class TestChao1:
    def test_matches_formula(self, spark):
        # terms: aa x3, bb x2, cc x1, dd x1  => V=4, f1=2, f2=1
        rows = [
            (1, "aa bb cc", "en", "s", 8),
            (2, "aa bb dd", "en", "s", 8),
            (3, "aa", "en", "s", 2),
        ]
        got = chao1_vocab(_mk_docs(spark, rows)).collect()[0]
        assert got["v_obs"] == 4
        assert got["f1"] == 2
        assert got["f2"] == 1
        assert got["n_tokens"] == 7
        assert got["chao1"] == pytest.approx(4 + 2 * 1 / (2 * 2), abs=1e-9)

    def test_no_singletons_means_no_extra(self, spark):
        rows = [(1, "aa aa bb bb", "en", "s", 11)]
        got = chao1_vocab(_mk_docs(spark, rows)).collect()[0]
        assert got["f1"] == 0
        assert got["chao1"] == got["v_obs"]


class TestLjungBox:
    def test_matches_reference_sum(self, spark):
        import datetime as dt

        from openrouter_batch_processor_spark.operators.timeseries import (
            acf_lags,
            ljung_box,
        )

        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
        rows = []
        base = dt.datetime(2024, 1, 1)
        for h, c in enumerate(counts):
            for i in range(c):
                rows.append(
                    (h * 100 + i, "tick", base + dt.timedelta(hours=h), 1.0, "u", "{}")
                )
        ev = spark.createDataFrame(
            rows,
            "event_id long, event_type string, ts timestamp, value double, "
            "user_id string, props string",
        )
        acf = {r["lag_k"]: r["acf"] for r in acf_lags(ev, 6).collect()}
        got = ljung_box(ev).collect()[0]
        n = len(counts)
        ssum = sum(round(acf[k] ** 2 / (n - k), 12) for k in range(1, 7))
        q = (n * (n + 2)) * ssum
        assert got["n"] == n
        assert got["df"] == 6
        assert got["q_stat"] == pytest.approx(round(q, 6), abs=1e-6)
        z = (
            (q / 6.0) ** (1.0 / 3.0) - (1.0 - 2.0 / 54.0)
        ) / (2.0 / 54.0) ** 0.5
        assert got["z_wh"] == pytest.approx(round(z, 6), abs=1e-6)


class TestMahalanobis:
    def test_planted_outlier_ranks_first(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            mahalanobis_outliers,
        )

        import numpy as np

        rng = np.random.RandomState(3)
        rows = [(i, [float(v) for v in rng.randn(4)]) for i in range(30)]
        rows.append((99, [25.0, -25.0, 25.0, -25.0]))  # planted
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = mahalanobis_outliers(emb, k=3).collect()
        assert got[0]["vec_id"] == 99
        assert got[0]["md2"] > got[1]["md2"]

    def test_matches_pure_python(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            mahalanobis_outliers,
        )

        vecs = {
            1: [1.0, 2.0],
            2: [2.0, 0.0],
            3: [0.0, 1.0],
            4: [3.0, 3.0],
        }
        emb = spark.createDataFrame(
            list(vecs.items()), "vec_id long, embedding array<double>"
        )
        got = {r["vec_id"]: r["md2"] for r in mahalanobis_outliers(emb, k=4).collect()}
        n = len(vecs)
        for d in range(2):
            pass
        mus = [sum(v[d] for v in vecs.values()) / n for d in range(2)]
        vars_ = [
            sum(v[d] ** 2 for v in vecs.values()) / n - mus[d] ** 2 for d in range(2)
        ]
        for i, v in vecs.items():
            ref = sum(
                round((v[d] - mus[d]) ** 2 / vars_[d], 9) for d in range(2)
            )
            assert got[i] == pytest.approx(round(ref, 6), abs=1e-6)
