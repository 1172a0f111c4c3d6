"""Round-6 corpus audits: DSIR ESS, quality ECE, Good-Turing, Heaps'
law — each verified against a pure-Python reference."""

from __future__ import annotations

import math

import pytest

from openrouter_batch_processor_spark.operators.textanalysis import (
    dsir_ess,
    good_turing,
    heaps_fit,
    quality_ece,
)


class TestDsirEss:
    def test_identical_docs_give_full_ess(self, spark):
        docs = spark.createDataFrame(
            [(i, "same text every time", "en") for i in range(8)],
            "doc_id long, text string, lang string",
        )
        row = dsir_ess(docs).head()
        assert row["n_docs"] == 8
        assert row["ess"] == pytest.approx(8.0, abs=1e-6)
        assert row["ess_frac"] == pytest.approx(1.0, abs=1e-6)

    def test_matches_formula_on_mixed_corpus(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            dsir_logweights,
        )

        docs = spark.createDataFrame(
            [
                (1, "the fast cat and the dog", "en"),
                (2, "la casa grande del perro", "es"),
                (3, "the slow dog sleeps", "en"),
                (4, "der hund ist klein", "de"),
            ],
            "doc_id long, text string, lang string",
        )
        lws = [r["log_weight"] for r in dsir_logweights(docs).collect()]
        mx = max(lws)
        ws = [round(math.exp(lw - mx), 9) for lw in lws]
        want = sum(ws) ** 2 / sum(round(w * w, 9) for w in ws)
        row = dsir_ess(docs).head()
        assert row["ess"] == pytest.approx(want, abs=1e-5)
        assert row["max_log_weight"] == pytest.approx(mx, abs=1e-9)


class TestQualityEce:
    def test_bins_partition_and_gap_is_conf_minus_acc(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the fast cat and the small dog run in the big field", "en"),
                (2, "xx yy zz xx yy zz !!! ???", "en"),
                (3, "la casa es grande y el perro es pequeno", "es"),
                (4, "!!! ??? ### $$$ %%%", "es"),
                (5, "the quick brown fox jumps over the lazy dog", "en"),
            ],
            "doc_id long, text string, lang string",
        )
        rows = quality_ece(docs).collect()
        assert sum(r["n_docs"] for r in rows) == 5
        for r in rows:
            assert 0 <= r["bin_id"] <= 9
            assert r["abs_gap"] == pytest.approx(abs(r["conf"] - r["acc"]), abs=2e-7)
            assert r["acc"] == pytest.approx(r["n_pos"] / r["n_docs"], abs=1e-6)
            # conf must sit inside (or on) its bin's edges
            assert r["bin_id"] / 10 - 1e-9 <= r["conf"] <= (r["bin_id"] + 1) / 10 + 1e-9


class TestGoodTuring:
    def test_hand_computed_fof_table(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        rows = {r["r"]: r for r in good_turing(docs).collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["n_r"] == rows[2]["n_r"] == rows[3]["n_r"] == 1
        # r* = (r+1) N_{r+1}/N_r
        assert rows[1]["r_star"] == pytest.approx(2.0)
        assert rows[2]["r_star"] == pytest.approx(3.0)
        assert rows[3]["r_star"] is None
        # missing mass P0 = N_1/N = 1/6 (floored on the 7dp grid)
        assert rows[1]["mass_frac"] == pytest.approx(1 / 6, abs=1e-6)
        assert rows[3]["mass_frac"] == pytest.approx(0.5, abs=1e-7)


def _reference_heaps(texts, j0=6):
    import re

    stream = []
    for _id, text in sorted(texts):
        stream.extend(re.sub(r"\s+", " ", text.lower()).strip().split(" "))
    first = {}
    for i, tok in enumerate(stream, start=1):
        first.setdefault(tok, i)
    n = len(stream)
    jmax = max(j0, n.bit_length() - 1)
    pts = []
    for j in range(j0, jmax + 1):
        v = sum(1 for fp in first.values() if fp <= 2**j)
        if v >= 1:
            pts.append((round(j * 0.6931471805599453, 6), round(math.log(v), 6)))
    np_ = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / np_)
    return n, len(first), np_, beta, k


class TestHeapsFit:
    def test_matches_pure_python_reference(self, spark):
        # ~1500-token stream with sub-linear vocab growth
        texts = [
            (i, " ".join(f"w{(j * j + i * 13) % (20 + i)}" for j in range(50)))
            for i in range(30)
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        row = heaps_fit(docs).head()
        n, v, np_, beta, k = _reference_heaps(texts)
        assert row["n_tokens"] == n
        assert row["vocab_size"] == v
        assert row["n_points"] == np_
        assert row["beta"] == pytest.approx(beta, abs=1e-6)
        assert row["k"] == pytest.approx(k, abs=1e-5)

    def test_square_root_growth_recovers_half(self, spark):
        # token at global position p is w_floor(sqrt(p)) -> V(n) ~ sqrt(n)
        toks = [f"w{math.isqrt(p)}" for p in range(1, 5001)]
        texts = [(i, " ".join(toks[i * 100 : (i + 1) * 100])) for i in range(50)]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        row = heaps_fit(docs).head()
        assert row["beta"] == pytest.approx(0.5, abs=0.06)


class TestMannKendall:
    def _events(self, spark, series):
        # series: {etype: [daily_value,...]} -> one event per day
        from datetime import datetime

        rows = []
        for et, vals in series.items():
            for i, v in enumerate(vals):
                rows.append(
                    (len(rows), datetime(2024, 1, i + 1, 12, 0, 0), 1, et, float(v), "{}")
                )
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    def test_monotone_series_detected_with_exact_s_and_sen(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            mann_kendall_sen,
        )

        n = 20
        ev = self._events(
            spark,
            {
                "up": [10 + 2 * i for i in range(n)],      # slope exactly 2
                "down": [100 - 3 * i for i in range(n)],   # slope exactly -3
                "flat": [7] * n,
            },
        )
        out = {r["event_type"]: r for r in mann_kendall_sen(ev).collect()}
        m = n * (n - 1) // 2
        assert out["up"]["s_stat"] == m and out["down"]["s_stat"] == -m
        assert out["up"]["trend"] == "increasing"
        assert out["down"]["trend"] == "decreasing"
        assert out["up"]["sen_slope"] == pytest.approx(2.0, abs=1e-9)
        assert out["down"]["sen_slope"] == pytest.approx(-3.0, abs=1e-9)
        # exact no-tie variance and continuity-corrected z
        var = n * (n - 1) * (2 * n + 5) / 18.0
        assert out["up"]["var_s"] == pytest.approx(var, abs=1e-6)
        assert out["up"]["z"] == pytest.approx((m - 1) / math.sqrt(var), abs=1e-6)

    def test_constant_series_is_no_trend_with_zero_variance_path(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            mann_kendall_sen,
        )

        ev = self._events(spark, {"const": [5] * 10})
        row = mann_kendall_sen(ev).head()
        # all ties: S=0, tie term cancels the variance, z hits the
        # S=0 branch (no divide-by-zero)
        assert row["s_stat"] == 0
        assert row["var_s"] == 0.0
        assert row["z"] == 0.0 and row["trend"] == "no_trend"

    def test_matches_pure_python_on_noisy_series(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            mann_kendall_sen,
        )

        vals = [((i * 7919) % 23) + 0.1 * i for i in range(25)]
        ev = self._events(spark, {"noisy": vals})
        row = mann_kendall_sen(ev).head()
        s = sum(
            (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        slopes = sorted(
            (vals[j] - vals[i]) / (j - i)
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        mid = (len(slopes) + 1) / 2
        lo, hi = slopes[math.floor(mid) - 1], slopes[math.ceil(mid) - 1]
        assert row["s_stat"] == s
        assert row["sen_slope"] == pytest.approx((lo + hi) / 2, abs=1e-6)


def test_source_ks_drift_detects_shifted_source(spark):
    from pyspark.sql import Row

    from openrouter_batch_processor_spark.operators.corpusaudit import (
        source_ks_drift,
    )

    rows = []
    i = 0
    # base: lengths 100..119 across two sources; shifted: 500..509
    for src, lo, n in [("a", 100, 20), ("b", 100, 20), ("shifted", 500, 10)]:
        for j in range(n):
            rows.append(Row(doc_id=i, source=src, n_chars=lo + j))
            i += 1
    out = {
        r["source"]: r
        for r in source_ks_drift(spark.createDataFrame(rows)).collect()
    }
    # disjoint support: the shifted source's CDF gap reaches 1.0
    assert out["shifted"]["ks_d"] == 1.0
    # the two identically-distributed sources drift only by the
    # shifted mass inside their "rest" comparison (10/30 = 0.333...)
    assert abs(out["a"]["ks_d"] - 1 / 3) < 1e-4
    assert abs(out["b"]["ks_d"] - 1 / 3) < 1e-4
