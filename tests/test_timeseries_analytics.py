"""Round-4 time-series analytics: ACF, classical seasonal
decomposition, MAD anomalies — each checked against an independent
pure-Python reference on constructed series (value parity vs DuckDB is
the registry oracle's job)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from openrouter_batch_processor_spark.operators.timeseries import (
    acf_lags,
    mad_anomalies,
    seasonal_decompose_hod,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, counts_by_hour: dict[str, list[int]], values=None):
    """One event row per unit of count, type t hour h -> counts[t][h]
    events inside that hour."""
    rows = []
    eid = 0
    for etype, counts in counts_by_hour.items():
        for h, c in enumerate(counts):
            for j in range(c):
                eid += 1
                v = values[etype][h][j] if values else float(j)
                rows.append(
                    (eid, T0 + dt.timedelta(hours=h, minutes=j % 50), 1, etype, v, "{}")
                )
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _py_acf(xs: list[int], k: int) -> float:
    n = len(xs)
    mean = sum(xs) / n
    num = sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
    den = sum((x - mean) ** 2 for x in xs)
    return num / den


class TestAcf:
    def test_matches_pure_python(self, spark):
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
        ev = _mk_events(spark, {"click": xs})
        got = {r["lag_k"]: r["acf"] for r in acf_lags(ev).collect()}
        for k in range(1, 7):
            assert got[k] == pytest.approx(_py_acf(xs, k), abs=2e-6), k

    def test_perfect_period_two_series(self, spark):
        # alternating series: acf(1) strongly negative, acf(2) positive
        xs = [1, 9] * 10
        ev = _mk_events(spark, {"click": xs})
        got = {r["lag_k"]: r["acf"] for r in acf_lags(ev).collect()}
        assert got[1] < -0.8
        assert got[2] > 0.8


class TestSeasonalDecompose:
    def test_recovers_planted_hour_of_day_cycle(self, spark):
        # 5 days of hourly data with a clean 24h cycle on a flat base:
        # seasonal(hod) must rank exactly like the planted cycle
        cycle = [5 + (3 if h == 12 else 0) - (2 if h == 3 else 0) for h in range(24)]
        xs = cycle * 5
        ev = _mk_events(spark, {"view": xs})
        rows = seasonal_decompose_hod(ev).collect()
        seas = {r["hod"]: r["seasonal"] for r in rows}
        assert max(seas, key=seas.get) == 12
        assert min(seas, key=seas.get) == 3
        # additive decomposition of a pure cycle + constant: seasonal
        # components average out near zero
        assert abs(sum(seas.values())) / len(seas) < 0.5

    def test_only_full_windows_enter(self, spark):
        xs = [2] * 30  # 30 hourly points -> 30-24=6 full 25-windows
        ev = _mk_events(spark, {"view": xs})
        rows = seasonal_decompose_hod(ev).collect()
        assert sum(r["n_windows"] for r in rows) == 6
        # constant series: zero seasonal everywhere
        assert all(r["seasonal"] == 0.0 for r in rows)


class TestMadAnomalies:
    def test_matches_pure_python(self, spark):
        vals = [1.0, 1.1, 0.9, 1.2, 0.8, 1.0, 1.05, 50.0, -40.0, 1.15]
        ev = _mk_events(
            spark,
            {"purchase": [len(vals)]},
            values={"purchase": [vals]},
        )
        row = mad_anomalies(ev).collect()[0]
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]  # lower median
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        out = sum(1 for v in vals if abs(v - med) > 3.0 * 1.4826 * mad)
        assert row["med"] == med
        assert row["mad"] == pytest.approx(mad, abs=0)
        assert row["n_outliers"] == out
        assert out == 2  # the planted 50.0 and -40.0

    def test_constant_series_has_no_outliers(self, spark):
        ev = _mk_events(
            spark, {"signup": [4]}, values={"signup": [[2.0, 2.0, 2.0, 2.0]]}
        )
        row = mad_anomalies(ev).collect()[0]
        assert row["mad"] == 0.0
        assert row["n_outliers"] == 0


def test_randomized_acf_against_reference(spark):
    import random

    rng = random.Random(42)
    xs = [rng.randint(1, 12) for _ in range(40)]
    ev = _mk_events(spark, {"error": xs})
    got = {r["lag_k"]: r["acf"] for r in acf_lags(ev).collect()}
    for k in range(1, 7):
        assert got[k] == pytest.approx(_py_acf(xs, k), abs=2e-6), k
