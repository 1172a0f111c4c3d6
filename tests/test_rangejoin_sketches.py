"""Banded range join correctness vs naive, and KMV sketch accuracy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.rangejoin import banded_range_count
from openrouter_batch_processor_spark.operators.sketches import kmv_distinct


def _t0(minutes):
    return dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(minutes=minutes)


class TestBandedRangeJoin:
    def test_matches_naive_on_boundaries(self, spark):
        # probe at t=0; events at exactly ±30min (in), ±31min (out),
        # bucket-boundary stragglers, other-key noise
        probe = spark.createDataFrame(
            [(1, "u", _t0(0)), (2, "u", _t0(100))], "id long, k string, ts timestamp"
        )
        events = spark.createDataFrame(
            [
                ("u", _t0(-31)), ("u", _t0(-30)), ("u", _t0(-1)),
                ("u", _t0(0)), ("u", _t0(29)), ("u", _t0(30)), ("u", _t0(31)),
                ("x", _t0(0)),  # other key
                ("u", _t0(99)),
            ],
            "k string, ts timestamp",
        )
        out = {
            r["id"]: r["n_in_range"]
            for r in banded_range_count(
                probe, events, keys=["k"], ts_col="ts", window_seconds=1800
            ).collect()
        }
        # in-range for probe 1: -30, -1, 0, 29, 30  (±31 excluded)
        assert out[1] == 5
        # probe 2 at t=100: events at 99 (and 129..71 none besides)
        assert out[2] == 1

    def test_zero_matches_kept(self, spark):
        probe = spark.createDataFrame([(1, "lonely", _t0(0))], "id long, k string, ts timestamp")
        events = spark.createDataFrame([("other", _t0(0))], "k string, ts timestamp")
        rows = banded_range_count(probe, events, ["k"], "ts", 1800).collect()
        assert rows[0]["n_in_range"] == 0


class TestKMV:
    def test_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [("a", f"v{i % 7}") for i in range(100)], "g string, v string"
        )
        row = kmv_distinct(df, ["g"], "v", k=16).head()
        assert row["n_hashes"] == 7
        assert row["distinct_est"] == 7.0  # exact when < k

    def test_estimate_within_tolerance(self, spark):
        n = 5000
        df = spark.createDataFrame(
            [("a", f"value_{i}") for i in range(n)], "g string, v string"
        )
        row = kmv_distinct(df, ["g"], "v", k=64).head()
        # KMV relative error ~ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 3 sigma
        assert abs(row["distinct_est"] - n) / n < 0.4
        assert row["n_hashes"] == n  # no md5 collisions at this size

    def test_deterministic(self, spark):
        df = spark.createDataFrame(
            [("a", f"value_{i}") for i in range(1000)], "g string, v string"
        )
        e1 = kmv_distinct(df, ["g"], "v").head()["distinct_est"]
        e2 = kmv_distinct(df.orderBy(F.rand(seed=1)), ["g"], "v").head()["distinct_est"]
        assert e1 == e2  # order-independent, engine-reproducible
