"""Banded range join correctness vs naive, and KMV sketch accuracy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.rangejoin import banded_range_count
from openrouter_batch_processor_spark.operators.sketches import (
    binned_quantiles,
    hll_distinct,
    kmv_distinct,
)


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


class TestHLL:
    def test_estimate_within_tolerance(self, spark):
        n = 5000
        df = spark.createDataFrame(
            [("a", f"value_{i}") for i in range(n)], "g string, v string"
        )
        row = hll_distinct(df, ["g"], "v").head()
        # HLL std error 1.04/sqrt(m) ≈ 13% at m=64; allow 3 sigma
        assert abs(row["hll_est"] - n) / n < 0.4
        assert row["exact_distinct"] == n  # no md5 collisions at this size
        assert row["n_buckets"] == 64  # all registers touched at n >> m

    def test_deterministic(self, spark):
        df = spark.createDataFrame(
            [("a", f"value_{i}") for i in range(1000)], "g string, v string"
        )
        e1 = hll_distinct(df, ["g"], "v").head()["hll_est"]
        e2 = hll_distinct(df.orderBy(F.rand(seed=3)), ["g"], "v").head()["hll_est"]
        assert e1 == e2  # order-independent, engine-reproducible

    def test_duplicates_ignored(self, spark):
        df = spark.createDataFrame(
            [("a", f"v{i % 9}") for i in range(500)], "g string, v string"
        )
        row = hll_distinct(df, ["g"], "v").head()
        assert row["exact_distinct"] == 9
        assert row["n_buckets"] <= 9  # at most one register per distinct


class TestBinnedQuantiles:
    def test_exact_on_bucket_boundaries(self, spark):
        # values 1..100 with width 1: bucket i holds value i -> the
        # p-th percentile bucket is exactly p and its upper edge p+1
        df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
        row = binned_quantiles(df, "v", 1.0).collect()[0]
        assert row["total"] == 100
        assert (row["p50_bucket"], row["p90_bucket"], row["p99_bucket"]) == (50, 90, 99)
        assert row["p50_value"] == 51.0

    def test_error_bounded_by_width(self, spark):
        import random

        rng = random.Random(7)
        vals = sorted(rng.uniform(0, 1000) for _ in range(999))
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        width = 50.0
        row = binned_quantiles(df, "v", width).collect()[0]
        for p in (50, 90, 99):
            true_q = vals[(999 * p + 99) // 100 - 1]  # ceil(n*p/100)-th smallest
            got = row[f"p{p}_value"]
            assert true_q <= got <= true_q + width + 1e-9

    def test_skips_empty_buckets(self, spark):
        # two far-apart clusters: cum window must jump the gap correctly
        df = spark.createDataFrame([(1.0,)] * 60 + [(9999.0,)] * 40, ["v"])
        row = binned_quantiles(df, "v", 10.0).collect()[0]
        assert row["p50_bucket"] == 0
        assert row["p90_bucket"] == 999


class TestBloomMembership:
    def test_no_false_negatives_and_exact_counts(self, spark):
        from openrouter_batch_processor_spark.operators.sketches import bloom_membership

        build = spark.createDataFrame([(f"v{i}",) for i in range(40)], "v string")
        probe = spark.createDataFrame([(f"v{i}",) for i in range(200)], "v string")
        row = bloom_membership(build, probe, "v", m=64, k=3).head()
        assert row["n_probes"] == 200
        assert row["n_members"] == 40
        # a Bloom filter can overshoot but NEVER undershoot membership
        assert row["n_candidates"] >= row["n_members"]
        assert row["n_false_pos"] == row["n_candidates"] - row["n_members"]
        assert 0 < row["bits_set"] <= 64


class TestCountMinSketch:
    def test_never_underestimates(self, spark):
        from openrouter_batch_processor_spark.operators.sketches import (
            cms_heavy_hitter_counts,
        )

        terms = spark.createDataFrame(
            [(f"t{i}", (i % 7) + 1) for i in range(300)], "term string, cnt long"
        )
        rows = cms_heavy_hitter_counts(terms, w=64, d=3, k=10).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["cms_est"] >= r["true_count"]


def test_sample_quantiles_mergeable_and_exact_on_small_groups(spark):
    """Groups smaller than k: the sample IS the population, so the
    quantiles are the exact order statistics; larger groups stay
    bounded at k."""
    from openrouter_batch_processor_spark.operators.sketches import sample_quantiles

    rows = [(i, "small", float(i)) for i in range(11)]  # 0..10
    rows += [(100 + i, "big", float(i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_type"]: r for r in
           sample_quantiles(df, "event_type", "value", "event_id", k=64).collect()}
    small = out["small"]
    assert small["n_sample"] == 11 and small["n_rows"] == 11
    # exact order statistics of 0..10
    assert (small["q10"], small["q50"], small["q90"]) == (1.0, 5.0, 9.0)
    big = out["big"]
    assert big["n_sample"] == 64 and big["n_rows"] == 500
    # sample quantiles live inside the population range, ordered
    assert 0.0 <= big["q10"] <= big["q25"] <= big["q50"] <= big["q75"] <= big["q90"] <= 49.0
