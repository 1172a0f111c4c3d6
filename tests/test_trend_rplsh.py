"""Random-hyperplane LSH signature properties and one-pass OLS trend."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.aggregates import (
    TREND_EPOCH0,
    linear_trend,
)
from openrouter_batch_processor_spark.operators.similarity import (
    RP_PLANES,
    rp_candidate_pairs,
    rp_signatures,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestRpSignatures:
    def test_identical_vectors_same_signature(self, spark):
        v = [float(i % 7) - 3.0 for i in range(64)]
        sigs = {r["vec_id"]: r["rp_sig"] for r in rp_signatures(_vecs(spark, [(1, v), (2, v)])).collect()}
        assert sigs[1] == sigs[2]

    def test_negated_vector_flips_every_bit(self, spark):
        v = [float(i % 7) - 3.0 for i in range(64)]
        neg = [-x for x in v]
        sigs = {r["vec_id"]: r["rp_sig"] for r in rp_signatures(_vecs(spark, [(1, v), (2, neg)])).collect()}
        # dot(w, -v) = -dot(w, v): every sign bit flips (no dot is exactly 0
        # for this vector), so the signatures are bitwise complements.
        assert sigs[1] ^ sigs[2] == (1 << RP_PLANES) - 1

    def test_duplicate_vectors_become_candidate_pair(self, spark):
        v = [float((i * 13) % 11) - 5.0 for i in range(64)]
        far = [-x for x in v]
        pairs = rp_candidate_pairs(
            _vecs(spark, [(1, v), (2, v), (3, far)]), threshold=0.9
        ).collect()
        assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in pairs] == [(1, 2, 1.0)]


class TestLinearTrend:
    def test_recovers_exact_line(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for g, (slope, icept) in (("a", (2.0, 5.0)), ("b", (-0.5, 100.0))):
            for i in range(10):
                x = i * 3600
                rows.append((g, t0 + dt.timedelta(seconds=x), slope * x + icept))
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        got = {r["event_type"]: r for r in linear_trend(df).collect()}
        assert (got["a"]["slope"], got["a"]["intercept"]) == (2.0, 5.0)
        assert (got["b"]["slope"], got["b"]["intercept"]) == (-0.5, 100.0)
        assert got["a"]["n"] == 10

    def test_partitioning_invariant(self, spark):
        # exact decimal moments: same result at any partition count
        t0 = dt.datetime(2024, 1, 5)
        rows = [
            ("g", t0 + dt.timedelta(seconds=i * 37), (i * 7919 % 101) / 3.0)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        r1 = linear_trend(df.coalesce(1)).collect()[0]
        r32 = linear_trend(df.repartition(32)).collect()[0]
        assert (r1["slope"], r1["intercept"]) == (r32["slope"], r32["intercept"])
