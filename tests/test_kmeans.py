"""Deterministic mini k-means: separation, determinism, partitioning
invariance of the exact-decimal centroid means."""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.kmeans import kmeans_lite


def _blob(center, n, spread=0.01):
    # deterministic tiny perturbations around a 64-dim center
    out = []
    for i in range(n):
        out.append([center + spread * ((i * 31 + d * 7) % 5 - 2) for d in range(64)])
    return out


class TestKmeansLite:
    def test_two_blobs_separate(self, spark):
        vecs = _blob(0.0, 6) + _blob(10.0, 6)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
        )
        rows = kmeans_lite(df, k=2, iters=2).collect()
        by_id = {r["vec_id"]: r["cluster_id"] for r in rows}
        low = {by_id[i] for i in range(6)}
        high = {by_id[i] for i in range(6, 12)}
        assert len(low) == 1 and len(high) == 1 and low != high
        assert all(r["cluster_size"] == 6 for r in rows)

    def test_partitioning_invariant(self, spark):
        vecs = _blob(0.0, 5) + _blob(3.0, 5) + _blob(-4.0, 5)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
        )
        r1 = sorted(map(tuple, kmeans_lite(df.coalesce(1), k=3, iters=2).collect()))
        r8 = sorted(map(tuple, kmeans_lite(df.repartition(8), k=3, iters=2).collect()))
        assert r1 == r8


def test_cluster_label_agreement_perfect_vs_shuffled(spark):
    import numpy as np
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from openrouter_batch_processor_spark.operators.kmeans import (
        cluster_label_agreement,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    rng = np.random.default_rng(17)
    rows, shuffled = [], []
    i = 0
    for lbl, (cx, cy) in enumerate([(0.0, 0.0), (30.0, 30.0)]):
        for _ in range(12):
            v = [float(rng.normal(cx, 0.2)), float(rng.normal(cy, 0.2)), 0.0, 0.0]
            rows.append(Row(vec_id=i, embedding=v, label=lbl))
            shuffled.append(Row(vec_id=i, embedding=v, label=i % 2))
            i += 1
    good = cluster_label_agreement(
        spark.createDataFrame(rows, schema), k=2
    ).collect()[0]
    assert good["purity"] == 1.0
    assert good["nmi"] == 1.0
    assert good["ari"] == 1.0
    bad = cluster_label_agreement(
        spark.createDataFrame(shuffled, schema), k=2
    ).collect()[0]
    assert bad["purity"] <= 0.75
    assert bad["nmi"] < 0.2
    assert abs(bad["ari"]) < 0.2
