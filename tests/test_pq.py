"""Product-quantization ADC audit: when every vector IS a codeword
(corpus == the 16 seed vectors), quantization is lossless, ADC
distances equal exact distances, and recall@k must be 1.0."""

from __future__ import annotations

import random

from openrouter_batch_processor_spark.operators.similarity import pq_adc_recall


def _vecs(n, dim=64, seed=7):
    rng = random.Random(seed)
    return [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)]) for i in range(n)
    ]


def test_lossless_quantization_has_perfect_recall(spark):
    emb = spark.createDataFrame(_vecs(16), "vec_id long, embedding array<float>")
    rows = pq_adc_recall(
        emb, m_sub=4, sub_dim=16, n_codes=16, n_queries=5, k=3
    ).collect()
    assert len(rows) == 5
    assert all(r["recall_at_k"] == 1.0 and r["n_hits"] == 3 for r in rows)


def test_report_shape_and_bounds(spark):
    emb = spark.createDataFrame(_vecs(60), "vec_id long, embedding array<float>")
    rows = pq_adc_recall(
        emb, m_sub=4, sub_dim=16, n_codes=16, n_queries=8, k=5
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_at_k"] == round(r["n_hits"] / 5.0, 6)
