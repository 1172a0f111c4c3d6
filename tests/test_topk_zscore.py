"""Window-free per-group top-k and z-score anomaly semantics."""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.aggregates import anomaly_zscore
from openrouter_batch_processor_spark.operators.skew import topk_per_group_agg


class TestTopkPerGroupAgg:
    def test_order_ties_and_truncation(self, spark):
        df = spark.createDataFrame(
            [
                ("g1", 10.0, 3, "c"),
                ("g1", 10.0, 1, "a"),  # tie on score -> lower id first
                ("g1", 20.0, 2, "b"),
                ("g1", 5.0, 4, "d"),
                ("g2", 1.0, 9, "z"),
            ],
            "grp string, score double, item long, name string",
        )
        rows = topk_per_group_agg(df, "grp", "score", 3, ["item", "name"]).collect()
        got = [(r["grp"], r["rank"], r["score"], r["item"]) for r in rows]
        assert sorted(got) == [
            ("g1", 1, 20.0, 2),
            ("g1", 2, 10.0, 1),
            ("g1", 3, 10.0, 3),
            ("g2", 1, 1.0, 9),
        ]

    def test_group_smaller_than_k(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 1, "a")], "grp string, score double, item long, name string"
        )
        rows = topk_per_group_agg(df, "grp", "score", 5, ["item", "name"]).collect()
        assert len(rows) == 1 and rows[0]["rank"] == 1


class TestAnomalyZscore:
    def test_flags_only_the_outlier(self, spark):
        # 40 values near 10, one at 1000: only event 99 crosses |z| > 3
        rows = [(i, "t", 10.0 + (i % 5) * 0.1) for i in range(40)]
        rows.append((99, "t", 1000.0))
        df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        got = anomaly_zscore(df, threshold=3.0).collect()
        assert [r["event_id"] for r in got] == [99]
        assert got[0]["z"] > 3.0

    def test_uniform_group_flags_nothing(self, spark):
        # zero variance -> z undefined (null after division) -> no rows
        df = spark.createDataFrame(
            [(i, "t", 7.0) for i in range(10)],
            "event_id long, event_type string, value double",
        )
        assert anomaly_zscore(df, threshold=3.0).collect() == []


class TestExactMedianEvenGroups:
    def test_even_group_size_returns_lower_median(self, spark):
        """Regression: with an EVEN group size the rank filter must
        still emit a row (floor((n+1)/2), not true division)."""
        from openrouter_batch_processor_spark.registry import REGISTRY
        import tempfile, os

        docs = spark.createDataFrame(
            [(i, f"t{i}", "en", "srcE", 10 * (i + 1)) for i in range(4)]
            + [(10 + i, f"t{i}", "en", "srcO", 100 * (i + 1)) for i in range(3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with tempfile.TemporaryDirectory() as d:
            docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
            out = {r["source"]: r for r in
                   REGISTRY["stats_exact_median"].fn(spark, d).collect()}
        assert out["srcE"]["median_chars"] == 20  # lower median of 10,20,30,40
        assert out["srcO"]["median_chars"] == 200  # true median of 100,200,300
