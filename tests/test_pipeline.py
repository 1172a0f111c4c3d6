"""End-to-end flagship pipeline smoke on sf0.001 (driver entry parity)."""

from __future__ import annotations

from tests.conftest import SF_DIR


class TestPipeline:
    def test_entry_rows_and_schema(self, spark):
        from openrouter_batch_processor_spark.plans.pipeline import run_llm_pipeline

        df = run_llm_pipeline(spark, SF_DIR)
        rows = df.collect()
        assert len(rows) > 0
        assert df.columns == [
            "file",
            "output",
            "ok",
            "prompt_tokens",
            "completion_tokens",
            "total_tokens",
            "cost",
        ]
        # deterministic mock: outputs are md5 hex
        assert all(len(r["output"]) == 32 for r in rows)
        assert all(r["ok"] for r in rows)

    def test_deterministic_across_runs(self, spark):
        from openrouter_batch_processor_spark.plans.pipeline import run_llm_pipeline

        a = sorted((r["file"], r["output"]) for r in run_llm_pipeline(spark, SF_DIR).collect())
        b = sorted((r["file"], r["output"]) for r in run_llm_pipeline(spark, SF_DIR).collect())
        assert a == b
