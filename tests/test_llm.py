"""S10 LLM map operator: mock determinism, T5 fault isolation, sentinels."""

from __future__ import annotations

from hashlib import md5

from openrouter_batch_processor_spark.operators.llm import (
    LLMConfig,
    MockTransport,
    llm_map,
)


def _failing_transport():
    # Defined inside a function so cloudpickle serializes it by value —
    # executors can't import the tests package.
    class FailingTransport:
        def __init__(self, config):
            pass

        def complete(self, prompt):
            raise RuntimeError("boom")

    return FailingTransport


def _groups(spark, rows):
    return spark.createDataFrame(
        rows, "group_id string, prompt string, file_count long, sentinel string"
    )


class TestLLMMap:
    def test_mock_is_deterministic_md5(self, spark):
        cfg = LLMConfig(system_prompt="sys")
        df = _groups(spark, [("g1/", "hello world", 1, None)])
        row = llm_map(df, cfg, MockTransport).head()
        assert row["output"] == md5(b"sys\nhello world").hexdigest()
        assert row["ok"] is True
        assert row["prompt_tokens"] == 2
        assert row["total_tokens"] == 3
        assert row["cost"] == round(2e-6, 12)

    def test_errors_become_rows_not_failures(self, spark):
        cfg = LLMConfig()
        df = _groups(spark, [("g1/", "x", 1, None), ("g2/", "y", 1, None)])
        rows = {r["file"]: r for r in llm_map(df, cfg, _failing_transport()).collect()}
        assert len(rows) == 2
        for r in rows.values():
            assert r["ok"] is False
            assert r["output"].startswith("ERROR: ")
            assert r["total_tokens"] == 0

    def test_sentinels_short_circuit(self, spark):
        cfg = LLMConfig()
        df = _groups(
            spark,
            [
                ("empty/", None, 0, "Empty folder"),
                ("bad/", None, 1, "Unsupported file type"),
                ("ok/", "hi", 1, None),
            ],
        )
        # Failing transport proves sentinel rows never reach the transport.
        rows = {r["file"]: r for r in llm_map(df, cfg, _failing_transport()).collect()}
        assert rows["empty/"]["output"] == "Empty folder"
        assert rows["empty/"]["ok"] is True
        assert rows["bad/"]["output"] == "Unsupported file type"
        assert rows["ok/"]["ok"] is False  # the real call did fail
