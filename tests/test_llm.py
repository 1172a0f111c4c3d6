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


class TestMultimodalParts:
    """D6 parts array through the LLM map (worker.py:69-98, 313-319)."""

    PARTS = [
        {"ptype": "text", "content": "Please analyze image: a/x.png"},
        {"ptype": "image_url", "content": "data:image/png;base64,QUJD"},
        {"ptype": "text", "content": "File: a/y.txt\nbody text"},
    ]

    def test_http_wire_format_parity(self):
        """build_body must emit the reference's exact parts shape."""
        from openrouter_batch_processor_spark.operators.llm import HttpTransport

        t = HttpTransport(LLMConfig(system_prompt="sys", model="m"), api_key="k")
        body = t.build_body(None, parts=self.PARTS)
        assert body["messages"][0] == {"role": "system", "content": "sys"}
        user = body["messages"][1]
        assert user["role"] == "user"
        assert user["content"] == [
            {"type": "text", "text": "Please analyze image: a/x.png"},
            {"type": "image_url", "image_url": {"url": "data:image/png;base64,QUJD"}},
            {"type": "text", "text": "File: a/y.txt\nbody text"},
        ]
        # text-only path keeps the plain-string content form
        assert t.build_body("plain")["messages"][1]["content"] == "plain"

    def test_mock_hashes_canonical_serialization(self):
        cfg = LLMConfig(system_prompt="sys")
        r = MockTransport(cfg).complete(None, parts=self.PARTS)
        ser = (
            "text|Please analyze image: a/x.png\n\n"
            "image_url|data:image/png;base64,QUJD\n\n"
            "text|File: a/y.txt\nbody text"
        )
        assert r["content"] == md5(f"sys\n{ser}".encode()).hexdigest()
        # image part charges the flat rate, text parts their ws tokens
        assert r["prompt_tokens"] == 4 + 85 + 4

    def test_llm_map_routes_parts_column(self, spark):
        from pyspark.sql import types as T
        from openrouter_batch_processor_spark.operators.llm import PART_SCHEMA

        schema = T.StructType(
            [
                T.StructField("group_id", T.StringType()),
                T.StructField("prompt", T.StringType()),
                T.StructField("file_count", T.LongType()),
                T.StructField("sentinel", T.StringType()),
                T.StructField("parts", T.ArrayType(PART_SCHEMA)),
            ]
        )
        df = spark.createDataFrame(
            [
                ("img/", None, 1, None, [("text", "t1"), ("image_url", "u1")]),
                ("txt/", "fallback prompt", 1, None, None),
            ],
            schema,
        )
        rows = {r["file"]: r for r in llm_map(df, LLMConfig(system_prompt="s"), MockTransport).collect()}
        assert rows["img/"]["output"] == md5(b"s\ntext|t1\n\nimage_url|u1").hexdigest()
        assert rows["img/"]["prompt_tokens"] == 1 + 85
        # null parts cell falls back to the prompt string
        assert rows["txt/"]["output"] == md5(b"s\nfallback prompt").hexdigest()
