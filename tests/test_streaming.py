"""Structured Streaming tests: stream(availableNow) output == batch
output on the same data (the streaming correctness oracle), session
windows, and the T1/T2 progress counters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.streaming.windows import (
    progress_stream,
    read_events_stream,
    run_to_memory,
    session_windows_stream,
    tumbling_counts_stream,
)
from tests.conftest import SF_DIR


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


class TestTumblingStream:
    def test_stream_equals_batch(self, spark):
        from openrouter_batch_processor_spark.operators.windows import tumbling_counts
        from openrouter_batch_processor_spark.session import load_table

        stream = tumbling_counts_stream(read_events_stream(spark, SF_DIR))
        run_to_memory(stream, "tumbling_test")
        got = _rows_set(
            spark.table("tumbling_test"),
            ["window_start", "event_type", "n_events", "value_sum"],
        )
        batch = load_table(spark, SF_DIR, "events")
        want = _rows_set(
            tumbling_counts(batch),
            ["window_start", "event_type", "n_events", "value_sum"],
        )
        assert got == want and len(got) > 0


class TestSessionWindows:
    def test_sessions_respect_gap(self, spark):
        stream = session_windows_stream(read_events_stream(spark, SF_DIR))
        run_to_memory(stream, "sessions_test")
        rows = spark.table("sessions_test").collect()
        assert len(rows) > 0
        # no user may have two sessions closer than the 30-min gap
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(
                (r["session_start"], r["session_end"])
            )
        import datetime as dt

        fmt = "%Y-%m-%d %H:%M:%S"
        for spans in by_user.values():
            spans.sort()
            for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
                gap = dt.datetime.strptime(s2, fmt) - dt.datetime.strptime(e1, fmt)
                assert gap.total_seconds() >= 0


class TestProgressStream:
    def test_counters(self, spark, tmp_path):
        src = tmp_path / "results_stream"
        src.mkdir()
        df = spark.createDataFrame(
            [("job1", True), ("job1", True), ("job1", False), ("job2", True)],
            "job_id string, ok boolean",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src))
        stream = spark.readStream.schema("job_id string, ok boolean").parquet(str(src))
        run_to_memory(progress_stream(stream), "progress_test")
        got = {
            r["job_id"]: (r["processed"], r["succeeded"], r["failed"])
            for r in spark.table("progress_test").collect()
        }
        assert got == {"job1": (3, 2, 1), "job2": (1, 1, 0)}


class TestStreamingLLM:
    def test_llm_map_over_stream(self, spark, tmp_path):
        """S10 on a stream: groups arriving as files flow through the
        same mapInPandas operator used in batch (micro-batch execution),
        with identical outputs."""
        from hashlib import md5

        from openrouter_batch_processor_spark.operators.llm import (
            LLMConfig,
            MockTransport,
            llm_map,
        )

        src = tmp_path / "groups"
        src.mkdir()
        batch_df = spark.createDataFrame(
            [(f"g{i}/", f"prompt {i}", 1, None) for i in range(8)],
            "group_id string, prompt string, file_count long, sentinel string",
        )
        batch_df.coalesce(2).write.mode("overwrite").parquet(str(src))
        stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
        out = llm_map(stream, LLMConfig(system_prompt="s"), MockTransport)
        run_to_memory(out, "llm_stream_test", output_mode="append")
        rows = {r["file"]: r["output"] for r in spark.table("llm_stream_test").collect()}
        assert rows == {
            f"g{i}/": md5(f"s\nprompt {i}".encode()).hexdigest() for i in range(8)
        }


class TestStatefulProgress:
    def test_state_accumulates_across_microbatches(self, spark, tmp_path):
        """applyInPandasWithState: per-job counters persist across
        micro-batches (maxFilesPerTrigger=1 -> one batch per file)."""
        import pandas as pd

        from openrouter_batch_processor_spark.streaming.stateful import progress_tracker

        src = tmp_path / "batches"
        src.mkdir()
        schema = "job_id string, ok boolean, cost double"
        b1 = spark.createDataFrame(
            [("j1", True, 0.001), ("j1", False, 0.0), ("j2", True, 0.002)], schema
        )
        b2 = spark.createDataFrame([("j1", True, 0.003)], schema)
        b1.coalesce(1).write.parquet(str(src / "b1"))
        b2.coalesce(1).write.parquet(str(src / "b2"))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        out = progress_tracker(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("stateful_progress_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table("stateful_progress_test").collect()
        # latest snapshot per job = accumulated totals
        latest = {}
        for r in rows:
            cur = latest.get(r["job_id"])
            if cur is None or r["processed"] > cur["processed"]:
                latest[r["job_id"]] = r
        j1 = latest["j1"]
        assert (j1["processed"], j1["succeeded"], j1["failed"]) == (3, 2, 1)
        assert j1["cost"] == round(0.001 + 0.003, 12)
        j2 = latest["j2"]
        assert (j2["processed"], j2["succeeded"], j2["failed"]) == (1, 1, 0)


class TestStreamingDedup:
    def test_redelivery_across_microbatches_dropped(self, spark, tmp_path):
        """Key re-delivered in a LATER micro-batch within the watermark
        horizon is dropped — the cross-batch state the sf-data oracle
        check (one file, one batch) cannot exercise."""
        import datetime as dt

        from openrouter_batch_processor_spark.streaming.windows import (
            dedup_events_stream,
        )

        t = dt.datetime(2026, 1, 1, 12, 0, 0)
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        b1 = spark.createDataFrame(
            [(1, t, 10, "click", 1.0, ""), (2, t, 11, "view", 1.0, "")], schema
        )
        b2 = spark.createDataFrame(
            [
                (3, t + dt.timedelta(minutes=5), 10, "click", 2.0, ""),  # re-delivery
                (4, t + dt.timedelta(minutes=5), 12, "click", 1.0, ""),  # new key
            ],
            schema,
        )
        src = str(tmp_path / "stream_src")
        b1.coalesce(1).write.mode("overwrite").parquet(src)
        b2.coalesce(1).write.mode("append").parquet(src)

        reader = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = dedup_events_stream(reader, keys=("user_id", "event_type"))
        run_to_memory(out, "dedup_cross_batch", output_mode="append")
        got = _rows_set(spark.table("dedup_cross_batch"), ["user_id", "event_type"])
        assert got == {(10, "click"), (11, "view"), (12, "click")}


class TestForeachBatchSink:
    def test_idempotent_parquet_upsert(self, spark, tmp_path):
        """foreachBatch as the arbitrary-sink escape hatch: each
        micro-batch lands as its own parquet subdir keyed by batch_id
        (an idempotent 'overwrite my slot' upsert — re-running a batch
        after a crash replaces, never duplicates), which is the
        standard exactly-once recipe for sinks without transactional
        streaming support."""
        import datetime as dt

        t = dt.datetime(2026, 1, 1, 12, 0, 0)
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        src = str(tmp_path / "fb_src")
        spark.createDataFrame(
            [(1, t, 10, "click", 1.0, "")], schema
        ).coalesce(1).write.mode("overwrite").parquet(src)
        spark.createDataFrame(
            [(2, t, 11, "view", 2.0, "")], schema
        ).coalesce(1).write.mode("append").parquet(src)

        out_root = str(tmp_path / "fb_out")
        seen_batches = []

        def sink(batch_df, batch_id):
            seen_batches.append(batch_id)
            # deterministic slot per batch: a retry overwrites its own
            # slot instead of appending duplicates
            batch_df.write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")

        reader = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            reader.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        assert len(seen_batches) >= 2  # maxFilesPerTrigger=1 -> one batch per file
        got = spark.read.parquet(out_root)
        assert sorted(r["event_id"] for r in got.collect()) == [1, 2]
        # re-running one batch into its slot does not duplicate rows
        replay = spark.createDataFrame([(2, t, 11, "view", 2.0, "")], schema)
        replay.write.mode("overwrite").parquet(f"{out_root}/batch_id={seen_batches[-1]}")
        assert sorted(r["event_id"] for r in spark.read.parquet(out_root).collect()) == [1, 2]


def test_streaming_llm_pipeline_equals_batch(spark):
    """The product loop as a stream: the zipmembers-source streaming
    pipeline must emit exactly the batch pipeline's result rows."""
    from openrouter_batch_processor_spark.plans.pipeline import (
        run_llm_pipeline,
        run_streaming_llm_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    stream = {r["file"]: r for r in run_streaming_llm_pipeline(spark, sf).collect()}
    batch = {r["file"]: r for r in run_llm_pipeline(spark, sf).collect()}
    assert set(stream) == set(batch)
    for k in batch:
        assert stream[k] == batch[k]
