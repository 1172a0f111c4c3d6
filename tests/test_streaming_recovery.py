"""T1/T2 fault-parity (VERDICT r04 item 6): kill a streaming query
mid-run and resume from its checkpoint, asserting the final table is
bit-identical to the batch oracle — exactly-once across a crash, with
stateful-operator state (streaming dropDuplicates) recovered, not
rebuilt.

The crash is injected deterministically: the foreachBatch sink writes
its slot, then raises on batch 1 while a marker file exists. Run A
therefore commits batch 0, crashes inside batch 1 (after the partial
side effect — the worst case a sink can present). Removing the marker
and restarting from the SAME checkpoint must replay batch 1 under the
same batch_id with the same input file, overwrite the partial slot,
and drain the rest. Two properties are checked:

- exactly-once vs batch: the union of slots equals DISTINCT over all
  input rows (no dup from the replay, no loss from the crash);
- state recovery: an event_id first seen in pre-crash batch 0 and
  redelivered in post-crash batches is dropped by the RESTARTED query
  — only possible if the dedup state store was restored from the
  checkpoint, not restarted empty.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


def _write_input_files(spark, src: str):
    """Three single-file micro-batch units with controlled order (the
    file source processes oldest-mtime first) and planned redeliveries:
    C repeats in file 1 (crash batch), A repeats in file 2 (post-
    restart batch)."""
    schema = "event_id string, value long"
    files = [
        [("A", 1), ("B", 2), ("C", 3)],
        [("C", 3), ("D", 4), ("E", 5)],
        [("A", 1), ("F", 6)],
    ]
    paths = []
    for i, rows in enumerate(files):
        p = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    now = time.time()
    for i, p in enumerate(paths):
        for root, _dirs, names in os.walk(p):
            for n in names:
                os.utime(os.path.join(root, n), (now + i, now + i))
        os.utime(p, (now + i, now + i))
    return spark.read.parquet(os.path.join(src, "f*.parquet")).schema


class TestCrashRecovery:
    def test_exactly_once_and_state_across_restart(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out_root = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        marker = str(tmp_path / "CRASH_ON_BATCH_1")
        schema = _write_input_files(spark, src)
        open(marker, "w").close()

        run_batches: list[list[int]] = []

        def make_sink(batch_log: list[int]):
            def sink(batch_df, batch_id):
                batch_log.append(batch_id)
                # idempotent slot write FIRST, then the injected crash —
                # the replay must overwrite a slot that already has bytes
                batch_df.write.mode("overwrite").parquet(
                    f"{out_root}/batch_id={batch_id}"
                )
                if batch_id == 1 and os.path.exists(marker):
                    raise RuntimeError("injected crash after partial side effect")

            return sink

        def start(batch_log):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(src, "f*.parquet"))
                .dropDuplicates(["event_id"])
            )
            return (
                stream.writeStream.foreachBatch(make_sink(batch_log))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        # ---- run A: commits batch 0, dies inside batch 1 ----
        log_a: list[int] = []
        qa = start(log_a)
        with pytest.raises(Exception, match="injected crash"):
            qa.awaitTermination()
        assert log_a == [0, 1]
        # the crash left batch 1's partial side effect on disk
        assert os.path.isdir(f"{out_root}/batch_id=1")

        # ---- run B: same checkpoint, crash disarmed ----
        os.remove(marker)
        log_b: list[int] = []
        qb = start(log_b)
        qb.awaitTermination()
        # resumed, not restarted: replay begins at the failed batch 1
        assert log_b[0] == 1 and 0 not in log_b

        got = spark.read.parquet(out_root)
        # exactly-once vs the batch oracle: DISTINCT over all input
        oracle = (
            spark.read.parquet(os.path.join(src, "f*.parquet"))
            .dropDuplicates(["event_id"])
        )
        assert (
            sorted(map(tuple, got.select("event_id", "value").collect()))
            == sorted(map(tuple, oracle.select("event_id", "value").collect()))
        )
        # state recovery: C (first seen in pre-crash batch 0) was dropped
        # by the replayed batch 1; A (batch 0) dropped post-restart too
        by_batch = {
            r["batch_id"]: r["ids"]
            for r in spark.read.option("basePath", out_root)
            .parquet(out_root)
            .groupBy("batch_id")
            .agg(F.sort_array(F.collect_list("event_id")).alias("ids"))
            .collect()
        }
        assert by_batch[0] == ["A", "B", "C"]
        assert by_batch[1] == ["D", "E"]  # C dropped via RECOVERED state
        assert by_batch.get(2, []) == ["F"]  # A dropped post-restart
