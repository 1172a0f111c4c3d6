"""Streaming SCD1 upsert (latest-wins CDC merge) via foreachBatch.

The reference rewrites job state in place as results arrive
(worker.py's per-group meta/progress updates are overwrite-latest by
key). The distributed form is the canonical Spark pattern for a keyed
upsert WITHOUT a transactional table format: a foreachBatch sink that
merges each micro-batch's per-key summary into a versioned parquet
state table — read current version, union, reduce, write next version,
flip a pointer. (With Delta/Iceberg this collapses to MERGE INTO; the
versioned-directory form is the storage-agnostic equivalent and keeps
the whole merge a Spark plan — no driver-side rows.)

Determinism contract: the merge is a commutative monoid fold —
n_events adds, latest = max(struct(ts, event_id, value)) — so the
final state is independent of how the input is sliced into
micro-batches. That is exactly what the DuckDB oracle checks: the
stream run over N single-file triggers equals the one-shot batch
argmax/count per key.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.streaming.windows import TS_FMT

_STATE_COLS = ["user_id", "n_events", "last"]


def _batch_summary(df: DataFrame) -> DataFrame:
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.struct("ts", "event_id", "value")).alias("last"),
    )


def events_split_fixture(spark: SparkSession, sf_dir: str, n_splits: int = 3) -> str:
    """Split the events parquet into n_splits single-file parquets so
    the file stream source (maxFilesPerTrigger=1) produces n_splits
    micro-batches — test scaffolding standing in for a CDC feed's
    arrival cadence. Keyed on the source parquet's identity (path +
    mtime + size) and built once (marker file), same contract as the
    LLM zip fixture (plans/pipeline.py)."""
    import hashlib

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"events_split_fixture_{key}")
    done = os.path.join(out_dir, "_FIXTURE_READY")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ev = spark.read.parquet(src)
    for i in range(n_splits):
        tmp = os.path.join(out_dir, f"_tmp_{i}")
        ev.filter(F.col("event_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet") and not p.startswith(".")
        )
        os.replace(os.path.join(tmp, part), os.path.join(out_dir, f"split_{i}.parquet"))
        shutil.rmtree(tmp)
    with open(done, "w") as fh:
        fh.write("ok")
    return out_dir


def scd1_upsert_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Run the latest-wins upsert over a file stream of event parquets
    (one micro-batch per file), returning the final merged state:
    (user_id, last_ts, last_event_id, last_value, n_events).

    Scale shape: per batch, the summary groupBy is map-side combined
    on the batch alone; the merge unions it with the O(keys) state
    table and reduces — state traffic is proportional to the KEY
    space, never to event history. State versions alternate under a
    fresh temp dir per run (availableNow, no checkpoint: reruns are
    idempotent recomputations, which is what the oracle compare
    needs)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        ephemeral_checkpoint_dir,
    )

    schema = spark.read.parquet(events_dir).schema
    # Ephemeral run state on the fastest local volume (tmpfs when
    # present) — the versioned state parquets and the stream checkpoint
    # are scratch for this finite run, recreated from scratch next run
    # (see ephemeral_checkpoint_dir); a durable CDC deployment would
    # point both at real storage.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    state_root = tempfile.mkdtemp(prefix="scd1_state_", dir=base)
    pointer = os.path.join(state_root, "CURRENT")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        summary = _batch_summary(batch_df)
        cur = None
        if os.path.exists(pointer):
            with open(pointer) as fh:
                cur = fh.read().strip()
            state = batch_df.sparkSession.read.parquet(os.path.join(state_root, cur))
            summary = (
                state.unionByName(summary)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.max("last").alias("last"),
                )
            )
        nxt = f"v{batch_id}"
        summary.select(*_STATE_COLS).write.mode("overwrite").parquet(
            os.path.join(state_root, nxt)
        )
        with open(pointer, "w") as fh:
            fh.write(nxt)
        if cur is not None:
            # superseded version: only the pointer's target is ever read
            # again, so reclaim the scratch space eagerly (state_root
            # may live on tmpfs)
            shutil.rmtree(os.path.join(state_root, cur), ignore_errors=True)

    ckpt = ephemeral_checkpoint_dir()
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    with open(pointer) as fh:
        cur = fh.read().strip()
    final = spark.read.parquet(os.path.join(state_root, cur))
    return final.select(
        "user_id",
        F.date_format(F.col("last.ts"), TS_FMT).alias("last_ts"),
        F.col("last.event_id").cast("long").alias("last_event_id"),
        F.col("last.value").alias("last_value"),
        F.col("n_events"),
    )
