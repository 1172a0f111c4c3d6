"""Custom stateful streaming operator via applyInPandasWithState.

The built-in streaming aggregations (windows.py) cover counts/sums;
anything with bespoke per-key state — running accumulators that emit
deltas, custom session logic, cross-batch anomaly baselines — needs
arbitrary state. This module implements the reference's progress
semantics (T1: counters that update after every processed unit,
worker.py:351-353) as a per-job stateful operator: each micro-batch
folds into persisted state and EMITS the updated snapshot, which is
exactly the meta.json-rewrite-per-group behavior, minus the file.

Scale: state lives in the state store (RocksDB on a cluster), one
entry per key, checkpointed with the query — a failed executor replays
from the checkpoint, giving exactly-once counter semantics the
reference's file rewrite cannot."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("processed", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("cost", T.DoubleType()),
    ]
)

PROGRESS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("processed", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("cost", T.DoubleType()),
    ]
)


def _fold_progress(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        processed, succeeded, failed, cost = state.get
    else:
        processed, succeeded, failed, cost = 0, 0, 0, 0.0
    for pdf in pdfs:
        processed += len(pdf)
        succeeded += int(pdf["ok"].sum())
        failed += int((~pdf["ok"]).sum())
        cost = round(cost + float(pdf["cost"].sum()), 12)  # 12-dp fold parity
    state.update((processed, succeeded, failed, cost))
    yield pd.DataFrame(
        [(key[0], processed, succeeded, failed, cost)],
        columns=[f.name for f in PROGRESS_OUTPUT_SCHEMA.fields],
    )


def progress_tracker(results_stream: DataFrame) -> DataFrame:
    """Per-job running (processed, succeeded, failed, cost) snapshots,
    one emitted row per job per micro-batch — the T1/T2 progress
    contract with durable, exactly-once state.

    Input stream needs columns: job_id, ok (bool), cost (double)."""
    return (
        results_stream.select("job_id", "ok", "cost")
        .groupBy("job_id")
        .applyInPandasWithState(
            _fold_progress,
            outputStructType=PROGRESS_OUTPUT_SCHEMA,
            stateStructType=PROGRESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
