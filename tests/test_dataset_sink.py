"""Partitioned dataset sink: round trip + proof that partition-column
filters prune directories (PartitionFilters, not a full scan)."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.sinks.dataset import read_pruned, write_partitioned


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPartitionedDataset:
    def test_roundtrip_and_pruning(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, f"src{i % 4}", f"text {i}") for i in range(100)],
            "doc_id long, source string, text string",
        )
        path = str(tmp_path / "ds")
        write_partitioned(df, path, ["source"])

        # one directory per partition value
        dirs = sorted(d for d in os.listdir(path) if d.startswith("source="))
        assert dirs == [f"source=src{i}" for i in range(4)]

        back = read_pruned(spark, path)
        assert back.count() == 100

        pruned = back.filter(F.col("source") == "src1")
        plan = _plan(pruned)
        assert "PartitionFilters: [isnotnull(source", plan
        assert "source#" in plan and "src1" in plan
        assert pruned.count() == 25
        # the filter is partition-level: no data-column PushedFilters needed
        assert "PartitionFilters: []" not in plan
