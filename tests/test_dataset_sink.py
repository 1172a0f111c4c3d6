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


class TestMultiFormatRoundTrip:
    def test_documents_round_trip_all_formats(self, spark, tmp_path):
        from openrouter_batch_processor_spark.session import load_table
        from openrouter_batch_processor_spark.sinks.dataset import (
            DATASET_FORMATS,
            read_dataset,
            write_dataset,
        )
        from tests.conftest import SF_DIR

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        want = {tuple(r) for r in docs.collect()}
        for fmt in DATASET_FORMATS:
            path = str(tmp_path / f"ds_{fmt}")
            write_dataset(docs, path, fmt)
            got_df = read_dataset(spark, path, fmt, schema=docs.schema)
            assert got_df.schema == docs.schema, fmt
            assert {tuple(r) for r in got_df.collect()} == want, fmt

    def test_text_formats_preserve_strings_with_delimiters(self, spark, tmp_path):
        from openrouter_batch_processor_spark.sinks.dataset import (
            read_dataset,
            write_dataset,
        )

        df = spark.createDataFrame(
            [(1, 'comma, "quote", and\tthings'), (2, "newline-free but, tricky")],
            "id long, s string",
        )
        for fmt in ("json", "csv"):
            path = str(tmp_path / f"tricky_{fmt}")
            write_dataset(df, path, fmt)
            got = {
                (r["id"], r["s"])
                for r in read_dataset(spark, path, fmt, schema=df.schema).collect()
            }
            assert got == {tuple(r) for r in df.collect()}, fmt

    def test_max_records_per_file_bounds_file_size(self, spark, tmp_path):
        import glob

        from openrouter_batch_processor_spark.sinks.dataset import (
            read_dataset,
            write_dataset,
        )

        df = spark.range(1000).coalesce(1)
        path = str(tmp_path / "rolled")
        write_dataset(df, path, "parquet", max_records_per_file=100)
        files = glob.glob(f"{path}/*.parquet")
        assert len(files) == 10  # writer rolls at the limit
        assert read_dataset(spark, path, "parquet").count() == 1000
