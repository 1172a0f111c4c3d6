"""Partitioned dataset sink — the table-scale counterpart of the
job-artifact sinks in artifacts.py.

At 100 TB, outputs are not single CSV files; they are parquet datasets
partitioned by the columns queries filter on (source, lang, date...).
A filter on a partition column then becomes PartitionFilters at scan
time: Spark lists only the matching directories — pruning I/O by
orders of magnitude before a single row is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write a parquet dataset partitioned by the given columns.

    Partition columns should be low-cardinality (each value = one
    directory); high-cardinality keys belong in bucketBy, not
    partitionBy — a million tiny directories is its own pathology."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back; filters on partition columns prune directories
    (visible as PartitionFilters in .explain('formatted'))."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Multi-format dataset IO
# ---------------------------------------------------------------------------

# Formats a training-data pipeline actually exchanges: parquet for
# storage, ORC for interop, JSONL for LLM-tooling handoff, CSV for the
# reference's artifact contract. All four ride the same DataFrameWriter/
# Reader machinery (committer protocol, partition parallelism, pushdown
# where the format supports it — parquet/orc yes, json/csv schema-only).
DATASET_FORMATS = ("parquet", "orc", "json", "csv")


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a DataFrame as a (possibly multi-file) dataset in ``fmt``.

    CSV gets an explicit header so the file is self-describing; JSON is
    JSON-Lines (one object per line — the LLM-pipeline interchange
    format), which is what Spark's json writer emits natively.

    ``max_records_per_file`` bounds file size from above (the writer
    rolls to a new file at the limit) — one half of small-files
    hygiene at 100 TB; the other half, too-many-tiny-files, is a
    coalesce/AQE concern upstream of the write."""
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.save(path)


def read_dataset(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Read a dataset back with an EXPLICIT schema (never inferred —
    inference is a full extra pass on text formats and type-unstable).

    For parquet/orc the schema argument is optional (self-describing
    footers); for json/csv it is required for round-trip fidelity."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.load(path)
