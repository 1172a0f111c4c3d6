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
