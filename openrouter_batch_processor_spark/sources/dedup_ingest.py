"""X1 — content-addressed ingest dedup as DataFrame set operations.

Reference: a new upload/folder is hashed (zip_sha256 + content_sha256),
probed against the registry by EITHER hash, then against unregistered
on-disk zips; a hit reuses the stored copy, a miss stores under a
hash-suffixed name and registers (app.py:272-372, probe 191-203).

Spark-first shape: the probe is a union of two equi-joins (the OR of
two keys), reuse/store selection is semi/anti joins, and the commit is
an append of the miss set — at deployment scale a Delta MERGE keyed on
content_sha256; here a plain DataFrame contract so it is testable
without a lakehouse dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.paths import storage_name


def probe_registry(new_archives: DataFrame, registry: DataFrame) -> DataFrame:
    """J2: annotate each new archive with the matching registry entry's
    zip_name (match on content_sha256 OR zip_sha256 = union of two
    equi-joins; OR-joins would force a nested-loop plan)."""
    by_content = new_archives.join(
        registry.select(
            F.col("content_sha256").alias("_k"), F.col("zip_name").alias("_hit")
        ),
        new_archives["content_sha256"] == F.col("_k"),
        "left",
    ).drop("_k")
    by_zip = new_archives.join(
        registry.select(F.col("zip_sha256").alias("_k"), F.col("zip_name").alias("_hit")),
        new_archives["zip_sha256"] == F.col("_k"),
        "left",
    ).drop("_k")
    # priority: content match wins, else zip match (app.py:191-203 order).
    # The second probe re-joins on the archive's full identity tuple, not
    # just upload_name — duplicate names within one batch must not fan out.
    ident = ["upload_name", "zip_sha256", "content_sha256"]
    content_hits = by_content.filter(F.col("_hit").isNotNull())
    rest = by_content.filter(F.col("_hit").isNull()).drop("_hit")
    zip_only = rest.join(
        by_zip.select(*ident, F.col("_hit")).dropDuplicates(ident),
        ident,
        "left",
    )
    return content_hits.unionByName(zip_only).withColumnRenamed("_hit", "reuse_zip_name")


def split_ingest(new_archives: DataFrame, registry: DataFrame) -> tuple[DataFrame, DataFrame]:
    """X1: (reused, to_store). Reused rows carry the existing zip_name;
    to-store rows get their deterministic storage name (F6)."""
    probed = probe_registry(new_archives, registry)
    reused = probed.filter(F.col("reuse_zip_name").isNotNull())
    to_store = (
        probed.filter(F.col("reuse_zip_name").isNull())
        .drop("reuse_zip_name")
        .withColumn(
            "zip_name", storage_name(F.col("upload_name"), F.col("content_sha256"))
        )
    )
    return reused, to_store


def register_new(registry: DataFrame, to_store: DataFrame, created_at: str, source: str) -> DataFrame:
    """Commit step: registry ∪ new entries (Delta MERGE at deployment;
    dropDuplicates guards double-submission inside one batch — the
    double-checked-locking re-verify of app.py:315-355)."""
    new_entries = to_store.select(
        "zip_name",
        "zip_sha256",
        "content_sha256",
        F.col("size_bytes"),
        F.lit(created_at).alias("created_at"),
        F.lit(source).alias("source"),
    ).dropDuplicates(["content_sha256"])
    return registry.unionByName(new_entries)
