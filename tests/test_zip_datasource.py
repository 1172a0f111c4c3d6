"""The zipmembers Python DataSource matches the mapInPandas ZIP path
row-for-row, and its partition planning is one-partition-per-archive."""

from __future__ import annotations

import os
import zipfile

import pytest

from openrouter_batch_processor_spark.sources.ingest import zip_members
from openrouter_batch_processor_spark.sources.zip_datasource import (
    register_zip_source,
)


@pytest.fixture()
def archives(tmp_path):
    for a in range(3):
        with zipfile.ZipFile(tmp_path / f"arch{a}.zip", "w") as zf:
            zf.writestr(f"docs/file_{a}_1.txt", f"hello from archive {a} one")
            zf.writestr(f"docs/sub/file_{a}_2.txt", f"payload {a} two")
            zf.writestr("docs/empty_dir/", "")  # directory entry: skipped
    return str(tmp_path / "*.zip")


def test_matches_mapinpandas_path(spark, archives):
    register_zip_source(spark)
    ds = spark.read.format("zipmembers").load(archives)
    legacy = zip_members(spark, archives)
    key = lambda r: (os.path.basename(r["zip_path"]), r["rel_path"])  # noqa: E731
    got = {key(r): (r["length"], bytes(r["content"])) for r in ds.collect()}
    want = {key(r): (r["length"], bytes(r["content"])) for r in legacy.collect()}
    assert got == want
    assert len(got) == 6  # 3 archives x 2 files, dirs skipped


def test_one_partition_per_archive(spark, archives):
    register_zip_source(spark)
    ds = spark.read.format("zipmembers").load(archives)
    assert ds.rdd.getNumPartitions() == 3


def test_column_pruning_runs(spark, archives):
    # projection on top of the source: member listing without payloads
    register_zip_source(spark)
    ds = spark.read.format("zipmembers").load(archives).select("rel_path", "length")
    rows = ds.orderBy("rel_path").collect()
    assert rows[0]["rel_path"].startswith("docs/")
    assert all(r["length"] > 0 for r in rows)


def test_missing_glob_fails_fast(spark, tmp_path):
    register_zip_source(spark)
    with pytest.raises(Exception, match="no archives match"):
        spark.read.format("zipmembers").load(str(tmp_path / "nope*.zip")).collect()


def test_streaming_incremental_archives(spark, tmp_path):
    """New archives arriving between runs are the micro-batch unit; the
    checkpoint makes the second availableNow run process ONLY them."""
    register_zip_source(spark)
    glob = str(tmp_path / "in" / "*.zip")
    (tmp_path / "in").mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drop_archive(n: int):
        with zipfile.ZipFile(tmp_path / "in" / f"a{n}.zip", "w") as zf:
            zf.writestr(f"doc_{n}.txt", f"content number {n}")

    def run_once():
        # parquet sink: the memory sink refuses checkpoint recovery
        q = (
            spark.readStream.format("zipmembers")
            .load(glob)
            .drop("content")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return sorted(r["rel_path"] for r in spark.read.parquet(out).collect())

    drop_archive(1)
    drop_archive(2)
    assert run_once() == ["doc_1.txt", "doc_2.txt"]

    drop_archive(3)
    # same checkpoint: the second run appends ONLY the new archive —
    # a reprocess would show as duplicate rows in the sorted list
    assert run_once() == ["doc_1.txt", "doc_2.txt", "doc_3.txt"]
