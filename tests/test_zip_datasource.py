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
