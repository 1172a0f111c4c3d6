"""The zipmembers Python DataSource matches the mapInPandas ZIP path
row-for-row, and its partition planning is one-partition-per-archive."""

from __future__ import annotations

import os
import time
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


def test_stream_offsets_stay_compact(tmp_path):
    """ADVICE r03: offsets must not grow O(total archives ever seen).
    Unit-level (no engine): cold start backfills everything; afterwards
    `recent` holds only the grace window, legacy offsets still diff."""
    import os

    from openrouter_batch_processor_spark.sources.zip_datasource import (
        ZipMembersStreamReader,
    )

    d = tmp_path / "in"
    d.mkdir()

    def drop(n: int, age_s: float):
        p = d / f"a{n}.zip"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr(f"doc_{n}.txt", f"content {n}")
        t = time.time() - age_s
        os.utime(p, (t, t))
        return str(p)

    old = drop(1, age_s=3600)  # far beyond the 60 s grace below
    new1 = drop(2, age_s=10)

    r = ZipMembersStreamReader({"path": str(d / "*.zip"), "graceSeconds": "60"})
    start = r.initialOffset()
    end1 = r.latestOffset()
    # cold start: BOTH archives admitted despite the old one's age
    assert sorted(p.path for p in r.partitions(start, end1)) == [old, new1]

    new2 = drop(3, age_s=0)
    end2 = r.latestOffset()
    # steady state: the hour-old archive aged out of `recent` (compact),
    # and the diff still yields exactly the newly-arrived archive
    paths2 = {p for _, p in end2["recent"]}
    assert old not in paths2 and new1 in paths2 and new2 in paths2
    assert [p.path for p in r.partitions(end1, end2)] == [new2]

    # legacy pre-r04 checkpoint offset format still diffs correctly
    legacy = {"seen": [old, new1]}
    assert [p.path for p in r.partitions(legacy, end2)] == [new2]


def test_stream_offsets_upgrade_and_outage_paths(tmp_path):
    """The three offset edge paths from the r04 self-review: a legacy
    END offset still yields its archives on upgrade replay, a transient
    empty listing re-issues the previous offset (no re-ingest), and the
    committed cursor observed via partitions() extends the grace floor
    so downtime arrivals are recovered a trigger later."""
    import os

    from openrouter_batch_processor_spark.sources.zip_datasource import (
        ZipMembersStreamReader,
    )

    d = tmp_path / "in"
    d.mkdir()

    def drop(n: int, age_s: float):
        p = d / f"a{n}.zip"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr(f"doc_{n}.txt", f"content {n}")
        t = time.time() - age_s
        os.utime(p, (t, t))
        return str(p)

    a1 = drop(1, 5000)
    a2 = drop(2, 4000)

    r = ZipMembersStreamReader({"path": str(d / "*.zip"), "graceSeconds": "60"})
    # 1) upgrade replay: BOTH offsets in the legacy format
    legacy_start = {"seen": [a1]}
    legacy_end = {"seen": [a1, a2]}
    assert [p.path for p in r.partitions(legacy_start, legacy_end)] == [a2]

    # 2) outage recovery — FRESH reader models the restarted process.
    # The committed cursor (a2's mtime, observed via partitions) must
    # extend the floor past the 60 s grace so a3 — arrived during
    # downtime, 3000 s older than the newest file — is admitted by the
    # SECOND post-restart batch, while processed a2/a1 are NOT re-read
    a3 = drop(3, 3000)
    a4 = drop(4, 0)
    committed = {
        "cursor": [os.stat(a2).st_mtime_ns, a2],
        "recent": [[os.stat(a2).st_mtime_ns, a2]],
    }
    r2 = ZipMembersStreamReader({"path": str(d / "*.zip"), "graceSeconds": "60"})
    end1 = r2.latestOffset()  # first batch after restart: grace-only floor
    assert a3 not in {p for _, p in end1["recent"]}  # the documented miss
    assert [p.path for p in r2.partitions(committed, end1)] == [a4]
    end2 = r2.latestOffset()
    got = {p for _, p in end2["recent"]}
    assert a3 in got and a4 in got  # floor extended to the cursor ...
    assert a2 not in got and a1 not in got  # ... excluding processed files
    assert [p.path for p in r2.partitions(end1, end2)] == [a3]

    # 3) transient empty listing: previous offset repeats, done-set kept
    for f in d.glob("*.zip"):
        f.rename(tmp_path / f.name)
    assert r2.latestOffset() == end2
    for f in tmp_path.glob("*.zip"):
        f.rename(d / f.name)
