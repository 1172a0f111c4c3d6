"""Parquet-upsert (MERGE) registry table — the K9 Delta-MERGE flavor
(sinks/registry_table.py, VERDICT r10 #7): insert-when-not-matched on
content_sha256, optimistic versioned commits, concurrent committers
converge."""

from __future__ import annotations

import os
import threading

from pyspark.sql import Row

from openrouter_batch_processor_spark.sinks.registry_table import (
    current_version,
    merge_registry_table,
    read_registry_table,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                zip_name=f"{sha[:8]}.zip",
                zip_sha256=f"z{sha}",
                content_sha256=sha,
                size_bytes=int(size),
                created_at=created,
                source=source,
            )
            for sha, size, created, source in rows
        ]
    )


def test_merge_inserts_and_keeps_first(spark, tmp_path):
    tdir = str(tmp_path / "reg")
    b1 = _batch(
        spark,
        [
            ("aaa", 1, "2026-01-01", "s1"),
            ("bbb", 2, "2026-01-01", "s1"),
            ("bbb", 99, "2026-01-01", "dup-in-batch"),
        ],
    )
    v = merge_registry_table(b1, tdir)
    assert v == 1
    got = {
        r.content_sha256: r for r in read_registry_table(spark, tdir).collect()
    }
    assert set(got) == {"aaa", "bbb"}

    # overlapping second batch: bbb must keep its FIRST committed row
    b2 = _batch(
        spark,
        [("bbb", 777, "2026-02-02", "s2"), ("ccc", 3, "2026-02-02", "s2")],
    )
    v = merge_registry_table(b2, tdir)
    assert v == 2
    got = {
        r.content_sha256: r for r in read_registry_table(spark, tdir).collect()
    }
    assert set(got) == {"aaa", "bbb", "ccc"}
    assert got["bbb"].size_bytes in (2, 99)  # a b1 row, never the b2 one
    assert got["bbb"].created_at == "2026-01-01"
    assert got["ccc"].source == "s2"


def test_empty_table_reads_none(spark, tmp_path):
    assert read_registry_table(spark, str(tmp_path / "nope")) is None
    assert current_version(str(tmp_path / "nope")) == 0


def test_concurrent_committers_converge(spark, tmp_path):
    tdir = str(tmp_path / "reg")
    merge_registry_table(_batch(spark, [("base", 0, "2026-01-01", "s0")]), tdir)

    batches = {
        "t1": _batch(
            spark,
            [("k1", 1, "2026-03-01", "t1"), ("shared", 10, "2026-03-01", "t1")],
        ),
        "t2": _batch(
            spark,
            [("k2", 2, "2026-03-01", "t2"), ("shared", 20, "2026-03-01", "t2")],
        ),
    }
    errs: list[Exception] = []

    def commit(name):
        try:
            merge_registry_table(batches[name], tdir)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=commit, args=(n,)) for n in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    # both batches landed; the shared key exists exactly once with
    # whichever committer won it first
    assert current_version(tdir) == 3
    rows = read_registry_table(spark, tdir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.content_sha256, []).append(r)
    assert set(by_key) == {"base", "k1", "k2", "shared"}
    assert all(len(v) == 1 for v in by_key.values())
    assert by_key["shared"][0].size_bytes in (10, 20)


def test_loser_sees_unpointered_snapshot(spark, tmp_path):
    # a winner that renamed v2 but crashed before advancing the pointer
    # must still be the base of the next commit (rename IS the commit)
    tdir = str(tmp_path / "reg")
    merge_registry_table(_batch(spark, [("a", 1, "2026-01-01", "s")]), tdir)
    merge_registry_table(_batch(spark, [("b", 2, "2026-01-01", "s")]), tdir)
    os.remove(os.path.join(tdir, "_LATEST"))  # stale/missing pointer
    assert current_version(tdir) == 2  # recovered from the v* scan
    v = merge_registry_table(
        _batch(spark, [("c", 3, "2026-01-02", "s")]), tdir
    )
    assert v == 3
    got = {r.content_sha256 for r in read_registry_table(spark, tdir).collect()}
    assert got == {"a", "b", "c"}
