"""S1-S9 source tests over a synthetic input tree + zip fixtures."""

from __future__ import annotations

import json
import zipfile

import pytest

from openrouter_batch_processor_spark.sources.ingest import (
    decode_text_files,
    file_inventory,
    image_data_urls,
    list_zips,
    load_ingest_registry,
    load_job_metas,
    scan_files,
    zip_members,
)


@pytest.fixture(scope="module")
def input_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tree")
    (root / "alpha").mkdir()
    (root / "alpha" / "a.txt").write_text("alpha a", encoding="utf-8")
    (root / "alpha" / "b.md").write_text("alpha b", encoding="utf-8")
    (root / "alpha" / "pic.png").write_bytes(b"\x89PNGfake")
    (root / "beta").mkdir()
    (root / "beta" / "readme.TXT").write_text("beta", encoding="utf-8")
    (root / "loose.txt").write_text("loose", encoding="utf-8")
    (root / "noext").write_bytes(b"binary")
    return str(root)


class TestScanFiles:
    def test_inventory_shape(self, spark, input_tree):
        inv = file_inventory(scan_files(spark, input_tree)).collect()
        by_path = {r["full_path"]: r for r in inv}
        assert len(inv) == 6
        assert list(by_path) == sorted(by_path)  # sorted by full_path
        assert by_path["input/alpha/a.txt"]["file_type"] == "txt"
        assert by_path["input/alpha/a.txt"]["file_name"] == "a.txt"
        assert by_path["input/beta/readme.TXT"]["file_type"] == "txt"  # lowered
        assert by_path["input/noext"]["file_type"] == "unknown"
        assert by_path["input/loose.txt"]["file_size"] == 5

    def test_text_decode(self, spark, input_tree):
        texts = {
            r["rel_path"]: r["text"]
            for r in decode_text_files(scan_files(spark, input_tree)).collect()
        }
        assert texts == {
            "alpha/a.txt": "alpha a",
            "alpha/b.md": "alpha b",
            "beta/readme.TXT": "beta",
            "loose.txt": "loose",
        }

    def test_image_data_urls(self, spark, input_tree):
        rows = image_data_urls(scan_files(spark, input_tree)).collect()
        assert len(rows) == 1
        assert rows[0]["mime"] == "image/png"
        assert rows[0]["data_url"].startswith("data:image/png;base64,")


class TestZipMembers:
    def test_members_streamed(self, spark, tmp_path):
        zdir = tmp_path / "zips"
        zdir.mkdir()
        with zipfile.ZipFile(zdir / "one.zip", "w") as zf:
            zf.writestr("sub/x.txt", "xx")
            zf.writestr("y.txt", "yyy")
            zf.writestr("dir/", "")  # directory entry: skipped
        with zipfile.ZipFile(zdir / "two.zip", "w") as zf:
            zf.writestr(".\\win\\z.txt", "z")  # normalized
        rows = zip_members(spark, str(zdir)).collect()
        got = {(r["rel_path"], bytes(r["content"])) for r in rows}
        assert got == {
            ("sub/x.txt", b"xx"),
            ("y.txt", b"yyy"),
            ("win/z.txt", b"z"),
        }
        assert all(r["length"] == len(bytes(r["content"])) for r in rows)


class TestJsonSources:
    def test_registry_roundtrip(self, spark, tmp_path):
        reg = {
            "version": 1,
            "entries": [
                {
                    "zip_name": "a_123.zip",
                    "zip_sha256": "z" * 64,
                    "content_sha256": "c" * 64,
                    "size_bytes": 10,
                    "created_at": "2026-08-13 00:00:00",
                    "source": "uploaded",
                }
            ],
        }
        p = tmp_path / "registry.json"
        p.write_text(json.dumps(reg))
        rows = load_ingest_registry(spark, str(p)).collect()
        assert len(rows) == 1 and rows[0]["zip_name"] == "a_123.zip"

    def test_registry_error_is_empty(self, spark, tmp_path):
        p = tmp_path / "missing" / "registry.json"
        assert load_ingest_registry(spark, str(p)).count() == 0

    def test_job_metas_with_job_id(self, spark, tmp_path):
        jobs = tmp_path / "jobs"
        for jid, model in (("j1", "m/a"), ("j2", "m/b")):
            d = jobs / jid
            d.mkdir(parents=True)
            (d / "meta.json").write_text(json.dumps({"model": model, "status": "done"}))
        df = load_job_metas(spark, str(jobs / "*" / "meta.json"))
        got = {r["job_id"]: r["model"] for r in df.collect()}
        assert got == {"j1": "m/a", "j2": "m/b"}


class TestListings:
    def test_zip_listing_newest_first(self, spark, tmp_path):
        import os
        import time

        d = tmp_path / "store"
        d.mkdir()
        (d / "old.zip").write_bytes(b"a")
        (d / "new.zip").write_bytes(b"bb")
        (d / "not_a_zip.txt").write_bytes(b"c")
        past = time.time() - 1000
        os.utime(d / "old.zip", (past, past))
        rows = list_zips(spark, str(d)).collect()
        assert [r["zip_name"] for r in rows] == ["new.zip", "old.zip"]
        assert rows[0]["size_bytes"] == 2


class TestRegexMetacharRoot:
    def test_root_with_metachars(self, spark, tmp_path):
        root = tmp_path / "weird (dir) +plus"
        (root / "sub").mkdir(parents=True)
        (root / "sub" / "f.txt").write_text("x", encoding="utf-8")
        rows = scan_files(spark, str(root)).collect()
        assert [r["rel_path"] for r in rows] == ["sub/f.txt"]


class TestLoadTables:
    def test_registers_views_for_sql(self, spark):
        """load_tables registers every testdata parquet as a temp view —
        the spark.sql() entry path for users of the engine."""
        from openrouter_batch_processor_spark.session import load_tables

        tables = load_tables(spark, "/root/testdata/sf0.001")
        assert "documents" in tables and "lineitem" in tables
        n = spark.sql("SELECT count(*) AS c FROM documents").head()["c"]
        assert n > 0
