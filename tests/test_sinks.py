"""K1-K9 sink tests: artifact shapes, the parsed_json:false sentinel,
deterministic-zip byte stability, redaction, packaging selection."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import zipfile

from openrouter_batch_processor_spark.sinks.artifacts import (
    commit_registry,
    concatenated_text,
    json_rows,
    package_results_zip,
    render_output_json,
    write_deterministic_zip,
    write_group_texts,
    write_job_meta,
    write_results_csv,
)

RESULTS = [
    ("alpha/", "rec 000000001 alpha", True),
    ("beta/", "rec 000000001 beta", True),
    ("loose.txt", "loose out", False),
]


def _results_df(spark):
    return spark.createDataFrame(RESULTS, "file string, output string, is_folder boolean")


class TestCsvSink:
    def test_single_file_with_header(self, spark, tmp_path):
        write_results_csv(_results_df(spark), str(tmp_path))
        parts = glob.glob(str(tmp_path / "output.csv" / "part-*.csv"))
        assert len(parts) == 1
        lines = open(parts[0]).read().splitlines()
        assert lines[0] == "file,output"
        assert len(lines) == 4


class TestJsonSink:
    def test_false_sentinel_rendering(self, spark):
        df = spark.createDataFrame(
            [("a", '{"k": 1}'), ("b", "not json")], "file string, output string"
        )
        rows = [r.asDict() for r in json_rows(df).orderBy("file_name").collect()]
        rendered = json.loads(render_output_json(rows))
        assert rendered[0]["parsed_json"] == {"k": 1}
        assert rendered[1]["parsed_json"] is False  # the D5 sentinel
        assert rendered[1]["raw_output"] == "not json"

    def test_stream_writer_byte_parity(self, spark, tmp_path):
        # The size-guard fallback (job_runner.JSON_COLLECT_MAX_ROWS) must
        # produce the identical artifact, byte for byte, including the
        # `false` sentinel and non-ASCII passthrough.
        from openrouter_batch_processor_spark.sinks.artifacts import (
            write_output_json_stream,
        )

        df = spark.createDataFrame(
            [("a", '{"k": 1}'), ("b", "not json"), ("c", '["ünïcode", 2]')],
            "file string, output string",
        )
        sorted_rows = json_rows(df).orderBy("file_name")
        collected = render_output_json([r.asDict() for r in sorted_rows.collect()])
        path = str(tmp_path / "output.json")
        n = write_output_json_stream(sorted_rows, path)
        assert n == 3
        assert open(path, encoding="utf-8").read() == collected

    def test_stream_writer_empty_frame(self, spark, tmp_path):
        from openrouter_batch_processor_spark.sinks.artifacts import (
            write_output_json_stream,
        )

        df = spark.createDataFrame([], "file string, output string")
        path = str(tmp_path / "output.json")
        assert write_output_json_stream(json_rows(df), path) == 0
        assert open(path).read() == render_output_json([]) == "[]"


class TestGroupTexts:
    def test_f7_names_and_contents(self, spark, tmp_path):
        out = tmp_path / "texts"
        write_group_texts(_results_df(spark), str(out))
        assert sorted(os.listdir(out)) == [
            "alpha_folder_output.txt",
            "beta_folder_output.txt",
            "loose.txt",  # stem of 'loose.txt' is 'loose' + '.txt'
        ]
        assert (out / "alpha_folder_output.txt").read_text() == "rec 000000001 alpha"


class TestConcat:
    def test_renumbered_in_group_order(self, spark):
        text = concatenated_text(_results_df(spark)).head()["text"]
        assert text == "rec 000000001 alpha\nrec 000000002 beta\nloose out"


class TestDeterministicZip:
    def test_byte_stable_regardless_of_insert_order(self, tmp_path):
        a, b = tmp_path / "a.zip", tmp_path / "b.zip"
        write_deterministic_zip(str(a), {"x.txt": b"1", "y.txt": b"2"})
        write_deterministic_zip(str(b), {"y.txt": b"2", "x.txt": b"1"})
        ha = hashlib.sha256(a.read_bytes()).hexdigest()
        hb = hashlib.sha256(b.read_bytes()).hexdigest()
        assert ha == hb
        with zipfile.ZipFile(a) as zf:
            assert [i.date_time for i in zf.infolist()] == [(1980, 1, 1, 0, 0, 0)] * 2
            assert [i.filename for i in zf.infolist()] == ["x.txt", "y.txt"]

    def test_content_change_changes_bytes(self, tmp_path):
        a, b = tmp_path / "a.zip", tmp_path / "b.zip"
        write_deterministic_zip(str(a), {"x.txt": b"1"})
        write_deterministic_zip(str(b), {"x.txt": b"2"})
        assert a.read_bytes() != b.read_bytes()


class TestPackaging:
    def test_format_selection(self, tmp_path):
        art = tmp_path / "artifacts"
        art.mkdir()
        (art / "out1.txt").write_text("t")
        (art / "output.csv").write_text("c")
        (art / "output.json").write_text("[]")
        (art / "meta.json").write_text("{}")
        packed = package_results_zip(
            str(tmp_path / "results.zip"), str(art), formats=["text", "csv"]
        )
        assert packed == ["meta.json", "out1.txt", "output.csv"]

    def test_meta_redaction_and_atomicity(self, tmp_path):
        out = tmp_path / "meta.json"
        redacted = write_job_meta(
            {"api_key": "sk-or-v1-secretsecret1234", "model": "m"}, str(out)
        )
        on_disk = json.loads(out.read_text())
        assert "api_key" not in on_disk
        assert on_disk["api_key_last8"] == "cret1234"
        assert redacted == on_disk
        assert not os.path.exists(str(out) + ".tmp")

    def test_registry_commit(self, tmp_path):
        out = tmp_path / "registry.json"
        commit_registry([{"zip_name": "z.zip"}], str(out))
        data = json.loads(out.read_text())
        assert data == {"version": 1, "entries": [{"zip_name": "z.zip"}]}
