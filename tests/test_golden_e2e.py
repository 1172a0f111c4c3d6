"""Golden end-to-end: synthetic input tree -> scan -> group -> mock LLM
-> artifact sinks, byte-compared against expected artifacts (mirrors the
reference's artifact contract, worker.py:373-400,417-436)."""

from __future__ import annotations

import glob
import hashlib
import json
import os

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.grouping import build_groups
from openrouter_batch_processor_spark.operators.llm import LLMConfig, MockTransport, llm_map
from openrouter_batch_processor_spark.sinks.artifacts import (
    package_results_zip,
    write_group_texts,
    write_job_meta,
    write_results_csv,
)
from openrouter_batch_processor_spark.sources.ingest import decode_text_files, scan_files

TREE = {
    "alpha/one.txt": "first file",
    "alpha/two.txt": "second file",
    "beta/only.md": "beta text",
    "loose.txt": "loose body",
}

SYSTEM = "golden system prompt"


def _expected_reply(prompt: str) -> str:
    return hashlib.md5(f"{SYSTEM}\n{prompt}".encode()).hexdigest()


def _build_tree(tmp_path):
    root = tmp_path / "input"
    for rel, body in TREE.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body, encoding="utf-8")
    return str(root)


def _run_pipeline(spark, root):
    files = decode_text_files(scan_files(spark, root))
    groups = build_groups(files)
    multi = (F.size("members") > 1) | F.col("is_folder")
    labeled = F.transform(
        F.col("members"),
        lambda m: F.when(
            multi, F.concat(F.lit("File: "), m["rel_path"], F.lit("\n"), m["text"])
        ).otherwise(m["text"]),
    )
    prompts = groups.select(
        F.col("group_id"),
        F.concat_ws("\n\n", labeled).alias("prompt"),
        F.col("file_count"),
        F.col("is_folder"),
    )
    results = llm_map(
        prompts.withColumn("sentinel", F.lit(None).cast("string")),
        LLMConfig(system_prompt=SYSTEM),
        MockTransport,
    )
    return prompts, results


class TestGoldenE2E:
    def test_full_artifact_contract(self, spark, tmp_path):
        root = _build_tree(tmp_path)
        prompts, results = _run_pipeline(spark, root)

        rows = {r["file"]: r for r in results.collect()}
        assert set(rows) == {"alpha/", "beta/", "loose.txt"}

        # exact reply parity with the mock contract
        p = {r["group_id"]: r["prompt"] for r in prompts.collect()}
        assert p["alpha/"] == (
            "File: alpha/one.txt\nfirst file\n\nFile: alpha/two.txt\nsecond file"
        )
        assert p["loose.txt"] == "loose body"  # single loose file: unlabeled
        for gid, row in rows.items():
            assert row["output"] == _expected_reply(p[gid])

        # artifacts: csv + per-group texts + meta + deterministic zip
        art = tmp_path / "artifacts"
        art.mkdir()
        is_folder = prompts.select("group_id", "is_folder")
        with_flag = results.join(
            is_folder, results["file"] == is_folder["group_id"]
        ).select("file", "output", "is_folder")
        write_results_csv(results, str(art))
        write_group_texts(with_flag, str(art / "texts"))
        write_job_meta({"api_key": "k-1234567890", "model": "mock"}, str(art / "meta.json"))

        csv_part = glob.glob(str(art / "output.csv" / "part-*.csv"))[0]
        lines = open(csv_part).read().splitlines()
        assert lines[0] == "file,output"
        assert len(lines) == 4

        texts = sorted(os.listdir(art / "texts"))
        assert texts == ["alpha_folder_output.txt", "beta_folder_output.txt", "loose.txt"]
        assert (art / "texts" / "loose.txt").read_text() == rows["loose.txt"]["output"]

        # flatten for packaging (package walks recursively)
        packed = package_results_zip(
            str(tmp_path / "results.zip"), str(art), formats=["text", "csv", "json"]
        )
        assert "meta.json" in packed
        assert any(name.endswith("_folder_output.txt") for name in packed)

        # determinism: rerunning the pipeline yields identical zip bytes
        zip1 = (tmp_path / "results.zip").read_bytes()
        package_results_zip(
            str(tmp_path / "results2.zip"), str(art), formats=["text", "csv", "json"]
        )
        assert (tmp_path / "results2.zip").read_bytes() == zip1

        meta = json.loads((art / "meta.json").read_text())
        assert meta["api_key_last8"] == "34567890"
        assert "api_key" not in meta
