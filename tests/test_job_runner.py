"""run_job end-to-end: folder route, zip route, format selection,
sentinel rows, artifact manifest."""

from __future__ import annotations

import json
import zipfile

import pytest

from openrouter_batch_processor_spark.plans.config import JobConfig
from openrouter_batch_processor_spark.plans.job_runner import run_job


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "in"
    (root / "alpha").mkdir(parents=True)
    (root / "alpha" / "a.txt").write_text("alpha a")
    (root / "alpha" / "b.txt").write_text("alpha b")
    (root / "alpha" / "img.png").write_bytes(b"binary")  # unsupported in group
    (root / "bad").mkdir()
    (root / "bad" / "img.png").write_bytes(b"binary")  # unsupported-only group
    (root / "loose.txt").write_text("loose")
    return root


class TestFolderRoute:
    def test_artifacts_and_sentinels(self, spark, tmp_path, tree):
        cfg = JobConfig(
            api_key="k-abcdefgh",
            system_prompt="sys",
            input_folder=str(tree),
            output_formats=["csv", "json", "text"],
            separate_outputs=True,
            footer="-- end --",
        )
        job_dir = tmp_path / "job"
        res = run_job(spark, cfg, str(job_dir))
        rows = {r["file"]: r for r in res.results.collect()}
        assert set(rows) == {"alpha/", "bad/", "loose.txt"}
        assert rows["bad/"]["output"] == "Unsupported file type"
        assert rows["alpha/"]["ok"] is True

        assert (job_dir / "meta.json").exists()
        meta = json.loads((job_dir / "meta.json").read_text())
        assert meta["api_key_last8"] == "abcdefgh"
        assert "api_key" not in meta

        with zipfile.ZipFile(res.results_zip) as zf:
            names = zf.namelist()
        assert "meta.json" in names
        assert any(n.startswith("texts/") for n in names)
        assert any(n.startswith("output.csv/") for n in names)
        assert "output.json" in names

    def test_concat_route(self, spark, tmp_path, tree):
        cfg = JobConfig(
            api_key="k",
            system_prompt="s",
            input_folder=str(tree),
            output_formats=["text"],
            separate_outputs=False,
        )
        job_dir = tmp_path / "job2"
        res = run_job(spark, cfg, str(job_dir))
        concat = (job_dir / "results_concat.txt").read_text()
        assert concat.count("\n") == 2  # 3 groups joined
        assert "results_concat.txt" in res.artifacts


class TestZipRoute:
    def test_zip_ingest(self, spark, tmp_path):
        zpath = tmp_path / "input.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            zf.writestr("g1/x.txt", "one")
            zf.writestr("g1/y.txt", "two")
            zf.writestr("solo.txt", "three")
        cfg = JobConfig(
            api_key="k", system_prompt="s", input_zip=str(zpath), output_formats=["csv"]
        )
        job_dir = tmp_path / "job3"
        res = run_job(spark, cfg, str(job_dir))
        rows = {r["file"]: r["ok"] for r in res.results.collect()}
        assert rows == {"g1/": True, "solo.txt": True}
        assert (job_dir / "output.csv").exists()
        assert (job_dir / "input.csv").exists()


class TestSingleMaterialization:
    def test_transport_called_once_per_group_despite_sink_fanout(
        self, spark, tree, tmp_path
    ):
        calls_log = str(tmp_path / "calls.log")
        open(calls_log, "w").close()

        # Defined inside the test so cloudpickle ships it by VALUE to the
        # UDF workers (a module-level class in tests/ is not importable
        # there). One line per LLM call, appended across worker
        # processes.
        def counting_factory(config):
            from openrouter_batch_processor_spark.operators.llm import MockTransport

            inner = MockTransport(config)

            class _T:
                def complete(self, prompt):
                    with open(calls_log, "a") as fh:
                        fh.write("x\n")
                    return inner.complete(prompt)

            return _T()

        cfg = JobConfig(
            api_key="k" * 12,
            system_prompt="sys",
            input_folder=str(tree),
            output_formats=["csv", "json", "text"],  # three sink families
            group_by_subfolder=True,
            separate_outputs=True,
        )
        res = run_job(spark, cfg, job_dir=str(tmp_path / "job"),
                      transport_factory=counting_factory)
        n_calls = sum(1 for _ in open(calls_log))
        n_llm_groups = res.metrics["n_groups"]
        # sentinel groups (empty/unsupported) never reach the transport
        sentinels = res.results.filter(
            "output IN ('Empty folder', 'Unsupported file type')"
        ).count()
        assert n_calls == n_llm_groups - sentinels > 0
        assert res.metrics["n_ok"] + res.metrics["n_failed"] == n_llm_groups


class TestTimingMeta:
    def test_timing_rendered_via_column_helpers(self, spark):
        from openrouter_batch_processor_spark.plans.job_runner import _timing_meta

        # 2024-01-02 03:04:05 UTC -> +1 day, 2:03:04
        s = 1704164645
        out = _timing_meta(spark, s, s + 86400 + 2 * 3600 + 3 * 60 + 4)
        assert out["submitted_at"] == "2024-01-02 03:04:05"
        assert out["completed_at"] == "2024-01-03 05:07:09"
        assert out["elapsed_time"] == "1 day, 2:03:04"

    def test_sub_day_elapsed_format(self, spark):
        from openrouter_batch_processor_spark.plans.job_runner import _timing_meta

        out = _timing_meta(spark, 1704164645, 1704164645 + 3723)
        assert out["elapsed_time"] == "1:02:03"
