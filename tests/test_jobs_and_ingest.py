"""T3 concurrent jobs, J1/O3 archive listing, X1 ingest dedup, T4 rate
limiting."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.plans.jobs import jobs_archive, run_jobs_concurrently
from openrouter_batch_processor_spark.sources.dedup_ingest import (
    register_new,
    split_ingest,
)

REG_ROWS = [
    ("stored_a.zip", "za" * 32, "ca" * 32, 100, "2026-01-01 00:00:00", "uploaded"),
    ("stored_b.zip", "zb" * 32, "cb" * 32, 200, "2026-01-02 00:00:00", "folder"),
]
REG_SCHEMA = (
    "zip_name string, zip_sha256 string, content_sha256 string, "
    "size_bytes long, created_at string, source string"
)
NEW_SCHEMA = "upload_name string, zip_sha256 string, content_sha256 string, size_bytes long"


class TestIngestDedup:
    def _fixtures(self, spark):
        registry = spark.createDataFrame(REG_ROWS, REG_SCHEMA)
        new = spark.createDataFrame(
            [
                ("dup by content.zip", "zX" * 32, "ca" * 32, 100),  # content hit
                ("dup by zipsha.zip", "zb" * 32, "cX" * 32, 200),  # zip hit
                ("brand new!.zip", "zn" * 32, "cn" * 32, 300),  # miss
            ],
            NEW_SCHEMA,
        )
        return registry, new

    def test_split(self, spark):
        registry, new = self._fixtures(spark)
        reused, to_store = split_ingest(new, registry)
        got_reused = {r["upload_name"]: r["reuse_zip_name"] for r in reused.collect()}
        assert got_reused == {
            "dup by content.zip": "stored_a.zip",
            "dup by zipsha.zip": "stored_b.zip",
        }
        stored = to_store.collect()
        assert len(stored) == 1
        # F6: sanitized stem ('brand new!' -> 'brand_new_') + '_' + first-12
        # of the content hash
        assert stored[0]["zip_name"] == "brand_new__" + "cn" * 6 + ".zip"

    def test_register_appends_once(self, spark):
        registry, new = self._fixtures(spark)
        _, to_store = split_ingest(new, registry)
        doubled = to_store.unionByName(to_store)  # double submission
        updated = register_new(registry, doubled, "2026-08-13 00:00:00", "uploaded")
        assert updated.count() == 3
        assert updated.filter(F.col("zip_name").startswith("brand_new_")).count() == 1


class TestJobsArchive:
    def test_null_policy_sorting(self, spark):
        manifests = spark.createDataFrame(
            [("j1", "2026-01-02"), ("j2", None), ("j3", "2026-01-01")],
            "job_id string, submitted_at string",
        )
        status = spark.createDataFrame([("j1", "running")], "job_id string, state string")
        desc = [r["job_id"] for r in jobs_archive(manifests, status).collect()]
        assert desc == ["j1", "j3", "j2"]  # nulls last even descending
        asc = [
            r["job_id"]
            for r in jobs_archive(manifests, status, descending=False).collect()
        ]
        assert asc == ["j3", "j1", "j2"]
        # the broadcast join carried runtime state
        row = jobs_archive(manifests, status).filter(F.col("job_id") == "j1").head()
        assert row["state"] == "running"


class TestConcurrentJobs:
    def test_all_jobs_complete_and_failures_captured(self, spark):
        def ok_job(n):
            def run(s):
                return s.range(n).agg(F.sum("id")).head()[0]

            return run

        def bad_job(s):
            raise RuntimeError("job exploded")

        results = run_jobs_concurrently(
            spark, {"a": ok_job(10), "b": ok_job(100), "c": bad_job}
        )
        assert results["a"] == 45
        assert results["b"] == 4950
        assert isinstance(results["c"], RuntimeError)


class TestRateLimit:
    def test_token_bucket_paces_partition(self, spark):
        from openrouter_batch_processor_spark.operators.llm import (
            LLMConfig,
            MockTransport,
            llm_map,
        )

        rows = [(f"g{i}", "p", 1, None) for i in range(6)]
        df = spark.createDataFrame(
            rows, "group_id string, prompt string, file_count long, sentinel string"
        ).coalesce(1)
        cfg = LLMConfig(requests_per_second=20.0)  # 1 partition -> 50ms/req
        t0 = time.perf_counter()
        out = llm_map(df, cfg, MockTransport).collect()
        elapsed = time.perf_counter() - t0
        assert len(out) == 6
        assert elapsed >= 6 * 0.05  # paced: ≥ n/rate
