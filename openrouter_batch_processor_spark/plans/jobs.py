"""§3.3 jobs-archive analytics + T3 concurrent job scheduling.

The reference runs up to 4 jobs on a ThreadPoolExecutor and renders
/jobs by joining the jobs directory with in-memory futures and sorting
with per-field null policies (app.py:19, 950-1089). Spark-first:

- T3: concurrent jobs = one Python thread per job submitting actions
  into FAIR scheduler pools (spark.scheduler.pool) — the cluster-safe
  replacement for max_workers=4. Each pool gets a fair share; a long
  job can't starve a short one.
- J1/O3: the archive listing is a left join over manifests + runtime
  status, sorted with asc_nulls_last/desc_nulls_last (the reference's
  '~~~~' / ±inf hacks are exactly SQL null ordering).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_CONCURRENT_JOBS = 4  # app.py:19 parity; a config, not a hard-code


def run_jobs_concurrently(
    spark: SparkSession,
    jobs: dict[str, Callable[[SparkSession], object]],
    max_workers: int = MAX_CONCURRENT_JOBS,
) -> dict[str, object]:
    """T3: execute independent job actions concurrently, each in its own
    FAIR pool. Returns {job_id: result-or-exception} — job failures are
    captured per job (T5 at the job level), never raised."""

    results: dict[str, object] = {}
    lock = threading.Lock()

    def run_one(job_id: str, action: Callable[[SparkSession], object]) -> None:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"job_{job_id}")
        try:
            out = action(spark)
        except Exception as exc:  # noqa: BLE001
            out = exc
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
        with lock:
            results[job_id] = out

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(run_one, jid, fn) for jid, fn in jobs.items()]
        for f in futures:
            f.result()
    return results


def jobs_archive(
    manifests: DataFrame,
    runtime_status: DataFrame,
    sort_field: str = "submitted_at",
    descending: bool = True,
) -> DataFrame:
    """J1 + O3: manifests ⋈ runtime status (broadcast left join), sorted
    by any field with nulls always last regardless of direction —
    replacing the reference's '~~~~' empty-string and ±inf elapsed
    sentinels (app.py:1038-1081)."""
    joined = manifests.join(F.broadcast(runtime_status), "job_id", "left")
    order = (
        F.desc_nulls_last(sort_field) if descending else F.asc_nulls_last(sort_field)
    )
    return joined.orderBy(order, F.asc("job_id"))
