"""Per-query profiling harness (guide §1: measure first).

For every registry query (or a --only subset) this times, separately:
  - build_s: spec.fn(spark, sf_dir) — Python expression-tree construction,
    py4j traffic, plan-build-time jobs (localCheckpoint/staged builds,
    auto-dial counts);
  - exec_s: the noop write — analysis + optimization + execution;
and records how many Spark jobs/stages/tasks the whole invocation
launched (REST-free: uses the SparkContext status tracker via py4j).

Two passes; pass 1 is cold (staged artifacts build there), pass 2 is the
warm shape the bench's median reports. Output: JSON to stdout +
/root/repo/plans/$SPARK_GRAFT_PROFILE_ROUND/profile.json (default r14).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    from openrouter_batch_processor_spark.registry import REGISTRY
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jsc = sc._jsc.sc()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(2_000_000).selectExpr(
        "max(levenshtein(concat('abcdefgh', id), concat('abczzz', id), 2))",
        "max(md5(cast(id as string)))",
        "max(regexp_replace(cast(id as string), '[0-3]', 'x'))",
    ).collect()
    from openrouter_batch_processor_spark.session import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            _ = load_table(spark, sf_dir, name).schema

    def job_ids() -> set[int]:
        return set(tracker.getJobIdsForGroup(None) or [])

    items = [
        (n, s) for n, s in REGISTRY.items() if only is None or n in only
    ]
    out: dict[str, dict] = {}
    for pass_no in (1, 2):
        for name, spec in items:
            sc.setJobDescription(f"profile:{name}")
            before_jobs = jsc.dagScheduler().nextJobId()
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, sf_dir)
                t1 = time.perf_counter()
                mid_jobs = jsc.dagScheduler().nextJobId()
                df.write.mode("overwrite").format("noop").save()
                t2 = time.perf_counter()
                after_jobs = jsc.dagScheduler().nextJobId()
            except Exception as exc:  # noqa: BLE001
                out.setdefault(name, {})[f"err{pass_no}"] = f"{type(exc).__name__}: {exc}"
                continue
            rec = out.setdefault(name, {})
            rec[f"p{pass_no}"] = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "build_jobs": int(mid_jobs - before_jobs),
                "exec_jobs": int(after_jobs - mid_jobs),
            }
            sc.setJobDescription(None)

    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PROFILE_ROUND", "r14"),
        "profile.json",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    # compact digest to stdout: warm pass sorted by total
    rows = []
    for name, rec in out.items():
        p2 = rec.get("p2")
        if p2:
            rows.append(
                (
                    p2["build_s"] + p2["exec_s"],
                    p2["build_s"],
                    p2["exec_s"],
                    p2["build_jobs"],
                    p2["exec_jobs"],
                    name,
                )
            )
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"TOTAL warm {tot:.1f}s  build {tb:.1f}s  exec {te:.1f}s  n={len(rows)}")
    print(f"{'total':>7} {'build':>7} {'exec':>7} {'bjob':>5} {'ejob':>5}  name")
    for t, b, e, bj, ej, name in rows[:60]:
        print(f"{t:7.3f} {b:7.3f} {e:7.3f} {bj:5d} {ej:5d}  {name}")


if __name__ == "__main__":
    main()
