"""Generate COVERAGE.md: every SURVEY.md §2 op ID -> implementation
module + verification (oracle-checked registry queries and/or pytest).

Run: python tools/coverage.py   (rewrites COVERAGE.md)
"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

# Ops whose natural surface is the filesystem / driver control plane /
# streaming engine rather than a parquet-in DataFrame-out query — these
# are verified by pytest instead of the DuckDB oracle.
PYTEST_COVERAGE = {
    "S1": ("sources/ingest.scan_files", "tests/test_sources.py"),
    "S3": ("sources/ingest.decode_text_files", "tests/test_sources.py"),
    "S4": ("sources/ingest.image_data_urls", "tests/test_sources.py"),
    "S5": ("sources/ingest.zip_members", "tests/test_sources.py"),
    "S6": ("sources/ingest.zip_members", "tests/test_sources.py"),
    "S7": ("sources/ingest.load_ingest_registry", "tests/test_sources.py"),
    "S8": ("sources/ingest.load_job_metas", "tests/test_sources.py"),
    "S9": ("sources/ingest.list_zips", "tests/test_sources.py"),
    "K1": ("sinks/artifacts.write_results_csv", "tests/test_sinks.py, tests/test_golden_e2e.py"),
    "K2": ("sinks/artifacts.write_inventory_csv", "tests/test_sinks.py"),
    "K3": ("sinks/artifacts.json_rows + render_output_json", "tests/test_sinks.py"),
    "K4": ("sinks/artifacts.write_group_texts", "tests/test_sinks.py, tests/test_golden_e2e.py"),
    "K5": ("sinks/artifacts.concatenated_text", "tests/test_sinks.py"),
    "K6": ("sinks/artifacts.write_deterministic_zip", "tests/test_sinks.py"),
    "K7": ("sinks/artifacts.package_results_zip", "tests/test_sinks.py, tests/test_golden_e2e.py"),
    "K8": ("sinks/artifacts.write_job_meta", "tests/test_sinks.py"),
    "K9": ("sinks/artifacts.commit_registry + sinks/registry_table.merge_registry_table (parquet MERGE)", "tests/test_sinks.py, tests/test_registry_table.py"),
    "F5": ("operators/grouping.file_set_hash", "tests/test_grouping.py"),
    "F7": ("functions/paths.output_filename", "tests/test_sinks.py"),
    "F8": ("functions/textops.append_footer", "tests/test_textops.py"),
    "F12": ("functions/timeops", "tests/test_timeops.py"),
    "F13": ("functions/textops.json_repair_parse", "tests/test_textops.py (+ hypothesis)"),
    "F16": ("functions/textops.normalize_formats", "tests/test_textops.py"),
    "G1": ("operators/grouping.build_groups", "tests/test_grouping.py"),
    "O5": ("sinks/artifacts.write_inventory_csv (orderBy at sink)", "tests/test_sinks.py"),
    "P5": ("registry p5_p6_path_guards", "oracle"),
    "P7": ("operators/llm sentinels", "tests/test_llm.py"),
    "P8": ("plans/config.JobConfig.validate", "tests/test_config.py"),
    "T1": ("streaming/windows.progress_stream + stateful.progress_tracker (applyInPandasWithState)", "tests/test_streaming.py"),
    "T2": ("streaming/windows.run_to_memory + table poll", "tests/test_streaming.py"),
    "T3": ("plans/jobs.run_jobs_concurrently (FAIR pools)", "tests/test_jobs_and_ingest.py"),
    "T4": ("operators/llm token bucket", "tests/test_jobs_and_ingest.py"),
    "T5": ("operators/llm error capture", "tests/test_llm.py"),
    "W1": ("operators/renumber", "tests/test_renumber.py"),
    "W2": ("operators/renumber (progress index)", "tests/test_renumber.py"),
    "X1": ("sources/dedup_ingest.split_ingest", "tests/test_jobs_and_ingest.py"),
    "D1": ("plans/config.JobConfig", "tests/test_config.py"),
    "D2": ("sources/ingest.file_inventory", "tests/test_sources.py"),
    "D3": ("operators/grouping.build_groups", "tests/test_grouping.py"),
    "D5": ("functions/textops repair sentinel", "tests/test_textops.py, tests/test_sinks.py"),
    "D6": ("operators/multimodal + functions/hashing.data_url", "tests/test_multimodal.py"),
    "D7": ("operators/aggregates usage fold", "oracle g2_usage_fold"),
    "D8": ("sources/ingest.REGISTRY_SCHEMA + dedup_ingest", "tests/test_sources.py"),
    "D9": ("plans/jobs.jobs_archive", "tests/test_jobs_and_ingest.py"),
    "D10": ("registry MODEL_CATALOG dim", "oracle j3_j4_model_dim_join"),
}

EXT_DESCRIPTIONS = {
    "EXT-minhash": "MinHash signatures + banded LSH candidate pairs",
    "EXT-jaccard": "exact n-gram Jaccard verify over LSH candidates",
    "EXT-simhash": "weighted 32-bit SimHash",
    "EXT-neardup": "embedding cosine near-dup pairs",
    "EXT-simsearch": "cosine top-k (brute force)",
    "EXT-ivf": "IVF-pruned approximate top-k",
    "EXT-langid": "n-gram/stopword language id",
    "EXT-quality": "document quality scoring",
    "EXT-tokens": "token counting (ws + BPE-ish regex)",
    "EXT-fingerprint": "document fingerprints (md5 + rolling hash)",
    "EXT-windows": "event-time tumbling windows",
    "EXT-sessions": "gap sessionization",
    "EXT-relational": "TPC-H-shaped relational headliners",
}


def main() -> None:
    from openrouter_batch_processor_spark.registry import REGISTRY

    by_op: dict[str, list[str]] = defaultdict(list)
    for name, spec in REGISTRY.items():
        for op in spec.ops:
            kind = "oracle" if spec.sql else "rows-only"
            by_op[op].append(f"`{name}` ({kind})")

    lines = [
        "# COVERAGE — SURVEY.md §2 op inventory -> implementation & verification",
        "",
        "Generated by `python tools/coverage.py`. Two verification tiers:",
        "**oracle** = DuckDB value-hash parity at sf0.01 (driver gate);",
        "**pytest** = unit/golden tests under `tests/`.",
        "",
        "| Op | Registry queries | Module / pytest |",
        "|---|---|---|",
    ]

    def sort_key(op: str):
        import re

        m = re.match(r"([A-Z]+)-?(\d*)", op)
        # full op string as the final tiebreak: every EXT-* op maps to
        # ("EXT", 0), and without it their order is set-iteration order
        # (hash-randomized per process) — COVERAGE.md would churn on
        # every regeneration
        return (m.group(1), int(m.group(2) or 0), op)

    all_ops = sorted(set(by_op) | set(PYTEST_COVERAGE), key=sort_key)
    core = [o for o in all_ops if not o.startswith("EXT")]
    ext = [o for o in all_ops if o.startswith("EXT")]
    for op in core:
        queries = "; ".join(by_op.get(op, [])) or "—"
        extra = PYTEST_COVERAGE.get(op)
        where = f"{extra[0]} — {extra[1]}" if extra else "—"
        lines.append(f"| {op} | {queries} | {where} |")
    lines += ["", "## North-star extensions", "", "| Op | Registry queries | What |", "|---|---|---|"]
    for op in ext:
        queries = "; ".join(by_op.get(op, [])) or "—"
        lines.append(f"| {op} | {queries} | {EXT_DESCRIPTIONS.get(op, '')} |")
    lines.append("")

    # Driver-certification ledger summary — GENERATED from
    # rotation_ledger.DRIVER_CHECKED so certification claims can never
    # drift from the evidence (VERDICT r03 item 2: the hand-written
    # "all 50 first-time" claim was actually 45 first-time + 5 re-checks).
    from openrouter_batch_processor_spark.rotation_ledger import (
        DRIVER_CHECKED,
        driver_green,
    )

    lines += ["## Driver CORRECTNESS certification (from rotation_ledger)", ""]
    seen: set[str] = set()
    for rnd in sorted(DRIVER_CHECKED):
        names = DRIVER_CHECKED[rnd]
        first = [n for n in names if n not in seen]
        lines.append(
            f"- **{rnd}**: {len(names)} green rows — {len(first)} first-time, "
            f"{len(names) - len(first)} re-checks"
        )
        seen |= set(names)
    certified = driver_green() & set(REGISTRY)
    remaining = sorted(set(REGISTRY) - certified)
    window = list(REGISTRY)[:50]
    in_window = [n for n in remaining if n in window]
    lines += [
        f"- **Total**: {len(certified)}/{len(REGISTRY)} registry queries have a "
        f"driver row; {len(remaining)} never-checked, of which "
        f"{len(in_window)} sit in the current front-50 window.",
        "",
    ]

    with open("/root/repo/COVERAGE.md", "w") as fh:
        fh.write("\n".join(lines))
    n_oracle = sum(1 for s in REGISTRY.values() if s.sql)
    print(
        f"COVERAGE.md written: {len(core)} core ops, {len(ext)} extensions, "
        f"{len(REGISTRY)} queries ({n_oracle} oracle-checked)"
    )


if __name__ == "__main__":
    main()
