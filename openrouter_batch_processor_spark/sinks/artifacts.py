"""Result sinks (reference ops K1-K9): the artifact contract of a job.

Reference behavior (file:line into /root/reference):
- K1/K2: output.csv / input.csv via pandas to_csv (worker.py:373-384)
- K3: output.json rows {file_name, raw_output, parsed_json-or-false}
  with indent=2, ensure_ascii=False (worker.py:209-218, 376-378)
- K4: one text file per group, names from F7 (worker.py:386-400)
- K5: concatenated text + global renumbering (worker.py:220-236)
- K6: deterministic zip — sorted entries, fixed 1980-01-01 timestamps,
  create_system=0 (app.py:139-146)
- K7: route-dependent results packaging (worker.py:417-436)
- K8: meta.json with api_key redacted to last 8 (app.py:444-452)
- K9: atomic JSON commit via tmp + replace (app.py:171-177)

Scale notes: CSV/JSON artifact writes use df.write (distributed, one
part-file per partition); the single-file variants the reference's web
UI expects coalesce(1) — an explicit, documented scale tradeoff, used
only for job-sized outputs (one row per LLM group), never for table
data. The zip/meta/registry steps are driver-side COMMIT actions over
already-aggregated artifacts, not data-plane operators.
"""

from __future__ import annotations

import json
import os
import zipfile
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.paths import output_filename
from openrouter_batch_processor_spark.operators.renumber import renumber_small


def write_results_csv(results: DataFrame, out_dir: str) -> None:
    """K1: result rows -> output.csv with header, column order
    (file, output). Single file: job outputs are one row per group."""
    (
        results.select("file", "output")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .csv(os.path.join(out_dir, "output.csv"))
    )


def write_inventory_csv(inventory: DataFrame, out_dir: str) -> None:
    """K2: input inventory sorted by full_path -> input.csv."""
    (
        inventory.select("file_name", "full_path", "file_type", "file_size")
        .orderBy("full_path")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .csv(os.path.join(out_dir, "input.csv"))
    )


def json_rows(results: DataFrame) -> DataFrame:
    """K3 rows: {file_name, raw_output, parsed_json, parse_ok} using the
    F13 repair parse. The reference's `parsed_json: false` sentinel is
    reproduced at serialization time from parse_ok."""
    from openrouter_batch_processor_spark.functions.textops import json_repair_parse

    return results.select(
        F.col("file").alias("file_name"),
        F.col("output").alias("raw_output"),
        json_repair_parse(F.col("output")).alias("_r"),
    ).select("file_name", "raw_output", "_r.parsed_json", "_r.parse_ok")


def render_output_json(rows: Iterable[dict]) -> str:
    """K3 serialization: list of {file_name, raw_output, parsed_json}
    where parse failure renders the literal ``false`` (worker.py:218),
    indent=2, ensure_ascii=False — byte parity with the reference."""
    payload = [
        {
            "file_name": r["file_name"],
            "raw_output": r["raw_output"],
            "parsed_json": json.loads(r["parsed_json"]) if r["parse_ok"] else False,
        }
        for r in rows
    ]
    return json.dumps(payload, indent=2, ensure_ascii=False)


def write_output_json_stream(json_rows_sorted: DataFrame, path: str) -> int:
    """K3 at unbounded size: stream the output.json array to disk via
    toLocalIterator() — one partition in driver memory at a time — with
    byte-for-byte the same rendering as render_output_json (indent=2,
    ensure_ascii=False, parse failure -> literal ``false``). The
    collect()-based path in plans/job_runner.py is the small-job fast
    path; this is its size-guard fallback, so a pathological job (many
    millions of groups) can't OOM the driver. Returns the row count.

    Expects the frame already sorted by file_name (the sort happens in
    Spark; a driver-side sort would defeat the bound)."""
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        for row in json_rows_sorted.toLocalIterator(prefetchPartitions=True):
            element = {
                "file_name": row["file_name"],
                "raw_output": row["raw_output"],
                "parsed_json": json.loads(row["parsed_json"])
                if row["parse_ok"]
                else False,
            }
            body = json.dumps(element, indent=2, ensure_ascii=False)
            fh.write("[\n" if n == 0 else ",\n")
            fh.write("  " + body.replace("\n", "\n  "))
            n += 1
        fh.write("[]" if n == 0 else "\n]")
    return n


def write_group_texts(results: DataFrame, out_dir: str) -> int:
    """K4: one .txt per result row, named by F7. Executor-side writes
    via foreachPartition (no driver collect); returns row count.

    Requires columns: file (group_id), output, is_folder.
    """
    os.makedirs(out_dir, exist_ok=True)
    named = results.select(
        output_filename(F.col("file"), F.col("is_folder")).alias("name"),
        F.col("output"),
    )

    def write_partition(rows) -> None:
        for row in rows:
            target = os.path.join(out_dir, row["name"])
            os.makedirs(os.path.dirname(target) or out_dir, exist_ok=True)
            with open(target, "w", encoding="utf-8") as fh:
                fh.write(row["output"] if row["output"] is not None else "")

    named.foreachPartition(write_partition)
    return len([p for p in os.listdir(out_dir)])


def concatenated_text(results: DataFrame, order_col: str = "file") -> DataFrame:
    """K5: renumbered outputs joined with '\\n' in group order — one row,
    one column `text` (the reference's concat-results artifact)."""
    renumbered = renumber_small(results, order_col)
    return renumbered.orderBy(order_col).agg(
        F.concat_ws("\n", F.collect_list("output")).alias("text")
    )


def write_deterministic_zip(out_path: str, files: dict[str, bytes]) -> None:
    """K6: byte-stable archive — lexicographically sorted entries, fixed
    (1980,1,1,0,0,0) timestamps, create_system=0, ZIP_DEFLATED. Same
    inputs -> same bytes -> same sha256, the property the content-
    addressed registry (X1) depends on."""
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(files):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.create_system = 0
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, files[name])


def package_results_zip(
    out_path: str,
    artifact_dir: str,
    formats: list[str],
    include_inventory: bool = True,
) -> list[str]:
    """K7/X3: route-dependent artifact selection into the results zip.

    formats ⊆ {text, csv, json} controls which artifact families go in
    (worker.py:417-436); meta.json always rides along if present.
    Returns the packed entry names (sorted — the zip is deterministic).
    """
    wanted: list[str] = []
    for root, _dirs, names in os.walk(artifact_dir):
        for name in names:
            rel = os.path.relpath(os.path.join(root, name), artifact_dir).replace(
                "\\", "/"
            )
            if name == "meta.json":
                wanted.append(rel)
            elif name.endswith(".txt") and "text" in formats:
                wanted.append(rel)
            elif name.endswith(".csv") and "csv" in formats:
                if name.startswith("input") and not include_inventory:
                    continue
                wanted.append(rel)
            elif name.endswith(".json") and "json" in formats:
                wanted.append(rel)
    payload = {
        rel: open(os.path.join(artifact_dir, rel), "rb").read() for rel in wanted
    }
    write_deterministic_zip(out_path, payload)
    return sorted(payload)


def write_job_meta(meta: dict, out_path: str) -> dict:
    """K8: persist job meta with the api key redacted to its last 8
    chars (F15); atomic via tmp + os.replace (K9 discipline)."""
    redacted = {k: v for k, v in meta.items() if k != "api_key"}
    if meta.get("api_key"):
        redacted["api_key_last8"] = str(meta["api_key"])[-8:]
    tmp = out_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(redacted, fh, indent=2, ensure_ascii=False)
    os.replace(tmp, out_path)
    return redacted


def commit_registry(entries: list[dict], out_path: str) -> None:
    """K9: atomic registry commit — write tmp, then os.replace. On a
    real deployment this is a Delta MERGE; the file form keeps parity
    with the reference's {version:1, entries:[...]} shape."""
    tmp = out_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"version": 1, "entries": entries}, fh, indent=2)
    os.replace(tmp, out_path)
