"""The reference's §3.1 job lifecycle as one callable: a user of the
reference switches by constructing JobConfig and calling run_job.

    POST / submission          -> JobConfig (plans/config.py)
    prepare_job_input          -> sources: folder scan or zip ingest
    process_job loop           -> group -> prompt -> LLM map (mock or HTTP)
    sinks                      -> output.csv / output.json / per-group
                                  texts / concat+renumber / meta.json /
                                  deterministic results zip

Each stage is the already-tested operator; this module only wires them
in the reference's order (app.py:642-656, worker.py:246-437) and
returns the artifact manifest.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.grouping import build_groups
from openrouter_batch_processor_spark.operators.llm import (
    EMPTY_FOLDER,
    LLMConfig,
    MockTransport,
    UNSUPPORTED,
    llm_map,
)
from openrouter_batch_processor_spark.plans.config import JobConfig
from openrouter_batch_processor_spark.sinks.artifacts import (
    concatenated_text,
    json_rows,
    package_results_zip,
    render_output_json,
    write_group_texts,
    write_output_json_stream,
    write_inventory_csv,
    write_job_meta,
    write_results_csv,
)
from openrouter_batch_processor_spark.sources.ingest import (
    decode_text_files,
    file_inventory,
    scan_files,
    zip_members,
)

# Above this many result groups the output.json render switches from the
# collect()-based fast path to the streaming toLocalIterator writer
# (sinks/artifacts.py:write_output_json_stream). 100k rows of typical
# LLM outputs is ~100 MB driver-side — comfortably inside default driver
# memory; beyond it the single-file reference artifact still renders,
# just without materializing every row at once.
JSON_COLLECT_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_JSON_COLLECT_MAX", "100000"))


@dataclass
class JobResult:
    results: DataFrame
    artifacts: list[str]
    results_zip: str
    metrics: dict[str, int] | None = None


def _labeled_prompts(groups: DataFrame, footer: str) -> DataFrame:
    """F9/F10/F8: label members when multi-file/folder, join with blank
    lines, append the configured footer; emit P1/P7 sentinels."""
    from openrouter_batch_processor_spark.functions.textops import (
        label_text_for_prompt,
    )

    multi = (F.size("members") > 1) | F.col("is_folder")
    labeled = F.transform(
        F.col("members"),
        lambda m: label_text_for_prompt(m["rel_path"], m["text"], multi),
    )
    prompt = F.concat_ws("\n\n", labeled)
    if footer.strip():
        from openrouter_batch_processor_spark.functions.textops import append_footer

        prompt = append_footer(prompt, F.lit(footer))
    return groups.select(
        "group_id",
        prompt.alias("prompt"),
        F.col("file_count"),
        F.col("is_folder"),
        F.when(F.col("file_count") == 0, F.lit(EMPTY_FOLDER))
        .when(F.col("supported_count") == 0, F.lit(UNSUPPORTED))
        .otherwise(F.lit(None))
        .alias("sentinel"),
    )


def _timing_meta(spark: SparkSession, submitted_unix: int, completed_unix: int) -> dict:
    """F11/F12 job-level timing (worker.py:403-413): submitted_at /
    completed_at / elapsed_time rendered through the SAME oracle-checked
    Column implementations the registry validates (ts_format,
    elapsed_seconds, format_timedelta), evaluated on a one-row frame —
    one implementation of the nonstandard str(timedelta) format, no
    Python duplicate to drift."""
    from openrouter_batch_processor_spark.functions.timeops import (
        elapsed_seconds,
        format_timedelta,
        ts_format,
    )

    row = (
        spark.createDataFrame([(submitted_unix, completed_unix)], "s long, c long")
        .select(
            ts_format(F.timestamp_seconds(F.col("s"))).alias("submitted_at"),
            ts_format(F.timestamp_seconds(F.col("c"))).alias("completed_at"),
            format_timedelta(
                elapsed_seconds(
                    F.timestamp_seconds(F.col("s")), F.timestamp_seconds(F.col("c"))
                )
            ).alias("elapsed_time"),
        )
        .head()
    )
    return {
        "submitted_at": row["submitted_at"],
        "completed_at": row["completed_at"],
        "elapsed_time": row["elapsed_time"],
    }


def run_job(
    spark: SparkSession,
    config: JobConfig,
    job_dir: str,
    transport_factory=MockTransport,
    submitted_unix: int | None = None,
) -> JobResult:
    """Execute one job end-to-end; artifacts land under job_dir."""
    import time as _time

    t_submitted = int(submitted_unix if submitted_unix is not None else _time.time())
    config.validate()
    kind, ref = config.resolved_input()

    if kind == "folder":
        files = scan_files(spark, ref)
    else:  # existing zip or upload: distributed member ingest (S5/S6)
        members = zip_members(spark, ref)
        files = members.select(
            F.col("zip_path").alias("path"),
            F.col("rel_path"),
            F.col("length"),
            F.col("content"),
            F.current_timestamp().alias("mtime"),
        )

    texts = decode_text_files(files)
    supported = texts.select("rel_path", "text")
    # group over ALL files (unsupported members still form groups and
    # produce the sentinel row, worker.py:309-310)
    all_files = files.select("rel_path").join(
        supported, "rel_path", "left"
    )
    groups = build_groups(all_files, path_col="rel_path", text_col="text",
                          group_by_subfolder=config.group_by_subfolder)
    groups = groups.withColumn(
        "supported_count",
        F.size(F.filter(F.col("members"), lambda m: m["text"].isNotNull())),
    ).withColumn(
        "members",
        F.filter(F.col("members"), lambda m: m["text"].isNotNull()),
    )

    prompts = _labeled_prompts(groups, config.footer)
    llm_cfg = LLMConfig(
        system_prompt=config.system_prompt,
        model=config.resolved_model(),
        reasoning_mode=config.reasoning_mode,
    )
    # Materialize the LLM map EXACTLY ONCE before the sink fan-out:
    # every sink below re-triggers its input lineage, and with a real
    # HTTP transport that would mean duplicate API calls (and duplicate
    # spend) per requested format. The eager checkpoint runs the
    # transport once and pins the rows; all sinks read the materialized
    # result. On a cluster this is checkpoint() to durable storage.
    results = llm_map(prompts, llm_cfg, transport_factory).localCheckpoint(eager=True)

    # G3/T1 accounting via the Observation API: metrics ride the first
    # sink action over the checkpointed rows — no separate counting job
    # against the data.
    from pyspark.sql import Observation

    obs = Observation("job_metrics")
    results.observe(
        obs,
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
        F.count(F.when(~F.col("ok"), 1)).alias("n_failed"),
    ).write.mode("overwrite").format("noop").save()
    metrics = {k: int(v) for k, v in obs.get.items()}

    os.makedirs(job_dir, exist_ok=True)
    formats = config.resolved_formats()
    flags = prompts.select(F.col("group_id"), "is_folder")
    flagged = results.join(flags, results["file"] == flags["group_id"]).select(
        "file", "output", "ok", "is_folder"
    )

    if "csv" in formats:
        write_results_csv(results, job_dir)
        write_inventory_csv(file_inventory(files), job_dir)
    if "json" in formats:
        # Reference parity (worker.py:218): output.json is ONE file. The
        # collect() render is the small-job fast path; past the guard the
        # sorted frame streams through toLocalIterator (byte-identical
        # output, bounded driver memory) so a pathological job can't OOM.
        sorted_rows = json_rows(results).orderBy("file_name")
        json_path = os.path.join(job_dir, "output.json")
        if metrics.get("n_groups", 0) > JSON_COLLECT_MAX_ROWS:
            write_output_json_stream(sorted_rows, json_path)
        else:
            rows = [r.asDict() for r in sorted_rows.collect()]
            with open(json_path, "w", encoding="utf-8") as fh:
                fh.write(render_output_json(rows))
    if "text" in formats:
        if config.separate_outputs:
            write_group_texts(flagged, os.path.join(job_dir, "texts"))
        else:
            # Single-row head(): concatenated_text folds to ONE row whose
            # size is the whole concat text — bounded by groups-per-job
            # (a per-job artifact, not a corpus-scale path).
            concat = concatenated_text(results).head()["text"]
            with open(
                os.path.join(job_dir, "results_concat.txt"), "w", encoding="utf-8"
            ) as fh:
                fh.write(concat)

    write_job_meta(
        {
            "api_key": config.api_key,
            "model": config.resolved_model(),
            "system_prompt": config.system_prompt,
            "output_formats": formats,
            "group_by_subfolder": config.group_by_subfolder,
            "separate_outputs": config.separate_outputs,
            "input_source": kind,
            "source_route": config.source_route,
            "total_files": metrics.get("n_groups", 0),
            "processed_files": metrics.get("n_groups", 0),
            **_timing_meta(spark, t_submitted, int(_time.time())),
        },
        os.path.join(job_dir, "meta.json"),
    )
    zip_path = os.path.join(job_dir, "results.zip")
    packed = package_results_zip(zip_path, job_dir, formats)
    return JobResult(results=results, artifacts=packed, results_zip=zip_path,
                     metrics=metrics)
