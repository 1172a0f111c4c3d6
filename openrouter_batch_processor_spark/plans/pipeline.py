"""The flagship pipeline: scan -> group -> prompt-assemble -> LLM map ->
results + usage aggregation (reference lifecycle §3.1, worker.py:246-437).

The driver's `documents` table stands in for the extracted input tree:
each document becomes a file `src<k>/doc_<id>.txt`, each source a
subfolder group (group_by_subfolder=True). The LLM transport is the
deterministic mock (reply = md5 of the assembled prompt), which makes
the ENTIRE pipeline — grouping, ordering, labeling, prompt assembly,
inference, token/cost accounting — DuckDB-oracle-checkable.

Plan shape (one shuffle):
  parquet scan (pruned to doc_id, text, source)
    -> narrow projections (rel_path, labeled text)
    -> groupBy(group_id): sort_array(collect_list)  [the one shuffle]
    -> mapInPandas LLM call                          [no extra shuffle]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.llm import LLMConfig, MockTransport, llm_map
from openrouter_batch_processor_spark.session import load_table

SYSTEM_PROMPT = "You are a batch processor."


def documents_as_files(docs: DataFrame) -> DataFrame:
    """Map the documents table onto the reference's file inventory shape.

    rel_path zero-pads doc_id so lexicographic order == numeric order
    (the reference sorts members lexicographically; worker.py:25)."""
    rel = F.concat(
        F.col("source"),
        F.lit("/doc_"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        F.lit(".txt"),
    )
    return docs.select(
        F.col("doc_id"),
        rel.alias("rel_path"),
        F.concat(F.col("source"), F.lit("/")).alias("group_id"),
        F.col("text"),
    )


def assemble_prompts(files: DataFrame) -> DataFrame:
    """G1 + F9 + F10: per group, members sorted by rel_path, each labeled
    'File: <rel>\\n<text>' (groups here are folders, so the multi-file
    labeling gate is always on), joined by blank lines."""
    labeled = files.withColumn(
        "labeled",
        F.concat(F.lit("File: "), F.col("rel_path"), F.lit("\n"), F.col("text")),
    )
    grouped = labeled.groupBy("group_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("rel_path"), F.col("labeled")))
        ).alias("members")
    )
    return grouped.select(
        "group_id",
        F.concat_ws("\n\n", F.transform(F.col("members"), lambda m: m["labeled"])).alias(
            "prompt"
        ),
        F.size("members").alias("file_count"),
    )


def documents_as_mixed_files(docs: DataFrame) -> DataFrame:
    """Multimodal variant of documents_as_files: every 5th document
    plays an image (.png; payload = base64 data-URL of its text bytes —
    a deterministic stand-in for real image bytes), the rest text.
    """
    is_img = F.col("doc_id") % 5 == 0
    rel = F.concat(
        F.col("source"),
        F.lit("/doc_"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        F.when(is_img, F.lit(".png")).otherwise(F.lit(".txt")),
    )
    return docs.select(
        F.col("doc_id"),
        rel.alias("rel_path"),
        F.concat(F.col("source"), F.lit("/")).alias("group_id"),
        F.col("text"),
        is_img.alias("is_image"),
    )


def assemble_multimodal_parts(files: DataFrame) -> DataFrame:
    """D6/F9/F10 with image support (worker.py:69-98 parity): per file,
    text -> one labeled text part; image -> a 'Please analyze image:'
    text part followed by an image_url part whose content is the base64
    data-URL (F14). Groups are folders, so labeling is always on and
    image labels are the rel path. Parts keep rel_path member order.

    Output: group_id, parts (array<ptype,content>), file_count.
    """
    from openrouter_batch_processor_spark.functions.hashing import data_url as _du

    data_url = _du(F.encode(F.col("text"), "UTF-8"), F.lit("image/png"))
    file_parts = F.when(
        F.col("is_image"),
        F.array(
            F.struct(
                F.lit("text").alias("ptype"),
                F.concat(F.lit("Please analyze image: "), F.col("rel_path")).alias(
                    "content"
                ),
            ),
            F.struct(F.lit("image_url").alias("ptype"), data_url.alias("content")),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit("text").alias("ptype"),
                F.concat(
                    F.lit("File: "), F.col("rel_path"), F.lit("\n"), F.col("text")
                ).alias("content"),
            )
        )
    )
    grouped = (
        files.withColumn("file_parts", file_parts)
        .groupBy("group_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("rel_path"), F.col("file_parts")))
            ).alias("members")
        )
    )
    return grouped.select(
        "group_id",
        F.flatten(F.transform(F.col("members"), lambda m: m["file_parts"])).alias(
            "parts"
        ),
        F.size("members").alias("file_count"),
    )


def run_llm_pipeline_multimodal(
    spark: SparkSession, sf_dir: str, rate: float = 0.0
) -> DataFrame:
    """documents.parquet -> mixed text/image groups -> parts-array
    prompt assembly -> mock LLM (hashes the full multimodal payload)."""
    docs = load_table(spark, sf_dir, "documents")
    groups = assemble_multimodal_parts(documents_as_mixed_files(docs))
    config = LLMConfig(system_prompt=SYSTEM_PROMPT, requests_per_second=rate)
    return llm_map(groups, config, MockTransport)


def run_llm_pipeline(spark: SparkSession, sf_dir: str, rate: float = 0.0) -> DataFrame:
    """documents.parquet -> grouped prompts -> mock LLM -> result rows."""
    docs = load_table(spark, sf_dir, "documents")
    groups = assemble_prompts(documents_as_files(docs))
    config = LLMConfig(system_prompt=SYSTEM_PROMPT, requests_per_second=rate)
    return llm_map(groups, config, MockTransport)


# DuckDB oracle for the whole pipeline (used by registry + driver):
PIPELINE_ORACLE_SQL = """
WITH files AS (
    SELECT doc_id,
           source || '/doc_' || lpad(doc_id::VARCHAR, 6, '0') || '.txt' AS rel_path,
           source || '/' AS group_id,
           text
    FROM documents
), prompts AS (
    SELECT group_id,
           string_agg('File: ' || rel_path || chr(10) || text, chr(10) || chr(10)
                      ORDER BY rel_path) AS prompt,
           count(*) AS file_count
    FROM files GROUP BY group_id
)
SELECT group_id AS file,
       md5('You are a batch processor.' || chr(10) || prompt) AS output,
       TRUE AS ok,
       len(regexp_extract_all(prompt, '\\S+')) AS prompt_tokens,
       1::BIGINT AS completion_tokens,
       len(regexp_extract_all(prompt, '\\S+')) + 1 AS total_tokens,
       round(len(regexp_extract_all(prompt, '\\S+')) * 0.000001, 12) AS cost
FROM prompts
"""


def _ensure_llm_archives(spark: SparkSession, sf_dir: str) -> str:
    """Build the ZIP-archive FIXTURE the streaming pipeline ingests: one
    deterministic archive per source (K6 byte-stable writer), members
    named exactly like documents_as_files' inventory rows. This is test
    scaffolding standing in for the reference's uploaded archives
    (app.py:798 submit) — production consumes archives that already
    exist, so the driver-side collect here is fixture construction, not
    part of the pipeline's scale contract. Idempotent per sf_dir (a
    marker file skips the rebuild on every later run)."""
    import hashlib
    import os
    import tempfile

    from openrouter_batch_processor_spark.sinks.artifacts import (
        write_deterministic_zip,
    )

    # Key on the documents parquet's IDENTITY (path + mtime + size),
    # not just the path: the external driver regenerates testdata
    # between rounds, and a stale fixture would silently diverge from
    # the oracle's view of the table.
    src_parquet = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src_parquet)
    ident = f"{src_parquet}:{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(ident.encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"llm_zip_fixture_{key}")
    done = os.path.join(out_dir, "_FIXTURE_READY")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    rows = documents_as_files(docs).select("group_id", "rel_path", "text").collect()
    by_src: dict[str, dict[str, bytes]] = {}
    for r in rows:
        by_src.setdefault(r["group_id"].rstrip("/"), {})[r["rel_path"]] = r[
            "text"
        ].encode("utf-8")
    for src, members in by_src.items():
        write_deterministic_zip(os.path.join(out_dir, f"{src}.zip"), members)
    with open(done, "w") as fh:
        fh.write("ok")
    return out_dir


def run_streaming_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL product loop as ONE Structured Streaming
    query (VERDICT r03 item 5): archive arrival (zipmembers streaming
    DataSource, app.py:798 submit trigger) -> member decode -> per-group
    prompt assembly (stateful complete-mode aggregation) -> mock LLM map
    -> per-group usage/cost rows (RESULT_SCHEMA), availableNow into a
    memory sink. Grouping, labels, ordering and the usage fold are the
    batch pipeline's own operators, so PIPELINE_ORACLE_SQL value-checks
    the streaming run bit-for-bit against the documents table."""
    import os
    import tempfile

    from openrouter_batch_processor_spark.sources.zip_datasource import (
        register_zip_source,
    )
    from openrouter_batch_processor_spark.streaming.windows import run_to_memory

    arch_dir = _ensure_llm_archives(spark, sf_dir)
    register_zip_source(spark)
    members = spark.readStream.format("zipmembers").load(
        os.path.join(arch_dir, "*.zip")
    )
    files = members.select(
        F.col("rel_path"),
        F.concat(F.substring_index(F.col("rel_path"), "/", 1), F.lit("/")).alias(
            "group_id"
        ),
        F.col("content").cast("string").alias("text"),
    )
    groups = assemble_prompts(files)
    config = LLMConfig(system_prompt=SYSTEM_PROMPT)
    results = llm_map(groups, config, MockTransport)
    run_to_memory(results, "registry_streaming_llm", output_mode="complete")
    return spark.table("registry_streaming_llm")
