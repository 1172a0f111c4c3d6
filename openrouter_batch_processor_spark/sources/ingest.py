"""Input sources (reference ops S1-S9): directory scans, ZIP ingestion,
JSON manifests — each expressed as a Spark source, never a driver loop.

Reference behavior being re-expressed (file:line into /root/reference):
- S1/S2: os.walk inventory, POSIX-normalized + sorted (worker.py:15-21,
  52-67; app.py:97-105)
- S3/S4: whole-file text read / image bytes -> base64 data-URL
  (worker.py:77-94)
- S5/S6: zip extraction & member scan (app.py:565-570, 121-137)
- S7: registry JSON, error -> empty default (app.py:148-169)
- S8: per-job meta.json with swallowed errors (app.py:919-926)
- S9: non-recursive listings with stat metadata (app.py:493-563)

Scale notes:
- binaryFile is a real DataSource: predicate pushdown on path/length,
  partitioned scan, no driver-side os.walk. 10M files = 10M rows.
- ZIP ingest reads archives as binary rows, then explodes members with
  mapInPandas (Arrow-batched). One task per archive slice; members of a
  100k-file zip stream through without materializing on the driver.
  Python's zipfile releases the GIL during decompression, so local[N]
  genuinely parallelizes across archives.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openrouter_batch_processor_spark.functions.paths import (
    file_extension,
    normalize_path,
)

TEXT_EXTENSIONS = (".txt", ".md")  # worker.py:9
IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".tif", ".tiff")  # worker.py:10

# worker.py:86-87 — mimetypes.guess_type with image/png fallback
MIME_BY_EXT = {
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".tif": "image/tiff",
    ".tiff": "image/tiff",
}


def scan_files(spark: SparkSession, root: str, recursive: bool = True) -> DataFrame:
    """S1: binaryFile scan -> (path, rel_path, length, content, mtime).

    rel_path is normalized (F1) and relative to ``root``; ordering is
    NOT implied — callers that need the reference's deterministic order
    add .orderBy("rel_path") (Spark gives no implicit order, SURVEY §4).
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(root)
    )
    # Strip the root prefix by LENGTH, not regex — a root containing
    # regex metacharacters ('+', '(', ...) must not change semantics.
    root_norm = root.rstrip("/") + "/"
    no_scheme = F.regexp_replace(F.col("path"), r"^file:", "")
    rel = F.when(
        F.substring(no_scheme, 1, len(root_norm)) == root_norm,
        F.expr(f"substring(regexp_replace(path, '^file:', ''), {len(root_norm) + 1})"),
    ).otherwise(no_scheme)
    return df.select(
        F.col("path"),
        normalize_path(rel).alias("rel_path"),
        F.col("length"),
        F.col("content"),
        F.col("modificationTime").alias("mtime"),
    )


def file_inventory(files: DataFrame) -> DataFrame:
    """S2: the reference's input.csv shape — file_name, full_path
    ('input/' + rel), file_type (ext sans dot or 'unknown'), file_size.
    Sorted by full_path (worker.py:66)."""
    ext = file_extension(F.col("rel_path"))
    return (
        files.select(
            F.element_at(F.split(F.col("rel_path"), "/"), -1).alias("file_name"),
            F.concat(F.lit("input/"), F.col("rel_path")).alias("full_path"),
            F.when(ext == "unknown", ext)
            .otherwise(F.regexp_replace(ext, r"^\.", ""))
            .alias("file_type"),
            F.col("length").alias("file_size"),
        )
        .orderBy("full_path")
    )


def decode_text_files(files: DataFrame) -> DataFrame:
    """S3: UTF-8 decode of text-extension members; adds `text`."""
    ext = file_extension(F.col("rel_path"))
    return files.filter(ext.isin(*TEXT_EXTENSIONS)).withColumn(
        "text", F.decode(F.col("content"), "UTF-8")
    )


def image_data_urls(files: DataFrame) -> DataFrame:
    """S4: image members -> base64 data-URL payload column (F14)."""
    ext = file_extension(F.col("rel_path"))
    mime = F.lit(None).cast("string")
    for e, m in reversed(list(MIME_BY_EXT.items())):
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    from openrouter_batch_processor_spark.functions.hashing import data_url

    return files.filter(ext.isin(*IMAGE_EXTENSIONS)).select(
        "rel_path",
        mime.alias("mime"),
        data_url(F.col("content"), mime).alias("data_url"),
    )


ZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("zip_path", T.StringType()),
        T.StructField("rel_path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def zip_members(spark: SparkSession, zip_glob: str) -> DataFrame:
    """S5/S6: archives -> one row per member, fully distributed.

    binaryFile scan of the archives themselves, then mapInPandas opens
    each archive from its in-memory bytes (zipfile over BytesIO — no
    extraction to disk, matching the member-scan path app.py:121-137).
    Directory entries are skipped; member paths are normalized (F1).
    """
    archives = spark.read.format("binaryFile").load(zip_glob)

    def explode_members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                with zipfile.ZipFile(io.BytesIO(rec.content)) as zf:
                    for info in sorted(zf.infolist(), key=lambda i: i.filename):
                        if info.is_dir():
                            continue
                        name = info.filename.replace("\\", "/").removeprefix("./")
                        out.append(
                            (rec.path, name, info.file_size, zf.read(info))
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in ZIP_MEMBER_SCHEMA.fields]
            )

    return archives.select("path", "content").mapInPandas(
        explode_members, schema=ZIP_MEMBER_SCHEMA
    )


REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField(
            "entries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("zip_name", T.StringType()),
                        T.StructField("zip_sha256", T.StringType()),
                        T.StructField("content_sha256", T.StringType()),
                        T.StructField("size_bytes", T.LongType()),
                        T.StructField("created_at", T.StringType()),
                        T.StructField("source", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def load_ingest_registry(spark: SparkSession, path: str) -> DataFrame:
    """S7: the D8 zip registry as a DataFrame of entries.

    Any read/shape error yields the empty default {version:1, entries:[]}
    (app.py:148-169) — here: an empty DataFrame with the entry schema.
    multiLine: the reference writes the registry pretty-printed
    (app.py:176, indent=2) — one JSON document per file, not JSONL —
    and multiLine parses both that and the compact single-line form.
    """
    entry_schema = REGISTRY_SCHEMA["entries"].dataType.elementType
    try:
        df = (
            spark.read.schema(REGISTRY_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("multiLine", "true")
            .json(path)
        )
        entries = df.select(F.explode(F.col("entries")).alias("e")).select("e.*")
        # Force schema check early; corrupt files surface here.
        entries.schema
        return entries
    except Exception:
        return spark.createDataFrame([], entry_schema)


JOB_META_SCHEMA = T.StructType(
    [
        T.StructField("api_key_last8", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("system_prompt", T.StringType()),
        T.StructField("reasoning_mode", T.StringType()),
        T.StructField("submitted_at", T.StringType()),
        T.StructField("completed_at", T.StringType()),
        T.StructField("elapsed_time", T.StringType()),
        T.StructField("group_by_subfolder", T.BooleanType()),
        T.StructField("separate_outputs", T.BooleanType()),
        T.StructField("output_formats", T.ArrayType(T.StringType())),
        T.StructField("input_source", T.StringType()),
        T.StructField("source_route", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("total_files", T.LongType()),
        T.StructField("processed_files", T.LongType()),
    ]
)


def load_job_metas(spark: SparkSession, jobs_glob: str) -> DataFrame:
    """S8: every job's meta.json + its job_id from the file path.

    PERMISSIVE mode mirrors the reference's swallow-errors-per-job
    behavior (app.py:919-926): malformed metas become null-field rows,
    never a failed scan.
    """
    df = (
        spark.read.schema(JOB_META_SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(jobs_glob)
        .withColumn("_file", F.input_file_name())
    )
    job_id = F.regexp_extract(F.col("_file"), r"([^/]+)/meta\.json$", 1)
    return df.withColumn("job_id", job_id).drop("_file")


def list_zips(spark: SparkSession, dir_path: str) -> DataFrame:
    """S9/P2: non-recursive *.zip listing with size + mtime, newest
    first (app.py:493-518)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .option("recursiveFileLookup", "false")
        .load(dir_path)
    )
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return (
        df.select(
            name.alias("zip_name"),
            F.col("length").alias("size_bytes"),
            F.col("modificationTime").alias("mtime"),
        )
        .filter(F.lower(F.col("zip_name")).endswith(".zip"))
        .orderBy(F.desc("mtime"))
    )
