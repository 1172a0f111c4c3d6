"""Path / filename expressions (reference ops F1, F2, F6, F7).

Capability parity with /root/reference: path normalization
(worker.py:12-13), extension extraction (worker.py:58,63), storage-name
synthesis (app.py:205-225), output filename derivation
(worker.py:178-184) — all as pure Column expressions so they fuse into
whole-stage codegen instead of running per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EXT_RE = r"(\.[^./\\]+)$"


def normalize_path(path: Column) -> Column:
    """F1: backslashes -> '/', strip leading './'."""
    p = F.regexp_replace(path, r"\\", "/")
    return F.regexp_replace(p, r"^\./", "")


def file_extension(path: Column) -> Column:
    """F2: lowercased extension including the dot; missing -> 'unknown'."""
    ext = F.lower(F.regexp_extract(path, _EXT_RE, 1))
    return F.when(ext == "", F.lit("unknown")).otherwise(ext)


def output_filename(group_id: Column, is_folder: Column) -> Column:
    """F7: folder group -> '<base>_folder_output.txt', file -> '<stem>.txt'."""
    base = F.regexp_replace(group_id, r"/$", "")
    stem = F.regexp_replace(group_id, r"\.[^./]+$", "")
    return F.when(
        is_folder, F.concat(base, F.lit("_folder_output.txt"))
    ).otherwise(F.concat(stem, F.lit(".txt")))


def storage_name(filename: Column, content_hash: Column, max_stem: int = 80) -> Column:
    """F6: sanitized stem truncated to ``max_stem`` + '_<hash12>.zip'.

    The reference's on-disk collision-counter loop is a driver-side
    commit concern; the deterministic part (sanitize, truncate, hash
    suffix) is data-plane and lives here.
    """
    stem = F.regexp_replace(filename, r"\.zip$", "")
    stem = F.regexp_replace(stem, r"[^A-Za-z0-9_.-]+", "_")
    stem = F.substring(stem, 1, max_stem)
    return F.concat(stem, F.lit("_"), F.substring(content_hash, 1, 12), F.lit(".zip"))


def storage_names_with_counters(
    df,
    name_col: str = "filename",
    hash_col: str = "content_hash",
    order_col: str = "doc_id",
    max_stem: int = 80,
):
    """F6's on-disk collision-counter loop (reference app.py:205-226)
    as a DATA-PLANE operator: within a batch of uploads, the first
    occurrence of a candidate '<stem>_<hash12>.zip' keeps it, the k-th
    (k >= 2) gets '<stem>_<hash12>_<k>.zip' — exactly the reference's
    counter, which starts at 2 for the second file. One window over the
    candidate name ordered by arrival (``order_col``); no driver loop,
    no filesystem probe. (The residual commit-time concern — names
    already on disk from PREVIOUS batches — is the sink's os.path seam,
    documented at storage_name; this operator closes the in-batch
    half.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = F.regexp_replace(
        storage_name(F.col(name_col), F.col(hash_col), max_stem), r"\.zip$", ""
    )
    w = Window.partitionBy("candidate").orderBy(order_col)
    staged = df.select(
        F.col(order_col), base.alias("_base"), F.concat(base, F.lit(".zip")).alias("candidate")
    )
    rn = F.row_number().over(w)
    return staged.withColumn("upload_seq", rn.cast("long")).select(
        order_col,
        "candidate",
        F.when(F.col("upload_seq") == 1, F.col("candidate"))
        .otherwise(
            F.concat(F.col("_base"), F.lit("_"), F.col("upload_seq"), F.lit(".zip"))
        )
        .alias("storage_zip_name"),
        "upload_seq",
    )
