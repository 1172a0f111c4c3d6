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
