"""Hashing / fingerprinting / encoding (reference ops F4, F5, F14, F15).

F4 (sha256 of bytes) and the data-URL encoding (F14) are single built-in
calls — `sha2` and `base64` run JVM-side. F5 (order-sensitive hash of a
*file set*) is the dataset-fingerprint operator; see operators/grouping
for the aggregate version. Here we add the per-document fingerprints the
training-pipeline extensions use (normalized-md5 + polynomial rolling
hash), built so the exact same arithmetic is expressible in ANSI SQL for
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus / base chosen so acc*BASE + token_hash stays far below 2^63:
# acc < MOD (~1e9), BASE=131 -> max ~1.4e11. No overflow on either engine.
ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 131


def content_sha256(content: Column) -> Column:
    """F4: hex sha256 of a binary column (binaryFile `content`)."""
    return F.sha2(content, 256)


def data_url(content: Column, mime: Column) -> Column:
    """F14: 'data:<mime>;base64,<b64>' multimodal payload encoding.

    Spark's base64() emits RFC-2045 chunked output (a CRLF every 76
    chars); Python's b64encode (worker.py:90) and data-URLs use the
    unchunked form — strip the line breaks for payload parity."""
    b64 = F.regexp_replace(F.base64(content), "[\\r\\n]", "")
    return F.concat(F.lit("data:"), mime, F.lit(";base64,"), b64)


def redact_api_key(api_key: Column) -> Column:
    """F15: keep only the last 8 chars (api_key_last8)."""
    return F.substring(api_key, -8, 8)


def normalize_text(text: Column) -> Column:
    """Canonicalization used by fingerprints: lowercase, collapse
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_fingerprint(text: Column) -> Column:
    """md5 fingerprint of the normalized text (exact-dedup key)."""
    return F.md5(normalize_text(text))


def _token_hash(tok: Column) -> Column:
    """Portable small-int hash of a token: first 8 hex chars of md5.

    `conv(hex,16,10)` on Spark == ('0x'||hex)::bigint arithmetic on
    DuckDB, so the oracle can reproduce it bit-for-bit.
    """
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % ROLLING_MOD


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over whitespace tokens of normalized text.

    acc := (acc * 131 + h(token)) mod 1e9+7, folded left-to-right with
    F.aggregate — order-sensitive (a permutation-detecting fingerprint,
    unlike the bag-of-words md5). Pure Column expression; the DuckDB
    oracle uses list_reduce with identical arithmetic.
    """
    toks = F.split(normalize_text(text), " ")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, tok: (acc * ROLLING_BASE + _token_hash(tok)) % ROLLING_MOD,
    )
