"""Model-based validation of the engine-portable hash arithmetic:
the Column implementations must equal independent pure-Python models
on arbitrary text (the same contract the DuckDB oracle relies on)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.hashing import (
    ROLLING_BASE,
    ROLLING_MOD,
    rolling_hash,
)
from openrouter_batch_processor_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    SHINGLE_N,
    minhash_signatures,
)

# printable-ish text incl. unicode + odd whitespace
TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=120,
)


def _norm(text: str) -> str:
    """Model of normalize_text with the ENGINES' regex semantics: Java
    and RE2 '\\s' are ASCII-only ([ \\t\\n\\x0b\\f\\r]) while Python's
    matches Unicode whitespace (NEL, NBSP...) — the model must use the
    ASCII class or it diverges on exotic whitespace; likewise trim()
    strips spaces, not Unicode whitespace."""
    import re

    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip(" ")


def _tok_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % ROLLING_MOD


def model_rolling_hash(text: str) -> int:
    acc = 0
    for tok in _norm(text).split(" "):
        acc = (acc * ROLLING_BASE + _tok_hash(tok)) % ROLLING_MOD
    return acc


def model_minhash(text: str) -> tuple | None:
    toks = _norm(text).split(" ")
    if _norm(text) == "" or len(toks) < SHINGLE_N:
        return None
    shingles = [" ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)]
    hs = [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in shingles]
    return tuple(
        min((a * h + b) % 1_000_000_007 for h in hs)
        for a, b in zip(MINHASH_A, MINHASH_B)
    )


class TestHashModels:
    @settings(max_examples=12, deadline=None)
    @given(st.lists(TEXTS, min_size=1, max_size=8))
    def test_rolling_hash_matches_model(self, spark, texts):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
        got = {
            r["i"]: r["h"]
            for r in df.select("i", rolling_hash(F.col("t")).alias("h")).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == model_rolling_hash(t), repr(t)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(TEXTS, min_size=1, max_size=6))
    def test_minhash_matches_model(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: tuple(r[f"mh{k}"] for k in range(8))
            for r in minhash_signatures(df).collect()
        }
        for i, t in enumerate(texts):
            expected = model_minhash(t)
            if expected is None:
                assert i not in got, repr(t)
            else:
                assert got[i] == expected, repr(t)
