"""Winnowing fingerprints (Schleimer et al. 2003): pure-Python
reference parity, the 2/(w+1) density expectation, and the local
guarantee (any shared >= k+w-1-token substring surfaces)."""

from __future__ import annotations

import hashlib
import re

import pytest

from openrouter_batch_processor_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_stats,
)


def _norm(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _gram_hash(toks: list[str]) -> int:
    return int(hashlib.md5(" ".join(toks).encode()).hexdigest()[:8], 16)


def _reference_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W):
    toks = _norm(text)
    if len(toks) < k + w - 1:
        return set()
    hashes = [_gram_hash(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = set()
    for q in range(len(hashes) - w + 1):
        window = hashes[q : q + w]
        m = min(window)
        # robust rule: rightmost occurrence of the minimum
        pos = q + max(i for i, h in enumerate(window) if h == m)
        out.add((pos, m))
    return out


DOCS = [
    (1, "the fast cat runs over the small field and the dog sleeps near the barn"),
    (2, "a b c d e f g h i j k l m n o p q r s t"),
    (3, "one two three four five six seven"),  # exactly k+w-1 tokens
    (4, "too short here"),  # below threshold -> excluded
]


class TestWinnowFingerprints:
    def test_matches_pure_python_reference(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["doc_id"], r["pos"], r["fp"])
            for r in winnow_fingerprints(docs).collect()
        }
        expected = {
            (i, pos, h)
            for i, text in DOCS
            for (pos, h) in _reference_winnow(text)
        }
        assert got == expected
        assert not any(i == 4 for i, _p, _h in got)

    def test_density_approaches_two_over_w_plus_one(self, spark):
        # long pseudo-random doc: observed density ~ 2/(w+1) = 0.4
        words = [f"w{(i * 37) % 211}x{(i * 101) % 89}" for i in range(2000)]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        row = winnow_stats(docs).head()
        assert row["n_windows"] == 2000 - WINNOW_K - WINNOW_W + 2
        assert row["density"] == pytest.approx(2 / (WINNOW_W + 1), rel=0.15)

    def test_local_guarantee_shared_substring_shares_fingerprint(self, spark):
        # two docs sharing a (k+w-1)-token run MUST share a fingerprint
        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k+w-1
        docs = spark.createDataFrame(
            [
                (1, f"unrelated prefix words here {shared} and a suffix tail"),
                (2, f"{shared} totally different continuation text follows now"),
                (3, "no overlap with anything else at all in this one text"),
            ],
            "doc_id long, text string",
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in winnow_overlap_pairs(docs, min_shared=1).collect()
        }
        assert (1, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_hot_fingerprint_pruned_before_pairing(self, spark):
        # every doc shares the same boilerplate run; with max_df below
        # the doc count the ubiquitous fingerprints must not pair them
        boiler = "copyright footer all rights reserved by the site owner"
        docs = spark.createDataFrame(
            [(i, f"doc {i} unique words u{i} v{i} {boiler}") for i in range(6)],
            "doc_id long, text string",
        )
        pairs = winnow_overlap_pairs(docs, min_shared=1, max_df=3).collect()
        assert pairs == []


# hypothesis model check: arbitrary token streams vs the pure-Python
# reference (the same contract the DuckDB oracle relies on)
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

WORDS = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]),  # small vocab forces ties
    min_size=0,
    max_size=40,
)


class TestWinnowHypothesis:
    @settings(max_examples=20, deadline=None)
    @given(docs_toks=st.lists(WORDS, min_size=1, max_size=4))
    def test_random_docs_match_reference(self, spark, docs_toks):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id"], r["pos"], r["fp"])
            for r in winnow_fingerprints(docs).collect()
        }
        expected = {
            (i, pos, h)
            for i, text in rows
            for (pos, h) in _reference_winnow(text)
        }
        assert got == expected


class TestArrayFormulationEquivalence:
    """The streaming-safe pure-array winnowing must select EXACTLY the
    same (pos, fp) set as the batch window-function formulation — the
    contract streaming_winnow_decontaminate's oracle rests on."""

    def test_array_equals_window_formulation(self, spark):
        import pyspark.sql.functions as F

        from openrouter_batch_processor_spark.operators.dedup import (
            _WINNOW_POSCAP,
            winnow_keys_col,
        )
        from openrouter_batch_processor_spark.functions.hashing import (
            normalize_text,
        )

        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        toked = docs.select(
            "doc_id", F.split(normalize_text(F.col("text")), " ").alias("toks")
        )
        arr = (
            toked.select(
                "doc_id", F.explode(winnow_keys_col(F.col("toks"))).alias("key")
            )
            .select(
                "doc_id",
                (
                    F.lit(_WINNOW_POSCAP - 1) - F.col("key") % F.lit(_WINNOW_POSCAP)
                ).alias("pos"),
                F.expr(f"key div {_WINNOW_POSCAP}").alias("fp"),
            )
        )
        got = {(r["doc_id"], r["pos"], r["fp"]) for r in arr.collect()}
        win = {
            (r["doc_id"], r["pos"], r["fp"])
            for r in winnow_fingerprints(docs).collect()
        }
        assert got == win

    def test_hypothesis_array_equals_reference(self, spark):
        # reuse the random-docs generator against the ARRAY form
        import pyspark.sql.functions as F

        from openrouter_batch_processor_spark.operators.dedup import (
            _WINNOW_POSCAP,
            winnow_keys_col,
        )
        from openrouter_batch_processor_spark.functions.hashing import (
            normalize_text,
        )

        rows = [
            (1, "w1 w2 w1 w2 w1 w2 w1 w2 w1"),   # heavy ties
            (2, "a b c d e f g"),                 # exactly k+w-1
            (3, "short one"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        arr = (
            docs.select(
                "doc_id",
                F.split(normalize_text(F.col("text")), " ").alias("toks"),
            )
            .select(
                "doc_id", F.explode(winnow_keys_col(F.col("toks"))).alias("key")
            )
            .select(
                "doc_id",
                (
                    F.lit(_WINNOW_POSCAP - 1) - F.col("key") % F.lit(_WINNOW_POSCAP)
                ).alias("pos"),
                F.expr(f"key div {_WINNOW_POSCAP}").alias("fp"),
            )
        )
        got = {(r["doc_id"], r["pos"], r["fp"]) for r in arr.collect()}
        expected = {
            (i, pos, h) for i, text in rows for (pos, h) in _reference_winnow(text)
        }
        assert got == expected

    def test_long_form_equals_single_column_form(self, spark):
        # winnow_keys_long (the production staged-Generate form — each
        # gram hashed once, no inferred size()>0 filter) must emit
        # exactly the exploded key multiset of winnow_keys_col on
        # every doc, with short docs absent (their array is empty).
        import pyspark.sql.functions as F

        from openrouter_batch_processor_spark.operators.dedup import (
            winnow_keys_col,
            winnow_keys_long,
        )
        from openrouter_batch_processor_spark.functions.hashing import (
            normalize_text,
        )

        rows = DOCS + [
            (101, "w1 w2 w1 w2 w1 w2 w1 w2 w1"),
            (102, "a b c d e f g"),
            (103, "too short"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        toked = docs.select(
            "doc_id", F.split(normalize_text(F.col("text")), " ").alias("toks")
        )
        long_form = sorted(
            (r["doc_id"], r["key"])
            for r in winnow_keys_long(toked).collect()
        )
        one_col = sorted(
            (r["doc_id"], k)
            for r in toked.select(
                "doc_id", winnow_keys_col(F.col("toks")).alias("ks")
            ).collect()
            for k in r["ks"]
        )
        assert long_form == one_col
        assert 103 not in {d for d, _ in long_form}  # short doc dropped
