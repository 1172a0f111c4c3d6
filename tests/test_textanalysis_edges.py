"""Edge cases for text analysis + dedup family: empty/whitespace/short
docs must produce well-defined rows, never NULL explosions or errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.dedup import (
    doc_shingles,
    exact_duplicates,
    minhash_signatures,
    simhash,
)
from openrouter_batch_processor_spark.operators.textanalysis import (
    token_stats,
)

EDGE_DOCS = [
    (1, ""),  # empty
    (2, "   \t\n  "),  # whitespace only
    (3, "one"),  # below shingle width
    (4, "one two"),  # still below
    (5, "one two three"),  # exactly one shingle
    (6, "Hello,   WORLD!  123"),  # punctuation + digits + case
    (7, "dup dup dup dup"),  # repetition
    (8, "dup dup dup dup"),  # exact duplicate of 7
]


@pytest.fixture(scope="module")
def edocs(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")


class TestTokenStats:
    def test_counts(self, spark, edocs):
        rows = {r["doc_id"]: r for r in token_stats(edocs).collect()}
        assert rows[1]["n_ws_tokens"] == 0
        assert rows[2]["n_ws_tokens"] == 0
        assert rows[3]["n_ws_tokens"] == 1
        assert rows[6]["n_ws_tokens"] == 3
        assert rows[6]["n_re_tokens"] == 5  # hello , world ! 123
        assert all(r["n_ws_tokens"] is not None for r in rows.values())


class TestShinglesEdges:
    def test_short_docs_empty_arrays(self, spark, edocs):
        rows = {r["doc_id"]: r["sh"] for r in doc_shingles(edocs).collect()}
        assert rows[1] == [] and rows[2] == [] and rows[3] == [] and rows[4] == []
        assert rows[5] == ["one two three"]
        assert rows[7] == ["dup dup dup", "dup dup dup"]

    def test_minhash_skips_short_docs(self, spark, edocs):
        ids = {r["doc_id"] for r in minhash_signatures(edocs).collect()}
        assert ids == {5, 6, 7, 8}  # <3-token docs have no signature

    def test_identical_docs_identical_signatures(self, spark, edocs):
        rows = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
                for r in minhash_signatures(edocs).collect()}
        assert rows[7] == rows[8]


class TestSimhashEdges:
    def test_empty_docs_dropped_others_defined(self, spark, edocs):
        rows = {r["doc_id"]: r["simhash"] for r in simhash(edocs).collect()}
        # empty/ws-only docs have no tokens -> no row (filter tok != '')
        assert 1 not in rows and 2 not in rows
        assert rows[7] == rows[8]
        assert all(v is not None and v >= 0 for v in rows.values())


class TestExactDupEdges:
    def test_duplicate_pair_found(self, spark, edocs):
        dups = exact_duplicates(edocs).collect()
        assert len(dups) == 2  # (7,8) and the empty/ws pair (1,2)
        by_canon = {r["canonical_id"]: r["dup_count"] for r in dups}
        assert by_canon == {7: 2, 1: 2}
