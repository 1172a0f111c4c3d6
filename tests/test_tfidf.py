"""TF-IDF top-k and heavy-hitter semantics on a hand-checked corpus."""

from __future__ import annotations

import math

from openrouter_batch_processor_spark.operators.textanalysis import (
    heavy_hitters,
    term_frequencies,
    tfidf_topk,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana cherry"),
            (4, "   "),  # whitespace-only: contributes no terms but counts in n_docs
        ],
        ["doc_id", "text"],
    )


class TestTermFrequencies:
    def test_counts_and_blank_doc(self, spark):
        tf = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in term_frequencies(_corpus(spark)).collect()
        }
        assert tf[(1, "apple")] == 2
        assert tf[(3, "banana")] == 3
        assert not any(d == 4 for d, _ in tf)


class TestTfidf:
    def test_scores_match_closed_form(self, spark):
        rows = tfidf_topk(_corpus(spark), k=5).collect()
        by_key = {(r["doc_id"], r["term"]): r for r in rows}
        # n_docs=4 (blank doc included); apple df=2, banana df=2, cherry df=2
        want = round(2 * math.log(4 / 2), 6)
        assert by_key[(1, "apple")]["tfidf"] == want
        assert by_key[(1, "apple")]["rnk"] == 1  # 2*ln2 > 1*ln2
        assert by_key[(1, "banana")]["rnk"] == 2

    def test_tiebreak_is_lexicographic(self, spark):
        rows = tfidf_topk(_corpus(spark), k=5).collect()
        doc2 = sorted((r for r in rows if r["doc_id"] == 2), key=lambda r: r["rnk"])
        # identical tf=1, df=2 -> tie on tfidf, apple before cherry
        assert [r["term"] for r in doc2] == ["apple", "cherry"]

    def test_k_truncates(self, spark):
        rows = tfidf_topk(_corpus(spark), k=1).collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append(r)
        assert all(len(v) == 1 for v in per_doc.values())


class TestHeavyHitters:
    def test_totals_docfreq_and_order(self, spark):
        rows = heavy_hitters(_corpus(spark), n=10).collect()
        assert [(r["term"], r["total_count"], r["doc_freq"]) for r in rows] == [
            ("banana", 4, 2),
            ("apple", 3, 2),
            ("cherry", 2, 2),
        ]

    def test_limit(self, spark):
        assert len(heavy_hitters(_corpus(spark), n=2).collect()) == 2
