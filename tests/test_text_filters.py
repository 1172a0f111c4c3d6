"""Round-4 text-filter stack: Gopher rules, char entropy, CCNet
perplexity buckets — behavioral contracts from the papers, each
cross-checked against an independent pure-Python reference on a
constructed corpus (value parity vs DuckDB is the registry oracle's
job; these pin semantics)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from openrouter_batch_processor_spark.operators.textanalysis import (
    GOPHER_STOPWORDS,
    ccnet_buckets,
    char_entropy,
    gopher_rules,
)


def _py_gopher(text: str) -> dict:
    toks = text.split()
    n = len(toks)
    norm = " ".join(toks)
    sum_chars = sum(len(t) for t in toks)
    mean_len = sum_chars / n
    bigrams = Counter(
        toks[i] + " " + toks[i + 1] for i in range(n - 1)
    )
    top_mass = max((c * len(bg) for bg, c in bigrams.items()), default=0)
    return {
        "rule_word_count": 15 <= n <= 90,
        "rule_mean_word_len": 3 <= mean_len <= 10,
        "rule_alpha_words": sum(1 for t in toks if any(c.isalpha() for c in t)) / n
        >= 0.8,
        "rule_stopwords": len({t for t in toks if t in GOPHER_STOPWORDS}) >= 2,
        "rule_repetition": top_mass / len(norm) <= 0.2,
    }


def _py_entropy(text: str) -> float:
    n = len(text)
    counts = Counter(text)
    # same decomposition as the operator: log2(n) - sum c*log2(c) / n
    mass = sum(round(c * math.log2(c), 6) for c in sorted(counts.values()))
    return math.log2(n) - mass / n


CORPUS = [
    # passes everything: 20 varied words incl. >=2 gopher stopwords
    (1, "the quick brown fox jumps over a lazy dog with style and "
        "grace of motion that nobody can ever have"),
    # too short -> word-count rule fails
    (2, "the tiny doc with of"),
    # numeric words -> alpha-word rule fails (12 of 20 words numeric)
    (3, "11 22 33 44 55 66 77 88 99 00 12 34 the cat and dog have "
        "fun with play"),
    # heavy bigram repetition -> repetition rule fails
    (4, "spam ham spam ham spam ham spam ham spam ham spam ham spam "
        "ham spam ham the end of it"),
    # no gopher stopwords -> stopword rule fails
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "mu nu xi omicron pi rho"),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t, "en", "src_a" if i % 2 else "src_b") for i, t in CORPUS]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


class TestGopherRules:
    def test_matches_pure_python_reference(self, docs):
        got = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
        for doc_id, text in CORPUS:
            want = _py_gopher(text)
            for rule, expected in want.items():
                assert got[doc_id][rule] == expected, (doc_id, rule)
            assert got[doc_id]["gopher_pass"] == all(want.values())

    def test_designed_failures_hit_the_intended_rule(self, docs):
        got = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
        assert got[1]["gopher_pass"]
        assert not got[2]["rule_word_count"]
        assert not got[3]["rule_alpha_words"]
        assert not got[4]["rule_repetition"]
        assert not got[5]["rule_stopwords"]


class TestCharEntropy:
    def test_matches_pure_python_reference(self, docs):
        got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
        for doc_id, text in CORPUS:
            norm = " ".join(text.split())
            assert got[doc_id]["n_chars_norm"] == len(norm)
            assert got[doc_id]["n_distinct_chars"] == len(set(norm))
            assert got[doc_id]["char_entropy_bits"] == pytest.approx(
                _py_entropy(norm), abs=2e-6
            )

    def test_uniform_text_has_zero_entropy(self, spark):
        one = spark.createDataFrame(
            [(1, "aaaaaaaa")], "doc_id long, text string"
        )
        row = char_entropy(one).collect()[0]
        assert row["char_entropy_bits"] == 0.0
        assert row["n_distinct_chars"] == 1


class TestCcnetBuckets:
    def test_terciles_partition_each_source(self, spark):
        # 9 docs in one source -> 3 per bucket; repetitive docs score
        # lower perplexity than varied ones under the corpus-fit LM
        rows = [
            (i, " ".join(f"w{j % (i + 2)}" for j in range(20)), "en", "s")
            for i in range(9)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        got = {r["bucket"]: r for r in ccnet_buckets(docs).collect()}
        assert set(got) == {"head", "middle", "tail"}
        assert all(r["n_docs"] == 3 for r in got.values())
        # head holds the lowest-nll (most predictable) docs
        assert got["head"]["max_nll"] <= got["middle"]["min_nll"]
        assert got["middle"]["max_nll"] <= got["tail"]["min_nll"]
        for r in got.values():
            assert r["min_nll"] <= r["mean_nll"] <= r["max_nll"]


class TestFinewebGate:
    def test_counts_consistent_and_intersection_bounded(self, spark):
        from openrouter_batch_processor_spark.session import load_table
        from openrouter_batch_processor_spark.operators.curation import fineweb_gate

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = fineweb_gate(docs, entropy_min=4.0).collect()
        assert rows
        total = sum(r["n_docs"] for r in rows)
        assert total == docs.count()
        for r in rows:
            assert 0 <= r["n_kept"] <= min(r["n_gopher"], r["n_entropy"], r["n_ppl"])
            assert r["kept_frac"] == (r["n_kept"] * 10000000 // r["n_docs"]) / 1e7
            # the ccnet gate keeps at most 2/3 (+1 for ntile remainder)
            assert r["n_ppl"] <= (2 * r["n_docs"]) // 3 + 2
