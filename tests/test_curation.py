"""Unit tests for corpus-curation operators (boilerplate detection,
mixture weighting, quality sweep, keep-best-of-cluster) — edge cases the
registry oracles don't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.curation import (
    boilerplate_ngrams,
    quality_threshold_sweep,
    remove_duplicate_spans,
    source_mixture_weights,
)


class TestBoilerplate:
    def test_repeated_template_flagged(self, spark):
        template = "all rights reserved contact us for details"
        rows = [(i, f"unique words {i} appear here only once {template}") for i in range(25)]
        rows += [(100 + i, f"totally fresh material number{i} alpha{i} beta{i}") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in boilerplate_ngrams(docs, min_df=20).collect()}
        # template shingles occur in 25 >= 20 docs -> flagged
        assert out[0]["n_boiler"] > 0
        assert 0 < out[0]["boiler_ratio"] <= 1.0
        # fresh docs share nothing -> zero boilerplate
        assert out[100]["n_boiler"] == 0
        assert out[100]["boiler_ratio"] == 0.0

    def test_short_docs_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "too short"), (2, "this one has enough tokens to shingle")],
            "doc_id long, text string",
        )
        ids = {r["doc_id"] for r in boilerplate_ngrams(docs, min_df=2).collect()}
        assert ids == {2}  # <3 tokens -> no shingles -> no row


class TestMixtureWeights:
    def test_weights_sum_to_one_and_upweight_small(self, spark):
        docs = spark.createDataFrame(
            [(i, "a" if i < 90 else "b") for i in range(100)],
            "doc_id long, source string",
        )
        out = {r["source"]: r for r in source_mixture_weights(docs, 0.5).collect()}
        assert abs(out["a"]["weight"] + out["b"]["weight"] - 1.0) < 1e-6
        # T=0.5 up-weights the small source relative to its natural share
        assert out["b"]["weight"] > 0.10
        assert out["b"]["sample_rate"] > 1.0 > out["a"]["sample_rate"]

    def test_temperature_one_is_natural(self, spark):
        docs = spark.createDataFrame(
            [(i, "a" if i < 75 else "b") for i in range(100)],
            "doc_id long, source string",
        )
        out = {r["source"]: r for r in source_mixture_weights(docs, 1.0).collect()}
        assert abs(out["a"]["weight"] - 0.75) < 1e-6
        assert abs(out["a"]["sample_rate"] - 1.0) < 1e-6


class TestQualitySweep:
    def test_monotone_and_complete(self, spark):
        docs = spark.createDataFrame(
            [(i, f"the value of item {i} is a number and it is fine") for i in range(20)],
            "doc_id long, text string",
        )
        rows = quality_threshold_sweep(docs).orderBy("threshold").collect()
        assert [r["threshold"] for r in rows] == [x / 10 for x in range(10)]
        # survivors monotonically non-increasing in threshold
        surv = [r["n_docs_surviving"] for r in rows]
        assert surv == sorted(surv, reverse=True)
        assert surv[0] == 20  # threshold 0.0 keeps everything


class TestCanonicalByQuality:
    def test_best_member_survives(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            canonical_by_quality,
        )

        # docs 1..3: near-identical cluster; doc 2 is "cleanest" (no punct)
        base = "the quick brown fox jumps over the lazy dog again and again today"
        docs = spark.createDataFrame(
            [
                (1, base + " !!! ??? ;;; ###"),
                (2, base),
                (3, base + " ,,, ... !!!"),
                (9, "entirely different content nothing shared with others here at all"),
            ],
            "doc_id long, text string",
        )
        quality = spark.createDataFrame(
            [(1, 0.4), (2, 0.9), (3, 0.6), (9, 0.99)],
            "doc_id long, quality_score double",
        )
        rows = canonical_by_quality(docs, quality).collect()
        assert len(rows) == 1  # one cluster; doc 9 is a singleton (excluded)
        r = rows[0]
        assert r["canonical_doc_id"] == 2
        assert r["cluster_size"] == 3
        assert r["n_removed"] == 2


class TestDupWindows:
    def test_copied_doc_fully_duplicated(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            duplicated_window_fraction,
        )

        passage = "one two three four five six seven eight nine ten eleven twelve"
        docs = spark.createDataFrame(
            [
                (1, passage),
                (2, passage),  # exact copy: every window duplicated
                (3, "totally different words that nobody else repeats anywhere at all today"),
                (4, "too short"),  # < 8 tokens: no windows, no row
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in duplicated_window_fraction(docs, 8).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["dup_fraction"] == 1.0 == out[2]["dup_fraction"]
        assert out[3]["dup_fraction"] == 0.0
        assert out[1]["n_windows"] == 12 - 8 + 1


class TestRemoveDuplicateSpans:
    def test_planted_duplicate_removed_keep_first(self, spark):
        """Two docs share a planted 10-token passage; the later doc loses
        exactly the passage's covered windows, the first keeps it."""
        passage = "the quick brown fox jumps over the lazy sleeping dog"  # 10 toks
        a = f"alpha one two three four five six seven {passage}"
        b = f"{passage} omega nine eight seven six five four three"
        c = "entirely different words with no overlap whatsoever here at all"
        docs = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
        # doc 1 holds the global first occurrence of every shared window
        assert out[1]["n_removed"] == 0
        assert out[1]["cleaned_text"] == a.lower()
        # doc 2: the shared windows are w-token runs starting at 0..2
        # (10-token passage, W=8 -> 3 windows) covering tokens 0..9
        assert out[2]["n_removed"] == 10
        assert out[2]["n_spans_removed"] == 1
        assert out[2]["cleaned_text"] == "omega nine eight seven six five four three"
        # untouched doc: full text survives, zero spans
        assert out[3]["n_removed"] == 0
        assert out[3]["removed_fraction"] == 0.0

    def test_within_doc_repeat_counts_as_duplicate(self, spark):
        """Lee-et-al contract: a window repeated WITHIN one doc is a
        duplicate too — the second occurrence is removed."""
        eight = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [(1, f"{eight} filler alpha beta gamma delta {eight}")],
            "doc_id long, text string",
        )
        row = remove_duplicate_spans(docs).collect()[0]
        assert row["n_removed"] == 8
        assert row["n_spans_removed"] == 1
        assert row["cleaned_text"] == f"{eight} filler alpha beta gamma delta"

    def test_all_unique_corpus_untouched(self, spark):
        docs = spark.createDataFrame(
            [(i, f"document number{i} speaks about topic{i} alone entirely "
                 f"word{i}a word{i}b word{i}c word{i}d word{i}e word{i}f")
             for i in range(4)],
            "doc_id long, text string",
        )
        out = remove_duplicate_spans(docs).collect()
        assert all(r["n_removed"] == 0 for r in out)
        assert all(r["n_spans_removed"] == 0 for r in out)

    def test_short_docs_have_no_windows(self, spark):
        docs = spark.createDataFrame(
            [(1, "same short words"), (2, "same short words")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
        # identical but < 8 tokens: window-level dedup cannot see them
        assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
        assert out[2]["cleaned_text"] == "same short words"


class TestDupSpanDiscovery:
    """Front half of ExactSubstr (VERDICT r04 item 5): maximal duplicated
    substrings via seed-gram rank/adjacency, feeding remove_duplicate_spans."""

    def test_planted_passage_found_maximal(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            dup_span_discovery,
        )

        passage = (
            "the quick brown fox jumps over the lazy sleeping dog "
            "while winter rain falls softly"  # 15 tokens
        )
        a = f"alpha one two three four five six seven {passage}"
        b = f"{passage} omega nine eight grape pear plum peach apple"
        c = "entirely different words with no overlap whatsoever here at all"
        docs = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, text string"
        )
        spans = dup_span_discovery(docs, min_tokens=12, seed_tokens=8).collect()
        by_doc = {}
        for r in spans:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # both occurrences reported (discovery is occurrence-level; the
        # removal policy, not discovery, decides which copy to keep)
        assert set(by_doc) == {1, 2}
        (s1,), (s2,) = by_doc[1], by_doc[2]
        # maximal extent: exactly the 15-token passage, nothing more
        assert s1["span_len"] == 15 and s2["span_len"] == 15
        assert s1["span_start"] == 8 and s2["span_start"] == 0
        # identical content -> same hash, occurrence count 2
        assert s1["span_hash"] == s2["span_hash"]
        assert s1["n_span_occ"] == 2

    def test_min_tokens_gates_short_duplicates(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            dup_span_discovery,
        )

        eight = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [(1, f"{eight} unique ending alpha beta"),
             (2, f"{eight} other closing words gamma")],
            "doc_id long, text string",
        )
        # the shared run is exactly 8 tokens: below min_tokens=12 -> gated
        assert dup_span_discovery(docs, min_tokens=12, seed_tokens=8).count() == 0
        # at min_tokens=8 both occurrences surface
        spans = dup_span_discovery(docs, min_tokens=8, seed_tokens=8).collect()
        assert sorted((r["doc_id"], r["span_len"]) for r in spans) == [(1, 8), (2, 8)]

    def test_discovery_feeds_removal(self, spark):
        """Consistency with the back half: the token positions covered by
        discovered spans (no length gate) are a superset of what
        remove_duplicate_spans deletes, and the per-doc difference is
        exactly the kept global-first occurrences — so n_removed is
        bounded by discovery coverage."""
        from openrouter_batch_processor_spark.operators.curation import (
            dup_span_discovery,
        )

        passage = "the quick brown fox jumps over the lazy sleeping dog"
        rows = [
            (1, f"alpha one two three four five six seven {passage}"),
            (2, f"{passage} omega nine eight grape pear plum peach apple"),
            (3, f"middle filler words here then {passage} trailing bits"),
            (4, "entirely different words with no overlap whatsoever here at all"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        spans = dup_span_discovery(docs, min_tokens=8, seed_tokens=8).collect()
        covered = {
            (r["doc_id"], j)
            for r in spans
            for j in range(r["span_start"], r["span_start"] + r["span_len"])
        }
        removed = {
            r["doc_id"]: r["n_removed"]
            for r in remove_duplicate_spans(docs, window_tokens=8).collect()
        }
        per_doc_cov = {}
        for d, _ in covered:
            per_doc_cov[d] = per_doc_cov.get(d, 0) + 1
        # every removed token lies inside a discovered span
        for d, n in removed.items():
            assert n <= per_doc_cov.get(d, 0)
        # the first occurrence's doc keeps its copy but discovery reports it
        assert per_doc_cov[1] == 10 and removed[1] == 0
        assert removed[2] == 10 and removed[3] == 10


def _py_remove_spans(docs: dict[int, str], w: int = 8):
    """Independent pure-Python reference for remove_duplicate_spans'
    spec (third implementation besides Spark and the DuckDB oracle)."""
    import re

    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for d, t in docs.items()
    }
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - w + 1):
            occ.setdefault(tuple(ts[i : i + w]), []).append((d, i))
    covered: dict[int, set[int]] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) < 2:
            continue
        for d, i in sorted(places)[1:]:  # keep global first occurrence
            covered[d].update(range(i, i + w))
    out = {}
    for d, ts in toks.items():
        cov = covered[d]
        kept = [t for j, t in enumerate(ts) if j not in cov]
        spans = sum(1 for j in cov if j - 1 not in cov)
        out[d] = (len(ts), len(cov), spans, " ".join(kept))
    return out


def test_remove_spans_matches_python_reference(spark):
    """Randomized corpora with planted repeats: Spark must agree with
    the pure-Python spec on every field (seeded, deterministic)."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> many collisions
    for trial in range(5):
        docs = {}
        shared = " ".join(rng.choices(vocab, k=rng.randint(8, 14)))
        for d in range(6):
            body = " ".join(rng.choices(vocab, k=rng.randint(0, 30)))
            parts = [body]
            if rng.random() < 0.6:
                parts.insert(rng.randint(0, 1), shared)
            docs[d] = " ".join(p for p in parts if p) or "x"
        expected = _py_remove_spans(docs)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_removed"],
                r["n_spans_removed"],
                r["cleaned_text"],
            )
            for r in remove_duplicate_spans(df).collect()
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"


class TestMaximalDupSpans:
    """ExactSubstr-granularity maximal-span REPORT (r12, VERDICT r11
    #8): spans themselves under the hash, not just coverage."""

    def test_planted_passage_maximal_and_identical_hash(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            maximal_dup_spans,
        )

        passage = (
            "the quick brown fox jumps over the lazy sleeping dog "
            "while winter rain falls softly"  # 15 tokens
        )
        a = f"alpha one two three four five six seven {passage}"
        b = f"{passage} omega nine eight grape pear plum peach apple"
        c = "entirely different words with no overlap whatsoever here at all"
        docs = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, text string"
        )
        out = maximal_dup_spans(docs, window_tokens=8).collect()
        by_doc = {r["doc_id"]: r for r in out}
        # both occurrences surface as one maximal span each; doc 3 clean
        assert set(by_doc) == {1, 2}
        s1, s2 = by_doc[1], by_doc[2]
        # maximal extent: exactly the 15-token passage (8 seeds of 8
        # consecutive windows -> 15 tokens), nothing more
        assert s1["span_tokens"] == 15 and s2["span_tokens"] == 15
        assert s1["span_start"] == 8 and s2["span_start"] == 0
        assert s1["n_seeds"] == 8 and s2["n_seeds"] == 8
        # identical token run -> identical span_md5
        assert s1["span_md5"] == s2["span_md5"]

    def test_within_doc_repeat_counts_as_duplication(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            maximal_dup_spans,
        )

        eight = "one two three four five six seven eight"
        # the 8-gram repeats WITHIN one doc: Lee et al. count total
        # occurrences, so both copies mark spans (the crossdoc policy
        # variant would see only one distinct doc and skip it)
        docs = spark.createDataFrame(
            [(1, f"{eight} filler junk padding extra {eight}"),
             (2, "totally unrelated text with nothing shared here at all")],
            "doc_id long, text string",
        )
        out = maximal_dup_spans(docs, window_tokens=8).collect()
        assert {r["doc_id"] for r in out} == {1}
        assert len(out) == 2
        assert all(r["span_tokens"] == 8 for r in out)
        assert out[0]["span_md5"] == out[1]["span_md5"]
