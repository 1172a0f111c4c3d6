"""Round-7 operators: C4 blocklist gate, BPE merge learning,
in-engine logistic regression, hard-negative mining.

Each test pins the operator against a hand-computed or pure-Python
reference on a corpus small enough to verify by eye — the registry
oracle covers the cross-engine contract, these cover the semantics.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def spark():
    from openrouter_batch_processor_spark.session import get_spark

    return get_spark("test_round7_ops")


class TestBlocklistFilter:
    def test_flags_and_counts(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            blocklist_filter,
        )

        docs = spark.createDataFrame(
            [
                (1, "clean text only here", "s1"),
                (2, "a dup in the middle", "s1"),
                (3, "dup dup crash Dup", "s2"),  # case-normalized
                (4, "BAD start", "s2"),
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r["doc_id"]: (
                r["n_blocked_tokens"],
                r["n_distinct_blocked"],
                r["blocked_csv"],
            )
            for r in blocklist_filter(docs).collect()
        }
        assert 1 not in got
        assert got[2] == (1, 1, "dup")
        assert got[3] == (4, 2, "crash,dup")  # 'Dup' lowercased
        assert got[4] == (1, 1, "bad")


class TestBpeMerges:
    def test_known_trajectory(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            bpe_merges,
        )

        # corpus: 'abab' x3, 'ab' x2, 'ba' x1 (as repeated tokens)
        text = " ".join(["abab"] * 3 + ["ab"] * 2 + ["ba"])
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = {
            r["merge_rank"]: (r["sym_a"], r["sym_b"], r["pair_count"])
            for r in bpe_merges(docs, rounds=2).collect()
        }
        # round 1 pairs: abab:(a,b)x2,(b,a)x1 each x3; ab:(a,b)x2; ba:(b,a)x1
        # (a,b)=3*2+2=8, (b,a)=3+1=4 -> merge (a,b)
        assert got[1] == ("a", "b", 8)
        # round 2: abab='ab ab' -> (ab,ab)x3; ab='ab'; ba='b a' -> (b,a)x1
        assert got[2] == ("ab", "ab", 3)

    def test_adjacent_occurrences_both_merge(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            bpe_merges,
        )

        # 'aaaa': round-1 pairs (a,a)x3 -> merge -> greedy left-to-right
        # gives 'aa aa' (both pairs merged), so round 2 sees (aa,aa)
        docs = spark.createDataFrame(
            [(1, "aaaa aaaa")], "doc_id long, text string"
        )
        got = {
            r["merge_rank"]: (r["sym_a"], r["sym_b"], r["pair_count"])
            for r in bpe_merges(docs, rounds=2).collect()
        }
        assert got[1] == ("a", "a", 6)
        assert got[2] == ("aa", "aa", 2)


def _py_logreg(rows: list[tuple[float, list[float]]], steps: int) -> list[float]:
    """Pure-Python mirror of quality_logreg's 9-dp-grid trajectory."""
    w = [0.0] * 4
    for _ in range(steps):
        g = [0.0] * 4  # float sum stands in for the decimal sum (few rows)
        n = float(len(rows))
        for y, x in rows:
            z = round(sum(x[j] * w[j] for j in range(4)), 9)
            p = 1.0 / (1.0 + math.exp(-z))
            for j in range(4):
                g[j] += round((p - y) * x[j], 9)
        w = [round(w[j] - 1.0 * g[j] / n, 9) for j in range(4)]
    return w


class TestQualityLogreg:
    def test_matches_python_reference(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            quality_logreg,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox", "en"),
                (2, "a b c d e f", "en"),
                (3, "uno dos tres cuatro cinco", "es"),
                (4, "ein zwei drei", "de"),
                (5, "the a the a the", "en"),
            ],
            "doc_id long, text string, lang string",
        )
        got = {
            r["feature"]: r["weight"]
            for r in quality_logreg(docs, steps=3).collect()
        }

        def feats(text: str, lang: str) -> tuple[float, list[float]]:
            toks = text.split()
            n = float(len(toks))
            stop = float(sum(1 for t in toks if t in ("a", "the")))
            sl = float(sum(len(t) for t in toks))
            return (
                1.0 if lang == "en" else 0.0,
                [1.0, n / 100.0, stop / n, sl / n / 10.0],
            )

        rows = [
            feats(t, lg)
            for t, lg in [
                ("the quick brown fox", "en"),
                ("a b c d e f", "en"),
                ("uno dos tres cuatro cinco", "es"),
                ("ein zwei drei", "de"),
                ("the a the a the", "en"),
            ]
        ]
        want = _py_logreg(rows, steps=3)
        for j in range(4):
            assert got[f"x{j}"] == pytest.approx(want[j], abs=2e-9), (
                f"x{j}: {got[f'x{j}']} vs {want[j]}"
            )

    def test_separates_on_stopword_feature(self, spark):
        # en docs are stopword-heavy here; the x2 weight must go
        # positive and the model must rank an en-like doc above a
        # non-en-like one
        from openrouter_batch_processor_spark.operators.curation import (
            quality_logreg,
        )

        docs = spark.createDataFrame(
            [(i, "the a the word", "en") for i in range(10)]
            + [(100 + i, "uno dos tres cuatro", "es") for i in range(10)],
            "doc_id long, text string, lang string",
        )
        got = {
            r["feature"]: r["weight"] for r in quality_logreg(docs).collect()
        }
        assert got["x2"] > 0.0


class TestHardNegatives:
    def test_excludes_same_label_and_ranks(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            hard_negatives,
        )

        # anchor id=7 (7 % 100 == 7), label 0; candidates labels 0/1
        rows = [
            (7, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),      # same label: excluded despite cos=1
            (2, [0.9, 0.1], 1),      # closest different-label
            (3, [0.0, 1.0], 1),
            (4, [0.5, 0.5], 1),
            (5, [1.0, 0.1], 0),      # same label: excluded
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        got = hard_negatives(emb, k=3).orderBy("rank").collect()
        assert [r["query_id"] for r in got] == [7, 7, 7]
        ids = [r["neighbor_id"] for r in got]
        assert ids[0] == 2          # hardest negative first
        assert set(ids).isdisjoint({1, 5, 7})
        sims = [r["cos_sim"] for r in got]
        assert sims == sorted(sims, reverse=True)


class TestDaviesBouldin:
    def test_two_obvious_clusters(self, spark):
        from openrouter_batch_processor_spark.operators.kmeans import (
            davies_bouldin,
        )

        # two tight, well-separated blobs -> low DB index; k=2
        rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(4)] + [
            (10 + i, [10.0 + 0.01 * i, 10.0]) for i in range(4)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = davies_bouldin(emb, k=2, iters=2).collect()
        assert len(got) == 2
        assert all(r["cluster_size"] == 4 for r in got)
        assert all(r["db_index"] < 0.1 for r in got)
        assert len({r["db_index"] for r in got}) == 1  # one corpus scalar


class TestRakeKeyphrases:
    def test_hand_computed_scores(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            rake_keyphrases,
        )

        # one doc: "deep learning the deep net" ->
        # phrases: "deep learning" (len2), "deep net" (len2)
        # freq: deep=2, learning=1, net=1; deg: deep=4, learning=2, net=2
        # wscore: deep=2, learning=2, net=2; both phrases score 4.0
        docs = spark.createDataFrame(
            [(1, "deep learning the deep net")], "doc_id long, text string"
        )
        got = {r["phrase"]: r for r in rake_keyphrases(docs, topk=10).collect()}
        assert set(got) == {"deep learning", "deep net"}
        assert got["deep learning"]["score"] == pytest.approx(4.0)
        assert got["deep net"]["score"] == pytest.approx(4.0)
        assert got["deep net"]["n_words"] == 2

    def test_cross_doc_aggregation(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            rake_keyphrases,
        )

        docs = spark.createDataFrame(
            [(1, "red fox the red fox"), (2, "red fox")],
            "doc_id long, text string",
        )
        got = {r["phrase"]: r for r in rake_keyphrases(docs, topk=10).collect()}
        assert got["red fox"]["n_occurrences"] == 3


class TestDoremiWeights:
    def test_divergent_domain_upweighted(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            doremi_weights,
        )

        # srcA matches the corpus distribution, srcB is skewed ->
        # KL(B || corpus) > KL(A || corpus) -> weight(B) > weight(A)
        rows = (
            [(i, "x y z w", "srcA") for i in range(8)]
            + [(100 + i, "x x x x", "srcB") for i in range(2)]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["source"]: r for r in doremi_weights(docs).collect()}
        assert got["srcB"]["excess_kl"] > got["srcA"]["excess_kl"] >= 0.0
        assert got["srcB"]["weight"] > got["srcA"]["weight"]
        assert sum(r["weight"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)


class TestBpeCompression:
    def test_curve_monotone_and_exact(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            bpe_compression,
        )

        docs = spark.createDataFrame(
            [(1, "abab abab ab")], "doc_id long, text string"
        )
        got = {r["round"]: r for r in bpe_compression(docs, rounds=2).collect()}
        # round 0: vocab {abab: freq2(4 chars), ab: freq1(2 chars)} ->
        # 2*4 + 1*2 = 10 symbols
        assert got[0]["total_symbols"] == 10
        # merge (a,b): abab -> 'ab ab' (2 syms), ab -> 1 sym -> 2*2+1 = 5
        assert got[1]["total_symbols"] == 5
        # merge (ab,ab): abab -> 1 sym -> 2*1+1 = 3
        assert got[2]["total_symbols"] == 3
        assert got[0]["compression_ratio"] == 1.0
        assert got[2]["compression_ratio"] == pytest.approx(10 / 3, abs=1e-6)


class TestPqTrain:
    def test_subspace_codebooks_converge(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            pq_train,
        )

        # 8-dim vectors, 2 subspaces of 4 dims; two obvious clusters
        # per subspace -> with n_codes=2, iters=2 each codeword owns
        # one blob and distortion is the tiny within-blob spread
        lo = [0.0, 0.0, 0.0, 0.0]
        hi = [10.0, 10.0, 10.0, 10.0]
        rows = []
        for i in range(6):
            eps = 0.01 * i
            # first 2 ids seed the codebooks (one from each blob)
            first = lo if i % 2 == 0 else hi
            second = hi if i % 2 == 0 else lo
            rows.append(
                (i, [x + eps for x in first] + [x + eps for x in second])
            )
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = pq_train(
            emb, m_sub=2, sub_dim=4, n_codes=2, iters=2
        ).collect()
        assert len(got) == 4  # 2 subspaces x 2 codewords
        assert {(r["m"], r["cid"]) for r in got} == {
            (0, 0), (0, 1), (1, 0), (1, 1)
        }
        assert all(r["n_members"] == 3 for r in got)
        assert all(r["mse"] < 0.01 for r in got)


class TestJlDistortion:
    def test_identity_like_sample_concentrates(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            jl_distortion,
        )

        # deterministic vectors; ratios must be finite, positive, and
        # the mean must sit near 1 (JL with 3/k normalization)
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(0, 200)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = jl_distortion(emb).collect()
        assert got, "sample produced no pairs"
        total = sum(r["n_pairs"] for r in got)
        assert total == 45  # C(10,2) pairs from ids % 20 == 3
        mean = got[0]["mean_ratio"]
        assert 0.5 < mean < 1.5


class TestToppVocab:
    def test_hand_computed_curve(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            topp_vocab_coverage,
        )

        # freqs: a=5, b=3, c=1, d=1 (N=10); ranked a,b,c,d cum 5,8,9,10
        docs = spark.createDataFrame(
            [(1, "a a a a a b b b c d")], "doc_id long, text string"
        )
        got = {
            r["p_target"]: (r["n_types"], r["coverage"])
            for r in topp_vocab_coverage(docs).collect()
        }
        assert got[0.5] == (1, 0.5)    # a alone covers 5/10
        assert got[0.9] == (3, 0.9)    # a,b,c cover 9/10
        assert got[0.95] == (4, 1.0)   # need all four
        assert got[0.99] == (4, 1.0)


class TestLogregDifficulty:
    def test_hardest_is_minority_pattern(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            logreg_difficulty,
        )

        # 19 stopword-heavy en docs + 1 en doc that LOOKS es (no
        # stopwords) -> the atypical en doc must rank hardest
        docs = spark.createDataFrame(
            [(i, "the a the word here", "en") for i in range(19)]
            + [(100, "uno dos tres cuatro", "en")]
            + [(200 + i, "uno dos tres cuatro", "es") for i in range(20)],
            "doc_id long, text string, lang string",
        )
        got = logreg_difficulty(docs, topk=5).collect()
        assert got[0]["doc_id"] == 100
        assert got[0]["difficulty"] >= got[-1]["difficulty"]


class TestLshSCurve:
    def test_buckets_and_rates_are_sane(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            lsh_s_curve,
        )

        # near-identical docs (high jaccard, should be candidates) +
        # unrelated docs (low jaccard)
        base = "w%d " * 30
        docs = spark.createDataFrame(
            [
                (1, ("alpha beta gamma delta " * 8).strip()),
                (2, ("alpha beta gamma delta " * 8).strip() + " tail"),
                (3, (base % tuple(range(30))).strip()),
                (4, (base % tuple(range(100, 130))).strip()),
            ],
            "doc_id long, text string",
        )
        got = {r["bucket"]: r for r in lsh_s_curve(docs).collect()}
        assert got, "no truth pairs found"
        hi = max(got)
        assert got[hi]["observed_rate"] == 1.0  # near-dups are candidates
        for r in got.values():
            assert 0.0 <= r["observed_rate"] <= 1.0
            assert 0.0 <= r["theoretical_rate"] <= 1.0


class TestWinnowClusters:
    def test_transitive_closure(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            winnow_clusters,
        )

        shared = " ".join(f"tok{i}" for i in range(24))  # >= 2 fingerprints
        docs = spark.createDataFrame(
            [
                (1, shared + " one two three"),
                (2, shared + " four five six"),      # overlaps 1 via shared
                (3, "totally different words here now okay fine yes"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in winnow_clusters(docs).collect()}
        assert set(got) == {1, 2}
        assert got[1]["cluster_id"] == got[2]["cluster_id"] == 1
        assert got[1]["cluster_size"] == 2


class TestFightinWords:
    def test_group_exclusive_token_tops(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            fightin_words,
        )

        docs = spark.createDataFrame(
            [(i, "shared words plus groupaword", "A") for i in range(10)]
            + [(100 + i, "shared words plus groupbword", "B") for i in range(10)],
            "doc_id long, text string, lang string",
        )
        got = {
            (r["lang"], r["rnk"] if "rnk" in r else None): r
            for r in fightin_words(docs, topk=1).collect()
        }
        rows = fightin_words(docs, topk=1).collect()
        by_lang = {r["lang"]: r for r in rows}
        assert by_lang["A"]["token"] == "groupaword"
        assert by_lang["B"]["token"] == "groupbword"
        assert by_lang["A"]["z_score"] > 0


class TestEmbeddingDecontaminate:
    def test_flags_only_near_benchmark(self, spark):
        from openrouter_batch_processor_spark.operators.similarity import (
            embedding_decontaminate,
        )

        # bench (src0): one direction; corpus: one near-copy (flag),
        # one orthogonal (no flag). Centroids = 8 lowest ids; keep all
        # vectors in one cell by making them near-parallel except the
        # orthogonal one.
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0], "src0"),
            (1, [0.99, 0.1, 0.0, 0.0], "src1"),   # near bench -> flag
            (2, [0.0, 0.0, 1.0, 0.0], "src1"),    # far -> maybe no flag
        ]
        emb = spark.createDataFrame(
            [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
        )
        docs = spark.createDataFrame(
            [(i, s) for i, _, s in rows], "doc_id long, source string"
        )
        got = {r["doc_id"]: r for r in embedding_decontaminate(
            emb, docs, n_centroids=1, threshold=0.9
        ).collect()}
        assert 1 in got and got[1]["bench_id"] == 0
        assert 2 not in got
