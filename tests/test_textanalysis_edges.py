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


class TestRepetitionSignals:
    def test_known_values(self, spark, edocs):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            repetition_signals,
        )

        rows = {r["doc_id"]: r for r in repetition_signals(edocs).collect()}
        assert len(rows) == len(EDGE_DOCS)  # every doc survives, even empty
        # empty / sub-trigram docs: zeros, not nulls
        for did in (1, 2, 3, 4):
            assert rows[did]["dup_trigram_frac"] == 0.0
            assert rows[did]["n_trigrams"] == 0
        # "one two" has a single bigram -> top_bigram_frac 1.0 but no trigrams
        assert rows[4]["top_bigram_frac"] == 1.0
        # "dup dup dup dup": trigrams = [dup dup dup] x2 -> half are dups
        assert rows[7]["n_trigrams"] == 2
        assert rows[7]["dup_trigram_frac"] == 0.5
        assert rows[7]["top_bigram_frac"] == 1.0  # all bigrams identical
        assert rows[7]["repetitive"] is True

    def test_varied_long_doc_not_repetitive(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            repetition_signals,
        )

        # top_bigram_frac is only meaningful with enough bigrams; a
        # varied 13-token doc (12 distinct bigrams) stays under both
        # thresholds
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over a lazy dog near the old barn")],
            "doc_id long, text string",
        )
        row = repetition_signals(docs).collect()[0]
        assert row["dup_trigram_frac"] == 0.0
        assert row["top_bigram_frac"] == pytest.approx(1 / 12, abs=1e-6)
        assert row["repetitive"] is False


class TestNgramContamination:
    def test_overlap_detection(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import ngram_contamination

        # bench doc (id 7 with mod 101) shares its 4-gram with doc 1 only
        docs = spark.createDataFrame(
            [
                (7, "alpha beta gamma delta"),  # benchmark member
                (1, "x alpha beta gamma delta y"),  # contaminated
                (2, "alpha beta gamma other words here"),  # no full 4-gram overlap
                (3, "totally different content entirely"),  # clean
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in ngram_contamination(docs).collect()}
        assert set(rows) == {1}  # only the contaminated doc is returned
        assert rows[1]["n_shared"] == 1
        assert rows[1]["n_shingles"] == 3
        assert rows[1]["contam_frac"] == pytest.approx(0.333333)


class TestUnigramNll:
    def test_rare_tokens_score_higher(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import unigram_nll

        docs = spark.createDataFrame(
            [(1, "common common common common"), (2, "common rare"), (3, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
        # empty doc contributes no tokens -> no row (undefined avg)
        assert set(rows) == {1, 2}
        assert rows[2]["avg_nll"] > rows[1]["avg_nll"]
        assert rows[1]["n_tokens"] == 4
        # doc of only the most common token still has nll > 0 (p < 1)
        assert rows[1]["avg_nll"] > 0


class TestBm25:
    def test_missing_query_term_and_ranking(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import bm25_topk

        docs = spark.createDataFrame(
            [
                (1, "spark spark spark join"),
                (2, "spark filler filler filler filler filler filler filler"),
                (3, "nothing relevant here"),
            ],
            "doc_id long, text string",
        )
        rows = bm25_topk(docs, ["spark", "absent_term"], k=10).collect()
        ids = [r["doc_id"] for r in rows]
        # doc 3 has no query term -> absent entirely
        assert 3 not in ids
        # higher tf + shorter doc outranks the long one-hit doc
        assert ids[0] == 1
        assert rows[0]["n_terms_hit"] == 1

    def test_k_truncation(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import bm25_topk

        docs = spark.createDataFrame(
            [(i, "term filler") for i in range(20)], "doc_id long, text string"
        )
        assert bm25_topk(docs, ["term"], k=5).count() == 5


class TestPiiRedaction:
    def test_counts_and_scrub(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import pii_redaction

        docs = spark.createDataFrame(
            [
                (1, "mail a@b.com and c.d+x@e-f.org call 555-123-4567"),
                (2, "no pii at all"),
                (3, "just digits 12-34 and half@mail"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pii_redaction(docs).collect()}
        assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
        assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
        # 'half@mail' has no TLD dot -> not an email
        assert rows[3]["n_emails"] == 0

    def test_phone_inside_email_not_double_counted(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import pii_redaction

        # the digits sit inside the email local part; email redaction
        # runs first so the phone pass must not see them
        docs = spark.createDataFrame(
            [(1, "x555-123-4567@mail.com ok")], "doc_id long, text string"
        )
        r = pii_redaction(docs).collect()[0]
        assert r["n_emails"] == 1 and r["n_phones"] == 0


class TestPearsonCorr:
    def test_perfect_and_degenerate(self, spark):
        import datetime as dt

        from openrouter_batch_processor_spark.operators.aggregates import pearson_corr

        base = dt.datetime(2025, 1, 1, 0, 0, 0)
        rows = []
        for h in range(6):
            ts = base + dt.timedelta(hours=h)
            rows.append(("lin", ts, float(h) * 2.0 + 1.0))  # corr == 1
            rows.append(("anti", ts, -float(h)))  # corr == -1
            rows.append(("flat", ts, 5.0))  # zero y-variance -> dropped
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        out = {r["event_type"]: r for r in pearson_corr(df).collect()}
        assert set(out) == {"lin", "anti"}
        assert out["lin"]["corr_x_value"] == 1.0
        assert out["anti"]["corr_x_value"] == -1.0


class TestStupidBackoff:
    """Brants et al. cascade: each tier must actually fire, with the
    paper's score at each tier."""

    def test_all_three_tiers(self, spark):
        import math

        from openrouter_batch_processor_spark.operators.textanalysis import (
            stupid_backoff_scores,
        )

        docs = spark.createDataFrame(
            [
                (1, "the fast cat runs home", "en"),
                (2, "a fast cat sleeps well", "en"),
                # fr doc: '(une fast cat)' -> trigram unseen, bigram
                # 'fast cat' seen twice, c1(fast)=2 -> bi tier, S=0.4;
                # '(fast cat belle)' -> bigram 'cat belle' unseen,
                # 'belle' OOV -> uni tier, S=0.16*(0+1)/(N+V)
                (3, "une fast cat belle", "fr"),
            ],
            "doc_id long, text string, lang string",
        )
        out = {r["doc_id"]: r for r in stupid_backoff_scores(docs).collect()}
        # en docs are inside the train slice: every trigram self-evident
        assert out[1]["n_tri_hits"] == out[1]["n_trigrams"] == 3
        assert out[3]["n_trigrams"] == 2
        assert out[3]["n_tri_hits"] == 0
        assert out[3]["n_bi_hits"] == 1
        assert out[3]["n_uni_backoffs"] == 1
        n, v = 10.0, 8.0  # two 5-token en docs; 8 distinct en terms
        expected = (
            round(-math.log(0.4), 6) + round(-math.log(0.16 * 1 / (n + v)), 6)
        ) / 2
        assert abs(out[3]["avg_nls"] - expected) < 1e-6

    def test_short_docs_excluded(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            stupid_backoff_scores,
        )

        docs = spark.createDataFrame(
            [(1, "two tokens", "en"), (2, "three tokens here", "en")],
            "doc_id long, text string, lang string",
        )
        assert [r["doc_id"] for r in stupid_backoff_scores(docs).collect()] == [2]


class TestKneserNey:
    """Interpolated KN: discounted ML + continuation interpolation,
    unseen-context fallback to pure Pc, all with hand-computed values."""

    def test_hit_interpolation_and_backoffs(self, spark):
        import math

        from openrouter_batch_processor_spark.operators.textanalysis import (
            kneser_ney_scores,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat runs", "en"),
                (2, "the cat sleeps", "en"),
                # fr doc: 'chez the' unseen ctx ('chez' OOV) -> Pc path;
                # 'the cat' seen twice -> discounted hit;
                # 'cat chez' seen ctx, unseen bigram -> interpolation-only.
                (3, "chez the cat chez", "fr"),
            ],
            "doc_id long, text string, lang string",
        )
        out = {r["doc_id"]: r for r in kneser_ney_scores(docs).collect()}
        # train slice: bigrams {the cat:2, cat runs:1, cat sleeps:1}
        # B=3 types, V=4 ('the','cat','runs','sleeps')
        b, v = 3.0, 4.0
        pc = lambda n1b: (n1b + 1) / (b + v + 1)
        # doc 3 bigram tiers
        assert out[3]["n_bigrams"] == 3
        assert out[3]["n_kn_hits"] == 1
        assert out[3]["n_ctx_hits"] == 1
        assert out[3]["n_cont_backoffs"] == 1
        # 'the cat': ctx_total(the)=2, n1_fwd(the)=1, n1_bwd(cat)=1
        p_hit = (2 - 0.75) / 2 + 0.75 * 1 / 2 * pc(1)
        # 'cat chez': ctx_total(cat)=2, n1_fwd(cat)=2, n1_bwd(chez)=0
        p_ctx = 0.0 / 2 + 0.75 * 2 / 2 * pc(0)
        # 'chez the': unseen ctx -> Pc(the), n1_bwd(the)=0
        p_oov = pc(0)
        expected = (
            round(-math.log(p_oov), 6)
            + round(-math.log(p_hit), 6)
            + round(-math.log(p_ctx), 6)
        ) / 3
        assert abs(out[3]["avg_nll"] - expected) < 1e-6
        # in-slice doc: every bigram is a hit
        assert out[1]["n_kn_hits"] == out[1]["n_bigrams"] == 2

    def test_probabilities_sum_to_one_over_closed_vocab(self, spark):
        # the defining property absolute discounting must preserve:
        # sum_w2 P(w2|w1) == 1 over the seen vocab + one OOV class
        import math

        from openrouter_batch_processor_spark.operators.textanalysis import (
            KN_DISCOUNT,
        )

        train = [["the", "cat", "runs"], ["the", "cat", "sleeps"]]
        from collections import Counter

        c12 = Counter()
        for toks in train:
            for a_, b_ in zip(toks, toks[1:]):
                c12[(a_, b_)] += 1
        vocab = sorted({w for t in train for w in t})
        btypes = len(c12)
        n1_bwd = Counter(b_ for (_a, b_) in c12)
        pc = lambda w: (n1_bwd.get(w, 0) + 1) / (btypes + len(vocab) + 1)
        for w1 in vocab:
            ctx_total = sum(c for (a_, _b), c in c12.items() if a_ == w1)
            if ctx_total == 0:
                continue
            n1_fwd = sum(1 for (a_, _b) in c12 if a_ == w1)
            total = sum(
                max(c12.get((w1, w2), 0) - KN_DISCOUNT, 0) / ctx_total
                + KN_DISCOUNT * n1_fwd / ctx_total * pc(w2)
                for w2 in vocab
            ) + KN_DISCOUNT * n1_fwd / ctx_total * pc("<oov>")
            assert math.isclose(total, 1.0, rel_tol=1e-12), (w1, total)

    def test_short_docs_excluded(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            kneser_ney_scores,
        )

        docs = spark.createDataFrame(
            [(1, "one", "en"), (2, "two tokens", "en")],
            "doc_id long, text string, lang string",
        )
        assert [r["doc_id"] for r in kneser_ney_scores(docs).collect()] == [2]


class TestQualityAuc:
    def test_matches_bruteforce_pairwise_auc(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            quality_auc,
            quality_scores,
        )

        rows = [
            (1, "the fast cat and the small dog run in the big field", "en"),
            (2, "xx yy zz xx yy zz xx yy zz !!! ??? ...", "en"),
            (3, "la casa es grande y el perro es pequeno", "es"),
            (4, "!!! ??? ### $$$ %%% ^^^ &&&", "es"),
            (5, "the quick brown fox jumps over the lazy dog", "en"),
            (6, "der hund ist nicht schnell und die katze ist klein", "de"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = quality_auc(docs, positive_lang="en").head()
        scores = {
            r["doc_id"]: r["quality_score"]
            for r in quality_scores(docs).collect()
        }
        pos = [scores[d] for d, _t, l in rows if l == "en"]
        neg = [scores[d] for d, _t, l in rows if l != "en"]
        wins = sum(
            1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
        )
        brute = wins / (len(pos) * len(neg))
        assert got["n_pos"] == 3 and got["n_neg"] == 3
        # operator floors at the 7th dp; brute force is exact
        assert abs(got["auc"] - brute) < 1e-6

    def test_ties_take_average_rank(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import quality_auc

        # identical texts -> identical scores -> every pos/neg pair ties
        docs = spark.createDataFrame(
            [(1, "same words here", "en"), (2, "same words here", "es"),
             (3, "same words here", "en"), (4, "same words here", "de")],
            "doc_id long, text string, lang string",
        )
        assert quality_auc(docs, positive_lang="en").head()["auc"] == 0.5

    def test_degenerate_single_class_yields_null_not_error(self, spark):
        # ADVICE r05: zero positives (or zero negatives) must degrade to
        # auc=NULL, not an ANSI divide-by-zero.
        from openrouter_batch_processor_spark.operators.textanalysis import quality_auc

        docs = spark.createDataFrame(
            [(1, "all the same class", "es"), (2, "still not english", "de")],
            "doc_id long, text string, lang string",
        )
        row = quality_auc(docs, positive_lang="en").head()
        assert row["n_pos"] == 0 and row["auc"] is None

    def test_scaled_numerator_survives_beyond_int64(self, spark):
        # ADVICE r05: s2*1e7 is quadratic in n — with BIGINT math a
        # ~1.4M balanced corpus overflows. Prove the DECIMAL(38,0)
        # path by checking the exact identity the overflow would break:
        # perfectly separated classes -> auc exactly 1.0 at a row count
        # whose scaled numerator exceeds int64 if computed naively.
        # (We synthesize the post-score distribution shape cheaply: many
        # distinct scores via distinct texts is too slow, so assert the
        # expression itself on a crafted aggregate instead.)
        from pyspark.sql import functions as F

        n_pos = 1_500_000
        n = 3_000_000
        # perfectly separated: every positive outranks every negative ->
        # s2 = sum over positives of 2*rank = 2*sum(n_neg+1 .. n)
        s2 = 2 * (n * (n + 1) // 2 - (n - n_pos) * (n - n_pos + 1) // 2)
        assert (s2 - n_pos * (n_pos + 1)) * 10_000_000 > 2**63  # would overflow
        df = spark.createDataFrame(
            [(s2, n_pos, n)], "s2 long, n_pos long, n long"
        )
        auc = df.select(
            (
                F.expr(
                    "((cast(s2 as decimal(38,0)) - cast(n_pos as decimal(38,0))"
                    " * (n_pos + 1)) * 10000000)"
                    " div nullif(cast(2 as decimal(38,0)) * n_pos * (n - n_pos), 0)"
                ).cast("double")
                / F.lit(10000000.0)
            ).alias("auc")
        ).head()["auc"]
        assert auc == 1.0


class TestJelinekMercerEm:
    def test_lambda_rises_when_bigrams_generalize(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            jelinek_mercer_em,
        )

        # train (ids 1-9) and held-out (id 10, 20) share the same bigrams
        # -> bigram model predicts held-out perfectly -> lambda -> 1
        docs = spark.createDataFrame(
            [(i, "the cat runs fast") for i in range(1, 10)]
            + [(10, "the cat runs fast"), (20, "the cat runs fast")],
            "doc_id long, text string",
        )
        rows = sorted(jelinek_mercer_em(docs).collect(), key=lambda r: r["em_iter"])
        assert [r["em_iter"] for r in rows] == [1, 2, 3]
        assert rows[0]["lam"] > 0.5
        assert rows[2]["lam"] > rows[0]["lam"] > 0.5
        assert rows[2]["lam"] > 0.95

    def test_lambda_falls_when_bigrams_are_novel(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            jelinek_mercer_em,
        )

        # held-out doc uses train VOCAB but entirely novel bigram order
        docs = spark.createDataFrame(
            [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"), (3, "aa bb cc dd ee"),
             (10, "ee dd cc bb aa")],
            "doc_id long, text string",
        )
        rows = sorted(jelinek_mercer_em(docs).collect(), key=lambda r: r["em_iter"])
        # every held-out bigram has p_bi = 0 -> every posterior weight
        # is 0 -> EM collapses to the boundary in ONE step and stays
        assert rows[0]["lam"] == 0.0
        assert rows[2]["lam"] == 0.0

    def test_matches_pure_python_em(self, spark):
        from collections import Counter

        from openrouter_batch_processor_spark.operators.textanalysis import (
            jelinek_mercer_em,
        )

        texts = {1: "a b a c", 2: "b a c c", 3: "a b c a", 10: "a c b a", 20: "c c a b"}
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        train = [texts[i].split() for i in (1, 2, 3)]
        held = [texts[i].split() for i in (10, 20)]
        c12, c1 = Counter(), Counter()
        for t in train:
            c1.update(t)
            c12.update(zip(t, t[1:]))
        bign = sum(c1.values())
        hf = Counter()
        for t in held:
            hf.update(zip(t, t[1:]))
        lam, out = 0.5, []
        for _ in range(3):
            num, den = 0.0, 0
            for (w1, w2), tf in hf.items():
                if w2 not in c1:
                    continue
                pb = c12.get((w1, w2), 0) / c1[w1] if w1 in c1 else 0.0
                pu = c1[w2] / bign
                w = lam * pb / (lam * pb + (1 - lam) * pu)
                num += round(tf * w, 9)
                den += tf
            lam = round(num / den, 9)
            out.append(lam)
        rows = sorted(jelinek_mercer_em(docs).collect(), key=lambda r: r["em_iter"])
        for r, want in zip(rows, out):
            assert r["lam"] == pytest.approx(want, abs=1e-9)
