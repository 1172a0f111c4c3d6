"""Round-4 curation v2 operators: SemDeDup, DSIR importance weights,
bigram-LM perplexity — semantic properties on constructed corpora (the
value-parity proof is the registry oracle; these tests pin the
behavioral contract the papers define)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.similarity import semdedup_report
from openrouter_batch_processor_spark.operators.textanalysis import (
    bigram_nll,
    dsir_logweights,
    token_stats,
)


@pytest.fixture(scope="module")
def emb(spark):
    # two orthogonal clusters; vec_ids 0-1 are the centroid seeds (one
    # per cluster). Every non-seed vector is an exact or jittered copy
    # of its seed — i.e. a NEAR-DUPLICATE (cosine ~1) — which is what
    # the SemDeDup removal assertions below depend on.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # exact dup of 0
        (3, [1.0, 0.01, 0.0, 0.0]),  # near dup of 0
        (4, [0.0, 1.0, 0.02, 0.0]),  # near dup of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemDeDup:
    def test_duplicates_removed_one_representative_kept(self, spark, emb):
        rep = {
            r["centroid_id"]: r
            for r in semdedup_report(emb, threshold=0.95, n_centroids=2).collect()
        }
        # cluster 0 holds {0,2,3}: 2 and 3 are >=0.95-cosine to id 0 ->
        # removed; the lowest id (the seed) always survives
        assert rep[0]["n_vectors"] == 3
        assert rep[0]["n_removed"] == 2
        assert rep[0]["n_kept"] == 1
        # cluster 1 holds {1,4}: 4 is a jittered copy of 1 -> removed
        assert rep[1]["n_vectors"] == 2
        assert rep[1]["n_removed"] == 1

    def test_counts_are_consistent(self, spark, emb):
        rows = semdedup_report(emb, threshold=0.5, n_centroids=2).collect()
        assert sum(r["n_vectors"] for r in rows) == emb.count()
        for r in rows:
            assert r["n_kept"] + r["n_removed"] == r["n_vectors"]
            # removed_frac is rounded to 6 dp at the operator edge
            assert abs(r["removed_frac"] - r["n_removed"] / r["n_vectors"]) < 5e-7

    def test_threshold_one_removes_only_exact(self, spark, emb):
        rep = {
            r["centroid_id"]: r["n_removed"]
            for r in semdedup_report(emb, threshold=1.0, n_centroids=2).collect()
        }
        assert rep[0] == 1  # only the exact duplicate (id 2)
        assert rep[1] == 0


@pytest.fixture(scope="module")
def lang_docs(spark):
    # 'en' docs share a vocabulary; the 'xx' docs use disjoint tokens,
    # except doc 5 which is written in the en vocabulary.
    rows = [
        (1, "alpha beta gamma alpha beta", "en"),
        (2, "beta gamma delta alpha", "en"),
        (3, "zork quux blarg zork", "xx"),
        (4, "quux blarg zork quux blarg", "xx"),
        (5, "alpha beta gamma delta", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDsirWeights:
    def test_target_vocab_scores_higher(self, spark, lang_docs):
        w = {r["doc_id"]: r["log_weight"] for r in dsir_logweights(lang_docs).collect()}
        # docs written in the target (en) vocabulary outscore the
        # disjoint-vocab docs regardless of their own lang label
        assert min(w[1], w[2], w[5]) > max(w[3], w[4])

    def test_token_counts_match_token_stats(self, spark, lang_docs):
        w = {r["doc_id"]: r["n_tokens"] for r in dsir_logweights(lang_docs).collect()}
        ts = {r["doc_id"]: r["n_ws_tokens"] for r in token_stats(lang_docs).collect()}
        assert w == ts

    def test_lang_passthrough(self, spark, lang_docs):
        rows = {r["doc_id"]: r["lang"] for r in dsir_logweights(lang_docs).collect()}
        assert rows == {1: "en", 2: "en", 3: "xx", 4: "xx", 5: "xx"}


@pytest.fixture(scope="module")
def ppl_docs(spark):
    rows = [
        (1, "the cat sat the cat sat the cat sat"),  # repeated bigrams
        (2, "one two three four five six seven"),  # each bigram once
        (3, "solo"),  # 1 token -> no bigrams -> excluded
        (4, ""),  # empty -> excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBigramPerplexity:
    def test_repetitive_doc_has_lower_ppl(self, spark, ppl_docs):
        rows = {r["doc_id"]: r for r in bigram_nll(ppl_docs).collect()}
        assert set(rows) == {1, 2}  # <2-token docs excluded
        assert rows[1]["ppl"] < rows[2]["ppl"]

    def test_bigram_count_is_tokens_minus_one(self, spark, ppl_docs):
        rows = {r["doc_id"]: r["n_bigrams"] for r in bigram_nll(ppl_docs).collect()}
        assert rows[1] == 8 and rows[2] == 6

    def test_ppl_is_exp_of_avg_nll(self, spark, ppl_docs):
        for r in bigram_nll(ppl_docs).collect():
            assert r["avg_nll"] > 0
            assert abs(r["ppl"] - round(math.exp(r["avg_nll"]), 6)) < 1e-6


@pytest.fixture(scope="module")
def freq_df(spark):
    # frequencies: a:3, b:2, c:1 -> exact F2 = 9+4+1 = 14
    rows = [(x,) for x in ["a"] * 3 + ["b"] * 2 + ["c"]]
    return spark.createDataFrame(rows, "v string")


class TestAmsF2:
    def test_exact_and_estimator_shape(self, spark, freq_df):
        from openrouter_batch_processor_spark.operators.sketches import ams_f2

        rows = ams_f2(freq_df, "v").collect()
        assert len(rows) == 9
        assert all(r["exact_f2"] == 14 for r in rows)
        # each estimator is (±3 ±2 ±1)^2 — always one of these squares
        assert all(r["est_f2"] in {0, 4, 16, 36} for r in rows)
        # combiners are identical on every row and consistent with ests
        ests = sorted(r["est_f2"] for r in rows)
        assert all(abs(r["mean_est"] - sum(ests) / 9) < 5e-7 for r in rows)
        assert all(r["median_est"] == float(ests[4]) for r in rows)

    def test_mergeability_partition_invariance(self, spark, freq_df):
        from openrouter_batch_processor_spark.operators.sketches import ams_f2

        one = {r["r"]: r["est_f2"] for r in ams_f2(freq_df.coalesce(1), "v").collect()}
        many = {r["r"]: r["est_f2"] for r in ams_f2(freq_df.repartition(7), "v").collect()}
        assert one == many


class TestCusumChangepoint:
    def test_planted_level_shift_is_found(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            cusum_changepoints,
        )

        # flat 0.0 for 10 points, then flat 10.0 for 10 points: the
        # cusum |dev| peaks exactly at the shift boundary (k=10)
        rows = [
            (i, f"2026-01-01 00:{i:02d}:00", "shift", 0.0 if i < 10 else 10.0)
            for i in range(20)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
        r = cusum_changepoints(ev).collect()[0]
        assert r["cp_index"] == 10
        assert r["n"] == 20
        # |dev|/n at k=10: |20*0 - 10*100|/20 = 50
        assert abs(r["max_abs_cusum"] - 50.0) < 1e-6


class TestPhash:
    def _media(self, spark, payloads):
        from openrouter_batch_processor_spark.operators.multimodal import media_table

        rows = [(f"img/{i}.png", p.encode(), len(p)) for i, p in enumerate(payloads)]
        files = spark.createDataFrame(
            rows, "rel_path string, content binary, length long"
        )
        return media_table(files)

    def test_identical_payloads_have_zero_hamming(self, spark):
        from openrouter_batch_processor_spark.operators.multimodal import (
            phash_images,
            phash_near_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog " * 4  # 176 chars
        # edit an UNSAMPLED byte (the 64-sample grid for n=176 tops out
        # at index (63*176)//64 = 173): the signature is bit-identical,
        # so the pair surfaces at hamming 0 through every band. An edit
        # at a sampled position shifts the mean threshold too — locality
        # holds for off-grid edits; a real decoder's fixed 8x8 resample
        # makes the grid length-invariant (documented in phash_images).
        edited = base[:175] + "x"
        media = self._media(spark, [base, edited, "completely different " * 9])
        sigs = {r["media_id"]: (r["h_hi"], r["h_lo"]) for r in phash_images(media).collect()}
        assert len(sigs) == 3
        assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in sigs.values())
        pairs = phash_near_pairs(media, max_hamming=0).collect()
        assert len(pairs) == 1 and pairs[0]["hamming"] == 0

    def test_empty_payload_is_skipped(self, spark):
        from openrouter_batch_processor_spark.operators.multimodal import phash_images

        media = self._media(spark, ["abc def ghi jkl", ""])
        assert phash_images(media).count() == 1


class TestDsirSelect:
    def test_yield_sums_and_rate(self, spark, lang_docs):
        from openrouter_batch_processor_spark.operators.textanalysis import dsir_select

        rows = dsir_select(lang_docs.withColumn("source", F.lit("s1")), k=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_docs"] == 5 and r["n_selected"] == 3
        assert abs(r["sel_rate"] - 0.6) < 1e-9
        assert r["sum_logw_selected"] != 0.0

    def test_k_larger_than_corpus_selects_all(self, spark, lang_docs):
        from openrouter_batch_processor_spark.operators.textanalysis import dsir_select

        docs = lang_docs.withColumn(
            "source", F.when(F.col("lang") == "en", "tgt").otherwise("other")
        )
        rows = {r["source"]: r for r in dsir_select(docs, k=100).collect()}
        assert all(r["n_selected"] == r["n_docs"] for r in rows.values())
        assert all(r["sel_rate"] == 1.0 for r in rows.values())

    def test_weighting_biases_toward_target_vocab(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import dsir_select

        # 30 target-vocab docs vs 30 disjoint-vocab docs; sampling half
        # the corpus must draw target-vocab docs at a strictly higher
        # rate (their importance weights dominate the Gumbel keys)
        rows = [(i, "alpha beta gamma delta " * 5, "en", "tgt") for i in range(30)]
        rows += [(100 + i, "zork quux blarg frob " * 5, "xx", "other") for i in range(30)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        got = {r["source"]: r for r in dsir_select(docs, k=30).collect()}
        assert got["tgt"]["n_selected"] > got["other"]["n_selected"]


class TestHoltLinear:
    def test_linear_series_converges_to_trend(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import holt_linear

        # y = 2*i: Holt on a perfectly linear series converges toward
        # slope 2 and forecast y_{n} + 2
        rows = [
            (i, f"2026-01-01 00:{i:02d}:00", "lin", 2.0 * i) for i in range(50)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
        r = holt_linear(ev).collect()[0]
        assert r["n"] == 50
        assert abs(r["trend"] - 2.0) < 0.2
        assert abs(r["forecast_1"] - (r["level"] + r["trend"])) < 2e-6

    def test_matches_reference_fold(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import holt_linear

        xs = [1.0, 2.0, 4.0, 3.0, 10.0]
        rows = [(i, f"2026-01-01 00:{i:02d}:00", "t", x) for i, x in enumerate(xs)]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
        r = holt_linear(ev).collect()[0]
        level = None
        trend = 0.0
        for x in xs:
            if level is None:
                level = x
                continue
            nl = 0.5 * x + 0.5 * (level + trend)
            trend = 0.3 * (nl - level) + 0.7 * trend
            level = nl
        from openrouter_batch_processor_spark.operators.timeseries import _round_away

        assert r["level"] == _round_away(level)
        assert r["trend"] == _round_away(trend)


class TestRandomizedReferences:
    """Randomized corpora checked against independent pure-Python
    references — a third opinion beside the DuckDB oracle, catching
    bugs the two query engines might share by construction."""

    def _corpus(self, seed, n_docs=40, vocab=("aa", "bb", "cc", "dd", "ee")):
        import random

        rng = random.Random(seed)
        return [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(n_docs)
        ]

    def test_bigram_nll_matches_pure_python(self, spark):
        import math as m
        from collections import Counter

        from openrouter_batch_processor_spark.operators.textanalysis import bigram_nll

        rows = self._corpus(seed=7)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in bigram_nll(docs).collect()}

        uni = Counter()
        bi = Counter()
        per_doc = {}
        for doc_id, text in rows:
            toks = text.split()
            uni.update(toks)
            bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            bi.update(bgs)
            if bgs:
                per_doc[doc_id] = Counter(bgs)
        v = float(len(uni))
        assert set(got) == set(per_doc)
        for doc_id, bf in per_doc.items():
            n = sum(bf.values())
            sm = 0
            for bg, c in bf.items():
                w1 = bg.split(" ")[0]
                nb = round(-m.log((bi[bg] + 0.5) / (uni[w1] + 0.5 * v)), 6)
                sm += round(round(c * nb, 6) * 1000000)
            sm7 = (sm * 10) // n
            assert got[doc_id]["n_bigrams"] == n
            assert got[doc_id]["avg_nll"] == sm7 / 10000000.0

    def test_dsir_weights_match_pure_python(self, spark):
        import hashlib
        import math as m
        from collections import Counter

        from openrouter_batch_processor_spark.operators.textanalysis import (
            dsir_logweights,
        )

        base = self._corpus(seed=11)
        rows = [(i, t, "en" if i % 3 == 0 else "xx") for i, t in base]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {r["doc_id"]: r for r in dsir_logweights(docs).collect()}

        def bucket(term):
            return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 512

        cb = Counter()
        tb = Counter()
        per_doc = {}
        for doc_id, text, lang in rows:
            toks = text.split()
            bks = [bucket(t) for t in toks]
            cb.update(bks)
            if lang == "en":
                tb.update(bks)
            if bks:
                per_doc[doc_id] = Counter(bks)
        tc, tt = float(sum(cb.values())), float(sum(tb.values()))
        assert set(got) == set(per_doc)
        for doc_id, dfb in per_doc.items():
            from decimal import Decimal

            lw = Decimal(0)
            for b, tf in dfb.items():
                lr = round(
                    m.log((tb.get(b, 0) + 1) / (tt + 512))
                    - m.log((cb[b] + 1) / (tc + 512)),
                    6,
                )
                lw += Decimal(str(round(tf * lr, 6)))
            assert got[doc_id]["n_tokens"] == sum(dfb.values())
            assert got[doc_id]["log_weight"] == round(float(lw), 6)


class TestMooreLewis:
    """Moore & Lewis 2010 cross-entropy difference: hand-computed
    two-doc case exercising both the negative (selected) and the
    exactly-zero (not selected, strict cut) sides."""

    def test_hand_computed_difference_and_cut(self, spark):
        import math

        from openrouter_batch_processor_spark.operators.curation import (
            moore_lewis_select,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "en"), (2, "x y", "fr")],
            "doc_id long, text string, lang string",
        )
        out = {r["doc_id"]: r for r in moore_lewis_select(docs).collect()}
        # in-domain model (doc 1 only): c12(a,b)=1, c1(a)=1, V=2
        # general model: c12=1 each, c1=1 each, V=4
        ce_in_1 = round(-math.log(1.5 / 2.0), 6)   # 0.75
        ce_gen = round(-math.log(1.5 / 3.0), 6)    # 0.5
        assert abs(out[1]["ce_in"] - ce_in_1) < 1e-6
        assert abs(out[1]["ce_gen"] - ce_gen) < 1e-6
        assert out[1]["selected"] is True and out[1]["ce_diff"] < 0
        # doc 2: OOV under the in-domain model -> p_in = 0.5/1.0 = 0.5
        # == its general prob exactly -> diff 0, NOT selected (strict <)
        assert abs(out[2]["ce_diff"]) < 1e-9
        assert out[2]["selected"] is False

    def test_in_domain_docs_prefer_in_domain_model(self, spark):
        from openrouter_batch_processor_spark.operators.curation import (
            moore_lewis_select,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat runs fast and the dog runs slow", "en"),
                (2, "the cat runs slow and the dog runs fast", "en"),
                (3, "la casa es grande y el perro es lento", "es"),
                (4, "el perro es rapido y la casa es chica", "es"),
            ],
            "doc_id long, text string, lang string",
        )
        out = {r["doc_id"]: r for r in moore_lewis_select(docs).collect()}
        assert out[1]["selected"] and out[2]["selected"]
        assert not out[3]["selected"] and not out[4]["selected"]


def test_logreg_calibration_ece_and_bins(spark):
    from pyspark.sql import Row

    from openrouter_batch_processor_spark.operators.curation import (
        logreg_calibration,
    )

    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "de"
        text = ("the a good text " if lang == "en" else "ein und zwei ") * (
            2 + i % 5
        )
        rows.append(Row(doc_id=f"d{i:03d}", text=text, lang=lang))
    docs = spark.createDataFrame(rows)
    out = logreg_calibration(docs).collect()
    assert 1 <= len(out) <= 10
    total = sum(r["n_docs"] for r in out)
    assert total == 40
    # ECE is the bin-weighted mean gap, identical on every row
    eces = {r["ece"] for r in out}
    assert len(eces) == 1
    ece = eces.pop()
    expected = sum(r["abs_gap"] * r["n_docs"] for r in out) / total
    assert abs(ece - expected) < 1e-5
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["mean_p"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0


def test_cartography_regions_and_bounds(spark):
    from pyspark.sql import Row

    from openrouter_batch_processor_spark.operators.curation import (
        logreg_cartography,
    )

    rows = []
    for i in range(30):
        lang = "en" if i % 2 == 0 else "de"
        text = ("the a of text here " if lang == "en" else "ein zwei drei ") * (
            2 + i % 4
        )
        rows.append(Row(doc_id=f"d{i:03d}", text=text, lang=lang))
    out = logreg_cartography(spark.createDataFrame(rows), topk=30).collect()
    assert len(out) == 30
    for r in out:
        assert 0.0 <= r["mean_conf"] <= 1.0
        assert 0.0 <= r["variability"] <= 0.5
        assert r["region"] in ("easy", "hard", "ambiguous")
    # ordered by variability descending
    vs = [r["variability"] for r in out]
    assert vs == sorted(vs, reverse=True)
