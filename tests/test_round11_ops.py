"""Round-11 operators: retsim band auto-dial, UniMax waterfill quotas,
the curation pipeline's soft-dedup yield column, CKA partial-Gram
equivalence."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.dedup import (
    RETSIM_AUTO_THRESHOLD,
    RETSIM_BANDS,
    RETSIM_BANDS_WIDE,
    _retsim_auto_bands,
)
from openrouter_batch_processor_spark.operators.sampling import unimax_quotas


def test_retsim_auto_bands_small_corpus_full_recall(spark):
    docs = spark.range(100).select(
        F.col("id").cast("string").alias("doc_id")
    )
    assert _retsim_auto_bands(docs, "doc_id") == RETSIM_BANDS


def test_retsim_auto_bands_large_corpus_wide_keys(spark):
    docs = spark.range(RETSIM_AUTO_THRESHOLD + 1).select(
        F.col("id").cast("string").alias("doc_id")
    )
    assert _retsim_auto_bands(docs, "doc_id") == RETSIM_BANDS_WIDE


def test_retsim_auto_bands_uncountable_input_defaults_wide(spark):
    # a streaming DF cannot be counted at plan-build time — the dial
    # must fall back to the setting that survives unknown scale
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    ).select(F.col("value").cast("string").alias("doc_id"))
    assert _retsim_auto_bands(stream, "doc_id") == RETSIM_BANDS_WIDE


def _docs(spark, texts_by_lang):
    rows = []
    i = 0
    for lang_text, n in texts_by_lang:
        for _ in range(n):
            rows.append(Row(doc_id=f"d{i:05d}", text=lang_text))
            i += 1
    return spark.createDataFrame(rows)


def _iter_waterfill(per, budget_frac=0.5, max_epochs=4):
    total = sum(per.values())
    b = math.floor(total * budget_frac)
    langs = sorted(per, key=lambda l: (per[l] * max_epochs, l))
    rem_b, rem = b, len(langs)
    alloc = {}
    for lang in langs:
        fair = rem_b / rem
        a = min(per[lang] * max_epochs, fair)
        alloc[lang] = a
        rem_b -= a
        rem -= 1
    return b, alloc


def test_unimax_matches_iterative_waterfill(spark):
    # de tiny (cap binds), en huge (absorbs the freed budget)
    docs = _docs(
        spark,
        [
            ("der die das und ist nicht", 3),
            ("the fast and the slow and the small and the big thing", 200),
            ("el la de que y en", 10),
        ],
    )
    rows = {r["lang"]: r for r in unimax_quotas(docs).collect()}
    per = {lang: rows[lang]["n_tokens"] for lang in rows}
    b, expect = _iter_waterfill(per)
    for lang, r in rows.items():
        assert abs(r["alloc_tokens"] - round(expect[lang], 6)) < 1e-6, (
            lang,
            r,
            expect[lang],
        )
        assert r["cap_tokens"] == 4 * r["n_tokens"]
        assert r["epochs"] <= 4.0 + 1e-9
    # budget is exhausted (some language is below its cap here)
    assert abs(sum(r["alloc_tokens"] for r in rows.values()) - b) < 1e-3


def test_unimax_budget_covers_every_cap(spark):
    # budget_frac far above max_epochs * anything -> istar == k branch:
    # every language just gets its cap and the budget is NOT exhausted
    docs = _docs(
        spark,
        [("der die das und ist nicht", 2), ("el la de que y en", 2)],
    )
    rows = unimax_quotas(docs, budget_frac=100.0, max_epochs=2).collect()
    for r in rows:
        assert r["alloc_tokens"] == float(r["cap_tokens"])
        assert abs(r["epochs"] - 2.0) < 1e-9


def test_pipeline_soft_yield_column(spark):
    # one near-dup cluster of 3 UNEQUAL-length variants + 1 unique doc:
    # hard keep-first keeps the shortest variant (a1) + the unique doc;
    # the soft column weights every exact-survivor at 1/|cluster|, so
    # the dropped longer variants still contribute their share
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )  # 20 tokens
    uniq = (
        "completely different words entirely here nothing shared at all "
        "one two three four five six seven eight nine ten"
    )  # 19 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id="a1", source="s1", text=base + " one"),  # 21
            Row(doc_id="a2", source="s1", text=base + " one two"),  # 22
            Row(doc_id="a3", source="s1", text=base + " one two three"),
            Row(doc_id="b1", source="s1", text=uniq),
        ]
    )
    from openrouter_batch_processor_spark.operators.curation import (
        corpus_curation_pipeline,
    )

    out = corpus_curation_pipeline(docs, quality_min=0.0, boiler_max=1.0)
    row = out.collect()[0]
    assert "n_tokens_soft" in out.columns
    assert row["n_docs"] == 2
    assert row["n_tokens"] == 21 + 19  # hard survivors: a1 + b1
    # soft: 19 (uniq, weight 1) + (21 + 22 + 23) / 3 = 19 + 22 = 41
    assert abs(row["n_tokens_soft"] - 41.0) < 1e-6


def test_temperature_shares_vs_unimax_epochs(spark):
    # tail language: alpha=0.3 temperature over-represents it (epochs
    # far above 1 and above the head language's), while UniMax caps it
    docs = _docs(
        spark,
        [
            ("der die das und ist nicht", 2),
            ("the fast and the slow and the small and the big thing", 300),
        ],
    )
    from openrouter_batch_processor_spark.operators.sampling import (
        language_temperature_shares,
    )

    temp = {r["lang"]: r for r in language_temperature_shares(docs).collect()}
    uni = {r["lang"]: r for r in unimax_quotas(docs).collect()}
    assert temp["de"]["epochs"] > temp["en"]["epochs"]
    assert temp["de"]["epochs"] > 4.0  # over-repetition the cap prevents
    assert uni["de"]["epochs"] <= 4.0 + 1e-9
    # shares normalize
    assert abs(sum(r["share"] for r in temp.values()) - 1.0) < 1e-9


def test_unimax_apply_copy_counts(spark):
    from openrouter_batch_processor_spark.operators.sampling import (
        unimax_apply,
    )

    docs = _docs(
        spark,
        [
            ("der die das und ist nicht", 3),
            ("the fast and the slow and the small and the big thing", 200),
        ],
    )
    uni = {r["lang"]: r for r in unimax_quotas(docs).collect()}
    drawn = unimax_apply(docs).collect()
    by_lang = {}
    for r in drawn:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        e = uni[lang]["epochs"]
        import math as m

        for r in rows:
            assert r["epochs"] == e
            assert r["n_copies"] in (m.floor(e), m.floor(e) + 1)
    # the capped language (epochs == 4.0 exactly) is fully repeated:
    # every doc present with exactly 4 copies, no fraction gate
    if abs(uni["de"]["epochs"] - 4.0) < 1e-9:
        de = by_lang["de"]
        assert len(de) == 3 and all(r["n_copies"] == 4 for r in de)


# ===========================================================================
# Second batch: Self-BLEU, RHO-loss selection, MAUVE frontier
# ===========================================================================


def test_self_bleu_identical_docs_score_one(spark):
    # two identical docs: every gram is fully clipped by the other copy
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="dup", text="alpha beta gamma alpha beta"),
            Row(doc_id=2, source="dup", text="alpha beta gamma alpha beta"),
            Row(doc_id=3, source="uniq", text="zeta eta theta iota kappa"),
        ]
    )
    from openrouter_batch_processor_spark.operators.textanalysis import self_bleu

    out = {r["source"]: r for r in self_bleu(docs).collect()}
    assert out["dup"]["mean_self_bleu"] == 1.0
    assert out["dup"]["n_docs"] == 2
    # the unique doc shares the unigram 'alpha'?? none — all grams unique
    assert out["uniq"]["mean_self_bleu"] == 0.0


def test_self_bleu_clip_uses_max_excluding_self(spark):
    # doc 1 has 'x' three times; the best OTHER doc has it once ->
    # clipped unigram precision for doc 1 is 1/3 on that gram
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text="x x x"),
            Row(doc_id=2, source="s", text="x y z"),
        ]
    )
    from openrouter_batch_processor_spark.operators.textanalysis import (
        _clipped_precision,
        term_frequencies,
    )

    tf = term_frequencies(docs).withColumnRenamed("term", "gram")
    p1 = {r["doc_id"]: r["p1"] for r in _clipped_precision(tf, "doc_id", "p1").collect()}
    assert abs(p1[1] - 1.0 / 3.0) < 1e-12  # min(3, 1) / 3
    assert abs(p1[2] - 1.0 / 3.0) < 1e-12  # x clipped at 3->1 of its 1; y,z unseen


def test_rho_select_prefers_target_like_rare_docs(spark):
    # 'qq rr' appears only in the en target slice -> cheap under the
    # target LM, expensive under the corpus LM -> top rho score
    rows = [Row(doc_id=i, lang="de", text="common words common words") for i in range(10)]
    rows.append(Row(doc_id=100, lang="en", text="qq rr qq rr"))
    rows.append(Row(doc_id=101, lang="en", text="qq rr"))
    docs = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.textanalysis import rho_loss_scores

    out = rho_loss_scores(docs, k=3).collect()
    assert out[0]["doc_id"] in (100, 101)
    assert out[0]["rho_score"] > out[-1]["rho_score"]


def test_mauve_frontier_identical_populations_zero_kl(spark):
    # even and odd labels laid out identically -> P == Q -> KL == 0 at
    # every lambda
    import numpy as np

    rows = []
    for i in range(32):
        v = [float((i // 2) % 4)] * 64  # pairs (2i, 2i+1) share a vector
        rows.append(Row(vec_id=i, embedding=v, label=i % 2))
    emb = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.kmeans import mauve_frontier

    out = mauve_frontier(emb, k=4, iters=1).collect()
    assert len(out) == 9
    for r in out:
        assert r["kl_p"] == 0.0 and r["kl_q"] == 0.0
        assert r["n_p"] == 16 and r["n_q"] == 16


def test_mauve_frontier_disjoint_populations_positive_kl(spark):
    rows = []
    for i in range(16):
        base = 0.0 if i % 2 == 0 else 100.0  # even/odd in different cells
        rows.append(Row(vec_id=i, embedding=[base + (i % 3)] * 64, label=i % 2))
    emb = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.kmeans import mauve_frontier

    out = mauve_frontier(emb, k=4, iters=1).collect()
    for r in out:
        assert r["kl_p"] > 0.0 and r["kl_q"] > 0.0


def test_curriculum_pacing_monotone_and_saturating(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"tok{i % 7} common word filler") for i in range(40)]
    )
    from openrouter_batch_processor_spark.operators.curation import (
        curriculum_pacing,
    )

    out = sorted(curriculum_pacing(docs).collect(), key=lambda r: r["step"])
    assert len(out) == 10
    elig = [r["n_eligible"] for r in out]
    assert elig == sorted(elig)  # competence grows -> pool never shrinks
    assert out[-1]["competence"] == 1.0
    assert out[-1]["n_eligible"] == 40  # full corpus at c=1
    assert out[-1]["frac_eligible"] == 1.0


def test_lightweight_coreset_outliers_get_high_sensitivity(spark):
    rows = [Row(vec_id=i, embedding=[0.0] * 64) for i in range(20)]
    rows.append(Row(vec_id=99, embedding=[10.0] * 64))  # lone outlier
    emb = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.sampling import (
        lightweight_coreset,
    )

    out = lightweight_coreset(emb, m=5).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert 99 in by_id  # the outlier must be drawn
    assert by_id[99]["sensitivity"] == max(r["sensitivity"] for r in out)
    # coreset weight is the inverse of m*q
    r = by_id[99]
    assert abs(r["coreset_w"] - 1.0 / (5 * r["sensitivity"])) < 1e-3


def test_permutation_test_detects_real_shift(spark):
    # en docs 10x longer: the observed diff should be more extreme than
    # (almost) every random reassignment -> tiny p
    rows = [Row(doc_id=i, lang="en", n_chars=1000 + i % 7) for i in range(60)]
    rows += [Row(doc_id=100 + i, lang="de", n_chars=100 + i % 7) for i in range(60)]
    docs = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.sampling import (
        permutation_test,
    )

    r = permutation_test(docs).collect()[0]
    assert r["n_a"] == 60 and r["n_b"] == 60
    assert r["obs_diff"] == 900.0
    assert r["n_perms"] == 200
    assert r["p_value"] <= 0.01  # 1/201 when nothing is as extreme


def test_permutation_test_null_when_no_shift(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 == 0 else "de", n_chars=50 + (i * 13) % 11)
            for i in range(200)]
    docs = spark.createDataFrame(rows)
    from openrouter_batch_processor_spark.operators.sampling import (
        permutation_test,
    )

    r = permutation_test(docs).collect()[0]
    assert r["p_value"] > 0.05  # no real effect -> non-significant
