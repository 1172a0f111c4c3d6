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
