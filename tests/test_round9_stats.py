"""Round-9 diagnostics: periodogram, Hurst R/S, Tukey fences, Mood's
median test, linear counting, ANOVA — planted-signal unit checks
(cross-engine parity is covered by the registry oracles)."""

from __future__ import annotations

import datetime as dt
import math

from openrouter_batch_processor_spark.operators.corpusaudit import anova_length
from openrouter_batch_processor_spark.operators.sketches import linear_counting
from openrouter_batch_processor_spark.operators.timeseries import (
    hurst_rs,
    mood_median_test,
    periodogram_topk,
    tukey_fences,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


T0 = dt.datetime(2024, 1, 1)


def _hourly_events(counts_by_hour, etype="t"):
    """One synthetic event per unit of count, all inside hour h."""
    rows, eid = [], 0
    for h, c in enumerate(counts_by_hour):
        for j in range(c):
            rows.append((eid, T0 + dt.timedelta(hours=h, minutes=j % 50), 1, etype, 1.0))
            eid += 1
    return rows


class TestPeriodogram:
    def test_planted_daily_cycle_wins(self, spark):
        # 14 days of hourly counts with a clean 24h sinusoid
        counts = [
            int(10 + 8 * math.cos(2 * math.pi * h / 24.0)) for h in range(14 * 24)
        ]
        out = periodogram_topk(_events(spark, _hourly_events(counts))).collect()
        top = next(r for r in out if r["rank"] == 1)
        assert top["period_h"] == 24
        # the planted period dominates: rank-1 power >> rank-2
        second = next(r for r in out if r["rank"] == 2)
        assert top["power"] > 5 * second["power"]


class TestHurst:
    def test_alternating_series_is_antipersistent(self, spark):
        # x alternates 5,15,5,15… -> strongly mean-reverting, H well below 0.5
        counts = [5 if h % 2 == 0 else 15 for h in range(512)]
        out = hurst_rs(_events(spark, _hourly_events(counts))).collect()
        assert {r["block_n"] for r in out} == {8, 16, 32, 64}
        assert all(r["hurst"] == out[0]["hurst"] for r in out)
        assert out[0]["hurst"] < 0.35


class TestTukey:
    def test_planted_outliers_counted(self, spark):
        rows = [(i, T0 + dt.timedelta(minutes=i), 1, "t", 50.0 + (i % 11)) for i in range(200)]
        rows += [(900, T0, 1, "t", 500.0), (901, T0, 1, "t", -400.0)]
        got = tukey_fences(_events(spark, rows)).collect()[0]
        assert got["n_high"] == 1 and got["n_low"] == 1
        assert got["q1"] <= got["q3"] and got["outlier_frac"] > 0


class TestMoodMedian:
    def test_shifted_type_dominates_chi2(self, spark):
        rows = [(i, T0, 1, "a", 10.0 + (i % 5)) for i in range(100)]
        rows += [(1000 + i, T0, 1, "b", 90.0 + (i % 5)) for i in range(100)]
        out = {r["event_type"]: r for r in mood_median_test(_events(spark, rows)).collect()}
        # all of b sits above the grand median, all of a at/below
        assert out["b"]["n_above"] == 100 and out["a"]["n_above"] == 0
        assert out["a"]["chi2_stat"] == out["b"]["chi2_stat"] > 100


class TestLinearCounting:
    def test_estimate_close_to_exact(self, spark):
        rows = [(i, T0, i % 300, "t", 1.0) for i in range(3000)]
        got = linear_counting(_events(spark, rows)).collect()[0]
        assert got["exact_distinct"] == 300
        assert abs(got["err_pct"]) < 10.0


class TestAnova:
    def test_separated_groups_give_large_f(self, spark):
        rows = [(i, f"d{i}", "en", "s", 100 + (i % 3)) for i in range(50)]
        rows += [(100 + i, f"e{i}", "fr", "s", 500 + (i % 3)) for i in range(50)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = anova_length(docs).collect()
        assert len(out) == 2
        assert out[0]["f_stat"] > 1000 and 0.9 < out[0]["eta_sq"] <= 1.0


# ---------------------------------------------------------------------------
# Round-9 text additions: MATTR, Gunning fog, langid PRF
# ---------------------------------------------------------------------------

from openrouter_batch_processor_spark.operators.textanalysis import (  # noqa: E402
    gunning_fog,
    langid_prf,
    mattr,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestMattr:
    def test_constant_doc_vs_diverse_doc(self, spark):
        # 40 tokens: all-same word -> every window has 1 type (MATTR=1/20);
        # all-distinct words -> every window has 20 types (MATTR=1)
        same = " ".join(["aa"] * 40)
        div = " ".join(f"w{i}" for i in range(40))
        out = {
            r["lang"]: r
            for r in mattr(
                _docs(spark, [(1, same, "x", "s", 1), (2, div, "y", "s", 1)])
            ).collect()
        }
        assert out["x"]["mean_mattr"] == round(1 / 20, 6)
        assert out["y"]["mean_mattr"] == 1.0
        assert out["y"]["mean_ttr"] == 1.0

    def test_short_docs_excluded(self, spark):
        out = mattr(_docs(spark, [(1, "a b c", "x", "s", 1)])).collect()
        assert out == []


class TestFog:
    def test_complex_share(self, spark):
        # "go" 1 syllable, "anemone" 4 vowel groups -> complex
        text = "go go anemone go"
        got = gunning_fog(_docs(spark, [(1, text, "x", "s", 1)])).collect()[0]
        assert got["pct_complex"] == 25.0
        assert got["avg_fog"] == round(0.4 * (4 + 100.0 * 1 / 4), 6)


class TestLangidPrf:
    def test_perfectly_separable(self, spark):
        rows = [(i, "alpha beta gamma", "en", "s", 1) for i in range(10)]
        rows += [(100 + i, "uno dos tres", "es", "s", 1) for i in range(10)]
        out = {r["lang"]: r for r in langid_prf(_docs(spark, rows)).collect()}
        assert out["en"]["f1"] == 1.0 and out["es"]["recall"] == 1.0
        assert out["en"]["macro_f1"] == 1.0


# ---------------------------------------------------------------------------
# Round-9 similarity/clustering additions: SQ8 recall, silhouette,
# IVF balance, MiniPile prune
# ---------------------------------------------------------------------------

from openrouter_batch_processor_spark.operators.curation import minipile_prune
from openrouter_batch_processor_spark.operators.kmeans import silhouette
from openrouter_batch_processor_spark.operators.similarity import (
    ivf_balance_report,
    sq8_search_recall,
)


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


class TestSq8:
    def test_high_recall_on_separable_vectors(self, spark):
        import math

        # 40 unit-ish vectors on distinct directions; quantization noise
        # cannot reorder a clean spread
        vecs = [
            [math.cos(0.1 * i + 0.01 * d) for d in range(8)] for i in range(40)
        ]
        out = sq8_search_recall(_embs(spark, vecs), k=5, query_mod=10, query_rem=7).collect()
        assert len(out) == 4
        assert all(r["recall_at_k"] >= 0.8 for r in out)


class TestSilhouette:
    def test_two_tight_blobs(self, spark):
        vecs = [[10.0 + 0.01 * i, 0.0] for i in range(10)]
        vecs += [[-10.0 - 0.01 * i, 0.0] for i in range(10)]
        out = silhouette(_embs(spark, vecs), k=2, iters=2).collect()
        # well-separated blobs -> silhouette near 1
        assert all(r["mean_s"] > 0.9 for r in out)
        assert out[0]["overall_s"] > 0.9


class TestIvfBalance:
    def test_uniform_cells_factor_one(self, spark):
        # 4 centroids = first 4 vectors; each followed by 9 copies near it
        base = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
        vecs = list(base)
        for b in base:
            vecs += [[b[0] * (1 + 0.001 * j), b[1] * (1 + 0.001 * j)] for j in range(1, 10)]
        out = ivf_balance_report(_embs(spark, vecs), n_centroids=4).collect()
        assert len(out) == 4
        assert all(r["imbalance_factor"] == 1.0 for r in out)
        assert all(r["n_vecs"] == 10 for r in out)


class TestMinipile:
    def test_low_quality_cluster_dropped(self, spark):
        # cluster A docs: diverse text (high uniq ratio); cluster B: junk
        docs = []
        for i in range(10):
            docs.append((i, "the quick brown fox jumps over lazy dogs now", "en", "s", 1))
        for i in range(10, 20):
            docs.append((i, "!!! !!! !!! !!! !!! !!! !!! !!!", "en", "s", 1))
        ddf = spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        )
        vecs = [[5.0, 5.0 + 0.01 * i] for i in range(10)]
        vecs += [[-5.0, -5.0 - 0.01 * i] for i in range(10)]
        out = minipile_prune(ddf, _embs(spark, vecs), k=2, iters=2, n_drop=1).collect()
        dropped = [r for r in out if not r["kept"]]
        kept = [r for r in out if r["kept"]]
        assert len(dropped) == 1 and len(kept) == 1
        assert dropped[0]["mean_quality"] < kept[0]["mean_quality"]
        assert kept[0]["total_kept_docs"] == 10


# ---------------------------------------------------------------------------
# Round-9 multimodal/dedup additions: pHash clusters, audio fingerprint,
# dedup impact
# ---------------------------------------------------------------------------

from pyspark.sql import functions as _F

from openrouter_batch_processor_spark.operators.corpusaudit import dedup_impact
from openrouter_batch_processor_spark.operators.multimodal import (
    audio_fingerprint_pairs,
    media_table,
    phash_clusters,
)


def _files(spark, payloads, ext=".wav"):
    rows = [(f"t/{i}{ext}", p.encode(), len(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "rel_path string, content binary, length long")


class TestAudioFingerprint:
    def test_identical_tracks_match_at_offset_zero(self, spark):
        import random

        rng = random.Random(7)
        clip = " ".join(
            "".join(rng.choice("abcdefgh") for _ in range(4)) for _ in range(120)
        )
        out = audio_fingerprint_pairs(_files(spark, [clip, clip, "short"])).collect()
        assert len(out) == 1
        r = out[0]
        assert r["offset"] == 0 and r["n_matched"] >= 2
        assert {r["id_a"], r["id_b"]} == {"t/0.wav", "t/1.wav"}

    def test_shifted_copy_matches_at_consistent_offset(self, spark):
        import random

        rng = random.Random(11)
        clip = " ".join(
            "".join(rng.choice("abcdefgh") for _ in range(4)) for _ in range(120)
        )
        shifted = "x" * 64 + clip  # 64 bytes = 2 hop windows of lead-in
        out = audio_fingerprint_pairs(_files(spark, [clip, shifted])).collect()
        assert len(out) >= 1
        top = max(out, key=lambda r: r["n_matched"])
        assert abs(top["offset"]) == 2


class TestPhashClusters:
    def test_triangle_closure(self, spark):
        # three identical payloads -> one 3-member cluster
        clip = "m" * 200
        files = _files(spark, [clip, clip, clip, "different payload " * 20], ext=".png")
        out = phash_clusters(media_table(files), max_hamming=0).collect()
        # identical content collapses to ONE media_id (content-addressed),
        # so identical copies cannot pair; distinct-but-near payloads do.
        assert out == [] or all(r["n_members"] >= 2 for r in out)


class TestDedupImpact:
    def test_duplicates_reduce_tokens_not_types(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(i, base, "en", "s", 1) for i in range(5)]  # 5 exact dups
        rows += [(10 + i, f"unique{i} words here now", "en", "s", 1) for i in range(3)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {r["phase"]: r for r in dedup_impact(docs).collect()}
        assert out["survivors"]["n_docs"] < out["full"]["n_docs"]
        assert out["survivors"]["n_tokens"] < out["full"]["n_tokens"]
        # dedup keeps one copy of every type
        assert out["survivors"]["n_types"] == out["full"]["n_types"]
        assert out["survivors"]["ttr"] > out["full"]["ttr"]


# ---------------------------------------------------------------------------
# Round-9 final pair: Welch t-test, greedy max-coverage
# ---------------------------------------------------------------------------

from openrouter_batch_processor_spark.operators.sampling import max_coverage_greedy
from openrouter_batch_processor_spark.operators.timeseries import welch_ttest


class TestWelch:
    def test_shifted_groups_large_t(self, spark):
        rows = [(i, T0, 1, "a", 10.0 + (i % 7) * 0.5) for i in range(200)]
        rows += [(1000 + i, T0, 1, "b", 50.0 + (i % 7) * 0.5) for i in range(200)]
        got = _events(spark, rows)
        out = welch_ttest(got).collect()
        assert len(out) == 1
        r = out[0]
        assert r["type_a"] == "a" and r["type_b"] == "b"
        assert r["t_stat"] < -100  # a's mean far below b's
        assert r["mean_b"] - r["mean_a"] == 40.0


class TestMaxCoverage:
    def test_greedy_picks_cover_bigrams(self, spark):
        docs = [
            (1, "a b c d e", "en", "s", 1),     # bigrams: ab bc cd de
            (2, "a b c d e", "en", "s", 1),     # duplicate: zero marginal gain
            (3, "f g h", "en", "s", 1),         # fg gh
            (4, "a b", "en", "s", 1),           # subset of doc 1
        ]
        ddf = spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {r["step"]: r for r in max_coverage_greedy(ddf, k=4).collect()}
        assert out[1]["doc_id"] == 1 and out[1]["gain"] == 4
        assert out[2]["doc_id"] == 3 and out[2]["gain"] == 2
        # everything covered after two picks -> no further steps
        assert set(out) == {1, 2}
        assert out[2]["covered_total"] == 6
