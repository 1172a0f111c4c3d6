"""Targeted unit tests for the round-8 operators — synthetic fixtures
with hand-computable answers, complementing the registry's DuckDB
oracle checks (which prove cross-engine parity, not intent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en", "src0"),
        (1, "the cat sat on the mat", "en", "src0"),
        (2, "a dog ran over a hill", "en", "src1"),
        (3, "le chat est noir", "fr", "src1"),
        (4, "le chien est blanc", "fr", "src2"),
        (5, "one two three four five six", "en", "src2"),
        (8, "the cat sat on the mat again today", "en", "src0"),
        (9, "completely novel held out words here", "en", "src1"),
    ]
    return spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestBpeEncode:
    def test_encode_matches_merge_rules(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            bpe_encode,
            bpe_merges,
        )

        docs = spark.createDataFrame(
            [(0, "aaab aaab"), (1, "aaab ab")],
            "doc_id long, text string",
        )
        merges = {
            (r["merge_rank"]): (r["sym_a"], r["sym_b"])
            for r in bpe_merges(docs, rounds=2).collect()
        }
        # 'aa' is the most frequent adjacent pair (freq-weighted)
        assert merges[1] == ("a", "a")
        enc = {r["doc_id"]: r for r in bpe_encode(docs, rounds=2).collect()}
        # every doc is covered and token counts shrink vs characters
        assert set(enc) == {0, 1}
        for r in enc.values():
            assert r["n_tokens"] < sum(len(w) for w in r["encoded"].split(" "))
            assert r["n_tokens"] == sum(
                len(w.split("+")) for w in r["encoded"].split(" ")
            )

    def test_packing_uses_subword_counts(self, spark):
        from openrouter_batch_processor_spark.operators.chunking import (
            pack_documents_bpe,
        )
        from openrouter_batch_processor_spark.operators.textanalysis import (
            bpe_encode,
        )

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta") for i in range(6)],
            "doc_id long, text string",
        )
        enc = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs).collect()}
        packed = {
            r["doc_id"]: r for r in pack_documents_bpe(docs, capacity=10).collect()
        }
        running = 0
        for i in range(6):
            assert packed[i]["n_tokens"] == enc[i]
            assert packed[i]["start_offset"] == running
            assert packed[i]["bin_id"] == running // 10
            running += enc[i]


class TestDriftDetectors:
    def test_page_hinkley_flags_level_shift(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            page_hinkley,
        )

        # 20 quiet points then 10 elevated ones: the PH max must land
        # at the END of the elevated run (cumulative excess peaks there)
        rows = []
        for i in range(30):
            v = 1.0 if i < 20 else 11.0
            rows.append((i, f"2024-01-{(i % 27) + 1:02d} 00:00:{i % 60:02d}", 1, "a", v))
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = page_hinkley(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r["alarm_index"] == 30  # cumulative excess peaks at the last row
        assert r["max_ph"] > 0

    def test_theil_sen_recovers_clean_slope(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            theil_sen_trend,
        )

        # daily counts 10,12,14,...: slope exactly 2/day; one outlier
        # day (count 100) must NOT drag the median slope
        rows = []
        eid = 0
        for d in range(10):
            n = 100 if d == 5 else 10 + 2 * d
            for _ in range(n):
                rows.append((eid, f"2024-01-{d + 1:02d} 12:00:00", 1, "a", 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = theil_sen_trend(df).collect()
        assert len(out) == 1
        assert abs(out[0]["sen_slope"] - 2.0) < 0.75  # robust to the outlier


class TestKCenter:
    def test_farthest_point_order_and_radius_monotone(self, spark):
        from openrouter_batch_processor_spark.operators.sampling import (
            kcenter_greedy,
        )

        # three tight clusters far apart + the seed: greedy must visit
        # a new cluster each round before refining
        def vec(base, eps):
            return [float(base)] + [eps] * 63

        rows = [
            (0, vec(0.0, 0.0)),
            (1, vec(0.0, 0.01)),
            (10, vec(100.0, 0.0)),
            (11, vec(100.0, 0.01)),
            (20, vec(-100.0, 0.0)),
            (21, vec(-100.0, 0.01)),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = sorted(
            kcenter_greedy(df, k=4).collect(), key=lambda r: r["rank"]
        )
        assert out[0]["center_id"] == 0 and out[0]["radius"] == 0.0
        # rounds 1 and 2 pick one point from each far cluster
        assert {out[1]["center_id"], out[2]["center_id"]} == {10, 20} or {
            out[1]["center_id"],
            out[2]["center_id"],
        } == {11, 21}
        radii = [r["radius"] for r in out[1:]]
        assert radii == sorted(radii, reverse=True)
        # after all clusters are covered the radius collapses to the
        # intra-cluster scale
        assert radii[-1] < 1.0


class TestAudits:
    def test_ngram_novelty_bounds_and_planted_novel_doc(self, spark, tiny_docs):
        from openrouter_batch_processor_spark.operators.corpusaudit import (
            ngram_novelty,
        )

        out = {r["lang"]: r for r in ngram_novelty(tiny_docs).collect()}
        # doc 9 (val split) is entirely novel text; doc 8 overlaps doc 0
        en = out["en"]
        assert 0.0 < en["novelty"] <= 1.0
        assert en["n_novel"] >= 3  # the planted novel doc's trigrams
        assert en["n_novel"] < en["n_val_ngrams"]  # doc 8's overlap seen

    def test_temperature_mix_flattens_and_normalizes(self, spark, tiny_docs):
        from openrouter_batch_processor_spark.operators.curation import (
            temperature_mixture,
        )

        out = {r["lang"]: r for r in temperature_mixture(tiny_docs).collect()}
        assert abs(sum(r["p_temp"] for r in out.values()) - 1.0) < 1e-4
        # α<1 upsamples the minority language, downsamples the majority
        assert out["fr"]["upsample"] > 1.0 > out["en"]["upsample"]

    def test_simpson_diversity_degenerate_source(self, spark):
        from openrouter_batch_processor_spark.operators.corpusaudit import (
            simpson_diversity,
        )

        docs = spark.createDataFrame(
            [
                (0, "x x x x x x", "s_flat"),
                (1, "a b c d e f", "s_rich"),
            ],
            "doc_id long, text string, source string",
        )
        out = {r["source"]: r for r in simpson_diversity(docs).collect()}
        assert out["s_flat"]["simpson_d"] == 0.0  # all same token
        assert out["s_rich"]["simpson_d"] == 1.0  # all distinct
        assert out["s_rich"]["evenness"] == pytest.approx(1.0, abs=1e-6)


class TestScaleDials:
    def test_simhash_bucket_cap_prunes_saturated_buckets(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            simhash_near_pairs,
        )

        # 60 near-identical template docs saturate their band buckets;
        # 2 unrelated docs do not
        rows = [(i, f"the common template body shared everywhere {i % 3}") for i in range(60)]
        rows += [(100, "totally different words one"), (101, "other unrelated text two")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        uncapped = simhash_near_pairs(docs).count()
        capped = simhash_near_pairs(docs, bucket_cap=10).count()
        assert uncapped > 100  # the template cluster squares
        assert capped < uncapped  # the dial actually prunes
