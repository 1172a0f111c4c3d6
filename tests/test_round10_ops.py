"""Round-10 operators: cross-document suffix dedup (Lee et al. §4,
cross_doc_only) and the RETSim-style hashed-trigram embedding fallback.
"""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.curation import (
    remove_duplicate_spans,
)
from openrouter_batch_processor_spark.operators.dedup import (
    retsim_style_pairs,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], SCHEMA
    )


class TestCrossDocSuffix:
    def test_within_doc_repeat_survives_cross_doc_mode(self, spark):
        chorus = "la li lu le lo ra ri ru"  # 8 tokens, repeated in ONE doc
        docs = _docs(
            spark,
            [
                (1, f"alpha {chorus} beta {chorus} gamma"),
                (2, "totally unrelated words only here now dear friend yes"),
            ],
        )
        both = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(docs, window_tokens=8).collect()
        }
        cross = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(
                docs, window_tokens=8, cross_doc_only=True
            ).collect()
        }
        # default mode edits the within-doc repeat; cross-doc mode does not
        assert both[1]["n_removed"] > 0
        assert cross[1]["n_removed"] == 0
        assert cross[2]["n_removed"] == 0

    def test_cross_doc_window_removed_keep_first(self, spark):
        shared = "one two three four five six seven eight"  # 8 tokens
        docs = _docs(
            spark,
            [
                (1, f"{shared} tail words here"),
                (2, f"prefix words {shared} more"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(
                docs, window_tokens=8, cross_doc_only=True
            ).collect()
        }
        # doc 1 holds the lexicographically-first occurrence -> survives
        assert out[1]["n_removed"] == 0
        assert out[2]["n_removed"] == 8
        assert "three four five" not in out[2]["cleaned_text"]
        assert out[2]["cleaned_text"].startswith("prefix words")


class TestRetsimPairs:
    # long enough that every 16-bucket band carries real trigram mass:
    # a one-word edit then leaves all four sign-band keys intact (short
    # fragments are the MinHash tier's regime, not the fallback's)
    BASE = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet meadow near the old stone bridge "
        "and the river keeps moving slowly past the village where the "
        "children play every afternoon until the golden light fades "
        "behind the hills and the farmers return home along the dusty "
        "road carrying baskets of apples and pears from the orchard"
    )

    def test_near_duplicate_found_exact_excluded(self, spark):
        docs = _docs(
            spark,
            [
                (1, self.BASE),
                (2, self.BASE.replace("stone", "wooden")),  # near-dup
                (3, self.BASE),  # EXACT dup of 1 -> excluded
                (4, "completely different content about spark query engines "
                    "and distributed columnar execution at petabyte scale"),
            ],
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in retsim_style_pairs(docs, tau=0.9).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] >= 0.9
        assert (1, 3) not in pairs  # exact tier, not the fallback's job
        assert not any(4 in p for p in pairs)

    def test_cosine_symmetric_bounds(self, spark):
        docs = _docs(spark, [(1, self.BASE), (2, self.BASE + " extra token")])
        rows = retsim_style_pairs(docs, tau=0.0).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert 0.9 <= r["cosine"] <= 1.0

    def test_bucket_cap_prunes_saturated_bands(self, spark):
        # every doc shares one band bucket via identical text prefix;
        # cap=1 prunes those buckets, killing candidates that ONLY
        # collide there
        docs = _docs(
            spark,
            [(i, self.BASE) for i in range(1, 5)],
        )
        uncapped = retsim_style_pairs(docs, tau=0.0).collect()
        capped = retsim_style_pairs(docs, tau=0.0, bucket_cap=1).collect()
        # identical docs are exact dups -> excluded either way, but the
        # capped run must also produce no CANDIDATES (all buckets hot)
        assert uncapped == [] and capped == []


class TestClusterQuota:
    def test_quota_per_cluster_and_determinism(self, spark):
        from openrouter_batch_processor_spark.operators.sampling import (
            cluster_quota_sample,
        )

        embs = spark.createDataFrame(
            [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(1, 41)],
            "vec_id long, embedding array<float>",
        )
        out = cluster_quota_sample(embs, k=4, iters=1, quota=3).collect()
        by_cluster: dict = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        assert all(len(v) <= 3 for v in by_cluster.values())
        assert all(
            sorted(r["pick_rank"] for r in v) == list(range(1, len(v) + 1))
            for v in by_cluster.values()
        )
        # deterministic: a second run picks the identical subset
        again = cluster_quota_sample(embs, k=4, iters=1, quota=3).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        # cluster_size counts ALL members, not just picked ones
        assert sum(v[0]["cluster_size"] for v in by_cluster.values()) == 40


class TestRrfFusion:
    def test_multi_signal_pairs_rank_fusion(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            rrf_fusion_pairs,
        )

        base = TestRetsimPairs.BASE
        docs = _docs(
            spark,
            [
                (1, base),
                (2, base.replace("stone", "wooden")),  # caught by all tiers
                (3, "entirely different text about columnar engines and "
                    "shuffle hash joins in distributed query execution"),
            ],
        )
        rows = rrf_fusion_pairs(docs, tau=0.9).collect()
        fused = {(r["id_a"], r["id_b"]): r for r in rows}
        assert (1, 2) in fused
        r = fused[(1, 2)]
        assert r["n_signals"] >= 2
        # every present signal ranks the pair first -> rrf ~ n/(60+1)
        assert abs(r["rrf"] - r["n_signals"] / 61.0) < 1e-6
        assert not any(3 in p for p in fused)
