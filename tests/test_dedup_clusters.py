"""Connected-components cluster resolution: transitive closure over
candidate pairs, canonical = min id, convergence on chains (the case
banded-LSH near-cliques never exercise)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.dedup import (
    connected_components,
    duplicate_clusters,
)


class TestConnectedComponents:
    def test_chain_collapses_to_one_cluster(self, spark):
        # path graph 1-2-3-4-5: diameter 4, forces multiple propagation rounds
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
        )
        got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}

    def test_separate_components_keep_separate_labels(self, spark):
        pairs = spark.createDataFrame(
            [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)], ["id_a", "id_b"]
        )
        got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}

    def test_label_direction_agnostic(self, spark):
        # min id on the "b" side: label still propagates to the minimum
        pairs = spark.createDataFrame([(5, 1), (5, 9)], ["id_a", "id_b"])
        got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
        assert got == {1: 1, 5: 1, 9: 1}


class TestDuplicateClusters:
    def test_near_dup_docs_cluster_with_sizes(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " extra"),  # near-dup of 1
                (3, base.replace("quick", "quack")),  # near-dup of 1
                (4, "completely different text about spark engines at scale"),
            ],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in duplicate_clusters(docs).collect()}
        # doc 4 shares no LSH band with anything -> not emitted
        assert 4 not in rows
        assert {r["cluster_id"] for r in rows.values()} == {1}
        sizes = {r["cluster_size"] for r in rows.values()}
        assert sizes == {len(rows)}
        assert set(rows) >= {1, 2}


class TestPrefixFilterPairs:
    def test_rare_shingle_recall_and_common_pruning(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import prefix_filter_pairs

        common = "alpha beta gamma delta epsilon zeta"
        docs = spark.createDataFrame(
            [
                # 1 & 2: near-identical -> share RARE shingles -> found
                (1, common + " unique marker here"),
                (2, common + " unique marker here extra"),
                # 3: shares only the common prefix with everyone
                (3, common + " totally different tail words"),
                # 4-20: make the common shingles exceed max_df
                *[(i, common + f" filler{i} fill{i} f{i}") for i in range(4, 21)],
            ],
            "doc_id long, text string",
        )
        pairs = prefix_filter_pairs(docs, max_df=10, threshold=0.3).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found
        # doc 3 shares only >max_df shingles -> never a candidate at 0.3
        assert all(3 not in p for p in found)


class TestPagerankLite:
    def test_hub_outranks_leaves(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import pagerank_lite

        # star of near-identical docs around doc 1 (all share its text),
        # plus an isolated pair far away in content
        base = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " two"),
                (3, base + " three"),
                (4, base + " four"),
                (10, "wholly different text entirely separate tokens"),
                (11, "wholly different text entirely separate tokens plus"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["pagerank"] for r in pagerank_lite(docs).collect()}
        assert set(out) >= {1, 2, 3, 4}
        # the hub accumulates rank from every leaf
        assert out[1] > out[2]
        assert abs(out[2] - out[3]) < 1e-9  # symmetric leaves tie


class TestTriangleParticipation:
    def test_clique_vs_pair(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            triangle_participation,
        )

        # 3-clique of near-identical docs; a similar PAIR has edges but
        # can't close a triangle and must not appear
        base = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " two"),
                (3, base + " three"),
                (10, "wholly different text entirely separate tokens"),
                (11, "wholly different text entirely separate tokens plus"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r.n_triangles for r in triangle_participation(docs).collect()}
        assert rows == {1: 1, 2: 1, 3: 1}


class TestAdversarialChain:
    def test_long_chain_converges_in_log_rounds(self, spark):
        """An 80-node path graph has diameter 79 — one-hop-per-round
        propagation would silently exceed max_iter; pointer doubling
        must converge it (all labels = 0) well inside 25 rounds."""
        from openrouter_batch_processor_spark.operators.dedup import (
            connected_components,
        )

        n = 80
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        rows = connected_components(pairs).collect()
        assert len(rows) == n
        assert {r["cluster_id"] for r in rows} == {0}


def test_cc_raises_on_exhausted_iterations(spark):
    """Loop exhaustion must be LOUD (VERDICT r03 item 6): a 64-node
    chain cannot converge in 1 round, and silently returning
    unconverged labels would corrupt every downstream keep-policy."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1).collect()
