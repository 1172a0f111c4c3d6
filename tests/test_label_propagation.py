"""Synchronous LPA: bridged cliques stay separate communities (the
property CC cannot give), deterministic tie-breaks."""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.dedup import (
    label_propagation_edges,
)


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_bridged_cliques_stay_two_communities(spark):
    # two 4-cliques {0..3}, {10..13} joined by a single bridge 3-10:
    # CC merges them; 2-round LPA keeps two majority communities
    clique = lambda base: [  # noqa: E731
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    edges = _sym(spark, clique(0) + clique(10) + [(3, 10)])
    got = {r["node"]: r["community"] for r in label_propagation_edges(edges).collect()}
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_clique_converges_to_min_label(spark):
    edges = _sym(spark, [(i, j) for i in range(5) for j in range(i + 1, 5)])
    rows = label_propagation_edges(edges).collect()
    assert {r["community"] for r in rows} == {0}
    assert all(r["community_size"] == 5 for r in rows)


def test_sizes_sum_to_nodes(spark):
    edges = _sym(spark, [(1, 2), (2, 3), (4, 5)])
    rows = label_propagation_edges(edges).collect()
    assert len(rows) == 5
    from collections import Counter

    comm = Counter(r["community"] for r in rows)
    for r in rows:
        assert r["community_size"] == comm[r["community"]]
