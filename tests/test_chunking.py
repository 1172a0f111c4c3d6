"""Chunking and stream-packing semantics on hand-checked corpora."""

from __future__ import annotations

import pytest

from openrouter_batch_processor_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        rows = chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=4, overlap=2
        ).collect()
        got = {r["chunk_id"]: (r["chunk_text"], r["n_chunk_tokens"]) for r in rows}
        # stride 2: starts 0,2,4,6,8
        assert got[0] == ("t0 t1 t2 t3", 4)
        assert got[1] == ("t2 t3 t4 t5", 4)
        assert got[4] == ("t8 t9", 2)  # final short chunk
        assert len(got) == 5

    def test_short_and_empty_docs(self, spark):
        rows = chunk_documents(
            _docs(spark, [(1, "only three tokens"), (2, ""), (3, "   ")]),
            chunk_tokens=10,
            overlap=2,
        ).collect()
        assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [
            (1, "only three tokens")
        ]

    def test_rejects_bad_overlap(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=5, overlap=5)


class TestPackDocuments:
    def test_offsets_and_bins(self, spark):
        docs = _docs(
            spark,
            [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "")],
        )
        rows = {r["doc_id"]: r for r in pack_documents(docs, capacity=4).collect()}
        assert (rows[1]["start_offset"], rows[1]["bin_id"], rows[1]["offset_in_bin"]) == (0, 0, 0)
        assert (rows[2]["start_offset"], rows[2]["bin_id"]) == (3, 0)
        assert (rows[3]["start_offset"], rows[3]["bin_id"], rows[3]["offset_in_bin"]) == (5, 1, 1)
        assert rows[4]["n_tokens"] == 0 and rows[4]["start_offset"] == 9

    def test_partitioning_invariant(self, spark):
        docs = _docs(spark, [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(100)])
        r1 = sorted(map(tuple, pack_documents(docs.coalesce(1), capacity=16).collect()))
        r8 = sorted(
            map(tuple, pack_documents(docs.repartition(8), capacity=16, num_partitions=8).collect())
        )
        assert r1 == r8


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

TOKEN_LISTS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=40
)


class TestChunkingProperties:
    @settings(max_examples=10, deadline=None)
    @given(toks=TOKEN_LISTS, chunk=st.integers(2, 8), overlap=st.integers(0, 4))
    def test_cover_count_and_reconstruction(self, spark, toks, chunk, overlap):
        if overlap >= chunk:
            overlap = chunk - 1
        stride = chunk - overlap
        df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
            key=lambda r: r["chunk_id"],
        )
        n = len(toks)
        # chunk count formula
        assert len(rows) == (n + stride - 1) // stride
        # zero-overlap chunks reconstruct the doc exactly
        if overlap == 0:
            assert " ".join(r["chunk_text"] for r in rows) == " ".join(toks)
        # every chunk matches its slice of the token list
        for r in rows:
            start = r["chunk_id"] * stride
            assert r["chunk_text"] == " ".join(toks[start : start + chunk])


class TestSessionPaths:
    def test_path_order_and_topn(self, spark):
        import datetime as dt

        from openrouter_batch_processor_spark.operators.windows import session_paths

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        s = dt.timedelta(seconds=1)
        gap = dt.timedelta(hours=2)
        rows = [
            # u1 session 1: view>click>purchase (+ a 4th event beyond depth)
            (1, 1, t0, "view"), (2, 1, t0 + s, "click"),
            (3, 1, t0 + 2 * s, "purchase"), (4, 1, t0 + 3 * s, "error"),
            # u1 session 2 (after gap): view>click
            (5, 1, t0 + gap, "view"), (6, 1, t0 + gap + s, "click"),
            # u2: same opening as u1 session 1
            (7, 2, t0, "view"), (8, 2, t0 + s, "click"), (9, 2, t0 + 2 * s, "purchase"),
            # tie on ts within u3: event_id breaks it -> a>b not b>a
            (11, 3, t0, "a_first"), (12, 3, t0, "b_second"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = {r["path"]: r["n_sessions"] for r in session_paths(df, depth=3).collect()}
        assert out["view>click>purchase"] == 2
        assert out["view>click"] == 1
        assert out["a_first>b_second"] == 1


def test_packing_frontier_exact_counts(spark):
    from pyspark.sql import Row

    from openrouter_batch_processor_spark.operators.chunking import (
        packing_frontier,
    )

    # doc lengths 3,4,5 tokens -> stream offsets 0,3,7 (total 12)
    docs = spark.createDataFrame(
        [
            Row(doc_id="a", text="t1 t2 t3"),
            Row(doc_id="b", text="t1 t2 t3 t4"),
            Row(doc_id="c", text="t1 t2 t3 t4 t5"),
        ]
    )
    out = {r["capacity"]: r for r in packing_frontier(docs, (4, 8)).collect()}
    # L=4: windows [0,4) [4,8) [8,12); doc a [0,3) fits, b [3,7) straddles,
    # c [7,12) straddles
    assert out[4]["n_bins"] == 3
    assert out[4]["n_straddling"] == 2
    assert out[4]["padding_frac"] == 0.0
    # L=8: windows [0,8) [8,16); a,b fit, c [7,12) straddles; tail pad 4/16
    assert out[8]["n_bins"] == 2
    assert out[8]["n_straddling"] == 1
    assert out[8]["padding_frac"] == 0.25
