"""W1/K5 renumbering: width, ordering, and small==distributed parity."""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.renumber import renumber, renumber_small


def _df(spark, n=25, token="000000001"):
    rows = [(f"g{i:04d}", f"rec {token} of group g{i:04d}") for i in range(n)]
    return spark.createDataFrame(rows, ["group_id", "output"])


class TestRenumber:
    def test_small_variant_sequence_and_width(self, spark):
        out = renumber_small(_df(spark), "group_id").orderBy("group_id").collect()
        for idx, row in enumerate(out, start=1):
            assert row["seq"] == f"{idx:09d}"
            assert f"rec {idx:09d} of" in row["output"]

    def test_distributed_matches_small(self, spark):
        df = _df(spark, n=100)
        small = {r["group_id"]: r["output"] for r in renumber_small(df, "group_id").collect()}
        dist = {r["group_id"]: r["output"] for r in renumber(df, "group_id", num_partitions=7).collect()}
        assert dist == small

    def test_custom_token_width(self, spark):
        df = _df(spark, n=3, token="0001")
        out = renumber_small(df, "group_id", token="0001").orderBy("group_id").collect()
        assert [r["seq"] for r in out] == ["0001", "0002", "0003"]

    def test_rows_without_token_untouched(self, spark):
        df = spark.createDataFrame(
            [("a", "no token here"), ("b", "has 000000001")], ["group_id", "output"]
        )
        out = {r["group_id"]: r["output"] for r in renumber_small(df, "group_id").collect()}
        assert out["a"] == "no token here"
        assert out["b"] == "has 000000002"
