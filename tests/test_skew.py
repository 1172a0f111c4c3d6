"""Salted aggregation equals plain aggregation (semantics), including a
hot-key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.skew import (
    salted_agg,
    salted_collect_sorted,
    salted_distinct_count,
)


def _skewed_df(spark):
    # key 'hot' has 900 rows, others 10 each
    rows = [("hot", i, f"v{i % 37}") for i in range(900)]
    for k in range(10):
        rows += [(f"cold{k}", i, f"v{i}") for i in range(10)]
    return spark.createDataFrame(rows, "key string, n long, val string")


class TestSaltedAgg:
    def test_sum_count_match_plain(self, spark):
        df = _skewed_df(spark)
        plain = {
            r["key"]: (r["s"], r["c"])
            for r in df.groupBy("key").agg(F.sum("n").alias("s"), F.count("*").alias("c")).collect()
        }
        salted = {
            r["key"]: (r["s"], r["c"])
            for r in salted_agg(
                df,
                ["key"],
                lambda: [F.sum("n").alias("_s"), F.count("*").alias("_c")],
                lambda: [F.sum("_s").alias("s"), F.sum("_c").alias("c")],
            ).collect()
        }
        assert salted == plain

    def test_distinct_count_exact(self, spark):
        df = _skewed_df(spark)
        plain = {
            r["key"]: r["d"]
            for r in df.groupBy("key").agg(F.count_distinct("val").alias("d")).collect()
        }
        salted = {
            r["key"]: r["n_distinct"] for r in salted_distinct_count(df, ["key"], "val").collect()
        }
        assert salted == plain
        assert salted["hot"] == 37  # hot key's values partitioned, still exact

    def test_collect_sorted_matches_plain(self, spark):
        df = _skewed_df(spark).limit(0).union(_skewed_df(spark))  # stable input
        plain = {
            r["key"]: [tuple(m) for m in r["members"]]
            for r in df.groupBy("key")
            .agg(F.sort_array(F.collect_list(F.struct("n", "val"))).alias("members"))
            .collect()
        }
        salted = {
            r["key"]: [tuple(m) for m in r["members"]]
            for r in salted_collect_sorted(df, ["key"], ["n", "val"]).collect()
        }
        assert salted == plain
        n = {r["key"]: r["n_members"] for r in salted_collect_sorted(df, ["key"], ["n", "val"]).collect()}
        assert n["hot"] == 900
