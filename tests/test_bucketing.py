"""Bucketed co-located join: bucketBy on the join key eliminates both
shuffles from a repeated join — the pre-partitioning strategy for joins
run many times at 100 TB (SURVEY §7 'reuse a partitioning across
stages')."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


class TestBucketedJoin:
    def test_bucketing_eliminates_join_exchanges(self, spark, tmp_path):
        # warehouse.dir is a static conf — tables land in the default
        # spark-warehouse and are dropped in the finally block
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try:
            facts = spark.range(0, 10_000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            dims = spark.range(0, 1_000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
            )
            facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(
                "bt_facts"
            )
            dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(
                "bt_dims"
            )
            joined = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
            plan = _plan(joined)
            assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
            # same join without bucketing shuffles both sides
            plain = facts.join(dims, "k")
            assert "Exchange hashpartitioning" in _plan(plain)
            # and the result is right
            assert joined.count() == 1_000
        finally:
            spark.sql("DROP TABLE IF EXISTS bt_facts")
            spark.sql("DROP TABLE IF EXISTS bt_dims")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
