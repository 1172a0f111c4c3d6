"""CDC snapshot diff + incremental aggregate maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.cdc import (
    incremental_agg_maintenance,
    snapshot_diff,
)


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "fr", 30), (4, "fr", 40)],
        "id long, lang string, n long",
    )
    # 2 removed; 3 changes value; 4 migrates group fr->de; 5 added
    new = spark.createDataFrame(
        [(1, "en", 10), (3, "fr", 35), (4, "de", 40), (5, "en", 50)],
        "id long, lang string, n long",
    )
    return old, new


class TestSnapshotDiff:
    def test_change_types(self, snapshots):
        old, new = snapshots
        out = {
            r["id"]: r["change_type"]
            for r in snapshot_diff(old, new, ["id"], ["lang", "n"]).collect()
        }
        assert out == {2: "removed", 3: "changed", 4: "changed", 5: "added"}

    def test_unchanged_keys_absent(self, snapshots):
        old, new = snapshots
        ids = [r["id"] for r in snapshot_diff(old, new, ["id"], ["lang", "n"]).collect()]
        assert 1 not in ids


class TestIncrementalRollup:
    def test_matches_direct_aggregate(self, snapshots):
        old, new = snapshots
        maintained = incremental_agg_maintenance(
            old, new, key_cols=["id"], group_cols=["lang"], value_col="n"
        )
        direct = new.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("n").cast("long")).alias("value_sum"),
        )
        assert sorted(map(tuple, maintained.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_group_vanishes_when_emptied(self, spark):
        old = spark.createDataFrame([(1, "fr", 5)], "id long, lang string, n long")
        new = spark.createDataFrame([], "id long, lang string, n long")
        out = incremental_agg_maintenance(
            old, new, key_cols=["id"], group_cols=["lang"], value_col="n"
        )
        assert out.count() == 0

    def test_group_migration_moves_both_sides(self, spark):
        old = spark.createDataFrame([(1, "fr", 5)], "id long, lang string, n long")
        new = spark.createDataFrame([(1, "de", 5)], "id long, lang string, n long")
        rows = {
            r["lang"]: (r["n_rows"], r["value_sum"])
            for r in incremental_agg_maintenance(
                old, new, key_cols=["id"], group_cols=["lang"], value_col="n"
            ).collect()
        }
        assert rows == {"de": (1, 5)}


class TestDecimalValueType:
    def test_decimal_maintenance_matches_direct(self, spark):
        """value_type='decimal(28,10)' maintains money-like columns
        exactly: the maintained rollup equals the direct aggregate of
        the new snapshot, including the union coercion between the
        widened base sum and the per-delta casts."""
        from decimal import Decimal as D

        old = spark.createDataFrame(
            [(1, "en", D("10.25")), (2, "en", D("0.10")), (3, "fr", D("7.07"))],
            "id long, lang string, v decimal(28,10)",
        )
        new = spark.createDataFrame(
            [(1, "en", D("10.25")), (3, "fr", D("9.99")), (4, "en", D("0.02"))],
            "id long, lang string, v decimal(28,10)",
        )
        maintained = {
            r["lang"]: (r["n_rows"], r["value_sum"])
            for r in incremental_agg_maintenance(
                old, new, ["id"], ["lang"], "v", value_type="decimal(28,10)"
            ).collect()
        }
        direct = {
            r["lang"]: (r["n_rows"], r["value_sum"])
            for r in new.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("v").cast("decimal(28,10)")).alias("value_sum"),
            )
            .collect()
        }
        assert maintained == direct
