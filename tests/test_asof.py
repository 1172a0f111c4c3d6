"""As-of join semantics: latest-at-or-before matching, equal-ts
visibility, no-match nulls, per-key isolation."""

from __future__ import annotations

import datetime as dt

from openrouter_batch_processor_spark.operators.asof import asof_join, latest_per_ts


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01 10:00:00"), 1.0),
            ("u1", _ts("2026-01-01 11:00:00"), 2.0),
            ("u1", _ts("2026-01-01 12:00:00"), 3.0),
            ("u2", _ts("2026-01-01 10:30:00"), 9.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    trades = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01 10:30:00")),  # -> 1.0
            (2, "u1", _ts("2026-01-01 11:00:00")),  # equal ts -> 2.0
            (3, "u1", _ts("2026-01-01 09:00:00")),  # before all -> null
            (4, "u2", _ts("2026-01-01 23:00:00")),  # -> 9.0 (not u1's)
            (5, "u3", _ts("2026-01-01 12:00:00")),  # no quotes -> null
        ],
        "event_id long, user_id string, ts timestamp",
    )
    return trades, quotes


class TestAsofJoin:
    def test_semantics(self, spark):
        trades, quotes = _frames(spark)
        out = {
            r["event_id"]: (r["asof_value"], r["asof_ts"])
            for r in asof_join(
                trades, quotes, keys=["user_id"], ts_col="ts", value_cols=["value"]
            ).collect()
        }
        assert out[1] == (1.0, _ts("2026-01-01 10:00:00"))
        assert out[2] == (2.0, _ts("2026-01-01 11:00:00"))  # at-or-before
        assert out[3] == (None, None)
        assert out[4] == (9.0, _ts("2026-01-01 10:30:00"))
        assert out[5] == (None, None)

    def test_all_left_rows_survive(self, spark):
        trades, quotes = _frames(spark)
        out = asof_join(trades, quotes, keys=["user_id"], ts_col="ts", value_cols=["value"])
        assert out.count() == trades.count()


class TestLatestPerTs:
    def test_dedup_keeps_highest_seq(self, spark):
        df = spark.createDataFrame(
            [
                ("u1", _ts("2026-01-01 10:00:00"), 1.0, 100),
                ("u1", _ts("2026-01-01 10:00:00"), 2.0, 200),
                ("u1", _ts("2026-01-01 11:00:00"), 3.0, 50),
            ],
            "user_id string, ts timestamp, value double, event_id long",
        )
        rows = latest_per_ts(df, ["user_id"], "ts", "event_id").orderBy("ts").collect()
        assert [(r["value"], r["event_id"]) for r in rows] == [(2.0, 200), (3.0, 50)]
