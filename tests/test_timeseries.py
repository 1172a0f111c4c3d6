"""EWMA fold (applyInPandas) and Markov transition counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.timeseries import (
    ewma_last,
    transition_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


class TestEwma:
    def test_matches_closed_form(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        xs = [10.0, 20.0, 30.0]
        rows = [
            (i, t0 + dt.timedelta(minutes=i), 1, "t", x) for i, x in enumerate(xs)
        ]
        got = ewma_last(_events(spark, rows)).collect()[0]
        e = xs[0]
        for x in xs[1:]:
            e = 0.3 * x + 0.7 * e
        assert got["n"] == 3 and got["ewma"] == round(e, 6)

    def test_order_is_event_time_not_arrival(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        # rows deliberately out of time order in the input
        rows = [
            (2, t0 + dt.timedelta(minutes=2), 1, "t", 30.0),
            (0, t0, 1, "t", 10.0),
            (1, t0 + dt.timedelta(minutes=1), 1, "t", 20.0),
        ]
        got = ewma_last(_events(spark, rows).repartition(4)).collect()[0]
        assert got["ewma"] == round(0.3 * 30 + 0.7 * (0.3 * 20 + 0.7 * 10), 6)


class TestTransitions:
    def test_counts_per_user_sequences(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        seq_u1 = ["click", "view", "click", "view"]  # c->v, v->c, c->v
        seq_u2 = ["view", "purchase"]  # v->p
        rows = [
            (i, t0 + dt.timedelta(minutes=i), 1, s, 0.0) for i, s in enumerate(seq_u1)
        ] + [
            (10 + i, t0 + dt.timedelta(minutes=i), 2, s, 0.0)
            for i, s in enumerate(seq_u2)
        ]
        got = {
            (r["from_state"], r["to_state"]): r["n_transitions"]
            for r in transition_counts(_events(spark, rows)).collect()
        }
        assert got == {
            ("click", "view"): 2,
            ("view", "click"): 1,
            ("view", "purchase"): 1,
        }


class TestScd2Intervals:
    def test_collapses_runs_and_opens_current(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import scd2_intervals

        events = spark.createDataFrame(
            [
                # user 1: A A B A  -> intervals A[t1,t3) B[t3,t4) A[t4,∞)
                (1, "2024-01-01 00:00:01", 1, "A", 0.0, None),
                (2, "2024-01-01 00:00:02", 1, "A", 0.0, None),
                (3, "2024-01-01 00:00:03", 1, "B", 0.0, None),
                (4, "2024-01-01 00:00:04", 1, "A", 0.0, None),
                # user 2: single event -> one open interval
                (5, "2024-01-01 00:00:05", 2, "C", 0.0, None),
            ],
            "event_id long, ts_s string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        rows = sorted(
            scd2_intervals(events).collect(), key=lambda r: (r["user_id"], r["valid_from"])
        )
        assert [(r["user_id"], r["state"], r["valid_to"] is None) for r in rows] == [
            (1, "A", False),
            (1, "B", False),
            (1, "A", True),
            (2, "C", True),
        ]
        # the A-run collapses: valid_from is the FIRST A, close at the B
        assert rows[0]["valid_from"] == "2024-01-01 00:00:01"
        assert rows[0]["valid_to"] == "2024-01-01 00:00:03"
        assert [r["is_current"] for r in rows] == [False, False, True, True]


class TestFunnel:
    def test_strict_ordering(self, spark):
        import datetime as dt

        from openrouter_batch_processor_spark.operators.timeseries import funnel_counts

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        rows = [
            # u1: full ordered funnel
            (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
            # u2: click BEFORE first view -> stops at stage 1
            (2, t(1), "view"), (2, t(0), "click"),
            # u3: purchase before click -> reaches stage 2 only
            (3, t(0), "view"), (3, t(2), "click"), (3, t(1), "purchase"),
            # u4: never views -> not even stage 1
            (4, t(0), "click"), (4, t(1), "purchase"),
            # u5: click at EXACTLY the first-view instant -> strict > fails
            (5, t(0), "view"), (5, t(0), "click"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        out = {r["stage_idx"]: r for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
        assert out[1]["n_users"] == 4  # u1 u2 u3 u5
        assert out[2]["n_users"] == 2  # u1 u3
        assert out[3]["n_users"] == 1  # u1
        assert out[1]["conv_from_prev"] is None
        assert out[2]["conv_from_prev"] == 0.5
        assert out[3]["conv_from_prev"] == 0.5


class TestRetentionCohorts:
    def test_offsets_and_distinct(self, spark):
        import datetime as dt

        from openrouter_batch_processor_spark.operators.timeseries import retention_cohorts

        d = lambda days, h=0: dt.datetime(2024, 1, 1 + days, h)  # noqa: E731
        rows = [
            # u1: cohort week 0, active weeks 0,1 (two events in w1 count once)
            (1, d(0)), (1, d(8)), (1, d(9)),
            # u2: cohort week 1, active week 1 only
            (2, d(7)),
            # u3: cohort week 0, active weeks 0 and 2
            (3, d(3)), (3, d(15)),
        ]
        df = spark.createDataFrame(
            [(u, ts, "view") for u, ts in rows],
            "user_id long, ts timestamp, event_type string",
        )
        got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
               for r in retention_cohorts(df).collect()}
        assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}
