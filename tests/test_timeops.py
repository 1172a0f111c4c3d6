"""F12 elapsed-time render/parse round trip, incl. the '1 day, ...'
pluralization and unparseable -> NULL policy (app.py:1038-1057 parity)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.timeops import (
    format_timedelta,
    parse_timedelta,
    ts_format,
)

CASES = [0, 1, 59, 60, 3599, 3600, 3661, 86399, 86400, 90184, 172800, 2 * 86400 + 3723]


class TestFormatTimedelta:
    @pytest.mark.parametrize("secs", CASES)
    def test_matches_python_str_timedelta(self, spark, secs):
        df = spark.createDataFrame([(secs,)], ["s"])
        got = df.select(format_timedelta(F.col("s")).alias("o")).head()["o"]
        assert got == str(dt.timedelta(seconds=secs))

    def test_negative_matches_python(self, spark):
        df = spark.createDataFrame([(-3661,)], ["s"])
        got = df.select(format_timedelta(F.col("s")).alias("o")).head()["o"]
        assert got == str(dt.timedelta(seconds=-3661))  # '-1 day, 22:58:59'


class TestParseTimedelta:
    @pytest.mark.parametrize("secs", CASES)
    def test_round_trip(self, spark, secs):
        rendered = str(dt.timedelta(seconds=secs))
        df = spark.createDataFrame([(rendered,)], ["t"])
        got = df.select(parse_timedelta(F.col("t")).alias("o")).head()["o"]
        assert got == float(secs)

    def test_fractional_seconds(self, spark):
        df = spark.createDataFrame([("0:00:01.500000",)], ["t"])
        assert df.select(parse_timedelta(F.col("t")).alias("o")).head()["o"] == 1.5

    def test_unparseable_is_null(self, spark):
        df = spark.createDataFrame([("garbage",), ("",)], ["t"])
        vals = [r["o"] for r in df.select(parse_timedelta(F.col("t")).alias("o")).collect()]
        assert vals == [None, None]


class TestTsFormat:
    def test_three_patterns(self, spark):
        ts = dt.datetime(2026, 8, 13, 4, 5, 6)
        df = spark.createDataFrame([(ts,)], ["ts"])
        row = df.select(
            ts_format(F.col("ts"), "meta").alias("m"),
            ts_format(F.col("ts"), "zip").alias("z"),
            ts_format(F.col("ts"), "results").alias("r"),
        ).head()
        assert row["m"] == "2026-08-13 04:05:06"
        assert row["z"] == "2026_08_13_04_05_06"
        assert row["r"] == "20260813_040506"
