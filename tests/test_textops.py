"""F13 JSON repair, F8 footer append, F16 format normalization.

Repair corpus mirrors SURVEY.md §5.3: clean / fenced / trailing-comma /
garbage -> sentinel. Property tests (hypothesis) pin "never throws" and
"parse_ok implies round-trippable JSON".
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.textops import (
    _repair_parse_one,
    append_footer,
    json_repair_parse,
    normalize_formats,
)


class TestRepairParseLocal:
    def test_clean_object(self):
        parsed, ok = _repair_parse_one('{"a": 1}')
        assert ok and json.loads(parsed) == {"a": 1}

    def test_fenced_markdown(self):
        raw = 'Here you go:\n```json\n{"a": [1, 2]}\n```\nthanks'
        parsed, ok = _repair_parse_one(raw)
        assert ok and json.loads(parsed) == {"a": [1, 2]}

    def test_trailing_comma_repaired(self):
        parsed, ok = _repair_parse_one('{"a": 1, "b": [2, 3,], }')
        assert ok and json.loads(parsed) == {"a": 1, "b": [2, 3]}

    def test_garbage_is_sentinel(self):
        assert _repair_parse_one("no json here") == (None, False)

    def test_none_is_sentinel(self):
        assert _repair_parse_one(None) == (None, False)

    def test_array_root(self):
        parsed, ok = _repair_parse_one("prefix [1, 2, 3] suffix")
        assert ok and json.loads(parsed) == [1, 2, 3]

    def test_unrepairable_braces(self):
        assert _repair_parse_one("{]") == (None, False)

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def test_never_throws_and_ok_roundtrips(self, raw):
        parsed, ok = _repair_parse_one(raw)
        if ok:
            json.loads(parsed)  # parse_ok => valid JSON
        else:
            assert parsed is None


class TestRepairParseSpark:
    def test_udf_matches_local(self, spark):
        corpus = [
            '{"k": "v"}',
            '```json\n{"n": [1,2,],}\n```',
            "not json",
            None,
            "[1, 2]",
        ]
        df = spark.createDataFrame([(c,) for c in corpus], ["raw"])
        rows = (
            df.withColumn("r", json_repair_parse("raw"))
            .select("raw", "r.parsed_json", "r.parse_ok")
            .collect()
        )
        for row in rows:
            exp_parsed, exp_ok = _repair_parse_one(row["raw"])
            assert (row["parsed_json"], row["parse_ok"]) == (exp_parsed, exp_ok)


class TestFooter:
    def _run(self, spark, text, footer):
        df = spark.createDataFrame([(text, footer)], "t string, f string")
        return df.select(append_footer(F.col("t"), F.col("f")).alias("o")).head()["o"]

    def test_adds_newline_separator(self, spark):
        assert self._run(spark, "body", "foot") == "body\nfoot"

    def test_no_double_newline(self, spark):
        assert self._run(spark, "body\n", "foot") == "body\nfoot"

    def test_carriage_return_counts(self, spark):
        assert self._run(spark, "body\r", "foot") == "body\rfoot"

    def test_blank_footer_skipped(self, spark):
        assert self._run(spark, "body", "   ") == "body"
        assert self._run(spark, "body", None) == "body"


class TestFormats:
    def _run(self, spark, formats, separate):
        df = spark.createDataFrame(
            [(formats, separate)], "fmts array<string>, sep boolean"
        )
        return df.select(
            normalize_formats(F.col("fmts"), F.col("sep")).alias("o")
        ).head()["o"]

    def test_whitelist_dedup_order(self, spark):
        got = self._run(spark, [" CSV ", "json", "csv", "bogus", "text"], False)
        assert got == ["csv", "json", "text"]

    def test_empty_defaults(self, spark):
        assert self._run(spark, ["bogus"], True) == ["text"]
        assert self._run(spark, [], False) == ["csv"]

    def test_idempotent(self, spark):
        once = self._run(spark, ["TEXT", "csv", "text"], False)
        assert self._run(spark, once, False) == once
