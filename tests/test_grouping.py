"""G1 grouping edge cases + F5 file-set hash properties (SURVEY.md §5.3/§5.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.grouping import (
    build_groups,
    derive_group_id,
    file_set_hash,
)

FILES = [
    ("alpha/a.txt", "one"),
    ("alpha/b.txt", "two"),
    ("alpha/sub/c.txt", "three"),
    ("beta/x.txt", "four"),
    ("loose.txt", "five"),
]


class TestDeriveGroupId:
    def test_subfolder_mode(self, spark):
        df = spark.createDataFrame(FILES, ["rel_path", "text"])
        got = dict(
            df.select("rel_path", derive_group_id(F.col("rel_path")).alias("g")).collect()
        )
        assert got == {
            "alpha/a.txt": "alpha/",
            "alpha/b.txt": "alpha/",
            "alpha/sub/c.txt": "alpha/",
            "beta/x.txt": "beta/",
            "loose.txt": "loose.txt",
        }

    def test_per_file_mode(self, spark):
        df = spark.createDataFrame(FILES, ["rel_path", "text"])
        got = df.select(
            derive_group_id(F.col("rel_path"), group_by_subfolder=False).alias("g")
        ).collect()
        assert sorted(r["g"] for r in got) == sorted(p for p, _ in FILES)


class TestBuildGroups:
    def test_members_sorted_and_flags(self, spark):
        df = spark.createDataFrame(FILES, ["rel_path", "text"])
        rows = {r["group_id"]: r for r in build_groups(df).collect()}
        assert set(rows) == {"alpha/", "beta/", "loose.txt"}
        alpha = rows["alpha/"]
        assert [m["rel_path"] for m in alpha["members"]] == [
            "alpha/a.txt",
            "alpha/b.txt",
            "alpha/sub/c.txt",
        ]
        assert alpha["file_count"] == 3 and alpha["is_folder"] is True
        assert rows["loose.txt"]["is_folder"] is False

    def test_order_independent_of_input_order(self, spark):
        df1 = spark.createDataFrame(FILES, ["rel_path", "text"])
        df2 = spark.createDataFrame(list(reversed(FILES)), ["rel_path", "text"])
        m1 = {r["group_id"]: [m["rel_path"] for m in r["members"]] for r in build_groups(df1).collect()}
        m2 = {r["group_id"]: [m["rel_path"] for m in r["members"]] for r in build_groups(df2).collect()}
        assert m1 == m2


class TestFileSetHash:
    def _hash(self, spark, files):
        df = spark.createDataFrame(files, ["rel_path", "content"])
        return file_set_hash(df, "rel_path", "content").head()["content_hash"]

    def test_permutation_invariant(self, spark):
        assert self._hash(spark, FILES) == self._hash(spark, list(reversed(FILES)))

    def test_sensitive_to_any_change(self, spark):
        base = self._hash(spark, FILES)
        mutated = [("alpha/a.txt", "ONE")] + FILES[1:]
        renamed = [("alpha/a2.txt", "one")] + FILES[1:]
        dropped = FILES[1:]
        assert base != self._hash(spark, mutated)
        assert base != self._hash(spark, renamed)
        assert base != self._hash(spark, dropped)
