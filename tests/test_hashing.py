"""F4/F14/F15 + fingerprint functions: normalization, rolling hash
order-sensitivity, data-URL encoding."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.hashing import (
    content_sha256,
    data_url,
    doc_fingerprint,
    normalize_text,
    redact_api_key,
    rolling_hash,
)


def _one(spark, col, *rows_cols):
    rows, cols = rows_cols
    return spark.createDataFrame(rows, cols).select(col.alias("o")).head()["o"]


class TestBasics:
    def test_sha256_matches_hashlib(self, spark):
        got = _one(spark, content_sha256(F.col("b")), [(b"payload",)], ["b"])
        assert got == hashlib.sha256(b"payload").hexdigest()

    def test_data_url(self, spark):
        got = _one(
            spark,
            data_url(F.col("b"), F.col("m")),
            [(b"img", "image/png")],
            ["b", "m"],
        )
        assert got == "data:image/png;base64," + base64.b64encode(b"img").decode()

    def test_redaction_keeps_last8(self, spark):
        got = _one(spark, redact_api_key(F.col("k")), [("sk-or-v1-abcdef1234567890",)], ["k"])
        assert got == "34567890"

    def test_normalize_collapses_ws(self, spark):
        got = _one(spark, normalize_text(F.col("t")), [("  Hello\t\n WORLD  ",)], ["t"])
        assert got == "hello world"


class TestFingerprints:
    def _fp(self, spark, fn, text):
        return _one(spark, fn(F.col("t")), [(text,)], ["t"])

    def test_md5_fingerprint_ignores_case_and_ws(self, spark):
        a = self._fp(spark, doc_fingerprint, "Hello   World")
        b = self._fp(spark, doc_fingerprint, "hello world")
        assert a == b

    def test_rolling_hash_is_order_sensitive(self, spark):
        ab = self._fp(spark, rolling_hash, "alpha beta")
        ba = self._fp(spark, rolling_hash, "beta alpha")
        assert ab != ba

    def test_rolling_hash_deterministic(self, spark):
        assert self._fp(spark, rolling_hash, "x y z") == self._fp(spark, rolling_hash, "x y z")

    def test_rolling_hash_in_range(self, spark):
        v = self._fp(spark, rolling_hash, "some longer text with several tokens here")
        assert 0 <= v < 1_000_000_007


def test_storage_collision_counters_match_reference_loop(spark):
    """In-batch analog of app.py:205-226: first upload keeps
    '<stem>_<hash12>.zip', the k-th colliding upload gets '_k' with the
    counter starting at 2, non-colliding names untouched."""
    from openrouter_batch_processor_spark.functions.paths import (
        storage_names_with_counters,
    )

    rows = [
        (1, "report.zip", "a" * 64),
        (2, "report.zip", "a" * 64),  # same name+content: collides
        (3, "report.zip", "a" * 64),
        (4, "report.zip", "b" * 64),  # same name, new content: no collision
        (5, "other.zip", "a" * 64),
    ]
    df = spark.createDataFrame(rows, "doc_id long, filename string, content_hash string")
    out = {r["doc_id"]: r for r in storage_names_with_counters(df).collect()}
    h12 = "a" * 12
    assert out[1]["storage_zip_name"] == f"report_{h12}.zip"
    assert out[2]["storage_zip_name"] == f"report_{h12}_2.zip"
    assert out[3]["storage_zip_name"] == f"report_{h12}_3.zip"
    assert out[4]["storage_zip_name"] == f"report_{'b' * 12}.zip"
    assert out[5]["storage_zip_name"] == f"other_{h12}.zip"
    assert [out[i]["upload_seq"] for i in (1, 2, 3)] == [1, 2, 3]
