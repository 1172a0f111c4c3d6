"""ViT patch-grid tiling + streaming SCD1 upsert: pure-Python tile
parity and batch-slicing invariance of the streamed merge."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.multimodal import tile_images


def _py_tiles(payload: bytes, media_id: str, w: int = 16, t: int = 8):
    out = []
    n_rows = len(payload) // w
    for r in range(n_rows // t):
        for c in range(w // t):
            chunk = b"".join(
                payload[(r * t + dy) * w + c * t : (r * t + dy) * w + c * t + t]
                for dy in range(t)
            )
            out.append((media_id, r, c, sum(chunk), hashlib.md5(chunk).hexdigest()))
    return out


def _media(spark, payloads):
    rows = [(mid, "image", "image/png", p, len(p)) for mid, p in payloads]
    return spark.createDataFrame(
        rows, "media_id string, kind string, mime string, payload binary, n_bytes long"
    )


class TestImageTiles:
    def test_matches_pure_python(self, spark):
        payloads = [
            ("a", bytes(range(200)) + b"xyz"),  # 12 rows -> 1 tile row
            ("b", bytes(256)),  # exactly 16 rows -> 2 tile rows
            ("c", b"short"),  # < one tile -> no rows
        ]
        got = sorted(
            tuple(r) for r in tile_images(_media(spark, payloads)).collect()
        )
        want = sorted(
            t for mid, p in payloads for t in _py_tiles(p, mid)
        )
        assert got == want
        assert not any(r[0] == "c" for r in got)

    def test_grid_shape(self, spark):
        # 16-wide plane, 24 rows -> 3x2 grid of 8x8 tiles
        payloads = [("g", bytes(16 * 24))]
        rows = tile_images(_media(spark, payloads)).collect()
        assert {(r["tile_row"], r["tile_col"]) for r in rows} == {
            (r, c) for r in range(3) for c in range(2)
        }


class TestScd1Upsert:
    def test_split_count_invariance(self, spark, tmp_path):
        """The streamed merge must equal the batch argmax regardless of
        how many micro-batches the feed is sliced into."""
        import datetime as dt

        from openrouter_batch_processor_spark.streaming.upsert import (
            scd1_upsert_stream,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(minutes=i), i % 4, "e", float(i * 10), "{}")
            for i in range(1, 25)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        results = []
        for n_splits in (1, 3):
            d = str(tmp_path / f"ev_{n_splits}")
            for i in range(n_splits):
                ev.filter(F.col("event_id") % n_splits == i).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{d}/s{i}")
            # flatten the part files into one stream dir
            import glob
            import os
            import shutil

            sd = str(tmp_path / f"stream_{n_splits}")
            os.makedirs(sd, exist_ok=True)
            for i in range(n_splits):
                part = glob.glob(f"{d}/s{i}/part-*.parquet")[0]
                shutil.copy(part, f"{sd}/split_{i}.parquet")
            got = {
                r["user_id"]: (r["last_event_id"], r["last_value"], r["n_events"])
                for r in scd1_upsert_stream(spark, sd).collect()
            }
            results.append(got)
        assert results[0] == results[1]
        # latest per key: highest event_id (ts increases with id)
        for uid, (eid, val, n) in results[0].items():
            assert eid == max(i for i in range(1, 25) if i % 4 == uid)
            assert val == float(eid * 10)
            assert n == sum(1 for i in range(1, 25) if i % 4 == uid)
