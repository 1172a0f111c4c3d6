"""Multimodal column plumbing: schema lift, stubbed decode via
mapInPandas, error-as-data, resize/frame-sample shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    library_decoder,
    media_table,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("a.png", b"\x89PNG-payload-one", "png"),
        ("b.jpg", b"jpegpayloadtwo", "jpg"),
        ("c.wav", b"RIFFwavbytes", "wav"),
        ("d.mp4", b"\x00\x00ftypmp4" * 300, "mp4"),
        ("e.xyz", b"unknown-kind", "xyz"),
    ]
    files = spark.createDataFrame(
        [(p, c, len(c)) for p, c, _ in rows],
        "rel_path string, content binary, length long",
    )
    return media_table(files)


class TestMediaTable:
    def test_kinds_and_ids(self, media):
        rows = media.collect()
        kinds = {r["kind"] for r in rows}
        assert kinds == {"image", "audio", "video"}  # unknown ext filtered
        assert len(rows) == 4
        for r in rows:
            assert r["media_id"] == hashlib.sha256(bytes(r["payload"])).hexdigest()
            assert r["n_bytes"] == len(bytes(r["payload"]))

    def test_image_mime(self, media):
        mimes = {r["media_id"][:8]: r["mime"] for r in media.filter(F.col("kind") == "image").collect()}
        assert set(mimes.values()) == {"image/png", "image/jpeg"}


class TestFeatures:
    def test_fake_decode_deterministic(self, media):
        feats = {r["media_id"]: r for r in extract_features(media).collect()}
        assert len(feats) == 4
        for media_row in media.collect():
            w, h, c, ck = fake_decoder(bytes(media_row["payload"]), media_row["kind"])
            got = feats[media_row["media_id"]]
            assert (got["width"], got["height"], got["n_channels"], got["checksum"]) == (w, h, c, ck)

    def test_decoder_failure_is_data(self, media, spark):
        def broken(payload, kind):
            raise ValueError("corrupt")

        rows = extract_features(media, decoder=broken).collect()
        assert len(rows) == 4
        assert all(r["width"] is None and r["checksum"] is None for r in rows)

    def test_library_decoder_gates_on_codec_availability(self):
        try:
            import PIL  # noqa: F401

            has_pillow = True
        except ImportError:
            has_pillow = False
        if has_pillow:
            # Pillow present: junk bytes are a DECODE error, not a
            # missing-library error
            with pytest.raises(Exception) as exc:
                library_decoder(b"x", "image")
            assert not isinstance(exc.value, NotImplementedError)
        else:
            with pytest.raises(NotImplementedError):
                library_decoder(b"x", "image")
        # audio/video codecs are never bundled here
        with pytest.raises(NotImplementedError):
            library_decoder(b"x", "audio")


def _tiny_png(width=5, height=3, rgb=(200, 30, 90)) -> bytes:
    """Minimal valid 8-bit RGB PNG, pure stdlib (zlib + struct) — lets
    the real-codec tests carry an actual image without needing Pillow
    to BUILD the fixture."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(rgb) * width for _ in range(height)
    )  # filter 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestRealCodecPath:
    """Runs only where Pillow is installed (skipped in this container);
    proves the optional decode path drives the SAME mapInPandas
    plumbing as fake_decoder — contract unchanged, one argument swap."""

    def test_library_decoder_decodes_real_png(self):
        pytest.importorskip("PIL")
        w, h, c, ck = library_decoder(_tiny_png(), "image")
        assert (w, h, c) == (5, 3, 3)
        assert len(ck) == 16

    def test_extract_features_with_real_decoder(self, spark):
        pytest.importorskip("PIL")
        from openrouter_batch_processor_spark.operators.multimodal import (
            extract_features,
        )

        media = spark.createDataFrame(
            [("m1", "image", "image/png", _tiny_png(), 1)],
            "media_id string, kind string, mime string, payload binary, n_bytes long",
        )
        rows = extract_features(media, decoder=library_decoder).collect()
        assert len(rows) == 1
        assert (rows[0]["width"], rows[0]["height"], rows[0]["channels"]) == (5, 3, 3)

    def test_phash_images_with_pillow_pixels(self, spark):
        pytest.importorskip("PIL")
        from openrouter_batch_processor_spark.operators.multimodal import (
            phash_images,
            pillow_pixels,
        )

        # two different-size solid-color images: a real 8x8 resample is
        # length-invariant, so both solid images hash identically
        media = spark.createDataFrame(
            [
                ("a", "image", "image/png", _tiny_png(5, 3), 1),
                ("b", "image", "image/png", _tiny_png(9, 7), 1),
            ],
            "media_id string, kind string, mime string, payload binary, n_bytes long",
        )
        rows = {r["media_id"]: (r["h_hi"], r["h_lo"]) for r in phash_images(
            media, pixels=pillow_pixels
        ).collect()}
        assert rows["a"] == rows["b"]

    def test_pillow_pixels_raises_without_pillow(self):
        try:
            import PIL  # noqa: F401
        except ImportError:
            from openrouter_batch_processor_spark.operators.multimodal import (
                pillow_pixels,
            )

            with pytest.raises(NotImplementedError):
                pillow_pixels(_tiny_png())


class TestResizeAndFrames:
    def test_resize_identity_stub(self, media):
        rows = resize_images(media, 32, 32).collect()
        assert len(rows) == 2  # images only
        assert all((r["target_w"], r["target_h"]) == (32, 32) for r in rows)

    def test_frame_sampling_expansion(self, media):
        frames = sample_frames(media, every_n_bytes=512).collect()
        assert len(frames) > 1  # video payload expands to several frames
        assert [f["frame_no"] for f in sorted(frames, key=lambda r: r["offset"])] == list(
            range(len(frames))
        )

    def test_frame_sampling_caps_expansion(self, spark):
        # a payload far past max_frames*every_n_bytes must stop at the
        # cap — the output-volume bound that keeps the operator
        # equivalent to the registry oracle's range(0, 64) at ANY length
        from openrouter_batch_processor_spark.operators.multimodal import media_table

        from pyspark.sql import functions as F

        big = spark.createDataFrame(
            [("vid/huge.mp4", b"x" * 10_000, 10_000)],
            "rel_path string, content binary, length long",
        ).select("rel_path", "content", F.col("length"))
        frames = sample_frames(media_table(big), every_n_bytes=64).collect()
        assert len(frames) == 64  # not ceil(10000/64) = 157
        assert max(f["frame_no"] for f in frames) == 63


def test_audio_windows_overlap_and_cap(spark):
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        window_audio,
    )

    payload = bytes(range(256)) * 3  # 768 bytes
    files = spark.createDataFrame(
        [("clip/a.wav", payload, len(payload)), ("img/b.png", b"xx", 2)],
        "rel_path string, content binary, length long",
    )
    out = window_audio(media_table(files), window_bytes=256, hop_bytes=128).collect()
    # only the audio row expands; 768 bytes / 128 hop = 6 windows
    assert len(out) == 6
    rows = sorted(out, key=lambda r: r["window_no"])
    assert [r["start_off"] for r in rows] == [0, 128, 256, 384, 512, 640]
    # interior windows are full-size; the last is the 128-byte tail
    assert [r["n_bytes"] for r in rows] == [256] * 5 + [128]
    # 50% overlap: window i and i+1 share bytes -> different checksums
    assert len({r["window_checksum"] for r in rows}) > 1
    assert all(0 <= r["energy"] < 10000 for r in rows)

    # cap bounds the expansion
    capped = window_audio(
        media_table(files), window_bytes=256, hop_bytes=128, max_windows=2
    ).collect()
    assert len(capped) == 2


class TestTilePhashPairs:
    def test_planted_watermark_survives_reencode_noise(self, spark):
        """Two 'images' share a watermark tile; image B's copy is
        brightness-shifted on a couple of bytes (a re-encode), so the
        exact tile_md5 differs but the tile pHashes sit within Hamming
        6 — the perceptual pair must surface, the exact-dedup rollup
        must not see it, and unrelated images must not pair."""
        from openrouter_batch_processor_spark.operators.multimodal import (
            tile_images,
            tile_phash_pairs,
        )

        width = 16
        # one 16x16 image = 2x2 tile grid; the watermark occupies the
        # top-left 8x8 tile, remaining bytes differ per image
        wm = bytes(
            (200 if (dy + dx) % 3 == 0 else 40) for dy in range(8) for dx in range(8)
        )
        wm_shift = bytearray(wm)
        wm_shift[0] = 38   # flips below-mean sample -> stays below mean
        wm_shift[9] = 202  # above-mean stays above: hamming 0..6, md5 differs

        def image(wm_tile: bytes, fill: int) -> bytes:
            rows = []
            for dy in range(16):
                if dy < 8:
                    left = wm_tile[dy * 8 : dy * 8 + 8]
                else:
                    left = bytes((fill + dy + dx) % 251 for dx in range(8))
                right = bytes((fill * 7 + dy * 3 + dx) % 251 for dx in range(8))
                rows.append(left + right)
            return b"".join(rows)

        imgs = [
            ("a.png", image(wm, 5)),
            ("b.png", image(bytes(wm_shift), 90)),
            # flat image: every tile pHash is exactly 0 (no byte exceeds
            # the mean), >= 14 bits from any structured tile above — the
            # negative control cannot collide by construction
            ("c.png", bytes(256)),
        ]
        files = spark.createDataFrame(
            [(p, c, len(c)) for p, c in imgs],
            "rel_path string, content binary, length long",
        )
        media = media_table(files)
        ids = {
            r["rel_path"]: hashlib.sha256(c).hexdigest()
            for (r, c) in zip(
                files.select("rel_path").collect(), [c for _, c in imgs]
            )
        }
        id_a, id_b = sorted([ids["a.png"], ids["b.png"]])

        pairs = tile_phash_pairs(media, max_hamming=6, bucket_cap=64).collect()
        keyed = {(r["id_a"], r["id_b"]): r for r in pairs}
        assert (id_a, id_b) in keyed, "planted watermark pair not found"
        assert keyed[(id_a, id_b)]["min_hamming"] <= 6
        # exact tile dedup cannot see the shifted copy
        tiles = tile_images(media).collect()
        md5s = {}
        for r in tiles:
            md5s.setdefault(r["tile_md5"], set()).add(r["media_id"])
        assert all(len(v) == 1 for v in md5s.values()), (
            "re-encoded watermark should NOT be an exact tile duplicate"
        )
        # no unrelated pair involves image c
        id_c = ids["c.png"]
        assert not any(id_c in k for k in keyed), "unrelated image paired"
