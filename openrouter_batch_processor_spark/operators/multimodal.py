"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature/resize/frame-sample as Arrow-batched
mapInPandas stages.

The reference's only multimodal handling is image-file -> base64
data-URL prompt parts (worker.py:84-98). A 100 TB training pipeline
needs the general form: a `binary` payload column plus a metadata
struct, processed by vectorized Python stages. The decode step itself
needs codec libraries that are NOT in this container, so it is stubbed
two ways (SURVEY.md north-star contract):

- `fake_decoder` — deterministic, dependency-free: 'decodes' payload
  bytes into a stable (width, height, n_channels, checksum) tuple so
  the full Spark plumbing (schema, batching, partitioning) is testable.
- `library_decoder` — the real path, gated on optional imports: images
  decode through Pillow when installed (and `pillow_pixels` feeds
  phash_images a real 8x8 luminance plane); absent libraries raise
  NotImplementedError naming what to install (Pillow/av/soundfile).

Scale notes: mapInPandas streams Arrow record batches, so a partition
of 10k images never materializes as one Python list; metadata-only
transforms (routing, filtering, size stats) stay JVM-side as Column
expressions and never touch the payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def media_table(files: DataFrame, kind_by_ext: dict[str, str] | None = None) -> DataFrame:
    """Lift a binaryFile scan into the MEDIA_SCHEMA shape (JVM-side).

    Metadata derivation (id, kind, mime, size) is pure Column work; the
    payload is carried opaquely — never parsed on the JVM."""
    from openrouter_batch_processor_spark.functions.paths import file_extension
    from openrouter_batch_processor_spark.sources.ingest import MIME_BY_EXT

    kind_by_ext = kind_by_ext or {
        ".jpg": "image", ".jpeg": "image", ".png": "image",
        ".tif": "image", ".tiff": "image",
        ".wav": "audio", ".mp3": "audio",
        ".mp4": "video", ".mkv": "video",
    }
    ext = file_extension(F.col("rel_path"))
    kind = F.lit(None).cast("string")
    for e, k in reversed(list(kind_by_ext.items())):
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
    mime = F.lit(None).cast("string")
    for e, m in reversed(list(MIME_BY_EXT.items())):
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return files.select(
        F.sha2(F.col("content"), 256).alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
    ).filter(F.col("kind").isNotNull())


def fake_decoder(payload: bytes, kind: str) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a codec: shape derived from a stable
    hash of the payload. Same bytes -> same 'decoded' shape, on any
    executor — which is exactly what the plumbing tests need."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    channels = 1 + digest[2] % 3 if kind == "image" else 1
    return width, height, channels, digest.hex()[:16]


def library_decoder(payload: bytes, kind: str) -> tuple[int, int, int, str]:
    """The real-deployment decode path, gated on optional codec
    imports; the Spark-side contract (signature, schema, batch shape)
    is identical to fake_decoder. Images decode through Pillow when it
    is installed (width, height, bands, sha256-prefix checksum — the
    checksum is of the PAYLOAD, same as fake_decoder, so swapping
    decoders never changes join keys). Audio/video still require
    soundfile/av; absent libraries raise NotImplementedError so a
    mis-provisioned cluster fails loudly instead of silently faking."""
    if kind == "image":
        try:
            import io

            from PIL import Image
        except ImportError:
            pass
        else:
            with Image.open(io.BytesIO(payload)) as img:
                width, height = img.size
                channels = len(img.getbands())
            checksum = hashlib.sha256(payload).hexdigest()[:16]
            return width, height, channels, checksum
    raise NotImplementedError(
        "media decode requires codec libraries (images: Pillow; audio: "
        "soundfile; video: av) — install them and swap this decoder in; "
        "the mapInPandas plumbing is unchanged"
    )


def pillow_pixels(payload: bytes) -> list[int]:
    """Real 8x8 grayscale resample for phash_images(pixels=...): decode
    with Pillow, convert to luminance, resize to the fixed 8x8 plane —
    the length-INVARIANT sample grid the byte-sampling stand-in lacks.
    Optional-import gated like library_decoder."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "pillow_pixels requires Pillow — install it or keep the "
            "byte-sampling default"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return list(img.convert("L").resize((8, 8)).getdata())


def extract_features(media: DataFrame, decoder=fake_decoder) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    One output row per media row: decoded shape + payload checksum.
    Decoder failures become NULL-shape rows (T5 error-as-data), so one
    corrupt file never fails a 100k-file task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                try:
                    w, h, c, ck = decoder(bytes(rec.payload), rec.kind)
                    rows.append((rec.media_id, rec.kind, w, h, c, ck))
                except Exception:
                    rows.append((rec.media_id, rec.kind, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int, resizer=None) -> DataFrame:
    """Resize stage: same mapInPandas shape; default 'resizer' is the
    identity stub (real one: Pillow thumbnail + re-encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload)
                out = resizer(payload, width, height) if resizer else payload
                rows.append((rec.media_id, width, height, out))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 64
) -> DataFrame:
    """Frame-sampling stub for video: emits one row per sampled offset
    (a real build decodes keyframes with av). Demonstrates the 1-in/N-out
    mapInPandas shape (a UDTF-style expansion) with bounded memory.

    ``max_frames`` caps the expansion per document — the output-volume
    bound any real frame sampler needs (a 2-hour video is not 200 k
    rows), and it keeps the operator equivalent to the registry oracle's
    range(0, 64) at ANY payload length, not just the lengths present in
    the testdata."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_checksum", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload)
                for i, off in enumerate(
                    range(0, min(len(payload), max_frames * every_n_bytes), every_n_bytes)
                ):
                    chunk = payload[off : off + every_n_bytes]
                    rows.append(
                        (rec.media_id, i, off, hashlib.sha256(chunk).hexdigest()[:16])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


def window_audio(
    media: DataFrame,
    window_bytes: int = 256,
    hop_bytes: int = 128,
    max_windows: int = 96,
) -> DataFrame:
    """Audio framing stub: OVERLAPPING hop windows (the real audio
    feature shape — 50% overlap at the defaults — unlike video's
    disjoint keyframe sampling) with a per-window energy statistic and
    checksum. A real build decodes PCM with soundfile and computes RMS;
    the stub derives 'energy' deterministically from the window's md5
    so the whole 1-in/N-out expansion is value-checkable in SQL. The
    ``max_windows`` cap bounds output volume per clip exactly like
    sample_frames' cap (a 3-hour recording is not a million rows)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("window_no", T.IntegerType()),
            T.StructField("start_off", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("energy", T.LongType()),
            T.StructField("window_checksum", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload)
                for i in range(max_windows):
                    start = i * hop_bytes
                    if start >= len(payload):
                        break
                    chunk = payload[start : start + window_bytes]
                    rows.append(
                        (
                            rec.media_id,
                            i,
                            start,
                            len(chunk),
                            int(hashlib.md5(chunk).hexdigest()[:6], 16) % 10000,
                            hashlib.sha256(chunk).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("h_hi", T.LongType()),  # bits 0-31 of the 64-bit hash
        T.StructField("h_lo", T.LongType()),  # bits 32-63
    ]
)


def phash_images(media: DataFrame, pixels=None) -> DataFrame:
    """Perceptual-hash ('pHash-shape') signatures for image payloads via
    mapInPandas: sample 64 evenly-spaced bytes of the decoded luminance
    stream (default: the raw payload — the deterministic stand-in for a
    downscaled 8x8 grayscale plane; pass ``pixels=pillow_pixels`` to
    decode + resample a REAL 8x8 luminance plane — payload -> 64
    samples, same schema either way), threshold each sample
    against the mean, and pack the 64 bits into two 32-bit halves.
    Locality is the point: a small IN-PLACE edit moves few samples, so
    near-duplicate images land at small Hamming distance — unlike the
    avalanche sha256 id. Because the sample grid is length-dependent,
    only same-length edits are local in this byte-sampling stand-in; a
    real decoder resamples to a fixed 8x8 plane, which makes the grid
    length-invariant (the limitation lives in the fake decode, not the
    LSH machinery). Empty payloads produce no row (nothing to hash). Batch shape: one Arrow batch in, one row per
    image out; zero driver state."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                b = bytes(rec.payload)
                n = len(b)
                if n == 0:
                    continue
                pix = pixels(b) if pixels else [b[(i * n) // 64] for i in range(64)]
                mu = sum(pix) / 64.0
                bits = [1 if p > mu else 0 for p in pix]
                hi = sum(bit << (31 - i) for i, bit in enumerate(bits[:32]))
                lo = sum(bit << (31 - i) for i, bit in enumerate(bits[32:]))
                rows.append((rec.media_id, hi, lo))
            yield pd.DataFrame(rows, columns=["media_id", "h_hi", "h_lo"])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, PHASH_SCHEMA)


def phash_near_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by banded perceptual-hash LSH: the
    64-bit signature splits into four 16-bit bands; a pair is a
    candidate iff SOME band matches exactly (guaranteed for Hamming
    distance <= 3 by pigeonhole — the same banding contract as
    dedup_simhash_pairs, dedup.py); candidates are verified with the
    exact Hamming distance (bit_count of xor, JVM-side) and kept at
    <= max_hamming. Distinct-pair dedup happens BEFORE verification so
    a pair matching several bands is scored once.

    Scale: candidates come from an equi-self-join on (band, band_val) —
    bucketed, O(near-dups); the all-pairs product never exists. A viral
    band value (e.g. flat-color thumbnails) is the AQE skew case."""
    sig = phash_images(media)
    bands = sig.select(
        "media_id",
        "h_hi",
        "h_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.shiftrightunsigned("h_hi", 16).alias("band_val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.col("h_hi").bitwiseAND(F.lit(0xFFFF))).alias("band_val"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    F.shiftrightunsigned("h_lo", 16).alias("band_val"),
                ),
                F.struct(
                    F.lit(3).alias("band"),
                    (F.col("h_lo").bitwiseAND(F.lit(0xFFFF))).alias("band_val"),
                ),
            )
        ).alias("b"),
    ).select("media_id", "h_hi", "h_lo", "b.band", "b.band_val")
    a = bands.select(
        "band",
        "band_val",
        F.col("media_id").alias("id_a"),
        F.col("h_hi").alias("hi_a"),
        F.col("h_lo").alias("lo_a"),
    )
    b = bands.select(
        "band",
        "band_val",
        F.col("media_id").alias("id_b"),
        F.col("h_hi").alias("hi_b"),
        F.col("h_lo").alias("lo_b"),
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


TILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("tile_row", T.LongType()),
        T.StructField("tile_col", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("tile_md5", T.StringType()),
    ]
)


def tile_images(media: DataFrame, img_width: int = 16, tile: int = 8) -> DataFrame:
    """ViT-style patch grid (Dosovitskiy et al. 2020: an image is
    worth 16x16 words) over binary payloads via mapInPandas: the
    payload is interpreted as a row-major byte plane of width
    img_width (the deterministic stand-in for a decoded luminance
    plane — a real deployment swaps library_decoder's pixels in, same
    schema), cropped to the largest tile-multiple, and cut into
    (tile x tile) patches emitted as (media_id, tile_row, tile_col,
    byte_sum, tile_md5). Payloads smaller than one tile row produce no
    rows — the crop-to-multiple contract every patchifier applies.

    This is the 1-in/N-out expansion shape (same as sample_frames):
    one Arrow batch in, R*C rows per image out, zero driver state; the
    downstream per-patch pipeline (embed, score, filter) is ordinary
    DataFrame work keyed by (media_id, tile_row, tile_col)."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                b = bytes(rec.payload)
                n_rows = len(b) // img_width
                for r in range(n_rows // tile):
                    for c in range(img_width // tile):
                        chunk = b"".join(
                            b[
                                (r * tile + dy) * img_width
                                + c * tile : (r * tile + dy) * img_width
                                + c * tile
                                + tile
                            ]
                            for dy in range(tile)
                        )
                        rows.append(
                            (
                                rec.media_id,
                                r,
                                c,
                                sum(chunk),
                                hashlib.md5(chunk).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "tile_row", "tile_col", "byte_sum", "tile_md5"],
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, TILE_SCHEMA)
    )


TILE_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("tile_row", T.LongType()),
        T.StructField("tile_col", T.LongType()),
        T.StructField("h_hi", T.LongType()),
        T.StructField("h_lo", T.LongType()),
    ]
)


def tile_phash(media: DataFrame, img_width: int = 16, tile: int = 8) -> DataFrame:
    """Per-TILE perceptual hash: the ViT patch grid of tile_images, but
    each (tile x tile) patch emits the 64-bit mean-threshold signature
    of its byte plane instead of an exact md5 — for tile=8 the patch IS
    64 bytes, so this is the full-resolution analog of phash_images'
    sampled variant. A re-encoded/brightness-shifted watermark moves a
    few bits of its tile's signature, not the exact hash — which is
    exactly what multimodal_tile_dedup (md5 equality) cannot see.

    Output: (media_id, tile_row, tile_col, h_hi, h_lo). Same
    1-in/N-out mapInPandas expansion shape as tile_images."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                b = bytes(rec.payload)
                n_rows = len(b) // img_width
                for r in range(n_rows // tile):
                    for c in range(img_width // tile):
                        chunk = b"".join(
                            b[
                                (r * tile + dy) * img_width
                                + c * tile : (r * tile + dy) * img_width
                                + c * tile
                                + tile
                            ]
                            for dy in range(tile)
                        )
                        n = len(chunk)
                        pix = [chunk[(i * n) // 64] for i in range(64)]
                        mu = sum(pix) / 64.0
                        bits = [1 if p > mu else 0 for p in pix]
                        hi = sum(bit << (31 - i) for i, bit in enumerate(bits[:32]))
                        lo = sum(bit << (31 - i) for i, bit in enumerate(bits[32:]))
                        rows.append((rec.media_id, r, c, hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "tile_row", "tile_col", "h_hi", "h_lo"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, TILE_PHASH_SCHEMA)
    )


def tile_phash_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    bucket_cap: int = 64,
    img_width: int = 16,
    tile: int = 8,
) -> DataFrame:
    """Perceptual cross-image duplicate-PATCH pairs (VERDICT r07 #7):
    the watermark/logo finder robust to re-encoding. Each tile's 64-bit
    pHash splits into four 16-bit bands; tile pairs from different
    images sharing a band value are candidates (pigeonhole-complete for
    Hamming <= 3, same contract as phash_near_pairs), verified with the
    exact JVM-side bit_count Hamming and rolled up per image pair.

    Scale guards: band buckets holding > bucket_cap tiles are pruned
    before the self-join — the df-cap discipline of the text inverted
    index; a flat-color/boilerplate patch shared by thousands of images
    would otherwise square the candidate volume. The pruned buckets are
    by construction the patches multimodal_tile_dedup already reports
    as mass duplicates; this operator exists for the RARE recurring
    near-identical patch.

    Output: (id_a, id_b, n_tile_pairs, min_hamming) per image pair with
    at least one verified near-duplicate tile."""
    sig = tile_phash(media, img_width, tile)
    bands = sig.select(
        "media_id",
        "tile_row",
        "tile_col",
        "h_hi",
        "h_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.shiftrightunsigned("h_hi", 16).alias("band_val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.col("h_hi").bitwiseAND(F.lit(0xFFFF))).alias("band_val"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    F.shiftrightunsigned("h_lo", 16).alias("band_val"),
                ),
                F.struct(
                    F.lit(3).alias("band"),
                    (F.col("h_lo").bitwiseAND(F.lit(0xFFFF))).alias("band_val"),
                ),
            )
        ).alias("b"),
    ).select("media_id", "tile_row", "tile_col", "h_hi", "h_lo", "b.band", "b.band_val")
    hot = (
        bands.groupBy("band", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > bucket_cap)
        .select("band", "band_val")
    )
    pruned = bands.join(hot, ["band", "band_val"], "left_anti")
    a = pruned.select(
        "band",
        "band_val",
        F.col("media_id").alias("id_a"),
        F.col("tile_row").alias("row_a"),
        F.col("tile_col").alias("col_a"),
        F.col("h_hi").alias("hi_a"),
        F.col("h_lo").alias("lo_a"),
    )
    bb = pruned.select(
        "band",
        "band_val",
        F.col("media_id").alias("id_b"),
        F.col("tile_row").alias("row_b"),
        F.col("tile_col").alias("col_b"),
        F.col("h_hi").alias("hi_b"),
        F.col("h_lo").alias("lo_b"),
    )
    cand = (
        a.join(bb, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "row_a", "col_a", "id_b", "row_b", "col_b",
            "hi_a", "lo_a", "hi_b", "lo_b",
        )
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    verified = cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
    return verified.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tile_pairs"),
        F.min("hamming").cast("long").alias("min_hamming"),
    )


def staged_phash_pairs(media: DataFrame, max_hamming: int = 9) -> DataFrame:
    """Session-staged pHash near-pair table keyed on the media plan:
    the pair report and the cluster closure consume the same banded
    candidate/verify stage — materialize once (operators/staging.py).
    Output is O(near-dups)."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    return staged_from(
        media.select("media_id", "payload"),
        f"phash_pairs:{max_hamming}",
        lambda d: phash_near_pairs(
            d.withColumn("kind", F.lit("image")), max_hamming=max_hamming
        ),
    )


def phash_clusters(media: DataFrame, max_hamming: int = 9) -> DataFrame:
    """Image duplicate CLUSTERS: transitive closure over the banded
    pHash near-pairs (A~B, B~C => one cluster even when A,C differ by
    more than the pairwise threshold — the same closure step the text
    dedup pipeline applies after LSH). Pointer-doubling label
    propagation (operators/dedup.connected_components) over the
    bucketed pair stage; output one row per cluster (min media_id as
    the canonical representative) with its member count."""
    from openrouter_batch_processor_spark.operators.dedup import (
        connected_components,
    )
    from openrouter_batch_processor_spark.operators.staging import staged_from

    def _build(m: DataFrame) -> DataFrame:
        pairs = staged_phash_pairs(media, max_hamming=max_hamming)
        cc = connected_components(pairs)
        return cc.groupBy("cluster_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_members")
        )

    # the closure's output plan scans per-run checkpointed RDDs, so key
    # the memo on the MEDIA input plan (the duplicate_clusters pattern)
    return staged_from(
        media.select("media_id", "payload"),
        f"phash_clusters:{max_hamming}",
        _build,
    )


def audio_fingerprint_pairs(
    files: DataFrame,
    window_bytes: int = 64,
    hop_bytes: int = 32,
    max_gap: int = 20,
    min_matches: int = 2,
    key_mod: int = 256,
) -> DataFrame:
    """Shazam-style audio fingerprint matching (Wang 2003, constellation
    landmarks): frame each track into hop windows, keep strict local
    energy peaks, pair consecutive peaks within max_gap windows into
    (e1 mod 256, e2 mod 256, dt) landmark keys, and match tracks by
    counting key hits at a CONSISTENT time offset — the
    offset-histogram vote that makes the match robust to clipping.
    ``key_mod`` is the energy-quantization widen dial: the landmark
    key space is key_mod x key_mod x max_gap, so when a corpus grows
    enough that individual keys saturate (the banded-LSH bucket
    failure mode), widening 256 -> 4096 multiplies the key space by
    256x and restores near-linear candidate volume — the knob the
    100x probe (SCALE.md) turns instead of editing this function.

    Track identity is the rel_path (two copies of the same audio are
    two tracks — exactly what the matcher must find); energies are the
    deterministic md5-derived stub (fake-codec boundary, the
    multimodal-family contract), so every stage is exact integers and
    the whole chain value-checks in SQL. Scale: the join is an
    equi-join on the 256x256xmax_gap key space — bucketed, never
    all-pairs; a viral landmark key is the AQE skew case."""
    media = files.select(
        F.col("rel_path").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.col("content").alias("payload"),
    )
    w = window_audio(media, window_bytes=window_bytes, hop_bytes=hop_bytes)
    ws = Window.partitionBy("media_id").orderBy("window_no")
    e = F.col("energy")
    pk = (
        w.select(
            "media_id",
            "window_no",
            "energy",
            F.lag("energy").over(ws).alias("pe"),
            F.lead("energy").over(ws).alias("ne"),
        )
        .filter(
            F.col("pe").isNotNull()
            & F.col("ne").isNotNull()
            & (e > F.col("pe"))
            & (e > F.col("ne"))
        )
    )
    lm = (
        pk.select(
            "media_id",
            F.col("window_no").alias("w1"),
            F.col("energy").alias("e1"),
            F.lead("window_no").over(ws.orderBy("window_no")).alias("w2"),
            F.lead("energy").over(ws.orderBy("window_no")).alias("e2"),
        )
        .filter(
            F.col("w2").isNotNull() & ((F.col("w2") - F.col("w1")) <= max_gap)
        )
        .select(
            "media_id",
            "w1",
            (F.col("e1") % key_mod).alias("k1"),
            (F.col("e2") % key_mod).alias("k2"),
            (F.col("w2") - F.col("w1")).alias("dt"),
        )
    )
    a = lm.select(
        F.col("media_id").alias("id_a"), F.col("w1").alias("wa"), "k1", "k2", "dt"
    )
    b = lm.select(
        F.col("media_id").alias("id_b"), F.col("w1").alias("wb"), "k1", "k2", "dt"
    )
    return (
        a.join(b, ["k1", "k2", "dt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b", (F.col("wa") - F.col("wb")).cast("long").alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= min_matches)
    )


def scene_cuts(
    media: DataFrame,
    every_n_bytes: int = 64,
    threshold: int = 5000,
) -> DataFrame:
    """Scene-change detection over sampled video frames: a cut is a
    frame whose feature distance from the previous frame exceeds
    ``threshold`` — the standard shot-boundary heuristic (a real build
    compares decoded-frame color histograms; here the per-frame feature
    is the deterministic energy stat derived from the frame checksum,
    the window_audio convention, so the whole mapInPandas-then-window
    pipeline is value-checkable in SQL).

    Plan: sample_frames (1-in/N-out mapInPandas, frame count bounded
    per media) -> per-media lag window (colocated — frames of one
    video never shuffle apart) -> cut rows. Output volume is
    cut-bounded, not frame-bounded. At 100 TB each video's frames stay
    one partition-local group; the corpus dimension parallelizes
    across media ids."""
    frames = sample_frames(media, every_n_bytes=every_n_bytes)
    energy = (
        F.conv(F.substring("frame_checksum", 1, 6), 16, 10).cast("long") % 10000
    ).alias("energy")
    w = Window.partitionBy("media_id").orderBy("frame_no")
    e = frames.select("media_id", "frame_no", energy)
    return (
        e.select(
            "media_id",
            "frame_no",
            "energy",
            F.lag("energy").over(w).alias("prev_energy"),
        )
        .filter(
            F.col("prev_energy").isNotNull()
            & (F.abs(F.col("energy") - F.col("prev_energy")) > threshold)
        )
        .select(
            "media_id",
            F.col("frame_no").alias("cut_frame"),
            "prev_energy",
            "energy",
            F.abs(F.col("energy") - F.col("prev_energy")).cast("long").alias("delta"),
        )
    )
