"""Multimodal queries: image tiles/pHash, frame sampling, audio windows.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT sha256(text) AS media_id, text
      FROM documents WHERE doc_id % 11 = 0)
    SELECT media_id,
           i::INT AS frame_no,
           (i * 64)::BIGINT AS "offset",
           substr(sha256(substr(text, i * 64 + 1, 64)), 1, 16) AS frame_checksum
    FROM m CROSS JOIN range(0, 64) r(i)
    WHERE i * 64 < len(text)
    """,
    ops=["D6", "S4", "EXT-multimodal"],
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (1-in/N-out mapInPandas expansion):
    every 11th document plays a video whose payload is sampled every 64
    bytes; each 'frame' is checksummed. The deterministic stub makes the
    whole UDTF-style expansion value-checkable in SQL (documents text is
    ASCII, so DuckDB's character substr == the byte slicing the decoder
    does), same contract as multimodal_features."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        sample_frames,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    files = docs.select(
        F.concat(F.lit("vid/doc_"), F.col("doc_id").cast("string"), F.lit(".mp4")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return sample_frames(media_table(files), every_n_bytes=64)


# ===========================================================================
# Rows-only entries (sql=None -> driver records the weaker rows/schema
# check): multimodal decode plumbing and a true Structured Streaming run
# ===========================================================================


@register(
    "multimodal_audio_windows",
    """
    WITH m AS (
      SELECT sha256(text) AS media_id, text
      FROM documents WHERE doc_id % 7 = 0)
    SELECT media_id,
           i::INT AS window_no,
           (i * 128)::BIGINT AS start_off,
           least(256, len(text) - i * 128)::INT AS n_bytes,
           (('0x' || substr(md5(substr(text, i * 128 + 1, 256)), 1, 6))::BIGINT
             % 10000)::BIGINT AS energy,
           substr(sha256(substr(text, i * 128 + 1, 256)), 1, 16) AS window_checksum
    FROM m CROSS JOIN range(0, 96) r(i)
    WHERE i * 128 < len(text)
    """,
    ops=["D6", "S4", "EXT-multimodal"],
)
def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing plumbing: every 7th document plays a clip framed
    into OVERLAPPING 256-byte windows at a 128-byte hop (50% overlap —
    the real audio feature shape, vs video's disjoint keyframes), each
    with a deterministic energy stat + checksum so the expansion is
    value-checked in SQL (ASCII text: char substr == byte slice, the
    multimodal_frame_sample precedent)
    (operators/multimodal.py window_audio)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        window_audio,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    files = docs.select(
        F.concat(F.lit("aud/doc_"), F.col("doc_id").cast("string"), F.lit(".wav")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return window_audio(media_table(files))


@register(
    "multimodal_features",
    """
    WITH m AS (SELECT sha256(text) AS sh FROM documents)
    SELECT sh AS media_id,
           'image' AS kind,
           (16 + ('0x' || substr(sh, 1, 2))::INT % 64)::INT AS width,
           (16 + ('0x' || substr(sh, 3, 2))::INT % 64)::INT AS height,
           (1 + ('0x' || substr(sh, 5, 2))::INT % 3)::INT AS n_channels,
           substr(sh, 1, 16) AS checksum
    FROM m
    """,
    ops=["D6", "S4", "EXT-multimodal"],
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media pipeline plumbing over real data: documents' text bytes as
    opaque payloads -> media_table -> deterministic fake decode via
    mapInPandas (the container has no codec libs; the Spark-side schema,
    batching, and error-as-data contract are the real thing).

    The fake decoder derives (width, height, channels, checksum) from
    the payload's sha256 digest bytes, so the full mapInPandas output is
    value-checked against a pure-SQL oracle — an exact check on UDF
    plumbing, not a rows-only count (r01 VERDICT item 5)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        extract_features,
        media_table,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(
            F.lit("img/doc_"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, ".png").otherwise(".jpg"),
        ).alias("rel_path"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return extract_features(media_table(files))


@register(
    "multimodal_phash_pairs",
    """
    WITH m AS (SELECT sha256(text) AS media_id, text, length(text)::BIGINT AS L
               FROM documents WHERE length(text) > 0),
    px AS (SELECT media_id,
                  list_transform(range(0, 64),
                                 i -> ord(substr(text, ((i * L) // 64)::INT + 1, 1))) AS pix
           FROM m),
    mu AS (SELECT media_id, pix, list_sum(pix) / 64.0 AS mu FROM px),
    sig AS (SELECT media_id,
                   list_sum(list_transform(range(0, 32),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (31 - i)) ELSE 0 END))::BIGINT AS h_hi,
                   list_sum(list_transform(range(32, 64),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (63 - i)) ELSE 0 END))::BIGINT AS h_lo
            FROM mu),
    bands AS (
      SELECT media_id, h_hi, h_lo, 0 AS band, h_hi // 65536 AS band_val FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 1, h_hi % 65536 FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 2, h_lo // 65536 FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 3, h_lo % 65536 FROM sig),
    cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                    a.h_hi AS hi_a, a.h_lo AS lo_a, b.h_hi AS hi_b, b.h_lo AS lo_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                                      AND a.media_id < b.media_id)
    SELECT id_a, id_b,
           (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 9
    """,
    ops=["D6", "S4", "EXT-multimodal", "EXT-neardup"],
)
def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs via perceptual-hash LSH over the
    media table (documents' bytes as image payloads, the
    multimodal_features construction): a mapInPandas 64-bit
    mean-threshold signature on sampled payload bytes, 4x16-bit band
    candidate join, exact-Hamming verify at <= 9 — an exact value
    oracle over a pandas-UDF hashing stage. See
    operators/multimodal.phash_images / phash_near_pairs."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        staged_phash_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(
            F.lit("img/doc_"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, ".png").otherwise(".jpg"),
        ).alias("rel_path"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return staged_phash_pairs(media_table(files), max_hamming=9)


# ===========================================================================
# Round-4 second wave: ViT patch-grid plumbing + streaming SCD1 upsert
# ===========================================================================


@register(
    "multimodal_image_tiles",
    """
    WITH m AS (SELECT sha256(text) AS media_id, text, length(text)::BIGINT AS L
               FROM documents),
    g AS (SELECT media_id, text, (L // 16) AS H FROM m WHERE L >= 128),
    rc AS (SELECT media_id, text,
                  unnest(flatten(list_transform(range(0, H // 8),
                         r -> list_transform(range(0, 2), c -> [r, c])))) AS t
           FROM g),
    tiles AS (SELECT media_id, t[1] AS tile_row, t[2] AS tile_col,
                     array_to_string(list_transform(range(0, 8),
                        dy -> substr(text, ((t[1]*8 + dy)*16 + t[2]*8)::INT + 1, 8)),
                        '') AS chunk
              FROM rc)
    SELECT media_id, tile_row::BIGINT AS tile_row, tile_col::BIGINT AS tile_col,
           list_sum(list_transform(range(1, 65),
                    i -> ord(substr(chunk, i::INT, 1))))::BIGINT AS byte_sum,
           md5(chunk) AS tile_md5
    FROM tiles
    """,
    ops=["S4", "EXT-multimodal", "D6"],
)
def q_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 8x8 patch grid over binary image payloads (documents'
    bytes as a 16-wide luminance plane, the media-table construction) —
    mapInPandas 1-in/N-out expansion, byte-exact vs the substr oracle
    (ASCII corpus: byte == codepoint). operators/multimodal.tile_images."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        tile_images,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(F.lit("img/doc_"), F.col("doc_id").cast("string"), F.lit(".png")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return tile_images(media_table(files), img_width=16, tile=8)


@register(
    "multimodal_tile_dedup",
    """
    WITH m AS (SELECT sha256(text) AS media_id, text, length(text)::BIGINT AS L
               FROM documents),
    g AS (SELECT media_id, text, (L // 16) AS H FROM m WHERE L >= 128),
    rc AS (SELECT media_id, text,
                  unnest(flatten(list_transform(range(0, H // 8),
                         r -> list_transform(range(0, 2), c -> [r, c])))) AS t
           FROM g),
    tiles AS (SELECT media_id,
                     md5(array_to_string(list_transform(range(0, 8),
                        dy -> substr(text, ((t[1]*8 + dy)*16 + t[2]*8)::INT + 1, 8)),
                        '')) AS tile_md5
              FROM rc)
    SELECT tile_md5,
           count(DISTINCT media_id)::BIGINT AS n_images,
           count(*)::BIGINT AS n_occurrences
    FROM tiles GROUP BY 1 HAVING count(DISTINCT media_id) >= 2
    """,
    ops=["S4", "EXT-multimodal", "EXT-dedup", "X1", "G2", "D6"],
)
def q_tile_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-image duplicate PATCH detection — the watermark/logo/
    template-chrome finder of an image-curation pipeline: exact dedup
    (X1) at tile granularity over the ViT patch grid; tiles recurring
    across >= 2 distinct images surface with their spread. Composition
    of the tested tile expansion (mapInPandas) and a hash-key combiner
    groupBy — at 100 TB the patch table shuffles on tile_md5, never
    pixels (operators/multimodal.tile_images + hash rollup)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        tile_images,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(F.lit("img/doc_"), F.col("doc_id").cast("string"), F.lit(".png")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    tiles = tile_images(media_table(files), img_width=16, tile=8)
    return (
        tiles.groupBy("tile_md5")
        .agg(
            F.count_distinct("media_id").cast("long").alias("n_images"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_images") >= 2)
    )


@register(
    "multimodal_tile_phash_pairs",
    """
    WITH m AS (SELECT sha256(text) AS media_id, text, length(text)::BIGINT AS L
               FROM documents),
    g AS (SELECT media_id, text, (L // 16) AS H FROM m WHERE L >= 128),
    rc AS (SELECT media_id, text,
                  unnest(flatten(list_transform(range(0, H // 8),
                         r -> list_transform(range(0, 2), c -> [r, c])))) AS t
           FROM g),
    tiles AS (SELECT media_id, t[1]::BIGINT AS tile_row, t[2]::BIGINT AS tile_col,
                     array_to_string(list_transform(range(0, 8),
                        dy -> substr(text, ((t[1]*8 + dy)*16 + t[2]*8)::INT + 1, 8)),
                        '') AS ts
              FROM rc),
    px AS (SELECT media_id, tile_row, tile_col,
                  list_transform(range(0, 64),
                                 i -> ord(substr(ts, i::INT + 1, 1))) AS pix
           FROM tiles),
    mu AS (SELECT media_id, tile_row, tile_col, pix,
                  list_sum(pix) / 64.0 AS mu
           FROM px),
    sig AS (SELECT media_id, tile_row, tile_col,
                   list_sum(list_transform(range(0, 32),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (31 - i)) ELSE 0 END))::BIGINT AS h_hi,
                   list_sum(list_transform(range(32, 64),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (63 - i)) ELSE 0 END))::BIGINT AS h_lo
            FROM mu),
    bands AS (
      SELECT media_id, tile_row, tile_col, h_hi, h_lo,
             0 AS band, h_hi // 65536 AS band_val FROM sig UNION ALL
      SELECT media_id, tile_row, tile_col, h_hi, h_lo, 1, h_hi % 65536 FROM sig UNION ALL
      SELECT media_id, tile_row, tile_col, h_hi, h_lo, 2, h_lo // 65536 FROM sig UNION ALL
      SELECT media_id, tile_row, tile_col, h_hi, h_lo, 3, h_lo % 65536 FROM sig),
    hot AS (SELECT band, band_val FROM bands GROUP BY 1, 2 HAVING count(*) > 64),
    pruned AS (SELECT bands.* FROM bands
               WHERE NOT EXISTS (SELECT 1 FROM hot
                                 WHERE hot.band = bands.band
                                   AND hot.band_val = bands.band_val)),
    cand AS (SELECT DISTINCT
                    a.media_id AS id_a, a.tile_row AS row_a, a.tile_col AS col_a,
                    b.media_id AS id_b, b.tile_row AS row_b, b.tile_col AS col_b,
                    a.h_hi AS hi_a, a.h_lo AS lo_a, b.h_hi AS hi_b, b.h_lo AS lo_b
             FROM pruned a JOIN pruned b ON a.band = b.band
                                        AND a.band_val = b.band_val
                                        AND a.media_id < b.media_id),
    v AS (SELECT id_a, id_b,
                 (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::BIGINT
                   AS hamming
          FROM cand
          WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 6)
    SELECT id_a, id_b, count(*)::BIGINT AS n_tile_pairs,
           min(hamming)::BIGINT AS min_hamming
    FROM v GROUP BY 1, 2
    """,
    ops=["S4", "EXT-multimodal", "EXT-neardup", "G2", "D6"],
)
def q_tile_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual cross-image duplicate-patch pairs (VERDICT r07 #7):
    per-tile pHash over the ViT grid, 4x16-bit band candidate join with
    df-capped buckets (boilerplate patches pruned), exact bit_count
    Hamming verify at <= 6, rolled up per image pair — the re-encoded
    watermark/logo finder exact tile_md5 dedup cannot see
    (operators/multimodal.tile_phash_pairs)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        tile_phash_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(F.lit("img/doc_"), F.col("doc_id").cast("string"), F.lit(".png")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return tile_phash_pairs(media_table(files), max_hamming=6, bucket_cap=64)


# ===========================================================================
# Round 9: pHash clusters + audio fingerprint matching
# ===========================================================================


@register(
    "multimodal_phash_clusters",
    """
    WITH RECURSIVE m AS (SELECT sha256(text) AS media_id, text,
                                length(text)::BIGINT AS L
               FROM documents WHERE length(text) > 0),
    px AS (SELECT media_id,
                  list_transform(range(0, 64),
                                 i -> ord(substr(text, ((i * L) // 64)::INT + 1, 1))) AS pix
           FROM m),
    mu AS (SELECT media_id, pix, list_sum(pix) / 64.0 AS mu FROM px),
    sig AS (SELECT media_id,
                   list_sum(list_transform(range(0, 32),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (31 - i)) ELSE 0 END))::BIGINT AS h_hi,
                   list_sum(list_transform(range(32, 64),
                     i -> CASE WHEN pix[i + 1] > mu THEN (1::BIGINT << (63 - i)) ELSE 0 END))::BIGINT AS h_lo
            FROM mu),
    bands AS (
      SELECT media_id, h_hi, h_lo, 0 AS band, h_hi // 65536 AS band_val FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 1, h_hi % 65536 FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 2, h_lo // 65536 FROM sig UNION ALL
      SELECT media_id, h_hi, h_lo, 3, h_lo % 65536 FROM sig),
    cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                    a.h_hi AS hi_a, a.h_lo AS lo_a, b.h_hi AS hi_b, b.h_lo AS lo_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                                      AND a.media_id < b.media_id),
    pairs AS (SELECT id_a, id_b FROM cand
              WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 9),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
    labels AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id, count(*)::BIGINT AS n_members
    FROM labels GROUP BY 1
    """,
    ops=["D6", "S4", "EXT-multimodal", "EXT-neardup", "EXT-minhash", "G2", "J2"],
)
def q_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate clusters: transitive closure (pointer-doubling
    label propagation) over the banded pHash near-pairs — the closure
    step that turns pairwise hits into keep-one-per-cluster sets
    (operators/multimodal.phash_clusters)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        phash_clusters,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(
            F.lit("img/doc_"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, ".png").otherwise(".jpg"),
        ).alias("rel_path"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return phash_clusters(media_table(files), max_hamming=9)


@register(
    "multimodal_audio_fingerprint",
    """
    WITH m AS (SELECT 'aud/doc_' || doc_id || '.wav' AS media_id, text
               FROM documents),
    w AS (SELECT media_id, i::INT AS wno,
                 (('0x' || substr(md5(substr(text, i * 32 + 1, 64)), 1, 6))::BIGINT
                   % 10000) AS energy
          FROM m CROSS JOIN range(0, 96) r(i)
          WHERE i * 32 < len(text)),
    pk AS (SELECT media_id, wno, energy,
                  lag(energy) OVER (PARTITION BY media_id ORDER BY wno) AS pe,
                  lead(energy) OVER (PARTITION BY media_id ORDER BY wno) AS ne
           FROM w),
    p2 AS (SELECT media_id, wno, energy FROM pk
           WHERE pe IS NOT NULL AND ne IS NOT NULL
             AND energy > pe AND energy > ne),
    lm AS (SELECT media_id, wno AS w1, energy AS e1,
                  lead(wno) OVER (PARTITION BY media_id ORDER BY wno) AS w2,
                  lead(energy) OVER (PARTITION BY media_id ORDER BY wno) AS e2
           FROM p2),
    fp AS (SELECT media_id, w1, e1 % 256 AS k1, e2 % 256 AS k2, w2 - w1 AS dt
           FROM lm WHERE w2 IS NOT NULL AND w2 - w1 <= 20)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           (a.w1 - b.w1)::BIGINT AS "offset",
           count(*)::BIGINT AS n_matched
    FROM fp a JOIN fp b ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.dt = b.dt
                       AND a.media_id < b.media_id
    GROUP BY 1, 2, 3 HAVING count(*) >= 2
    """,
    ops=["D6", "S4", "EXT-multimodal", "EXT-neardup", "G2", "J2", "W2"],
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constellation audio fingerprinting (Wang 2003): strict local
    energy peaks over 64-byte/32-hop windows, consecutive-peak
    landmark keys (e1,e2,dt mod 256), matches voted by consistent
    time offset — finds duplicated/clipped tracks; all-integer, the
    landmark equi-join is bucketed never all-pairs
    (operators/multimodal.audio_fingerprint_pairs)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(F.lit("aud/doc_"), F.col("doc_id").cast("string"),
                 F.lit(".wav")).alias("rel_path"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return audio_fingerprint_pairs(files)


@register(
    "multimodal_scene_cuts",
    """
    WITH m AS (
      SELECT sha256(text) AS media_id, text
      FROM documents WHERE doc_id % 11 = 0),
    fr AS (SELECT media_id, i::INT AS frame_no,
                  (('0x' || substr(sha256(substr(text, i * 64 + 1, 64)), 1, 6))::BIGINT
                    % 10000)::BIGINT AS energy
           FROM m CROSS JOIN range(0, 64) r(i)
           WHERE i * 64 < len(text)),
    lg AS (SELECT media_id, frame_no, energy,
                  lag(energy) OVER (PARTITION BY media_id ORDER BY frame_no)
                    AS prev_energy
           FROM fr)
    SELECT media_id, frame_no AS cut_frame, prev_energy, energy,
           abs(energy - prev_energy)::BIGINT AS delta
    FROM lg
    WHERE prev_energy IS NOT NULL AND abs(energy - prev_energy) > 5000
    """,
    ops=["D6", "S4", "EXT-multimodal", "W1"],
)
def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the sampled video frames: per-frame
    energy features (the window_audio checksum-derived stat) compared
    frame-to-frame inside a media-partitioned lag window; a cut is a
    delta above threshold. The mapInPandas frame expansion feeds a
    colocated window — frames of one video never shuffle apart
    (operators/multimodal.scene_cuts)."""
    from openrouter_batch_processor_spark.operators.multimodal import (
        media_table,
        scene_cuts,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    files = docs.select(
        F.concat(F.lit("vid/doc_"), F.col("doc_id").cast("string"), F.lit(".mp4")).alias(
            "rel_path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.length(F.col("text")).cast("long").alias("length"),
    )
    return scene_cuts(media_table(files), every_n_bytes=64, threshold=5000)
