"""Document chunking and token-stream packing — the two transforms that
turn a deduped, filtered corpus into model-ready training sequences.

- ``chunk_documents``: sliding-window token chunks (width C, overlap V):
  chunk i covers tokens [i*(C-V), i*(C-V)+C). Narrow after one staging
  projection (tokens materialized once per row — see
  operators/dedup.shingles_col for why the staging select matters);
  the explode multiplies rows but never shuffles.

- ``pack_documents``: contiguous stream packing — lay all documents
  head-to-tail in doc_id order and cut the stream into fixed
  ``capacity``-token context windows (doc boundaries may straddle bins:
  that is exactly how causal-LM pretraining packs sequences). The global
  running offset uses the same range-partition + broadcast-offset
  pattern as operators/renumber.renumber: NO single-task global window;
  driver traffic is O(num_partitions) longs of metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.hashing import normalize_text


def _tok_staged(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(normalize_text(F.col(text_col)), " ")
    staged = docs.select(F.col(id_col), toks.alias("toks"))
    n = F.when(F.concat_ws(" ", F.col("toks")) == "", F.lit(0)).otherwise(
        F.size(F.col("toks"))
    )
    return staged.select(F.col(id_col), F.col("toks"), n.cast("long").alias("n_tokens"))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens). Documents with
    zero tokens produce no chunks; the final chunk may be shorter than
    ``chunk_tokens``. stride = chunk_tokens - overlap must be > 0."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    staged = _tok_staged(docs, id_col, text_col).filter(F.col("n_tokens") >= 1)
    n_chunks = F.floor((F.col("n_tokens") + (stride - 1)) / F.lit(stride))
    exploded = staged.select(
        F.col(id_col),
        F.col("toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


def pack_token_counts(
    df: DataFrame,
    count_col: str,
    order_cols: list[str],
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Core stream packer over precomputed token counts: append
    start_offset / bin_id / offset_in_bin under the global stream order
    given by ``order_cols``.

    Two-phase global prefix sum (the renumber pattern): range-partition
    on the order key, per-partition totals to the driver (O(partitions)
    longs of metadata, not data), partition-local window cumsum +
    broadcast base offsets. No single-task global window."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint: the totals collect below and the final output are
    # two separate jobs; without materializing, each re-runs
    # repartitionByRange whose range boundaries come from a per-RDD-seed
    # SAMPLE — the two jobs can disagree on row->partition assignment,
    # making the offset map wrong. Checkpointing pins one partitioning
    # that both jobs read.
    # Tradeoff: localCheckpoint truncates lineage onto executor-local
    # storage (an executor loss mid-query is unrecoverable) and forces
    # eager materialization for every caller. If recoverability matters
    # more than the extra pass at your scale, compute the range split
    # points once (sampleByKey / approxQuantile on order_cols), pin them
    # explicitly, and reuse across both jobs — or persist() with a
    # replicated StorageLevel instead.
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(count_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    start = F.sum(count_col).over(w) - F.col(count_col) + offset_map[F.col("_pid")]
    return (
        ranged.withColumn("start_offset", start)
        .withColumn(
            "bin_id", F.floor(F.col("start_offset") / F.lit(capacity)).cast("long")
        )
        .withColumn("offset_in_bin", F.col("start_offset") % capacity)
        .drop("_pid")
    )


def pack_documents(
    docs: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document its offset in the packed token stream and
    the context-window bin that offset falls into.

    Output: (id, n_tokens, start_offset, bin_id, offset_in_bin), stream
    order = ascending id."""
    base = _tok_staged(docs, id_col, text_col).select(id_col, "n_tokens")
    packed = pack_token_counts(base, "n_tokens", [id_col], capacity, num_partitions)
    return packed.select(
        id_col, "n_tokens", "start_offset", "bin_id", "offset_in_bin"
    )


def pack_documents_bpe(
    docs: DataFrame,
    capacity: int = 512,
    rounds: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """pack_documents with REAL subword counts: the packing offsets are
    computed over each document's BPE token count (bpe_encode — the
    learned-merge apply join), not its whitespace word count, so a
    context window holds exactly ``capacity`` model tokens. Same
    distributed prefix-sum; only the count column changes.

    Output: (id, n_tokens, start_offset, bin_id, offset_in_bin)."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        BPE_ROUNDS,
        bpe_encode,
    )

    base = bpe_encode(
        docs, rounds if rounds is not None else BPE_ROUNDS, id_col, text_col
    ).select(id_col, "n_tokens")
    packed = pack_token_counts(base, "n_tokens", [id_col], capacity, num_partitions)
    return packed.select(
        id_col, "n_tokens", "start_offset", "bin_id", "offset_in_bin"
    )


def packing_frontier(
    docs: DataFrame,
    capacities: tuple[int, ...] = (256, 512, 1024, 2048),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-length frontier for contiguous stream packing: for each
    candidate capacity L, how many documents STRADDLE a window boundary
    (they either attend across unrelated neighbors or must be split —
    the cross-contamination cost Krell et al. 2021 quantify) and how
    much tail padding the last window carries. The table a pipeline
    reads to pick its context length: bigger L packs tighter (less
    tail waste) but straddles more documents.

    Plan: token counts + ONE distributed prefix sum (pack_token_counts'
    two-phase pattern — offsets are capacity-independent), then the
    4-row capacity dimension broadcast-crosses the offset table and
    everything reduces in a combiner groupBy; a 1-row corpus-total
    broadcast closes the padding column. All counts exact integers;
    the two fractions are the only floats."""
    base = _tok_staged(docs, id_col, text_col).select(id_col, "n_tokens")
    nonempty = base.filter(F.col("n_tokens") > 0)
    packed = pack_token_counts(nonempty, "n_tokens", [id_col], 1 << 30)
    caps = docs.sparkSession.createDataFrame(
        [(int(c),) for c in capacities], "capacity long"
    )
    j = packed.crossJoin(F.broadcast(caps)).select(
        "capacity",
        "n_tokens",
        (
            F.floor(F.col("start_offset") / F.col("capacity"))
            != F.floor(
                (F.col("start_offset") + F.col("n_tokens") - 1)
                / F.col("capacity")
            )
        )
        .cast("int")
        .alias("straddles"),
    )
    per_cap = j.groupBy("capacity").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("straddles").cast("long").alias("n_straddling"),
    )
    n_bins = (F.floor((F.col("total_tokens") - 1) / F.col("capacity")) + 1).cast(
        "long"
    )
    return per_cap.select(
        "capacity",
        "n_docs",
        "total_tokens",
        n_bins.alias("n_bins"),
        "n_straddling",
        F.round(F.col("n_straddling") / F.col("n_docs"), 6).alias(
            "straddle_frac"
        ),
        F.round(
            (n_bins * F.col("capacity") - F.col("total_tokens"))
            / (n_bins * F.col("capacity")),
            6,
        ).alias("padding_frac"),
    )
