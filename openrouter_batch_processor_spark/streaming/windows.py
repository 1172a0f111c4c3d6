"""Structured Streaming twins of the batch event analytics, plus the
reference's progress-reporting behaviors (T1/T2) as streaming state.

The reference's 'streaming' is incremental batch: after every LLM group
it rewrites meta.json with processed/total counters, and a client polls
it (worker.py:351-353, app.py:938-948). In Spark that becomes:

- readStream over the events source -> watermarked tumbling windows ->
  an in-memory/table sink the poll endpoint queries (T2).
- progress = a streaming aggregation checkpointed by the engine (T1) —
  the checkpoint directory replaces the meta.json file-as-state-store.
- session windows (F.session_window) for gap-based sessions — the
  native streaming form of operators/windows.sessionize.

All queries here use availableNow triggers in tests: process everything
currently available, then stop — deterministic, CI-friendly, and the
semantics (incl. watermark bookkeeping) are identical to a long-running
trigger. At scale the same code runs continuously with checkpoints on
durable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def read_events_stream(
    spark: SparkSession, sf_dir: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet directory.

    A parquet file dropped into the directory is one micro-batch unit —
    the streaming mirror of the reference's 'new zip arrives' ingest.
    The driver testdata stores ts as TIMESTAMP(NANOS) which Spark reads
    as long under nanosAsLong; normalize to a timestamp column here.

    The source path targets the events file glob, not the whole sf dir:
    the sf dir also holds the other tables' parquet files, which under
    an events schema surface as all-null rows (one phantom null key per
    foreign file in downstream dedup/aggregation).
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # A glob, not the bare file path: the file-stream source derives
    # basePath from the non-glob path prefix and requires a directory
    # (a literal file path fails at getBatch). "events.*" keeps the
    # source pinned to the events table either way.
    df = reader.parquet(os.path.join(sf_dir, "events.*"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (LTZ). The session timezone is
        # pinned to UTC (session.py), so the cast is value-preserving.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling aggregation — same output columns as the
    batch tumbling_counts, so batch results are the oracle for the
    streaming run (test strategy: stream(availableNow) == batch).

    The watermark bounds state: windows older than max(event_time) -
    watermark are finalized and evicted. Late events inside the
    watermark are merged; beyond it, dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def session_windows_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (F.session_window): per-user sessions that
    close after ``gap`` of inactivity. The streaming form of
    operators/windows.sessionize; state eviction via the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), TS_FMT).alias("session_start"),
            F.date_format(F.col("sw.end"), TS_FMT).alias("session_end"),
            "n_events",
        )
    )


def read_documents_stream(spark: SparkSession, sf_dir: str, schema=None) -> DataFrame:
    """File-source stream over the documents parquet — the continuous-
    corpus-ingest mirror of the batch documents table (one arriving
    parquet file = one micro-batch unit). Same glob rationale as
    read_events_stream."""
    import os

    if schema is None:
        schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return spark.readStream.schema(schema).parquet(os.path.join(sf_dir, "documents.*"))


def quality_gated_dedup_stream(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Streaming corpus-ingest gate: arriving documents are quality-
    scored (pure per-row expressions — no shuffle, scores in flight),
    low-quality docs dropped at the gate, survivors exact-deduped on
    (source, content fingerprint) via streaming dropDuplicates.

    Emits the deterministic (source, fp) key set — survivor doc_ids
    would be arrival-order-dependent, the key set is not (same contract
    as dedup_events_stream). Documents carry no event time, so the
    dedup state is unbounded here; a production ingest adds an arrival
    timestamp + dropDuplicatesWithinWatermark to bound it (the events
    twin demonstrates exactly that)."""
    from openrouter_batch_processor_spark.operators.textanalysis import quality_scores

    scored = quality_scores(docs, extra_cols=("source", "text"))
    return (
        scored.filter(F.col("quality_score") >= threshold)
        .select("source", F.md5(F.col("text")).alias("fp"))
        .dropDuplicates(["source", "fp"])
    )


def dedup_events_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type", "event_date"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — X1 in flight, via
    dropDuplicatesWithinWatermark.

    The batch registry dedups a static corpus by fingerprint; in a
    continuous ingest pipeline the same contract is 'drop re-deliveries
    of a key seen within the watermark horizon'. The watermark bounds
    the dedup state: keys older than max(event_time) - watermark are
    evicted, so state is O(arrival rate x horizon) instead of O(history)
    — the property that makes exactly-once ingest dedup viable at
    100 TB/day. Emits only the key columns: the emitted set over a run
    equals SELECT DISTINCT keys, which is exactly the batch oracle
    (first-seen row payloads would be arrival-order-dependent; the key
    set is not)."""
    e = events.withColumn("event_date", F.date_format(F.col("ts"), "yyyy-MM-dd"))
    return (
        e.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )


def click_attribution_stream(
    events: DataFrame, horizon: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Stream-stream interval self-join: attribute each purchase to the
    clicks by the same user within ``horizon`` before it.

    The canonical streaming join shape: both sides carry watermarks and
    the join condition carries the event-time constraint, so the engine
    can bound buffered state — click rows older than
    max(event_time) - watermark - horizon can never match a future
    purchase and are evicted. Without the time constraint a
    stream-stream join would buffer forever; this is what makes the join
    viable on an unbounded 100 TB/day stream.

    Output delay_sec uses truncated-to-second timestamps on both sides
    (unix_timestamp), matching the batch oracle's floor(epoch(ts))."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        "user_id",
        F.date_format("click_ts", TS_FMT).alias("click_at"),
        F.date_format("purchase_ts", TS_FMT).alias("purchase_at"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "delay_sec"
        ),
    )


def progress_stream(results_stream: DataFrame) -> DataFrame:
    """T1/T2: running processed/ok/failed counters per job — the
    streaming replacement for the per-group meta.json rewrite.

    Input: a stream of LLM result rows with (job_id, ok). Output: one
    row per job with monotonically-updating counters; a poll endpoint
    reads the sink table instead of a meta.json file."""
    return results_stream.groupBy("job_id").agg(
        F.count(F.lit(1)).alias("processed"),
        F.count(F.when(F.col("ok"), 1)).alias("succeeded"),
        F.count(F.when(~F.col("ok"), 1)).alias("failed"),
    )


def ephemeral_checkpoint_dir() -> str:
    """Temp checkpoint location for a run-to-completion availableNow
    query, on the fastest local volume (tmpfs when the platform has
    one). The WAL/offset-log commits and every state-store delta file
    of the run land there — on this class of box that is ~0.5 s per
    stateful query vs a disk-backed temp dir (measured: tumbling
    addBatch 1378 -> 911 ms). These checkpoints are DELETED after the
    run — they are the in-flight scratch state of a finite run, not
    recovery state; a production continuous stream passes an explicit
    durable checkpoint_dir exactly as before."""
    import os
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(dir=base, prefix="spark-ckpt-")


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
    shuffle_partitions: int | None = 8,
) -> None:
    """Execute a streaming DF with Trigger.AvailableNow into a memory
    sink table named ``query_name``; blocks until all available data is
    processed. Reads: spark.table(query_name).

    ``shuffle_partitions`` caps the STATEFUL shuffle width for this run:
    a streaming query instantiates one state store per shuffle
    partition, and with AQE disabled for stateful workloads the batch
    default (32 here) pays 32 store setups for kilobyte-scale state. A
    long-running production stream sizes this to state volume instead;
    the conf is restored after the run (streaming queries pin their
    partitioning at first start, so this can't affect batch plans).

    Without an explicit ``checkpoint_dir`` the run uses an ephemeral
    tmpfs checkpoint (ephemeral_checkpoint_dir above), removed after
    termination."""
    import shutil

    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    tmp_ckpt = None
    if not checkpoint_dir:
        tmp_ckpt = checkpoint_dir = ephemeral_checkpoint_dir()
    try:
        writer = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        q = writer.start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if tmp_ckpt:
            shutil.rmtree(tmp_ckpt, ignore_errors=True)


def static_enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    watermark: str = "2 hours",
    width: str = "1 day",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event joins
    a slowly-changing dimension (here: nation, keyed by user_id % 25)
    BEFORE the stateful aggregation. The static side re-resolves per
    micro-batch (Spark re-plans the batch side each trigger — that's the
    stream-static contract) and broadcasts, so the join adds no state
    and no extra shuffle; the only state is the windowed agg's.

    Decimal value sums make the per-window totals independent of
    micro-batch slicing — the stream run at ANY trigger cadence equals
    the one-shot batch plan, which is the oracle."""
    enriched = (
        events.withColumn("n_nationkey", (F.col("user_id") % 25).cast("int"))
        .join(F.broadcast(dim.select("n_nationkey", "n_name")), "n_nationkey")
    )
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width).alias("w"), F.col("n_name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "n_name",
            "n_events",
            "value_sum",
        )
    )


def winnow_decontaminate_stream(
    docs: DataFrame, bench_fps: DataFrame, bench_source: str = "src0"
) -> DataFrame:
    """Streaming benchmark decontamination by winnowing fingerprints
    (the GPT-3 n-gram contamination check upgraded to the Schleimer
    local-guarantee sketch, running IN FLIGHT): arriving documents are
    sketched with the pure-array winnowing form (dedup.
    winnow_keys_long — no window function, so it is legal on a
    stream; gram array staged under the explode_outer Generate so each
    gram hashes once and no size()>0 filter re-inlines the chain), and
    a STREAM-STATIC semi join against the benchmark's fingerprint index
    keeps only contaminated (doc, fp) pairs. Stream-static joins are
    stateless — state is O(0), the static side broadcasts — so this
    gate runs at ingest rate at any corpus size; any shared
    >= k+w-1-token run with the benchmark is guaranteed to surface.

    Emits (doc_id, source, fp) per contaminated fingerprint,
    append-mode; the consumer rolls up per doc."""
    from openrouter_batch_processor_spark.operators.dedup import (
        _WINNOW_POSCAP,
        winnow_keys_long,
    )

    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    # Explicit round-robin spread: the file source hands one task per
    # arriving file, and the winnowing chain is the most expensive
    # per-row expression in the repo — without this a single-file
    # micro-batch sketches its whole batch on ONE core (measured 8x on
    # local[32]). Stateless narrow-ish shuffle, legal on streams.
    par = docs.sparkSession.sparkContext.defaultParallelism
    toked = (
        docs.filter(F.col("source") != bench_source)
        .repartition(par)
        .select(
            "doc_id",
            "source",
            F.split(normalize_text(F.col("text")), " ").alias("toks"),
        )
    )
    sel = winnow_keys_long(toked).select(
        "doc_id",
        "source",
        F.expr(f"key div {_WINNOW_POSCAP}").cast("long").alias("fp"),
    )
    return sel.join(bench_fps.select("fp"), "fp", "leftsemi").select(
        "doc_id", "source", "fp"
    )


def blocklist_gate_stream(docs: DataFrame) -> DataFrame:
    """Streaming C4 blocklist gate: arriving documents are screened
    against the literal blocklist IN FLIGHT (pure per-row array
    expressions — curation.blocklist_filter's exact columns, no
    shuffle, no state), emitting one row per flagged doc as it
    arrives. The moderation-queue shape: at 100 TB/day the gate runs
    at ingest rate and only violations flow downstream."""
    from openrouter_batch_processor_spark.operators.curation import (
        blocklist_filter,
    )

    return blocklist_filter(docs)


def benford_digit_stream(events: DataFrame) -> DataFrame:
    """Streaming Benford screen: arriving event values map to their
    leading digit IN FLIGHT (exact integer-cents extraction — the
    batch benford_digits contract; pure per-row expressions, no
    shuffle, no state). Downstream the digit stream rolls up to the
    first-digit distribution — the live fabricated-data monitor on an
    ingest pipeline."""
    cents = F.round(F.col("value") * 100).cast("long")
    return events.filter(F.col("value") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )


def langid_stream(docs: DataFrame) -> DataFrame:
    """Streaming language-ID scorer: arriving documents are scored by
    the marker-list heuristic IN FLIGHT (language_id's exact CASE
    ladder — pure per-row expressions, no shuffle, no state), emitting
    (source, true lang, pred_lang) per doc. Downstream the stream
    rolls up to per-(source, pred) counts + agreement — the live
    language-mix monitor on an ingest pipeline."""
    from openrouter_batch_processor_spark.operators.textanalysis import (
        language_id,
    )

    return language_id(docs, extra_cols=("source", "lang")).select(
        "doc_id", "source", "lang", "pred_lang"
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str, schema=None) -> DataFrame:
    """File-source stream over the embeddings parquet — the
    continuous-ingest mirror of the batch embeddings table (same glob
    rationale as read_documents_stream)."""
    import os

    if schema is None:
        schema = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).schema
    return spark.readStream.schema(schema).parquet(
        os.path.join(sf_dir, "embeddings.*")
    )


def emb_drift_sums_stream(
    embeddings_stream: DataFrame, documents_static: DataFrame
) -> DataFrame:
    """Streaming stage of the per-source embedding-drift monitor: the
    arriving vector stream joins the STATIC documents dimension for its
    source tag (stream-static inner join — no state), fans out to
    (source, dim) rows and folds exact DECIMAL(38,12) per-dimension
    sums + counts in complete mode. The totals are arrival-order
    invariant (decimal addition is associative), so the finished drift
    table — assembled batch-side from this sink by the same mean/dot
    arithmetic as operators/neighbors.source_centroid_drift — is
    bit-identical to the batch audit at any micro-batch partitioning.

    At 100 TB this is the standing drift monitor: state is
    |sources| x d rows of decimal sums regardless of stream volume."""
    from pyspark.sql import functions as F

    j = embeddings_stream.join(
        documents_static.select(
            F.col("doc_id").alias("vec_id"), F.col("source").alias("grp")
        ),
        "vec_id",
    )
    dims = j.select(
        "grp",
        F.posexplode(
            F.transform(F.col("embedding"), lambda v: v.cast("double"))
        ).alias("pos", "x"),
    )
    return dims.groupBy("grp", "pos").agg(
        F.sum(F.col("x").cast("decimal(38,12)")).alias("sx"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
