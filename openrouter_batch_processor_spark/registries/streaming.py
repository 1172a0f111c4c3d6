"""Structured Streaming + CDC queries: watermark dedup, stateful gates,
session windows, availableNow tumbling, CDC upsert/rollup.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "streaming_llm_pipeline",
    PIPELINE_ORACLE_SQL,
    ops=["S5", "S6", "S10", "G1", "F9", "F10", "T1", "T2", "T5", "G2"],
)
def q_streaming_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's product loop (app.py:798 submit -> worker.py:246
    process) as ONE Structured Streaming query: archive-arrival
    micro-batches from the zipmembers streaming DataSource -> member
    decode -> stateful per-group prompt assembly -> mock LLM map ->
    usage/cost rows, availableNow into a memory sink. Archives are the
    deterministic per-source fixture built by the K6 writer, so the
    BATCH pipeline's oracle (PIPELINE_ORACLE_SQL over documents)
    value-checks the streaming run bit-for-bit
    (plans/pipeline.py run_streaming_llm_pipeline)."""
    from openrouter_batch_processor_spark.plans.pipeline import (
        run_streaming_llm_pipeline,
    )

    return run_streaming_llm_pipeline(spark, sf_dir)


@register(
    "cdc_snapshot_diff",
    """
    WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
    nxt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN 'xx' ELSE lang END AS lang,
             source, n_chars
      FROM base WHERE doc_id % 17 != 0
      UNION ALL
      SELECT doc_id + 1000000, lang, source, n_chars
      FROM base WHERE doc_id % 19 = 0),
    j AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.lang != n.lang OR o.source != n.source
                       OR o.n_chars != n.n_chars THEN 'changed'
             END AS change_type
      FROM base o FULL OUTER JOIN nxt n ON o.doc_id = n.doc_id)
    SELECT doc_id, change_type FROM j WHERE change_type IS NOT NULL
    """,
    ops=["X1", "J2", "EXT-cdc"],
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance CDC: yesterday's snapshot vs a mutated
    today (every 17th doc removed, every 13th changed, every 19th
    re-added under a new key) -> exactly the added/removed/changed keys.
    The engine compares md5 row-fingerprints (one 32-byte comparison
    per key regardless of row width); the oracle restates it as direct
    column comparison — equivalent up to md5 collision."""
    from openrouter_batch_processor_spark.operators.cdc import snapshot_diff

    base = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    new = (
        base.filter(F.col("doc_id") % 17 != 0)
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 13 == 0, F.lit("xx")).otherwise(F.col("lang")),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 19 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
    )
    return snapshot_diff(base, new, ["doc_id"], ["lang", "source", "n_chars"])


@register(
    "cdc_incremental_rollup",
    """
    WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
    nxt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN 'xx' ELSE lang END AS lang,
             source, n_chars
      FROM base WHERE doc_id % 17 != 0
      UNION ALL
      SELECT doc_id + 1000000, lang, source, n_chars
      FROM base WHERE doc_id % 19 = 0)
    SELECT lang, count(*) AS n_rows, sum(n_chars)::BIGINT AS value_sum
    FROM nxt GROUP BY lang
    """,
    ops=["X1", "G2", "J2", "EXT-cdc", "EXT-rollup"],
)
def q_cdc_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the per-lang (n_rows, chars)
    aggregate of the NEW snapshot computed from the OLD aggregate plus
    signed deltas over only the churned keys — O(churn) maintenance vs
    O(snapshot) rebuild. The oracle recomputes the new snapshot's
    aggregate directly, so a hash match proves the delta math exact."""
    from openrouter_batch_processor_spark.operators.cdc import (
        incremental_agg_maintenance,
    )

    base = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    new = (
        base.filter(F.col("doc_id") % 17 != 0)
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 13 == 0, F.lit("xx")).otherwise(F.col("lang")),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 19 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
    )
    return incremental_agg_maintenance(
        base, new, key_cols=["doc_id"], group_cols=["lang"], value_col="n_chars"
    )


@register(
    "streaming_tumbling_availablenow",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value::DECIMAL(28,10))::DOUBLE, 6) AS value_sum
    FROM events GROUP BY window_start, event_type
    """,
    ops=["T1", "T2", "EXT-windows"],
)
def q_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: file-source stream over the
    events parquet, watermarked tumbling aggregation, availableNow
    trigger into a memory sink (complete mode) — returned as the batch
    of results. availableNow over static parquet is deterministic, so
    the batch tumbling SQL (events_tumbling's oracle) value-checks the
    streaming run; tests/test_streaming.py additionally asserts
    stream == batch DataFrame equality."""
    from openrouter_batch_processor_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_counts_stream,
    )

    stream = tumbling_counts_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_tumbling")
    return spark.table("registry_stream_tumbling")


@register(
    "streaming_dedup_watermark",
    """
    SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d') AS event_date
    FROM events
    """,
    ops=["T1", "X1", "EXT-dedup-policy"],
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup, oracle-checked: the key set emitted by
    dropDuplicatesWithinWatermark over the events stream equals batch
    SELECT DISTINCT — a value-level gate on a real streaming run, not
    just a rows-only smoke."""
    from openrouter_batch_processor_spark.streaming.windows import (
        dedup_events_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = dedup_events_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_dedup", output_mode="append")
    return spark.table("registry_stream_dedup")


@register(
    "streaming_quality_gate",
    f"""
    WITH q AS (
      SELECT source, md5(text) AS fp
      FROM {_quality_sql("documents", "source, text")}
      WHERE quality_score >= 0.5)
    SELECT source, count(DISTINCT fp)::BIGINT AS n_unique_docs
    FROM q GROUP BY source
    """,
    ops=["T1", "X1", "EXT-quality", "EXT-dedup-policy", "G4"],
)
def q_streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus-ingest gate, value-checked: documents stream ->
    in-flight quality scoring -> gate at 0.5 -> streaming exact dedup on
    (source, fingerprint); the emitted key set equals the batch
    filter + DISTINCT, rolled up per source
    (streaming/windows.py quality_gated_dedup_stream)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        quality_gated_dedup_stream,
        read_documents_stream,
        run_to_memory,
    )

    stream = quality_gated_dedup_stream(read_documents_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_qgate", output_mode="append")
    return (
        spark.table("registry_stream_qgate")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_unique_docs"))
    )


@register(
    "streaming_interval_join",
    """
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
           floor(epoch(p.ts))::BIGINT - floor(epoch(c.ts))::BIGINT AS delay_sec
    FROM c JOIN p ON p.user_id = c.user_id
                 AND p.ts >= c.ts
                 AND p.ts < c.ts + INTERVAL 1 DAY
    """,
    ops=["T1", "EXT-rangejoin", "J2", "EXT-windows"],
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval self-join (click->purchase
    attribution), value-checked against the batch SQL interval join —
    the state-bounding streaming join shape, not a smoke test."""
    from openrouter_batch_processor_spark.streaming.windows import (
        click_attribution_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = click_attribution_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_attrib", output_mode="append")
    return spark.table("registry_stream_attrib")


# ===========================================================================
# T1/EXT-sessions — native streaming session windows, value-checked
# ===========================================================================


@register(
    "streaming_session_windows",
    """
    WITH o AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events),
    m AS (SELECT user_id, ts,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM o),
    g AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM m)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM g GROUP BY user_id, sid
    """,
    ops=["T1", "EXT-sessions", "EXT-windows"],
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window over the event STREAM, value-checked
    against the gaps-and-islands batch SQL. Boundary semantics differ
    from the batch sessionize op on purpose: session_window merges only
    OVERLAPPING [ts, ts+gap) intervals, so an event landing exactly at
    the previous session's end starts a new one (oracle: ts-prev >=
    gap, where the lag-based batch op uses >). Complete output mode so
    the availableNow run emits every session including those inside the
    final watermark horizon; a 24/7 deployment would run append mode
    and let the watermark finalize sessions incrementally."""
    from openrouter_batch_processor_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        session_windows_stream,
    )

    stream = session_windows_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_sessions", output_mode="complete")
    return spark.table("registry_stream_sessions")


@register(
    "streaming_static_enrich",
    """
    SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           n.n_name, count(*) AS n_events,
           round(sum(e.value::DECIMAL(28,10))::DOUBLE, 6) AS value_sum
    FROM events e JOIN nation n ON n.n_nationkey = (e.user_id % 25)::INTEGER
    GROUP BY 1, 2
    """,
    ops=["T1", "T2", "J2", "G2", "EXT-windows"],
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (file-source events stream x nation dim) +
    daily windowed rollup, run with Trigger.AvailableNow in complete
    mode; the batch join+group is the value oracle. See
    streaming/windows.static_enrich_stream."""
    from openrouter_batch_processor_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        static_enrich_stream,
    )

    stream = static_enrich_stream(
        read_events_stream(spark, sf_dir), _t(spark, sf_dir, "nation")
    )
    run_to_memory(stream, "registry_stream_enrich", output_mode="complete")
    return spark.table("registry_stream_enrich")


@register(
    "streaming_winnow_decontaminate",
    f"""
    WITH {_WINNOW_SQL},
    src AS (SELECT doc_id, source FROM documents),
    bfp AS (SELECT DISTINCT fp FROM sel JOIN src USING (doc_id)
            WHERE source = 'src0'),
    tfp AS (SELECT DISTINCT sel.doc_id, fp FROM sel JOIN src USING (doc_id)
            WHERE source != 'src0'),
    hits AS (SELECT doc_id, fp FROM tfp WHERE fp IN (SELECT fp FROM bfp))
    SELECT doc_id, count(*)::BIGINT AS n_contam_fps FROM hits GROUP BY 1
    """,
    ops=["T1", "EXT-dedup", "EXT-dedup-policy", "J2", "G2"],
)
def q_streaming_winnow_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming benchmark decontamination, value-checked: arriving
    documents are winnow-sketched with the pure-ARRAY formulation
    (legal on streams — no window function, no shuffle;
    dedup.winnow_keys_col, equivalence to the batch window form pinned
    by test) and semi-joined stream-static against the src0 benchmark
    fingerprint index; the per-doc contaminated-fingerprint counts
    equal the batch winnowing SQL exactly
    (streaming/windows.winnow_decontaminate_stream)."""
    from openrouter_batch_processor_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from openrouter_batch_processor_spark.streaming.windows import (
        read_documents_stream,
        run_to_memory,
        winnow_decontaminate_stream,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = (
        winnow_fingerprints(docs.filter(F.col("source") == "src0"))
        .select("fp")
        .distinct()
    )
    stream = winnow_decontaminate_stream(
        read_documents_stream(spark, sf_dir), bench
    )
    run_to_memory(stream, "registry_stream_winnow", output_mode="append")
    return (
        spark.table("registry_stream_winnow")
        .groupBy("doc_id")
        .agg(F.count_distinct("fp").alias("n_contam_fps"))
    )


@register(
    "streaming_cdc_upsert",
    """
    WITH latest AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events)
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_id AS last_event_id, value AS last_value,
           n_events::BIGINT AS n_events
    FROM latest WHERE rn = 1
    """,
    ops=["T1", "T2", "EXT-cdc", "G2", "O3"],
)
def q_streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latest-wins keyed upsert (SCD1 CDC merge) as a Structured
    Streaming foreachBatch sink over one-file-per-trigger micro-batches;
    the merge is a commutative monoid (count-sum + max-struct), so the
    streamed state equals the batch argmax — which is the oracle.
    streaming/upsert.scd1_upsert_stream."""
    from openrouter_batch_processor_spark.streaming.upsert import (
        events_split_fixture,
        scd1_upsert_stream,
    )

    events_dir = events_split_fixture(spark, sf_dir, n_splits=3)
    return scd1_upsert_stream(spark, events_dir)


@register(
    "streaming_blocklist_gate",
    f"""
    WITH toks AS (SELECT doc_id, source,
                         string_split({_NORM_SQL}, ' ') AS toks
                  FROM documents),
    hits AS (SELECT doc_id, source, t.tok
             FROM toks, unnest(toks.toks) AS t(tok)
             WHERE t.tok IN ('bad', 'crash', 'dup')),
    per AS (SELECT doc_id, source,
                   count(*)::BIGINT AS n_blocked_tokens
            FROM hits GROUP BY 1, 2)
    SELECT source, count(*)::BIGINT AS n_flagged_docs,
           sum(n_blocked_tokens)::BIGINT AS n_blocked_tokens
    FROM per GROUP BY 1
    """,
    ops=["T1", "P1", "EXT-curation", "G4"],
)
def q_streaming_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 blocklist gate running IN FLIGHT, value-checked: the
    documents stream screens against the literal blocklist with pure
    per-row array expressions (no shuffle, no state) and the flagged
    rows roll up per source to exactly the batch gate's counts
    (streaming/windows.blocklist_gate_stream)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        blocklist_gate_stream,
        read_documents_stream,
        run_to_memory,
    )

    stream = blocklist_gate_stream(read_documents_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_blocklist", output_mode="append")
    return (
        spark.table("registry_stream_blocklist")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged_docs"),
            F.sum("n_blocked_tokens").cast("long").alias("n_blocked_tokens"),
        )
    )


@register(
    "streaming_benford_counts",
    """
    WITH o AS (SELECT substr((round(value * 100))::BIGINT::VARCHAR, 1, 1)::BIGINT
                 AS digit
               FROM events WHERE value > 0),
    c AS (SELECT digit, count(*)::BIGINT AS n_obs FROM o GROUP BY 1),
    t AS (SELECT sum(n_obs)::BIGINT AS n FROM c)
    SELECT digit, n_obs, round(n_obs::DOUBLE / n, 6) AS frac_obs
    FROM c, t
    """,
    ops=["T1", "T2", "EXT-audit", "G2"],
)
def q_streaming_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Benford first-digit monitor running IN FLIGHT, value-checked
    against the batch distribution: per-row integer-cents digit
    extraction on the event stream, rollup over the landed stream
    equals audit_benford's counts exactly
    (streaming/windows.benford_digit_stream)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        benford_digit_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = benford_digit_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_benford", output_mode="append")
    counts = (
        spark.table("registry_stream_benford")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = counts.agg(F.sum("n_obs").cast("long").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / F.col("n"), 6).alias("frac_obs"),
    )


@register(
    "streaming_langid_counts",
    f"""
    WITH t AS (SELECT doc_id, source, lang, string_split({_NORM_SQL}, ' ') AS toks
               FROM documents),
    s AS (
      SELECT doc_id, source, lang,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x)))::BIGINT AS score_de,
             len(list_filter(toks, x -> list_contains(['the','and','of','fast','slow','small','big'], x)))::BIGINT AS score_en,
             len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x)))::BIGINT AS score_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x)))::BIGINT AS score_zh
      FROM t),
    p AS (SELECT source, lang,
                 CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_zh THEN 'de'
                      WHEN score_en > score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                      WHEN score_es > score_de AND score_es > score_en AND score_es >= score_zh THEN 'es'
                      WHEN score_zh > score_de AND score_zh > score_en AND score_zh > score_es THEN 'zh'
                      ELSE 'und' END AS pred_lang
          FROM s)
    SELECT source, pred_lang, count(*)::BIGINT AS n_docs,
           sum((pred_lang = lang)::INT)::BIGINT AS n_correct
    FROM p GROUP BY 1, 2
    """,
    ops=["T1", "T2", "EXT-langid", "EXT-streaming-source", "G2", "G4"],
)
def q_streaming_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID running IN FLIGHT on the documents stream (pure
    per-row marker scoring, no state), landed and rolled up to
    per-(source, predicted-lang) counts with true-label agreement —
    the live language-mix monitor
    (streaming/windows.langid_stream)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        langid_stream,
        read_documents_stream,
        run_to_memory,
    )

    stream = langid_stream(read_documents_stream(spark, sf_dir))
    run_to_memory(stream, "registry_stream_langid", output_mode="append")
    return (
        spark.table("registry_stream_langid")
        .groupBy("source", "pred_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
    )


@register(
    "streaming_emb_drift",
    """
    WITH j AS (SELECT d.source AS grp, e.embedding::DOUBLE[] AS v
               FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    dims AS (SELECT grp, u.pos, u.x FROM (
               SELECT grp, unnest(list_transform(range(1, 65),
                        i -> struct_pack(pos := i - 1, x := v[i]))) AS u
               FROM j)),
    sm AS (SELECT grp, pos,
                  sum(x::DECIMAL(38,12))::DOUBLE / count(*) AS m,
                  count(*)::BIGINT AS cnt
           FROM dims GROUP BY 1, 2),
    sv AS (SELECT grp, array_agg(m ORDER BY pos) AS svv,
                  max(cnt)::BIGINT AS n_vecs
           FROM sm GROUP BY 1),
    cm AS (SELECT pos, sum(x::DECIMAL(38,12))::DOUBLE / count(*) AS m
           FROM dims GROUP BY 1),
    cv AS (SELECT array_agg(m ORDER BY pos) AS cvv FROM cm)
    SELECT sv.grp AS source, sv.n_vecs,
           round(sqrt(greatest(
               list_dot_product(sv.svv, sv.svv)
               - 2 * list_dot_product(sv.svv, cv.cvv)
               + list_dot_product(cv.cvv, cv.cvv), 0.0)), 6) AS drift_l2,
           CASE WHEN list_dot_product(sv.svv, sv.svv)
                      * list_dot_product(cv.cvv, cv.cvv) > 0
                THEN round(list_dot_product(sv.svv, cv.cvv)
                           / sqrt(list_dot_product(sv.svv, sv.svv)
                                  * list_dot_product(cv.cvv, cv.cvv)), 6)
           END AS cos_to_corpus
    FROM sv CROSS JOIN cv
    """,
    ops=["T1", "T2", "EXT-simsearch", "EXT-audit", "G2", "J1"],
)
def q_streaming_emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of audit_source_emb_drift: the embedding stream
    joins the static documents dimension, per-(source, dim) exact
    decimal sums fold statefully in complete mode, and the drift table
    (L2 + cosine of each source centroid vs the corpus mean) is
    assembled batch-side from the sink — bit-identical to the batch
    audit at any micro-batch partitioning
    (streaming/windows.emb_drift_sums_stream)."""
    from openrouter_batch_processor_spark.streaming.windows import (
        emb_drift_sums_stream,
        read_embeddings_stream,
        run_to_memory,
    )

    stream = emb_drift_sums_stream(
        read_embeddings_stream(spark, sf_dir), _t(spark, sf_dir, "documents")
    )
    run_to_memory(stream, "registry_stream_embdrift", output_mode="complete")
    sums = spark.table("registry_stream_embdrift")
    svec = (
        sums.select(
            "grp",
            "pos",
            (F.col("sx").cast("double") / F.col("cnt")).alias("m"),
            "cnt",
        )
        .groupBy("grp")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("sv"),
            F.max("cnt").cast("long").alias("n_vecs"),
        )
    )
    cmean = (
        sums.groupBy("pos")
        .agg(
            (
                F.sum("sx").cast("double") / F.sum("cnt")
            ).alias("m")
        )
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    )
    from openrouter_batch_processor_spark.operators.similarity import _dot

    sv, cv = F.col("sv"), F.col("cv")
    d2 = _dot(sv, sv) - 2 * _dot(sv, cv) + _dot(cv, cv)
    return svec.join(F.broadcast(cmean)).select(
        F.col("grp").alias("source"),
        "n_vecs",
        F.round(F.sqrt(F.greatest(d2, F.lit(0.0))), 6).alias("drift_l2"),
        F.when(
            _dot(sv, sv) * _dot(cv, cv) > 0,
            F.round(_dot(sv, cv) / F.sqrt(_dot(sv, sv) * _dot(cv, cv)), 6),
        ).alias("cos_to_corpus"),
    )
