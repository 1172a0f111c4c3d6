"""Reference-parity queries: the scans, sinks, functions, filters,
groups, joins, sorts and windows of SURVEY §2 (S/K/F/P/G/X/J/O/W/T ids).

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "llm_pipeline_mock",
    PIPELINE_ORACLE_SQL,
    ops=["S10", "G1", "F9", "F10", "D4", "D6", "T5", "G2"],
)
def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_llm_pipeline(spark, sf_dir)


@register(
    "llm_pipeline_multimodal",
    """
    WITH files AS (
        SELECT doc_id, source || '/' AS group_id,
               doc_id % 5 = 0 AS is_image,
               source || '/doc_' || lpad(doc_id::VARCHAR, 6, '0') ||
                 CASE WHEN doc_id % 5 = 0 THEN '.png' ELSE '.txt' END AS rel_path,
               text
        FROM documents
    ), frags AS (
        SELECT group_id, rel_path,
               CASE WHEN is_image
                    THEN 'text|Please analyze image: ' || rel_path ||
                         chr(10) || chr(10) ||
                         'image_url|data:image/png;base64,' || to_base64(text::BLOB)
                    ELSE 'text|File: ' || rel_path || chr(10) || text
               END AS frag,
               CASE WHEN is_image
                    THEN len(regexp_extract_all('Please analyze image: ' || rel_path,
                                                '\\S+')) + 85
                    ELSE len(regexp_extract_all('File: ' || rel_path || chr(10) || text,
                                                '\\S+'))
               END AS p_tok
        FROM files
    ), prompts AS (
        SELECT group_id,
               string_agg(frag, chr(10) || chr(10) ORDER BY rel_path) AS payload,
               sum(p_tok)::BIGINT AS prompt_tokens
        FROM frags GROUP BY group_id
    )
    SELECT group_id AS file,
           md5('You are a batch processor.' || chr(10) || payload) AS output,
           TRUE AS ok,
           prompt_tokens,
           1::BIGINT AS completion_tokens,
           prompt_tokens + 1 AS total_tokens,
           round(prompt_tokens * 0.000001, 12) AS cost
    FROM prompts
    """,
    ops=["S4", "S10", "D6", "F9", "F10", "F14", "G1", "T5"],
)
def q_llm_pipeline_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship MARC use case: mixed text+image groups
    through the LLM map as a {type:text}/{type:image_url} parts array
    (worker.py:69-98, 313-319). The mock transport hashes the canonical
    parts serialization, so the oracle pins the exact assembled payload
    — ordering, labels, data-URLs — not just the concatenated text."""
    from openrouter_batch_processor_spark.plans.pipeline import (
        run_llm_pipeline_multimodal,
    )

    return run_llm_pipeline_multimodal(spark, sf_dir)


@register(
    "s2_file_inventory",
    """
    WITH inv AS (
      SELECT doc_id,
             'doc_' || lpad(doc_id::VARCHAR, 6, '0') ||
               CASE doc_id % 7 WHEN 0 THEN '.md' WHEN 5 THEN '.PNG' WHEN 6 THEN ''
                               ELSE '.txt' END AS file_name,
             'input/' || source || '/doc_' || lpad(doc_id::VARCHAR, 6, '0') ||
               CASE doc_id % 7 WHEN 0 THEN '.md' WHEN 5 THEN '.PNG' WHEN 6 THEN ''
                               ELSE '.txt' END AS full_path,
             n_chars AS file_size
      FROM documents)
    SELECT file_name, full_path,
           CASE WHEN regexp_extract(full_path, '(\\.[^./\\\\]+)$', 1) = '' THEN 'unknown'
                ELSE lower(regexp_extract(full_path, '(\\.[^./\\\\]+)$', 1)) END AS file_type,
           file_size
    FROM inv
    """,
    ops=["S2", "F1", "F2"],
)
def q_file_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 7 == 0, ".md")
        .when(F.col("doc_id") % 7 == 5, ".PNG")
        .when(F.col("doc_id") % 7 == 6, "")
        .otherwise(".txt")
    )
    file_name = F.concat(F.lit("doc_"), F.lpad(F.col("doc_id").cast("string"), 6, "0"), ext)
    full_path = F.concat(F.lit("input/"), F.col("source"), F.lit("/"), file_name)
    return docs.select(
        file_name.alias("file_name"),
        full_path.alias("full_path"),
        file_extension(full_path).alias("file_type"),
        F.col("n_chars").alias("file_size"),
    ).orderBy("full_path")


@register(
    "f3_human_size",
    """
    WITH sized AS (
      SELECT l_orderkey, l_linenumber,
             floor(l_extendedprice * power(10.0, (l_linenumber % 5)::DOUBLE))::BIGINT AS size_bytes
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, size_bytes,
           CASE WHEN size_bytes < 1024 THEN size_bytes::VARCHAR || ' B'
                WHEN size_bytes < 1048576 THEN printf('%.2f KB', round(size_bytes / 1024.0, 2))
                WHEN size_bytes < 1073741824 THEN printf('%.2f MB', round(size_bytes / 1048576.0, 2))
                WHEN size_bytes < 1099511627776 THEN printf('%.2f GB', round(size_bytes / 1073741824.0, 2))
                ELSE printf('%.2f TB', round(size_bytes / 1099511627776.0, 2)) END AS size_label
    FROM sized
    """,
    ops=["F3"],
)
def q_human_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    size_bytes = F.floor(
        F.col("l_extendedprice") * F.pow(F.lit(10.0), (F.col("l_linenumber") % 5).cast("double"))
    ).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        size_bytes.alias("size_bytes"),
        human_file_size(size_bytes).alias("size_label"),
    )


@register(
    "f17_status_route",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN 'Running'
                WHEN o_orderstatus = 'P' THEN 'Failed'
                WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' THEN 'Finished'
                WHEN o_totalprice > 100000 THEN 'Running'
                ELSE 'Unknown' END AS status,
           CASE WHEN coalesce(CASE WHEN o_custkey % 3 = 0 THEN 'marc'
                                   WHEN o_custkey % 3 = 1 THEN 'main' END,
                              CASE WHEN o_custkey % 2 = 0 THEN 'marc' ELSE 'main' END) = 'marc'
                THEN 'marc' ELSE 'main' END AS route
    FROM orders
    """,
    ops=["F17", "F18"],
)
def q_status_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    future_state = (
        F.when(F.col("o_orderstatus") == "O", "running")
        .when(F.col("o_orderstatus") == "P", "failed")
        .otherwise(F.lit(None).cast("string"))
    )
    has_results = F.col("o_orderpriority").startswith("1-") | F.col(
        "o_orderpriority"
    ).startswith("2-")
    has_meta = F.col("o_totalprice") > 100000
    source_route = F.when(F.col("o_custkey") % 3 == 0, "marc").when(
        F.col("o_custkey") % 3 == 1, "main"
    )
    return o.select(
        "o_orderkey",
        derive_status(future_state, has_meta, has_results).alias("status"),
        route_label(source_route, F.col("o_custkey") % 2 == 0).alias("route"),
    )


@register(
    "f12_elapsed",
    """
    WITH e AS (
      SELECT l.l_orderkey, l.l_linenumber,
             date_diff('second', o.o_orderdate, l.l_shipdate) AS elapsed_sec
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    fmt AS (
      SELECT *, elapsed_sec // 86400 AS d,
             (elapsed_sec - (elapsed_sec // 86400) * 86400) AS rem
      FROM e)
    SELECT l_orderkey, l_linenumber, elapsed_sec,
           CASE WHEN d = 0 THEN printf('%d:%02d:%02d', rem // 3600, (rem % 3600) // 60, rem % 60)
                ELSE d::VARCHAR || (CASE WHEN abs(d) = 1 THEN ' day, ' ELSE ' days, ' END) ||
                     printf('%d:%02d:%02d', rem // 3600, (rem % 3600) // 60, rem % 60)
           END AS elapsed_str,
           elapsed_sec::DOUBLE AS elapsed_rt
    FROM fmt
    """,
    ops=["F12", "J1"],
)
def q_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # NTZ timestamps need an intermediate cast to TIMESTAMP (session TZ is
    # pinned to UTC by load_table, so the wall time is preserved exactly).
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        (epoch("l_shipdate") - epoch("o_orderdate")).alias("elapsed_sec"),
    )
    # The render + parse round-trip below is 5 regex executions per row
    # over 600k rows, all above an unsplittable single-row-group scan —
    # re-spread the 3-column projection first (measured 3.9 s -> 0.9 s
    # at sf0.1; guide §8: the caller knows the downstream work is
    # narrow and per-row expensive, the optimizer cannot)
    import os as _os

    from openrouter_batch_processor_spark.session import respread_for_narrow_work

    joined = respread_for_narrow_work(
        joined, source_path=_os.path.join(sf_dir, "lineitem.parquet")
    )
    out = joined.withColumn("elapsed_str", format_timedelta(F.col("elapsed_sec")))
    # round-trip through the parser (F12 inverse, app.py:1038-1057)
    return out.withColumn("elapsed_rt", parse_timedelta(F.col("elapsed_str")))


@register(
    "f11_ts_format",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_meta,
           strftime(ts, '%Y_%m_%d_%H_%M_%S') AS ts_zip,
           'results_' || strftime(ts, '%Y%m%d_%H%M%S') || '.txt' AS results_name
    FROM events
    """,
    ops=["F11"],
)
def q_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ts_format(F.col("ts"), "meta").alias("ts_meta"),
        ts_format(F.col("ts"), "zip").alias("ts_zip"),
        F.concat(F.lit("results_"), ts_format(F.col("ts"), "results"), F.lit(".txt")).alias(
            "results_name"
        ),
    )


@register(
    "w1_renumber",
    """
    SELECT doc_id,
           lpad((row_number() OVER (ORDER BY doc_id))::VARCHAR, 9, '0') AS seq,
           replace('record 000000001 from ' || source, '000000001',
                   lpad((row_number() OVER (ORDER BY doc_id))::VARCHAR, 9, '0')) AS output
    FROM documents
    """,
    ops=["W1", "K5"],
)
def q_renumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("record 000000001 from "), F.col("source")).alias("output"),
    )
    return renumber(docs, "doc_id")


# ===========================================================================
# G1 + F5 + G4 + G5 — per-source grouping, set-hash fingerprint, listing
# ===========================================================================


@register(
    "g1_group_hash",
    """
    WITH files AS (
      SELECT source || '/' AS group_id,
             source || '/doc_' || lpad(doc_id::VARCHAR, 6, '0') || '.txt' AS rel_path,
             text
      FROM documents)
    SELECT group_id,
           count(*) AS file_count,
           count(*)::VARCHAR || CASE WHEN count(*) = 1 THEN ' item' ELSE ' items' END AS items_label,
           max(rel_path) AS latest_file,
           md5(string_agg(md5(rel_path || ' ' || text), '' ORDER BY md5(rel_path || ' ' || text))) AS content_hash
    FROM files GROUP BY group_id
    """,
    ops=["G1", "F5", "G4", "G5", "O1"],
)
def q_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openrouter_batch_processor_spark.plans.pipeline import documents_as_files

    files = documents_as_files(_t(spark, sf_dir, "documents"))
    per_file = F.md5(F.concat_ws(" ", F.col("rel_path"), F.col("text")))
    cnt = F.count(F.lit(1))
    return files.groupBy("group_id").agg(
        cnt.alias("file_count"),
        F.concat(
            cnt.cast("string"),
            F.when(cnt == 1, F.lit(" item")).otherwise(F.lit(" items")),
        ).alias("items_label"),
        F.max("rel_path").alias("latest_file"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list(per_file)))).alias(
            "content_hash"
        ),
    )


@register(
    "g2_usage_fold",
    """
    WITH usage AS (
      SELECT user_id % 10 AS job_id,
             event_type != 'error' AS ok,
             user_id % 5 = 0 AS is_byok,
             floor(value * 10)::BIGINT AS prompt_tokens,
             floor(value * 3)::BIGINT AS completion_tokens,
             floor(value * 10)::BIGINT + floor(value * 3)::BIGINT AS total_tokens,
             CASE WHEN event_type = 'purchase' THEN floor(value)::BIGINT END AS reasoning_tokens,
             value * 0.0001 AS cost
      FROM events)
    SELECT job_id,
           count(*) AS api_requests,
           count(CASE WHEN ok THEN 1 END) AS successful_requests,
           count(CASE WHEN NOT ok THEN 1 END) AS failed_requests,
           count(CASE WHEN is_byok THEN 1 END) AS byok_requests,
           sum(prompt_tokens)::BIGINT AS prompt_tokens_sum,
           sum(completion_tokens)::BIGINT AS completion_tokens_sum,
           sum(total_tokens)::BIGINT AS total_tokens_sum,
           coalesce(sum(reasoning_tokens), 0)::BIGINT AS reasoning_tokens_sum,
           round(sum(cost::DECIMAL(28,12))::DOUBLE, 12) AS cost_sum
    FROM usage GROUP BY job_id
    """,
    ops=["G2", "G6", "G3"],
)
def q_usage_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    usage = e.select(
        (F.col("user_id") % 10).alias("job_id"),
        (F.col("event_type") != "error").alias("ok"),
        (F.col("user_id") % 5 == 0).alias("is_byok"),
        F.floor(F.col("value") * 10).cast("long").alias("prompt_tokens"),
        F.floor(F.col("value") * 3).cast("long").alias("completion_tokens"),
        (F.floor(F.col("value") * 10) + F.floor(F.col("value") * 3))
        .cast("long")
        .alias("total_tokens"),
        F.when(F.col("event_type") == "purchase", F.floor(F.col("value")).cast("long")).alias(
            "reasoning_tokens"
        ),
        (F.col("value") * 0.0001).alias("cost"),
    )
    out = usage_summary(usage, ["job_id"])
    # reference treats absent/bad values as 0 per field (worker.py:153-159)
    return out.withColumn(
        "reasoning_tokens_sum", F.coalesce(F.col("reasoning_tokens_sum"), F.lit(0))
    )


# ===========================================================================
# J2 — OR-of-two-keys probe (union of semi-joins)
# ===========================================================================


@register(
    "j2_hash_probe",
    """
    SELECT DISTINCT l.l_orderkey, l.l_linenumber FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_partkey % 5 = 0)
       OR EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey AND s.s_suppkey % 2 = 0)
    """,
    ops=["J2", "X1"],
)
def q_hash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part_keys = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    supp_keys = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 2 == 0)
    by_part = li.join(
        F.broadcast(part_keys), li.l_partkey == part_keys.p_partkey, "leftsemi"
    )
    by_supp = li.join(
        F.broadcast(supp_keys), li.l_suppkey == supp_keys.s_suppkey, "leftsemi"
    )
    return (
        by_part.select("l_orderkey", "l_linenumber")
        .unionByName(by_supp.select("l_orderkey", "l_linenumber"))
        .distinct()
    )


# ===========================================================================
# J5 — priority-ordered resolution chain (coalesce over left joins)
# ===========================================================================


@register(
    "j5_resolution",
    """
    SELECT o.o_orderkey,
           coalesce(CASE WHEN c.c_acctbal > 5000 THEN c.c_name END,
                    n.n_name, 'unknown') AS resolved
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    ops=["J5", "J1", "F18"],
)
def q_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(
                F.when(F.col("c_acctbal") > 5000, F.col("c_name")),
                F.col("n_name"),
                F.lit("unknown"),
            ).alias("resolved"),
        )
    )


# ===========================================================================
# O3 — multi-key sort with nulls-last + top-k
# ===========================================================================


@register(
    "o3_sort_topk",
    """
    SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS priority, o_totalprice
    FROM orders
    ORDER BY priority ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    ops=["O3", "O2", "O4"],
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("priority"),
            "o_totalprice",
        )
        .orderBy(
            F.asc_nulls_last("priority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
    )


# ===========================================================================
# P1-P4 — predicate family (whitelist, prefix, range, exclusion)
# ===========================================================================


@register(
    "p_filters",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang IN ('en', 'de')
      AND source LIKE 'src1%'
      AND n_chars BETWEEN 100 AND 400
      AND source NOT IN ('src13')
    """,
    ops=["P1", "P2", "P3", "P4"],
)
def q_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        F.col("lang").isin("en", "de")
        & F.col("source").startswith("src1")
        & F.col("n_chars").between(100, 400)
        & ~F.col("source").isin("src13")
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "x1_exact_dedup",
    """
    WITH keyed AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 1, 2), ' ')) AS fingerprint
      FROM documents)
    SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS dup_count
    FROM keyed GROUP BY fingerprint HAVING count(*) > 1
    """,
    ops=["X1", "F4"],
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # boilerplate key: first two normalized tokens (guarantees real dup
    # groups on the synthetic corpus; same machinery as full-text X1)
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    prefix = F.array_join(F.slice(F.split(normalize_text(F.col("text")), " "), 1, 2), " ")
    keyed = d.select("doc_id", prefix.alias("text2"))
    return exact_duplicates(keyed, id_col="doc_id", text_col="text2")


@register(
    "f16_formats",
    """
    WITH m AS (
      SELECT user_id, event_id, ts,
             CASE event_type WHEN 'click' THEN ' CSV' WHEN 'view' THEN 'text'
                             WHEN 'purchase' THEN 'json' WHEN 'signup' THEN 'Text'
                             ELSE 'bogus' END AS raw
      FROM events),
    o AS (
      SELECT user_id, trim(lower(raw)) AS fmt,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ord
      FROM m),
    f AS (
      SELECT user_id, fmt, min(ord) AS ford FROM o
      WHERE fmt IN ('text', 'csv', 'json') GROUP BY user_id, fmt),
    agg AS (
      SELECT user_id, string_agg(fmt, ',' ORDER BY ford) AS formats FROM f GROUP BY user_id)
    SELECT u.user_id,
           coalesce(a.formats, CASE WHEN u.user_id % 2 = 0 THEN 'text' ELSE 'csv' END) AS formats
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN agg a ON u.user_id = a.user_id
    """,
    ops=["X2", "F16"],
)
def q_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    mapped = (
        F.when(F.col("event_type") == "click", " CSV")
        .when(F.col("event_type") == "view", "text")
        .when(F.col("event_type") == "purchase", "json")
        .when(F.col("event_type") == "signup", "Text")
        .otherwise("bogus")
    )
    per_user = (
        e.select("user_id", F.struct(F.col("ts"), F.col("event_id"), mapped.alias("raw")).alias("s"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("s")).alias("ordered"))
        .select(
            "user_id",
            F.transform(F.col("ordered"), lambda s: s["raw"]).alias("raws"),
        )
    )
    formats = normalize_formats(F.col("raws"), F.col("user_id") % 2 == 0)
    return per_user.select(
        "user_id", F.array_join(formats, ",").alias("formats")
    )


@register(
    "sources_fingerprint_setops",
    f"""
    WITH fp AS (SELECT source, md5({_NORM_SQL}) AS f FROM documents),
    a AS (SELECT DISTINCT f FROM fp WHERE source IN ('src0','src1','src2')),
    b AS (SELECT DISTINCT f FROM fp WHERE source IN ('src2','src3','src4'))
    SELECT 'in_both' AS bucket, count(*) AS n
    FROM (SELECT f FROM a INTERSECT SELECT f FROM b)
    UNION ALL
    SELECT 'only_first', count(*) FROM (SELECT f FROM a EXCEPT SELECT f FROM b)
    UNION ALL
    SELECT 'only_second', count(*) FROM (SELECT f FROM b EXCEPT SELECT f FROM a)
    """,
    ops=["X1", "X3", "F4", "EXT-dedup-policy"],
)
def q_fingerprint_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra between two source groups' content-fingerprint sets:
    intersect = content shared across crawls, except = exclusive
    content. Spark executes both as hash joins on the 32-byte
    fingerprint (leftsemi/leftanti under the hood) — the contamination /
    overlap-audit primitive for corpus curation."""
    from openrouter_batch_processor_spark.functions.hashing import doc_fingerprint

    docs = _t(spark, sf_dir, "documents")
    fp = docs.select("source", doc_fingerprint(F.col("text")).alias("f"))
    a = fp.filter(F.col("source").isin("src0", "src1", "src2")).select("f").distinct()
    b = fp.filter(F.col("source").isin("src2", "src3", "src4")).select("f").distinct()
    pieces = [
        a.intersect(b).agg(F.lit("in_both").alias("bucket"), F.count(F.lit(1)).alias("n")),
        a.exceptAll(b).agg(F.lit("only_first").alias("bucket"), F.count(F.lit(1)).alias("n")),
        b.exceptAll(a).agg(F.lit("only_second").alias("bucket"), F.count(F.lit(1)).alias("n")),
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


@register(
    "f13_json_repair",
    # The oracle states the ground-truth OUTCOME per constructed case
    # (trailing-comma object -> repaired; fenced -> sliced; prose ->
    # sentinel; array -> parses, no $.lang), rather than re-implementing
    # the repair algorithm in SQL — a semantic oracle for a UDF op.
    """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 2 THEN FALSE ELSE TRUE END AS parse_ok,
           CASE doc_id % 4 WHEN 0 THEN lang WHEN 1 THEN lang ELSE NULL END AS lang_out
    FROM documents
    """,
    ops=["F13", "D5", "K3"],
)
def q_json_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    obj = F.concat(F.lit('{"id": '), i, F.lit(', "lang": "'), F.col("lang"), F.lit('",}'))
    fenced = F.concat(
        F.lit('Here you go:\n```json\n{"id": '), i,
        F.lit(', "lang": "'), F.col("lang"), F.lit('"}\n```'),
    )
    arr = F.concat(F.lit("[1, 2, "), i, F.lit("]"))
    raw = (
        F.when(i % 4 == 0, obj)
        .when(i % 4 == 1, fenced)
        .when(i % 4 == 2, F.lit("no json at all"))
        .otherwise(arr)
    )
    return docs.select(i, json_repair_parse(raw).alias("_r")).select(
        "doc_id",
        F.col("_r.parse_ok").alias("parse_ok"),
        F.get_json_object(F.col("_r.parsed_json"), "$.lang").alias("lang_out"),
    )


@register(
    "f14_f15_encoding",
    """
    SELECT doc_id,
           'data:text/plain;base64,' || to_base64(encode(text)) AS data_url,
           sha256(text) AS content_sha,
           right('sk-or-v1-' || md5(doc_id::VARCHAR), 8) AS api_key_last8
    FROM documents
    """,
    ops=["F14", "F15", "F4", "D6"],
)
def q_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    api_key = F.concat(F.lit("sk-or-v1-"), F.md5(F.col("doc_id").cast("string")))
    from openrouter_batch_processor_spark.functions.hashing import redact_api_key

    return docs.select(
        "doc_id",
        data_url(content, F.lit("text/plain")).alias("data_url"),
        F.sha2(content, 256).alias("content_sha"),
        redact_api_key(api_key).alias("api_key_last8"),
    )


@register(
    "f6_f7_filenames",
    """
    WITH g AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN source || '/'
                  ELSE 'doc_' || doc_id::VARCHAR || '.txt' END AS group_id,
             doc_id % 3 = 0 AS is_folder,
             'upload ' || source || '!.zip' AS upload_name,
             md5(source) AS content_hash
      FROM documents)
    SELECT doc_id,
           CASE WHEN is_folder
                THEN regexp_replace(group_id, '/$', '') || '_folder_output.txt'
                ELSE regexp_replace(group_id, '\\.[^./]+$', '') || '.txt'
           END AS out_name,
           substr(regexp_replace(regexp_replace(upload_name, '\\.zip$', ''),
                                 '[^A-Za-z0-9_.-]+', '_', 'g'), 1, 80)
             || '_' || substr(content_hash, 1, 12) || '.zip' AS storage
    FROM g
    """,
    ops=["F6", "F7", "K4"],
)
def q_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    group_id = F.when(i % 3 == 0, F.concat(F.col("source"), F.lit("/"))).otherwise(
        F.concat(F.lit("doc_"), i.cast("string"), F.lit(".txt"))
    )
    upload = F.concat(F.lit("upload "), F.col("source"), F.lit("!.zip"))
    return docs.select(
        "doc_id",
        output_filename(group_id, i % 3 == 0).alias("out_name"),
        storage_name(upload, F.md5(F.col("source"))).alias("storage"),
    )


@register(
    "f6_storage_collision_names",
    """
    WITH f AS (SELECT doc_id, source || '.zip' AS fname, md5(source) AS chash
               FROM documents),
    n AS (SELECT doc_id,
                 substr(regexp_replace(regexp_replace(fname, '\\.zip$', ''),
                                       '[^A-Za-z0-9_.-]+', '_', 'g'), 1, 80) AS stem,
                 chash
          FROM f),
    r AS (SELECT doc_id, stem || '_' || substr(chash, 1, 12) AS base,
                 row_number() OVER (
                   PARTITION BY stem || '_' || substr(chash, 1, 12)
                   ORDER BY doc_id) AS rn
          FROM n)
    SELECT doc_id, base || '.zip' AS candidate,
           CASE WHEN rn = 1 THEN base || '.zip'
                ELSE base || '_' || rn || '.zip' END AS storage_zip_name,
           rn::BIGINT AS upload_seq
    FROM r
    """,
    ops=["F6", "W1", "O1", "X1"],
)
def q_storage_collision_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's storage-name collision-counter loop
    (app.py:205-226) as a batch window: every doc in a source re-uploads
    the same content (hash = md5(source)), so candidates collide
    per-source and the k-th upload gets the '_k' counter exactly as the
    on-disk while-loop would assign it — in-batch naming is now
    data-plane, not a driver seam
    (functions/paths.py storage_names_with_counters)."""
    from openrouter_batch_processor_spark.functions.paths import (
        storage_names_with_counters,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".zip")).alias("filename"),
        F.md5(F.col("source")).alias("content_hash"),
    )
    return storage_names_with_counters(docs)


@register(
    "f8_footer",
    """
    WITH t AS (
      SELECT doc_id,
             substr(text, 1, 40) ||
               CASE doc_id % 3 WHEN 1 THEN chr(10) WHEN 2 THEN chr(13) ELSE '' END AS body,
             CASE WHEN doc_id % 2 = 0 THEN '-- processed --' ELSE '   ' END AS footer
      FROM documents)
    SELECT doc_id,
           CASE WHEN trim(footer) = '' THEN body
                WHEN ends_with(body, chr(10)) OR ends_with(body, chr(13)) THEN body || footer
                ELSE body || chr(10) || footer
           END AS final_text
    FROM t
    """,
    ops=["F8"],
)
def q_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    body = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.when(i % 3 == 1, F.lit("\n")).when(i % 3 == 2, F.lit("\r")).otherwise(F.lit("")),
    )
    footer = F.when(i % 2 == 0, F.lit("-- processed --")).otherwise(F.lit("   "))
    return docs.select("doc_id", append_footer(body, footer).alias("final_text"))


# ===========================================================================
# G4 child counts, O2 newest-first listing, X3 artifact union,
# P5/P6 path guards + registry prune, J3/J4 broadcast dimension join
# ===========================================================================


@register(
    "g4_child_counts",
    """
    SELECT source,
           count(*) AS n_children,
           count(*)::VARCHAR || ' item' || CASE WHEN count(*) = 1 THEN '' ELSE 's' END AS label
    FROM documents GROUP BY source
    """,
    ops=["G4", "S9"],
)
def q_child_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        n.alias("n_children"),
        F.concat(
            n.cast("string"), F.lit(" item"), F.when(n == 1, F.lit("")).otherwise(F.lit("s"))
        ).alias("label"),
    )


@register(
    "o2_newest_listing",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS modified_at
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 20
    """,
    ops=["O2", "S9", "O4"],
)
def q_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("modified_at"),
        )
        .orderBy(F.desc(F.col("modified_at")), F.asc("event_id"))
        .limit(20)
    )


@register(
    "x3_artifact_union",
    """
    SELECT DISTINCT artifact FROM (
      SELECT 'texts/doc_' || doc_id::VARCHAR || '.txt' AS artifact
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'output_' || source || '.csv' FROM documents
      WHERE CASE WHEN length(source) % 2 = 0 THEN TRUE ELSE FALSE END
      UNION ALL
      SELECT 'output_' || source || '.json' FROM documents
      WHERE CASE WHEN length(source) % 2 = 1 THEN TRUE ELSE FALSE END
      UNION ALL
      SELECT 'meta.json' FROM documents)
    """,
    ops=["X3", "K7"],
)
def q_artifact_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    texts = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("texts/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "artifact"
        )
    )
    csvs = docs.filter(F.length("source") % 2 == 0).select(
        F.concat(F.lit("output_"), F.col("source"), F.lit(".csv")).alias("artifact")
    )
    jsons = docs.filter(F.length("source") % 2 == 1).select(
        F.concat(F.lit("output_"), F.col("source"), F.lit(".json")).alias("artifact")
    )
    metas = docs.select(F.lit("meta.json").alias("artifact"))
    return texts.unionByName(csvs).unionByName(jsons).unionByName(metas).distinct()


@register(
    "p5_p6_path_guards",
    """
    WITH candidates AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN '../escape/doc_' || doc_id::VARCHAR
                  WHEN doc_id % 5 = 1 THEN 'input/' || source || '/../../etc/passwd'
                  ELSE 'input/' || source || '/doc_' || doc_id::VARCHAR || '.txt'
             END AS path
      FROM documents),
    safe AS (
      SELECT * FROM candidates
      WHERE path NOT LIKE '..%' AND path NOT LIKE '%/../%' AND path LIKE 'input/%'),
    on_disk AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)
    SELECT s.doc_id, s.path FROM safe s
    WHERE s.doc_id IN (SELECT doc_id FROM on_disk)
    """,
    ops=["P5", "P6", "J2"],
)
def q_path_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    path = (
        F.when(i % 5 == 0, F.concat(F.lit("../escape/doc_"), i.cast("string")))
        .when(i % 5 == 1, F.concat(F.lit("input/"), F.col("source"), F.lit("/../../etc/passwd")))
        .otherwise(
            F.concat(F.lit("input/"), F.col("source"), F.lit("/doc_"), i.cast("string"), F.lit(".txt"))
        )
    )
    cand = docs.select(i, path.alias("path"))
    safe = cand.filter(
        ~F.col("path").startswith("..")
        & ~F.col("path").contains("/../")
        & F.col("path").startswith("input/")
    )
    on_disk = docs.filter(i % 2 == 0).select("doc_id")
    return safe.join(on_disk, "doc_id", "leftsemi")


@register(
    "j3_j4_model_dim_join",
    """
    WITH dim(idx, model_id, label, grp) AS (
      VALUES (0, 'openai/gpt-4o', 'GPT-4o', 'OpenAI'),
             (1, 'anthropic/claude-sonnet', 'Claude Sonnet', 'Anthropic'),
             (2, 'google/gemini-pro', 'Gemini Pro', 'Google'),
             (3, 'meta-llama/llama-3', 'Llama 3', 'Meta'),
             (4, 'mistralai/mistral-large', 'Mistral Large', 'Mistral'))
    SELECT d.grp, d.label,
           count(*) AS n_jobs,
           sum(o.o_totalprice::DECIMAL(18,4))::DOUBLE AS total_price
    FROM orders o JOIN dim d ON o.o_orderkey % 5 = d.idx
    GROUP BY d.grp, d.label
    """,
    ops=["J3", "J4", "D10", "G2"],
)
def q_model_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # VALUES literal, not createDataFrame: the dim is plan-embedded (no
    # Py4J/RDD roundtrip, no extra job) and still broadcast.
    values = ", ".join(
        f"({i}, '{m}', '{lb}', '{g}')" for i, m, lb, g in MODEL_CATALOG
    )
    dim = spark.sql(
        f"SELECT * FROM (VALUES {values}) AS t(idx, model_id, label, grp)"
    )
    return (
        orders.withColumn("idx", F.col("o_orderkey") % 5)
        .join(F.broadcast(dim), "idx")
        .groupBy("grp", "label")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias(
                "total_price"
            ),
        )
    )


@register(
    "p7_sentinel_groups",
    """
    WITH g AS (
      SELECT source AS group_id,
             count(*) FILTER (WHERE doc_id % 3 != 0) AS n_supported,
             count(*) AS n_total
      FROM documents GROUP BY source)
    SELECT group_id || '/' AS file,
           CASE WHEN n_total = 0 THEN 'Empty folder'
                WHEN n_supported = 0 THEN 'Unsupported file type'
                ELSE md5('\n' || group_id || ':' || n_supported::VARCHAR)
           END AS output,
           TRUE AS ok
    FROM g
    """,
    ops=["P1", "P7", "S10", "T5"],
)
def q_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups whose files are all filtered by the P1 extension whitelist
    (simulated: doc_id % 3 == 0 is 'unsupported') yield the sentinel row;
    groups with support run the mock transport (worker.py:299-310)."""
    docs = _t(spark, sf_dir, "documents")
    groups = (
        docs.groupBy("source")
        .agg(
            F.count(F.when(F.col("doc_id") % 3 != 0, 1)).alias("n_supported"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.concat(F.col("source"), F.lit("/")).alias("group_id"),
            F.when(F.col("n_total") == 0, F.lit(EMPTY_FOLDER))
            .when(F.col("n_supported") == 0, F.lit(UNSUPPORTED))
            .otherwise(F.lit(None))
            .alias("sentinel"),
            F.concat(
                F.regexp_replace(F.col("group_id"), "/$", ""),
                F.lit(":"),
                F.col("n_supported").cast("string"),
            ).alias("prompt"),
            F.col("n_supported").alias("file_count"),
        )
    )
    out = llm_map(groups, LLMConfig(system_prompt=""), MockTransport)
    return out.select("file", "output", "ok")


@register(
    "x1_dedup_keep_first",
    # Fingerprint = first 5 normalized tokens (boilerplate prefix), so
    # the keep-policy actually collapses rows at test scale.
    """
    WITH fp AS (
      SELECT *, md5(array_to_string(list_slice(
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                 1, 5), ' ')) AS fingerprint
      FROM documents),
    survivors AS (SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY fingerprint)
    SELECT f.doc_id, f.lang, f.source, f.n_chars
    FROM fp f JOIN survivors s ON f.doc_id = s.doc_id AND f.fingerprint = s.fingerprint
    """,
    ops=["X1", "X2", "EXT-dedup-policy"],
)
def q_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    docs = _t(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 5)
    )
    keyed = docs.withColumn("_k", prefix)
    out = dedup_keep_first(keyed, id_col="doc_id", text_col="_k")
    return out.select("doc_id", "lang", "source", "n_chars")


# ===========================================================================
# D7 full-width usage fold: all 9 token fields + 4 cost fields + byok,
# with per-field malformed-value tolerance (worker.py:110-176 parity)
# ===========================================================================


@register(
    "g2_usage_full_tolerant",
    """
    WITH usage AS (
      SELECT user_id % 8 AS job_id,
             event_type != 'error' AS ok,
             user_id % 7 = 0 AS is_byok,
             -- malformed every 11th row: try_cast -> NULL -> treated as 0
             CASE WHEN event_id % 11 = 0 THEN 'garbage'
                  ELSE (floor(value * 10)::BIGINT)::VARCHAR END AS prompt_tokens,
             (floor(value * 3)::BIGINT)::VARCHAR AS completion_tokens,
             (floor(value * 13)::BIGINT)::VARCHAR AS total_tokens,
             (floor(value)::BIGINT)::VARCHAR AS reasoning_tokens,
             (floor(value * 2)::BIGINT)::VARCHAR AS cached_tokens,
             (floor(value / 2)::BIGINT)::VARCHAR AS cache_write_tokens,
             (event_id % 3)::VARCHAR AS audio_tokens,
             (event_id % 2)::VARCHAR AS video_tokens,
             (event_id % 5)::VARCHAR AS image_tokens,
             CASE WHEN event_id % 13 = 0 THEN 'NaNish'
                  ELSE (value * 0.0001)::VARCHAR END AS cost,
             (value * 0.00002)::VARCHAR AS upstream_inference_cost,
             (value * 0.00001)::VARCHAR AS discount,
             (value * 0.00003)::VARCHAR AS upstream_cost
      FROM events)
    SELECT job_id,
           count(*) AS api_requests,
           count(CASE WHEN ok THEN 1 END) AS successful_requests,
           count(CASE WHEN NOT ok THEN 1 END) AS failed_requests,
           count(CASE WHEN is_byok THEN 1 END) AS byok_requests,
           sum(coalesce(TRY_CAST(prompt_tokens AS BIGINT), 0))::BIGINT AS prompt_tokens_sum,
           sum(coalesce(TRY_CAST(completion_tokens AS BIGINT), 0))::BIGINT AS completion_tokens_sum,
           sum(coalesce(TRY_CAST(total_tokens AS BIGINT), 0))::BIGINT AS total_tokens_sum,
           sum(coalesce(TRY_CAST(reasoning_tokens AS BIGINT), 0))::BIGINT AS reasoning_tokens_sum,
           sum(coalesce(TRY_CAST(cached_tokens AS BIGINT), 0))::BIGINT AS cached_tokens_sum,
           sum(coalesce(TRY_CAST(cache_write_tokens AS BIGINT), 0))::BIGINT AS cache_write_tokens_sum,
           sum(coalesce(TRY_CAST(audio_tokens AS BIGINT), 0))::BIGINT AS audio_tokens_sum,
           sum(coalesce(TRY_CAST(video_tokens AS BIGINT), 0))::BIGINT AS video_tokens_sum,
           sum(coalesce(TRY_CAST(image_tokens AS BIGINT), 0))::BIGINT AS image_tokens_sum,
           round(sum(coalesce(TRY_CAST(cost AS DOUBLE), 0)::DECIMAL(28,12))::DOUBLE, 12) AS cost_sum,
           round(sum(coalesce(TRY_CAST(upstream_inference_cost AS DOUBLE), 0)::DECIMAL(28,12))::DOUBLE, 12) AS upstream_inference_cost_sum,
           round(sum(coalesce(TRY_CAST(discount AS DOUBLE), 0)::DECIMAL(28,12))::DOUBLE, 12) AS discount_sum,
           round(sum(coalesce(TRY_CAST(upstream_cost AS DOUBLE), 0)::DECIMAL(28,12))::DOUBLE, 12) AS upstream_cost_sum
    FROM usage GROUP BY job_id
    """,
    ops=["G2", "G6", "D7"],
)
def q_usage_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's complete 20-field accumulator, fed string-typed
    fields with injected garbage: try_cast tolerance must skip bad
    values per field without dropping the row (worker.py:153-176)."""
    import os as _os

    from openrouter_batch_processor_spark.operators.aggregates import usage_summary
    from openrouter_batch_processor_spark.session import respread_for_narrow_work

    # 16 string-format columns + 13 decimal folds per row over an
    # unsplittable single-row-group scan: re-spread the pruned input
    # first (measured 1.77 s -> 0.78 s at sf0.1; guide §8)
    e = respread_for_narrow_work(
        _t(spark, sf_dir, "events").select(
            "user_id", "event_type", "event_id", "value"
        ),
        source_path=_os.path.join(sf_dir, "events.parquet"),
    )
    v, eid = F.col("value"), F.col("event_id")
    as_str = lambda c: c.cast("long").cast("string")  # noqa: E731
    usage = e.select(
        (F.col("user_id") % 8).alias("job_id"),
        (F.col("event_type") != "error").alias("ok"),
        (F.col("user_id") % 7 == 0).alias("is_byok"),
        F.when(eid % 11 == 0, F.lit("garbage"))
        .otherwise(as_str(F.floor(v * 10)))
        .alias("prompt_tokens"),
        as_str(F.floor(v * 3)).alias("completion_tokens"),
        as_str(F.floor(v * 13)).alias("total_tokens"),
        as_str(F.floor(v)).alias("reasoning_tokens"),
        as_str(F.floor(v * 2)).alias("cached_tokens"),
        as_str(F.floor(v / 2)).alias("cache_write_tokens"),
        (eid % 3).cast("string").alias("audio_tokens"),
        (eid % 2).cast("string").alias("video_tokens"),
        (eid % 5).cast("string").alias("image_tokens"),
        F.when(eid % 13 == 0, F.lit("NaNish"))
        .otherwise((v * 0.0001).cast("string"))
        .alias("cost"),
        (v * 0.00002).cast("string").alias("upstream_inference_cost"),
        (v * 0.00001).cast("string").alias("discount"),
        (v * 0.00003).cast("string").alias("upstream_cost"),
    )
    return usage_summary(usage, ["job_id"])


@register(
    "k6_zip_hash",
    """
    SELECT lang || '.txt' AS entry_name,
           length(count(*)::VARCHAR || ' ' || min(doc_id)::VARCHAR)::BIGINT
             AS n_bytes,
           true AS deterministic
    FROM documents GROUP BY lang
    """,
    ops=["K6", "F4", "G1"],
)
def q_k6_zip_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 determinism as a driver-checkable query: build the per-lang
    text artifacts with a distributed groupBy, pack them through the
    REAL deterministic-zip sink twice, and assert byte-identity by
    sha256 (sinks/artifacts.write_deterministic_zip; reference analog
    app.py:171-177's content-addressed commit). The emitted rows are
    the re-read zip directory — entry name + uncompressed size — plus
    the determinism verdict, all reproducible by the oracle from the
    documents table alone."""
    import hashlib
    import os
    import tempfile
    import zipfile

    from openrouter_batch_processor_spark.sinks.artifacts import (
        write_deterministic_zip,
    )

    groups = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .collect()
    )
    files = {
        f"{r['lang']}.txt": f"{r['n_docs']} {r['min_doc']}".encode()
        for r in groups
    }
    with tempfile.TemporaryDirectory() as td:
        pa, pb = os.path.join(td, "a.zip"), os.path.join(td, "b.zip")
        write_deterministic_zip(pa, files)
        write_deterministic_zip(pb, dict(reversed(list(files.items()))))
        ha = hashlib.sha256(open(pa, "rb").read()).hexdigest()
        hb = hashlib.sha256(open(pb, "rb").read()).hexdigest()
        with zipfile.ZipFile(pa) as zf:
            entries = [(i.filename, i.file_size) for i in zf.infolist()]
    rows = [(name, size, ha == hb) for name, size in entries]
    return spark.createDataFrame(
        rows, "entry_name string, n_bytes long, deterministic boolean"
    )


@register(
    "s7_registry_default",
    """
    SELECT source || '.zip' AS zip_name,
           md5(source) AS zip_sha256,
           count(*)::BIGINT AS size_bytes,
           0::BIGINT AS corrupt_rows
    FROM documents GROUP BY source
    """,
    ops=["S7", "K9", "G1"],
)
def q_s7_registry_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7's PERMISSIVE-default registry load as a driver-checkable
    query: commit a registry built from the documents table through the
    REAL atomic sink (sinks/artifacts.commit_registry, K9), load it
    back through the REAL source (sources/ingest.load_ingest_registry,
    S7), and load a CORRUPT file through the same source — whose row
    count must be the empty {version:1, entries:[]} default
    (app.py:148-169), emitted as the constant corrupt_rows column."""
    import os
    import tempfile

    from openrouter_batch_processor_spark.sinks.artifacts import (
        commit_registry,
    )
    from openrouter_batch_processor_spark.sources.ingest import (
        load_ingest_registry,
    )

    groups = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "source",
            "n_docs",
            F.md5(F.col("source")).alias("sig"),
        )
        .collect()
    )
    entries = [
        {
            "zip_name": f"{r['source']}.zip",
            "zip_sha256": r["sig"],
            "content_sha256": r["sig"],
            "size_bytes": r["n_docs"],
            "created_at": "2024-01-01T00:00:00",
            "source": r["source"],
        }
        for r in sorted(groups, key=lambda r: r["source"])
    ]
    with tempfile.TemporaryDirectory() as td:
        ok_path = os.path.join(td, "registry.json")
        commit_registry(entries, ok_path)
        loaded = load_ingest_registry(spark, ok_path).select(
            "zip_name", "zip_sha256", "size_bytes"
        ).collect()
        bad_path = os.path.join(td, "corrupt.json")
        with open(bad_path, "wb") as fh:
            fh.write(b"{this is not json at all")
        corrupt_rows = load_ingest_registry(spark, bad_path).count()
    rows = [
        (r["zip_name"], r["zip_sha256"], r["size_bytes"], corrupt_rows)
        for r in loaded
    ]
    return spark.createDataFrame(
        rows,
        "zip_name string, zip_sha256 string, size_bytes long, corrupt_rows long",
    )


@register(
    "k1_results_csv",
    """
    SELECT lang || '.txt' AS file,
           'n=' || count(*)::VARCHAR || ' first=' || min(doc_id)::VARCHAR
             AS output
    FROM documents GROUP BY lang
    """,
    ops=["K1", "G1", "G2"],
)
def q_k1_results_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 certified as a driver query: per-lang result rows flow
    through the REAL output.csv sink (sinks/artifacts.write_results_csv
    — header, (file, output) column order, reference app.py's results
    CSV), then come BACK through spark.read.csv; the driver hash-checks
    the round-trip against the oracle built from documents alone. A
    sink that dropped, reordered or mis-quoted columns would break the
    value hash."""
    import os
    import tempfile

    from openrouter_batch_processor_spark.sinks.artifacts import (
        write_results_csv,
    )

    results = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .select(
            F.concat(F.col("lang"), F.lit(".txt")).alias("file"),
            F.concat(
                F.lit("n="), F.col("n_docs").cast("string"),
                F.lit(" first="), F.col("min_doc").cast("string"),
            ).alias("output"),
        )
    )
    import shutil

    td = tempfile.mkdtemp(prefix="k1_csv_")
    try:
        write_results_csv(results, td)
        # eager read-back: the artifact dir is deleted before returning,
        # so the round-trip rows must leave Spark's lazy plan here
        rows = [
            (r["file"], r["output"])
            for r in spark.read.option("header", "true")
            .csv(os.path.join(td, "output.csv"))
            .collect()
        ]
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return spark.createDataFrame(rows, "file string, output string")


@register(
    "k2_inventory_csv",
    """
    WITH inv AS (SELECT source || '.bin' AS file_name,
                        'in/' || source || '.bin' AS full_path,
                        'bin' AS file_type,
                        count(*)::BIGINT AS file_size
                 FROM documents GROUP BY source)
    SELECT file_name, full_path, file_type, file_size,
           row_number() OVER (ORDER BY full_path)::BIGINT AS line_no
    FROM inv
    """,
    ops=["K2", "O5", "G1", "G2"],
)
def q_k2_inventory_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 + O5 certified together: the inventory flows through the REAL
    input.csv sink (sinks/artifacts.write_inventory_csv — which must
    emit rows SORTED by full_path, the O5 sink-sort contract), and the
    emitted line order is read back POSITIONALLY from the single CSV
    part file. line_no therefore certifies the physical sort: an
    unsorted sink breaks the hash even though the row SET is identical
    (the k6_zip_hash driver-side-artifact-read precedent)."""
    import csv
    import glob
    import os
    import tempfile

    from openrouter_batch_processor_spark.sinks.artifacts import (
        write_inventory_csv,
    )

    inv = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("file_size"))
        .select(
            F.concat(F.col("source"), F.lit(".bin")).alias("file_name"),
            F.concat(F.lit("in/"), F.col("source"), F.lit(".bin")).alias(
                "full_path"
            ),
            F.lit("bin").alias("file_type"),
            "file_size",
        )
    )
    import shutil

    td = tempfile.mkdtemp(prefix="k2_csv_")
    try:
        write_inventory_csv(inv, td)
        [part] = glob.glob(os.path.join(td, "input.csv", "part-*.csv"))
        with open(part, newline="", encoding="utf-8") as fh:
            rdr = csv.DictReader(fh)
            rows = [
                (
                    r["file_name"],
                    r["full_path"],
                    r["file_type"],
                    int(r["file_size"]),
                    i + 1,
                )
                for i, r in enumerate(rdr)
            ]
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "file_name string, full_path string, file_type string, "
        "file_size long, line_no long",
    )


@register(
    "k8_job_meta",
    """
    SELECT 'job-0001' AS job_id, 'm-test' AS model,
           count(DISTINCT source)::BIGINT AS n_groups,
           substr(md5('seed'), 25, 8) AS api_key_last8,
           false AS has_api_key
    FROM documents
    """,
    ops=["K8", "F15", "G2"],
)
def q_k8_job_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 + F15 certified as a driver query: job meta (with a live-
    looking api key) goes through the REAL sink
    (sinks/artifacts.write_job_meta), which must REDACT the key to its
    last 8 chars; the emitted JSON is read back and its fields are the
    result rows. A sink that leaked the key flips has_api_key and
    breaks the hash (reference analog: worker.py's meta persistence)."""
    import json
    import os
    import tempfile

    from openrouter_batch_processor_spark.sinks.artifacts import write_job_meta

    n_groups = (
        _t(spark, sf_dir, "documents")
        .agg(F.count_distinct("source").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    import hashlib

    meta = {
        "job_id": "job-0001",
        "model": "m-test",
        "n_groups": n_groups,
        "api_key": "sk-or-v1-" + hashlib.md5(b"seed").hexdigest(),
    }
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "meta.json")
        write_job_meta(meta, path)
        with open(path, encoding="utf-8") as fh:
            back = json.load(fh)
    return spark.createDataFrame(
        [
            (
                back["job_id"],
                back["model"],
                back["n_groups"],
                back["api_key_last8"],
                "api_key" in back,
            )
        ],
        "job_id string, model string, n_groups long, api_key_last8 string, "
        "has_api_key boolean",
    )


@register(
    "s1_s3_scan_roundtrip",
    """
    WITH g AS (SELECT lang, count(*)::BIGINT AS n, min(doc_id)::BIGINT AS fd
               FROM documents GROUP BY lang),
    t AS (SELECT count(*)::BIGINT * 2 AS n_scanned FROM g)
    SELECT 'sub/' || lang || '/info.txt' AS rel_path,
           length(lang || ' n=' || n::VARCHAR || ' first=' || fd::VARCHAR)::BIGINT
             AS file_size,
           lang || ' n=' || n::VARCHAR || ' first=' || fd::VARCHAR AS text,
           (SELECT n_scanned FROM t) AS n_scanned
    FROM g
    """,
    ops=["S1", "S3", "F1", "F2", "G1"],
)
def q_s1_s3_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + S3 certified as a driver query: a deterministic nested tree
    (one text file + one binary decoy per lang subfolder) is scanned by
    the REAL recursive binaryFile source (sources/ingest.scan_files),
    decoded by the REAL text reader (decode_text_files — which must
    keep .txt and DROP .bin), and the decoded rows plus the total
    scanned-file count are hash-checked against an oracle built from
    documents alone. Wrong recursion, wrong rel_path normalization or
    a leaky text filter each break the hash."""
    import os
    import shutil
    import tempfile

    from openrouter_batch_processor_spark.sources.ingest import (
        decode_text_files,
        scan_files,
    )

    groups = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("fd"))
        .collect()
    )
    td = tempfile.mkdtemp(prefix="s1s3_")
    try:
        for r in groups:
            d = os.path.join(td, "sub", r["lang"])
            os.makedirs(d, exist_ok=True)
            body = f"{r['lang']} n={r['n']} first={r['fd']}"
            with open(os.path.join(d, "info.txt"), "w", encoding="utf-8") as fh:
                fh.write(body)
            with open(os.path.join(d, "blob.bin"), "wb") as fh:
                fh.write(b"\x00\x01\x02")
        scanned = scan_files(spark, td, recursive=True)
        n_scanned = scanned.count()
        rows = [
            (r["rel_path"], r["length"], r["text"], n_scanned)
            for r in decode_text_files(scanned)
            .select("rel_path", "length", "text")
            .collect()
        ]
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return spark.createDataFrame(
        rows, "rel_path string, file_size long, text string, n_scanned long"
    )


@register(
    "p8_form_validation",
    """
    SELECT * FROM (VALUES
      ('ok_folder',       true,  '', 'folder'),
      ('precedence',      true,  '', 'folder'),
      ('formats_default', true,  '', 'uploaded'),
      ('missing_key',     false, 'api_key is required', ''),
      ('missing_prompt',  false, 'system_prompt is required', ''),
      ('bad_reasoning',   false,
       'reasoning_mode must be one of (''off'', ''true'', ''false'')', ''),
      ('no_input',        false,
       'no input source: provide folder, zip, or upload', '')
    ) v(case_name, valid, error, resolved_kind)
    """,
    ops=["P8", "F16", "F17"],
)
def q_p8_form_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 certified as a driver query: the canonical valid/invalid form
    submissions run through the REAL validator
    (plans/config.JobConfig.validate — required key/prompt, reasoning
    tri-state, folder > zip > upload precedence, app.py:658-804), and
    each case's verdict + error text + resolved input kind is
    hash-checked against the documented contract. A validator that
    stopped rejecting, changed an error message or broke precedence
    breaks the hash."""
    from openrouter_batch_processor_spark.plans.config import JobConfig

    cases = [
        ("ok_folder", JobConfig("k", "p", input_folder="/in")),
        (
            "precedence",
            JobConfig("k", "p", input_folder="/in", input_zip="z.zip"),
        ),
        (
            "formats_default",
            JobConfig(
                "k", "p", upload="u.zip",
                separate_outputs=True, output_formats=["BOGUS"],
            ),
        ),
        ("missing_key", JobConfig("", "p", input_folder="/in")),
        ("missing_prompt", JobConfig("k", "", input_folder="/in")),
        (
            "bad_reasoning",
            JobConfig("k", "p", input_folder="/in", reasoning_mode="maybe"),
        ),
        ("no_input", JobConfig("k", "p")),
    ]
    rows = []
    for name, cfg in cases:
        try:
            cfg.validate()
            rows.append((name, True, "", cfg.resolved_input()[0]))
        except ValueError as exc:
            rows.append((name, False, str(exc), ""))
    return spark.createDataFrame(
        rows, "case_name string, valid boolean, error string, resolved_kind string"
    )
