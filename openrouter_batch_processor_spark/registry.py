"""Query registry: every implemented operator as a (Spark callable,
DuckDB oracle SQL) pair — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each entry's Spark side exercises the real operator implementation from
operators/ / functions/ / plans/; the SQL side restates the semantics in
ANSI SQL. Column names are aliased identically on both sides (the
driver's compare sorts columns by name before hashing).

Portability rules used throughout (see also tools/check.py):
- int from double: always floor() first (Spark casts truncate, DuckDB
  casts round — floor makes both explicit and identical);
- money sums: cast to DECIMAL(18,4)/(18,6) before SUM (exact, order-
  independent), cast the result back to DOUBLE;
- float ratios: round(x, 6) at the edge;
- hashes: md5 of strings, hex->int via conv()/'0x'-cast only.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> non-SQL-expressible, rows-only check
    ops: list[str] = field(default_factory=list)  # SURVEY §2 op ids


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, ops: list[str]):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, ops=ops)
        return fn

    return deco


from openrouter_batch_processor_spark.session import load_table  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# Flagship: the whole LLM batch pipeline, mock transport (S10,G1,F9,F10,D4,T5)
# ===========================================================================

from openrouter_batch_processor_spark.plans.pipeline import (  # noqa: E402
    PIPELINE_ORACLE_SQL,
    run_llm_pipeline,
)


@register(
    "llm_pipeline_mock",
    PIPELINE_ORACLE_SQL,
    ops=["S10", "G1", "F9", "F10", "D4", "D6", "T5", "G2"],
)
def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_llm_pipeline(spark, sf_dir)


# ===========================================================================
# S2 + F1 + F2 + P1 — file inventory scan shape over documents
# ===========================================================================

from openrouter_batch_processor_spark.functions.paths import file_extension  # noqa: E402


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


# ===========================================================================
# F3 — human file size ladder
# ===========================================================================

from openrouter_batch_processor_spark.functions.sizes import human_file_size  # noqa: E402


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


# ===========================================================================
# F17 + F18 — status derivation / route label (when-otherwise chains)
# ===========================================================================

from openrouter_batch_processor_spark.functions.status import (  # noqa: E402
    derive_status,
    route_label,
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


# ===========================================================================
# F12 — elapsed-time compute + str(timedelta) render + parse round-trip
# ===========================================================================

from openrouter_batch_processor_spark.functions.timeops import (  # noqa: E402
    format_timedelta,
    parse_timedelta,
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
    out = joined.withColumn("elapsed_str", format_timedelta(F.col("elapsed_sec")))
    # round-trip through the parser (F12 inverse, app.py:1038-1057)
    return out.withColumn("elapsed_rt", parse_timedelta(F.col("elapsed_str")))


# ===========================================================================
# F11 — timestamp format patterns (meta / zip / results)
# ===========================================================================

from openrouter_batch_processor_spark.functions.timeops import ts_format  # noqa: E402


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


# ===========================================================================
# W1/K5 — global sequence renumbering (distributed, no single-task window)
# ===========================================================================

from openrouter_batch_processor_spark.operators.renumber import renumber  # noqa: E402


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
