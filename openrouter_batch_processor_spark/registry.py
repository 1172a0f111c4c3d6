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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
