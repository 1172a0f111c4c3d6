"""Registry infrastructure: the REGISTRY dict, the @register decorator
and the table loader shared by every family module under registries/.

Split out of registry.py (r08) so the 12 family modules and the
aggregator can all import it without cycles. See registry.py for the
cross-engine float-parity rules every oracle obeys."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


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
