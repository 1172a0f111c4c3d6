"""Dtype-parity audit: Spark toPandas() dtypes vs DuckDB df() dtypes
for every oracle-backed registry query.

Why this exists: the driver's value-hash is computed over the fetched
frames, so *dtype* disparities corrupt it even when the values are
numerically identical. The classic trap: DuckDB ``sum(BIGINT)`` returns
HUGEINT, which pandas renders as float64 — ``655.0`` vs Spark's int64
``655`` hashes differently. Round 1 lost g2_usage_fold /
events_sessionize / dedup_simhash to exactly this.

Usage: python tools/type_audit.py [sf_dir] [query ...]
Prints one line per mismatched column; exit code 1 if any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Only identical dtypes are accepted: we don't know how the driver
# hashes frames, so exact dtype parity is the only safe contract.
# (r01 evidence: int32/int32 green, int64-vs-HUGEINT-float64 red.)
def _ok(pair: tuple[str, str]) -> bool:
    return pair[0] == pair[1]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from openrouter_batch_processor_spark.registry import REGISTRY
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    bad = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if spec.sql is None:
            continue
        try:
            sdt = dict(
                (c, str(d)) for c, d in spec.fn(spark, sf_dir).toPandas().dtypes.items()
            )
        except Exception as e:
            print(f"ERR  {name}: spark: {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        try:
            rel = con.sql(spec.sql)
            ddt = dict((c, str(d)) for c, d in rel.df().dtypes.items())
            dtypes_sql = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:
            print(f"ERR  {name}: duckdb: {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if sorted(sdt) != sorted(ddt):
            print(f"COLS {name}: spark={sorted(sdt)} duckdb={sorted(ddt)}")
            bad += 1
            continue
        for c in sorted(sdt):
            pair = (sdt[c], ddt[c])
            if not _ok(pair):
                print(
                    f"TYPE {name}.{c}: spark={sdt[c]} duckdb={ddt[c]}"
                    f" (sql type {dtypes_sql.get(c)})"
                )
                bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
