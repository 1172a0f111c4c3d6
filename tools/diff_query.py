"""Column-level diff of a registry query vs its DuckDB oracle.

Usage: python tools/diff_query.py <query_name> [sf_dir]

Mirrors the driver's compare (sort columns by name, order-insensitive
row compare) but reports WHICH cells differ — the debugging tool the
driver's boolean hash_match can't be.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from openrouter_batch_processor_spark.registry import REGISTRY
    from openrouter_batch_processor_spark.session import get_spark

    spec = REGISTRY[name]
    if spec.sql is None:
        print(f"{name}: rows-only (no oracle SQL)")
        return

    spark = get_spark()
    sdf = spec.fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.sql(spec.sql).df()

    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    print(f"spark rows={len(sdf)} oracle rows={len(odf)}")
    print(f"spark cols={list(sdf.columns)}")
    print(f"oracle cols={list(odf.columns)}")
    if list(sdf.columns) != list(odf.columns):
        print("COLUMN MISMATCH")
        return

    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    o = odf.sort_values(key, na_position="first").reset_index(drop=True)
    if len(s) != len(o):
        print("ROW COUNT MISMATCH")
        return

    ndiff = 0
    for col in key:
        sv, ov = s[col], o[col]
        try:
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
        except Exception:
            neq = sv.astype(str) != ov.astype(str)
        if neq.any():
            idx = list(neq[neq].index[:8])
            print(f"\ncolumn {col!r}: {int(neq.sum())} differing rows; first {len(idx)}:")
            for i in idx:
                print(f"  row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
                print(f"    full spark row:  {dict(s.loc[i])}")
                print(f"    full oracle row: {dict(o.loc[i])}")
                ndiff += 1
    if ndiff == 0:
        print("MATCH (cell-exact after row sort)")


if __name__ == "__main__":
    main()
