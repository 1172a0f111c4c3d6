"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by their
canonical repr) — the strictest reading of the driver's contract.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import datetime as dt
from decimal import Decimal

sys.path.insert(0, "/root/repo")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr: the driver's value hash is bit-sensitive, so any
        # tolerance here would hide a driver-visible mismatch
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("correctness-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Oracle-regime guard (ADVICE r13 #1): the MinHash / RP-LSH auto-
    # dials switch to wide band keys past their corpus-size thresholds,
    # while these queries' oracle SQL pins the narrow regime — parity
    # past the threshold is undefined BY DESIGN (the judged scales all
    # sit below it). Fail those queries loudly up front instead of
    # reporting a spurious value mismatch.
    from openrouter_batch_processor_spark.operators.dedup import (
        MINHASH_AUTO_THRESHOLD,
    )
    from openrouter_batch_processor_spark.operators.similarity import (
        RP_AUTO_THRESHOLD,
    )

    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    regime_pinned = {
        "dedup_minhash_jaccard": n_docs > MINHASH_AUTO_THRESHOLD,
        "dedup_clusters": n_docs > MINHASH_AUTO_THRESHOLD,
        "dedup_apply_survivors": n_docs > MINHASH_AUTO_THRESHOLD,
        "dedup_incremental_candidates": n_docs > MINHASH_AUTO_THRESHOLD,
        "sim_rp_lsh_pairs": n_vecs > RP_AUTO_THRESHOLD,
        "sim_union_candidates": n_vecs > RP_AUTO_THRESHOLD,
    }

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if regime_pinned.get(name):
            failures.append(name)
            print(
                f"FAIL {name}: corpus exceeds the auto-dial threshold "
                f"(docs={n_docs}, vecs={n_vecs}) — the operator resolves "
                "the WIDE banding regime but this query's oracle SQL pins "
                "the narrow one; oracle parity is only defined below the "
                "threshold (ADVICE r13 #1)"
            )
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"okNA {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            s_repr = frame_repr(scols, [tuple(r) for r in srows])
            d_repr = frame_repr(dcols, drows)
            if s_repr != d_repr:
                diff = [
                    (a, b) for a, b in zip(s_repr, d_repr) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(srows)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
