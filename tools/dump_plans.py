"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt. Run from the repo whose plans you
want (set PYTHONPATH / cwd accordingly); sf dir via SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from openrouter_batch_processor_spark.registry import REGISTRY
    from openrouter_batch_processor_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
