"""Human-readable file sizes (reference op F3, app.py:73-82 semantics).

B/KB/MB/GB/TB ladder dividing by 1024; bytes printed as integers, all
larger units with exactly two decimals — reproduced as a `when` ladder
(whole-stage codegen) rather than a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = ["B", "KB", "MB", "GB", "TB"]


def human_file_size(size_bytes: Column) -> Column:
    """F3: 0 -> '0 B'; <1024 -> 'N B'; else '%.2f <unit>' after /1024 steps.

    The ratio is rounded half-up to 2 dp BEFORE formatting: Java's %.2f
    rounds ties half-up while C printf rounds half-even, and n/1024
    ties (x.125, x.625, ...) are exactly representable doubles — the
    pre-round pins one rounding rule on every engine.
    """
    s = size_bytes.cast("double")
    expr = F.format_string("%.2f TB", F.round(s / F.lit(1024.0**4), 2))
    for power, unit in ((3, "GB"), (2, "MB"), (1, "KB")):
        bound = F.lit(1024.0 ** (power + 1))
        expr = F.when(
            s < bound,
            F.format_string(f"%.2f {unit}", F.round(s / F.lit(1024.0**power), 2)),
        ).otherwise(expr)
    return F.when(s < 1024, F.concat(size_bytes.cast("long").cast("string"), F.lit(" B"))).otherwise(expr)
