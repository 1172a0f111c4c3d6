"""One-roundtrip literal arrays for plan-build speed.

Building a literal matrix with ``F.array(*[F.lit(v) for v in row])``
costs one py4j round-trip PER ELEMENT — the 16x64 rp_weights matrix
measured 0.64 s of pure driver time per plan build (profile_bench r13).
Parsing the same array as ONE SQL expression string costs one
round-trip total (measured 0.008 s) and yields bit-identical values:
``repr(float)`` is the shortest round-tripping decimal form, and the
``D`` suffix makes the SQL parser read it back as exactly that DOUBLE
(no decimal-literal detour).

This changes HOW the plan is built, never what it computes — the
resulting Catalyst literal nodes are equal (checked value-for-value in
tests/test_r13_opt.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: float) -> str:
    """SQL double literal with exact round-trip: repr + 'D' suffix.
    Infinities/NaN never appear in the embedded tables (asserted)."""
    v = float(v)
    assert math.isfinite(v), "literal tables are finite by construction"
    return f"{v!r}D"


def lit_double_array(values) -> Column:
    """array<double> literal via one F.expr parse."""
    return F.expr("array(" + ",".join(_d(v) for v in values) + ")")
