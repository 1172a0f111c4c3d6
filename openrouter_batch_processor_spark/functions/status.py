"""Status / route derivation (reference ops F17, F18 — app.py:990-1006).

Pure when/otherwise chains over manifest columns; the reference derives
job status from (future state, meta presence, results-zip presence) and
route label from (source_route, group_by_subfolder) with fallbacks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def derive_status(
    future_state: Column, has_meta: Column, has_results_zip: Column
) -> Column:
    """F17: Running / Finished / Failed / Unknown precedence chain."""
    return (
        F.when(future_state == "running", F.lit("Running"))
        .when(future_state == "failed", F.lit("Failed"))
        .when(has_results_zip, F.lit("Finished"))
        .when(has_meta, F.lit("Running"))
        .otherwise(F.lit("Unknown"))
    )


def route_label(source_route: Column, group_by_subfolder: Column) -> Column:
    """F18: missing route + group_by_subfolder -> 'marc', else 'main'."""
    resolved = F.coalesce(
        source_route,
        F.when(group_by_subfolder, F.lit("marc")).otherwise(F.lit("main")),
    )
    return F.when(resolved == "marc", F.lit("marc")).otherwise(F.lit("main"))
