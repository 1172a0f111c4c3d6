"""Registry ordering contract: the driver's correctness gate checks the
FIRST 50 queries() entries, so their composition is a tested invariant,
not an accident of registration order.

Round 3 moves from a static front-50 to a ROTATION: queries already
driver-certified in past rounds (rotation_ledger.DRIVER_CHECKED) leave
the window so never-checked queries get their driver row. The §2
ops-coverage invariant is therefore asserted against the UNION of the
ledger and the current window — an op stays certified once the driver
has greened a query carrying it.
"""

from __future__ import annotations

import re

from openrouter_batch_processor_spark.registry import REGISTRY
from openrouter_batch_processor_spark.rotation_ledger import (
    DRIVER_CHECKED,
    driver_green,
)

S2_OP = re.compile(r"^(S|K|F|P|G|X|J|O|W|T|D)\d+$")


def test_registry_has_no_duplicate_names():
    names = list(REGISTRY)
    assert len(names) == len(set(names))


def test_ledger_names_exist():
    # a renamed query would silently orphan its certification
    for rnd, names in DRIVER_CHECKED.items():
        missing = set(names) - set(REGISTRY)
        assert not missing, f"{rnd} ledger names unknown queries: {sorted(missing)}"


def test_window_plus_ledger_cover_every_oracle_coverable_s2_op():
    names = list(REGISTRY)
    coverable = set()
    for spec in REGISTRY.values():
        if spec.sql is not None:
            coverable |= {op for op in spec.ops if S2_OP.match(op)}
    covered = set()
    for n in names[:50]:
        covered |= set(REGISTRY[n].ops)
    for n in driver_green():
        covered |= set(REGISTRY[n].ops)
    missing = coverable - covered
    assert not missing, f"front-50 ∪ driver-green misses §2 ops: {sorted(missing)}"


def test_front50_all_oracle_checked():
    # rows-only entries would waste a hash-check slot
    for n in list(REGISTRY)[:50]:
        assert REGISTRY[n].sql is not None, f"{n} is rows-only but in front-50"


def test_front50_wastes_no_certification_slot():
    # Saturation invariant (replaces the round-4 endgame form): a
    # never-driver-checked query may wait OUTSIDE the window only while
    # the window is fully saturated — every slot holds either a
    # never-checked query or a documented deliberate re-check
    # (rotation_ledger.DELIBERATE_RECHECKS, each with a written
    # reason). A stale already-green query occupying a slot while new
    # queries wait in the tail is a wasted certification opportunity
    # and fails here.
    from openrouter_batch_processor_spark.rotation_ledger import (
        DELIBERATE_RECHECKS,
    )

    window = list(REGISTRY)[:50]
    never_checked = set(REGISTRY) - driver_green()
    stranded = never_checked - set(window)
    if not stranded:
        return
    wasted = [
        n
        for n in window
        if n not in never_checked and n not in DELIBERATE_RECHECKS
    ]
    assert not wasted, (
        f"queries wait outside the window ({sorted(stranded)}) while "
        f"already-certified, non-deliberate entries hold slots: {wasted}"
    )


def test_readme_query_count_in_sync():
    # ADVICE r03: README undercounted the registry (150 vs 154). Derive
    # the check so the doc can never drift silently again.
    with open("README.md") as fh:
        readme = fh.read()
    m = re.search(r"registry\.py\s+(\d+) named queries", readme)
    assert m, "README no longer states the registry query count"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} queries, registry has {len(REGISTRY)}"
    )
