"""Registry ordering contract: the driver's correctness gate checks the
FIRST 50 queries() entries, so their composition is a tested invariant,
not an accident of registration order."""

from __future__ import annotations

import re

from openrouter_batch_processor_spark.registry import REGISTRY

S2_OP = re.compile(r"^(S|K|F|P|G|X|J|O|W|T|D)\d+$")


def test_registry_has_no_duplicate_names():
    names = list(REGISTRY)
    assert len(names) == len(set(names))


def test_front50_covers_every_oracle_coverable_s2_op():
    names = list(REGISTRY)
    coverable = set()
    for spec in REGISTRY.values():
        if spec.sql is not None:
            coverable |= {op for op in spec.ops if S2_OP.match(op)}
    covered = set()
    for n in names[:50]:
        covered |= set(REGISTRY[n].ops)
    missing = coverable - covered
    assert not missing, f"front-50 misses §2 ops: {sorted(missing)}"


def test_front50_all_oracle_checked():
    # rows-only entries would waste a hash-check slot
    for n in list(REGISTRY)[:50]:
        assert REGISTRY[n].sql is not None, f"{n} is rows-only but in front-50"


def test_r01_reds_lead_the_order():
    # the three round-1 hash mismatches must be re-checked first
    assert list(REGISTRY)[:3] == [
        "g2_usage_fold",
        "events_sessionize",
        "dedup_simhash",
    ]
