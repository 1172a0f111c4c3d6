"""Skew-stress proof for the LSH candidate join (VERDICT r02 item 4).

The dedup scale story says a hot (band, band_key) bucket — a giant
cluster of near-identical documents — is "exactly the AQE skew-join
case" (operators/dedup.py minhash_candidate_pairs). This fixture
manufactures that case: half the corpus shares one template, so every
band of the self-join has a bucket holding all template docs and the
naive execution runs the whole O(hot²) pair expansion in ONE task.

The assertion is on the MECHANISM, not just the answer: with the skew
thresholds scaled to the fixture (the production defaults are sized for
256 MB partitions), the executed adaptive plan must show the hot
partition actually split (`skew=true` in the final SMJ/SHJ node) AND
the answer must still be the exact candidate set. If a regression
re-plans the join into a shape AQE can't skew-split (e.g. a broadcast
nested loop or a pre-join distinct that hides the hot key), this fails.
"""

from __future__ import annotations

import pytest

from openrouter_batch_processor_spark.operators.dedup import (
    minhash_candidate_pairs,
)

N_DOCS = 800
N_HOT = 400  # 50% — one near-identical template cluster


def _skewed_docs(spark):
    template = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field toward the river bank at dawn"
    )
    rows = []
    for i in range(N_HOT):
        rows.append((i, template))
    for i in range(N_HOT, N_DOCS):
        # distinct shingle material per doc: no cross-doc collisions
        rows.append((i, f"unique document {i} alpha{i} beta{i * 7} gamma{i * 13} delta{i * 29} epsilon{i * 31}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def skew_confs(spark):
    """Scale AQE's skew-split thresholds to fixture size, restore after."""
    keys = {
        # thresholds scaled to fixture size (production defaults are
        # sized for 256 MB partitions); broadcast disabled because at
        # 100 TB the band table cannot broadcast and the join under
        # test IS the shuffled self-join
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # coalescing re-merges split partitions at this tiny scale,
        # hiding the mechanism under test
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_hot_bucket_is_skew_split_and_exact(skew_confs):
    spark = skew_confs
    docs = _skewed_docs(spark)
    cand = minhash_candidate_pairs(docs)
    # collect() (not count()) so the inspected QueryExecution is the one
    # that actually ran — count() plans a separate aggregate query and
    # the original DF's adaptive plan would stay isFinalPlan=false
    got = len(cand.collect())

    # exact answer: identical docs collide in every band -> all C(200,2)
    # template pairs and nothing else (unique docs share no shingles)
    expect = N_HOT * (N_HOT - 1) // 2
    assert got == expect, f"candidate set wrong under skew: {got} != {expect}"

    # mechanism: the executed (final) adaptive plan must have skew-split
    # the hot partition of the band self-join
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, (
        "hot (band, band_key) bucket was NOT skew-split — a single task "
        "ran the whole O(hot^2) expansion:\n" + plan[:2000]
    )
