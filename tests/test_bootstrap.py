"""Poisson bootstrap CI (Chamandy et al. 2012): pure-Python replica of
the deterministic resample + statistical sanity on planted data."""

from __future__ import annotations

import hashlib
import math

import pytest

from openrouter_batch_processor_spark.operators.sketches import (
    BOOTSTRAP_B,
    POISSON1_CDF,
    poisson_bootstrap_ci,
)


def _weight(doc_id: int, r: int) -> int:
    u = int(hashlib.md5(f"{doc_id}|{r}".encode()).hexdigest()[:8], 16) / 4294967296.0
    for k, cdf in enumerate(POISSON1_CDF):
        if u < float(cdf):
            return k
    return 7


def _reference_ci(rows, b=BOOTSTRAP_B):
    means = []
    for r in range(b):
        swx = sum(_weight(i, r) * x for i, x in rows)
        sw = sum(_weight(i, r) for i, _x in rows)
        means.append((swx * 10_000_000) // sw / 1e7)
    means.sort()
    return means[math.ceil(0.05 * b) - 1], means[math.ceil(0.95 * b) - 1]


class TestPoissonBootstrap:
    def test_matches_pure_python_reference(self, spark):
        rows = [(i, 100 + (i * 37) % 50) for i in range(200)]
        docs = spark.createDataFrame(
            [(i, x) for i, x in rows], "doc_id long, n_chars long"
        )
        got = poisson_bootstrap_ci(docs).head()
        lo, hi = _reference_ci(rows)
        assert got["n_docs"] == 200
        assert got["boot_lo"] == pytest.approx(lo, abs=1e-7)
        assert got["boot_hi"] == pytest.approx(hi, abs=1e-7)
        mean = sum(x for _i, x in rows) / len(rows)
        assert got["mean"] == pytest.approx(mean, abs=1e-6)

    def test_interval_brackets_mean_and_tightens_with_n(self, spark):
        small = spark.createDataFrame(
            [(i, 100 + (i * 31) % 60) for i in range(50)],
            "doc_id long, n_chars long",
        )
        big = spark.createDataFrame(
            [(i, 100 + (i * 31) % 60) for i in range(2000)],
            "doc_id long, n_chars long",
        )
        rs = poisson_bootstrap_ci(small).head()
        rb = poisson_bootstrap_ci(big).head()
        for r in (rs, rb):
            assert r["boot_lo"] <= r["mean"] <= r["boot_hi"]
        assert (rb["boot_hi"] - rb["boot_lo"]) < (rs["boot_hi"] - rs["boot_lo"])

    def test_poisson_weights_have_unit_mean(self):
        # the inverse-CDF table itself: empirical mean of weights over
        # a dense uniform grid must be ~1 (Poisson(1))
        grid = [(i + 0.5) / 100000 for i in range(100000)]
        total = 0
        for u in grid:
            w = 7
            for k, cdf in enumerate(POISSON1_CDF):
                if u < float(cdf):
                    w = k
                    break
            total += w
        assert total / len(grid) == pytest.approx(1.0, abs=5e-3)
