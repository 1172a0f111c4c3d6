"""Power-iteration top-PC + All-but-the-Top: verified against numpy
eigendecomposition on data with a planted dominant direction."""

from __future__ import annotations

import numpy as np
import pytest

from openrouter_batch_processor_spark.operators.similarity import (
    abtt_residuals,
    top_pc_power,
)


def _planted(n=200, d=16, seed=7):
    rng = np.random.RandomState(seed)
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    # strong rank-1 signal + small isotropic noise -> fast convergence
    coeffs = rng.randn(n, 1) * 5.0
    x = coeffs @ direction[None, :] + rng.randn(n, d) * 0.1 + rng.randn(d) * 0.5
    return x.astype(np.float32)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


class TestTopPcPower:
    def test_converges_to_numpy_top_eigvec(self, spark):
        x = _planted()
        out = top_pc_power(_df(spark, x), dim=16).collect()
        assert len(out) == 16
        pc = np.array([r["pc"] for r in sorted(out, key=lambda r: r["dim"])])
        lam = out[0]["eigenvalue"]
        xc = x.astype(np.float64) - x.astype(np.float64).mean(axis=0)
        scatter = xc.T @ xc
        w, vmat = np.linalg.eigh(scatter)
        top = vmat[:, -1]
        assert abs(float(np.dot(pc, top))) > 0.999
        assert lam == pytest.approx(w[-1], rel=0.01)
        # iteration output is (approximately) unit length
        assert float(np.linalg.norm(pc)) == pytest.approx(1.0, abs=1e-6)

    def test_means_match_numpy(self, spark):
        x = _planted(n=50)
        out = {r["dim"]: r["mean_val"] for r in top_pc_power(_df(spark, x), dim=16).collect()}
        mu = x.astype(np.float64).mean(axis=0)
        for dim, m in out.items():
            assert m == pytest.approx(mu[dim], abs=1e-6)


class TestAbttResiduals:
    def test_residuals_orthogonal_to_pc_and_norm_shrinks(self, spark):
        x = _planted()
        df = _df(spark, x)
        pc_rows = sorted(top_pc_power(df, dim=16).collect(), key=lambda r: r["dim"])
        pc = np.array([r["pc"] for r in pc_rows])
        mu = np.array([r["mean_val"] for r in pc_rows])
        out = {r["vec_id"]: r for r in abtt_residuals(df, dim=16).collect()}
        xc = x.astype(np.float64) - mu
        for i in (0, 1, 17):
            want_proj = float(xc[i] @ pc)
            assert out[i]["proj"] == pytest.approx(want_proj, abs=1e-4)
            resid = xc[i] - want_proj * pc
            assert out[i]["resid_norm"] == pytest.approx(
                float(np.linalg.norm(resid)), abs=1e-4
            )
            # removal really removed the dominant direction
            assert abs(float(resid @ pc)) < 1e-6
            assert out[i]["resid_norm"] <= float(np.linalg.norm(xc[i])) + 1e-9


class TestTop2PcDeflate:
    def test_recovers_two_planted_directions(self, spark):
        rng = np.random.RandomState(11)
        d = 16
        q1 = rng.randn(d); q1 /= np.linalg.norm(q1)
        q2 = rng.randn(d); q2 -= (q2 @ q1) * q1; q2 /= np.linalg.norm(q2)
        n = 300
        x = (
            rng.randn(n, 1) * 6.0 @ q1[None, :]
            + rng.randn(n, 1) * 3.0 @ q2[None, :]
            + rng.randn(n, d) * 0.05
        ).astype(np.float32)
        from openrouter_batch_processor_spark.operators.similarity import (
            top2_pc_deflate,
        )

        rows = sorted(top2_pc_deflate(_df(spark, x), dim=d).collect(),
                      key=lambda r: r["dim"])
        pc1 = np.array([r["pc1"] for r in rows])
        pc2 = np.array([r["pc2"] for r in rows])
        xc = x.astype(np.float64) - x.astype(np.float64).mean(axis=0)
        w, vmat = np.linalg.eigh(xc.T @ xc)
        assert abs(float(pc1 @ vmat[:, -1])) > 0.999
        assert abs(float(pc2 @ vmat[:, -2])) > 0.99
        # deflation orthogonality
        assert abs(float(pc1 @ pc2)) < 1e-3
        assert rows[0]["eig1"] == pytest.approx(w[-1], rel=0.02)
        assert rows[0]["eig2"] == pytest.approx(w[-2], rel=0.05)
        assert rows[0]["eig1"] > rows[0]["eig2"]
