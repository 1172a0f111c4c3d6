"""Staging-cache contract (operators/staging.py): hits require the SAME
input plan; different data can never alias; builders run exactly once
per key."""

from __future__ import annotations

from openrouter_batch_processor_spark.operators.staging import (
    staged,
    staged_from,
)
from tests.conftest import SF_DIR


def test_same_plan_hits_cache(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    a = staged(df, "t1")
    b = staged(spark.range(10).selectExpr("id", "id * 2 AS v"), "t1")
    assert a is b  # identical plan -> the SAME materialized table


def test_different_data_never_aliases(spark):
    a = staged(spark.range(5).selectExpr("id"), "t2")
    b = staged(spark.range(6).selectExpr("id"), "t2")
    assert a is not b
    assert a.count() == 5 and b.count() == 6


def test_label_namespaces_sites(spark):
    df = spark.range(3).selectExpr("id")
    assert staged(df, "site_a") is not staged(df, "site_b")


def test_staged_from_builds_once_per_key(spark):
    calls = []

    def build(d):
        calls.append(1)
        return d.selectExpr("id", "id + 1 AS nxt")

    src = spark.range(4).selectExpr("id")
    out1 = staged_from(src, "b1", build)
    out2 = staged_from(spark.range(4).selectExpr("id"), "b1", build)
    assert out1 is out2
    assert len(calls) == 1
    assert out1.count() == 4


def test_staged_from_rebuilds_for_new_input(spark):
    calls = []

    def build(d):
        calls.append(1)
        return d

    staged_from(spark.range(2), "b2", build)
    staged_from(spark.range(3), "b2", build)
    assert len(calls) == 2


def test_cache_is_bounded_lru(spark, monkeypatch):
    import openrouter_batch_processor_spark.operators.staging as st

    monkeypatch.setattr(st, "_CACHE_MAX", 3)
    st._CACHE.clear()
    dfs = [staged(spark.range(10 + i), f"lru{i}") for i in range(5)]
    assert len(st._CACHE) == 3
    # oldest entries evicted; re-staging them yields a NEW object
    assert staged(spark.range(10), "lru0") is not dfs[0]
    # most-recent entry still cached
    assert staged(spark.range(14), "lru4") is dfs[4]
    st._CACHE.clear()


class TestDurableStaging:
    """SPARK_GRAFT_STAGING_DIR turns staged()/staged_from() into a
    plan-content-addressed parquet write shared ACROSS sessions — the
    100-TB flavor the module docstring promises. A 'second session' is
    simulated by clearing the in-memory LRU (the only session-scoped
    state: the durable address deliberately omits applicationId)."""

    def test_second_session_reads_artifact_not_recompute(
        self, spark, tmp_path, monkeypatch
    ):
        import openrouter_batch_processor_spark.operators.staging as st

        monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(tmp_path))
        st.clear()
        calls = []

        def build(d):
            calls.append(1)
            return d.selectExpr("id", "id * 3 AS trip")

        src = spark.range(7).selectExpr("id")
        out1 = staged_from(src, "durable1", build)
        assert len(calls) == 1
        assert sorted(r["trip"] for r in out1.collect()) == [
            0, 3, 6, 9, 12, 15, 18,
        ]
        arts = [p for p in tmp_path.iterdir() if p.name.startswith("durable1-")]
        assert len(arts) == 1  # committed under the plan-content address

        st.clear()  # session 2: no in-memory state survives
        out2 = staged_from(spark.range(7).selectExpr("id"), "durable1", build)
        assert len(calls) == 1  # builder NOT re-run — artifact read back
        assert sorted(r["trip"] for r in out2.collect()) == [
            0, 3, 6, 9, 12, 15, 18,
        ]
        st.clear()

    def test_staged_durable_and_registry_family_unchanged(
        self, spark, tmp_path, monkeypatch
    ):
        """A staged-artifact consumer family (the kmeans clustering
        shared by 4 registry queries) returns identical rows with
        durable staging on, and its artifact lands in the dir."""
        import openrouter_batch_processor_spark.operators.staging as st
        from openrouter_batch_processor_spark.registry import REGISTRY

        q = REGISTRY["kmeans_lite_clusters"].fn
        st.clear()
        baseline = sorted(map(tuple, q(spark, SF_DIR).collect()))
        st.clear()
        monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(tmp_path))
        durable = sorted(map(tuple, q(spark, SF_DIR).collect()))
        assert durable == baseline
        assert any(tmp_path.iterdir())  # parquet artifact committed
        st.clear()  # second session reuses it without recompute
        again = sorted(map(tuple, q(spark, SF_DIR).collect()))
        assert again == baseline
        st.clear()

    def test_knn_family_durable_roundtrip(self, spark, tmp_path, monkeypatch):
        """The r11 kNN-geometry family (pair table + kNN cap + shapley
        means, three nested staged artifacts) returns identical rows
        with durable staging on, and a second session reads the
        artifacts instead of recomputing."""
        import openrouter_batch_processor_spark.operators.staging as st
        from openrouter_batch_processor_spark.registry import REGISTRY

        lof = REGISTRY["emb_lof_outliers"].fn
        shap = REGISTRY["sample_knn_shapley"].fn
        st.clear()
        base_lof = sorted(map(tuple, lof(spark, SF_DIR).collect()))
        base_shap = sorted(map(tuple, shap(spark, SF_DIR).collect()))
        st.clear()
        monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(tmp_path))
        assert sorted(map(tuple, lof(spark, SF_DIR).collect())) == base_lof
        assert sorted(map(tuple, shap(spark, SF_DIR).collect())) == base_shap
        names = {p.name.split("-")[0] for p in tmp_path.iterdir()}
        assert any(n.startswith("cell_pairs") for n in names)
        assert any(n.startswith("cell_knn") for n in names)
        assert any(n.startswith("knn_shapley_means") for n in names)
        st.clear()  # second session: artifacts read back, same rows
        assert sorted(map(tuple, lof(spark, SF_DIR).collect())) == base_lof
        assert sorted(map(tuple, shap(spark, SF_DIR).collect())) == base_shap
        st.clear()
