"""Round-10 analytics operators checked against independent pure-Python
references on constructed data: Kruskal-Wallis, Brown-Forsythe, binned
Kendall tau-b, theta-method forecast, Kaplan-Meier session survival,
video scene cuts, split-half linear CKA and dist-n diversity (value
parity vs DuckDB is the registry oracle's job; these tests pin the
SEMANTICS to textbook definitions)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from openrouter_batch_processor_spark.operators.timeseries import (
    brown_forsythe,
    kaplan_meier_sessions,
    kendall_tau_binned,
    kruskal_wallis,
    theta_forecast,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _mk_valued(spark, values_by_type: dict[str, list[float]]):
    rows = []
    eid = 0
    for etype, vals in values_by_type.items():
        for j, v in enumerate(vals):
            eid += 1
            rows.append((eid, T0 + dt.timedelta(minutes=eid), 1, etype, v, "{}"))
    return _events(spark, rows)


def _midranks(all_vals: list[float]) -> dict[float, float]:
    s = sorted(all_vals)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    return out


class TestKruskalWallis:
    def test_matches_textbook_h_with_ties(self, spark):
        groups = {
            "a": [1.0, 2.0, 2.0, 5.0],
            "b": [2.0, 3.0, 7.0],
            "c": [4.0, 4.0, 9.0, 9.0, 1.0],
        }
        df = kruskal_wallis(_mk_valued(spark, groups)).collect()
        all_vals = [v for vs in groups.values() for v in vs]
        mr = _midranks(all_vals)
        n = len(all_vals)
        h = 12.0 / (n * (n + 1)) * sum(
            sum(mr[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
        ) - 3 * (n + 1)
        from collections import Counter

        ties = Counter(all_vals)
        c = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
        by_type = {r["event_type"]: r for r in df}
        for etype, vs in groups.items():
            assert by_type[etype]["n"] == len(vs)
            assert by_type[etype]["rank_sum"] == sum(mr[v] for v in vs)
        assert math.isclose(df[0]["h_stat"], h, abs_tol=2e-6)
        assert math.isclose(df[0]["h_tie_corrected"], h / c, abs_tol=2e-6)


class TestBrownForsythe:
    def test_matches_textbook_f(self, spark):
        groups = {
            "a": [1.0, 2.0, 4.0, 8.0, 10.0],
            "b": [5.0, 5.5, 6.0, 6.5],
            "c": [0.5, 9.0, 9.5, 20.0],
        }
        rows = brown_forsythe(_mk_valued(spark, groups)).collect()

        def lower_median(vs):
            s = sorted(vs)
            return s[(len(s) + 1) // 2 - 1]

        zs = {
            t: [abs(v - lower_median(vs)) for v in vs] for t, vs in groups.items()
        }
        k = len(groups)
        nn = sum(len(vs) for vs in groups.values())
        zbar = sum(sum(v) for v in zs.values()) / nn
        between = sum(
            len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs.values()
        )
        within = sum(
            sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs.values()
        )
        f = (between / (k - 1)) / (within / (nn - k))
        by_type = {r["event_type"]: r for r in rows}
        for t, vs in groups.items():
            assert by_type[t]["group_median"] == lower_median(vs)
            assert math.isclose(
                by_type[t]["mean_absdev"],
                sum(zs[t]) / len(zs[t]),
                abs_tol=1e-6,
            )
        assert rows[0]["df1"] == k - 1 and rows[0]["df2"] == nn - k
        assert math.isclose(rows[0]["f_stat"], f, abs_tol=2e-6)


class TestKendallTau:
    def test_matches_bruteforce_tau_b(self, spark):
        # (hour, value) points with ties in both margins
        pts = [
            (0, 1.0), (0, 2.0), (1, 2.0), (1, 3.0), (2, 1.0),
            (2, 30.0), (3, 30.0), (3, 45.0), (4, 45.0), (4, 2.0),
        ]
        rows = [
            (i + 1, T0 + dt.timedelta(hours=h, seconds=i), 1, "t", v, "{}")
            for i, (h, v) in enumerate(pts)
        ]
        out = kendall_tau_binned(_events(spark, rows)).collect()[0]
        binned = [(h, int(round(v * 100)) // 1000) for h, v in pts]
        conc = disc = 0
        for i in range(len(binned)):
            for j in range(i + 1, len(binned)):
                dx = binned[i][0] - binned[j][0]
                dy = binned[i][1] - binned[j][1]
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
        n = len(binned)
        from collections import Counter

        n0 = n * (n - 1) / 2
        n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in binned).values())
        n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in binned).values())
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        assert out["concordant"] == conc and out["discordant"] == disc
        assert out["n1"] == n1 and out["n2"] == n2
        assert math.isclose(out["tau_b"], tau, abs_tol=2e-6)


class TestThetaForecast:
    def test_equals_recursive_ses_plus_drift(self, spark):
        ys = [10, 12, 9, 14, 16, 13, 18, 21]
        rows = []
        for t, y in enumerate(ys):
            for j in range(y):
                rows.append(
                    (
                        t * 1000 + j,
                        T0 + dt.timedelta(days=t, minutes=j),
                        1,
                        "t",
                        1.0,
                        "{}",
                    )
                )
        out = theta_forecast(_events(spark, rows)).collect()[0]
        n = len(ys)
        st, stt = sum(range(1, n + 1)), sum(t * t for t in range(1, n + 1))
        sy = sum(ys)
        sty = sum((t + 1) * y for t, y in enumerate(ys))
        b = (n * sty - st * sy) / (n * stt - st * st)
        a = (sy - b * st) / n
        zs = [2 * y - (a + b * (t + 1)) for t, y in enumerate(ys)]
        level = zs[0]
        for z in zs[1:]:
            level = 0.5 * z + 0.5 * level  # the recursion the closed form folds
        assert out["n_days"] == n
        assert math.isclose(out["slope"], b, abs_tol=1e-6)
        assert math.isclose(out["intercept"], a, abs_tol=1e-6)
        assert math.isclose(out["ses_theta2"], level, abs_tol=1e-5)
        assert math.isclose(
            out["forecast_next"], (level + a + b * (n + 1)) / 2, abs_tol=1e-5
        )


class TestKaplanMeier:
    def test_product_limit_with_censoring(self, spark):
        # user sessions: durations 0, 10, 10, 20 min observed; one user
        # still active at corpus end (censored, duration 15)
        rows = []
        eid = 0

        def sess(user, start_min, dur_min):
            nonlocal eid
            for m in (0, dur_min):
                eid += 1
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(minutes=start_min + m),
                        user,
                        "t",
                        1.0,
                        "{}",
                    )
                )

        sess(1, 0, 0)
        sess(2, 0, 10)
        sess(3, 0, 10)
        sess(4, 0, 20)
        sess(5, 100, 15)  # ends at corpus max ts -> censored
        out = {
            r["duration_min"]: r
            for r in kaplan_meier_sessions(_events(spark, rows)).collect()
        }
        # durations: observed {0:1, 10:2, 20:1}, censored {15:1}; N=5
        # S(0)  = 1 - 1/5            = 0.8
        # S(10) = 0.8 * (1 - 2/4)    = 0.4
        # S(20) = 0.4 * (1 - 1/1)    = 0.0   (risk set emptied)
        assert set(out) == {0, 10, 20}
        assert out[0]["n_at_risk"] == 5 and out[0]["n_events"] == 1
        assert math.isclose(out[0]["survival"], 0.8, abs_tol=1e-6)
        assert out[10]["n_at_risk"] == 4 and out[10]["n_events"] == 2
        assert math.isclose(out[10]["survival"], 0.4, abs_tol=1e-6)
        assert out[20]["n_at_risk"] == 1
        assert out[20]["survival"] == 0.0


class TestSceneCuts:
    def test_cuts_match_manual_energy_deltas(self, spark):
        from openrouter_batch_processor_spark.operators.multimodal import (
            media_table,
            scene_cuts,
        )

        payloads = {
            "vid/a.mp4": b"x" * 300,
            "vid/b.mp4": bytes(range(200)) * 2,
        }
        files = spark.createDataFrame(
            [(p, c, len(c)) for p, c in payloads.items()],
            "rel_path string, content binary, length long",
        )
        got = {
            (r["media_id"], r["cut_frame"]): (r["prev_energy"], r["energy"])
            for r in scene_cuts(
                media_table(files), every_n_bytes=64, threshold=2000
            ).collect()
        }
        want = {}
        for payload in payloads.values():
            mid = hashlib.sha256(payload).hexdigest()
            es = []
            for i, off in enumerate(range(0, len(payload), 64)):
                chunk = payload[off : off + 64]
                h = hashlib.sha256(chunk).hexdigest()[:16]
                es.append(int(h[:6], 16) % 10000)
            for i in range(1, len(es)):
                if abs(es[i] - es[i - 1]) > 2000:
                    want[(mid, i)] = (es[i - 1], es[i])
        assert got == want and len(want) > 0


class TestLinearCka:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from openrouter_batch_processor_spark.operators.similarity import (
            linear_cka_split,
        )

        rng = np.random.RandomState(7)
        x = rng.randn(40, 64).astype("float32")
        # make the halves partially dependent so cka is mid-range
        x[:, 32:48] = x[:, 0:16] * 0.5 + x[:, 32:48] * 0.5
        emb = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(x)],
            "vec_id long, embedding array<float>",
        )
        out = linear_cka_split(emb).collect()[0]
        xd = x.astype("float64")
        xc = xd - xd.mean(axis=0)
        a, b = xc[:, :32], xc[:, 32:]
        fab = float(((a.T @ b) ** 2).sum())
        faa = float(((a.T @ a) ** 2).sum())
        fbb = float(((b.T @ b) ** 2).sum())
        assert out["n_vecs"] == 40
        assert math.isclose(out["fro_ab"], fab, rel_tol=1e-6)
        assert math.isclose(out["fro_aa"], faa, rel_tol=1e-6)
        assert math.isclose(out["fro_bb"], fbb, rel_tol=1e-6)
        assert math.isclose(
            out["cka"], fab / math.sqrt(faa * fbb), abs_tol=1e-6
        )
        assert 0.05 < out["cka"] < 0.95


class TestDistinctNgrams:
    def test_hand_counts(self, spark):
        from openrouter_batch_processor_spark.operators.textanalysis import (
            distinct_ngram_diversity,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat sat", "s1"),
                (2, "the cat ran", "s1"),
                (3, "solo", "s2"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {
            r["source"]: r for r in distinct_ngram_diversity(docs).collect()
        }
        s1 = rows["s1"]
        # tokens: the cat sat | the cat ran -> 6 unigrams, 4 distinct
        assert s1["n_unigrams"] == 6 and s1["v_unigrams"] == 4
        # bigrams: "the cat","cat sat","the cat","cat ran" -> 4, 3 distinct
        assert s1["n_bigrams"] == 4 and s1["v_bigrams"] == 3
        assert math.isclose(s1["dist1"], 4 / 6, abs_tol=1e-6)
        assert math.isclose(s1["dist2"], 3 / 4, abs_tol=1e-6)
        # single-token doc has unigrams but no bigram row -> inner join
        # drops s2 (diversity undefined)
        assert "s2" not in rows


class TestCdcChunks:
    def _manual_chunks(self, text: str, mod: int = 64):
        import re

        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        chunks, cur = [], []
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            if h % mod == 0 and cur:
                chunks.append(cur)
                cur = []
            elif h % mod == 0:
                # boundary token starts a new chunk even when current
                # is empty (cumsum semantics: chunk id increments AT
                # the boundary token)
                pass
            cur.append(t)
        if cur:
            chunks.append(cur)
        return [" ".join(c) for c in chunks]

    def test_chunk_stats_and_edit_stability(self, spark):
        from openrouter_batch_processor_spark.operators.dedup import (
            cdc_chunk_stats,
        )

        import random

        rng = random.Random(5)
        words = [f"w{rng.randint(0, 400)}" for _ in range(3000)]
        base = " ".join(words)
        shifted = "zzz " + base  # one-token insertion at the front
        docs = spark.createDataFrame(
            [(1, base, "s"), (2, shifted, "s")],
            "doc_id long, text string, source string",
        )
        out = cdc_chunk_stats(docs, avg_chunk_tokens=16).collect()[0]
        ca = self._manual_chunks(base, 16)
        cb = self._manual_chunks(shifted, 16)
        all_chunks = ca + cb
        assert out["n_chunks"] == len(all_chunks)
        assert out["n_distinct"] == len(set(all_chunks))
        # content-defined boundaries: the insertion perturbs only the
        # first chunk — nearly everything dedups across the two docs
        shared = len(set(ca) & set(cb))
        assert shared >= len(ca) - 2
        assert out["dup_chunk_frac"] > 0.4


class TestNelsonAalen:
    def test_cumulative_hazard(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            nelson_aalen_sessions,
        )

        rows = []
        eid = 0

        def sess(user, start_min, dur_min):
            nonlocal eid
            for m in (0, dur_min):
                eid += 1
                rows.append(
                    (eid, T0 + dt.timedelta(minutes=start_min + m), user, "t",
                     1.0, "{}")
                )

        sess(1, 0, 0)
        sess(2, 0, 10)
        sess(3, 0, 10)
        sess(4, 0, 20)
        sess(5, 100, 15)  # censored at corpus end
        out = {
            r["duration_min"]: r
            for r in nelson_aalen_sessions(_events(spark, rows)).collect()
        }
        # H(0)=1/5; H(10)=1/5+2/4; H(20)=H(10)+1/1
        assert math.isclose(out[0]["cum_hazard"], 0.2, abs_tol=1e-6)
        assert math.isclose(out[10]["cum_hazard"], 0.7, abs_tol=1e-6)
        assert math.isclose(out[20]["cum_hazard"], 1.7, abs_tol=1e-6)
        assert math.isclose(
            out[10]["hazard_var"], 1 / 25 + 2 / 16, abs_tol=1e-6
        )
        assert math.isclose(
            out[10]["fh_survival"], math.exp(-0.7), abs_tol=1e-6
        )


class TestCohensD:
    def test_matches_textbook_d_and_g(self, spark):
        from openrouter_batch_processor_spark.operators.timeseries import (
            cohens_d_pairs,
        )

        groups = {"a": [1.0, 2.0, 3.0, 4.0], "b": [3.0, 5.0, 7.0]}
        out = cohens_d_pairs(_mk_valued(spark, groups)).collect()[0]
        import statistics

        ma, mb = statistics.mean(groups["a"]), statistics.mean(groups["b"])
        va, vb = statistics.variance(groups["a"]), statistics.variance(groups["b"])
        na, nb = len(groups["a"]), len(groups["b"])
        sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
        d = (ma - mb) / sp
        g = d * (1 - 3 / (4 * (na + nb) - 9))
        assert out["type_a"] == "a" and out["type_b"] == "b"
        assert math.isclose(out["cohens_d"], d, abs_tol=1e-6)
        assert math.isclose(out["hedges_g"], g, abs_tol=1e-6)
        assert math.isclose(out["pooled_sd"], sp, abs_tol=1e-6)
