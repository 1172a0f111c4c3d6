"""Round-6 batch 3: KS drift, token Gini, source JS, k-anonymity,
Spearman, Brier decomposition — hand-verified against pure-Python
references with the same grid/rounding conventions."""

from __future__ import annotations

import hashlib
import math

import pytest

from openrouter_batch_processor_spark.operators.corpusaudit import (
    brier_decomposition,
    k_anonymity,
    ks_drift,
    source_js,
    spearman_quality_len,
    token_gini,
)
from openrouter_batch_processor_spark.operators.textanalysis import quality_scores


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "src1", 44),
    (2, "aa bb aa bb aa bb aa bb", "en", "src2", 23),
    (3, "el perro grande corre en la calle de noche", "es", "src1", 42),
    (4, "unique words only appear once here today", "en", "src15", 40),
    (5, "zz zz zz zz zz zz", "de", "src15", 17),
    (6, "the of and to in is it a mixed bag", "en", "src17", 34),
    (7, "words words words repeated repeated often", "fr", "src2", 41),
    (8, "short one", "en", "src15", 9),
]


class TestKsDrift:
    def test_matches_bruteforce_ks(self, spark):
        docs = _mk_docs(spark, DOCS)
        got = ks_drift(docs).collect()[0]
        qs = {
            r["doc_id"]: r["quality_score"]
            for r in quality_scores(docs).collect()
        }
        a = sorted(
            qs[i] for (i, _t, _l, s, _n) in DOCS if int(s[3:]) < 10
        )
        b = sorted(
            qs[i] for (i, _t, _l, s, _n) in DOCS if int(s[3:]) >= 10
        )
        na, nb = len(a), len(b)
        best = (-1, None)
        for cut in sorted(set(a) | set(b)):
            ca = sum(1 for v in a if v <= cut)
            cb = sum(1 for v in b if v <= cut)
            dnum = abs(ca * nb - cb * na)
            if dnum > best[0]:
                best = (dnum, cut)
        assert got["na"] == na and got["nb"] == nb
        assert got["cut"] == pytest.approx(best[1])
        d = best[0] / (na * nb)
        assert got["d_stat"] == pytest.approx(round(d, 9), abs=1e-9)
        en = math.sqrt(na * nb / (na + nb))
        lam = (en + 0.12 + 0.11 / en) * d
        p = 2.0 * (
            math.exp(-2 * lam * lam)
            - math.exp(-8 * lam * lam)
            + math.exp(-18 * lam * lam)
        )
        p = min(max(p, 0.0), 1.0)
        assert got["p_value"] == pytest.approx(round(p, 6), abs=1e-6)

    def test_identical_cohorts_have_zero_d(self, spark):
        rows = [
            (1, "same text here", "en", "src1", 14),
            (2, "same text here", "en", "src11", 14),
        ]
        got = ks_drift(_mk_docs(spark, rows)).collect()[0]
        assert got["d_stat"] == 0.0
        assert got["p_value"] == 1.0


class TestTokenGini:
    def test_matches_sorted_rank_formula(self, spark):
        docs = _mk_docs(spark, DOCS)
        got = token_gini(docs).collect()[0]
        xs = sorted(len(t.split()) for (_i, t, _l, _s, _n) in DOCS)
        n = len(xs)
        sx = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * six - (n + 1) * sx) / (n * sx)
        assert got["n_docs"] == n
        assert got["total_tokens"] == sx
        assert got["gini"] == pytest.approx(round(gini, 9), abs=1e-9)

    def test_uniform_lengths_give_zero(self, spark):
        rows = [(i, "a b c", "en", "src1", 5) for i in range(4)]
        got = token_gini(_mk_docs(spark, rows)).collect()[0]
        assert got["gini"] == 0.0


class TestSourceJs:
    def test_matches_pure_python_and_is_bounded(self, spark):
        rows = [
            (1, "aa bb cc dd", "en", "s1", 11),
            (2, "aa bb aa bb", "en", "s1", 11),
            (3, "xx yy zz ww", "en", "s2", 11),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {r["source"]: r for r in source_js(docs).collect()}

        def bucket(term: str) -> int:
            return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 512

        from collections import Counter

        corpus: Counter = Counter()
        per_src: dict[str, Counter] = {}
        for _i, text, _l, s, _n in rows:
            for tok in text.split():
                corpus[bucket(tok)] += 1
                per_src.setdefault(s, Counter())[bucket(tok)] += 1
        tc = sum(corpus.values())
        for s, cnts in per_src.items():
            ts = sum(cnts.values())
            js = 0.0
            for b in range(512):
                ps = (cnts.get(b, 0) + 1) / (ts + 512.0)
                pc = (corpus.get(b, 0) + 1) / (tc + 512.0)
                m = (ps + pc) / 2
                js += round(
                    0.5 * ps * math.log(ps / m) + 0.5 * pc * math.log(pc / m), 9
                )
            js = round(js, 6)
            assert got[s]["js"] == pytest.approx(js, abs=1e-6)
            assert 0.0 <= got[s]["js"] <= math.log(2) + 1e-9
            assert got[s]["js_dist"] == pytest.approx(
                round(math.sqrt(max(js, 0.0) / math.log(2)), 6), abs=1e-6
            )


class TestKAnonymity:
    def test_counts_equivalence_classes(self, spark):
        # two docs share (src1, en, bucket 0); the rest are singletons
        rows = [
            (1, "the cat sat", "en", "src1", 100),
            (2, "the dog ran", "en", "src1", 120),
            (3, "el gato", "es", "src1", 100),
            (4, "hund", "de", "src2", 300),
        ]
        got = k_anonymity(_mk_docs(spark, rows)).collect()[0]
        assert got["n_groups"] == 3
        assert got["k_anonymity"] == 1
        assert got["n_groups_below_k"] == 3
        assert got["n_docs_below_k"] == 4
        assert got["l_diversity"] == 1

    def test_k_threshold_boundary(self, spark):
        rows = [
            (i, "same text always", "en", "src1", 100) for i in range(5)
        ]
        got = k_anonymity(_mk_docs(spark, rows)).collect()[0]
        assert got["k_anonymity"] == 5
        assert got["n_groups_below_k"] == 0
        assert got["n_docs_below_k"] == 0


class TestSpearman:
    def test_matches_midrank_pearson(self, spark):
        docs = _mk_docs(spark, DOCS)
        got = spearman_quality_len(docs).collect()[0]
        rows = quality_scores(docs).select("quality_score", "n_tokens").collect()
        xs = [r["quality_score"] for r in rows]
        ys = [r["n_tokens"] for r in rows]

        def midranks(vals):
            out = []
            sv = sorted(vals)
            for v in vals:
                lo = sv.index(v)
                hi = lo + sv.count(v) - 1
                out.append((lo + hi) / 2 + 1)
            return out

        rx, ry = midranks(xs), midranks(ys)
        n = len(rx)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        assert got["n_docs"] == n
        assert got["rho"] == pytest.approx(num / den, abs=1e-9)

    def test_perfect_monotone_gives_one(self, spark):
        # distinct texts with strictly increasing unique-token counts
        # and identical ratio structure: longer all-unique docs score
        # higher => rho == 1 exactly
        rows = [
            (i, " ".join(f"w{i}x{j}" for j in range(i + 2)), "en", "src1", 50)
            for i in range(5)
        ]
        docs = _mk_docs(spark, rows)
        qs = [
            (r["quality_score"], r["n_tokens"])
            for r in quality_scores(docs).collect()
        ]
        if len({q for q, _t in qs}) == len(qs):  # all-distinct premise
            got = spearman_quality_len(docs).collect()[0]
            assert abs(got["rho"]) == 1.0


class TestBrierDecomp:
    def test_matches_pure_python_grids(self, spark):
        docs = _mk_docs(spark, DOCS)
        got = brier_decomposition(docs).collect()[0]
        rows = quality_scores(docs).select("doc_id", "quality_score").collect()
        lang = {i: l for (i, _t, l, _s, _n) in DOCS}
        recs = [
            (
                int(round(r["quality_score"] * 1000000)),
                min(int(r["quality_score"] * 10), 9),
                1 if lang[r["doc_id"]] == "en" else 0,
            )
            for r in rows
        ]
        n = len(recs)
        p = sum(y for *_b, y in recs)
        brier_num = sum((p6 - y * 1000000) ** 2 for p6, _b, y in recs)
        base7 = (p * 10000000) // n
        rel = res = 0
        for b in sorted({b for _p, b, _y in recs}):
            grp = [(p6, y) for p6, bb, y in recs if bb == b]
            nb = len(grp)
            conf7 = (sum(p6 for p6, _y in grp) * 10) // nb
            acc7 = (sum(y for _p6, y in grp) * 10000000) // nb
            rel += nb * (conf7 - acc7) ** 2
            res += nb * (acc7 - base7) ** 2
        assert got["n_docs"] == n
        assert got["brier"] == pytest.approx(round(brier_num / (n * 1e12), 9), abs=1e-9)
        assert got["reliability"] == pytest.approx(round(rel / (n * 1e14), 9), abs=1e-9)
        assert got["resolution"] == pytest.approx(round(res / (n * 1e14), 9), abs=1e-9)
        assert got["uncertainty"] == pytest.approx(
            round(p * (n - p) / (n * n), 9), abs=1e-9
        )
        # rel − res + unc differs from BS by the within-bin forecast
        # variance (Murphy's identity assumes constant forecasts per
        # bin), so only the component sanity bounds are asserted
        assert got["reliability"] >= 0.0
        assert got["resolution"] >= 0.0
        assert 0.0 <= got["uncertainty"] <= 0.25
