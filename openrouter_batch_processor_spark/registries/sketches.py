"""Sketch queries: HLL, KMV, CMS, Bloom, AMS F2 and sampled quantiles.

Split from registry.py (r08); queries are verbatim. The shared SQL
builders live in registries.common (star-imported: its __all__ is the
explicit export list)."""

from __future__ import annotations

from openrouter_batch_processor_spark.registries.common import *  # noqa: F401,F403



@register(
    "sketch_cms_heavy_hitters",
    f"""
    WITH {_TF_SQL},
    totals AS (
      SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term),
    cells AS (
      SELECT r.i AS row,
             ('0x' || substr(md5(r.i::VARCHAR || '|' || term), 1, 8))::BIGINT % 256 AS pos,
             cnt
      FROM totals CROSS JOIN range(0, 3) r(i)),
    counters AS (
      SELECT row, pos, sum(cnt)::BIGINT AS counter FROM cells GROUP BY row, pos),
    probes AS (
      SELECT term, cnt AS true_count FROM totals
      ORDER BY cnt DESC, term ASC LIMIT 20),
    probe_cells AS (
      SELECT p.term, p.true_count, r.i AS row,
             ('0x' || substr(md5(r.i::VARCHAR || '|' || p.term), 1, 8))::BIGINT % 256 AS pos
      FROM probes p CROSS JOIN range(0, 3) r(i))
    SELECT pc.term, pc.true_count, min(c.counter)::BIGINT AS cms_est
    FROM probe_cells pc JOIN counters c ON c.row = pc.row AND c.pos = pc.pos
    GROUP BY pc.term, pc.true_count
    """,
    ops=["EXT-sketch", "EXT-heavyhitters", "G2", "O4"],
)
def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (3x256, md5 positions) over corpus term
    frequencies, probed with the exact top-20 terms. The undersized
    width makes collisions — and therefore exact over-estimates — occur
    and hash-match on both engines: the sketch invariant cms_est >=
    true_count is verified along with the precise collision sums."""
    from openrouter_batch_processor_spark.operators.sketches import (
        cms_heavy_hitter_counts,
    )
    from openrouter_batch_processor_spark.operators.textanalysis import (
        term_frequencies,
    )

    totals = (
        term_frequencies(_t(spark, sf_dir, "documents"))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cnt"))
    )
    return cms_heavy_hitter_counts(totals, term_col="term", count_col="cnt")


@register(
    "sketch_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
      FROM events),
    r AS (SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          FROM h),
    s AS (SELECT event_type,
                 count(*) AS n_hashes,
                 max(CASE WHEN rn = 16 THEN hv END) AS kth
          FROM r GROUP BY event_type)
    SELECT event_type, n_hashes,
           CASE WHEN n_hashes < 16 THEN n_hashes::DOUBLE
                ELSE round(15 / (kth / 4294967296.0), 6)
           END AS distinct_est
    FROM s
    """,
    ops=["EXT-sketch", "G2"],
)
def q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return kmv_distinct(ev.select("event_type", "user_id"), ["event_type"], "user_id")


@register(
    "sketch_kmv_setops",
    """
    WITH m AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY hv),
    r AS (SELECT *, row_number() OVER (ORDER BY hv) AS rn FROM m),
    s AS (SELECT count(*) AS exact_union,
                 sum(a)::BIGINT AS exact_a,
                 sum(b)::BIGINT AS exact_b,
                 sum(a * b)::BIGINT AS exact_inter,
                 max(CASE WHEN rn = 64 THEN hv END) AS kth,
                 sum(CASE WHEN rn < 64 AND a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n_both
          FROM r)
    SELECT exact_a, exact_b, exact_union, exact_inter,
           CASE WHEN exact_union < 64 THEN exact_union::DOUBLE
                ELSE round(63 / (kth / 4294967296.0), 6) END AS union_est,
           CASE WHEN exact_union < 64 THEN exact_inter::DOUBLE
                ELSE round(n_both * (63 / (kth / 4294967296.0)) / 63, 6)
           END AS inter_est
    FROM s
    """,
    ops=["EXT-sketch", "X1", "G2"],
)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch audience overlap: |clickers ∪ purchasers| and
    |clickers ∩ purchasers| over user_id from ONE KMV pass (k=64),
    theta-normalized (n_both/theta over the k-1 sub-theta sample —
    the ADVICE-flagged estimator, now oracle-pinned)."""
    from openrouter_batch_processor_spark.operators.sketches import kmv_set_ops

    ev = _t(spark, sf_dir, "events")
    return kmv_set_ops(
        ev.select("user_id", "event_type"),
        "user_id",
        a_pred=F.col("event_type") == "click",
        b_pred=F.col("event_type") == "purchase",
        k=64,
    )


@register(
    "sketch_bloom_decontaminate",
    """
    WITH bvals AS (
      SELECT DISTINCT md5(text) AS val FROM documents WHERE doc_id % 7 = 0),
    bits AS (
      SELECT DISTINCT ('0x' || substr(md5(i::VARCHAR || '|' || val), 1, 8))::BIGINT % 256 AS bit
      FROM bvals CROSS JOIN range(0, 3) r(i)),
    pvals AS (SELECT DISTINCT md5(text) AS val FROM documents),
    pbits AS (
      SELECT DISTINCT val,
             ('0x' || substr(md5(i::VARCHAR || '|' || val), 1, 8))::BIGINT % 256 AS bit
      FROM pvals CROSS JOIN range(0, 3) r(i)),
    need AS (SELECT val, count(*) AS n_need FROM pbits GROUP BY val),
    hit AS (SELECT p.val, count(*) AS n_hit
            FROM pbits p JOIN bits USING (bit) GROUP BY p.val),
    flags AS (
      SELECT n.val,
             coalesce(h.n_hit, 0) = n.n_need AS candidate,
             n.val IN (SELECT val FROM bvals) AS member
      FROM need n LEFT JOIN hit h ON h.val = n.val)
    SELECT count(*) AS n_probes,
           count(CASE WHEN member THEN 1 END) AS n_members,
           count(CASE WHEN candidate THEN 1 END) AS n_candidates,
           count(CASE WHEN candidate AND NOT member THEN 1 END) AS n_false_pos,
           (SELECT count(*) FROM bits) AS bits_set
    FROM flags
    """,
    ops=["EXT-sketch", "X1", "P1", "G2"],
)
def q_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination prefilter: every 7th document is
    'benchmark'; the whole corpus probes a 256-bit / 3-hash filter over
    the benchmark fingerprints. Deliberately undersized m so false
    positives OCCUR and are pinned exactly by the oracle (the md5 hash
    positions collide identically on both engines) — the check proves
    the bit math, not just the happy path."""
    from openrouter_batch_processor_spark.operators.sketches import bloom_membership

    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(F.md5("text").alias("fp"), "doc_id")
    return bloom_membership(
        fp.filter(F.col("doc_id") % 7 == 0),
        fp,
        value_col="fp",
        m=256,
        k=3,
    )


@register(
    "sketch_sample_quantiles",
    """
    WITH r AS (SELECT event_type, value::DOUBLE AS v,
                      md5(event_id::VARCHAR) AS h
               FROM events),
    rk AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
           FROM r),
    s AS (SELECT event_type, list_sort(list(v)) AS sv
          FROM rk WHERE rn <= 256 GROUP BY event_type),
    n AS (SELECT event_type, count(*)::BIGINT AS n_rows FROM events GROUP BY 1)
    SELECT n.event_type, n.n_rows, len(s.sv)::BIGINT AS n_sample,
           round(s.sv[(floor((len(s.sv) - 1) * 0.1))::INT + 1], 6) AS q10,
           round(s.sv[(floor((len(s.sv) - 1) * 0.25))::INT + 1], 6) AS q25,
           round(s.sv[(floor((len(s.sv) - 1) * 0.5))::INT + 1], 6) AS q50,
           round(s.sv[(floor((len(s.sv) - 1) * 0.75))::INT + 1], 6) AS q75,
           round(s.sv[(floor((len(s.sv) - 1) * 0.9))::INT + 1], 6) AS q90
    FROM n JOIN s USING (event_type)
    """,
    ops=["EXT-sketch", "EXT-sampling", "G4", "O4"],
)
def q_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable hash-sample quantiles per event type: the k smallest
    md5(event_id) rows form a deterministic uniform sample (the KMV
    property makes it combiner-mergeable at 100 TB), and quantiles are
    sample-exact order statistics — the third quantile strategy next to
    the exact rank median (full sort) and the binned histogram (needs a
    value range) (operators/sketches.py sample_quantiles)."""
    from openrouter_batch_processor_spark.operators.sketches import sample_quantiles

    return sample_quantiles(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id", k=256
    )


@register(
    "sketch_hll_distinct",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
      FROM events),
    b AS (SELECT event_type, hv >> 26 AS bucket,
                 CASE WHEN (hv & 67108863) = 0 THEN 27
                      ELSE 27 - length(bin(hv & 67108863)) END AS rho
          FROM h),
    r AS (SELECT event_type, bucket, max(rho) AS m, count(*) AS nh
          FROM b GROUP BY 1, 2),
    g AS (SELECT event_type, count(*) AS n_buckets,
                 sum((1.0::DOUBLE / (1::BIGINT << m))::DECIMAL(38,32)) AS s,
                 sum(nh) AS exact_distinct
          FROM r GROUP BY 1)
    SELECT event_type, n_buckets, exact_distinct::BIGINT AS exact_distinct,
           round(2903.04 / ((64 - n_buckets)::DECIMAL(38,32) + s)::DOUBLE, 6) AS hll_est
    FROM g
    """,
    ops=["EXT-sketch", "G2", "X2"],
)
def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate next to the
    exact count — the O(1)-state mergeable counterpart to the KMV
    sketch. See operators/sketches.hll_distinct for the cross-engine
    determinism contract (bin()-derived ranks, DECIMAL register sum,
    one IEEE division)."""
    ev = _t(spark, sf_dir, "events")
    return hll_distinct(ev.select("event_type", "user_id"), ["event_type"], "user_id")


@register(
    "sketch_ams_f2",
    """
    WITH f AS (SELECT user_id AS v, count(*)::BIGINT AS f FROM events GROUP BY 1),
    ex AS (SELECT sum(f * f)::BIGINT AS exact_f2 FROM f),
    s AS (SELECT r.i AS r,
                 CASE WHEN ('0x' || substr(md5(r.i::VARCHAR || '|' || f.v::VARCHAR), 1, 8))::BIGINT % 2 = 0
                      THEN f.f ELSE -f.f END AS z
          FROM f CROSS JOIN range(0, 9) r(i)),
    ests AS (SELECT r::INT AS r, (sum(z) * sum(z))::BIGINT AS est_f2 FROM s GROUP BY r),
    comb AS (SELECT round(avg(est_f2), 6) AS mean_est,
                    round(quantile_cont(est_f2, 0.5), 6) AS median_est FROM ests)
    SELECT e.r, e.est_f2, x.exact_f2, c.mean_est, c.median_est
    FROM ests e CROSS JOIN ex x CROSS JOIN comb c
    """,
    ops=["EXT-sketch", "G2"],
)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 (self-join size) estimate over events.user_id:
    9 deterministic ±1-sign estimator rows beside the exact moment and
    the mean/median combiners. operators/sketches.ams_f2 cites the
    paper and the R-longs-per-partition mergeability contract."""
    from openrouter_batch_processor_spark.operators.sketches import ams_f2

    return ams_f2(_t(spark, sf_dir, "events"), "user_id")


@register(
    "sketch_linear_counting",
    """
    WITH b AS (SELECT event_type AS grp, user_id AS k,
                      ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 1024
                        AS bucket
               FROM events),
    g AS (SELECT grp, count(*)::BIGINT AS n_events,
                 count(DISTINCT k)::BIGINT AS exact_distinct,
                 count(DISTINCT bucket)::BIGINT AS occupied
          FROM b GROUP BY 1)
    SELECT grp AS event_type, n_events, exact_distinct,
           (1024 - occupied)::BIGINT AS n_empty,
           CASE WHEN 1024 - occupied > 0
                THEN round(1024.0 * ln(1024.0 / (1024 - occupied)), 6)
           END AS lc_estimate,
           CASE WHEN 1024 - occupied > 0
                THEN round((round(1024.0 * ln(1024.0 / (1024 - occupied)), 6)
                            - exact_distinct) * 100.0 / exact_distinct, 6)
           END AS err_pct
    FROM g
    """,
    ops=["EXT-sketch", "G2"],
)
def q_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct estimator per event_type (Whang et al.
    1990): m=1024 md5 buckets, n-hat = m*ln(m/V) from the empty-bucket
    count, reported against the exact distinct with its own error —
    the small-range companion/correction to the HLL sketch
    (operators/sketches.linear_counting)."""
    from openrouter_batch_processor_spark.operators.sketches import (
        linear_counting,
    )

    return linear_counting(_t(spark, sf_dir, "events"))
