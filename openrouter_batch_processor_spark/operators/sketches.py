"""KMV (k-minimum-values) distinct sketch — a DETERMINISTIC cardinality
sketch, so unlike HLL it is bit-for-bit reproducible on any engine and
can sit on the oracle-checked correctness path.

Estimator: hash every value to uniform [0,1) (md5 -> uint32 / 2^32);
keep the k smallest distinct hashes; if the k-th smallest is x_k, the
density of distinct hashes is ~(k-1)/x_k, which is the estimate. With
fewer than k distinct values the sketch degrades to exact counting.

Mergeability (why it scales): the union of two sketches' value sets,
re-truncated to the k smallest, is exactly the sketch of the union —
a classic mergeable summary. The implementation below computes the
k-smallest via sort_array(collect_set(...)) per group, which bounds
per-group state at the number of distinct hashes; a production variant
caps state at k per partition with an aggregator, same estimator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 4294967296.0  # 2^32


def _uhash(col: Column) -> Column:
    """Deterministic uint32 hash of a value (md5 prefix), as long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    width: float,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Deterministic histogram quantiles: the scale path next to the
    exact rank-based median.

    Phase 1 folds the dataset into a fixed-width histogram — one
    combiner-friendly groupBy whose output is bounded by
    value_range/width, independent of row count (the whole point at
    100 TB: the exact-median sort shuffles every row; this shuffles one
    row per bucket). Phase 2 runs cumulative + total window sums over
    that tiny histogram (single partition by construction — bucket count
    is the bound, not data size) and picks, per percentile p, the first
    bucket where cum >= ceil(total*p/100). The reported value is the
    bucket's inclusive upper edge, so the true quantile is within one
    bucket width — a deterministic error bound, unlike sampling sketches.

    All arithmetic is portable: float divide -> floor for bucketing,
    integer threshold via floor((total*p + 99)/100). Output is one row:
    total, then p{p}_bucket / p{p}_value per percentile."""
    from pyspark.sql.window import Window

    hist = (
        df.select(F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = hist.select(
        "bucket",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(tot_w).alias("total"),
    )
    aggs = [F.max("total").alias("total")]
    for p in percentiles:
        thr = F.floor((F.col("total") * p + 99) / F.lit(100)).cast("long")
        bucket = F.min(F.when(F.col("cum") >= thr, F.col("bucket")))
        aggs.append(bucket.alias(f"p{p}_bucket"))
    one = c.agg(*aggs)
    vals = [
        ((F.col(f"p{p}_bucket") + 1) * width).cast("double").alias(f"p{p}_value")
        for p in percentiles
    ]
    return one.select("total", *[F.col(f"p{p}_bucket") for p in percentiles], *vals)


def sample_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    quantiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-group quantiles from a deterministic HASH SAMPLE — the
    mergeable companion to binned_quantiles (which needs a usable value
    range) and the exact rank median (which sorts every row).

    The sample is the k rows with the smallest md5(id) per group — a
    uniform sample that is DETERMINISTIC (no RNG, so the DuckDB oracle
    reproduces it bit-for-bit) and MERGEABLE (the k smallest hashes of
    a union are a subset of the union of each part's k smallest, the
    same property KMV uses): at 100 TB each partition keeps its k
    smallest locally and the combiner merges, so per-group state is
    O(k) everywhere. Quantile q is the sorted sample's element at index
    floor((m-1)*q) — sample-exact, with standard O(1/sqrt(k)) rank
    error vs the population.

    Here the per-group top-k runs as one window + filter (group sizes
    at test scale don't warrant the two-phase combine); collect_list
    only ever sees <= k rows, so driver/executor state stays bounded by
    construction."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy("_h")
    sampled = (
        df.select(
            F.col(group_col),
            F.col(value_col).cast("double").alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    sv = sampled.groupBy(group_col).agg(
        F.sort_array(F.collect_list("_v")).alias("_sv")
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    m = F.size("_sv")
    cols = [F.col(group_col), F.col("n_rows"), m.cast("long").alias("n_sample")]
    for q in quantiles:
        idx = F.floor((m - 1) * F.lit(q)).cast("int") + 1
        cols.append(
            F.round(F.element_at(F.col("_sv"), idx), 6).alias(f"q{int(q * 100)}")
        )
    return counts.join(sv, group_col).select(*cols)


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 16,
    estimate_alias: str = "distinct_est",
) -> DataFrame:
    """Per key group: KMV estimate of COUNT(DISTINCT value_col).

    Output: keys..., n_hashes (exact distinct hash count, = exact
    distinct count up to md5 collisions), distinct_est (the sketch
    estimate; equals the exact count when fewer than k distincts)."""
    hashed = df.select(*[F.col(c) for c in keys], _uhash(F.col(value_col)).alias("_h"))
    per_group = hashed.groupBy(*keys).agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_kmin"),
        F.count_distinct(F.col("_h")).alias("n_hashes"),
    )
    kth = F.element_at(F.col("_kmin"), k)
    est = F.round((k - 1) / (kth / F.lit(HASH_SPACE)), 6)
    return per_group.select(
        *keys,
        F.col("n_hashes"),
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(est)
        .alias(estimate_alias),
    )


HLL_BUCKETS = 64  # 2^6; bucket = top 6 bits of the 32-bit hash
HLL_ALPHA_M2 = 2903.04  # alpha_64 * m^2 = 0.709 * 64 * 64


def hll_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    estimate_alias: str = "hll_est",
) -> DataFrame:
    """Per key group: HyperLogLog estimate of COUNT(DISTINCT value_col),
    made engine-reproducible so it can sit on the oracle-checked path.

    Why next to KMV: HLL state is 64 six-bit registers — O(1) and
    trivially mergeable with max(), so at 100 TB the per-partition
    partial aggregate is bytes, not a value set (KMV's collect_set
    state grows with distincts until truncation). This is the sketch
    you'd keep as a mergeable rollup column.

    Determinism contract (every step identical bits on any engine):
    md5-prefix uint32 hash; bucket = top 6 bits; rank rho = leading-
    zero count of the low 26 bits + 1, computed as 27 - length(bin(w))
    — bin() renders the same minimal binary string in Spark and DuckDB,
    so no libm log2. Register terms 2^-M are exact powers of two from a
    single IEEE division (1.0 / (1<<M)), accumulated as DECIMAL(38,32)
    (each term is exact at scale 32 since M <= 27), empty registers
    contribute exactly 1; the only float rounding is the final
    alpha*m^2/total division, rounded to 6 dp. No small/large-range
    correction (it needs ln(); raw estimator is the documented spec).

    Output: keys..., n_buckets (registers touched), exact_distinct
    (up to md5 collisions), hll_est."""
    h = _uhash(F.col(value_col))
    w = h.bitwiseAND(F.lit((1 << 26) - 1))
    rho = F.when(w == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.bin(w))
    )
    per_bucket = (
        df.select(
            *[F.col(c) for c in keys],
            F.shiftright(h, 26).alias("_bucket"),
            rho.alias("_rho"),
            h.alias("_h"),
        )
        .groupBy(*keys, "_bucket")
        .agg(
            F.max("_rho").alias("_m"),
            F.count_distinct("_h").alias("_nh"),
        )
    )
    term = (
        F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), _m)")
    ).cast("decimal(38,32)")
    per_group = per_bucket.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(term).alias("_s"),
        F.sum("_nh").alias("exact_distinct"),
    )
    total = (
        (F.lit(HLL_BUCKETS) - F.col("n_buckets")).cast("decimal(38,32)") + F.col("_s")
    )
    return per_group.select(
        *keys,
        "n_buckets",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(F.lit(HLL_ALPHA_M2) / total.cast("double"), 6).alias(estimate_alias),
    )


def kmv_set_ops(
    df: DataFrame,
    value_col: str,
    a_pred: Column,
    b_pred: Column,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style set algebra from one KMV pass: estimate
    |A ∪ B| and |A ∩ B| for two subsets of a value domain without ever
    materializing either distinct set.

    Mechanics: every value hashes to uniform [0,1) (md5 -> uint32); the
    k smallest distinct hashes of the UNION define theta = k-th hash.
    Union estimate = (k-1)/theta (KMV). Each retained hash carries two
    membership bits (seen under A / seen under B). Standard theta-sketch
    normalization: the k-1 hashes STRICTLY below theta are a uniform
    sample of the union at rate theta, so inter_est = n_both / theta =
    n_both * union_est / (k-1), with n_both counted over those k-1
    entries (the theta entry itself is excluded — it defines the
    threshold, it isn't part of the sample). With fewer than k distinct
    union values everything degrades to exact.

    Why it matters at scale: the retained state is k (hash, bit, bit)
    tuples per sketch — mergeable by re-truncation — so audience
    overlap between any two segments is a byte-sized summary problem,
    not a distinct-join. Deterministic md5 hashing keeps the whole
    estimator on the oracle-checked path (same contract as kmv_distinct
    / hll_distinct).

    Output (one row): exact_a, exact_b, exact_union, exact_inter,
    union_est, inter_est."""
    m = (
        df.select(
            _uhash(F.col(value_col)).alias("_h"),
            F.when(a_pred, 1).otherwise(0).alias("_a"),
            F.when(b_pred, 1).otherwise(0).alias("_b"),
        )
        .filter((F.col("_a") == 1) | (F.col("_b") == 1))
        .groupBy("_h")
        .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
    )
    agg = m.agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("_h", "_a", "_b"))), 1, k
        ).alias("_kmin"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum("_a").alias("exact_a"),
        F.sum("_b").alias("exact_b"),
        F.sum(F.col("_a") * F.col("_b")).alias("exact_inter"),
    )
    kth = F.element_at(F.col("_kmin"), k)["_h"]
    n_both = F.size(
        F.filter(
            F.slice(F.col("_kmin"), 1, k - 1),
            lambda s: (s["_a"] == 1) & (s["_b"] == 1),
        )
    )
    union_est = (k - 1) / (kth / F.lit(HASH_SPACE))
    return agg.select(
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_union"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        F.when(F.col("exact_union") < k, F.col("exact_union").cast("double"))
        .otherwise(F.round(union_est, 6))
        .alias("union_est"),
        F.when(F.col("exact_union") < k, F.col("exact_inter").cast("double"))
        .otherwise(F.round(n_both * union_est / (k - 1), 6))
        .alias("inter_est"),
    )


def bloom_membership(
    build: DataFrame,
    probe: DataFrame,
    value_col: str,
    m: int = 256,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter membership sketch: build a m-bit / k-hash filter
    over the build side's values, probe it with the probe side, and
    report the confusion counts (including deterministic false
    positives — md5-derived hash positions, so the SAME values collide
    on any engine, which is what makes the sketch oracle-checkable).

    Scale story: the filter state is a set of <= m bit positions —
    mergeable by union across partitions/datasets — so membership
    prefiltering (e.g. benchmark decontamination over a 100 TB corpus)
    ships a kilobyte bitmap to every executor instead of a distinct
    join; the exact semi-join runs only on the candidate survivors.
    Here the bitmap stays a DataFrame joined via broadcast — the same
    plan Spark generates for a real bitmap broadcast.

    Output (one row): n_probes, n_members, n_candidates, n_false_pos,
    bits_set. Candidate = every one of the value's (distinct) hash
    positions is set; false positive = candidate but not a member.
    """

    def pos(col: Column, i: int) -> Column:
        h = F.md5(F.concat(F.lit(f"{i}|"), col.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m

    bvals = build.select(F.col(value_col).alias("val")).distinct()
    bits = bvals.select(
        F.explode(F.array(*[pos(F.col("val"), i) for i in range(k)])).alias("bit")
    ).distinct()
    pvals = probe.select(F.col(value_col).alias("val")).distinct()
    pbits = pvals.select(
        "val", F.explode(F.array(*[pos(F.col("val"), i) for i in range(k)])).alias("bit")
    ).distinct()
    need = pbits.groupBy("val").agg(F.count(F.lit(1)).alias("n_need"))
    hit = (
        pbits.join(F.broadcast(bits), "bit")
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    flags = (
        need.join(hit, "val", "left")
        .withColumn("candidate", F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_need"))
        .join(bvals.withColumn("member", F.lit(True)), "val", "left")
        .withColumn("member", F.coalesce(F.col("member"), F.lit(False)))
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("c"))
    return flags.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count(F.when(F.col("member"), 1)).alias("n_members"),
        F.count(F.when(F.col("candidate"), 1)).alias("n_candidates"),
        F.count(F.when(F.col("candidate") & ~F.col("member"), 1)).alias("n_false_pos"),
    ).join(F.broadcast(n_bits.select(F.col("c").alias("bits_set"))))


def cms_heavy_hitter_counts(
    terms: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    w: int = 256,
    d: int = 3,
    k: int = 20,
) -> DataFrame:
    """Count-min sketch over a (term, count) frequency table, probed
    with the exact top-k terms: per depth row i, position = md5-derived
    hash of (i|term) mod w; counter[i][pos] accumulates counts; the
    estimate is min over the d row counters — always >= the true count,
    and with md5 positions the collisions (hence the exact
    over-estimates) are identical on any engine, so the sketch sits on
    the oracle-checked path like its siblings.

    Scale story: the sketch state is d*w counters — mergeable by
    element-wise sum, so corpus-wide term frequencies become a
    kilobyte-sized summary per partition/day/source that answers point
    frequency queries without re-scanning; the exact heavy-hitter
    groupBy remains the verify twin.

    Output: term, true_count, cms_est (both BIGINT; cms_est >= true)."""

    def pos(col: Column, i: int) -> Column:
        h = F.md5(F.concat(F.lit(f"{i}|"), col))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w

    depth = list(range(d))
    cells = terms.select(
        F.col(count_col).alias("_c"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), pos(F.col(term_col), i).alias("pos"))
                    for i in depth
                ]
            )
        ).alias("cell"),
    ).select(F.col("cell.row").alias("row"), F.col("cell.pos").alias("pos"), "_c")
    counters = cells.groupBy("row", "pos").agg(F.sum("_c").alias("counter"))
    probes = (
        terms.orderBy(F.desc(count_col), F.asc(term_col))
        .limit(k)
        .select(F.col(term_col).alias("term"), F.col(count_col).alias("true_count"))
    )
    probe_cells = probes.select(
        "term",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), pos(F.col("term"), i).alias("pos"))
                    for i in depth
                ]
            )
        ).alias("cell"),
    ).select("term", "true_count", F.col("cell.row").alias("row"), F.col("cell.pos").alias("pos"))
    return (
        probe_cells.join(F.broadcast(counters), ["row", "pos"])
        .groupBy("term", "true_count")
        .agg(F.min("counter").cast("long").alias("cms_est"))
    )


# AMS tug-of-war: number of independent estimator rows (median-of-R).
AMS_ROWS = 9


def ams_f2(
    df: DataFrame,
    value_col: str,
    n_rows: int = AMS_ROWS,
) -> DataFrame:
    """AMS "tug-of-war" sketch for the second frequency moment F2 =
    sum_v f(v)^2 (Alon, Matias & Szegedy 1996) — the self-join-size /
    repeat-rate estimate a cost-based optimizer wants for equi-join
    cardinality. Each of n_rows estimators draws a deterministic ±1
    sign per distinct value (md5 of (row, value): bit -> sign), folds
    Z_r = sum_v sign_r(v) * f(v) over the stream, and estimates F2 as
    Z_r^2; the output reports each estimator row beside the exact F2
    plus the mean and median-of-rows combiners (the paper's
    variance-reduction step).

    Everything is integer arithmetic (signs, counts, squares), so
    cross-engine parity is exact, and the sketch is MERGEABLE: Z_r of a
    union is the sum of per-partition Z_r — one combiner-friendly
    groupBy over (row, value) pre-aggregated counts, a R-row shuffle to
    merge, and a 1-row exact-F2 broadcast joined for the report. At
    100 TB the shuffled state is R longs per partition, nothing else."""
    freqs = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("f")
    )
    exact = freqs.agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2"))
    rows = F.explode(F.array(*[F.lit(i) for i in range(n_rows)])).alias("r")
    signed = freqs.select(F.col("v"), F.col("f"), rows).select(
        "r",
        (
            F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.col("r"), F.col("v"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
            * F.col("f")
        ).alias("z"),
    )
    ests = (
        signed.groupBy("r")
        .agg(F.sum("z").cast("long").alias("z_sum"))
        .select("r", (F.col("z_sum") * F.col("z_sum")).cast("long").alias("est_f2"))
    )
    combined = ests.agg(
        F.round(F.avg("est_f2"), 6).alias("mean_est"),
        F.expr("percentile(est_f2, 0.5)").alias("median_est"),
    )
    return (
        ests.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(combined))
        .select(
            "r",
            "est_f2",
            "exact_f2",
            F.col("mean_est"),
            F.round(F.col("median_est"), 6).alias("median_est"),
        )
    )


# Cumulative Poisson(1) CDF: P(X <= k) for k = 0..6; u >= the last
# entry maps to weight 7 (P beyond is ~1e-5 of mass). Literal strings
# are identical in both engines, so the thresholds are the same doubles.
POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)
BOOTSTRAP_B = 32


def poisson_bootstrap_ci(
    docs: DataFrame,
    value_col: str = "n_chars",
    b: int = BOOTSTRAP_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """Poisson bootstrap confidence interval for a corpus mean
    (Chamandy, Muralidharan, Najmi & Naidu 2012, 'Estimating
    Uncertainty for Massive Data Streams' — Google's one-pass
    bootstrap): instead of resampling n draws (impossible in one
    pass), give every row an independent Poisson(1) weight per
    replicate; replicate means then distribute like classical
    bootstrap means. The weight is the inverse-CDF of a deterministic
    per-(row, replicate) md5 uniform, so both engines draw the
    identical resample.

    Output: one row (n_docs, mean, boot_lo, boot_hi, n_replicates)
    with boot_lo/hi the ceil(0.05·B)/ceil(0.95·B) order statistics of
    the B replicate means — a ~90% percentile interval. The corpus
    mean and every replicate mean are exact integer-micros floor
    divisions (value_col is integral).

    Scale: ONE corpus pass exploded ×B with map-side combine into B
    groups — the shuffle carries B partial rows per partition, and the
    order-statistic window runs over B rows total. No second pass, no
    driver-side resampling."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.col("r").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(7)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(float(POISSON1_CDF[k])), F.lit(k)).otherwise(w)
    rep = docs.select(
        F.col(id_col),
        F.col(value_col).cast("long").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("r"),
    ).select("r", (w * F.col("x")).cast("long").alias("wx"), w.cast("long").alias("w"))
    means = (
        rep.groupBy("r")
        .agg(F.sum("wx").alias("swx"), F.sum("w").alias("sw"))
        .select(
            F.col("r"),
            F.expr("(swx * 10000000) div nullif(sw, 0)").alias("m7"),
        )
    )
    from pyspark.sql.window import Window

    # tiebreak on replicate id: equal means must rank identically on
    # both engines
    ranked = means.select(
        "m7", F.row_number().over(Window.orderBy("m7", "r")).alias("rk")
    )
    import math as _math

    lo_rk = _math.ceil(0.05 * b)
    hi_rk = _math.ceil(0.95 * b)
    picks = ranked.filter(F.col("rk").isin(lo_rk, hi_rk)).groupBy().agg(
        F.min(F.when(F.col("rk") == lo_rk, F.col("m7"))).alias("lo7"),
        F.min(F.when(F.col("rk") == hi_rk, F.col("m7"))).alias("hi7"),
    )
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(value_col).cast("long")).alias("sx"),
    ).select(
        "n_docs",
        F.expr("(sx * 10000000) div nullif(n_docs, 0)").alias("mean7"),
    )
    return base.crossJoin(F.broadcast(picks)).select(
        "n_docs",
        (F.col("mean7").cast("double") / F.lit(10000000.0)).alias("mean"),
        (F.col("lo7").cast("double") / F.lit(10000000.0)).alias("boot_lo"),
        (F.col("hi7").cast("double") / F.lit(10000000.0)).alias("boot_hi"),
        F.lit(b).cast("long").alias("n_replicates"),
    )


LC_BUCKETS = 1024


def linear_counting(
    events: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    m: int = LC_BUCKETS,
) -> DataFrame:
    """Linear-counting distinct estimator (Whang, Vander-Zanden &
    Taylor 1990) per group: hash keys into m buckets, count the empty
    buckets V, estimate n-hat = m*ln(m/V) — the small-range companion
    to HLL (it beats HLL's error below ~m distinct and is the standard
    HLL low-cardinality correction), reported against the exact
    distinct so the audit carries its own error.

    The bucket occupancy is exact integers (md5-prefix hash, the
    sketch-family _uhash convention); ln is the validated per-row
    path; saturation (V = 0) yields NULL rather than infinity on both
    engines. One combiner groupBy on (group, bucket) then a m-bounded
    fold per group — mergeable partials, no full-key shuffle at scale
    (the exact side keeps its own distinct for the audit only)."""
    b = events.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("k"),
        (_uhash(F.col(key_col)) % m).alias("bucket"),
    )
    per_group = b.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("k").cast("long").alias("exact_distinct"),
        F.countDistinct("bucket").cast("long").alias("occupied"),
    )
    v = (F.lit(m) - F.col("occupied")).cast("long")
    est = F.when(v > 0, F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v), 6))
    return per_group.select(
        F.col("grp").alias(group_col),
        "n_events",
        "exact_distinct",
        v.alias("n_empty"),
        est.alias("lc_estimate"),
        F.round(
            (est - F.col("exact_distinct")) * 100.0 / F.col("exact_distinct"), 6
        ).alias("err_pct"),
    )
