"""Deterministic mini k-means over embedding columns — the iterative
MLlib-style algorithm re-expressed as pure DataFrame operations.

Why it exists: training-data pipelines cluster embeddings constantly
(IVF cells, topic buckets, dedup prototypes, stratification). MLlib's
KMeans has random init and engine-private numerics; this variant is
built for the engine's correctness bar instead:

- init = the k lowest-id vectors (deterministic, oracle-reproducible);
- assignment = argmin of round(squared L2, 6) with centroid-id tiebreak
  (same convention as similarity.assign_ivf_cells);
- new centroids = per-dimension means accumulated in DECIMAL(38,12) —
  exact and associative, so the result is identical at any partition
  count and bit-equal to the unrolled-SQL oracle.

Scale shape per iteration: centroids are a k-row broadcast (the only
"model state" — never a driver collect of data); assignment is a narrow
map over the corpus; the mean recomputation is one combiner-friendly
groupBy on (cluster, dim) whose output is k*dim rows regardless of
corpus size. Iterations are a driver-side loop over small plans, each
cut with localCheckpoint — the standard Spark iterative-algorithm
pattern (same as dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _staged(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )


def _assign(staged: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per vector: broadcast cross join against k rows,
    rank-1 on (rounded squared distance, cluster_id)."""
    from pyspark.sql.window import Window

    vd, cv = F.col("vd"), F.col("cvec")
    dist = F.round(_dot(vd, vd) - 2 * _dot(vd, cv) + _dot(cv, cv), 6)
    w = Window.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("cluster_id"))
    return (
        staged.join(F.broadcast(cents))
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cluster_id")
    )


def _recompute(assigned: DataFrame, staged: DataFrame, id_col: str) -> DataFrame:
    """Per-dimension exact-decimal means -> rebuilt centroid arrays.

    groupBy(cluster, pos) output is k*dim rows; the array rebuild sorts
    the (pos, mean) structs per cluster — per-group cost only."""
    exploded = (
        assigned.join(staged, id_col)
        .select("cluster_id", F.posexplode("vd").alias("pos", "x"))
    )
    means = exploded.groupBy("cluster_id", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return means.groupBy("cluster_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def _initial_cents(staged: DataFrame, k: int, id_col: str) -> DataFrame:
    from pyspark.sql.window import Window

    return (
        staged.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).cast("long").alias("cluster_id"),
            F.col("vd").alias("cvec"),
        )
    )


def lloyd_assign_staged(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Session-staged final Lloyd assignment (id, cluster_id), keyed on
    the input plan (operators/staging.py): kmeans_lite, Davies-Bouldin,
    silhouette and MiniPile pruning all cluster the SAME corpus with
    the SAME deterministic chain — a production run materializes that
    assignment once and every validity/pruning consumer joins it (the
    duplicate_clusters precedent on the dedup side). Output is O(n)
    narrow rows, bounded at any corpus scale."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    def _build(d: DataFrame) -> DataFrame:
        st = _staged(d, id_col, vec_col).localCheckpoint(eager=False)
        cents = _initial_cents(st, k, id_col)
        assigned = None
        for _ in range(iters):
            assigned = _assign(st, cents, id_col)
            cents = _recompute(assigned, st, id_col).localCheckpoint(eager=False)
        return assigned

    return staged_from(
        embeddings.select(id_col, vec_col),
        f"lloyd_assign:{k}:{iters}:{id_col}:{vec_col}",
        _build,
    )


def lloyd_multiprobe_staged(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Session-staged MULTIPROBE assignment (id, cluster_id,
    probe_rank <= nprobe) against the SAME final-round centroids
    lloyd_assign_staged ranks (the c_{iters-1} table): the
    probe_rank = 1 rows ARE that assignment. This is the b-side widen
    dial for cell-local pair stages (the IVF multiprobe convention,
    similarity.assign_ivf_cells_multiprobe): indexing each point into
    its nprobe nearest cells roughly multiplies boundary-pair recall
    at nprobe x pair volume."""
    from pyspark.sql.window import Window

    from openrouter_batch_processor_spark.operators.staging import staged_from

    def _build(d: DataFrame) -> DataFrame:
        st = _staged(d, id_col, vec_col).localCheckpoint(eager=False)
        cents = _initial_cents(st, k, id_col)
        for _ in range(iters - 1):
            a = _assign(st, cents, id_col)
            cents = _recompute(a, st, id_col).localCheckpoint(eager=False)
        vd, cv = F.col("vd"), F.col("cvec")
        dist = F.round(_dot(vd, vd) - 2 * _dot(vd, cv) + _dot(cv, cv), 6)
        w = Window.partitionBy(id_col).orderBy(
            F.asc("dist"), F.asc("cluster_id")
        )
        return (
            st.join(F.broadcast(cents))
            .withColumn("dist", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select(
                id_col,
                "cluster_id",
                F.col("rn").cast("long").alias("probe_rank"),
            )
        )

    return staged_from(
        embeddings.select(id_col, vec_col),
        f"lloyd_probe:{k}:{iters}:{nprobe}:{id_col}:{vec_col}",
        _build,
    )


def final_cents_staged(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Session-staged post-assignment centroids (the c_{iters} table
    the validity scores measure against): one cheap recompute groupBy
    off the staged assignment, staged as k rows."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    def _build(d: DataFrame) -> DataFrame:
        st = _staged(d, id_col, vec_col)
        assigned = lloyd_assign_staged(d, k, iters, id_col, vec_col)
        return _recompute(assigned, st, id_col)

    return staged_from(
        embeddings.select(id_col, vec_col),
        f"lloyd_cents:{k}:{iters}:{id_col}:{vec_col}",
        _build,
    )


def kmeans_lite(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; output (id, cluster_id,
    cluster_size) under the final assignment.

    A cluster that loses all members simply drops out of the next
    centroid set (consistent on both engines). The assignment itself
    is the session-staged artifact (lloyd_assign_staged) shared with
    the validity/pruning consumers."""
    assigned = lloyd_assign_staged(embeddings, k, iters, id_col, vec_col)
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return assigned.join(F.broadcast(sizes), "cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )


def davies_bouldin(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Davies-Bouldin cluster-quality index (Davies & Bouldin 1979)
    over the deterministic Lloyd clustering — the internal validity
    score a pipeline uses to pick k or to reject a degenerate
    clustering before SemDeDup/prototype pruning trusts the cells:
    DB = mean_i max_{j != i} (S_i + S_j) / M_ij with S_i the mean
    member-to-centroid distance and M_ij the centroid separation
    (lower = tighter, better-separated clusters).

    Float discipline: distances reuse the clustering's round-6
    squared-L2 convention (sqrt'd, clamped at 0 against fp negatives);
    S_i is a 9-dp decimal sum over members / n; R_ij and the max are
    pure double ops on those deterministic values; the final index is
    a 9-dp decimal mean over k rows.

    Scale: S_i is one combiner groupBy over the corpus (k groups);
    everything after operates on k-row / k²-row centroid tables —
    broadcast-sized by construction. Output: one row per cluster
    (cluster_id, cluster_size, s_intra, r_max, db_index)."""
    staged = _staged(embeddings, id_col, vec_col)
    assigned = lloyd_assign_staged(embeddings, k, iters, id_col, vec_col)
    cents = final_cents_staged(embeddings, k, iters, id_col, vec_col)

    vd, cv = F.col("vd"), F.col("cvec")
    d2 = F.round(_dot(vd, vd) - 2 * _dot(vd, cv) + _dot(cv, cv), 6)
    member = (
        assigned.join(staged, id_col)
        .join(F.broadcast(cents), "cluster_id")
        .select("cluster_id", F.sqrt(F.greatest(d2, F.lit(0.0))).alias("dist"))
    )
    s = member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        (
            F.sum(F.round(F.col("dist"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("s_intra"),
    )
    ca = cents.select(F.col("cluster_id").alias("ca"), F.col("cvec").alias("va"))
    cb = cents.select(F.col("cluster_id").alias("cb"), F.col("cvec").alias("vb"))
    va, vb = F.col("va"), F.col("vb")
    m2 = F.round(_dot(va, va) - 2 * _dot(va, vb) + _dot(vb, vb), 6)
    m = (
        ca.join(F.broadcast(cb), F.col("ca") != F.col("cb"))
        .select("ca", "cb", F.sqrt(F.greatest(m2, F.lit(0.0))).alias("mij"))
    )
    r = (
        m.join(
            F.broadcast(s.select(F.col("cluster_id").alias("ca"),
                                 F.col("s_intra").alias("sa"))), "ca")
        .join(
            F.broadcast(s.select(F.col("cluster_id").alias("cb"),
                                 F.col("s_intra").alias("sb"))), "cb")
        .groupBy(F.col("ca").alias("cluster_id"))
        .agg(F.max((F.col("sa") + F.col("sb")) / F.col("mij")).alias("r_max"))
    )
    db = r.agg(
        (
            F.sum(F.round(F.col("r_max"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("dbi")
    )
    return (
        s.join(r, "cluster_id")
        .crossJoin(F.broadcast(db))
        .select(
            "cluster_id",
            "cluster_size",
            F.round(F.col("s_intra"), 6).alias("s_intra"),
            F.round(F.col("r_max"), 6).alias("r_max"),
            F.round(F.col("dbi"), 6).alias("db_index"),
        )
    )


def silhouette(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette over the deterministic
    Lloyd clustering (Rousseeuw 1987; the centroid variant is the
    O(n*k) form every large-scale validity audit uses — the O(n²)
    pairwise version can't exist at corpus scale): a_i = dist to own
    centroid, b_i = min dist to any other centroid, s_i =
    (b_i − a_i)/max(a_i, b_i). Per-cluster mean s and the overall
    point mean.

    Distances reuse the clustering's round-6 squared-L2 + sqrt
    convention (kmeans/davies_bouldin); per-point s is double off
    those deterministic values, 9-dp folded per cluster and overall.
    One n×k broadcast distance pass; everything after is k rows."""
    staged = _staged(embeddings, id_col, vec_col)
    assigned = lloyd_assign_staged(embeddings, k, iters, id_col, vec_col)
    cents = final_cents_staged(embeddings, k, iters, id_col, vec_col)

    vd, cv = F.col("vd"), F.col("cvec")
    d2 = F.round(_dot(vd, vd) - 2 * _dot(vd, cv) + _dot(cv, cv), 6)
    dist = F.sqrt(F.greatest(d2, F.lit(0.0)))
    all_d = (
        assigned.withColumnRenamed("cluster_id", "own")
        .join(staged, id_col)
        .crossJoin(F.broadcast(cents))
        .select(id_col, "own", "cluster_id", dist.alias("d"))
    )
    per_point = all_d.groupBy(id_col, "own").agg(
        F.min(F.when(F.col("cluster_id") == F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("cluster_id") != F.col("own"), F.col("d"))).alias("b"),
    )
    s = F.when(
        F.greatest(F.col("a"), F.col("b")) > 0,
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
    ).otherwise(F.lit(0.0))
    pts = per_point.select(
        F.col("own").alias("cluster_id"), F.round(s, 9).alias("s9")
    )
    overall = pts.agg(
        F.round(
            F.sum(F.col("s9").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("overall_s")
    )
    return (
        pts.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.round(
                F.sum(F.col("s9").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_s"),
        )
        .crossJoin(F.broadcast(overall))
    )


def mauve_frontier(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """MAUVE-style divergence frontier between two embedding
    populations (Pillutla et al. 2021): quantize both onto the SAME
    deterministic Lloyd clustering (the paper's k-means quantization
    step), then for mixture weights λ = 0.1 … 0.9 report
    KL(P ‖ R_λ) and KL(Q ‖ R_λ) with R_λ = λP + (1−λ)Q over the
    cluster histograms. P = even labels, Q = odd labels — the
    model-vs-human split of the paper recast as the two-population
    drift audit a curation run uses to compare sources or snapshots
    (the frontier collapses toward 0 iff the populations occupy the
    cells with the same mass; one-sided KL alone misses mode
    dropping, which is the point of sweeping λ).

    Scale: rides the session-staged lloyd_assign_staged artifact
    (shared with kmeans_lite / silhouette / Davies-Bouldin — no new
    corpus pass), one combiner groupBy to the k-cell histogram, and
    everything after is 9·k rows of pure arithmetic. Zero-mass cells
    contribute 0 by the 0·ln 0 convention; R_λ > 0 wherever P or Q
    has mass, so no log of zero can form. Contributions fold as
    round(x, 9) decimals — order-invariant."""
    assigned = lloyd_assign_staged(embeddings, k, iters, id_col, vec_col)
    lab = embeddings.select(
        id_col, (F.col(label_col) % 2 == 0).alias("is_p")
    )
    hist = (
        assigned.join(lab, id_col)
        .groupBy("cluster_id")
        .agg(
            F.sum(F.when(F.col("is_p"), 1).otherwise(0)).cast("long").alias("cp"),
            F.sum(F.when(~F.col("is_p"), 1).otherwise(0)).cast("long").alias("cq"),
        )
    )
    tot = hist.agg(
        F.sum("cp").cast("double").alias("np"),
        F.sum("cq").cast("double").alias("nq"),
    )
    spark = embeddings.sparkSession
    lam = spark.range(1, 10).select(F.col("id").cast("long").alias("lt"))
    p = F.col("cp") / F.col("np")
    q = F.col("cq") / F.col("nq")
    r = (F.col("lt") / 10.0) * p + (F.lit(1.0) - F.col("lt") / 10.0) * q
    cells = (
        lam.join(F.broadcast(hist))
        .join(F.broadcast(tot))
        .select(
            "lt",
            F.col("np").cast("long").alias("n_p"),
            F.col("nq").cast("long").alias("n_q"),
            F.when(F.col("cp") > 0, F.round(p * F.log(p / r), 9))
            .otherwise(F.lit(0.0))
            .cast("decimal(28,9)")
            .alias("kp"),
            F.when(F.col("cq") > 0, F.round(q * F.log(q / r), 9))
            .otherwise(F.lit(0.0))
            .cast("decimal(28,9)")
            .alias("kq"),
        )
    )
    return (
        cells.groupBy("lt", "n_p", "n_q")
        .agg(
            F.round(F.sum("kp").cast("double"), 6).alias("kl_p"),
            F.round(F.sum("kq").cast("double"), 6).alias("kl_q"),
        )
        .select(
            F.col("lt").alias("lam_tenths"), "n_p", "n_q", "kl_p", "kl_q"
        )
    )


def cluster_label_agreement(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """External clustering validity vs the label column: purity,
    normalized mutual information (NMI, sqrt normalization) and the
    adjusted Rand index over the (cluster, label) contingency table —
    the standard triple for 'did the clustering find the classes'
    (Manning et al., IR ch.16; Hubert & Arabie 1985 for ARI). A corpus
    whose Lloyd cells align with labels clusters by semantics; one that
    doesn't is clustering on nuisance structure — worth knowing before
    SemDeDup/MiniPile prune against those cells.

    Rides the session-staged Lloyd assignment; the contingency table is
    one combiner groupBy, bounded by k x |labels| cells. ARI is exact
    BIGINT pair counting until the final division; MI/entropy terms
    round to 9dp decimals so the folds are order-invariant."""
    assigned = lloyd_assign_staged(embeddings, k, iters, id_col, vec_col)
    lab = embeddings.select(F.col(id_col), F.col(label_col).alias("lbl"))
    ct = (
        assigned.join(lab, id_col)
        .groupBy("cluster_id", "lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    a = ct.groupBy("cluster_id").agg(F.sum("nij").cast("long").alias("ai"))
    b = ct.groupBy("lbl").agg(F.sum("nij").cast("long").alias("bj"))
    tot = ct.agg(
        F.sum("nij").cast("long").alias("n"),
        F.sum(F.expr("nij * (nij - 1) DIV 2")).cast("long").alias("sum_nij2"),
    )
    best = ct.groupBy("cluster_id").agg(F.max("nij").cast("long").alias("mx"))
    purity_num = best.agg(F.sum("mx").cast("long").alias("pnum"))
    mi_terms = (
        ct.join(F.broadcast(a), "cluster_id")
        .join(F.broadcast(b), "lbl")
        .join(F.broadcast(tot.select("n")))
        .select(
            F.round(
                (F.col("nij") / F.col("n"))
                * F.log(
                    F.col("n")
                    * F.col("nij")
                    / (F.col("ai") * F.col("bj")).cast("double")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
    )
    mi = mi_terms.agg(F.sum("t").cast("double").alias("mi"))
    hc = (
        a.join(F.broadcast(tot.select("n")))
        .select(
            F.round(
                -(F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n")), 9
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hc"))
    )
    hl = (
        b.join(F.broadcast(tot.select("n")))
        .select(
            F.round(
                -(F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n")), 9
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hl"))
    )
    pa = a.agg(
        F.count(F.lit(1)).cast("long").alias("k_clusters"),
        F.sum(F.expr("ai * (ai - 1) DIV 2")).cast("long").alias("sum_ai2"),
    )
    pb = b.agg(
        F.count(F.lit(1)).cast("long").alias("k_labels"),
        F.sum(F.expr("bj * (bj - 1) DIV 2")).cast("long").alias("sum_bj2"),
    )
    j = (
        tot.join(F.broadcast(purity_num))
        .join(F.broadcast(mi))
        .join(F.broadcast(hc))
        .join(F.broadcast(hl))
        .join(F.broadcast(pa))
        .join(F.broadcast(pb))
    )
    n2 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    # divide BEFORE multiplying: sum_ai2 * sum_bj2 as BIGINT overflows
    # 2^63 around ~300k balanced vectors (and the oracle's BIGINT
    # product would hard-error where Spark wraps) — the double ratio
    # first keeps both engines in range and identical
    exp_idx = (F.col("sum_ai2") / n2) * F.col("sum_bj2")
    max_idx = (F.col("sum_ai2") + F.col("sum_bj2")) / 2.0
    return j.select(
        "k_clusters",
        "k_labels",
        F.col("n").alias("n_vecs"),
        F.round(F.col("pnum") / F.col("n"), 6).alias("purity"),
        F.when(
            (F.col("hc") > 0) & (F.col("hl") > 0),
            F.round(F.col("mi") / F.sqrt(F.col("hc") * F.col("hl")), 6),
        ).alias("nmi"),
        F.when(
            max_idx != exp_idx,
            F.round(
                (F.col("sum_nij2") - exp_idx) / (max_idx - exp_idx), 6
            ),
        ).alias("ari"),
    )
