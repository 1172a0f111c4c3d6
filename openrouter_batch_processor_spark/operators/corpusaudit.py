"""Statistical corpus audits for training-data pipelines: distribution
drift (KS / Jensen-Shannon), inequality (Gini), rank correlation
(Spearman), calibration (Brier decomposition), and privacy
(k-anonymity / l-diversity).

Every operator follows the repo's cross-engine exactness discipline
(see operators/textanalysis.py): integer/decimal arithmetic end-to-end
where possible, per-row double ops only from already-agreed values,
and every cross-row double sum rounded to a fixed decimal grid before
the DECIMAL aggregation. Windows are value-histogram-sized (distinct
values), never corpus-row-sized, so each plan survives a 100 TB
corpus: the heavy passes are combiner group-bys; the windows and
grids run over bounded dimension tables.

These extend the reference's audit surface (counting/profiling in
/root/reference/app.py:229-260 job summaries) with the statistical
checks a large-scale curation pipeline runs between pipeline stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.operators.textanalysis import (
    quality_scores,
    whitespace_token_count,
)


def ks_drift(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the quality-score
    distributions of two source cohorts (sources src0-9 = cohort a,
    src10-19 = cohort b — the "old crawl vs new crawl" drift gate a
    curation pipeline runs before mixing releases).

    D is found EXACTLY: per distinct score the two empirical CDFs are
    compared on the common denominator — |cum_a·n_b − cum_b·n_a| in
    DECIMAL(38,0), so no float CDF ever exists and the maximizing cut
    (ties → lowest score) is engine-independent. The asymptotic
    p-value (Kolmogorov distribution, Stephens' small-sample
    correction, 3 series terms) is a single-row double computation
    from the already-agreed integers.

    Scale: one score pass, one distinct-score combiner groupBy, a
    cumulative window over the distinct-score histogram (bounded by
    the 6-dp score grid, ≤1e6 rows regardless of corpus size), a
    1-row totals broadcast, and a 1-row TakeOrdered."""
    from pyspark.sql import Window

    scores = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    labeled = scores.join(
        docs.select(F.col(id_col), F.col(source_col)), id_col
    ).select(
        F.col("quality_score").alias("s"),
        (F.substring(F.col(source_col), 4, 10).cast("int") < 10)
        .cast("long")
        .alias("in_a"),
    )
    g = labeled.groupBy("s").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("cb"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "s",
        F.sum("ca").over(w).cast("long").alias("cuma"),
        F.sum("cb").over(w).cast("long").alias("cumb"),
    )
    tot = labeled.agg(
        F.sum("in_a").cast("long").alias("na"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("nb"),
    )
    dec = "decimal(38,0)"
    top = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "s",
            "na",
            "nb",
            F.abs(
                F.col("cuma").cast(dec) * F.col("nb").cast(dec)
                - F.col("cumb").cast(dec) * F.col("na").cast(dec)
            ).alias("dnum"),
        )
        .orderBy(F.col("dnum").desc(), F.col("s").asc())
        .limit(1)
    )
    d = F.col("dnum").cast("double") / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    en = F.sqrt(
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        / (F.col("na") + F.col("nb")).cast("double")
    )
    lam = (en + F.lit(0.12) + F.lit(0.11) / en) * d
    p = (
        F.lit(2.0)
        * (
            F.exp(F.lit(-2.0) * lam * lam)
            - F.exp(F.lit(-8.0) * lam * lam)
            + F.exp(F.lit(-18.0) * lam * lam)
        )
    )
    return top.select(
        "na",
        "nb",
        F.col("s").alias("cut"),
        F.round(d, 9).alias("d_stat"),
        F.round(F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0)), 6).alias("p_value"),
    )


def token_gini(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gini coefficient of the per-document token-count distribution —
    the length-inequality audit (a corpus whose token mass concentrates
    in few giant documents packs/shards badly and skews per-doc loss
    weighting).

    Computed EXACTLY from the token-count histogram: for distinct
    count v with multiplicity c after cumulative count f, the sorted
    rank-weighted mass Σ i·x over the tied block is
    v·(c·f + c(c+1)/2) — integer algebra in DECIMAL(38,0), so
    G = (2·Σi·x − (n+1)·Σx) / (n·Σx) involves exactly one final
    double division. Tie order never matters (equal x within a block).

    Scale: one token-count pass, one distinct-count combiner groupBy,
    a cumulative window over the count histogram (bounded by distinct
    document lengths, not corpus rows), one global 1-row aggregate."""
    from pyspark.sql import Window

    x = docs.select(whitespace_token_count(F.col(text_col)).alias("x"))
    h = x.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    cum = h.select(
        "x",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("long").alias("f"),
    )
    # 2·Σ i·x over a tied block = x·c·(2f + c + 1): stays in integer
    # algebra (the /2 of the rank-sum formula cancels), so no decimal
    # scale ever appears
    contrib2 = (
        F.col("x").cast(dec)
        * F.col("c").cast(dec)
        * (F.lit(2).cast(dec) * F.col("f").cast(dec) + F.col("c").cast(dec) + 1)
    )
    agg = cum.agg(
        F.sum("c").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec) * F.col("c").cast(dec)).alias("sx"),
        F.sum(contrib2).alias("six2"),
    )
    gini = (
        (F.col("six2") - (F.col("n") + 1) * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("sx").cast("long").alias("total_tokens"),
        F.round(gini, 9).alias("gini"),
    )


def source_js(
    docs: DataFrame,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Jensen-Shannon divergence from the corpus unigram
    distribution over the same 512-bucket hashed feature space as
    source_kl / dsir_logweights — the bounded (≤ ln 2), symmetric
    drift score that stays finite even for disjoint vocabularies, so
    it ranks sources comparably where KL saturates.

    Same add-one smoothing and full-grid contract as source_kl
    (operators/textanalysis.source_kl): absent buckets still carry
    mass, contributions are rounded to 9 dp then decimal-summed.
    js_dist = sqrt(js / ln 2) is the normalized metric form
    (Endres & Schindelin 2003), a per-row double from the agreed sum.

    Scale: one token pass, two combiner group-bys, a
    (sources × 512)-row dimension grid — corpus-size-independent."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    toks = (
        docs.select(
            F.col(source_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(F.col(source_col), bucket.alias("bucket"))
    )
    obs = toks.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    allb = docs.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    cb = allb.join(obs, "bucket", "left").select(
        "bucket", F.coalesce("cb", F.lit(0)).cast("long").alias("cb")
    )
    sb = toks.groupBy(source_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    stot = toks.groupBy(source_col).agg(F.count(F.lit(1)).cast("long").alias("ts"))
    ctot = cb.agg(F.sum("cb").cast("double").alias("tc"))
    grid = (
        stot.crossJoin(F.broadcast(cb))
        .join(sb, [source_col, "bucket"], "left")
        .crossJoin(F.broadcast(ctot))
    )
    ps = (F.coalesce(F.col("cs"), F.lit(0)) + 1) / (
        F.col("ts") + F.lit(float(n_buckets))
    )
    pc = (F.col("cb") + 1) / (F.col("tc") + F.lit(float(n_buckets)))
    m = (ps + pc) / 2
    contrib = F.round(
        F.lit(0.5) * ps * F.log(ps / m) + F.lit(0.5) * pc * F.log(pc / m), 9
    ).cast("decimal(28,9)")
    out = (
        grid.select(F.col(source_col), F.col("ts"), contrib.alias("contrib"))
        .groupBy(source_col, "ts")
        .agg(F.round(F.sum("contrib").cast("double"), 6).alias("js"))
    )
    return out.select(
        F.col(source_col),
        F.col("ts").alias("n_tokens"),
        "js",
        F.round(
            F.sqrt(F.greatest(F.col("js"), F.lit(0.0)) / F.lit(0.6931471805599453)), 6
        ).alias("js_dist"),
    )


def k_anonymity(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier
    (source, lang, 256-char length bucket) with the decile quality
    bucket as the sensitive attribute (Sweeney 2002; Machanavajjhala
    et al. 2007): the release-safety profile a pipeline checks before
    publishing per-document metadata.

    Output (one row): number of QI equivalence classes, the corpus
    k-anonymity (min class size), how many classes and documents fall
    below k, and the corpus l-diversity (min distinct sensitive values
    per class). All counts — exact by construction.

    Scale: one combiner groupBy onto the bounded QI space
    (sources × langs × length buckets), one 1-row aggregate."""
    scores = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    labeled = docs.select(
        F.col(id_col),
        F.col("source"),
        F.col("lang"),
        F.expr("n_chars div 256").alias("len_bucket"),
    ).join(scores, id_col)
    g = labeled.groupBy("source", "lang", "len_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct(
            F.least(F.floor(F.col("quality_score") * 10).cast("long"), F.lit(9))
        )
        .cast("long")
        .alias("l"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("k_anonymity"),
        F.sum((F.col("sz") < k).cast("long")).cast("long").alias("n_groups_below_k"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_docs_below_k"),
        F.min("l").cast("long").alias("l_diversity"),
    )


def spearman_quality_len(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Spearman rank correlation between the heuristic quality score
    and document token count — the "is my quality filter just a length
    filter?" audit every curation stack owes its users (tie-averaged
    ranks, i.e. Pearson on midranks, the standard tied form).

    Ranks are EXACT integers: midrank·2 = 2·(preceding count) +
    (tie count) + 1, computed on the distinct-value histogram of each
    variable and joined back, so no float rank ever exists. All six
    Pearson sums accumulate in DECIMAL(38,0) (exact to corpora of
    ~1e9 docs; the docstring bound, not a silent overflow — ANSI mode
    raises beyond it) and rho is one final double expression.

    Scale: two histogram group-bys + histogram-sized windows, two
    value equi-joins back, one 1-row aggregate. No corpus-row-sized
    window anywhere."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    base = quality_scores(docs, id_col, text_col).select(
        id_col, "quality_score", F.col("n_tokens").alias("y_val")
    )

    def midranks(df: DataFrame, col: str) -> DataFrame:
        h = df.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return h.select(
            col,
            (
                F.lit(2) * (F.sum("c").over(w) - F.col("c"))
                + F.col("c")
                + F.lit(1)
            )
            .cast("long")
            .alias(f"r2_{col}"),
        )

    rx = midranks(base.select("quality_score"), "quality_score")
    ry = midranks(base.select("y_val"), "y_val")
    ranked = (
        base.join(rx, "quality_score")
        .join(ry, "y_val")
        .select(
            F.col("r2_quality_score").cast(dec).alias("rx"),
            F.col("r2_y_val").cast(dec).alias("ry"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(num / F.sqrt(d1 * d2), 9).alias("rho"),
    )


def brier_decomposition(
    docs: DataFrame,
    positive_lang: str = "en",
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score for the quality
    score as a classifier of ``positive_lang``: BS, reliability,
    resolution, uncertainty — the companion audit to quality_ece
    (same equal-width bins), separating "miscalibrated" from
    "uninformative".

    The Brier score itself is EXACT: scores live on the 6-dp grid, so
    Σ(p6 − y·1e6)² accumulates in DECIMAL(38,0) with one final double
    division. Reliability/resolution/uncertainty use the repo's
    integer-micros convention — per-bin confidence and accuracy as
    7-dp floor divisions (identical to quality_ece), squared gaps in
    DECIMAL — so the decomposition is deterministic cross-engine.
    Note rel − res + unc equals BS only up to the within-bin forecast
    variance (Murphy's identity assumes constant forecasts per bin);
    the components are reported as defined, the residual is expected.

    Scale: one score pass, one n_bins combiner aggregate, 1-row
    broadcasts of the corpus base rate."""
    dec = "decimal(38,0)"
    scores = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    labeled = scores.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    ).select(
        F.round(F.col("quality_score") * 1000000, 0).cast("long").alias("p6"),
        F.least(
            F.floor(F.col("quality_score") * n_bins).cast("long"), F.lit(n_bins - 1)
        ).alias("bin_id"),
        (F.col(lang_col) == positive_lang).cast("long").alias("y"),
    )
    bins = labeled.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("p6").cast(dec).alias("sp6"),
        F.sum("y").cast("long").alias("pb"),
        F.sum(
            (F.col("p6").cast(dec) - F.col("y").cast(dec) * 1000000)
            * (F.col("p6").cast(dec) - F.col("y").cast(dec) * 1000000)
        ).alias("bnum"),
    )
    tot = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
    )
    # conf7/acc7/base7 live on the 7-dp grid as BIGINT floor
    # divisions (same convention as quality_ece); numerators stay
    # under int64 up to ~9e11 docs — document the bound, ANSI raises
    # past it rather than wrapping
    per = bins.crossJoin(F.broadcast(tot)).select(
        "nb",
        "bnum",
        F.expr("(cast(sp6 as bigint) * 10) div nb").alias("conf7"),
        F.expr("(pb * 10000000) div nb").alias("acc7"),
        F.expr("(p * 10000000) div n").alias("base7"),
        "n",
        "p",
    )
    agg = per.agg(
        F.max("n").alias("n"),
        F.max("p").alias("p"),
        F.sum("bnum").alias("brier_num"),
        F.sum(
            F.col("nb").cast(dec)
            * (F.col("conf7") - F.col("acc7"))
            * (F.col("conf7") - F.col("acc7"))
        ).alias("rel_num"),
        F.sum(
            F.col("nb").cast(dec)
            * (F.col("acc7") - F.col("base7"))
            * (F.col("acc7") - F.col("base7"))
        ).alias("res_num"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(
            F.col("brier_num").cast("double") / (nd * F.lit(1e12)), 9
        ).alias("brier"),
        F.round(
            F.col("rel_num").cast("double") / (nd * F.lit(1e14)), 9
        ).alias("reliability"),
        F.round(
            F.col("res_num").cast("double") / (nd * F.lit(1e14)), 9
        ).alias("resolution"),
        F.round(
            F.col("p").cast("double")
            * (nd - F.col("p").cast("double"))
            / (nd * nd),
            9,
        ).alias("uncertainty"),
    )


def cramers_v(docs: DataFrame, row_col: str = "source", col_col: str = "lang") -> DataFrame:
    """Cramér's V association between two categorical columns
    (default source × lang) via the exact chi-square statistic — the
    "are my sources language-balanced?" audit. Zero cells CONTRIBUTE
    (o=0 ⇒ (o−e)²/e = e), so the grid is the full R×C cross of the
    observed margins.

    Exactness: per-cell contribution is ((o·n − r·c)²) / (n·r·c) with
    both sides exact in DECIMAL(38,0) (safe to ~1e9 rows; ANSI raises
    past it), the quotient a per-row double rounded to 9 dp and
    decimal-summed. V = sqrt(chi2 / (n·(min(R,C)−1))).

    Scale: one combiner groupBy onto the R×C contingency (dimension-
    sized), margins as two more tiny aggregates, an R×C grid join."""
    dec = "decimal(38,0)"
    cells = docs.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy(row_col).agg(F.sum("o").cast("long").alias("r"))
    cols = cells.groupBy(col_col).agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct(row_col).cast("long").alias("n_rows"),
        F.countDistinct(col_col).cast("long").alias("n_cols"),
    )
    grid = (
        rows.crossJoin(F.broadcast(cols))
        .join(cells, [row_col, col_col], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_rows",
            "n_cols",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
            "r",
            "c",
        )
    )
    num = (
        F.col("o").cast(dec) * F.col("n").cast(dec)
        - F.col("r").cast(dec) * F.col("c").cast(dec)
    )
    den = F.col("n").cast(dec) * F.col("r").cast(dec) * F.col("c").cast(dec)
    contrib = F.round((num * num).cast("double") / den.cast("double"), 9).cast(
        "decimal(28,9)"
    )
    agg = grid.groupBy("n", "n_rows", "n_cols").agg(
        F.sum(contrib).alias("chi2d")
    )
    chi2 = F.col("chi2d").cast("double")
    v = F.sqrt(
        chi2
        / (
            F.col("n").cast("double")
            * (F.least(F.col("n_rows"), F.col("n_cols")) - 1).cast("double")
        )
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def chao1_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Chao1 lower-bound estimate of the UNSEEN vocabulary size
    (Chao 1984, bias-corrected form): chao1 = V + f1(f1−1)/(2(f2+1))
    from the frequency-of-frequencies — the "how much vocabulary does
    another crawl buy?" companion to good_turing/heaps_fit. Pure
    integer counts, one final double division.

    Scale: one (term) combiner groupBy, one 1-row aggregate."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    tf = (
        docs.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    agg = tf.agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum((F.col("tf") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("tf") == 2).cast("long")).cast("long").alias("f2"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    extra = (
        (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (2 * (F.col("f2") + 1)).cast("double")
    )
    return agg.select(
        "n_tokens",
        "v_obs",
        "f1",
        "f2",
        F.round(F.col("v_obs") + extra, 6).alias("chao1"),
    )


def simpson_diversity(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Vocabulary diversity audit per source: Simpson's D (one minus
    the probability two tokens drawn without replacement are the same
    type — Simpson 1949), Shannon entropy H in nats, and Pielou
    evenness H/ln(V). The trio is the standard corpus-composition
    check before mixing sources: a source with collapsing diversity is
    boilerplate/template mass in disguise.

    Simpson's numerator Σ f(f−1) and N(N−1) are exact integers
    (DECIMAL(38,0) algebra, one final double division); H follows the
    per-row round(−p·ln p, 9) decimal-sum contract. One (group, token)
    combiner groupBy over the corpus; everything downstream is
    vocabulary-sized."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    tf = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    dec = "decimal(38,0)"
    n = tf.groupBy("grp").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("f").cast(dec) * (F.col("f").cast(dec) - 1)).alias("sff"),
    )
    h = (
        tf.join(n.select("grp", "n_tokens"), "grp")
        .groupBy("grp")
        .agg(
            F.sum(
                F.round(
                    -(F.col("f") / F.col("n_tokens"))
                    * F.log(F.col("f") / F.col("n_tokens")),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("shannon")
        )
    )
    return (
        n.join(h, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "vocab",
            F.when(F.col("n_tokens") <= 1, F.lit(0.0))
            .otherwise(
                F.round(
                    F.lit(1.0)
                    - F.col("sff").cast("double")
                    / (
                        F.col("n_tokens").cast(dec)
                        * (F.col("n_tokens").cast(dec) - 1)
                    ).cast("double"),
                    9,
                )
            )
            .alias("simpson_d"),
            F.round(F.col("shannon"), 6).alias("shannon_h"),
            # Pielou evenness is undefined for a single-type source
            # (ln V = 0); report 0 — maximal UNevenness is the curation
            # reading of an all-boilerplate source
            F.when(F.col("vocab") <= 1, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("shannon") / F.log(F.col("vocab").cast("double")), 6
                )
            )
            .alias("evenness"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    mod: int = 10,
    val_from: int = 8,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out n-gram novelty per language: the fraction of the val
    split's distinct n-grams never seen in the train split — the
    memorization/diversity audit (a low novelty rate means the held-out
    set re-states training text, so eval loss measures recall, not
    generalization; the Lee et al. 2022 dedup paper's motivating
    statistic). Split = doc_id mod — deterministic, the
    sample_train_val_test_split convention.

    Execution: one n-gram expansion (explode_outer + isNotNull, the
    InferFiltersFromGenerate guard), two distinct combiner groupBys,
    one left_anti join on the n-gram key — at 100 TB the anti join
    shuffles hashed n-grams, never documents."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), F.col(lang_col).alias("lang"), toks.alias("toks"))
    grams = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " "),
        ),
    )
    tg = (
        base.select(
            id_col, "lang", F.explode_outer(grams).alias("tg")
        ).filter(F.col("tg").isNotNull())
    )
    train = (
        tg.filter((F.col(id_col) % mod) < val_from).select("tg").distinct()
    )
    val = (
        tg.filter((F.col(id_col) % mod) >= val_from)
        .select("lang", "tg")
        .distinct()
    )
    novel = val.join(train, "tg", "left_anti").groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    nval = val.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_val_ngrams")
    )
    return (
        nval.join(novel, "lang", "left")
        .select(
            "lang",
            "n_val_ngrams",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_val_ngrams"), 6
            ).alias("novelty"),
        )
    )


def anova_length(
    docs: DataFrame, group_col: str = "lang", value_col: str = "n_chars"
) -> DataFrame:
    """One-way ANOVA of document length across languages (Fisher's
    F): between/within sums of squares from per-group integer
    (n, S=Σx, Q=Σx²) triples, F = (SSB/(k−1))/(SSW/(N−k)) and
    η² = SSB/SST — the "does length differ by language?" screen that
    decides whether length-based quality gates need per-language
    thresholds.

    Exactness: x is integer, so every (n, S, Q) is an exact BIGINT;
    the only divisions are S_g²/n_g per group (double of exact ints,
    identical cross-engine, 9-dp rounded and DECIMAL-folded across
    the k groups) and the closing F/η² arithmetic. One combiner
    groupBy over the corpus; everything after is k rows."""
    g = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(value_col).cast("long").alias("s_g"),
        F.sum(F.col(value_col) * F.col(value_col)).cast("long").alias("q_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("nn"),
        F.sum("s_g").cast("long").alias("ss"),
        F.sum("q_g").cast("long").alias("qq"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.round(
                F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g"), 9
            ).cast("decimal(28,9)")
        ).cast("double").alias("sb_part"),
    )
    grand = F.col("ss").cast("double") * F.col("ss") / F.col("nn")
    ssb = F.col("sb_part") - grand
    ssw = F.col("qq") - F.col("sb_part")
    sst = F.col("qq") - grand
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k")))
    stats = tot.select(
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )
    return (
        g.select(
            F.col("grp").alias(group_col),
            F.col("n_g").alias("n_docs"),
            F.round(F.col("s_g").cast("double") / F.col("n_g"), 6).alias("mean_len"),
            F.round(
                (
                    F.col("q_g").cast("double")
                    - F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
                )
                / F.col("n_g"),
                6,
            ).alias("var_len"),
        )
        .crossJoin(F.broadcast(stats))
    )


def dedup_impact(docs: DataFrame) -> DataFrame:
    """Before/after dedup corpus ablation: token-level statistics of
    the full corpus vs the keep-first survivors of the MinHash-LSH
    cluster policy — the ablation table a training run reads before
    trusting a dedup config (how many tokens did we pay, did diversity
    actually improve?). Metrics per phase: docs, tokens, distinct
    types, type-token ratio, mean tokens/doc, top-token mass.

    Survivors come from the SAME staged cluster table every keep-policy
    consumer joins (operators/dedup.duplicate_clusters — cluster_id is
    the canonical min doc_id); counts are exact integers, ratios are
    single divisions rounded 6 dp. Scale: one token pass per phase
    (combiner groupBys) + the churn-sized anti-join."""
    from openrouter_batch_processor_spark.functions.hashing import (
        normalize_text,
    )
    from openrouter_batch_processor_spark.operators.dedup import (
        duplicate_clusters,
    )

    clusters = duplicate_clusters(docs)
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = docs.join(dropped, "doc_id", "left_anti")

    def stats(d: DataFrame, phase: str) -> DataFrame:
        tk = d.select(
            "doc_id",
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term"),
        ).filter(F.col("term") != "")
        per_term = tk.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        tt = per_term.agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.max("cnt").cast("long").alias("top_cnt"),
        )
        nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        return nd.crossJoin(tt).select(
            F.lit(phase).alias("phase"),
            "n_docs",
            "n_tokens",
            "n_types",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_doc_tokens"),
            F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias("top_token_frac"),
        )

    return stats(docs, "full").unionByName(stats(survivors, "survivors"))


def hill_tail_index(docs: DataFrame, k: int = 15) -> DataFrame:
    """Hill estimator of the token-frequency tail index (Hill 1975):
    alpha-hat = k / sum_{i<=k} ln(f_(i)/f_(k+1)) over the k most
    frequent types — the heavy-tail exponent that complements the
    Zipf least-squares fit (Hill is the MLE on the tail and doesn't
    care about the mid-rank bend). alpha near 1 = classic Zipf.

    Counts are exact integers; the rank window runs over DISTINCT
    types (vocabulary-bounded, never corpus-bounded — the same
    argument as the hourly-series windows); ln is the validated
    per-row path, folded 9-dp DECIMAL over exactly k rows. Output is
    one row: (n_types, k, f_ref, mean_ln_ratio, alpha)."""
    from pyspark.sql.window import Window

    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    tf = (
        docs.select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = tf.select(
        "term", "cnt", F.row_number().over(w).cast("long").alias("rn")
    )
    nt = ranked.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    ref = ranked.filter(F.col("rn") == k + 1).select(F.col("cnt").alias("f_ref"))
    top = ranked.filter(F.col("rn") <= k).crossJoin(F.broadcast(ref))
    agg = top.agg(
        F.sum(
            F.round(F.log(F.col("cnt") / F.col("f_ref")), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("sum_ln"),
        F.min("f_ref").alias("f_ref"),
    )
    return agg.crossJoin(F.broadcast(nt)).select(
        "n_types",
        F.lit(k).cast("long").alias("k"),
        "f_ref",
        F.round(F.col("sum_ln") / k, 6).alias("mean_ln_ratio"),
        F.when(
            F.col("sum_ln") > 0, F.round(F.lit(float(k)) / F.col("sum_ln"), 6)
        ).alias("alpha"),
    )


def source_ks_drift(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per source: for each source
    s, D_s = sup_x |F_s(x) - F_rest(x)| between the source's length
    distribution and the REST of the corpus — the distribution-free
    drift test that catches shape changes (bimodality, truncation) a
    mean/variance drift audit misses. Both CDFs are step functions, so
    the sup is attained at an observed value; evaluating at every
    distinct corpus value is exact.

    Plan: one combiner histogram per (source, value), densified onto
    the (sources x distinct-values) grid — bounded by the value DOMAIN,
    not the corpus (the cents-histogram convention) — cumulative
    windows per source plus one corpus cumulative on the bounded
    histogram, then a max fold. Counts stay exact integers; the CDF
    difference is the only float.

    Conventions (ADVICE r11): a SINGLE-SOURCE corpus has no rest-of-
    corpus to compare against — the n > n_s guard yields ks_d = NULL
    explicitly (the same value the unguarded division produced in both
    engines, now stated rather than incidental). The corpus-cumulative
    window is unpartitioned by construction (one CDF over the value
    domain): it funnels the DISTINCT VALUES — bounded by the domain,
    e.g. a length histogram, never the corpus — through one task, which
    is the cents-histogram trade; a corpus whose value domain is
    unbounded should be bucketed before this audit."""
    from pyspark.sql.window import Window

    vals = docs.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("long").alias("x")
    )
    h = vals.groupBy("grp", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    xs = vals.select("x").distinct()
    grps = vals.select("grp").distinct()
    grid = xs.join(F.broadcast(grps))
    g = grid.join(h, ["grp", "x"], "left").select(
        "grp", "x", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    wg = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = g.select(
        "grp", "x", F.sum("c").over(wg).cast("long").alias("cum_s")
    )
    ch = vals.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cumc = ch.select("x", F.sum("c").over(wc).cast("long").alias("cum_all"))
    ns = vals.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    tot = vals.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dev = (
        cums.join(cumc, "x")
        .join(F.broadcast(ns), "grp")
        .join(F.broadcast(tot))
        .select(
            "grp",
            "n_s",
            F.when(
                F.col("n") > F.col("n_s"),
                F.abs(
                    F.col("cum_s") / F.col("n_s")
                    - (F.col("cum_all") - F.col("cum_s"))
                    / (F.col("n") - F.col("n_s"))
                ),
            ).alias("d"),
        )
    )
    return (
        dev.groupBy(F.col("grp").alias(group_col), "n_s")
        .agg(F.round(F.max("d"), 6).alias("ks_d"))
        .select(group_col, F.col("n_s").alias("n_docs"), "ks_d")
    )
