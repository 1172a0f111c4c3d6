"""Text analysis for training-data pipelines: language id, quality
scoring, token counting, fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python on the hot
path) with arithmetic chosen to be reproducible in ANSI SQL for the
DuckDB oracle: regexp counts, ratio arithmetic rounded at the edge,
md5/conv-based hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openrouter_batch_processor_spark.functions.hashing import (
    doc_fingerprint,
    normalize_text,
    rolling_hash,
)

# Deterministic marker lexicons for the heuristic language scorer. The
# driver's synthetic corpus draws from a closed vocabulary, so accuracy
# is irrelevant; what the operator demonstrates is the shape: per-lang
# evidence scores -> argmax with a stable tiebreak.
LANG_MARKERS = {
    "en": ["the", "and", "of", "fast", "slow", "small", "big"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish tokenizer: letter runs, digit runs, single non-alnum marks.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    toks = F.split(normalize_text(text), " ")
    return F.when(normalize_text(text) == "", F.lit(0)).otherwise(F.size(toks)).cast("long")


def regex_token_count(text: Column) -> Column:
    """Count of TOKEN_RE matches — a fast proxy for BPE token count."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars_exact"),
        whitespace_token_count(t).alias("n_ws_tokens"),
        regex_token_count(t).alias("n_re_tokens"),
    )


def staged_quality_scores(
    docs: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Session-staged quality-scores table (VERDICT r03 item 8): the
    canonical-by-quality policy and the curation pipeline scored the
    same corpus independently; this stages ONE scores table per input
    plan (operators/staging.py) — id, source + text passthrough,
    ratios, n_tokens, quality_score — and every consumer joins it, the
    way a production run materializes scores once. Requires a
    ``source`` column (the curation consumers all carry it)."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    narrowed = docs.select(id_col, "source", text_col)
    return staged_from(
        narrowed,
        f"quality_scores:{id_col}:{text_col}",
        lambda d: quality_scores(d, id_col, text_col, extra_cols=("source", text_col)),
    )


def quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Length / punctuation / stopword / repetition heuristics.

    score = clamp(0,1) of a linear combination; every ratio rounded to
    6 dp so the oracle hash-matches. ``extra_cols`` pass through
    untouched (e.g. source/text for streaming gates, where a join back
    onto the input would be a stream-stream join)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    toks = F.split(normalize_text(t), " ")
    n_toks = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    punct_raw = n_punct / F.greatest(n_chars, F.lit(1.0))
    stop_raw = n_stop / F.greatest(n_toks, F.lit(1.0))
    uniq_raw = n_uniq / F.greatest(n_toks, F.lit(1.0))
    punct_ratio = F.round(punct_raw, 6)
    stop_ratio = F.round(stop_raw, 6)
    uniq_ratio = F.round(uniq_raw, 6)
    mean_tok_len = F.round(n_chars / F.greatest(n_toks, F.lit(1.0)), 6)
    # score from the RAW ratios: pre-rounded inputs make the final value
    # land exactly on .xxxxx5 ties where engines' round() rules diverge
    score = (
        F.lit(0.3) * stop_raw
        + F.lit(0.4) * uniq_raw
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_raw * 4, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_chars.cast("long").alias("n_chars_exact"),
        n_toks.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        mean_tok_len.alias("mean_token_len"),
        F.round(F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0)), 6).alias("quality_score"),
    )


def _lang_score(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*markers))).cast("long")


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic lang-id: marker-hit counts per language, argmax with
    lexicographic tiebreak (stable and oracle-reproducible).
    ``extra_cols`` pass through untouched (the streaming scorer keeps
    source/true-lang without a join back onto the stream)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    scores = {lang: _lang_score(toks, m) for lang, m in sorted(LANG_MARKERS.items())}
    # argmax via greatest over (score, inverted-lang) structs is messy in
    # portable SQL; a CASE ladder over sorted langs (first max wins ==
    # lexicographically smallest among ties) is identical on both engines.
    best = None
    for lang in sorted(LANG_MARKERS):
        cond = F.lit(True)
        for other in sorted(LANG_MARKERS):
            if other < lang:
                cond = cond & (scores[lang] > scores[other])
            elif other > lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    out_cols = [F.col(id_col)]
    out_cols += [F.col(c) for c in extra_cols]
    out_cols += [scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)]
    out_cols.append(best.otherwise(F.lit("und")).alias("pred_lang"))
    return docs.select(*out_cols)


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) long table over whitespace tokens of normalized
    text — the shared base for TF-IDF and heavy-hitter analysis.

    One explode + one combiner-friendly groupBy; the shuffle carries
    (id, term) pairs pre-aggregated map-side, never raw token streams."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document: tfidf = tf * ln(n_docs / df),
    rounded at the edge, ranked per doc with a lexicographic tiebreak.

    Plan shape: tf table (1 shuffle) -> df per term (2nd shuffle, tiny:
    one row per distinct term) joined back on term -> corpus size as a
    broadcast scalar (single-row cross join, NOT a collect) -> per-doc
    row_number window. The window partitions by doc id, so it
    parallelizes across the cluster; no global sort anywhere."""
    from pyspark.sql.window import Window

    tf = term_frequencies(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rnk")
    )


def heavy_hitters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 50
) -> DataFrame:
    """Global top-n most frequent terms with corpus counts.

    Exact, via two chained partial-aggregating groupBys: (id, term)
    combine first (bounds any single reducer by per-doc vocabulary),
    then per-term totals. The final top-n is TakeOrderedAndProject —
    per-partition heaps + a driver merge of n rows, never a global sort.
    At 100 TB this is the textbook skew-safe heavy-hitter shape: the
    hottest term arrives at its reducer already combined per partition.
    Deterministic tiebreak on term for oracle parity."""
    tf = term_frequencies(docs, id_col, text_col)
    totals = tf.groupBy("term").agg(
        F.sum("tf").alias("total_count"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    return totals.orderBy(F.desc("total_count"), F.asc("term")).limit(n)


def repetition_signals(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-trigram fraction and most-frequent-bigram mass. (The
    paper's duplicate-LINE fraction is meaningless on this corpus —
    the synthetic docs are single-line — so the n-gram variants carry
    the signal.)

    Two execution shapes on purpose:
    - dup_trigram_frac is a pure per-row Column program (shingles +
      array_distinct inside whole-stage codegen, zero shuffle);
    - top_bigram_frac NEEDS per-(doc, bigram) counting, so it explodes
      and aggregates — the shuffle carries (doc_id, bigram) pairs
      pre-combined map-side, then a second combine down to one row per
      doc. Keys are (doc, bigram), so even a pathological hot document
      spreads across partitions until the final per-doc combine.
    Docs too short for bigrams surface with top_bigram_frac = 0."""
    from openrouter_batch_processor_spark.operators.dedup import shingles_col, tokenized

    t = tokenized(docs, id_col, text_col)
    tri = t.select(F.col(id_col), shingles_col(F.col("toks"), 3).alias("tri"))
    per_doc = tri.select(
        F.col(id_col),
        F.size("tri").cast("long").alias("n_trigrams"),
        F.when(F.size("tri") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.lit(1.0) - F.size(F.array_distinct("tri")) / F.size("tri"), 6)
        )
        .alias("dup_trigram_frac"),
    )
    bg = t.select(
        F.col(id_col), F.explode_outer(shingles_col(F.col("toks"), 2)).alias("bg")
    ).filter(F.col("bg").isNotNull())
    bc = bg.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    top = bc.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    joined = per_doc.join(top, id_col, "left")
    top_frac = F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    return joined.select(
        F.col(id_col),
        F.col("n_trigrams"),
        F.col("dup_trigram_frac"),
        top_frac.alias("top_bigram_frac"),
        ((F.col("dup_trigram_frac") > 0.2) | (top_frac > 0.18)).alias("repetitive"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Both fingerprints: order-insensitive md5 + order-sensitive rolling
    polynomial hash (detects shuffled-word plagiarism the md5 misses)."""
    return docs.select(
        F.col(id_col),
        doc_fingerprint(F.col(text_col)).alias("fp_md5"),
        rolling_hash(F.col(text_col)).alias("fp_rolling"),
    )


def vocab_coverage(
    docs: DataFrame, k: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer-design primitive: coverage of a top-k frequency vocab
    — per doc, what fraction of its tokens would be in-vocab (the
    complement is the OOV rate a k-entry tokenizer would suffer).

    Two passes over the shared term-frequency base: (1) corpus totals
    -> top-k vocab (deterministic count-desc/term-asc tiebreak), tiny
    by construction, BROADCAST; (2) per-doc token streams probe the
    broadcast set map-side — a doc's coverage never shuffles its
    tokens, only its (doc_id, count) pair."""
    tf = term_frequencies(docs, id_col, text_col)
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("total"))
        .orderBy(F.desc("total"), F.asc("term"))
        .limit(k)
        .select("term")
    )
    per_doc = tf.groupBy(id_col).agg(F.sum("tf").alias("n_tokens"))
    in_vocab = (
        tf.join(F.broadcast(vocab), "term", "leftsemi")
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_in_vocab"))
    )
    joined = per_doc.join(in_vocab, id_col, "left")
    niv = F.coalesce(F.col("n_in_vocab"), F.lit(0))
    return joined.select(
        F.col(id_col),
        F.col("n_tokens"),
        niv.alias("n_in_vocab"),
        F.round(niv / F.col("n_tokens"), 6).alias("coverage"),
    )


def unigram_nll(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-unigram language-model score per document: average
    negative log-likelihood avg_nll = sum_t tf_d(t) * ln(T / ctf(t)) /
    |d| where ctf is the corpus term frequency and T the corpus token
    count — the classic cheap perplexity proxy for quality filtering
    (high avg_nll = the doc is full of corpus-rare tokens).

    Plan shape: one (doc, term) tf pass; corpus totals are a tiny
    per-term aggregate BROADCAST back onto tf (term vocabulary <<
    corpus); the corpus-size scalar is a 1-row broadcast cross join.
    Per-term contributions are rounded then summed as DECIMAL so the
    per-doc reduction is order-independent (bit-stable at any
    partition count); the division is rounded at the edge."""
    tf = term_frequencies(docs, id_col, text_col)
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = ctf.agg(F.sum("ctf").cast("double").alias("total_tokens"))
    contrib = F.round(
        F.col("tf") * F.log(F.col("total_tokens") / F.col("ctf")), 6
    ).cast("decimal(18,6)")
    return (
        tf.join(F.broadcast(ctf), "term")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(contrib).alias("nll_sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(F.col("nll_sum").cast("double") / F.col("n_tokens"), 6).alias("avg_nll"),
        )
    )


# BM25 defaults per Robertson/Sparck-Jones literature values.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: top-k docs for a bag-of-terms query.

    score(d) = sum_{t in q} ln(1 + (N - df + 0.5)/(df + 0.5)) *
               tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale shape: doc length is a per-row expression (NO shuffle — it
    never touches the tf table); the tf table is filtered to the query
    terms BEFORE its groupBy, so the only (doc,term) aggregation that
    runs is over rows matching the handful of query terms; df counts
    and the (N, avgdl) scalars broadcast. The final top-k is
    TakeOrdered, not a global sort. Contributions round->DECIMAL-sum
    for order independence."""
    t = F.col(text_col)
    dl_col = whitespace_token_count(t)
    with_dl = docs.select(F.col(id_col), dl_col.alias("dl"))
    scalars = with_dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = term_frequencies(docs, id_col, text_col).filter(F.col("term").isin(*query_terms))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tf_part, 6).cast("decimal(18,6)")
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(with_dl, id_col)
        .join(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.sum(contrib).alias("score_sum"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .select(
            F.col(id_col),
            F.col("score_sum").cast("double").alias("bm25"),
            F.col("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


# Conservative RE2-and-Java-compatible patterns (no lookaround, no
# backreferences) so the same regex runs on both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_redaction(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub for training corpora: count and redact email addresses
    and phone numbers. Pure per-row Column program — regexp_extract_all
    for counts, chained regexp_replace for the scrub, md5 of the
    redacted text as the verifiable output fingerprint. Zero shuffle;
    at 100 TB this is a map-only pass that rides whatever partitioning
    the scan produced. Phone redaction runs on the email-redacted text
    so overlapping matches resolve deterministically (email wins)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


# DSIR hashed-feature space: buckets for the unigram importance model.
DSIR_BUCKETS = 512


def dsir_logweights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169
    "Data Selection for Language Models via Importance Resampling"):
    score every document by the log-likelihood ratio of its hashed
    unigram features under a target-distribution model vs the raw-corpus
    model, log w(x) = sum_t tf_x(t) * [ln p_target(b(t)) - ln p_raw(b(t))]
    with add-one smoothing over B hash buckets. High log_weight = the
    doc looks like the target domain; the resampling step then keeps
    the top mass (see sample_weighted_priority for the weighted-sample
    machinery). The target here is the in-corpus slice lang ==
    target_lang so the oracle can restate it; production would fit the
    target counts on a separate target-domain corpus.

    Training-pipeline extension (no reference analogue). Scale shape:
    ONE explode pass over the corpus feeds three aggregations — the
    per-(doc,bucket) tf table (shuffles on (doc,bucket), map-side
    combined) and the two B-row bucket-count tables, which BROADCAST
    back onto the tf table (B=512 rows regardless of corpus size; the
    totals are 1-row broadcasts folded into the same lookup table).
    Per-bucket log-ratios are rounded then decimal-summed so the
    per-doc reduction is partition-count invariant."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    toks = (
        docs.select(
            F.col(id_col),
            F.col(lang_col).alias("_lang"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(F.col(id_col), "_lang", bucket.alias("bucket"))
    )
    cb = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cb"))
    tb = (
        toks.filter(F.col("_lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = cb.agg(F.sum("cb").cast("double").alias("tc")).crossJoin(
        tb.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("tt"))
    )
    lr = (
        cb.join(tb, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("tt") + n_buckets))
                - F.log((F.col("cb") + 1) / (F.col("tc") + n_buckets)),
                6,
            ).alias("lr"),
        )
    )
    dfb = toks.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("tf"))
    contrib = F.round(F.col("tf") * F.col("lr"), 6).cast("decimal(18,6)")
    per_doc = (
        dfb.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(contrib).alias("_lw"),
        )
    )
    return per_doc.join(docs.select(F.col(id_col), F.col(lang_col)), id_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_tokens"),
        F.round(F.col("_lw").cast("double"), 6).alias("log_weight"),
    )


# Add-k smoothing constant for the bigram LM (CCNet uses a KenLM 5-gram;
# the add-k bigram is the SQL-expressible stand-in with the same shape).
BIGRAM_K = 0.5


def bigram_nll(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet-style
    quality filter (Wenzek et al. 2020: score web text with an LM
    trained on a clean corpus; docs scoring far above the median are
    dropped). The LM is an add-k bigram model fit on the corpus itself:
    p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k*V) with c(w1) the corpus
    unigram count and V the unigram vocabulary size; per-doc avg_nll is
    the mean negative log-prob over the doc's bigrams and ppl =
    exp(avg_nll). Docs with < 2 tokens have no bigrams and are
    excluded (same contract as the shingle operators).

    Scale shape: the bigram explode shuffles map-side-combined
    (doc, bigram) counts; the corpus bigram/unigram count tables join
    back by equi-key (vocab << corpus, AQE broadcasts them at small
    scale and hash-joins at 100 TB — either way no skewed all-pairs
    stage); V is a 1-row broadcast. Per-bigram contributions are
    rounded then decimal-summed (partition-count invariant); divisions
    round at the edge."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size("toks")
    base = docs.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") >= 2)
    bigrams = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    bf = (
        base.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("bf"))
    )
    c12 = bf.groupBy("bigram").agg(F.sum("bf").cast("long").alias("c12"))
    ctf = (
        term_frequencies(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("c1"))
    )
    v = ctf.agg(F.count(F.lit(1)).cast("double").alias("vsz"))
    nb = F.round(
        -F.log(
            (F.col("c12") + F.lit(BIGRAM_K)) / (F.col("c1") + F.lit(BIGRAM_K) * F.col("vsz"))
        ),
        6,
    )
    contrib = F.round(F.col("bf") * F.col("nb"), 6).cast("decimal(18,6)")
    scored = (
        bf.join(c12, "bigram")
        .withColumn("w1", F.substring_index(F.col("bigram"), " ", 1))
        .join(ctf.withColumnRenamed("term", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .select(F.col(id_col), "bf", nb.alias("nb"))
    )
    # The mean is computed in EXACT integer micro-nats with floor
    # division: round(sum/n, 6) sits on a .5 boundary whenever n
    # divides the 6-dp sum into exactly 7 digits (n=10 does it
    # constantly), and half-up-vs-double-repr rounding then diverges
    # across engines (caught by the sf0.1 sweep). Integer floor has no
    # boundary: sm7 = (sum_micros * 10) div n is the same BIGINT on
    # both engines, and its /1e7 double image is bit-identical.
    sm = (F.sum(contrib) * F.lit(1000000)).cast("long")
    avg = F.col("_sm7").cast("double") / F.lit(10000000.0)
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("bf").cast("long").alias("n_bigrams"),
            sm.alias("_sm"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.expr("(_sm * 10) div n_bigrams").alias("_sm7"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            avg.alias("avg_nll"),
            F.round(F.exp(avg), 6).alias("ppl"),
        )
    )


def quality_auc(
    docs: DataFrame,
    positive_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """AUC of the heuristic quality score as a classifier for the
    ``positive_lang`` slice — the standard audit of a model-based
    quality filter (FineWeb-Edu-style classifier gating lives or dies
    on this number) computed exactly via the Mann-Whitney rank-sum
    identity: AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg), ties
    taking average ranks.

    Arithmetic is integer-exact until one final division: per distinct
    score s with c rows (p positive) occupying ranks cum+1..cum+c, the
    doubled positive rank-sum contribution is p·(2·cum + c + 1); the
    division lands as (numer·10^7) floor-div denom so both engines
    emit the identical 7-dp double (the bigram_nll mean pattern). The
    scaled numerator is quadratic in corpus size, so it is computed in
    DECIMAL(38,0) (HUGEINT on the DuckDB oracle side) — BIGINT would
    overflow near 1.4M balanced docs and ANSI Spark throws rather than
    wraps. A degenerate slice with zero positives or zero negatives
    yields auc = NULL (nullif-guarded denominator), not an error.

    Scale: one combiner groupBy on the score, then ONE unpartitioned
    cumulative window — bounded by the score's 6-dp resolution (≤ 1e6+1
    distinct values regardless of corpus size), so the single-task sort
    is dimension-sized, never corpus-sized."""
    from pyspark.sql.window import Window

    scores = quality_scores(docs, id_col, text_col)
    labeled = (
        scores.select(id_col, "quality_score")
        .join(docs.select(id_col, lang_col), id_col)
        .select(
            F.col("quality_score").alias("s"),
            (F.col(lang_col) == positive_lang).cast("long").alias("y"),
        )
    )
    g = labeled.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    cum_w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w = g.select(
        "s",
        "c",
        "p",
        F.coalesce(F.sum("c").over(cum_w), F.lit(0)).cast("long").alias("cum"),
    )
    a = w.agg(
        F.sum(F.col("p") * (F.lit(2) * F.col("cum") + F.col("c") + F.lit(1)))
        .cast("long")
        .alias("s2"),
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("c").cast("long").alias("n"),
    )
    return a.select(
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        (
            F.expr(
                "((cast(s2 as decimal(38,0)) - cast(n_pos as decimal(38,0))"
                " * (n_pos + 1)) * 10000000)"
                " div nullif(cast(2 as decimal(38,0)) * n_pos * (n - n_pos), 0)"
            ).cast("double")
            / F.lit(10000000.0)
        ).alias("auc"),
    )


def pmi_topk(
    docs: DataFrame,
    k: int = 100,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990) over adjacent token pairs: PMI = ln(p(w1,w2) /
    (p(w1)·p(w2))) with corpus-count estimates, c12 >= min_count to
    suppress the rare-pair PMI explosion, ranked desc with a
    deterministic (pmi, w1, w2) tiebreak.

    Scale: two map-side-combined counting groupBys (bigrams, unigrams),
    two vocabulary-sized equi-joins, a 1-row totals broadcast, and a
    global top-k — which Spark executes as per-partition TakeOrdered +
    driver merge of k rows, never a full sort of the pair table."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(toks.alias("toks"))
    n = F.size("toks")
    bi = F.arrays_zip(
        F.slice("toks", 1, n - 1).alias("a"),
        F.slice(F.col("toks"), 2, n - 1).alias("b"),
    )
    c12 = (
        base.filter(n >= 2)
        .select(F.explode(bi).alias("t"))
        .filter((F.col("t.a") != "") & (F.col("t.b") != ""))
        .groupBy(F.col("t.a").alias("w1"), F.col("t.b").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    c1 = (
        base.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = base.agg(
        F.sum(F.greatest(n - 1, F.lit(0))).cast("double").alias("nb"),
        F.sum(
            F.size(F.filter(F.col("toks"), lambda x: x != ""))
        ).cast("double").alias("nu"),
    )
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") * F.col("nu") * F.col("nu"))
            / (F.col("nb") * F.col("cw1") * F.col("cw2"))
        ),
        6,
    )
    return (
        c12.join(c1.select(F.col("w").alias("w1"), F.col("c").alias("cw1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("cw2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )


def zipf_fit(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the
    corpus vocabulary (freq-desc rank, term-asc tiebreak, terms with
    freq >= min_count). Natural text sits near slope −1; a corpus whose
    slope drifts (template spam flattens it, aggressive dedup steepens
    it) changed composition — the classic corpus-health audit
    (Zipf 1949; used as a generation-quality diagnostic in modern LM
    eval).

    Cross-engine exactness: ln values are rounded to 6 dp and summed /
    multiplied as DECIMAL (order-independent, exact), with the
    linear_trend closed form evaluated on the exact moment sums.

    Scale: one counting groupBy, then ONE unpartitioned row_number
    window — vocabulary-sized (dimension table), never corpus-sized —
    and a 1-row moments fold."""
    from pyspark.sql.window import Window

    ctf = (
        docs.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    ranked = ctf.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term")))
    )
    x6 = F.round(F.log(F.col("r").cast("double")), 6).cast("decimal(18,6)")
    y6 = F.round(F.log(F.col("c").cast("double")), 6).cast("decimal(18,6)")
    a = ranked.select(x6.alias("x"), y6.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return a.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nd, 6
        ).alias("intercept"),
    )


SBO_ALPHA = 0.4  # Brants et al.'s fixed backoff multiplier


def stupid_backoff_scores(
    docs: DataFrame,
    train_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007, 'Large
    Language Models in Machine Translation') — THE distributed-LM
    method: no discounting, no normalization, just raw corpus counts
    with a fixed backoff multiplier, which is exactly what makes it
    MapReduce/Spark-shaped where Kneser-Ney is not.

        S(w3 | w1 w2) = c3(w1 w2 w3) / c2(w1 w2)        if c3 > 0
                      = α · c2(w2 w3) / c1(w2)           elif c2(w2 w3) > 0
                      = α² · (c1(w3) + 1) / (N + V)      otherwise

    with α = 0.4 (the paper's constant). Counts are fit on the
    ``train_lang`` slice and every doc is scored against them, so
    off-slice docs genuinely exercise the backoff cascade (a corpus-fit
    model would never back off: every trigram would be its own
    evidence). The unigram floor is add-one smoothed so OOV tokens
    score finitely (the paper scores within a closed vocab; the +1/V
    floor is the standard open-vocab adaptation).

    Output per doc (≥3 tokens): n_trigrams, the tri/bi/uni backoff-hit
    counts, and avg_nls = mean −ln S (exact integer-micros floor
    division — the cross-engine mean pattern from bigram_nll).

    Scale: per-doc trigram counting is one map-side-combined groupBy;
    the three LM tables are vocabulary-sized (≪ corpus) equi-joins that
    AQE broadcasts when small and hash-joins at 100 TB; N and V are a
    1-row broadcast. Nothing is all-pairs, nothing is driver-side."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col), F.col(lang_col), toks.alias("toks")
    ).filter(F.size("toks") >= 3)
    n = F.size("toks")
    tri = F.arrays_zip(
        F.slice("toks", 1, n - 2).alias("w1"),
        F.slice(F.col("toks"), 2, n - 2).alias("w2"),
        F.slice(F.col("toks"), 3, n - 2).alias("w3"),
    )
    pos = base.select(
        F.col(id_col), F.explode(tri).alias("t")
    ).select(id_col, "t.w1", "t.w2", "t.w3")
    # per-doc distinct-trigram counts: the LM joins run per (doc, tri),
    # not per position
    tf3 = pos.groupBy(id_col, "w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("tf")
    )

    train = docs.filter(F.col(lang_col) == train_lang)
    ttoks = F.split(normalize_text(F.col(text_col)), " ")
    tbase = train.select(ttoks.alias("toks"))
    tn = F.size("toks")
    c1 = (
        tbase.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    bi = F.arrays_zip(
        F.slice("toks", 1, tn - 1).alias("a"),
        F.slice(F.col("toks"), 2, tn - 1).alias("b"),
    )
    c2 = (
        tbase.filter(tn >= 2)
        .select(F.explode(bi).alias("t"))
        .groupBy(F.col("t.a").alias("a"), F.col("t.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    tri_t = F.arrays_zip(
        F.slice("toks", 1, tn - 2).alias("a"),
        F.slice(F.col("toks"), 2, tn - 2).alias("b"),
        F.slice(F.col("toks"), 3, tn - 2).alias("c"),
    )
    c3 = (
        tbase.filter(tn >= 3)
        .select(F.explode(tri_t).alias("t"))
        .groupBy(
            F.col("t.a").alias("a"), F.col("t.b").alias("b"), F.col("t.c").alias("c")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
    )
    nv = c1.agg(
        F.sum("c1").cast("double").alias("bign"),
        F.count(F.lit(1)).cast("double").alias("vsz"),
    )

    j = (
        tf3.join(
            c3,
            (F.col("w1") == c3["a"]) & (F.col("w2") == c3["b"]) & (F.col("w3") == c3["c"]),
            "left",
        )
        .drop("a", "b", "c")
        .join(
            c2.select(F.col("a"), F.col("b"), F.col("c2").alias("c2_ctx")),
            (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b")),
            "left",
        )
        .drop("a", "b")
        .join(
            c2.select(F.col("a"), F.col("b"), F.col("c2").alias("c2_bi")),
            (F.col("w2") == F.col("a")) & (F.col("w3") == F.col("b")),
            "left",
        )
        .drop("a", "b")
        .join(c1.select(F.col("w").alias("w2k"), F.col("c1").alias("c1_w2")),
              F.col("w2") == F.col("w2k"), "left")
        .drop("w2k")
        .join(c1.select(F.col("w").alias("w3k"), F.col("c1").alias("c1_w3")),
              F.col("w3") == F.col("w3k"), "left")
        .drop("w3k")
        .crossJoin(F.broadcast(nv))
    )
    is_tri = F.col("c3").isNotNull()
    is_bi = ~is_tri & F.col("c2_bi").isNotNull()
    s = (
        F.when(is_tri, F.col("c3") / F.col("c2_ctx"))
        .when(is_bi, F.lit(SBO_ALPHA) * F.col("c2_bi") / F.col("c1_w2"))
        .otherwise(
            # literal 0.16, NOT SBO_ALPHA**2: 0.4*0.4 rounds to a
            # different double than the decimal literal both engines parse
            F.lit(0.16)
            * (F.coalesce(F.col("c1_w3"), F.lit(0)) + F.lit(1))
            / (F.col("bign") + F.col("vsz"))
        )
    )
    contrib = F.round(F.col("tf") * F.round(-F.log(s), 6), 6).cast("decimal(18,6)")
    scored = j.select(
        F.col(id_col),
        F.col("tf"),
        F.when(is_tri, F.col("tf")).otherwise(F.lit(0)).alias("tri_hit"),
        F.when(is_bi, F.col("tf")).otherwise(F.lit(0)).alias("bi_hit"),
        contrib.alias("contrib"),
    )
    avg = F.col("_sm7").cast("double") / F.lit(10000000.0)
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum("tri_hit").cast("long").alias("n_tri_hits"),
            F.sum("bi_hit").cast("long").alias("n_bi_hits"),
            (F.sum("contrib") * F.lit(1000000)).cast("long").alias("_sm"),
        )
        .select(
            F.col(id_col),
            "n_trigrams",
            "n_tri_hits",
            "n_bi_hits",
            (F.col("n_trigrams") - F.col("n_tri_hits") - F.col("n_bi_hits"))
            .cast("long")
            .alias("n_uni_backoffs"),
            F.expr("(_sm * 10) div n_trigrams").alias("_sm7"),
        )
        .select(
            F.col(id_col),
            "n_trigrams",
            "n_tri_hits",
            "n_bi_hits",
            "n_uni_backoffs",
            avg.alias("avg_nls"),
        )
    )


KN_DISCOUNT = 0.75  # Chen & Goodman's fixed absolute discount


def kneser_ney_scores(
    docs: DataFrame,
    train_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen
    & Goodman 1998) — the classical smoothing benchmark the distributed
    Stupid Backoff paper positions itself against. Absolute discount
    D = 0.75 with the continuation-probability lower order:

        P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
                   + D · N1+(w1,·)/c(w1·) · Pc(w2)     if c(w1·) > 0
                 = Pc(w2)                               otherwise
        Pc(w2)   = (N1+(·,w2) + 1) / (B + V + 1)

    where c(w1·) is the context total (Σ_w2 c(w1 w2)), N1+(w1,·) the
    distinct-continuation count, N1+(·,w2) the distinct-history count,
    B the number of distinct bigram types and V the vocabulary size.
    The +1/(B+V+1) floor is the open-vocab adaptation (every seen type
    plus one OOV class gets add-one mass, so Pc still sums to 1) —
    same move as stupid_backoff_scores' unigram floor. Counts are fit
    on the ``train_lang`` slice and every doc is scored, so off-slice
    docs exercise both the discount interpolation and the
    unseen-context fallback.

    Output per doc (≥2 tokens): n_bigrams, n_kn_hits (bigram seen:
    discounted ML mass applies), n_ctx_hits (context seen, bigram not:
    pure interpolation weight), n_cont_backoffs (unseen context), and
    avg_nll (exact integer-micros floor division — the bigram_nll
    cross-engine mean pattern).

    Scale: identical shape to stupid_backoff_scores — one map-side-
    combined per-doc bigram groupBy, three vocabulary-sized LM tables
    (bigram counts; per-context totals + distinct continuations; per-
    word distinct histories) joined by equi-key (AQE broadcasts them
    small, hash-joins at 100 TB), and a 1-row (B, V) broadcast. This
    is exactly the sparse-count formulation that makes KN harder than
    Stupid Backoff in MapReduce folklore — expressed relationally it
    is three aggregations, no all-pairs stage, nothing driver-side."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    n = F.size("toks")
    bi = F.arrays_zip(
        F.slice("toks", 1, n - 1).alias("w1"),
        F.slice(F.col("toks"), 2, n - 1).alias("w2"),
    )
    tf2 = (
        base.select(F.col(id_col), F.explode(bi).alias("t"))
        .select(id_col, "t.w1", "t.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    ttoks = F.split(normalize_text(F.col(text_col)), " ")
    tbase = docs.filter(F.col(lang_col) == train_lang).select(
        ttoks.alias("toks")
    )
    tn = F.size("toks")
    tbi = F.arrays_zip(
        F.slice("toks", 1, tn - 1).alias("a"),
        F.slice(F.col("toks"), 2, tn - 1).alias("b"),
    )
    c12 = (
        tbase.filter(tn >= 2)
        .select(F.explode(tbi).alias("t"))
        .groupBy(F.col("t.a").alias("a"), F.col("t.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    ctx = c12.groupBy("a").agg(
        F.sum("c12").cast("long").alias("ctx_total"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    hist = c12.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n1_bwd"))
    vtoks = (
        tbase.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .agg(F.count_distinct("w").cast("double").alias("vsz"))
    )
    bv = c12.agg(F.count(F.lit(1)).cast("double").alias("btypes")).crossJoin(
        vtoks
    )

    j = (
        tf2.join(c12, (F.col("w1") == c12["a"]) & (F.col("w2") == c12["b"]), "left")
        .drop("a", "b")
        .join(ctx.select(F.col("a"), "ctx_total", "n1_fwd"),
              F.col("w1") == F.col("a"), "left")
        .drop("a")
        .join(hist.select(F.col("b"), "n1_bwd"), F.col("w2") == F.col("b"), "left")
        .drop("b")
        .crossJoin(F.broadcast(bv))
    )
    pc = (F.coalesce(F.col("n1_bwd"), F.lit(0)) + F.lit(1)) / (
        F.col("btypes") + F.col("vsz") + F.lit(1)
    )
    has_ctx = F.col("ctx_total").isNotNull()
    is_hit = F.col("c12").isNotNull()
    d = F.lit(KN_DISCOUNT)
    p = F.when(
        has_ctx,
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - d, F.lit(0.0))
        / F.col("ctx_total")
        + d * F.col("n1_fwd") / F.col("ctx_total") * pc,
    ).otherwise(pc)
    contrib = F.round(F.col("tf") * F.round(-F.log(p), 6), 6).cast("decimal(18,6)")
    scored = j.select(
        F.col(id_col),
        F.col("tf"),
        F.when(is_hit, F.col("tf")).otherwise(F.lit(0)).alias("kn_hit"),
        F.when(has_ctx & ~is_hit, F.col("tf")).otherwise(F.lit(0)).alias("ctx_hit"),
        contrib.alias("contrib"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum("kn_hit").cast("long").alias("n_kn_hits"),
            F.sum("ctx_hit").cast("long").alias("n_ctx_hits"),
            (F.sum("contrib") * F.lit(1000000)).cast("long").alias("_sm"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "n_kn_hits",
            "n_ctx_hits",
            (F.col("n_bigrams") - F.col("n_kn_hits") - F.col("n_ctx_hits"))
            .cast("long")
            .alias("n_cont_backoffs"),
            F.expr("(_sm * 10) div n_bigrams").alias("_sm7"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "n_kn_hits",
            "n_ctx_hits",
            "n_cont_backoffs",
            (F.col("_sm7").cast("double") / F.lit(10000000.0)).alias("avg_nll"),
        )
    )


def dsir_select(
    docs: DataFrame,
    k: int = 100,
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """The DSIR resampling back half: draw a weighted sample of k docs
    ∝ exp(log_weight) via the Gumbel-top-k trick (Kool et al. 2019) —
    key = log_w + g with g = -ln(-ln(u)) and u a deterministic
    md5-derived uniform in (0,1) — then report the per-source yield:
    (source, n_docs, n_selected, sel_rate, sum_logw_selected). Working
    in LOG domain sidesteps exp() entirely (weights span hundreds of
    nats; exp would overflow AND its libm last-ulp behavior is the one
    arithmetic this repo's oracle contract bans from hashed join keys).
    Docs with zero tokens have no weight and are excluded (same
    contract as dsir_logweights).

    Scale: scoring is map-only on top of the dsir_logweights plan; the
    sample is one TakeOrdered k-row heap merge (no shuffle before the
    driver's k-row merge); the yield report joins the k-row selection
    BROADCAST back onto the doc->source map and reduces
    combiner-friendly. sel_rate uses the exact integer-micros floor
    (see bigram_nll) — no rounding boundary exists to diverge."""
    lw = dsir_logweights(docs, target_lang, n_buckets, id_col, text_col, lang_col)
    hv = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = (hv + F.lit(0.5)) / F.lit(4503599627370496.0)
    gkey = F.round(F.col("log_weight") + -F.log(-F.log(u)), 6)
    sel = (
        lw.select(F.col(id_col), gkey.alias("gkey"))
        .orderBy(F.desc("gkey"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.lit(True).alias("is_sel"))
    )
    cand = (
        lw.select(F.col(id_col), "log_weight")
        .join(docs.select(F.col(id_col), F.col(source_col)), id_col)
        .join(F.broadcast(sel), id_col, "left")
    )
    flag = F.coalesce(F.col("is_sel"), F.lit(False))
    return cand.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(flag, 1)).cast("long").alias("n_selected"),
        F.coalesce(
            F.sum(F.when(flag, F.col("log_weight").cast("decimal(18,6)"))),
            F.lit(0).cast("decimal(18,6)"),
        )
        .cast("double")
        .alias("sum_logw_selected"),
    ).select(
        F.col(source_col),
        "n_docs",
        "n_selected",
        (
            F.expr("(n_selected * 10000000) div n_docs").cast("double")
            / F.lit(10000000.0)
        ).alias("sel_rate"),
        "sum_logw_selected",
    )


# Gopher's stopword-presence rule uses this fixed published set (Rae et
# al. 2021, Table A1), distinct from the repo's scoring STOPWORDS.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] | list[str] = tuple(GOPHER_STOPWORDS),
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446
    appendix A1.1), the rule set FineWeb/Dolma re-use, adapted to this
    corpus's shape (single-line, lowercase, no punctuation — the
    bullet/ellipsis line rules are vacuous here and omitted):

    - word count within [15, 90] (the corpus spans 10..99);
    - mean word length within [3, 10] characters;
    - >= 80% of words contain at least one alphabetic character;
    - at least 2 distinct stopwords from Gopher's fixed 8-word set;
    - repetition: character mass of the most repeated 2-gram <= 20% of
      the text (ties on count are resolved by taking the MAX char mass
      over all bigrams — deterministic without an argmax tie-break, and
      an upper bound of Gopher's "fraction of characters in the most
      frequent 2-gram").

    Every rule is evaluated in INTEGER arithmetic (e.g. mean word
    length in [3,10] <=> 3*n <= n_chars-(n-1) <= 10*n on the
    single-space-normalized text), so the oracle comparison has no
    float edge at all. The only shuffle is the per-doc bigram count
    (map-side combined, same shape as text_repetition); every rule but
    repetition is map-only."""
    norm = normalize_text(F.col(text_col))
    toks = F.split(norm, " ")
    # spread the row-local rule evaluation + the bigram explode's map
    # side: the small scan arrives as one partition (see char_entropy)
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(parallelism)
    base = docs.select(
        F.col(id_col),
        F.length(norm).cast("long").alias("n_norm_chars"),
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(
            F.array_distinct(F.filter(toks, lambda x: x.isin(*stopwords)))
        )
        .cast("long")
        .alias("n_gopher_stops"),
        toks.alias("_toks"),
    )
    n = F.col("n_words")
    sum_word_chars = F.col("n_norm_chars") - (n - 1)  # single-space normalized
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_toks", 1, F.size("_toks") - 1),
                F.slice(F.col("_toks"), 2, F.size("_toks") - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bg"),
    )
    top_mass = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max(F.col("c") * F.length("bg")).cast("long").alias("top_bigram_mass"))
    )
    flags = base.join(top_mass, id_col, "left").select(
        F.col(id_col),
        F.col("n_words"),
        ((n >= 15) & (n <= 90)).alias("rule_word_count"),
        ((sum_word_chars >= 3 * n) & (sum_word_chars <= 10 * n)).alias(
            "rule_mean_word_len"
        ),
        (F.col("n_alpha_words") * 5 >= n * 4).alias("rule_alpha_words"),
        (F.col("n_gopher_stops") >= min_stopwords).alias("rule_stopwords"),
        (
            F.coalesce(F.col("top_bigram_mass"), F.lit(0)) * 5
            <= F.col("n_norm_chars")
        ).alias("rule_repetition"),
    )
    return flags.select(
        "*",
        (
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_alpha_words")
            & F.col("rule_stopwords")
            & F.col("rule_repetition")
        ).alias("gopher_pass"),
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic low-entropy gibberish / high-entropy noise quality signal
    (used by FineWeb-style filter stacks alongside the Gopher rules).

    Entirely map-side: H = log2(n) - (1/n) * sum_c cnt_c*log2(cnt_c)
    is computed per row by folding over the SORTED distinct characters
    of the text (array fold, whole-stage codegen, no explode shuffle —
    an exploded (doc,char) groupBy would shuffle n_chars rows at
    100 TB for a per-doc-computable quantity). Per-character
    contributions are rounded to 6 dp and decimal-summed in sorted
    order so both engines fold the identical sequence.

    Expression shape (the unit_vectors lesson): lambda bodies are
    re-evaluated per reference and Catalyst has no let-binding, so the
    char array and the per-distinct-char COUNTS are staged as columns
    in prior projections — the fold's lambda then touches only its own
    variable (cnt twice) instead of re-splitting the text O(distinct)
    times. This cut the sf0.1 query 8.1 s -> measured below."""
    norm = normalize_text(F.col(text_col))
    # spread the CPU-heavy per-row fold: a small parquet scan arrives
    # as one partition (similarity.py's _centroid_distances contract);
    # at real scale the scan partitioning already provides this
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.repartition(parallelism).select(
        F.col(id_col),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.split(norm, "").alias("_chars"),
    )
    counted = staged.select(
        F.col(id_col),
        "n_chars_norm",
        F.transform(
            F.array_sort(F.array_distinct(F.col("_chars"))),
            lambda c: F.size(F.filter(F.col("_chars"), lambda x: x == c)),
        ).alias("_counts"),
    )
    # sum_c round(cnt_c * log2(cnt_c), 6), folded over sorted-char counts
    mass = F.aggregate(
        F.col("_counts"),
        F.lit(0.0).cast("decimal(18,6)"),
        lambda acc, cnt: (
            acc
            + F.round(
                cnt.cast("double") * F.log2(cnt.cast("double")), 6
            ).cast("decimal(18,6)")
        ).cast("decimal(18,6)"),
    )
    n = F.col("n_chars_norm").cast("double")
    ent = F.log2(n) - mass.cast("double") / n
    return counted.select(
        F.col(id_col),
        F.col("n_chars_norm"),
        F.size("_counts").cast("long").alias("n_distinct_chars"),
        F.round(ent, 6).alias("char_entropy_bits"),
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): within each source, rank documents by LM
    perplexity and split into head/middle/tail terciles — head is the
    cleanest third a curation run keeps outright, tail the third it
    drops or down-weights. The LM is this repo's add-k bigram model
    (bigram_nll), CCNet's KenLM stand-in.

    Report: per (source, bucket) doc count and the bucket's exact
    avg_nll mean/min/max. ntile(3) over (avg_nll, doc_id) is
    deterministic because avg_nll is exact by construction
    (integer-micros floor division in bigram_nll); the bucket mean
    re-uses the same exact-mean trick — avg_nll values are 7-dp
    rationals, recovered exactly by a DECIMAL(18,7) cast, summed, and
    floor-divided in integer tenth-micros. Scale: the window
    partitions by source (no global sort); everything downstream is a
    combiner-friendly groupBy."""
    sm = (F.sum(F.col("avg_nll").cast("decimal(18,7)")) * F.lit(10000000)).cast("long")
    return (
        ccnet_buckets_per_doc(docs, id_col, text_col, source_col)
        .select(F.col(source_col), "bucket", "avg_nll")
        .groupBy(source_col, "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            sm.alias("_sm"),
            F.min("avg_nll").alias("min_nll"),
            F.max("avg_nll").alias("max_nll"),
        )
        .select(
            F.col(source_col),
            "bucket",
            "n_docs",
            (
                F.expr("(_sm * 10) div n_docs").cast("double") / F.lit(100000000.0)
            ).alias("mean_nll"),
            "min_nll",
            "max_nll",
        )
    )


def ccnet_buckets_per_doc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document CCNet bucket assignment: (id, source, avg_nll,
    bucket) with bucket = head/middle/tail by ntile(3) over (avg_nll,
    id) within source — the shared frame under ccnet_buckets (the
    per-bucket report) and fineweb_gate (the AND-ed filter stack).
    Deterministic: avg_nll is exact by construction (bigram_nll)."""
    from pyspark.sql import Window

    nll = staged_bigram_nll(docs, id_col, text_col)
    src = docs.select(F.col(id_col), F.col(source_col))
    w = Window.partitionBy(source_col).orderBy(
        F.col("avg_nll").asc(), F.col(id_col).asc()
    )
    bucketed = (
        nll.join(src, id_col)
        .select(F.col(id_col), F.col(source_col), "avg_nll")
        .withColumn("tercile", F.ntile(3).over(w))
    )
    bucket_name = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return bucketed.select(
        F.col(id_col), F.col(source_col), "avg_nll", bucket_name.alias("bucket")
    )


def staged_bigram_nll(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Session-staged per-doc bigram-LM scores (operators/staging.py):
    text_bigram_perplexity, the CCNet bucketing and the FineWeb gate
    all score the same corpus with the same LM — a production run fits
    the LM and writes the per-doc score table once. One row per doc
    (id, n_bigrams, avg_nll, ppl); every consumer joins it."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    narrowed = docs.select(id_col, text_col)
    return staged_from(
        narrowed,
        f"bigram_nll:{id_col}:{text_col}",
        lambda d: bigram_nll(d, id_col, text_col),
    )


def dsir_ess(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Kish effective sample size of the DSIR importance weights —
    THE diagnostic for importance resampling (Kish 1965; Owen's Monte
    Carlo text §9.3): ESS = (Σw)² / Σw² with w = exp(log_w − max
    log_w) (max-shifted so exp never overflows; ESS is shift-
    invariant). ESS ≪ n means the weights are degenerate and the
    DSIR-selected sample will be dominated by a few documents — the
    resample is then variance, not signal.

    Output: one row (n_docs, max_log_weight, ess, ess_frac).

    Scale: the weights table is dsir_logweights' broadcast-lookup
    shape; on top of it this is one max (combiner-friendly), one
    broadcast of the 1-row max, and one round-then-DECIMAL sum pair —
    order-independent, so the ratio hash-matches the oracle."""
    lw = dsir_logweights(docs, target_lang, n_buckets, id_col, text_col, lang_col)
    mx = lw.agg(F.max("log_weight").alias("mx"))
    w = lw.crossJoin(F.broadcast(mx)).select(
        F.exp(F.col("log_weight") - F.col("mx")).alias("w"), F.col("mx")
    )
    a = w.groupBy("mx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.round(F.col("w"), 9).cast("decimal(28,9)")).alias("s1"),
        F.sum(F.round(F.col("w") * F.col("w"), 9).cast("decimal(28,9)")).alias("s2"),
    )
    ess = (F.col("s1").cast("double") * F.col("s1").cast("double")) / F.col(
        "s2"
    ).cast("double")
    return a.select(
        "n_docs",
        F.col("mx").alias("max_log_weight"),
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_frac"),
    )


def quality_ece(
    docs: DataFrame,
    positive_lang: str = "en",
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Reliability diagram + per-bin calibration gaps for the heuristic
    quality score as a classifier of ``positive_lang`` (Naeini et al.
    2015's ECE binning; Guo et al. 2017's calibration audit): scores
    bucketed into n_bins equal-width bins; per bin the mean confidence
    and the empirical positive rate. The weighted |conf − acc| column
    is the bin's ECE contribution (ECE = Σ n_b/N · |acc_b − conf_b|).

    Bin edges are floor(score·n_bins) on the raw double — the same
    IEEE arithmetic on both engines, so boundary scores land in the
    same bin even where score·10 is not exactly representable. Means
    are exact integer-micros floor divisions; the gap is a BIGINT
    difference on the 7-dp grid.

    Scale: one score pass + one n_bins-group combiner aggregate."""
    scores = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    labeled = scores.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    ).select(
        F.least(
            F.floor(F.col("quality_score") * n_bins).cast("long"),
            F.lit(n_bins - 1),
        ).alias("bin_id"),
        F.col("quality_score").alias("s"),
        (F.col(lang_col) == positive_lang).cast("long").alias("y"),
    )
    g = labeled.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.round(F.col("s"), 6).cast("decimal(18,6)")).alias("ssum"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    conf7 = F.expr("(cast(ssum * 1000000 as bigint) * 10) div n_docs")
    acc7 = F.expr("(n_pos * 10000000) div n_docs")
    return g.select(
        "bin_id",
        "n_docs",
        "n_pos",
        (conf7.cast("double") / F.lit(10000000.0)).alias("conf"),
        (acc7.cast("double") / F.lit(10000000.0)).alias("acc"),
        (
            F.abs(conf7 - acc7).cast("double") / F.lit(10000000.0)
        ).alias("abs_gap"),
    )


def good_turing(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Good-Turing frequency-of-frequencies table (Good 1953; the
    Turing estimator as presented by Gale & Sampson 1995): N_r = how
    many vocabulary types occur exactly r times; the adjusted count
    r* = (r+1)·N_{r+1}/N_r (NULL where N_{r+1} = 0 — raw Turing,
    no smoothing fit), and each r's share of the corpus mass. The
    r = 1 row's mass share is the famous missing-mass estimate
    P0 = N_1/N.

    Scale: two combiner groupBys (term counts, then count-of-counts —
    the second is at most max-frequency groups) and one self-join on
    r+1 over that tiny table."""
    ctf = (
        docs.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    fof = ctf.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("c") * F.col("n_r")).cast("long").alias("n_tokens")
    )
    nxt = fof.select(
        (F.col("c") - 1).alias("c"), F.col("n_r").alias("n_r_next")
    )
    return (
        fof.join(nxt, "c", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("c").alias("r"),
            F.col("n_r"),
            F.round(
                (F.col("c") + 1) * F.col("n_r_next") / F.col("n_r"), 6
            ).alias("r_star"),
            (
                F.expr("(c * n_r * 10000000) div n_tokens").cast("double")
                / F.lit(10000000.0)
            ).alias("mass_frac"),
        )
    )


HEAPS_J0 = 6  # first checkpoint = 2^6 = 64 tokens


def heaps_fit(
    docs: DataFrame,
    j0: int = HEAPS_J0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law fit (Heaps 1978; Herdan 1960): vocabulary growth
    V(n) ≈ K·n^β, estimated by OLS of ln V(2^j) on ln 2^j at the
    power-of-two checkpoints 2^j0 .. 2^Jmax (Jmax = ⌊log2 N⌋). The
    exponent β is the companion corpus-health audit to the Zipf slope
    (template spam and dedup both move it); natural text sits near
    0.4–0.6.

    V(n) needs each type's FIRST OCCURRENCE position in the
    doc_id-ordered token stream. Global positions use the renumber
    discipline (renumber.py): range-partition per-doc token counts by
    doc id, per-partition cumulative sums, broadcast O(partitions)
    offsets — no corpus-sized single-task window. Checkpoint counts
    come from a histogram of j_min = ⌈log2 fp⌉ per type, computed
    INTEGER-exactly as length(bin(fp−1)) (float log2 misclassifies
    exact powers), then a ≤64-row cumulative join; the OLS moment fold
    is the zipf_fit round-then-DECIMAL pattern.

    Output: one row (n_tokens, vocab_size, n_points, beta, k)."""
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("toks"),
    ).filter((F.size("toks") >= 1) & (F.col("toks")[0] != ""))
    per_doc = toks.select(F.col(id_col), F.size("toks").cast("long").alias("nt"))
    parts = spark.sparkContext.defaultParallelism
    ranged = per_doc.repartitionByRange(parts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # O(num_partitions) longs to the driver — metadata, not data
    psums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("nt").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    win = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = ranged.select(
        F.col(id_col),
        (omap[F.col("_pid")] + F.coalesce(F.sum("nt").over(win), F.lit(0))).alias(
            "doc_start"
        ),
    )
    fo = (
        toks.join(starts, id_col)
        .select(
            F.posexplode("toks").alias("pos", "term"),
            F.col("doc_start"),
        )
        .select(F.col("term"), (F.col("doc_start") + F.col("pos") + 1).alias("gpos"))
        .groupBy("term")
        .agg(F.min("gpos").alias("fp"))
    )
    jmin = F.when(F.col("fp") <= 1, F.lit(0)).otherwise(
        F.length(F.bin(F.col("fp") - 1))
    )
    hist = fo.groupBy(jmin.cast("long").alias("j_min")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    n_total = acc
    jmax = max(j0, n_total.bit_length() - 1) if n_total > 0 else j0
    js = spark.range(j0, jmax + 1).select(F.col("id").alias("j"))
    vj = (
        js.join(hist, hist["j_min"] <= js["j"])
        .groupBy("j")
        .agg(F.sum("cnt").cast("long").alias("v"))
        .filter(F.col("v") >= 1)
    )
    ln2 = 0.6931471805599453
    x6 = F.round(F.col("j") * F.lit(ln2), 6).cast("decimal(18,6)")
    y6 = F.round(F.log(F.col("v").cast("double")), 6).cast("decimal(18,6)")
    a = vj.select(x6.alias("x"), y6.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    tots = hist.agg(F.sum("cnt").cast("long").alias("vocab_size"))
    nd = F.col("n_points").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (nd * dd("sxy") - dd("sx") * dd("sy")) / (
        nd * dd("sxx") - dd("sx") * dd("sx")
    )
    return (
        a.crossJoin(F.broadcast(tots))
        .select(
            F.lit(n_total).cast("long").alias("n_tokens"),
            F.col("vocab_size"),
            F.col("n_points"),
            F.round(slope, 6).alias("beta"),
            F.round(F.exp((dd("sy") - slope * dd("sx")) / nd), 6).alias("k"),
        )
    )


def source_kl(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    the mixture-drift audit behind domain-weight tuning (the
    distributional-shift check DoReMi/DSIR-style pipelines run per
    domain): KL(p_s ‖ p_corpus) over hashed unigram buckets with
    add-one smoothing (same 512-bucket feature space as
    dsir_logweights, so the two audits are comparable). A source whose
    KL drifts release-over-release changed its crawler or its filter
    stack.

    KL sums over the FULL B-bucket grid — absent buckets still carry
    p_s = 1/(tot_s + B) and p_c = 1/(tot_c + B) mass under add-one, so
    both sides are proper distributions and KL >= 0 holds even for a
    corpus that occupies few buckets — via a (sources × B) grid join
    that is dimension-sized (#sources · 512 rows) regardless of corpus
    size. Contributions are rounded then decimal-summed.

    Output per source: (source, n_tokens, kl)."""
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
    allb = docs.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    cb = allb.join(obs, "bucket", "left").select(
        "bucket", F.coalesce("cb", F.lit(0)).cast("long").alias("cb")
    )
    sb = toks.groupBy(source_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    stot = toks.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("ts")
    )
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
    contrib = F.round(ps * F.log(ps / pc), 9).cast("decimal(28,9)")
    return (
        grid.select(F.col(source_col), F.col("ts"), contrib.alias("contrib"))
        .groupBy(source_col, "ts")
        .agg(F.round(F.sum("contrib").cast("double"), 6).alias("kl"))
        .select(F.col(source_col), F.col("ts").alias("n_tokens"), "kl")
    )


def quality_youden(
    docs: DataFrame,
    positive_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Optimal quality-score threshold by Youden's J (Youden 1950):
    over every candidate cut t (each distinct observed score,
    predicting positive when score >= t), J(t) = TPR(t) − FPR(t);
    report the maximizing cut (ties -> lowest cut, so the most
    inclusive equally-good gate wins). This is the threshold-picking
    step a quality gate runs after audit_quality_auc says the score
    ranks and audit_quality_ece says how honestly.

    Arithmetic is integer-exact: descending-cumulative tp/fp per
    distinct score, TPR/FPR as (x·10^7) div total on the 7-dp grid,
    J as their BIGINT difference; single-class corpora degrade to
    NULL rates (nullif), not an error.

    Scale: same shape as quality_auc — a distinct-score combiner
    groupBy, ONE dimension-bounded cumulative window (<= 1e6+1 groups
    at the score's 6-dp resolution), then a 1-row TakeOrdered."""
    from pyspark.sql.window import Window

    scores = quality_scores(docs, id_col, text_col)
    labeled = (
        scores.select(id_col, "quality_score")
        .join(docs.select(id_col, lang_col), id_col)
        .select(
            F.col("quality_score").alias("s"),
            (F.col(lang_col) == positive_lang).cast("long").alias("y"),
        )
    )
    g = labeled.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    cum_w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = g.agg(
        F.sum("p").cast("long").alias("n_pos"),
        (F.sum("c") - F.sum("p")).cast("long").alias("n_neg"),
    )
    w = g.select(
        "s",
        F.sum("p").over(cum_w).cast("long").alias("tp"),
        (F.sum("c").over(cum_w) - F.sum("p").over(cum_w)).cast("long").alias("fp"),
    ).crossJoin(F.broadcast(tot))
    scored = w.select(
        "s",
        "tp",
        "fp",
        "n_pos",
        "n_neg",
        F.expr("(tp * 10000000) div nullif(n_pos, 0)").alias("tpr7"),
        F.expr("(fp * 10000000) div nullif(n_neg, 0)").alias("fpr7"),
    ).select(
        "s",
        "tp",
        "fp",
        "n_pos",
        "n_neg",
        "tpr7",
        "fpr7",
        (F.col("tpr7") - F.col("fpr7")).alias("j7"),
    )
    return (
        scored.orderBy(F.desc_nulls_last("j7"), F.asc("s"))
        .limit(1)
        .select(
            F.col("s").alias("cut"),
            "tp",
            "fp",
            (F.col("tpr7").cast("double") / F.lit(10000000.0)).alias("tpr"),
            (F.col("fpr7").cast("double") / F.lit(10000000.0)).alias("fpr"),
            (F.col("j7").cast("double") / F.lit(10000000.0)).alias("youden_j"),
        )
    )


def burstiness_topk(
    docs: DataFrame,
    k: int = 50,
    min_tf: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k bursty terms by the index of dispersion (variance-to-mean
    ratio of per-document counts, zeros included — Church & Gale 1995,
    'Poisson Mixtures'): VMR = s2/tf − tf/N (population variance over
    mean, algebraically exact from the three count sums). VMR ≈ 1 is
    Poisson background vocabulary; VMR ≫ 1 is contagious/topical
    usage — and in a training corpus the extreme tail is template
    chrome repeating inside a few documents, which is why burstiness
    is a boilerplate finder. min_tf suppresses the rare-term noise
    floor; ties break term-asc.

    Scale: one (doc, term) combiner groupBy, one vocabulary-sized
    moment groupBy, a 1-row N broadcast, and a global top-k that
    executes as TakeOrdered — never a full vocabulary sort."""
    per = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    mom = per.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    vmr = F.col("s2") / F.col("tf") - F.col("tf") / F.col("n_docs")
    return (
        mom.filter(F.col("tf") >= min_tf)
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "tf",
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), F.asc("term"))
        .limit(k)
    )


def jelinek_mercer_em(
    docs: DataFrame,
    holdout_mod: int = 10,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deleted-interpolation weight estimation (Jelinek & Mercer 1980;
    the EM recipe as in Chen & Goodman 1998 §2.4): fit ML bigram and
    unigram models on the TRAIN split (doc_id % holdout_mod != 0),
    then learn the interpolation weight λ of
    p(w2|w1) = λ·p_bi + (1−λ)·p_uni on the HELD-OUT split by EM —
    E-step: per held-out bigram, the posterior weight
    w = λp_bi/(λp_bi+(1−λ)p_uni); M-step: λ' = Σ tf·w / Σ tf.
    Held-out bigrams whose w2 is out-of-vocabulary are excluded
    (standard in-vocab restriction; p_uni = 0 would make the posterior
    undefined), and an unseen CONTEXT makes p_bi = 0 so the bigram
    pushes λ down — exactly the evidence EM should see. λ0 = 0.5.

    Output: one row per EM iteration (em_iter, lam, n_bigrams) — the
    λ trajectory, converging toward the corpus' bigram reliability.

    Scale: counts are the usual vocabulary-sized tables; the held-out
    bigram table aggregates ONCE (no doc dimension — λ is global), and
    λ itself lives as a 1-row DataFrame crossJoined through each
    unrolled E/M round — no driver-side scalar, no collect. Sums are
    round-then-DECIMAL; λ is re-rounded to the 9-dp grid each round so
    both engines walk the identical trajectory."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    train = docs.filter(F.col(id_col) % holdout_mod != 0)
    held = docs.filter(F.col(id_col) % holdout_mod == 0)

    tbase = train.select(toks.alias("toks"))
    tn = F.size("toks")
    tbi = F.arrays_zip(
        F.slice("toks", 1, tn - 1).alias("a"),
        F.slice(F.col("toks"), 2, tn - 1).alias("b"),
    )
    c12 = (
        tbase.filter(tn >= 2)
        .select(F.explode(tbi).alias("t"))
        .groupBy(F.col("t.a").alias("a"), F.col("t.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    c1 = (
        tbase.select(F.explode("toks").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    ntot = c1.agg(F.sum("c1").cast("double").alias("bign"))

    hbase = held.select(toks.alias("toks"))
    hn = F.size("toks")
    hbi = F.arrays_zip(
        F.slice("toks", 1, hn - 1).alias("a"),
        F.slice(F.col("toks"), 2, hn - 1).alias("b"),
    )
    hf = (
        hbase.filter(hn >= 2)
        .select(F.explode(hbi).alias("t"))
        .groupBy(F.col("t.a").alias("w1"), F.col("t.b").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    j = (
        hf.join(c12, (F.col("w1") == c12["a"]) & (F.col("w2") == c12["b"]), "left")
        .drop("a", "b")
        .join(
            c1.select(F.col("w").alias("w1"), F.col("c1").alias("c1_w1")),
            "w1",
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2")), "w2"
        )  # inner: in-vocab w2 only
        .crossJoin(F.broadcast(ntot))
        .select(
            "tf",
            F.when(
                F.col("c1_w1").isNotNull(),
                F.coalesce(F.col("c12"), F.lit(0)) / F.col("c1_w1"),
            )
            .otherwise(F.lit(0.0))
            .alias("pb"),
            (F.col("c1_w2") / F.col("bign")).alias("pu"),
        )
        .localCheckpoint(eager=True)
    )
    spark = docs.sparkSession
    lam = spark.range(1).select(F.lit(0.5).alias("lam"))
    out = None
    for it in range(1, iters + 1):
        w = F.col("lam") * F.col("pb") / (
            F.col("lam") * F.col("pb") + (F.lit(1.0) - F.col("lam")) * F.col("pu")
        )
        step = (
            j.crossJoin(F.broadcast(lam))
            .select(
                "tf",
                F.round(F.col("tf") * w, 9).cast("decimal(28,9)").alias("num"),
            )
            .agg(
                F.sum("tf").cast("long").alias("n_bigrams"),
                F.sum("num").cast("double").alias("s"),
            )
            .select(
                F.lit(it).cast("long").alias("em_iter"),
                F.round(F.col("s") / F.col("n_bigrams"), 9).alias("lam"),
                F.col("n_bigrams"),
            )
        )
        lam = step.select("lam")
        out = step if out is None else out.unionByName(step)
    return out


def nb_langid_confusion(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Multinomial Naive Bayes language identifier trained on the
    corpus's own labels over the 512-bucket hashed unigram space
    (add-one smoothing, log-domain), evaluated by resubstitution —
    the confusion matrix (true lang × predicted lang → doc count)
    that audits how separable the corpus's languages are in the same
    feature space DSIR/source-KL use. McCallum & Nigam 1998's
    multinomial event model; hashing trick per Weinberger et al. 2009.

    Exactness: all counts integer; log p(bucket|lang) and log priors
    are per-row doubles from agreed integers, rounded to 9 dp and
    decimal-summed per (doc, lang); argmax ties break lang-asc on the
    DECIMAL scores, so prediction is engine-exact.

    Scale: one token pass, one (lang × bucket) combiner groupBy onto
    a ≤ langs·B dimension table (broadcast), per-doc likelihoods as
    an equi-join + combiner sum, and a langs-sized broadcast grid for
    the prior-only fallback of token-less docs. The only window is
    partitioned per doc over ≤|langs| rows."""
    from pyspark.sql.window import Window

    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    toks = (
        docs.select(
            F.col(id_col),
            F.col(lang_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(F.col(id_col), F.col(lang_col), bucket.alias("bucket"))
    )
    lb = toks.groupBy(lang_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    lt = toks.groupBy(lang_col).agg(F.count(F.lit(1)).cast("long").alias("tot"))
    langs = docs.groupBy(lang_col).agg(F.count(F.lit(1)).cast("long").alias("nl"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    # model = every (lang, observed bucket) cell with add-one mass;
    # grid is ≤ langs·B rows — dimension-sized, broadcast
    obs_buckets = toks.select("bucket").distinct()
    model = (
        lt.crossJoin(obs_buckets)
        .join(lb, [lang_col, "bucket"], "left")
        .select(
            F.col(lang_col).alias("m_lang"),
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                    / (F.col("tot") + F.lit(float(n_buckets)))
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("lnp"),
        )
    )
    dt = toks.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lik = (
        dt.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "m_lang")
        # c as DECIMAL(10,0): the product stays within DECIMAL(38,9)
        # on BOTH engines (DuckDB silently falls back to DOUBLE past
        # width 38, which would break exactness)
        .agg(F.sum(F.col("c").cast("decimal(10,0)") * F.col("lnp")).alias("ll"))
    )
    priors = langs.crossJoin(F.broadcast(n)).select(
        F.col(lang_col).alias("m_lang"),
        F.round(F.log(F.col("nl") / F.col("n_all").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("lnprior"),
    )
    scored = (
        docs.select(F.col(id_col), F.col(lang_col).alias("true_lang"))
        .crossJoin(F.broadcast(priors))
        .join(lik, [id_col, "m_lang"], "left")
        .select(
            id_col,
            "true_lang",
            F.col("m_lang"),
            (F.col("lnprior") + F.coalesce(F.col("ll"), F.lit(0).cast("decimal(28,9)"))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("m_lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "true_lang", F.col("m_lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


BPE_ROUNDS = 4


def bpe_merges(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding merge learning (Sennrich, Haddow & Birch
    2016, 'Neural Machine Translation of Rare Words with Subword
    Units' — the tokenizer-training loop behind GPT-2/RoBERTa vocab
    construction) expressed as relational dataflow: start from the
    corpus vocabulary as character-symbol sequences, and for each of
    ``rounds`` iterations count adjacent symbol pairs weighted by word
    frequency, pick the most frequent pair (lexicographic tiebreak),
    and merge every occurrence into one symbol.

    Output: one row per learned merge (merge_rank, sym_a, sym_b,
    pair_count) — merge_rank 1 is the first rule of the vocab.

    Representation: a word's symbol sequence lives as a delimited
    STRING ('|a||b||c|', every symbol wrapped in '|'), so applying a
    merge is one replace('|a||b|' -> '|ab|') — both engines replace
    left-to-right non-overlapping, which is exactly BPE's greedy
    within-word merge order, and the double delimiter keeps adjacent
    occurrences independently mergeable ('|a||a||a|' -> '|aa||a|').

    Execution: the loop state is the VOCAB table (word, freq,
    symbols), corpus-vocabulary-sized, never the corpus itself — the
    corpus is read once for frequencies. Per round: pair extraction
    is two staged projections (split materialized as an attribute —
    referenced twice per pair, so CollapseProject keeps the barrier —
    then the pair array, explode_outer to dodge the inferred
    size()>0 re-inline), one combiner-friendly groupBy(a, b), a
    1-row global top-1, and a 1-row broadcast crossJoin to apply the
    replace. localCheckpoint per round pins lineage depth constant —
    the same discipline as the connected-components loop. At 100 TB
    the vocab is millions of rows and every step stays distributed;
    nothing but the single best-pair row ever sits on the driver."""
    merges, _states = _bpe_loop(docs, rounds, text_col)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select(
        "merge_rank",
        F.col("a").alias("sym_a"),
        F.col("b").alias("sym_b"),
        F.col("cnt").alias("pair_count"),
    )


def _bpe_loop(
    docs: DataFrame, rounds: int, text_col: str = "text"
) -> tuple[list[DataFrame], list[DataFrame]]:
    """The shared BPE training loop: returns ([best-pair 1-row DF per
    round], [vocab state DF per round 0..rounds]). Each state is
    (tok, freq, s) with s the '|'-wrapped symbol string; all states
    and bests are eagerly checkpointed so lineage stays constant."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    w = vocab.select(
        "tok",
        "freq",
        F.concat(
            F.lit("|"), F.array_join(F.split(F.col("tok"), ""), "||"), F.lit("|")
        ).alias("s"),
    ).localCheckpoint(eager=True)

    merges: list[DataFrame] = []
    states: list[DataFrame] = [w]
    for r in range(1, rounds + 1):
        sy = w.select(
            "freq",
            F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|").alias("syms"),
        )
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i + 1).alias("a"),
                    F.element_at(F.col("syms"), i + 2).alias("b"),
                ),
            ),
        )
        pr = sy.select("freq", pair_arr.alias("pairs"))
        ex = (
            pr.select("freq", F.explode_outer("pairs").alias("p"))
            .filter(F.col("p").isNotNull())
            .select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        )
        cnt = ex.groupBy("a", "b").agg(F.sum("freq").cast("long").alias("cnt"))
        best = (
            cnt.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(F.lit(r).cast("long").alias("merge_rank"), "a", "b", "cnt")
            .localCheckpoint(eager=True)
        )
        merges.append(best)
        w = (
            w.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                "tok",
                "freq",
                F.replace(
                    F.col("s"),
                    F.concat(F.lit("|"), F.col("a"), F.lit("||"), F.col("b"), F.lit("|")),
                    F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        states.append(w)
    return merges, states


def bpe_compression(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer compression curve: total corpus token count after
    each BPE merge round (round 0 = characters) and the cumulative
    compression ratio — the fertility/compression diagnostic every
    tokenizer-training run plots to pick its vocab size (Sennrich et
    al. 2016 report exactly this curve; modern pipelines gate vocab
    growth on its flattening).

    Per-word symbol count is derived from the delimited string
    arithmetically — n_syms = (len(s) − len(strip '|')) / 2, exact
    integers — and corpus totals are freq-weighted BIGINT sums, so
    the curve is integer-exact; only the final ratio divides.

    Output: (round, total_symbols, compression_ratio) — rounds+1
    rows, ratio = chars/total on a 6-dp grid."""
    _merges, states = _bpe_loop(docs, rounds, text_col)
    n_syms = F.expr("(length(s) - length(replace(s, '|', ''))) div 2")
    per_round = [
        st.agg(
            F.sum(F.col("freq") * n_syms).cast("long").alias("total_symbols")
        ).select(F.lit(r).cast("long").alias("round"), "total_symbols")
        for r, st in enumerate(states)
    ]
    out = per_round[0]
    for p in per_round[1:]:
        out = out.unionByName(p)
    base = out.filter(F.col("round") == 0).select(
        F.col("total_symbols").alias("chars")
    )
    return out.crossJoin(F.broadcast(base)).select(
        "round",
        "total_symbols",
        F.round(F.col("chars") / F.col("total_symbols"), 6).alias(
            "compression_ratio"
        ),
    )


def _bpe_vocab_encoded(docs: DataFrame, rounds: int, text_col: str) -> DataFrame:
    """Session-staged encoded vocabulary: the final BPE state table
    (tok, wenc, n_syms) with wenc the subwords joined by '+' and n_syms
    their exact count — the apply-time artifact a tokenizer ships. The
    training loop (_bpe_loop) runs once per session; encode/fertility/
    packing consumers all join this table."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    def build(_in: DataFrame) -> DataFrame:
        _merges, states = _bpe_loop(docs, rounds, text_col)
        return states[-1].select(
            "tok",
            F.replace(
                F.expr("trim(BOTH '|' FROM s)"), F.lit("||"), F.lit("+")
            ).alias("wenc"),
            F.expr("(length(s) - length(replace(s, '|', ''))) div 2")
            .cast("long")
            .alias("n_syms"),
        )

    return staged_from(
        docs.select(text_col), f"bpe_vocab_encoded:{rounds}:{text_col}", build
    )


def bpe_encode(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the learned BPE merges to every document — the ENCODE step
    a training pipeline actually ships (Sennrich et al. 2016 §3: learn
    merges once, apply greedily per word at corpus scale). Because BPE
    merges never cross word boundaries, encoding factors through the
    vocabulary: the corpus' distinct words are encoded ONCE by the
    training loop's final state table, and per-document encoding is an
    equi-join of the word stream against that table — at 100 TB the
    vocab join is a shuffle join on tok (or a broadcast when the vocab
    fits), never a per-document re-run of the merge rules.

    Output: one row per document — (id, n_tokens, n_words, encoded)
    with n_tokens the exact subword count, and encoded the full subword
    stream ('+' joins subwords within a word, ' ' joins words)."""
    enc = _bpe_vocab_encoded(docs, rounds, text_col)
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    return (
        words.join(enc, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("n_syms").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "wenc"))),
                    lambda s: s["wenc"],
                ),
                " ",
            ).alias("encoded"),
        )
    )


def bpe_fertility(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility audit per language: subword tokens emitted
    per word (the metric multilingual tokenizer papers report to show
    which languages a vocab under-serves — fertility ≫ 1 means the
    merges were learned on someone else's script). One word-stream scan
    joined against the staged encoded vocabulary, one combiner groupBy.

    Output: (lang, n_words, n_tokens, fertility) — fertility on the
    6-dp grid."""
    enc = _bpe_vocab_encoded(docs, rounds, text_col)
    words = docs.select(
        F.col(lang_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    return (
        words.join(enc, "tok")
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
        )
        .select(
            lang_col,
            "n_words",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_words"), 6).alias("fertility"),
        )
    )


RAKE_STOPWORDS = ("a", "the")


def rake_keyphrases(
    docs: DataFrame,
    topk: int = 15,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010,
    'Automatic Keyword Extraction from Individual Documents'):
    candidate phrases are maximal stopword-free token runs; each word
    scores deg(w)/freq(w) where deg(w) sums the lengths of every
    phrase containing w (co-occurrence degree) and freq(w) its
    occurrence count; a phrase scores the sum of its word scores.
    Corpus-level: phrases aggregate across documents and the top-k by
    score surface as the corpus' characteristic multi-word terms.

    Execution: phrase segmentation is ONE cumulative-count window per
    doc (run id = stopwords seen so far), phrase assembly and the
    word-score dimension are combiner groupBys, and the per-occurrence
    score join hits the word dimension equi on token. Word scores are
    double (deg/freq); per-phrase sums are 9-dp decimal — the
    cross-engine contract. Top-k orders by (score DESC, phrase ASC) on
    the decimal grid. Output: (phrase, n_words, n_occurrences,
    score)."""
    from pyspark.sql.window import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    tk = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
    ).withColumn("is_stop", F.col("tok").isin(*stopwords))
    runw = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = tk.withColumn(
        "run_id", F.sum(F.col("is_stop").cast("int")).over(runw)
    ).filter(~F.col("is_stop"))
    wlen = Window.partitionBy(id_col, "run_id")
    words = marked.withColumn("plen", F.count(F.lit(1)).over(wlen))
    wdim = words.groupBy("tok").agg(
        (
            F.sum("plen").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("wscore")
    )
    occ = (
        words.join(wdim, "tok")
        .groupBy(id_col, "run_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.round(F.col("wscore"), 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("score"),
        )
    )
    agg = occ.groupBy("phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score").alias("score"),
    )
    return (
        agg.orderBy(F.desc("score"), F.asc("phrase"))
        .limit(topk)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(F.col("score"), 6).alias("score"),
        )
    )


TOPP_TARGETS = (0.5, 0.9, 0.95, 0.99)


def topp_vocab_coverage(
    docs: DataFrame,
    targets: tuple[float, ...] = TOPP_TARGETS,
    text_col: str = "text",
) -> DataFrame:
    """Nucleus (top-p) vocabulary coverage curve — the tokenizer-design
    statistic behind vocab-size selection (Holtzman et al. 2020's
    nucleus over the corpus unigram distribution): for each coverage
    target p, the minimum number of most-frequent types whose
    cumulative frequency reaches p·N, and the coverage actually
    achieved there. A heavy-tailed corpus shows n_types exploding
    between 0.95 and 0.99 — the knee every vocab budget negotiates.

    Execution: one counting groupBy, then ONE unpartitioned
    row_number + running sum over the VOCAB (vocabulary-sized, the
    audit_zipf_fit precedent — types, not tokens, cross the single
    partition), then a 4-row target join taking min(rank) past each
    threshold. Integer-exact: cumulative counts are BIGINT sums;
    coverage re-divides once at the end. Output: (p_target, n_types,
    coverage)."""
    from pyspark.sql.window import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = tf.agg(F.sum("c").cast("long").alias("n"))
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = tf.select(
        "c",
        F.row_number().over(w).cast("long").alias("r"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum"),
    )
    tgt = None
    spark = docs.sparkSession
    for p in targets:
        row = spark.range(1).select(F.lit(float(p)).alias("p_target"))
        tgt = row if tgt is None else tgt.unionByName(row)
    # min rank whose cumulative count reaches ceil(p * N) exactly:
    # integer threshold = smallest integer >= p*N via decimal ceil
    j = (
        ranked.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tgt))
        .filter(
            F.col("cum")
            >= F.ceil(F.col("p_target") * F.col("n").cast("double")).cast("long")
        )
        .groupBy("p_target")
        .agg(F.min("r").alias("n_types"))
    )
    return (
        j.join(ranked.select(F.col("r").alias("n_types"), "cum"), "n_types")
        .crossJoin(F.broadcast(n))
        .select(
            "p_target",
            "n_types",
            F.round(F.col("cum") / F.col("n"), 6).alias("coverage"),
        )
    )


FW_ALPHA0 = 100.0


def fightin_words(
    docs: DataFrame,
    topk: int = 5,
    alpha0: float = FW_ALPHA0,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Log-odds with informative Dirichlet prior (Monroe, Colaresi &
    Quinn 2008, 'Fightin' Words') — THE principled per-group keyness
    statistic: for every (group, token), the z-scored log-odds of the
    token in the group vs the rest of the corpus, with the corpus
    distribution itself as the smoothing prior (raw log-odds overstate
    rare words; prior mass α_w = α0·y_w/n shrinks exactly them).
    Emits the top-k most characteristic tokens per group — the
    per-language / per-domain signature vocabulary a curation review
    reads first.

    All arithmetic is per-row double over BIGINT counts (one fixed
    expression order mirrored by the oracle); ranking is on the 6-dp z
    grid with token tiebreak. One (group, token) combiner groupBy, a
    token-keyed equi-join for corpus counts, a group-keyed equi-join
    for group totals, 1-row corpus-total broadcast; the per-group
    top-k is a window over group-local rows. Output: (group, token,
    n_in_group, z_score)."""
    from pyspark.sql.window import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.col(group_col).alias("grp"), F.explode(toks).alias("tok"))
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("ylw"))
    )
    yw = tf.groupBy("tok").agg(F.sum("ylw").cast("long").alias("yw"))
    nl = tf.groupBy("grp").agg(F.sum("ylw").cast("long").alias("nl"))
    nn = tf.agg(F.sum("ylw").cast("long").alias("n"))
    j = tf.join(yw, "tok").join(nl, "grp").crossJoin(F.broadcast(nn))
    a0 = F.lit(alpha0)
    aw = a0 * F.col("yw") / F.col("n")
    ylw, ywc, nlc, n = F.col("ylw"), F.col("yw"), F.col("nl"), F.col("n")
    yrest = ywc - ylw
    nrest = n - nlc
    d1 = F.log((ylw + aw) / (nlc + a0 - ylw - aw))
    d2 = F.log((yrest + aw) / (nrest + a0 - yrest - aw))
    z = (d1 - d2) / F.sqrt(
        F.lit(1.0) / (ylw + aw) + F.lit(1.0) / (yrest + aw)
    )
    scored = j.select(
        F.col("grp").alias(group_col),
        F.col("tok").alias("token"),
        ylw.alias("n_in_group"),
        F.round(z, 6).alias("z_score"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("z_score"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )


def yule_k(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Yule's characteristic K per language (Yule 1944, 'The
    Statistical Study of Literary Vocabulary'): K = 10⁴·(Σf² − N)/N²
    over the token frequency spectrum — the repetitiveness/vocabulary-
    richness constant that, unlike TTR, is (asymptotically) corpus-size
    invariant, so it compares languages of different corpus mass
    honestly.

    Σf² and N are exact integers (DECIMAL(38,0)); one final double
    division. One (group, token) combiner groupBy; the spectrum
    aggregate is vocabulary-sized."""
    tf = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    dec = "decimal(38,0)"
    agg = tf.groupBy("grp").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("f").cast(dec) * F.col("f").cast(dec)).alias("sf2"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab",
        F.round(
            F.lit(10_000.0)
            * (F.col("sf2") - F.col("n_tokens")).cast("double")
            / (F.col("n_tokens").cast(dec) * F.col("n_tokens").cast(dec)).cast(
                "double"
            ),
            6,
        ).alias("yule_k"),
    )


def flesch_reading_ease(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Flesch Reading Ease per language (Flesch 1948): FRE = 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/word), the readability
    gate FineWeb-Edu-style curation applies per document and reports
    per slice. Syllables use the standard vowel-group heuristic
    (maximal [aeiouy]+ runs — exact on both engines via
    regexp_extract_all); the synthetic docs are single-sentence, so
    sentences = 1 and the length term is the word count itself.

    Per-doc FRE is pure double arithmetic rounded to 9 dp; the per-
    language mean is a decimal sum over doc rows — the cross-engine
    contract. One token expansion + two combiner groupBys."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    tk = docs.select(
        F.col("doc_id"),
        F.col(group_col).alias("grp"),
        F.explode(toks).alias("tok"),
    ).select(
        "doc_id",
        "grp",
        F.size(F.regexp_extract_all(F.col("tok"), F.lit("[aeiouy]+"), 0))
        .cast("long")
        .alias("syl"),
    )
    per_doc = tk.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("syl").cast("long").alias("s"),
    )
    fre = F.round(
        F.lit(206.835)
        - F.lit(1.015) * F.col("w")
        - F.lit(84.6) * (F.col("s") / F.col("w")),
        9,
    )
    return (
        per_doc.select("grp", "w", fre.alias("fre"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("w").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_words"),
            F.round(
                F.sum(F.col("fre").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_fre"),
        )
        .select(F.col("grp").alias(group_col), "n_docs", "avg_words", "avg_fre")
    )


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick bigram featurizer (Weinberger et al. 2009,
    'Feature Hashing for Large Scale Multitask Learning' — the
    fastText/VW featurization path): every adjacent token bigram hashes
    into one of n_buckets feature slots; the corpus-level slot profile
    (occurrence mass, distinct bigrams, collision load) is what sizes
    the feature table before training a hashed linear probe.

    Hash = first 4 hex digits of md5 mod n_buckets — the md5/conv-only
    cross-engine hashing contract. One bigram expansion (explode_outer
    guard), one combiner groupBy on the bucket key — at 100 TB this
    shuffles 2-token strings' buckets, never documents."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        ),
    )
    bg = (
        docs.select(toks.alias("toks"))
        .select(F.explode_outer(grams).alias("bg"))
        .filter(F.col("bg").isNotNull())
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("bg")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    return (
        bg.select(bucket.alias("bucket"), "bg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("bg").cast("long").alias("n_distinct_bigrams"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    topk: int = 15,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the corpus word co-occurrence graph (adjacent-token
    edges, weight = corpus co-occurrence count), top-k tokens by rank —
    the graph-centrality keyness signal beside RAKE's degree/frequency
    and Fightin' Words' log-odds.

    Same iterative-numeric discipline as pagerank_lite: per round one
    equi-join of current ranks onto edge sources + one combiner groupBy
    on destinations; per-edge contributions w·r/wdeg are double,
    cast to DECIMAL(28,12) for the order-free sum, ranks kept on the
    12-dp grid. Unnormalized convention r₀ = 1, r ← (1−d) + d·Σ.
    Graph size is vocabulary², not corpus — at 100 TB the edge table
    shuffles token pairs, never documents.

    Output: (token, wdeg, textrank) — top-k by (rank DESC, token)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    tk = docs.select(toks.alias("toks"))
    pair_arr = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i + 1).alias("a"),
                F.element_at(F.col("toks"), i + 2).alias("b"),
            ),
        ),
    )
    ex = (
        tk.select(F.explode_outer(pair_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    und = ex.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("w"))
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    # parallel edges (a,b) and (b,a) from the undirected fold merge here
    edges = edges.groupBy("src", "dst").agg(F.sum("w").cast("long").alias("w"))
    deg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wdeg"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst"),
                (F.col("w") * F.col("r") / F.col("wdeg"))
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                F.round(
                    F.lit(1.0) - F.lit(damping)
                    + F.lit(damping) * F.sum("c").cast("double"),
                    12,
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
    from pyspark.sql.window import Window

    ranked = (
        ranks.join(deg.select(F.col("src").alias("node"), "wdeg"), "node")
        .select(
            F.col("node").alias("token"),
            "wdeg",
            F.round(F.col("r"), 6).alias("textrank"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("textrank"), F.asc("token"))
            ),
        )
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )
    return ranked


def bigram_entropy_rate(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Bigram entropy rate per language: H(W₂|W₁) = H(bigrams) −
    H(unigram marginal) in nats (Shannon 1951's printed-English
    estimate, the chain-rule identity) — the sequence-predictability
    audit that separates 'rich vocabulary' (high H(W)) from 'rich
    word order' (high conditional entropy); template/boilerplate
    corpora collapse the conditional term first.

    Both entropies follow the per-row round(−p·ln p, 9) decimal-sum
    contract over exact integer counts; the marginal is derived from
    the SAME bigram table (conditioning-token mass), so the chain-rule
    subtraction is internally consistent. One bigram expansion + two
    combiner groupBys; everything downstream is vocabulary²-sized."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i + 1).alias("w1"),
                F.element_at(F.col("toks"), i + 2).alias("w2"),
            ),
        ),
    )
    bg = (
        docs.select(F.col(group_col).alias("grp"), toks.alias("toks"))
        .select("grp", F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("grp", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    bc = bg.groupBy("grp", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = bc.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))

    def _h(cnts: DataFrame) -> DataFrame:
        return (
            cnts.join(n, "grp")
            .groupBy("grp")
            .agg(
                F.sum(
                    F.round(
                        -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")),
                        9,
                    ).cast("decimal(28,9)")
                )
                .cast("double")
                .alias("h")
            )
        )

    hb = _h(bc).select("grp", F.col("h").alias("h_bigram"))
    uc = bc.groupBy("grp", "w1").agg(F.sum("c").cast("long").alias("c"))
    hu = _h(uc).select("grp", F.col("h").alias("h_unigram"))
    return (
        n.join(hb, "grp")
        .join(hu, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n").alias("n_bigrams"),
            F.round(F.col("h_bigram"), 6).alias("h_bigram"),
            F.round(F.col("h_unigram"), 6).alias("h_unigram"),
            F.round(F.col("h_bigram") - F.col("h_unigram"), 6).alias("h_cond"),
        )
    )


# ===========================================================================
# Round 9: windowed lexical diversity, fog readability, langid PRF
# ===========================================================================

MATTR_WINDOW = 20


def mattr(
    docs: DataFrame,
    window: int = MATTR_WINDOW,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Moving-Average Type-Token Ratio per language (Covington &
    McFall 2010): the mean distinct-type share over every length-W
    token window of each document — the length-invariant lexical-
    diversity measure (plain TTR shrinks with document length, which
    makes cross-source comparisons lie).

    The window sweep is CLOSED-FORM, not a range join: a token at
    position j is a new type in window [s, s+W-1] iff s > prev_j (its
    previous occurrence) and s <= j, so its contribution to
    sum_s types(s) is |[max(j-W+1, prev_j+1, 1), min(j, L-W+1)]| —
    pure per-row integer arithmetic off one lag window, then one
    combiner groupBy. MATTR_doc = sum_s types(s) / (W * n_windows)
    (exact-integer ratio, one double division); per-language means
    fold 9-dp DECIMAL. Plain TTR rides along for contrast.

    Scale: one token expansion + two windows partitioned by doc (each
    document's tokens colocate; no cross-doc traffic), one combiner
    rollup."""
    from pyspark.sql.window import Window

    tk = docs.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos0", "term"
        ),
    ).filter(F.col("term") != "")
    wp = Window.partitionBy("doc_id", "term").orderBy("pos0")
    wd = Window.partitionBy("doc_id")
    j = (F.col("pos0") + 1).cast("long")
    prev = (F.coalesce(F.lag("pos0").over(wp), F.lit(-1)) + 1).cast("long")
    scored = tk.select(
        "doc_id",
        "grp",
        j.alias("j"),
        prev.alias("prev"),
        F.count(F.lit(1)).over(wd).cast("long").alias("ll"),
    )
    lo = F.greatest(F.col("j") - window + 1, F.col("prev") + 1, F.lit(1))
    hi = F.least(F.col("j"), F.col("ll") - window + 1)
    contrib = F.greatest(hi - lo + 1, F.lit(0))
    per_doc = (
        scored.filter(F.col("ll") >= window)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("ll").alias("ll"),
            F.sum(contrib).cast("long").alias("types_sum"),
            F.sum(F.when(F.col("prev") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_types"),
        )
        .select(
            "grp",
            F.round(
                F.col("types_sum")
                / (F.lit(window) * (F.col("ll") - window + 1)),
                9,
            ).alias("mattr_doc"),
            F.round(F.col("n_types") / F.col("ll"), 9).alias("ttr_doc"),
        )
    )
    return per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.col("mattr_doc").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_mattr"),
        F.round(
            F.sum(F.col("ttr_doc").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ttr"),
    ).select(F.col("grp").alias(group_col), "n_docs", "mean_mattr", "mean_ttr")


def gunning_fog(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Gunning fog index per language (Gunning 1952): FOG =
    0.4 * (words/sentences + 100 * complex_words/words), complex =
    >= 3 syllables by the same maximal-[aeiouy]+-run heuristic the
    Flesch gate uses (single-sentence synthetic docs -> sentences=1,
    mirroring flesch_reading_ease). Per-doc fog is double arithmetic
    rounded 9 dp; language means fold DECIMAL."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    tk = docs.select(
        F.col("doc_id"),
        F.col(group_col).alias("grp"),
        F.explode(toks).alias("tok"),
    ).select(
        "doc_id",
        "grp",
        F.size(F.regexp_extract_all(F.col("tok"), F.lit("[aeiouy]+"), 0))
        .cast("long")
        .alias("syl"),
    )
    per_doc = tk.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum(F.when(F.col("syl") >= 3, 1).otherwise(0)).cast("long").alias("cx"),
    )
    fog = F.round(
        F.lit(0.4) * (F.col("w") + F.lit(100.0) * F.col("cx") / F.col("w")), 9
    )
    return (
        per_doc.select("grp", "w", "cx", fog.alias("fog"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("cx").cast("decimal(28,9)")).cast("double")
                / F.sum(F.col("w").cast("decimal(28,9)")).cast("double") * 100,
                6,
            ).alias("pct_complex"),
            F.round(
                F.sum(F.col("fog").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_fog"),
        )
        .select(F.col("grp").alias(group_col), "n_docs", "pct_complex", "avg_fog")
    )


def staged_nb_confusion(docs: DataFrame) -> DataFrame:
    """Session-staged NB-langid confusion matrix keyed on the docs
    plan: the raw confusion query and the P/R/F1 summary layer train
    and score the same model on the same corpus — materialize once
    (operators/staging.py). Output is <= langs² rows."""
    from openrouter_batch_processor_spark.operators.staging import staged_from

    return staged_from(
        docs.select("doc_id", "text", "lang"),
        "nb_confusion",
        nb_langid_confusion,
    )


def langid_prf(docs: DataFrame) -> DataFrame:
    """Per-language precision / recall / F1 of the Naive-Bayes langid
    audit (the summary layer over nb_langid_confusion's matrix): tp =
    diagonal cell, support = true-row margin, predicted = column
    margin. All margins are exact integers off the confusion counts;
    P/R/F1 are single double divisions rounded 6 dp (F1 from the
    UNROUNDED integer ratio 2tp/(support+predicted) — one division,
    no compounding). Macro-F1 rides along (9-dp DECIMAL fold over the
    language rows, the k-row cross-engine contract)."""
    conf = staged_nb_confusion(docs)
    tr = conf.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("support")
    )
    pr = conf.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("predicted")
    )
    tp = conf.filter(F.col("true_lang") == F.col("pred_lang")).select(
        F.col("true_lang").alias("lang"), F.col("n_docs").alias("tp")
    )
    j = (
        tr.join(pr, "lang", "full")
        .join(tp, "lang", "left")
        .select(
            "lang",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("predicted", F.lit(0)).cast("long").alias("predicted"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(F.col("predicted") > 0, F.round(F.col("tp") / F.col("predicted"), 6))
    rec = F.when(F.col("support") > 0, F.round(F.col("tp") / F.col("support"), 6))
    f1 = F.round(
        2.0 * F.col("tp") / (F.col("support") + F.col("predicted")), 6
    )
    scored = j.select(
        "lang", "support", "predicted", "tp",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    macro = scored.agg(
        F.round(
            F.sum(F.round(F.col("f1"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("macro_f1")
    )
    return scored.crossJoin(F.broadcast(macro))


def distinct_ngram_diversity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dist-1 / Dist-2 corpus diversity per source (Li et al. 2016,
    "A Diversity-Promoting Objective Function for Neural Conversation
    Models"): distinct n-grams over total n-grams — the degenerate-
    repetition screen a generation-heavy corpus needs (a crawl of
    templated pages scores low dist-2 long before exact dedup fires).

    Tokens are the corpus-standard normalized whitespace split;
    bigrams pair consecutive tokens inside each doc (never across doc
    boundaries). Both levels reduce with combiner groupBys on
    (source, gram) — count_distinct never holds a per-group set, it is
    the two-stage distinct aggregate — so the shape is shuffle-bounded
    by distinct-gram volume, not corpus volume."""
    from openrouter_batch_processor_spark.functions.hashing import normalize_text

    toks = docs.select(
        "source", F.split(normalize_text(F.col(text_col)), " ").alias("tk")
    ).filter(F.size("tk") > 0)
    uni = toks.select("source", F.explode("tk").alias("g")).filter(
        F.col("g") != ""
    )
    bi = toks.filter(F.size("tk") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.slice(F.col("tk"), 1, F.size("tk") - 1),
                lambda t, i: F.concat(
                    t, F.lit(" "), F.element_at(F.col("tk"), i + 2)
                ),
            )
        ).alias("g"),
    )
    u = uni.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_unigrams"),
        F.count_distinct("g").cast("long").alias("v_unigrams"),
    )
    b = bi.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.count_distinct("g").cast("long").alias("v_bigrams"),
    )
    return (
        u.join(b, "source")
        .select(
            "source",
            "n_unigrams",
            "v_unigrams",
            F.round(F.col("v_unigrams") / F.col("n_unigrams"), 6).alias("dist1"),
            "n_bigrams",
            "v_bigrams",
            F.round(F.col("v_bigrams") / F.col("n_bigrams"), 6).alias("dist2"),
        )
    )


# ===========================================================================
# Round 11 (second batch): Self-BLEU corpus diversity, RHO-loss selection
# ===========================================================================


def _clipped_precision(gram_tf: DataFrame, id_col: str, out_col: str) -> DataFrame:
    """Per-document clipped n-gram precision against the REST of the
    corpus as references (the Self-BLEU reference set): for each gram,
    the clip ceiling is the max count of that gram in any OTHER
    document — max-excluding-self from a (max, count-at-max, runner-up)
    aggregate, never a per-pair join.

    Shape: ONE exchange on the gram key (two stacked whole-partition
    window aggregates sharing it — the groupBy(max) + groupBy(m2,c1) +
    two join-backs of the previous form re-referenced the gram table
    three times, re-executing its explode+groupBy subtree per branch)
    plus the per-doc fold — still linear in corpus tokens at any
    scale. Input: (id, gram, tf) with exact integer tf."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("gram")
    t = gram_tf.withColumn("m1", F.max("tf").over(w)).select(
        id_col,
        "tf",
        "m1",
        F.sum(F.when(F.col("tf") == F.col("m1"), 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("c1"),
        F.max(F.when(F.col("tf") < F.col("m1"), F.col("tf")))
        .over(w)
        .alias("m2"),
    )
    max_other = (
        F.when(F.col("tf") < F.col("m1"), F.col("m1"))
        .when(F.col("c1") >= 2, F.col("m1"))
        .otherwise(F.coalesce(F.col("m2"), F.lit(0)))
    )
    return t.groupBy(id_col).agg(
        (
            F.sum(F.least(F.col("tf"), max_other)).cast("double")
            / F.sum("tf")
        ).alias(out_col)
    )


def self_bleu(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-BLEU-2 corpus-diversity audit (Zhu et al. 2018, Texygen):
    per document, the geometric mean of clipped unigram and bigram
    precision against every OTHER document as the reference set, then
    the per-source mean. High Self-BLEU = the source repeats itself —
    the generation-diversity screen applied as a corpus-curation audit
    (template farms and boilerplate mirrors score near 1).

    Brevity penalty is omitted (the pooled reference set is always
    longer than one candidate, so BP = 1), and documents with no bigram
    (< 2 tokens) are excluded from the mean — both conventions noted
    here because BLEU variants differ. No smoothing: a doc whose every
    bigram is unique to it scores p2 = 0, which IS the diversity
    signal.

    Scale: gram tables are (doc, gram) combiner groupBys; the clip
    ceiling is a vocabulary-sized aggregate (max / count-at-max /
    runner-up), so no doc-pair join ever forms — the classic Self-BLEU
    O(n²) reference loop is replaced by max-excluding-self arithmetic.
    Per-doc precisions are exact-int ratios; the per-source mean folds
    round(x, 9) decimals (order-invariant)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    uni = (
        docs.select(F.col(id_col), F.explode(toks).alias("gram"))
        .filter(F.col("gram") != "")
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bi = (
        docs.select(F.col(id_col), toks.alias("tk"))
        .select(
            id_col,
            F.explode(
                F.when(
                    F.size("tk") >= 2,
                    F.transform(
                        F.slice(F.col("tk"), 1, F.size("tk") - 1),
                        lambda t, i: F.concat(
                            t, F.lit(" "), F.element_at(F.col("tk"), i + 2)
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p1 = _clipped_precision(uni, id_col, "p1")
    p2 = _clipped_precision(bi, id_col, "p2")
    scored = (
        p1.join(p2, id_col)
        .join(docs.select(id_col, group_col), id_col)
        .withColumn("bleu", F.sqrt(F.col("p1") * F.col("p2")))
    )
    dec = lambda c: F.sum(F.round(c, 9).cast("decimal(28,9)")).cast("double")  # noqa: E731
    return (
        scored.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(dec(F.col("p1")) / F.count(F.lit(1)), 6).alias("mean_p1"),
            F.round(dec(F.col("p2")) / F.count(F.lit(1)), 6).alias("mean_p2"),
            F.round(dec(F.col("bleu")) / F.count(F.lit(1)), 6).alias(
                "mean_self_bleu"
            ),
        )
    )


def rho_loss_scores(
    docs: DataFrame,
    target_lang: str = "en",
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RHO-loss-style learnability selection (Mindermann et al. 2022,
    'Prioritized training on points that are learnable, worth learning,
    and not yet learnt'), with unigram LMs standing in for the two
    models: score = avg-NLL under the CORPUS unigram LM minus avg-NLL
    under a TARGET unigram LM trained on the target_lang slice
    (add-one smoothed over the corpus vocabulary, so OOV-vs-target
    tokens are priced, not dropped). High score = hard for the
    generalist, easy for the target domain — learnable AND worth
    learning; the irreducible-holdout-loss term of the paper, computed
    with count tables instead of a proxy network. Top-k by score.

    Same plan family as text_unigram_nll / text_dsir_weights: one tf
    table, two vocabulary-sized count aggregates joined back on term,
    scalar totals as broadcast single-row cross joins. Contributions
    round to DECIMAL(18,6) per (doc, term) row so the per-doc fold is
    order-invariant; the subtraction happens on exact decimal sums."""
    tf = term_frequencies(docs, id_col, text_col)
    ctf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    tot = ctf.agg(
        F.sum("ctf").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    ttf = (
        tf.join(
            docs.filter(F.col("lang") == target_lang).select(id_col), id_col
        )
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("ttf"))
    )
    ttot = ttf.agg(
        F.coalesce(F.sum("ttf"), F.lit(0)).cast("double").alias("t_total")
    )
    contrib = (
        tf.join(ctf, "term")
        .join(ttf, "term", "left")
        .join(F.broadcast(tot))
        .join(F.broadcast(ttot))
        .select(
            id_col,
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("total_tokens") / F.col("ctf")), 6
            )
            .cast("decimal(18,6)")
            .alias("nll_c"),
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("t_total") + F.col("vocab"))
                    / (F.coalesce(F.col("ttf"), F.lit(0)) + 1)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nll_t"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(
            (F.sum("nll_c") - F.sum("nll_t")).cast("double") / F.sum("tf"), 6
        ).alias("rho_score"),
    )
    return (
        scored.join(docs.select(id_col, "lang"), id_col)
        .orderBy(F.desc("rho_score"), F.asc(id_col))
        .limit(k)
        .select(id_col, "lang", "n_tokens", "rho_score")
    )
