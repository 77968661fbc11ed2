"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All SQL-expressible column
arithmetic except tokenization (shared Arrow tokenizer)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import with_tokens

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "be", "at", "by", "this", "are", "or",
]


BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
# GPT-2-style pre-tokenization chunks (letter runs / digit runs / symbol
# runs), the standard proxy for BPE token budgeting; expressible
# identically in Java regex (Spark) and RE2 (DuckDB).


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """-> (id, n_chars, n_ws_tokens, n_alpha_tokens, n_bpeish_tokens):
    char length, whitespace-split count, admitted-token count, and a
    BPE-ish pre-token count (BPEISH_PATTERN chunks)."""
    d = with_tokens(docs)
    txt = F.coalesce(F.col("text"), F.lit(""))
    return d.select(
        id_col,
        F.length(txt).alias("n_chars"),
        F.size(
            F.filter(
                F.split(txt, r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("n_ws_tokens"),
        F.size("tokens").alias("n_alpha_tokens"),
        F.regexp_count(txt, F.lit(BPEISH_PATTERN)).alias("n_bpeish_tokens"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", threshold: float = 0.05) -> DataFrame:
    """-> (id, en_ratio, lang): stopword-ratio heuristic language ID.
    en_ratio = |tokens ∩ EN_STOPWORDS| / |tokens|; 'en' iff ratio > τ,
    'unknown' for empty docs."""
    d = with_tokens(docs)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(stop, t)))
    n_tok = F.size("tokens")
    ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        F.round(ratio, 6).alias("en_ratio"),
        F.when(n_tok == 0, F.lit("unknown"))
        .when(ratio > threshold, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """-> (id, n_tokens, mean_token_len, alpha_ratio, stop_ratio, quality).

    quality in [0,1]: penalizes very short docs, low alphabetic density and
    stopword-free (likely non-linguistic) text — the standard cheap filters
    in web-scale corpus cleaning.
    """
    d = with_tokens(docs)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_tok = F.size("tokens")
    text = F.coalesce(F.col("text"), F.lit(""))
    n_chars = F.length(text)
    n_alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    tok_chars = F.expr("aggregate(tokens, 0, (acc, t) -> acc + length(t))")
    mean_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha_chars / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(stop, t))) / n_tok,
    ).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + alpha_ratio * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.2)
    )
    return d.select(
        id_col,
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """-> (id, fp): order-insensitive content fingerprint = md5 of the
    sorted distinct admitted tokens. Stable under token reordering —
    the cheap 'same bag of words' dedup key."""
    d = with_tokens(docs)
    return d.select(
        id_col,
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("tokens"))))
        ).alias("fp"),
    )


def doc_keywords(tf_table: DataFrame, term_stats: DataFrame, n_docs: int,
                 k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document -> (doc_id, rank, term,
    tfidf) — the standard document-labeling primitive of a training-data
    pipeline (topic tagging, dedup explanation, corpus drill-down).

    tfidf = tf * ln(N / df) over the existing tf/stats relations; the
    per-doc top-k is a row_number window that Spark compiles to the
    WindowGroupLimit rank-pushdown (only the running top-k per doc is
    kept per task), and the stats side joins broadcast-sized (one row
    per term). Ties break (term asc) so the output is deterministic."""
    from pyspark.sql import Window

    w = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    scored = tf_table.join(F.broadcast(term_stats.select("term", "df")),
                           "term").withColumn("tfidf", w)
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= int(k))
        .select("doc_id", F.col("rank").cast("long").alias("rank"),
                "term", F.round("tfidf", 6).alias("tfidf"))
    )


def doc_unigram_logprob(
    tf_table: DataFrame,
    term_stats: DataFrame,
    total_tokens: int,
) -> DataFrame:
    """Per-doc average unigram-LM log-probability — the perplexity-proxy
    quality filter (docs far below the corpus-typical logprob are noise;
    far above are degenerate/repetitive). A model-based filter with a
    purely relational plan:

        avg_lp(d) = sum_t tf(d,t) * ln(cf(t) / T) / dl(d)

    One hash join tf ⋈ stats on term (NOT broadcast: stats is
    vocabulary-sized, the unbounded-broadcast trap), one per-doc agg.
    -> (doc_id, dl, avg_logprob).
    """
    j = tf_table.join(term_stats.select("term", "cf"), "term")
    return (
        j.groupBy("doc_id")
        .agg(
            F.max("dl").cast("long").alias("dl"),
            (F.sum(F.col("tf") * F.log(F.col("cf")
                                       / F.lit(float(total_tokens))))
             / F.max("dl")).alias("avg_logprob"),
        )
    )


def doc_bigram_logprob(
    docs: DataFrame,
    term_stats: DataFrame,
    total_tokens: int,
    alpha: float = 0.4,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc average bigram-LM log-probability with STUPID BACKOFF
    (Brants et al., EMNLP 2007 — the web-scale LM recipe: an
    unnormalized score, exactly what a filter needs and the only variant
    whose corpus pass is two hash aggs):

        s(w2|w1) = count(w1 w2) / cf(w1)        if count >= min_count
                 = alpha * cf(w2) / T           otherwise (backoff)

    min_count=2 makes singleton bigrams — which every doc trivially
    contributes to its own score — back off to the unigram model, so the
    bigram term only rewards genuinely corpus-attested continuations.
    Sharper than ``doc_unigram_logprob`` at separating word salad from
    fluent text (salad has plausible unigrams, implausible bigrams).

    Plan: in-row bigram formation (zip_with) -> one corpus bigram-count
    hash agg -> per-instance hash joins on bigram/term (NOT broadcast —
    both sides are corpus-vocabulary-sized, the unbounded-broadcast
    trap) -> one per-doc agg. Docs with < 2 admitted tokens carry no
    bigrams and are absent. -> (doc_id, n_bigrams, avg_logprob).
    """
    from searchengine_spark.operators.collocations import doc_bigrams

    bg = doc_bigrams(docs, text_col=text_col)
    counts = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
    inst = (
        bg.join(counts, "bigram")
        .withColumn("_w1", F.split("bigram", " ")[0])
        .withColumn("_w2", F.split("bigram", " ")[1])
        .join(term_stats.select(F.col("term").alias("_w1"),
                                F.col("cf").alias("cf1")), "_w1")
        .join(term_stats.select(F.col("term").alias("_w2"),
                                F.col("cf").alias("cf2")), "_w2")
    )
    t = F.lit(float(total_tokens))
    lp = F.when(
        F.col("c2") >= min_count, F.log(F.col("c2") / F.col("cf1"))
    ).otherwise(F.log(F.lit(float(alpha)) * F.col("cf2") / t))
    return (
        inst.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.sum(lp) / F.count("*"), 5).alias("avg_logprob"),
        )
    )


def source_divergence(
    tf_table: DataFrame,
    doc_meta: DataFrame,
    total_tokens: int,
    meta_col: str = "source",
) -> DataFrame:
    """KL(source term distribution ‖ corpus distribution) per source —
    the drift / contamination detector (a source whose unigram mix
    diverges from the corpus is boilerplate, spam, or another domain).

        KL(s) = sum_t p_s(t) * ln(p_s(t) / q(t)),
        p_s = cf_s/T_s, q = cf/T

    Every source term exists in the corpus (subset), so q > 0 always.
    Plan: tf ⋈ doc meta on doc_id (hash), agg to (source, term), join
    corpus cf on term, one agg per source. -> (source, kl).
    """
    src_term = (
        tf_table.join(doc_meta.select("doc_id", meta_col), "doc_id")
        .groupBy(meta_col, "term")
        .agg(F.sum("tf").alias("cfs"))
    )
    src_tot = src_term.groupBy(meta_col).agg(F.sum("cfs").alias("ts"))
    corpus = tf_table.groupBy("term").agg(F.sum("tf").alias("cf"))
    p = F.col("cfs") / F.col("ts")
    q = F.col("cf") / F.lit(float(total_tokens))
    return (
        src_term.join(src_tot, meta_col)
        .join(corpus, "term")
        .groupBy(meta_col)
        .agg(F.sum(p * F.log(p / q)).alias("kl"))
    )


def repetition_stats(docs: DataFrame, n: int = 3,
                     id_col: str = "doc_id") -> DataFrame:
    """Degenerate-text detector: what fraction of a doc's n-grams is its
    single most-repeated n-gram? (Looping generations / boilerplate spam
    score near 1; natural text scores near 1/#ngrams.) In-row plan:
    n-grams by zip_with over array slices, mode frequency via
    aggregate over the distinct list — no explode, no shuffle.

    -> (doc_id, n_ngrams, top_ngram_frac); docs with < n tokens emit
    n_ngrams = 0, frac 0.0.
    """
    toks = F.col("_toks")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = F.array_max(
        F.transform(
            F.array_distinct(F.col("_grams")),
            lambda g: F.size(F.filter(F.col("_grams"), lambda x: x == g)),
        )
    )
    return (
        with_tokens(docs).withColumnRenamed("tokens", "_toks")
        .withColumn("_grams", grams)
        .select(
            id_col,
            F.size("_grams").cast("long").alias("n_ngrams"),
            F.when(
                F.size("_grams") > 0,
                F.round(top.cast("double") / F.size("_grams"), 6),
            ).otherwise(F.lit(0.0)).alias("top_ngram_frac"),
        )
    )


_PII_PATTERNS = {
    # deliberately simple, auditable patterns — the pipeline signal is
    # "how much PII-looking material", not a redaction guarantee
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "urls": r"https?://[^\s]+",
    "phones": r"\+?\d[\d\-\s()]{7,}\d",
    "ipv4s": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_scan(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-doc counts of PII-shaped spans (emails, URLs, phone numbers,
    IPv4s) — the scrubbing-priority signal every training pipeline
    computes before redaction. Pure JVM ``regexp_count`` columns, one
    scan, no UDF."""
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(name)
        for name, pat in _PII_PATTERNS.items()
    ]
    return docs.select(id_col, *cols)
