"""Fielded (boosted multi-field) retrieval.

The reference maintains TWO parallel index families — titles_* and repos_*
— and scores hits additively with a 100x title boost
(SearchEngine Engine/Engine/Engine.cs:18,99-122,146-173): the logical model
is a document with fields {title, body} and per-field weights {100, 1}.

Transcripts have no title; the analog is any categorical field column
(role: a "user" turn can be boosted over "assistant"/"tool" turns, or the
documents table's ``source``). Implementation is one index with a field
tag per posting — not N parallel indexes — so the field dimension rides
the existing shuffle for free:

    score(d) = sum_t qf_t * sum_f weight_f * w(t, d, f)

where w is BM25 computed on the per-(doc, field) term frequencies with
per-(doc, field) lengths (each field is its own "document" for length
normalization, the standard BM25F-simple treatment; the reference's title
score is the degenerate weight * tf * qf with no normalization, kept as
mode="reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import bm25_weight, idf_col
from searchengine_spark.functions.tokenize import term_counts_udf
from searchengine_spark.operators.topk import query_terms_df


def build_fielded_tf(docs: DataFrame, field_col: str,
                     doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """docs -> (term, doc_id, field, tf, fdl): per-(doc, field) term
    frequencies + field length. One Arrow pass + JVM explode."""
    fwd = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.col(field_col).alias("field"),
        term_counts_udf(F.col(text_col)).alias("postings"),
    ).withColumn("fdl", F.expr("aggregate(postings, 0, (a, p) -> a + p.tf)"))
    return fwd.select(
        "doc_id", "field", "fdl", F.explode("postings").alias("p")
    ).select(F.col("p.term").alias("term"), "doc_id", "field",
             F.col("p.tf").alias("tf"), "fdl")


def fielded_topk(
    docs: DataFrame,
    field_col: str,
    weights: dict[str, float],
    query: str,
    k: int = 10,
    doc_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "bm25f",
    posting_cap: int | None = None,
) -> DataFrame:
    """Boosted multi-field top-k -> (doc_id, score).

    df/cf/N/avgdl are computed per field (each field is its own corpus for
    stats, mirroring the reference's two separately built indexes).

    ``mode="bm25f"`` (default): per-field BM25 with per-field length
    normalization, boost applied multiplicatively.

    ``mode="reference"``: the reference Engine's exact two-field formula
    (SearchEngine Engine/Engine/Engine.cs:146-173) generalized to N
    fields — a field with weight w != 1 scores ``w * tf * qf`` with NO
    normalization (the title side, TitleScore=100 at Engine.cs:18,162);
    a weight-1 field scores ``(tf / mean_t) * qf`` with mean_t = cf_t / N
    (the body side, Engine.cs:151,172). ``posting_cap`` reproduces the
    per-term 1000-highest-tf truncation (Engine.cs:185,193) with the
    pinned (tf desc, doc_id asc) tie-break.
    """
    spark = docs.sparkSession
    tf = build_fielded_tf(docs, field_col, doc_col, text_col)

    stats = tf.groupBy("field", "term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    scal = (
        tf.groupBy("field", "doc_id").agg(F.first("fdl").alias("fdl"))
        .groupBy("field")
        .agg(F.count("*").alias("n_fdocs"), F.avg("fdl").alias("avgfdl"))
    )

    qt = query_terms_df(spark, query)
    w_map = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    # Broadcast only query-term stats rows: the full per-field stats table
    # spans the corpus vocabulary (10^7-10^8 terms at scale) and would OOM
    # executors as a broadcast; semi-joined to the tiny query-term frame it
    # is O(|query| * |fields|) rows.
    stats_q = stats.join(F.broadcast(qt.select("term")), "term")
    joined = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(stats_q), ["field", "term"])
        .join(F.broadcast(scal), "field")
    )
    if posting_cap is not None:
        # reference per-term truncation: only the posting_cap highest-tf
        # postings of each (field, term) are scored; applied AFTER the
        # query-term semi-join so the window only shuffles matched rows
        w_rank = Window.partitionBy("field", "term").orderBy(
            F.desc("tf"), F.asc("doc_id")
        )
        joined = (
            joined.withColumn("_rn", F.row_number().over(w_rank))
            .filter(F.col("_rn") <= posting_cap)
            .drop("_rn")
        )

    boost = F.coalesce(w_map[F.col("field")], F.lit(1.0))
    if mode == "reference":
        partial = F.when(
            boost != 1.0, boost * F.col("tf") * F.col("qf")
        ).otherwise(
            F.col("qf") * F.col("tf")
            / (F.col("cf").cast("double") / F.col("n_fdocs"))
        )
    elif mode == "bm25f":
        idf = F.log(
            (F.col("n_fdocs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
        )
        denom = F.col("tf") + F.lit(1.2) * (
            F.lit(1.0 - 0.75) + F.lit(0.75) * F.col("fdl") / F.col("avgfdl")
        )
        partial = boost * F.col("qf") * idf * (F.col("tf") * F.lit(2.2)) / denom
    else:
        raise ValueError(f"unknown fielded mode: {mode!r}")
    scored = joined.withColumn("partial", partial)
    return (
        scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# -- true BM25F (Robertson & Zaragoza 2009 §3.3) ------------------------------
#
# ``fielded_topk`` above sums per-field BM25 scores (BM25F-simple / the
# reference's additive two-index model). TRUE BM25F instead accumulates a
# field-weighted, field-length-normalized tf ACROSS fields and saturates it
# ONCE with a document-level idf:
#
#     tf~(t,d)  = sum_f  w_f * tf_{t,f,d} / (1 - b_f + b_f * fdl/avgfdl_f)
#     score(d)  = sum_t  qf_t * idf_doc(t) * tf~ / (k1 + tf~)
#
# The difference matters: summing saturated per-field scores lets a term
# saturate per field (double-counting hot terms that appear in both title
# and body); true BM25F saturates the combined evidence once.


def build_split_field_tf(docs: DataFrame, title_len: int = 8,
                         doc_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """docs -> (doc_id, field, term, tf, fdl) with field ∈ {title, body}:
    title = the first ``title_len`` tokens, body = the rest — the standard
    structured-document split for a corpus whose records carry no explicit
    title column (a transcript turn's lead-in plays the title role).
    ONE Arrow pass per document (tokenize + split + per-field tf in a
    single UDF — a Column-side slice would re-inline the tokenizer per
    reference); the explode is JVM-side, no aggregation shuffle."""
    from searchengine_spark.functions.tokenize import split_field_postings_udf

    fwd = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(
            split_field_postings_udf(F.col(text_col), F.lit(title_len))
        ).alias("p"),
    )
    return fwd.select(
        "doc_id", F.col("p.field").alias("field"),
        F.col("p.term").alias("term"),
        F.col("p.tf").cast("long").alias("tf"),
        F.col("p.fdl").cast("long").alias("fdl"),
    )


def bm25f_topk(
    docs: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    query: str,
    k: int = 10,
    title_len: int = 8,
    weights: dict[str, float] | None = None,
    b_per_field: dict[str, float] | None = None,
    k1: float = 1.2,
) -> DataFrame:
    """True BM25F top-k -> (doc_id, score), rounded 6dp, rank pinned
    (score desc, doc_id asc).

    ``term_stats`` supplies the DOCUMENT-level df (title ∪ body covers the
    full text, so the ordinary lexicon df is exactly BM25F's document df —
    no second stats build). Plan shape: query-term broadcast semi-join
    prunes the per-field postings, per-field length normalization is
    column arithmetic, the cross-field tf~ accumulation is ONE hash agg on
    (doc_id, term) (map-side combinable), then idf*saturation and the
    final per-doc agg. avgfdl_f is computed over docs where the field is
    non-empty (a short turn has no body)."""
    ftf = build_split_field_tf(docs, title_len)
    return bm25f_topk_indexed(ftf, term_stats, n_docs, query, k=k,
                              weights=weights, b_per_field=b_per_field,
                              k1=k1)


def field_avg_lengths(field_tf: DataFrame) -> DataFrame:
    """(field, avgfdl) over docs where the field is non-empty — the
    2-row field-statistics table; precompute it alongside a persisted
    field_tf layout so queries skip the distinct-agg."""
    return (
        field_tf.select("doc_id", "field", "fdl").distinct()
        .filter(F.col("fdl") > 0)
        .groupBy("field")
        .agg(F.avg("fdl").alias("avgfdl"))
    )


def bm25f_topk_indexed(
    field_tf: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    query: str,
    k: int = 10,
    weights: dict[str, float] | None = None,
    b_per_field: dict[str, float] | None = None,
    k1: float = 1.2,
    field_scal: DataFrame | None = None,
) -> DataFrame:
    """BM25F over a prebuilt ``build_split_field_tf`` table — the serving
    path: persist the field-split postings once (an index artifact, like
    the positional layout) and every query skips the corpus re-tokenize;
    with the layout partitioned by term the query-term semi-join prunes
    to the query terms' rows. ``field_scal`` (field, avgfdl) can be the
    precomputed 2-row stats table; derived from ``field_tf`` if absent."""
    weights = weights or {"title": 2.0, "body": 1.0}
    b_per_field = b_per_field or {"title": 0.5, "body": 0.75}
    spark = field_tf.sparkSession
    scal = field_scal if field_scal is not None else field_avg_lengths(field_tf)
    qt = query_terms_df(spark, query)
    stats_q = term_stats.join(F.broadcast(qt.select("term")), "term")

    w_map = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    b_map = F.create_map(*[F.lit(x) for kv in b_per_field.items() for x in kv])
    b = F.coalesce(b_map[F.col("field")], F.lit(0.75))
    w = F.coalesce(w_map[F.col("field")], F.lit(1.0))

    wtf_part = w * F.col("tf") / (
        F.lit(1.0) - b + b * F.col("fdl") / F.col("avgfdl")
    )
    wtf = (
        field_tf.join(F.broadcast(qt.select("term")), "term")
        .join(F.broadcast(scal), "field")
        .withColumn("_wp", wtf_part)
        .groupBy("doc_id", "term")
        .agg(F.sum("_wp").alias("wtf"))
    )
    idf = idf_col(F.col("df"), n_docs)
    partial = (
        F.col("qf") * idf * F.col("wtf") / (F.lit(float(k1)) + F.col("wtf"))
    )
    return (
        wtf.join(F.broadcast(qt), "term")
        .join(F.broadcast(stats_q), "term")
        .withColumn("partial", partial)
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def dis_max_topk(
    field_tf: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    query: str,
    k: int = 10,
    tie_breaker: float = 0.0,
    b_per_field: dict[str, float] | None = None,
    k1: float = 1.2,
    field_scal: DataFrame | None = None,
) -> DataFrame:
    """Disjunction-max multi-field retrieval — the ES ``dis_max`` /
    ``multi_match type=best_fields`` analog, the OTHER multi-field
    composition next to BM25F's weighted-sum:

        score(d) = max_f s_f(d) + tie_breaker * (sum_f s_f(d) - max_f)

    where s_f is full BM25 over field f alone (per-field length
    normalization via avgfdl_f, document-level df — the same statistics
    treatment as ``bm25f_topk_indexed``, so the two modes share one
    persisted field-split layout). tie_breaker=0 is pure best-field
    ("a doc whose TITLE matches beats a doc whose body matches twice"),
    1.0 degrades to the plain sum.

    Plan shape: identical to bm25f_topk_indexed until the last agg —
    query-term broadcast semi-join prunes the postings, ONE hash agg to
    per-(doc, field) scores, then a per-doc agg combining max and sum
    (both ride the same shuffle). -> top-k (doc_id, score), rounded 6dp,
    rank pinned (score desc, doc_id asc).
    """
    b_per_field = b_per_field or {"title": 0.5, "body": 0.75}
    spark = field_tf.sparkSession
    scal = field_scal if field_scal is not None else field_avg_lengths(field_tf)
    qt = query_terms_df(spark, query)
    stats_q = term_stats.join(F.broadcast(qt.select("term")), "term")

    b_map = F.create_map(*[F.lit(x) for kv in b_per_field.items() for x in kv])
    b = F.coalesce(b_map[F.col("field")], F.lit(0.75))
    idf = idf_col(F.col("df"), n_docs)
    sat = F.col("tf") * F.lit(float(k1) + 1.0) / (
        F.col("tf")
        + F.lit(float(k1))
        * (F.lit(1.0) - b + b * F.col("fdl") / F.col("avgfdl"))
    )
    per_field = (
        field_tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(stats_q), "term")
        .join(F.broadcast(scal), "field")
        .withColumn("_p", F.col("qf") * idf * sat)
        .groupBy("doc_id", "field")
        .agg(F.sum("_p").alias("s_f"))
    )
    combined = (
        F.max("s_f")
        + F.lit(float(tie_breaker)) * (F.sum("s_f") - F.max("s_f"))
    )
    return (
        per_field.groupBy("doc_id")
        .agg(F.round(combined, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
