"""Exhaustive (relational) top-k retrieval — the verification-grade scorer.

This is the reference Engine's query path (Engine/Engine/Engine.cs:125-183:
tokenize -> qf-aggregate -> per-term posting fetch -> additive OR-union
accumulate -> rank -> top-1000) re-expressed as one declarative plan:

    query_terms  ⋈broadcast  tf_table  ⋈  term_stats
      -> per-(term,doc) partial weight (column arithmetic, codegen)
      -> groupBy(doc_id).sum(partial)          (hash agg, map-side combine)
      -> orderBy(score desc, doc_id asc).limit(k)
         (Catalyst TakeOrderedAndProject — bounded heap, no global sort)

The WAND-pruned segment path (operators/wand.py) must agree with this plan
exactly; that agreement is an adversarial test.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import (
    LM_MU,
    REFERENCE_POSTING_CAP,
    bm25_weight,
    idf_col,
    lm_dirichlet_partial,
    reference_weight,
)
from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import CorpusScalars


def query_terms_df(spark: SparkSession, query: str) -> DataFrame:
    """query string -> (term, qf) tiny DataFrame (query-side tokenization uses
    the SAME tokenizer as indexing — documented fix of the reference's
    asymmetric query split, Engine.cs:127)."""
    qf = Counter(tokenize_py(query))
    rows = [(t, int(c)) for t, c in sorted(qf.items())]
    return spark.createDataFrame(rows or [("", 0)], "term string, qf int").filter(
        F.col("qf") > 0
    )


def _partial_weight(joined: DataFrame, scalars: CorpusScalars, mode: str) -> DataFrame:
    """Attach the per-(term, doc) partial score column ``partial``."""
    if mode == "bm25":
        idf = idf_col(F.col("df"), scalars.n_docs)
        w = bm25_weight(F.col("tf"), F.col("dl"), idf, scalars.avgdl)
    elif mode == "reference":
        w = reference_weight(F.col("tf"), F.col("cf"), scalars.n_docs)
    else:
        raise ValueError(f"unknown scorer mode {mode!r}")
    return joined.withColumn("partial", w * F.col("qf"))


def _cap_postings(joined: DataFrame, cap: int) -> DataFrame:
    """Reference semantics: per term, keep only the ``cap`` highest-tf
    postings (tie-break doc_id asc) before scoring (Engine.cs:185,193)."""
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def score_all(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Single-query exhaustive scoring, NO limit -> (doc_id, score) for every
    matching doc. Callers choose precision/ordering (full precision for
    oracle rank-identity; rounded-then-ranked for cross-engine hashing)."""
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    return score_all_terms(tf_table, term_stats, scalars, qt,
                           mode=mode, posting_cap=posting_cap)


def score_all_terms(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    terms_df: DataFrame,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Exhaustive scoring against an explicit (term, qf) weight table
    instead of a raw query string — the shared engine under query-
    rewrite retrieval (prefix/wildcard expansion, fuzzy expansion, PRF):
    the rewriter produces a tiny weighted term set, this broadcasts it
    against the postings and OR-union accumulates exactly like
    ``score_all``. ``qf`` may be fractional (expansion weights)."""
    joined = (
        tf_table.join(F.broadcast(terms_df.select("term", "qf")), "term")
        .join(term_stats, "term")
    )
    if mode == "reference":
        joined = _cap_postings(joined, posting_cap or REFERENCE_POSTING_CAP)
    scored = _partial_weight(joined, scalars, mode)
    return scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))


def score_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Single-query exhaustive top-k -> (doc_id, score), rank order pinned
    (score desc, doc_id asc)."""
    return (
        score_all(tf_table, term_stats, scalars, query, mode, posting_cap)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def batch_topk(
    queries: DataFrame,
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Many queries at once: queries(query_id, query) ->
    (query_id, rank, doc_id, score). One shuffle per stage for ALL queries —
    the throughput path for the bench harness."""
    from searchengine_spark.functions.tokenize import tokenize_udf

    qterms = (
        queries.select("query_id", F.explode(tokenize_udf(F.col("query"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qf"))
    )
    joined = tf_table.join(F.broadcast(qterms), "term").join(term_stats, "term")
    scored = _partial_weight(joined, scalars, mode)
    per_doc = scored.groupBy("query_id", "doc_id").agg(F.sum("partial").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def attach_doc_meta(topk: DataFrame, doc_map: DataFrame) -> DataFrame:
    """Join ranked docs back to (conv_id, turn_idx, role, ts) — broadcast of
    the k-row side, re-sorted after the join (join-after-limit ordering)."""
    meta = doc_map.select("doc_id", "conv_id", "turn_idx", "role", "ts")
    return (
        meta.join(F.broadcast(topk), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def lm_dirichlet_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
    mu: float = LM_MU,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing — the second
    classical probabilistic scorer next to BM25 (Zhai & Lafferty 2001,
    rank-equivalent sparse form; see functions/scoring.py
    lm_dirichlet_partial). Same one-broadcast-one-hash-agg plan as
    ``score_all``: the per-doc addend |q|*ln(mu/(dl+mu)) rides the SAME
    aggregate (dl is functionally dependent on doc_id, carried as
    max(dl)) — no second join against the forward index. Candidate set =
    docs matching >= 1 query term (OR semantics), identical to BM25.
    |q| counts IN-VOCAB query tokens only: an out-of-vocabulary term has
    p(t|C) = 0, where the full likelihood is degenerate, so OOV tokens
    are dropped on both sides of the rank equivalence (one |q|-row
    lexicon lookup — the same cost class as every scorer's stats join).
    -> top-k (doc_id, score), rounded 6dp, rank pinned
    (score desc, doc_id asc)."""
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    q_len = (
        qt.join(term_stats.select("term"), "term")
        .agg(F.sum("qf")).collect()[0][0]
    ) or 0
    joined = (
        tf_table.join(F.broadcast(qt), "term")
        .join(term_stats, "term")
    )
    partial = F.col("qf") * lm_dirichlet_partial(
        F.col("tf"), F.col("cf"), scalars.sum_dl, mu
    )
    per_doc = (
        joined.withColumn("partial", partial)
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("_s"), F.max("dl").alias("_dl"))
    )
    doc_term = F.lit(float(q_len)) * F.log(
        F.lit(float(mu)) / (F.col("_dl") + F.lit(float(mu)))
    )
    return (
        per_doc.select(
            "doc_id", F.round(F.col("_s") + doc_term, 6).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def decay_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    doc_ts: DataFrame,
    query: str,
    now_s: float,
    half_life_s: float,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Recency-decayed retrieval (Elasticsearch function_score exp-decay
    analog): final = bm25 * 2^(-(now - ts_s)/half_life). ``doc_ts`` is
    (doc_id, ts_s double, epoch seconds) — for transcripts that's the
    doc_map's ts column, so no extra table exists at scale; the decay
    join touches only the CANDIDATE docs (post-agg, matched >= 1 term),
    not the corpus, and at 100 TB both sides bucket by doc_id so it's a
    co-located hash join. Docs missing from ``doc_ts`` are treated as
    infinitely old (decay 0) but kept, so the operator never silently
    drops a relevance hit. -> top-k (doc_id, score) rounded, rank pinned."""
    allsc = score_all(tf_table, term_stats, scalars, query, mode)
    joined = allsc.join(doc_ts.select("doc_id", "ts_s"), "doc_id", "left")
    decay = F.when(
        F.col("ts_s").isNull(), F.lit(0.0)
    ).otherwise(
        F.pow(F.lit(2.0),
              -(F.lit(float(now_s)) - F.col("ts_s")) / F.lit(float(half_life_s)))
    )
    return (
        joined.select(
            "doc_id", F.round(F.col("score") * decay, 6).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def filtered_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    allowed_docs: DataFrame,
    query: str,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Metadata-filtered retrieval (Lucene filtered-query analog): rank
    only docs in ``allowed_docs`` (a doc_id frame, typically a pushed-down
    predicate over the doc store — lang = 'en', a ts range, role =
    'user'). The filter is a LEFT SEMI join applied to the postings
    BEFORE scoring, so filtered-out docs never enter the aggregate; at
    100 TB both sides are bucketed by doc_id so the semi join co-locates.
    Corpus statistics stay GLOBAL (standard filtered-search semantics —
    idf/avgdl describe the corpus, the filter restricts the result set).
    -> top-k (doc_id, score) rounded 6dp, rank pinned."""
    tf = tf_table.join(allowed_docs.select("doc_id"), "doc_id", "left_semi")
    allsc = score_all(tf, term_stats, scalars, query, mode)
    return (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def match_count(
    tf_table: DataFrame,
    query: str,
    require_all: bool = False,
) -> DataFrame:
    """Total-hit counting without ranking (Lucene TotalHitCountCollector):
    one row (n_hits long). ``require_all=False`` counts docs matching ANY
    query term (OR semantics — the candidate-set size every top-k here
    ranks over); ``require_all=True`` counts docs containing EVERY
    distinct query term (AND semantics). Plan: broadcast the query terms,
    one distinct/grouped agg over the matched postings — no scoring, no
    sort, no window."""
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    n_terms = qt.count()
    matched = tf_table.join(F.broadcast(qt.select("term")), "term")
    if require_all:
        per_doc = matched.groupBy("doc_id").agg(
            F.countDistinct("term").alias("_nt"))
        hits = per_doc.filter(F.col("_nt") == n_terms)
        out = hits.agg(F.count("*").cast("long").alias("n_hits"))
    else:
        out = matched.agg(
            F.countDistinct("doc_id").cast("long").alias("n_hits"))
    return out


def msm_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    min_should_match: int = 2,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Minimum-should-match retrieval (the Elasticsearch/Lucene
    ``minimum_should_match`` knob): BM25 top-k over only the docs that
    match at least ``min_should_match`` DISTINCT query terms — the
    precision dial between OR (=1) and AND (=n) semantics that long
    queries need (an OR-union over 8 terms ranks one-term fluke matches;
    AND over 8 terms misses everything). Generalizes boolquery's '+'
    operator from per-term to count-based.

    Plan: the matched-term count rides the SAME hash aggregate as the
    score accumulation (one extra agg column, zero extra shuffles). It is
    a plain ``count(*)``, NOT ``countDistinct`` — (doc_id, term) is
    already unique in the tf relation and the query side pre-aggregates
    duplicate terms into qf, so distinct would only buy Spark's
    expand/double-aggregate plan for nothing. A doc's partials never
    survive to the sort unless it qualifies. ``min_should_match`` is
    clamped to the query's distinct term count (ES semantics: msm > n
    would match nothing useful).
    Output: (doc_id, n_matched, score) rounded 6dp, rank pinned
    (score desc, doc_id asc).
    """
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    n_terms = qt.count()
    m = max(1, min(int(min_should_match), n_terms))
    joined = (
        tf_table.join(F.broadcast(qt), "term")
        .join(term_stats, "term")
    )
    scored = _partial_weight(joined, scalars, mode)
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.round(F.sum("partial"), 6).alias("score"),
    )
    return (
        per_doc.filter(F.col("n_matched") >= m)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def explain_score(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    doc_id: int,
    mode: str = "bm25",
) -> DataFrame:
    """Score explanation for ONE document (the Elasticsearch ``_explain``
    / Lucene Explanation analog): the per-term breakdown of how the doc's
    score arises — (term, qf, tf, df, dl, partial), partial summing to
    exactly the score every top-k here reports. The relevance-debugging
    surface: "why did this turn rank".

    Plan: the doc_id filter lands BEFORE the query-term join, so the scan
    prunes to one document's postings (predicate pushdown to the tf
    source); everything after is a handful of rows. Output ordered
    (partial desc, term asc), 6dp.
    """
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    joined = (
        tf_table.filter(F.col("doc_id") == int(doc_id))
        .join(F.broadcast(qt), "term")
        .join(term_stats, "term")
    )
    scored = _partial_weight(joined, scalars, mode)
    return (
        scored.select(
            "term",
            F.col("qf").cast("long").alias("qf"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("dl").cast("long").alias("dl"),
            F.round("partial", 6).alias("partial"),
        )
        .orderBy(F.desc("partial"), F.asc("term"))
    )


def score_topk_after(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    after_score: float,
    after_doc: int,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Cursor pagination (search-after): the next ``k`` results strictly
    after the cursor ``(after_score, after_doc)`` in the engine-wide
    (score desc, doc_id asc) order. The cursor PREDICATE replaces the
    OFFSET scan — at depth d an offset plan materializes d+k rows per
    partition, while the cursor filter prunes before the bounded heap,
    the standard deep-pagination shape (Elasticsearch search_after).
    Scores compare ROUNDED (6dp), matching the rank order every other
    entry pins — a cursor taken from page N reproduces page N+1 exactly.
    """
    allsc = score_all(tf_table, term_stats, scalars, query, mode)
    rounded = allsc.select(
        "doc_id", F.round("score", 6).alias("score"))
    after = rounded.where(
        (F.col("score") < float(after_score))
        | ((F.col("score") == float(after_score))
           & (F.col("doc_id") > int(after_doc)))
    )
    return after.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def function_score_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    doc_attr: DataFrame,
    query: str,
    attr: str,
    factor: float = 1.0,
    modifier: str = "log1p",
    missing: float = 0.0,
    boost_mode: str = "multiply",
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Field-value-factor scoring — the ES ``function_score`` /
    ``field_value_factor`` analog: fold a numeric document attribute
    (popularity, vote count, freshness rank …) into the relevance score:

        final = score OP modifier(factor * attr)
        OP       ∈ {multiply, sum}          (ES boost_mode)
        modifier ∈ {none, log1p, sqrt}      (the common ES modifiers)

    The recency special-case is ``decay_topk``; this is the general
    static-signal form. ``doc_attr`` is (doc_id, <attr>); like decay, the
    attribute join touches only the CANDIDATE docs (post-agg, matched >=
    1 term), never the corpus, and at 100 TB both sides bucket by doc_id
    so it is a co-located hash join. Docs absent from ``doc_attr`` get
    ``missing`` (ES's ``missing`` param) rather than being dropped.
    -> top-k (doc_id, score) rounded 6dp, rank pinned."""
    allsc = score_all(tf_table, term_stats, scalars, query, mode)
    joined = allsc.join(doc_attr.select("doc_id", attr), "doc_id", "left")
    v = F.coalesce(F.col(attr).cast("double"), F.lit(float(missing))) \
        * F.lit(float(factor))
    if modifier == "log1p":
        fv = F.log(F.lit(1.0) + v)
    elif modifier == "sqrt":
        fv = F.sqrt(v)
    elif modifier == "none":
        fv = v
    else:
        raise ValueError(f"unknown modifier {modifier!r}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    final = (F.col("score") * fv if boost_mode == "multiply"
             else F.col("score") + fv)
    return (
        joined.select("doc_id", F.round(final, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def rescore_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    rescorer: str = "lm",
    mu: float = LM_MU,
) -> DataFrame:
    """Two-pass retrieval — the ES ``rescore`` API analog: rank the
    corpus with the cheap primary scorer (BM25), then re-rank only the
    top-``window`` candidates with an expensive secondary scorer and
    combine:

        final = query_weight * bm25 + rescore_weight * secondary

    ``rescorer="lm"`` uses the Dirichlet query likelihood (the classic
    probabilistic second opinion). The scale contract is the point: the
    secondary scorer runs over a WINDOW-row candidate set (broadcast
    semi-join onto the postings), never the corpus — at 10^12 turns the
    second pass costs a k-row join regardless of corpus size, which is
    why ES exposes rescore as a separate phase instead of a composed
    query. Ranks pinned (rounded final desc, doc_id asc); candidates
    outside the window keep their BM25 order below the rescored block
    (ES semantics: rescore reorders only the window) — k <= window is
    enforced so the unrescored tail never leaks into the result.
    -> top-k (doc_id, score), rounded 6dp."""
    if k > window:
        raise ValueError("k must be <= window (rescore reorders only "
                         "the window)")
    primary = (
        score_all(tf_table, term_stats, scalars, query, "bm25")
        .select("doc_id", F.round("score", 6).alias("_bm25"))
        .orderBy(F.desc("_bm25"), F.asc("doc_id"))
        .limit(window)
    )
    cand_tf = tf_table.join(F.broadcast(primary.select("doc_id")), "doc_id")
    secondary = lm_dirichlet_topk(
        cand_tf, term_stats, scalars, query, k=window, mu=mu
    ).select("doc_id", F.col("score").alias("_lm"))
    combined = (
        primary.join(F.broadcast(secondary), "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(float(query_weight)) * F.col("_bm25")
                + F.lit(float(rescore_weight)) * F.coalesce(F.col("_lm"),
                                                            F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )
    return (
        combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )
