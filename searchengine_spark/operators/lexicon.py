"""Lexicon-side query assistance: prefix autocomplete and
did-you-mean spelling suggestion.

The reference engine serves raw queries only (Engine.cs Search splits
and looks terms up; a typo'd term simply contributes nothing,
Engine.cs:127-137). A usable engine suggests: both operators run over
the TERM DICTIONARY (one row per distinct term — at 10^12 turns still
only 10^7-10^8 rows, the smallest table in the system), never over
postings or documents.

Scale shape:
- ``suggest_prefix``: a `startswith` filter compiles to
  `StartsWith`/`LIKE 'p%'` — at cluster scale the lexicon is stored
  sorted by term, so the filter prunes row groups via parquet min/max
  (a prefix is a contiguous term range); df-ranked top-k via
  TakeOrderedAndProject.
- ``did_you_mean``: `levenshtein(term, q) <= max_dist` over the
  lexicon with a length pre-filter (|len-len(q)| <= max_dist — a
  cheap pushed-down predicate that skips most of the dictionary before
  the O(len^2) edit-distance runs); ranked by (distance asc, df desc).
  Both stay entirely in whole-stage codegen (built-in levenshtein).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.forward import CorpusScalars


def suggest_prefix(term_stats: DataFrame, prefix: str,
                   k: int = 10) -> DataFrame:
    """Top-``k`` lexicon terms starting with ``prefix``, by df desc
    (term asc tie-break) — autocomplete."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def did_you_mean(term_stats: DataFrame, query_term: str, k: int = 5,
                 max_dist: int = 2) -> DataFrame:
    """Closest lexicon terms within ``max_dist`` edits of
    ``query_term``, ranked (distance asc, df desc, term asc). The
    query term itself is excluded — these are corrections."""
    q = query_term.lower()
    pre = F.abs(F.length("term") - F.lit(len(q))) <= max_dist
    d = F.levenshtein("term", F.lit(q))
    return (
        term_stats.filter(pre)
        .withColumn("dist", d.cast("long"))
        .filter((F.col("dist") <= max_dist) & (F.col("term") != q))
        .select("term", "dist", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


# -- query-rewrite retrieval -------------------------------------------------
#
# The reference has no wildcard or fuzzy matching (a typo'd term contributes
# nothing, Engine.cs:127-137). These are the Lucene-style rewrite queries:
# expand against the dictionary first (tiny), then score the expansion as a
# weighted OR-union — the scoring plan is score_all_terms (broadcast the
# expansion, one postings join, hash-agg accumulate), so a rewrite query
# costs the same as an n_expand-term BM25 query, never a corpus scan.


def expand_prefix_terms(term_stats: DataFrame, prefix: str,
                        n_expand: int = 5) -> DataFrame:
    """-> (term, qf=1.0): the ``n_expand`` highest-df dictionary terms
    starting with ``prefix`` (ties term asc) — the wildcard-rewrite set.
    Bounding the expansion is load-bearing at scale: `a*` over a 10^8-term
    dictionary must not become a 10^6-term disjunction (Lucene's
    max_expansions has the same job)."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n_expand)
        .select("term", F.lit(1.0).alias("qf"))
    )


def expand_fuzzy_terms(term_stats: DataFrame, query_term: str,
                       max_dist: int = 1, n_expand: int = 3) -> DataFrame:
    """-> (term, qf=1/(1+dist)): dictionary terms within ``max_dist``
    edits of ``query_term`` (the exact term INCLUDED at qf=1), ranked
    (dist asc, df desc, term asc), capped at ``n_expand``. The length
    pre-filter (|len(term) - len(q)| <= max_dist) is a cheap pushed-down
    predicate that skips most of the dictionary before the O(len^2)
    levenshtein runs; both stay in whole-stage codegen."""
    q = query_term.lower()
    pre = F.abs(F.length("term") - F.lit(len(q))) <= max_dist
    dist = F.levenshtein("term", F.lit(q))
    return (
        term_stats.filter(pre)
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(n_expand)
        .select("term", (F.lit(1.0) / (F.lit(1.0) + F.col("dist"))).alias("qf"))
    )


def prefix_search_topk(tf_table: DataFrame, term_stats: DataFrame,
                       scalars: CorpusScalars, prefix: str, k: int = 10,
                       n_expand: int = 5) -> DataFrame:
    """Wildcard query `prefix*`: expand against the dictionary, BM25 the
    expansion as an OR-union with unit weights -> top-k
    (doc_id, score) rounded for cross-engine hashing, rank pinned
    (score desc, doc_id asc)."""
    from searchengine_spark.operators.topk import score_all_terms

    exp = expand_prefix_terms(term_stats, prefix, n_expand)
    allsc = score_all_terms(tf_table, term_stats, scalars, exp)
    return (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def fuzzy_search_topk(tf_table: DataFrame, term_stats: DataFrame,
                      scalars: CorpusScalars, query_term: str, k: int = 10,
                      max_dist: int = 1, n_expand: int = 3) -> DataFrame:
    """Fuzzy query `term~max_dist`: edit-distance expansion weighted
    1/(1+dist), BM25 OR-union -> top-k (doc_id, score), rank pinned
    (score desc, doc_id asc)."""
    from searchengine_spark.operators.topk import score_all_terms

    exp = expand_fuzzy_terms(term_stats, query_term, max_dist, n_expand)
    allsc = score_all_terms(tf_table, term_stats, scalars, exp)
    return (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def expand_regex_terms(term_stats: DataFrame, pattern: str,
                       n_expand: int = 5) -> DataFrame:
    """-> (term, qf=1.0): the ``n_expand`` highest-df dictionary terms
    matching ``pattern`` (partial-match semantics, like Java find() /
    DuckDB regexp_matches), ties term asc. Same bounded-rewrite contract
    as the prefix expansion; unlike a prefix, a regex can't prune the
    dictionary scan by term range — it's a full pass over the (small)
    dictionary, which is exactly Lucene's RegexpQuery cost model too."""
    return (
        term_stats.filter(F.col("term").rlike(pattern))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n_expand)
        .select("term", F.lit(1.0).alias("qf"))
    )


def regex_search_topk(tf_table: DataFrame, term_stats: DataFrame,
                      scalars: CorpusScalars, pattern: str, k: int = 10,
                      n_expand: int = 5) -> DataFrame:
    """Regex query: dictionary expansion scored as a unit-weight BM25
    OR-union -> top-k (doc_id, score), rank pinned."""
    from searchengine_spark.operators.topk import score_all_terms

    exp = expand_regex_terms(term_stats, pattern, n_expand)
    allsc = score_all_terms(tf_table, term_stats, scalars, exp)
    return (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def expand_synonym_terms(query_terms: DataFrame,
                         synonyms: DataFrame) -> DataFrame:
    """(term, qf) query weights + (term, syn, weight) synonym table ->
    (term, qf double): originals at full weight UNION the weighted
    synonym rows, SUMMED per term (a term reachable both directly and
    through a synonym accumulates, Lucene SynonymQuery-with-boosts
    semantics). The synonym table is a curated artifact (thousands of
    rows at most) — broadcast; the expansion itself is O(|q| * fanout)
    rows, so downstream cost is that of a slightly longer query, never
    a corpus-side blowup."""
    syn_rows = (
        query_terms.join(F.broadcast(synonyms), "term")
        .select(F.col("syn").alias("term"),
                (F.col("qf") * F.col("weight")).alias("qf"))
    )
    direct = query_terms.select(
        "term", F.col("qf").cast("double").alias("qf"))
    return (
        direct.unionByName(syn_rows)
        .groupBy("term")
        .agg(F.sum("qf").alias("qf"))
    )


def synonym_search_topk(tf_table: DataFrame, term_stats: DataFrame,
                        scalars: CorpusScalars, query: str,
                        synonyms: DataFrame, k: int = 10) -> DataFrame:
    """Query-time synonym expansion: tokenize -> expand against the
    synonym table -> weighted BM25 OR-union -> top-k (doc_id, score),
    rounded, rank pinned. A document matching ONLY a synonym of a query
    term is retrievable (at the synonym's damped weight); exact matches
    keep full weight. Same score_all_terms plan as every other rewrite
    query — one broadcast, one postings join, one hash agg."""
    from searchengine_spark.operators.topk import query_terms_df, score_all_terms

    qt = query_terms_df(tf_table.sparkSession, query)
    exp = expand_synonym_terms(qt, synonyms)
    allsc = score_all_terms(tf_table, term_stats, scalars, exp)
    return (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
