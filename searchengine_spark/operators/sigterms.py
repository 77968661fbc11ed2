"""Significant-terms aggregation over a search hit set.

The Elasticsearch ``significant_terms`` analog: given a foreground doc set
(a query's hits), surface the terms that are *unusually frequent there*
relative to the whole corpus — "what is this result set about". Scored
with ES's default JLH heuristic::

    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)

where ``fg_pct = fg_df / |hits|`` (share of foreground docs containing the
term) and ``bg_pct = df / N`` (share of the whole corpus). The first factor
rewards absolute lift, the second relative lift; both must be positive for
a term to matter.

Scale shape (100 TB): the foreground is a *k-row* hit set — broadcast it
into the postings semi-join, so the only corpus-sized input is one
already-built tf relation, pruned to the hit docs by a broadcast hash join
(no shuffle). The per-term foreground counts that come out are at most
|distinct terms in k docs| rows — broadcast THEM into the vocabulary-sized
``term_stats`` join, so the big side never moves either. One tiny agg, two
broadcast joins, zero wide shuffles.

Reference parity: the reference engine has no analytics aggregations — this
is part of the serving surface a user of a modern fulltext engine expects
next to facets (engine.py ``search_facets``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def significant_terms(
    tf_table: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    hits: DataFrame,
    fg_size: int | None = None,
    n_top: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """Top ``n_top`` JLH-significant terms of the ``hits`` doc set.

    ``hits``: small (doc_id) DataFrame — a top-k result set. ``fg_size``
    is its row count; passed explicitly when the caller already knows it
    (engine serving path), counted once here otherwise. Terms must appear
    in at least ``min_doc_count`` foreground docs (ES's noise floor;
    default 2 — a 1-doc term is that doc's vocabulary, not the set's).

    Output: (term, fg_df, df, score), score rounded to 6dp and ranked
    (score desc, term asc) for cross-engine determinism.
    """
    if fg_size is None:
        fg_size = hits.count()
    if fg_size <= 0:
        spark = tf_table.sparkSession
        return spark.createDataFrame(
            [], "term string, fg_df long, df long, score double")

    fg = (
        tf_table.join(F.broadcast(hits.select("doc_id")), "doc_id")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fg_df"))
        .filter(F.col("fg_df") >= min_doc_count)
    )
    fg_pct = F.col("fg_df").cast("double") / F.lit(float(fg_size))
    bg_pct = F.col("df").cast("double") / F.lit(float(n_docs))
    return (
        term_stats.join(F.broadcast(fg), "term")
        .select(
            "term",
            "fg_df",
            "df",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(n_top)
    )
