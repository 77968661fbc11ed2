"""More-like-this: related-document retrieval seeded by a document.

The Lucene MoreLikeThis analog the reference engine lacks: take a seed
document, extract its e most characteristic terms (tf · ln(N/df) — high
frequency in the doc, rare in the corpus), and run them as a BM25 query,
excluding the seed itself. The serving use is "related results" /
duplicate triage ("show me docs like this flagged one").

Plan shape: the seed's term row fetch is a doc_id point filter on the tf
table (partition-prunable at scale when tf is doc-partitioned); the term
selection is a k-row sort; the query pass is the same broadcast-query
exhaustive plan as topk.score_all. Everything selects on ROUNDED weights
with term/doc tie-breaks (cross-engine reproducible — the DuckDB oracle
runs the identical stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.forward import CorpusScalars
from searchengine_spark.operators.topk import _partial_weight


def seed_terms(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    doc_id: int,
    e: int = 5,
) -> DataFrame:
    """-> (term, w): the seed doc's e highest tf·ln(N/df) terms,
    rounded-then-ranked (w desc, term asc)."""
    idf = F.log(F.lit(float(scalars.n_docs)) / F.col("df"))
    return (
        tf_table.where(F.col("doc_id") == int(doc_id))
        .join(term_stats, "term")
        .select("term", F.round(F.col("tf") * idf, 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(e)
    )


def more_like_this(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    doc_id: int,
    k: int = 10,
    e: int = 5,
) -> DataFrame:
    """Docs most similar to ``doc_id`` -> (doc_id, score), BM25 over the
    seed's characteristic terms (qf=1 each), seed excluded."""
    qt = seed_terms(tf_table, term_stats, scalars, doc_id, e=e).select(
        "term", F.lit(1.0).alias("qf"))
    joined = (
        tf_table.where(F.col("doc_id") != int(doc_id))
        .join(F.broadcast(qt), "term")
        .join(term_stats, "term")
    )
    scored = _partial_weight(joined, scalars, "bm25")
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
