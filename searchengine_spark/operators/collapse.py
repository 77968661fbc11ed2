"""Field collapsing — grouped top-k retrieval.

The reference ranks flat turn/doc lists only (Engine.cs:125-183); real
search over transcripts needs conversation-level results ("show me the
best CONVERSATIONS, one row each, with their best turn"), and training-
data curation needs the same shape per source/site/shard. This is
Lucene's collapse / Elasticsearch's ``collapse`` + ``inner_hits``
re-expressed relationally:

    scored turns (any scorer)  ⋈  (doc_id -> group)
      -> groupBy(group).agg(max/sum score, argmax doc, count)
      -> top-k groups

Scale shape: the exact path below aggregates the MATCHING set (postings-
bounded, not corpus-bounded) with one hash agg — map-side combine means
the shuffle carries one row per (group, partition), not per doc. The
serving path (engine.search_convs) instead over-fetches turn-level top-N
via WAND and collapses N rows on the driver-side plan — approximate
under heavy per-group concentration but O(N) cheap; this operator is the
exact verification-grade twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.forward import CorpusScalars
from searchengine_spark.operators.topk import score_all


def collapse_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    doc_groups: DataFrame,
    query: str,
    k: int = 10,
    agg: str = "max",
) -> DataFrame:
    """Exact grouped top-k -> (group, group_score, best_doc_id,
    n_matching), ordered (group_score desc, group asc), limit k.

    ``doc_groups``: (doc_id, group) mapping — conv_id, source, domain…
    ``agg``: "max" = best-turn ranking, "sum" = evidence accumulation.
    Per-doc scores are rounded to 6dp BEFORE grouping so the group agg
    and the argmax tie-break (best doc = highest rounded score, then
    lowest doc_id) are reproducible cross-engine.
    """
    if agg not in ("max", "sum"):
        raise ValueError(f"unknown collapse agg {agg!r}")
    scored = (
        score_all(tf_table, term_stats, scalars, query)
        .select("doc_id", F.round("score", 6).alias("score"))
    )
    joined = scored.join(doc_groups.select("doc_id", "group"), "doc_id")
    group_score = (F.max("score") if agg == "max" else
                   F.round(F.sum("score"), 6)).alias("group_score")
    # argmax via struct max: (score asc-comparable, -doc_id) so the max
    # struct is (highest score, lowest doc_id)
    best = F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("nd")))
    return (
        joined.groupBy("group")
        .agg(group_score,
             best.alias("_best"),
             F.count("*").cast("long").alias("n_matching"))
        .select("group", "group_score",
                (-F.col("_best.nd")).cast("long").alias("best_doc_id"),
                "n_matching")
        .orderBy(F.desc("group_score"), F.asc("group"))
        .limit(k)
    )
