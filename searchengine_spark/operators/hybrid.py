"""Hybrid retrieval: reciprocal-rank fusion (RRF) of lexical and dense
rankings.

The reference engine is lexical-only (BM25 over an inverted index,
``/root/reference/Engine/Engine/Engine.cs:146-190``); a modern training-data
/ search pipeline pairs that with a dense (embedding) retriever and fuses
the two rankings. RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is the
standard score-free fusion: ``rrf(d) = sum_r 1 / (c + rank_r(d))`` over the
rankings ``r`` that contain ``d``.

Scale shape: each input ranking is already a top-k (k rows, driver-small —
the expensive work happened inside the lexical WAND / ANN operators). The
fusion below is a union + one hash agg over O(sum of k) rows, so at 100 TB
it costs nothing beyond the retrievers themselves; no broadcast of anything
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # the constant from the RRF paper; callers may override


def with_rank(topk: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """(id, score) -> (id, rank) with the engine-wide deterministic
    tie-break (score desc, id asc). Input is a top-k (small); the single-
    partition window is intentional and bounded by k."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return topk.select(
        F.col(id_col).alias("_id"),
        F.row_number().over(w).alias("_rank"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse ranked lists into (doc_id, rrf_score, n_lists) top-k.

    Each input must already carry ``(_id, _rank)`` (see ``with_rank``).
    Union + one aggregation — documents missing from a list simply
    contribute nothing for it (the standard RRF convention).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    u = rankings[0]
    for r in rankings[1:]:
        u = u.unionByName(r)
    fused = (
        u.groupBy("_id")
        .agg(
            F.round(F.sum(1.0 / (F.lit(float(c)) + F.col("_rank"))), 6)
            .alias("rrf_score"),
            F.count("*").cast("long").alias("n_lists"),
        )
        .select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
    )
