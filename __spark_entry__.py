"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All pair definitions live in ``searchengine_spark.entry_queries``; the
engine itself is the ``searchengine_spark`` package (see SURVEY.md §2/§7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus with doc
    metadata attached — the full index build + query path end-to-end."""
    from pyspark.sql import functions as F

    from searchengine_spark.entry_queries import _bm25_topk, _docs

    sf_dir = "/root/testdata/sf0.001"
    topk = _bm25_topk("spark join fast table", 10)(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    return (
        topk.join(F.broadcast(docs), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "lang", "source", "n_chars")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-pipeline operators: dedup, similarity, text analysis,
    multimodal plumbing)."""
    from searchengine_spark.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles — one per query above (full value-hash coverage)."""
    from searchengine_spark.entry_queries import all_oracle_sql

    return all_oracle_sql()
