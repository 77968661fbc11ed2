"""Shared pieces: corpus CTEs, BM25 weight, loaders, query helpers.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import duckdb_tokens_sql
from searchengine_spark.operators.forward import (CorpusScalars, build_forward, build_term_stats, explode_forward)


BM25_K1 = 1.2
BM25_B = 0.75

_TOKS_TEXT = duckdb_tokens_sql("text")
_TOKS_QUERY = duckdb_tokens_sql("query")

# Common CTE prefix: tokenized docs, tf, dl, term stats, corpus constants.
BASE_CTES = f"""
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
toks AS (SELECT doc_id, unnest(t) AS term FROM tokd),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, coalesce(len(t), 0)::BIGINT AS dl FROM tokd),
stats AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1),
consts AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
                  (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl)
""".strip()

_BM25_W = (
    "q.qf * ln((c.n - s.df + 0.5) / (s.df + 0.5) + 1.0)"
    f" * (tf.tf * {BM25_K1 + 1.0}) / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / c.avgdl))"
)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "documents")


def _index_parts(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir)
    forward = build_forward(docs)
    tf_table = explode_forward(forward)
    stats = build_term_stats(tf_table)
    scalars = CorpusScalars.compute(forward)
    return docs, forward, tf_table, stats, scalars


def _query_cte(*queries: str) -> str:
    """CTEs turning raw query strings into (query_id, term, qf)."""
    vals = ", ".join(f"({i}, '{q}')" for i, q in enumerate(queries))
    return (
        f"qraw(query_id, query) AS (VALUES {vals}),\n"
        f"qtok AS (SELECT query_id, unnest({_TOKS_QUERY}) AS term FROM qraw),\n"
        "q AS (SELECT query_id, term, count(*)::BIGINT AS qf FROM qtok GROUP BY 1, 2)"
    )


def _doc_segments(spark, sf_dir):
    from searchengine_spark.operators.segments import build_doc_segments

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    segs = build_doc_segments(
        tf_table, stats, scalars.n_docs, scalars.avgdl, n_shards=8
    )
    return segs, tf_table, stats, scalars
