"""Facet aggregations: counts, ranges, histogram, stats, top-hits, percentiles.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.topk import score_all
from searchengine_spark.entry._shared import (_docs, _index_parts)
from searchengine_spark.entry.core import (_bm25_topk_sql)
from searchengine_spark.entry.retrieval import (_DECAY_BASE)


_FACET_QUERY = "spark join fast"
_FACET_K = 100


def q_facet_counts(spark, sf_dir, query: str = _FACET_QUERY,
                   field: str = "source", k: int = _FACET_K):
    """Facet counts over the top-k result set — the serving-path facet agg
    (engine.py Engine.search_facets / serve.py ``/facets``): run the
    query, join the k-row hit set onto the doc store, count per value of
    ``field``. Same composition as the engine (broadcast k-row hits, the
    search does the heavy lifting), with the exhaustive scorer standing
    in for the loaded index so the gate needs no persisted segments."""
    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    hits = (
        score_all(tf_table, stats, scalars, query, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id")
    )
    return (
        docs.join(F.broadcast(hits), "doc_id")
        .groupBy(F.col(field).alias("value"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
    )


def _facet_counts_sql(query: str = _FACET_QUERY, field: str = "source",
                      k: int = _FACET_K) -> str:
    return f"""WITH top AS (
  SELECT doc_id FROM ({_bm25_topk_sql(query, k)})
)
SELECT d.{field} AS value, count(*)::BIGINT AS n
FROM documents d JOIN top USING (doc_id)
GROUP BY 1 ORDER BY n DESC, value ASC"""


# -- round-3: query rewrite, field collapse, diversification, curation -----


_HIST_INTERVAL = 3600.0


def q_facet_histogram(spark, sf_dir):
    """Date-histogram facet over the top-100 hit set
    (operators/facets.py — the ES date_histogram analog): hourly bucket
    counts of the hits' timestamps. The documents proxy carries no ts,
    so the gate derives the same deterministic one as decay_topk
    (base + (doc_id % 10000) * 60 s) on BOTH engines; transcripts use
    the doc_map ts (engine.facet_histogram)."""
    from searchengine_spark.operators.facets import facet_histogram

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    hits = (
        score_all(tf_table, stats, scalars, _FACET_QUERY, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_FACET_K)
        .select("doc_id")
    )
    doc_ts = docs.select(
        "doc_id",
        (F.lit(float(_DECAY_BASE))
         + (F.col("doc_id") % 10000).cast("double") * F.lit(60.0)).alias("ts_s"),
    )
    return facet_histogram(hits, doc_ts, _HIST_INTERVAL)


def _facet_histogram_sql(query: str = _FACET_QUERY, k: int = _FACET_K,
                         interval: float = _HIST_INTERVAL) -> str:
    return f"""WITH top AS (
  SELECT doc_id FROM ({_bm25_topk_sql(query, k)})
),
ts AS (SELECT doc_id,
              ({float(_DECAY_BASE)} + (doc_id % 10000) * 60.0) AS ts_s
       FROM documents)
SELECT floor(ts_s / {interval})::BIGINT AS bucket,
       floor(ts_s / {interval}) * {interval} AS bucket_start,
       count(*)::BIGINT AS n
FROM ts JOIN top USING (doc_id)
GROUP BY 1, 2 ORDER BY bucket ASC"""


_RANGE_BUCKETS = [
    ("short", None, 200.0),
    ("mid", 200.0, 400.0),
    ("long", 300.0, None),
    ("huge", 100000.0, None),
]


def q_facet_ranges(spark, sf_dir, query: str = _FACET_QUERY,
                   k: int = _FACET_K):
    """Explicit range facet over the top-k hit set (operators/facets.py
    facet_ranges — the ES range-aggregation analog): per-range counts of
    the hits' n_chars, overlapping ranges double-count (ES semantics),
    empty ranges emitted at 0. One broadcast join + one agg."""
    from searchengine_spark.operators.facets import facet_ranges

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    hits = (
        score_all(tf_table, stats, scalars, query, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id")
    )
    return facet_ranges(hits, docs.select("doc_id", "n_chars"),
                        _RANGE_BUCKETS)


def _facet_ranges_sql(query: str = _FACET_QUERY, k: int = _FACET_K) -> str:
    vals = ", ".join(
        f"('{key}', "
        f"{'CAST(NULL AS DOUBLE)' if lo is None else float(lo)}, "
        f"{'CAST(NULL AS DOUBLE)' if hi is None else float(hi)})"
        for key, lo, hi in _RANGE_BUCKETS
    )
    return f"""WITH top AS (
  SELECT doc_id FROM ({_bm25_topk_sql(query, k)})
),
j AS (SELECT d.n_chars::DOUBLE AS v FROM documents d JOIN top USING (doc_id)),
r(key, range_from, range_to) AS (VALUES {vals})
SELECT r.key, r.range_from, r.range_to,
       (SELECT count(*) FROM j
        WHERE (r.range_from IS NULL OR j.v >= r.range_from)
          AND (r.range_to IS NULL OR j.v < r.range_to))::BIGINT AS n
FROM r"""


# -- round-3b: analyzers, substring search, term vectors --------------------


def _facet_hits(spark, sf_dir, query: str = _FACET_QUERY, k: int = _FACET_K,
                scored: bool = False):
    """Shared top-k hit set for the facet family: rounded-then-ranked
    (the cross-engine hashing discipline)."""
    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    hits = (
        score_all(tf_table, stats, scalars, query, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return hits if scored else hits.select("doc_id")


def q_facet_stats(spark, sf_dir):
    """Terms facet + numeric stats sub-agg (operators/facets.py
    facet_stats — ES terms+stats nested aggregation): matching turns per
    source with their length profile. Broadcast k-row hits, one hash
    agg."""
    from searchengine_spark.operators.facets import facet_stats

    docs = _docs(spark, sf_dir)
    return facet_stats(_facet_hits(spark, sf_dir),
                       docs.select("doc_id", "source", "n_chars"),
                       by="source", attr="n_chars")


def _facet_stats_sql(query: str = _FACET_QUERY, k: int = _FACET_K) -> str:
    return f"""WITH top AS (
  SELECT doc_id FROM ({_bm25_topk_sql(query, k)})
)
SELECT d.source AS value, count(*)::BIGINT AS n,
       min(d.n_chars::DOUBLE) AS min_v, max(d.n_chars::DOUBLE) AS max_v,
       round(avg(d.n_chars::DOUBLE), 6) AS avg_v,
       round(sum(d.n_chars::DOUBLE), 6) AS sum_v
FROM documents d JOIN top USING (doc_id)
GROUP BY 1 ORDER BY n DESC, value ASC"""


_TOPHITS_PER_BUCKET = 3


def q_facet_top_hits(spark, sf_dir):
    """Terms facet + top_hits sub-agg (operators/facets.py
    facet_top_hits — ES terms+top_hits): best 3 hits per source from the
    top-k result set. Per-bucket rank over k rows only
    (WindowGroupLimit)."""
    from searchengine_spark.operators.facets import facet_top_hits

    docs = _docs(spark, sf_dir)
    return facet_top_hits(_facet_hits(spark, sf_dir, scored=True),
                          docs.select("doc_id", "source"),
                          by="source", per_bucket=_TOPHITS_PER_BUCKET)


def _facet_top_hits_sql(query: str = _FACET_QUERY, k: int = _FACET_K,
                        m: int = _TOPHITS_PER_BUCKET) -> str:
    return f"""WITH top AS (
  SELECT doc_id, score FROM ({_bm25_topk_sql(query, k)})
),
ranked AS (
  SELECT d.source AS value, t.doc_id, t.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY t.score DESC, t.doc_id ASC) AS rank
  FROM documents d JOIN top t USING (doc_id)
)
SELECT value, rank::INT AS rank, doc_id, score FROM ranked
WHERE rank <= {m} ORDER BY value ASC, rank ASC"""


_FPCT_PROBS = (0.25, 0.5, 0.75, 0.9)


def q_facet_percentiles(spark, sf_dir):
    """Terms facet + percentiles sub-agg (operators/facets.py
    facet_percentiles — ES terms+percentiles): per-source quantiles of
    the hits' n_chars. Broadcast k-row hits + the profiling module's
    exact percentile agg (DuckDB quantile_cont semantics; the GK sketch
    twin is error-pinned in tests/test_profiling-adjacent suites)."""
    from searchengine_spark.operators.facets import facet_percentiles

    docs = _docs(spark, sf_dir)
    return facet_percentiles(_facet_hits(spark, sf_dir),
                             docs.select("doc_id", "source", "n_chars"),
                             by="source", attr="n_chars",
                             probs=_FPCT_PROBS)


def _facet_percentiles_sql(query: str = _FACET_QUERY,
                           k: int = _FACET_K) -> str:
    probs = ", ".join(str(p) for p in _FPCT_PROBS)
    vals = ", ".join(f"({i + 1}, {p})" for i, p in enumerate(_FPCT_PROBS))
    return f"""WITH top AS (
  SELECT doc_id FROM ({_bm25_topk_sql(query, k)})
),
j AS (SELECT d.source AS value, d.n_chars::DOUBLE AS a
      FROM documents d JOIN top USING (doc_id)),
agg AS (SELECT value, quantile_cont(a, [{probs}]) AS qs
        FROM j GROUP BY 1)
SELECT value, round(p.pct, 6) AS pct, round(qs[p.i], 5) AS v
FROM agg CROSS JOIN (VALUES {vals}) p(i, pct)
ORDER BY value ASC, pct ASC"""
