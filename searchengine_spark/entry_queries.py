"""Paired (Spark DataFrame callable, DuckDB oracle SQL) query definitions for
the driver correctness gate (`__spark_entry__.py`).

Every entry computes the same result two ways:
  - Spark: the engine's operators over parquet at ``sf_dir``
  - DuckDB: ANSI-ish SQL over the same files (views pre-registered by driver)

Cross-engine float discipline: every float column is ``round(x, 6)`` on BOTH
sides, and any ordering/limit is applied on the ROUNDED value with doc-id
tie-breaks, so value-hashes match bit-for-bit. Integer aggregates are cast
to BIGINT on both sides.

The ``documents(doc_id, text, lang, source, n_chars)`` table proxies the
transcripts corpus; ``embeddings(vec_id, embedding, label)`` feeds the
similarity operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.hashing import minhash_params
from searchengine_spark.functions.tokenize import duckdb_tokens_sql
from searchengine_spark.operators import dedup, multimodal, similarity, textstats
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.topk import score_all

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# core index queries
# ---------------------------------------------------------------------------

def q_term_stats(spark, sf_dir):
    _, _, tf_table, stats, _ = _index_parts(spark, sf_dir)
    return stats.select("term", F.col("df").cast("long").alias("df"),
                        F.col("cf").cast("long").alias("cf"))


SQL_TERM_STATS = f"WITH {BASE_CTES} SELECT term, df, cf FROM stats"


def q_doc_lengths(spark, sf_dir):
    _, forward, *_ = _index_parts(spark, sf_dir)
    return forward.select("doc_id", F.col("dl").cast("long").alias("dl"))


SQL_DOC_LENGTHS = f"WITH {BASE_CTES} SELECT doc_id, dl FROM dl"


def q_corpus_scalars(spark, sf_dir):
    _, forward, *_ = _index_parts(spark, sf_dir)
    s = CorpusScalars.compute(forward)
    return spark.createDataFrame(
        [(s.n_docs, s.sum_dl, round(s.avgdl, 6))],
        "n_docs long, sum_dl long, avgdl double",
    )


SQL_CORPUS_SCALARS = (
    f"WITH {BASE_CTES} SELECT n AS n_docs, (SELECT sum(dl) FROM dl)::BIGINT AS sum_dl,"
    " round(avgdl, 6) AS avgdl FROM consts"
)


def q_tf_postings(spark, sf_dir):
    _, _, tf_table, *_ = _index_parts(spark, sf_dir)
    return tf_table.select("term", "doc_id", F.col("tf").cast("long").alias("tf"))


SQL_TF_POSTINGS = f"WITH {BASE_CTES} SELECT term, doc_id, tf FROM tf"


def _bm25_topk(query: str, k: int = 10):
    def run(spark, sf_dir):
        _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
        allsc = score_all(tf_table, stats, scalars, query, mode="bm25")
        return (
            allsc.select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    return run


def _bm25_topk_sql(query: str, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def _reference_topk(query: str, k: int = 10, cap: int = 1000):
    def run(spark, sf_dir):
        _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
        allsc = score_all(
            tf_table, stats, scalars, query, mode="reference", posting_cap=cap
        )
        return (
            allsc.select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    return run


def _reference_topk_sql(query: str, k: int = 10, cap: int = 1000) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
capped AS (
  SELECT x.doc_id, x.tf, x.qf, x.cf FROM (
    SELECT tf.doc_id, tf.tf, q.qf, s.cf,
           row_number() OVER (PARTITION BY tf.term ORDER BY tf.tf DESC, tf.doc_id ASC) AS rn
    FROM tf JOIN q USING (term) JOIN stats s USING (term)
  ) x WHERE x.rn <= {cap}
),
partial AS (
  SELECT doc_id, (tf / (cf::DOUBLE / c.n)) * qf AS w FROM capped CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def _doc_segments(spark, sf_dir):
    from searchengine_spark.operators.segments import build_doc_segments

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    segs = build_doc_segments(
        tf_table, stats, scalars.n_docs, scalars.avgdl, n_shards=8
    )
    return segs, tf_table, stats, scalars


def q_segment_roundtrip(spark, sf_dir):
    """Compressed segment build + decode: proves the delta+varint segment
    codec is lossless at the driver gate (oracle = plain tf table)."""
    from searchengine_spark.operators.segments import segments_to_tf

    segs, *_ = _doc_segments(spark, sf_dir)
    return segments_to_tf(segs).select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf")
    )


def q_merge_roundtrip(spark, sf_dir):
    """Sort-merge of two independently built segment tables (doc-id-range
    halves of the corpus) decodes to exactly the full corpus tf table —
    the incremental-indexing correctness gate (operators/merge.py)."""
    from searchengine_spark.operators.merge import merge_term_segments
    from searchengine_spark.operators.segments import (
        build_term_segments,
        segments_to_tf,
    )

    docs = _docs(spark, sf_dir)
    pivot = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    halves = [docs.filter(F.col("doc_id") < pivot), docs.filter(F.col("doc_id") >= pivot)]
    parts = []
    for h in halves:
        forward = build_forward(h)
        tf_table = explode_forward(forward)
        stats = build_term_stats(tf_table)
        sc = CorpusScalars.compute(forward)
        parts.append(
            (build_term_segments(tf_table, stats, sc.n_docs, sc.avgdl,
                                 df_target=64), 0)  # doc_ids already global
        )
    merged = merge_term_segments(parts, avgdl_merged=30.0, df_target=64)
    return segments_to_tf(merged).select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf")
    )


def q_wand_term_topk(spark, sf_dir, query: str = "spark join fast",
                     k: int = 10):
    """Block-max WAND over the TERM-partitioned (merged/incremental)
    layout — wand_topk_terms: partition-pruned fetch of the query's
    (term, salt) rows, one grouped-map WAND over the co-located lists.
    Must equal the exhaustive BM25 oracle exactly."""
    from searchengine_spark.operators.segments import build_term_segments
    from searchengine_spark.operators.wand import wand_topk_terms

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    segs = build_term_segments(tf_table, stats, scalars.n_docs,
                               scalars.avgdl, df_target=512)
    topk = wand_topk_terms(segs, query, stats, scalars.n_docs,
                           scalars.avgdl, k=k + 8)
    return (
        topk.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def q_wand_topk_deletes(spark, sf_dir, query: str = "spark join fast",
                        k: int = 10):
    """Tombstone-masked WAND (operators/deletes.py): docs with
    doc_id % 17 == 3 are deleted; the kernel skips them before scoring
    and the top-k refills with live docs. Stats stay the build-time
    values (pinned, Lucene semantics), so the oracle is plain exhaustive
    BM25 with full-corpus stats and a WHERE on the result set."""
    from searchengine_spark.operators.wand import wand_topk

    segs, _, stats, scalars = _doc_segments(spark, sf_dir)
    dead = {r.doc_id for r in
            _docs(spark, sf_dir).select("doc_id")
            .filter(F.col("doc_id") % 17 == 3).collect()}
    topk = wand_topk(segs, query, stats, scalars.n_docs, scalars.avgdl,
                     k=k + 8, exclude=dead)
    return (
        topk.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _wand_topk_deletes_sql(query: str, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial
WHERE doc_id % 17 != 3
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def _wand_topk(query: str, k: int = 10):
    """Block-max WAND over doc-sharded segments — must match the exhaustive
    BM25 oracle SQL exactly (rank + rounded score).

    Over-fetch then round-and-relimit: the oracle selects its k rows on
    round(score, 6) with doc_id tie-break, so selecting on raw scores could
    flip near-ties at the k boundary (sub-1e-6 summation-order noise).
    Fetching k+8 and re-applying orderBy/limit on the ROUNDED score matches
    the exhaustive entries' discipline."""
    def run(spark, sf_dir):
        from searchengine_spark.operators.wand import wand_topk

        segs, _, stats, scalars = _doc_segments(spark, sf_dir)
        topk = wand_topk(segs, query, stats, scalars.n_docs, scalars.avgdl, k=k + 8)
        return (
            topk.select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    return run


_FIELD_WEIGHTS = {"en": 2.0, "de": 1.5}  # others default 1.0


def q_fielded_topk(spark, sf_dir, query: str = "spark join fast", k: int = 10):
    """Reference two-field boost semantics (Engine.cs:18,162 title x100)
    generalized: per-field BM25 with per-field stats and boosts, one index."""
    from searchengine_spark.operators.fielded import fielded_topk

    out = fielded_topk(_docs(spark, sf_dir), "lang", _FIELD_WEIGHTS, query, k=k)
    return out.select("doc_id", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


_FIELDED_SQL_WEIGHT = "CASE WHEN field='en' THEN 2.0 WHEN field='de' THEN 1.5 ELSE 1.0 END"


def _fielded_topk_sql(query: str, k: int = 10) -> str:
    return f"""WITH ftokd AS (SELECT doc_id, lang AS field, {_TOKS_TEXT} AS t FROM documents),
ftoks AS (SELECT doc_id, field, unnest(t) AS term FROM ftokd),
ftf AS (SELECT doc_id, field, term, count(*)::BIGINT AS tf FROM ftoks GROUP BY 1, 2, 3),
ffdl AS (SELECT doc_id, field, coalesce(len(t), 0)::BIGINT AS fdl FROM ftokd),
fstats AS (SELECT field, term, count(*)::BIGINT AS df FROM ftf GROUP BY 1, 2),
fscal AS (SELECT field, count(*)::BIGINT AS n_fdocs, avg(fdl) AS avgfdl
          FROM ffdl WHERE fdl > 0 GROUP BY 1),
{_query_cte(query)},
partial AS (
  SELECT ftf.doc_id,
         ({_FIELDED_SQL_WEIGHT}) * q.qf
         * ln((sc.n_fdocs - st.df + 0.5) / (st.df + 0.5) + 1.0)
         * (ftf.tf * 2.2) / (ftf.tf + 1.2 * (0.25 + 0.75 * fl.fdl / sc.avgfdl)) AS w
  FROM ftf
  JOIN q USING (term)
  JOIN fstats st USING (field, term)
  JOIN fscal sc USING (field)
  JOIN ffdl fl ON fl.doc_id = ftf.doc_id AND fl.field = ftf.field
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_REF_FIELD_CAP = 50  # small enough to BIND at sf0.01 (hot terms have df > 50)


def q_fielded_reference_topk(spark, sf_dir, query: str = "spark join fast", k: int = 10):
    """Reference-EXACT two-field boost semantics (Engine.cs:146-173):
    boosted field scores weight*tf*qf unnormalized (title side, x100 at
    Engine.cs:18,162), base fields score (tf/(cf/N))*qf (body side,
    Engine.cs:151,172), per-(field,term) posting cap with pinned
    tie-break (Engine.cs:185,193)."""
    from searchengine_spark.operators.fielded import fielded_topk

    out = fielded_topk(
        _docs(spark, sf_dir), "lang", {"en": 100.0}, query, k=k,
        mode="reference", posting_cap=_REF_FIELD_CAP,
    )
    return out.select("doc_id", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


def _fielded_reference_topk_sql(query: str, k: int = 10, cap: int = _REF_FIELD_CAP) -> str:
    return f"""WITH ftokd AS (SELECT doc_id, lang AS field, {_TOKS_TEXT} AS t FROM documents),
ftoks AS (SELECT doc_id, field, unnest(t) AS term FROM ftokd),
ftf AS (SELECT doc_id, field, term, count(*)::BIGINT AS tf FROM ftoks GROUP BY 1, 2, 3),
fstats AS (SELECT field, term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM ftf GROUP BY 1, 2),
fscal AS (SELECT field, count(DISTINCT doc_id)::BIGINT AS n_fdocs FROM ftf GROUP BY 1),
{_query_cte(query)},
capped AS (
  SELECT x.doc_id, x.field, x.term, x.tf, x.qf FROM (
    SELECT ftf.doc_id, ftf.field, ftf.term, ftf.tf, q.qf,
           row_number() OVER (PARTITION BY ftf.field, ftf.term
                              ORDER BY ftf.tf DESC, ftf.doc_id ASC) AS rn
    FROM ftf JOIN q USING (term)
  ) x WHERE x.rn <= {cap}
),
partial AS (
  SELECT c.doc_id,
         CASE WHEN c.field = 'en' THEN 100.0 * c.tf * c.qf
              ELSE c.qf * c.tf / (st.cf::DOUBLE / sc.n_fdocs) END AS w
  FROM capped c JOIN fstats st USING (field, term) JOIN fscal sc USING (field)
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_BATCH_QUERIES = ["spark join fast", "dup", "the the data", "window agg stream", "zzzabsent"]


def q_batch_wand_topk(spark, sf_dir, k: int = 5):
    """Batch block-max WAND: all queries in one segment scan, posting
    lists decoded once per shard. Oracle = the exhaustive batch SQL."""
    from searchengine_spark.operators.wand import wand_topk_batch

    segs, _, stats, scalars = _doc_segments(spark, sf_dir)
    out = wand_topk_batch(
        segs, list(enumerate(_BATCH_QUERIES)), stats,
        scalars.n_docs, scalars.avgdl, k=k,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_batch_topk(spark, sf_dir, k: int = 5):
    from searchengine_spark.functions.tokenize import tokenize_udf

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    queries = spark.createDataFrame(
        list(enumerate(_BATCH_QUERIES)), "query_id int, query string"
    )
    qterms = (
        queries.select("query_id", F.explode(tokenize_udf(F.col("query"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qf"))
    )
    from searchengine_spark.operators.topk import _partial_weight

    joined = tf_table.join(F.broadcast(qterms), "term").join(stats, "term")
    scored = _partial_weight(joined, scalars, "bm25")
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("partial"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _batch_topk_sql(k: int = 5) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(*_BATCH_QUERIES)},
partial AS (
  SELECT q.query_id, tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
scored AS (SELECT query_id, doc_id, round(sum(w), 6) AS score FROM partial GROUP BY 1, 2)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         (row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC))::BIGINT AS rank
  FROM scored
) WHERE rank <= {k}"""


def q_doc_id_rank(spark, sf_dir):
    """The deterministic dense doc-id operator, oracled by a SQL window."""
    import datetime

    from searchengine_spark.operators.docids import assign_doc_ids

    docs = _docs(spark, sf_dir)
    as_transcripts = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(datetime.datetime(2026, 1, 1)).alias("ts"),
    )
    out = assign_doc_ids(as_transcripts, num_partitions=4)
    return out.select("conv_id", F.col("doc_id").alias("rank_id"))


SQL_DOC_ID_RANK = (
    "SELECT lpad(doc_id::VARCHAR, 10, '0') AS conv_id,"
    " (row_number() OVER (ORDER BY lpad(doc_id::VARCHAR, 10, '0')) - 1)::BIGINT AS rank_id"
    " FROM documents"
)


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir)).select(
        "text_md5",
        F.col("n_dups").cast("long").alias("n_dups"),
        F.col("keep_id").cast("long").alias("keep_id"),
    )


SQL_DEDUP_EXACT = (
    "SELECT md5(text) AS text_md5, count(*)::BIGINT AS n_dups,"
    " min(doc_id)::BIGINT AS keep_id FROM documents GROUP BY 1"
)

_SHINGLE_CTES = f"""
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
       i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingle FROM tokd)
""".strip()

_JACCARD_THRESHOLD = 0.1


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=_JACCARD_THRESHOLD)


def q_dedup_components(spark, sf_dir):
    """Duplicate-cluster assignment (operators/dedup.py
    connected_components): min-label propagation over the n-gram-Jaccard
    near-dup pair graph -> (doc_id, component, keep). keep marks the
    cluster canonical (min doc_id) — the doc a dedup pass retains."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


def q_dedup_components_lsls(spark, sf_dir):
    """Same duplicate-cluster assignment computed by the log-diameter
    large-star/small-star algorithm (operators/dedup.py
    connected_components_alternating, Kiveris et al.) — O(log n) rounds
    regardless of graph diameter, the path a web-graph-shaped dup input
    (sliding-window crawl chains) needs. Shares dedup_components'
    DuckDB oracle: both must produce the identical labeling."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components_alternating(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


SQL_DEDUP_COMPONENTS = f"""WITH RECURSIVE {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
)
SELECT node::BIGINT AS doc_id, min(label)::BIGINT AS component,
       (node = min(label)) AS keep
FROM reach GROUP BY node"""


SQL_NGRAM_JACCARD = f"""WITH {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}"""

def q_pack_bins(spark, sf_dir, budget: int = 4096):
    """Token-budget packing (operators/packing.py): concatenate-then-cut
    sequence assembly via the two-phase prefix-sum pattern (no global
    sort); the oracle is the equivalent single-window cumsum."""
    from searchengine_spark.operators.packing import pack_bins

    out = pack_bins(_docs(spark, sf_dir), budget=budget, len_col="n_chars")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "start_offset", "bin_id", "offset_in_bin",
    )


SQL_PACK_BINS = """SELECT doc_id,
(sum(n_chars) OVER w - n_chars)::BIGINT AS start_offset,
((sum(n_chars) OVER w - n_chars) // 4096)::BIGINT AS bin_id,
((sum(n_chars) OVER w - n_chars) % 4096)::BIGINT AS offset_in_bin
FROM documents
WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)"""


def q_dedup_keep_first(spark, sf_dir):
    """Batch twin of the in-stream exact dedup
    (streaming/dedup_stream.py): earliest arrival per content hash wins
    (arrival = synthesized doc_id-ordered timestamps here)."""
    import datetime

    from searchengine_spark.streaming.dedup_stream import dedup_keep_first

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
        (F.lit(datetime.datetime(2026, 1, 1))
         + F.make_dt_interval(secs=F.col("doc_id").cast("double")))
        .alias("ts"),
        F.col("doc_id"),
    )
    out = dedup_keep_first(docs)
    return out.select("text_md5",
                      F.col("doc_id").cast("long").alias("keep_doc"))


SQL_DEDUP_KEEP_FIRST = """SELECT md5(text) AS text_md5,
doc_id::BIGINT AS keep_doc
FROM (SELECT doc_id, text,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1"""


def q_split_contamination(spark, sf_dir):
    """Train/eval decontamination (operators/decontam.py): eval-split
    docs sharing 3-gram shingles with any train doc, via the
    shingle-keyed inverted-index join over hash-stable splits."""
    from searchengine_spark.operators.decontam import (
        cross_split_contamination,
    )

    return cross_split_contamination(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"), "split",
        "n_shared_shingles", "n_train_docs",
    )


SQL_SPLIT_CONTAMINATION = f"""WITH {_SHINGLE_CTES},
lab AS (SELECT doc_id,
  CASE WHEN (('0x' || substring(md5(doc_id::VARCHAR || '|split-v1'), 1, 8))::BIGINT % 10000) < 9000 THEN 'train'
       WHEN (('0x' || substring(md5(doc_id::VARCHAR || '|split-v1'), 1, 8))::BIGINT % 10000) < 9500 THEN 'val'
       ELSE 'test' END AS split
  FROM documents),
shl AS (SELECT s.doc_id, s.shingle, l.split FROM sh s JOIN lab l USING (doc_id)),
train AS (SELECT doc_id AS train_doc_id, shingle FROM shl WHERE split = 'train'),
ev AS (SELECT doc_id, split, shingle FROM shl WHERE split IN ('val', 'test'))
SELECT e.doc_id::BIGINT AS doc_id, e.split,
       count(DISTINCT e.shingle)::BIGINT AS n_shared_shingles,
       count(DISTINCT t.train_doc_id)::BIGINT AS n_train_docs
FROM ev e JOIN train t USING (shingle)
GROUP BY 1, 2"""


_N_PERM = 8
_MH_A, _MH_B = minhash_params(_N_PERM)
_MH_P = (1 << 61) - 1
_H32 = "(('0x' || substring(md5(shingle), 1, 8))::BIGINT)"


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir), n_perm=_N_PERM).select(
        "doc_id", "perm", F.col("minhash").cast("long").alias("minhash")
    )


_MH_VALUES = ", ".join(
    f"({i}, {_MH_A[i]}, {_MH_B[i]})" for i in range(_N_PERM)
)

_MH_CTES = f"""{_SHINGLE_CTES},
shh AS (SELECT doc_id, {_H32} AS h FROM sh),
perms(perm, a, b) AS (VALUES {_MH_VALUES}),
mh AS (SELECT doc_id, perm, min((p.a * s.h + p.b) % {_MH_P})::BIGINT AS minhash
       FROM shh s CROSS JOIN perms p GROUP BY 1, 2)"""

SQL_MINHASH_SIGNATURES = f"WITH {_MH_CTES} SELECT doc_id, perm, minhash FROM mh"


def q_lsh_candidates(spark, sf_dir):
    wide = dedup.minhash_signatures_wide(_docs(spark, sf_dir), n_perm=_N_PERM)
    return dedup.lsh_candidate_pairs_wide(wide, n_perm=_N_PERM, n_bands=4).select(
        F.col("id_a").cast("long").alias("id_a"), F.col("id_b").cast("long").alias("id_b")
    )


SQL_LSH_CANDIDATES = f"""WITH {_MH_CTES},
bands AS (SELECT doc_id, (perm // 2) AS band,
                 md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_key
          FROM mh GROUP BY 1, 2)
SELECT DISTINCT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def q_minhash_dedup_pairs(spark, sf_dir):
    """End-to-end MinHash dedup SCALE path: LSH band candidates -> exact
    Jaccard verify -> pairs >= τ. This is the pipeline a 100 TB dedup run
    executes (pairwise work bounded by band collisions, never all-pairs);
    the oracle recomputes candidates and the verify join in SQL."""
    return dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), n_perm=_N_PERM, n_bands=4,
        threshold=_JACCARD_THRESHOLD,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


SQL_MINHASH_DEDUP_PAIRS = f"""WITH {_MH_CTES},
bands AS (SELECT doc_id, (perm // 2) AS band,
                 md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_key
          FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*)::BIGINT AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}"""


def q_simhash(spark, sf_dir):
    return dedup.simhash32(_docs(spark, sf_dir)).select(
        "doc_id", F.col("simhash").cast("long").alias("simhash")
    )


_SIMHASH_CTES = f"""{BASE_CTES},
tfh AS (SELECT doc_id, tf, (('0x' || substring(md5(term), 1, 8))::BIGINT) AS h FROM tf),
bits AS (SELECT doc_id, bit, sum(tf * (((h >> bit) & 1) * 2 - 1)) AS s
         FROM tfh CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b GROUP BY 1, 2),
sim AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY 1)"""

SQL_SIMHASH = f"WITH {_SIMHASH_CTES} SELECT doc_id, simhash FROM sim"

_MAX_HAMMING = 3


def q_simhash_pairs(spark, sf_dir):
    # band-blocked + verify; lossless vs brute force for hamming<=3 with 4
    # byte-bands (pigeonhole), so the O(n^2) SQL oracle is exact.
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=_MAX_HAMMING).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("int"),
    )


SQL_SIMHASH_PAIRS = f"""WITH {_SIMHASH_CTES}
SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MAX_HAMMING}"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


def q_cosine_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


SQL_COSINE_TOPK = """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


def q_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN (k-means coarse quantizer -> probe nearest lists ->
    exact re-rank). Probing ALL lists is exactly brute-force cosine top-k,
    which is what the SQL oracle checks — so the gate exercises the real
    quantizer-train + assign + probe plumbing against an exact expected
    answer; recall at nprobe < n_centroids is pinned by pytest
    (test_ivf_recall_*). Query = embeddings[vec_id=1] (cosine_topk uses 0)."""
    emb = _load(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 1).select("embedding").first()
    q = [float(x) for x in row["embedding"]]
    return similarity.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=16)


SQL_IVF_TOPK = """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
c AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


def q_ann_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.ann_topk(
        emb, _query_vec(spark, sf_dir), k=10, n_planes=16, n_bands=4, seed=42
    )


def _ann_topk_sql(sf_dir: str) -> str:
    """Planes + query signature are deterministic (seed=42); the query vector
    is embeddings[vec_id=0]. Generates the plane weights as VALUES rows."""
    import numpy as np

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pdf = tbl.to_pandas()
    qv = np.array(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0], dtype=np.float64)
    dim = len(qv)
    planes = similarity._planes(dim, 16, 42)
    qsig = 0
    for i in range(16):
        if float(qv @ planes[i]) > 0:
            qsig |= 1 << i
    vals = ", ".join(
        f"({p}, {i + 1}, {planes[p][i]!r})" for p in range(16) for i in range(dim)
    )
    bands = " OR ".join(
        f"((sig >> {b * 4}) & 15) = {(qsig >> (b * 4)) & 15}" for b in range(4)
    )
    return f"""WITH planes(p, i, w) AS (VALUES {vals}),
dots AS (SELECT e.vec_id, pl.p, sum(e.embedding[pl.i]::DOUBLE * pl.w) AS d
         FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2),
sigs AS (SELECT vec_id, sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
         FROM dots GROUP BY 1),
cand AS (SELECT vec_id FROM sigs WHERE {bands}),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> e.embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


# 0.40 yields ~30 pairs at sf0.01 (and non-empty results at sf0.001/0.1),
# so the candidate join + cosine verify are actually exercised — a 0-row
# vs 0-row "pass" proves nothing (round-1 advice).
_COS_PAIR_THRESHOLD = 0.40


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH-banded candidates + exact
    cosine verify (the embedding member of the dedup family). Output cos
    re-rounded to 5 decimals: a 64-term float64 dot product summed in
    different orders (Spark vs DuckDB) can land on opposite sides of a
    6th-decimal rounding boundary (observed once at sf0.1)."""
    emb = _load(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(
        emb, threshold=_COS_PAIR_THRESHOLD, n_planes=16, n_bands=4, seed=42
    )
    return pairs.select("id_a", "id_b", F.round("cos", 5).alias("cos"))


def _embedding_dup_pairs_sql(sf_dir: str) -> str:
    """Oracle replicates the deterministic LSH planes (seed=42) as VALUES
    rows, the band-match candidate join, and the exact cosine filter."""
    import numpy as np  # noqa: F401

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    dim = len(tbl.column("embedding")[0])
    planes = similarity._planes(dim, 16, 42)
    vals = ", ".join(
        f"({p}, {i + 1}, {planes[p][i]!r})" for p in range(16) for i in range(dim)
    )
    return f"""WITH planes(p, i, w) AS (VALUES {vals}),
dots AS (SELECT e.vec_id, pl.p, sum(e.embedding[pl.i]::DOUBLE * pl.w) AS d
         FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2),
sigs AS (SELECT vec_id, sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
         FROM dots GROUP BY 1),
bands AS (SELECT vec_id, b.band, (sig >> (b.band * 4)) % 16 AS key
          FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         WHERE a.vec_id < b.vec_id),
pairs AS (
  SELECT c.id_a, c.id_b,
    round(list_sum(list_transform(range(1, len(ea.embedding) + 1),
            i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos
  FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cos, 5) AS cos FROM pairs
WHERE cos >= {_COS_PAIR_THRESHOLD}"""


def q_embedding_dup_components(spark, sf_dir):
    """Embedding near-dup CLUSTERS: the LSH-candidates + cosine-verify
    pair graph resolved to keep-one components (dedup.py
    connected_components over similarity.cosine_pairs) — the decision
    stage of embedding dedup."""
    emb = _load(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(
        emb, threshold=_COS_PAIR_THRESHOLD, n_planes=16, n_bands=4, seed=42
    )
    comp = dedup.connected_components(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


def _embedding_dup_components_sql(sf_dir: str) -> str:
    """Recursive-CTE components over the SAME pair derivation as
    _embedding_dup_pairs_sql (WITH body reused verbatim; only the final
    SELECT is replaced by edges + min-label reachability)."""
    base = _embedding_dup_pairs_sql(sf_dir)
    body, _ = base.rsplit("SELECT id_a, id_b,", 1)
    return f"""{body.rstrip().replace("WITH planes", "WITH RECURSIVE planes", 1)},
prs AS (SELECT id_a, id_b FROM pairs WHERE cos >= {_COS_PAIR_THRESHOLD}),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
)
SELECT node::BIGINT AS vec_id, min(label)::BIGINT AS component,
       (node = min(label)) AS keep
FROM reach GROUP BY node"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _as_transcripts(spark, sf_dir):
    """documents proxied into the transcript shape: source = conv_id,
    doc_id = turn ordering (the operators need order, not contiguity)."""
    return _docs(spark, sf_dir).select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        "text",
    )


def q_turn_context(spark, sf_dir, n_prev: int = 2):
    """Sliding context-window assembly (operators/context.py): each turn
    + up to n_prev preceding turns of its conversation, one ordered
    window over the conv-id partition."""
    from searchengine_spark.operators.context import context_windows

    out = context_windows(_as_transcripts(spark, sf_dir), n_prev=n_prev)
    return out.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        F.md5("context").alias("ctx_md5"),
    )


SQL_TURN_CONTEXT = """SELECT source AS conv_id, doc_id::BIGINT AS turn_idx,
md5(string_agg(text, chr(10)) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS ctx_md5
FROM documents"""


def q_conversation_text(spark, sf_dir):
    """Whole-conversation assembly (operators/context.py): one hash agg,
    in-row struct sort — no window/sort shuffle."""
    from searchengine_spark.operators.context import conversation_text

    out = conversation_text(_as_transcripts(spark, sf_dir))
    return out.select("conv_id", "n_turns",
                      F.md5("conv_text").alias("conv_md5"))


SQL_CONVERSATION_TEXT = """SELECT source AS conv_id,
count(*)::BIGINT AS n_turns,
md5(string_agg(text, chr(10) ORDER BY doc_id)) AS conv_md5
FROM documents GROUP BY 1"""


def q_role_spans(spark, sf_dir):
    """Per-turn character offsets into the assembled conversation text
    (operators/context.py role_spans) — the SFT loss-mask artifact
    (train on assistant spans, mask the rest). Role is derived
    deterministically (turn_idx parity) since the proxy table has none;
    conv_text[start:end] == turn text is pinned in pytest."""
    from searchengine_spark.operators.context import role_spans

    t = _as_transcripts(spark, sf_dir).withColumn(
        "role",
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant"),
    )
    out = role_spans(t)
    return out.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        "role", "start", F.col("end").alias("end_c"),
    )


SQL_ROLE_SPANS = """SELECT source AS conv_id, doc_id::BIGINT AS turn_idx,
  CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
  coalesce(sum(length(text) + 1) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start,
  (coalesce(sum(length(text) + 1) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
   + length(text))::BIGINT AS end_c
FROM documents"""


def _tool_transcripts(spark, sf_dir):
    """Transcript proxy with a deterministic tool column (the proxy table
    has none): every 5th turn is a bash call, every 5th+1 a search."""
    return _as_transcripts(spark, sf_dir).withColumn(
        "tool",
        F.when(F.col("turn_idx") % 5 == 0, "bash")
        .when(F.col("turn_idx") % 5 == 1, "search")
        .otherwise(F.lit(None).cast("string")),
    )


def q_tool_usage(spark, sf_dir):
    """Per-tool usage profile over transcripts (operators/temporal.py
    tool_usage): call counts, conversation reach, mean position in the
    conversation. Output bounded by |tools|."""
    from searchengine_spark.operators.temporal import tool_usage

    return tool_usage(_tool_transcripts(spark, sf_dir))


SQL_TOOL_USAGE = """WITH t AS (
  SELECT source AS conv_id, doc_id AS turn_idx,
    CASE WHEN doc_id % 5 = 0 THEN 'bash'
         WHEN doc_id % 5 = 1 THEN 'search' END AS tool
  FROM documents),
ln AS (SELECT conv_id, max(turn_idx) AS max_idx FROM t GROUP BY 1)
SELECT tool, count(*)::BIGINT AS n_calls,
  count(DISTINCT conv_id)::BIGINT AS n_convs,
  round(avg(CASE WHEN max_idx > 0 THEN turn_idx::DOUBLE / max_idx
                 ELSE 0.0 END), 6) AS mean_turn_frac
FROM t JOIN ln USING (conv_id)
WHERE tool IS NOT NULL GROUP BY 1"""


def q_tool_transitions(spark, sf_dir):
    """Tool-sequence mining over transcripts (operators/temporal.py
    tool_transitions): which tool follows which, within conversations.
    Output bounded by |tools|²."""
    from searchengine_spark.operators.temporal import tool_transitions

    return tool_transitions(_tool_transcripts(spark, sf_dir))


SQL_TOOL_TRANSITIONS = """WITH t AS (
  SELECT source AS conv_id, doc_id AS turn_idx,
    CASE WHEN doc_id % 5 = 0 THEN 'bash'
         WHEN doc_id % 5 = 1 THEN 'search' END AS tool
  FROM documents),
seq AS (
  SELECT lag(tool) OVER (PARTITION BY conv_id
                         ORDER BY turn_idx) AS prev_tool, tool
  FROM t WHERE tool IS NOT NULL)
SELECT prev_tool, tool, count(*)::BIGINT AS n_pairs
FROM seq WHERE prev_tool IS NOT NULL GROUP BY 1, 2"""


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (operators/sampling.py):
    membership = pure function of md5(doc_id || salt) — stable across
    runs, partitionings, and engines; no RNG, no shuffle."""
    from searchengine_spark.operators.sampling import split_assign

    return split_assign(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"), "split")


_DUCK_BUCKET = ("(('0x' || substring(md5(doc_id::VARCHAR || '|{salt}'), 1, 8))"
                "::BIGINT % 10000)")

SQL_SPLIT_ASSIGN = f"""SELECT doc_id::BIGINT AS doc_id,
CASE WHEN {_DUCK_BUCKET.format(salt='split-v1')} < 9000 THEN 'train'
     WHEN {_DUCK_BUCKET.format(salt='split-v1')} < 9500 THEN 'val'
     ELSE 'test' END AS split
FROM documents"""


def q_stratified_sample(spark, sf_dir):
    """Per-language deterministic downsampling (operators/sampling.py):
    keep 100% of rare langs, 25% of dominant 'en' — the rebalancing move
    every multilingual training pipeline makes."""
    from searchengine_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _docs(spark, sf_dir), rates={"en": 0.25}, strata_col="lang",
        default_rate=1.0)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


SQL_STRATIFIED_SAMPLE = f"""SELECT doc_id::BIGINT AS doc_id, lang
FROM documents
WHERE {_DUCK_BUCKET.format(salt='strata-v1')}
      < CAST((CASE WHEN lang = 'en' THEN 0.25 ELSE 1.0 END) * 10000 AS BIGINT)"""


def q_bigram_pmi(spark, sf_dir):
    """Corpus bigram collocations by PMI (operators/collocations.py):
    in-row zip_with bigram formation, two hash aggs, broadcast unigram
    join — no window, no position self-join."""
    from searchengine_spark.operators.collocations import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir), min_count=5, k=20)


SQL_BIGRAM_PMI = f"""WITH
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
uni AS (SELECT unnest(t) AS term FROM tokd),
c1 AS (SELECT term, count(*)::BIGINT AS c FROM uni GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM uni)::DOUBLE AS t1,
               (SELECT sum(greatest(len(t) - 1, 0)) FROM tokd)::DOUBLE AS t2),
big AS (SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        i -> concat_ws(' ', t[i], t[i+1]))) AS bigram FROM tokd),
bc AS (SELECT bigram, count(*)::BIGINT AS n FROM big
       GROUP BY 1 HAVING count(*) >= 5)
SELECT bigram, n,
       round(ln((n / t.t2) / ((a.c / t.t1) * (b.c / t.t1))), 6) AS pmi
FROM bc JOIN c1 a ON a.term = split_part(bigram, ' ', 1)
        JOIN c1 b ON b.term = split_part(bigram, ' ', 2)
CROSS JOIN tot t
ORDER BY pmi DESC, bigram ASC LIMIT 20"""


def q_repetition_stats(spark, sf_dir):
    """Degenerate-text detector (operators/textstats.py
    repetition_stats): share of a doc's 3-grams taken by its most
    repeated 3-gram — in-row list algebra, no explode/shuffle."""
    return textstats.repetition_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_ngrams", "top_ngram_frac")


SQL_REPETITION_STATS = f"""WITH
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
grams AS (SELECT doc_id,
  CASE WHEN len(t) >= 3
       THEN list_transform(range(1, len(t) - 1),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
       ELSE [] END AS g FROM tokd)
SELECT doc_id, len(g)::BIGINT AS n_ngrams,
  CASE WHEN len(g) > 0 THEN round(
    list_max(list_transform(list_distinct(g),
                            x -> len(list_filter(g, y -> y = x))))::DOUBLE
    / len(g), 6)
  ELSE 0.0 END AS top_ngram_frac
FROM grams"""


_PII_SUFFIX = (" contact a.b@example.org or https://ex.io ;"
               " call +1 555-123-4567 at 10.0.0.1")


def q_pii_scan(spark, sf_dir):
    """PII-shaped span counts (operators/textstats.py pii_scan):
    emails/URLs/phones/IPv4s per doc, JVM regexp_count columns. The sf
    corpus contains no digits/URLs, so a deterministic PII suffix is
    planted on every 7th doc (identically in the oracle) — the gate
    compares NONZERO counts, not a vacuous all-zeros frame."""
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(_PII_SUFFIX)))
        .otherwise(F.col("text")),
    )
    return textstats.pii_scan(docs)


SQL_PII_SCAN = rf"""WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || '{_PII_SUFFIX}'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))::BIGINT AS emails,
len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT AS urls,
len(regexp_extract_all(text, '\+?\d[\d\-\s()]{{7,}}\d'))::BIGINT AS phones,
len(regexp_extract_all(text, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b'))::BIGINT AS ipv4s
FROM aug"""


def q_doc_logprob(spark, sf_dir):
    """Perplexity-proxy quality filter (operators/textstats.py
    doc_unigram_logprob): per-doc average unigram-LM logprob against the
    corpus distribution; one hash join + one per-doc agg."""
    from searchengine_spark.operators.textstats import doc_unigram_logprob

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    out = doc_unigram_logprob(tf_table, stats, scalars.sum_dl)
    return out.select("doc_id", "dl",
                      F.round("avg_logprob", 6).alias("avg_logprob"))


SQL_DOC_LOGPROB = f"""WITH {BASE_CTES}
SELECT tf.doc_id, max(dl.dl)::BIGINT AS dl,
       round(sum(tf.tf * ln(s.cf / (SELECT sum(dl)::DOUBLE FROM dl)))
             / max(dl.dl), 6) AS avg_logprob
FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
GROUP BY 1"""


def q_doc_bigram_logprob(spark, sf_dir):
    """Stupid-backoff bigram-LM quality score (operators/textstats.py
    doc_bigram_logprob): corpus-attested continuations score
    count(w1w2)/cf(w1), singleton bigrams back off to α·unigram —
    sharper than the unigram filter at catching word salad. Hash joins
    only, nothing vocabulary-sized broadcast."""
    from searchengine_spark.operators.textstats import doc_bigram_logprob

    docs, _, _, stats, scalars = _index_parts(spark, sf_dir)
    return doc_bigram_logprob(docs, stats, scalars.sum_dl)


SQL_DOC_BIGRAM_LOGPROB = f"""WITH {BASE_CTES},
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM tokd),
bc AS (SELECT bigram, count(*)::BIGINT AS c2 FROM bg GROUP BY 1),
inst AS (
  SELECT bg.doc_id,
    CASE WHEN bc.c2 >= 2
         THEN ln(bc.c2 / s1.cf)
         ELSE ln(0.4 * s2.cf / (SELECT sum(dl)::DOUBLE FROM dl)) END AS lp
  FROM bg JOIN bc USING (bigram)
  JOIN stats s1 ON s1.term = split_part(bg.bigram, ' ', 1)
  JOIN stats s2 ON s2.term = split_part(bg.bigram, ' ', 2))
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
  round(sum(lp) / count(*), 5) AS avg_logprob
FROM inst GROUP BY 1"""


def q_source_divergence(spark, sf_dir):
    """Per-source KL drift vs the corpus unigram distribution
    (operators/textstats.py source_divergence)."""
    from searchengine_spark.operators.textstats import source_divergence

    docs, _, tf_table, _, scalars = _index_parts(spark, sf_dir)
    out = source_divergence(tf_table, docs.select("doc_id", "source"),
                            scalars.sum_dl)
    return out.select("source", F.round("kl", 6).alias("kl"))


SQL_SOURCE_DIVERGENCE = f"""WITH {BASE_CTES},
st AS (SELECT d.source, tf.term, sum(tf.tf)::BIGINT AS cfs
       FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
stot AS (SELECT source, sum(cfs)::BIGINT AS ts FROM st GROUP BY 1)
SELECT st.source,
       round(sum((st.cfs::DOUBLE / stot.ts)
                 * ln((st.cfs::DOUBLE / stot.ts)
                      / (s.cf / (SELECT sum(dl)::DOUBLE FROM dl)))), 6) AS kl
FROM st JOIN stot USING (source) JOIN stats s USING (term)
GROUP BY 1"""


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


_STOPLIST = "[" + ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS) + "]"

SQL_LANG_ID = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT doc_id,
  round(CASE WHEN coalesce(len(t), 0) > 0
        THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
        ELSE 0.0 END, 6) AS en_ratio,
  CASE WHEN coalesce(len(t), 0) = 0 THEN 'unknown'
       WHEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t) > 0.05 THEN 'en'
       ELSE 'other' END AS lang_pred
FROM tokd"""


def q_quality(spark, sf_dir):
    df = textstats.quality_score(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "alpha_ratio",
        "stop_ratio",
        "quality",
    )


SQL_QUALITY = f"""WITH tokd AS (
  SELECT d.doc_id, {_TOKS_TEXT} AS t, coalesce(d.text, '') AS txt FROM documents d
),
m AS (
  SELECT doc_id,
    coalesce(len(t), 0)::BIGINT AS n_tokens,
    CASE WHEN coalesce(len(t), 0) > 0
         THEN coalesce(list_sum(list_transform(t, x -> length(x))), 0)::DOUBLE / len(t)
         ELSE 0.0 END AS mean_token_len,
    CASE WHEN length(txt) > 0
         THEN length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))::DOUBLE / length(txt)
         ELSE 0.0 END AS alpha_ratio,
    CASE WHEN coalesce(len(t), 0) > 0
         THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
         ELSE 0.0 END AS stop_ratio
  FROM tokd
)
SELECT doc_id, n_tokens, round(mean_token_len, 6) AS mean_token_len,
  round(alpha_ratio, 6) AS alpha_ratio, round(stop_ratio, 6) AS stop_ratio,
  round(least(n_tokens / 20.0, 1.0) * 0.4 + alpha_ratio * 0.4
        + least(stop_ratio * 5.0, 1.0) * 0.2, 6) AS quality
FROM m"""


def q_token_counts(spark, sf_dir):
    df = textstats.token_counts(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_alpha_tokens").cast("long").alias("n_alpha_tokens"),
        F.col("n_bpeish_tokens").cast("long").alias("n_bpeish_tokens"),
    )


SQL_TOKEN_COUNTS = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT d.doc_id,
  length(coalesce(d.text, ''))::BIGINT AS n_chars,
  len(list_filter(regexp_split_to_array(coalesce(d.text, ''), '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
  coalesce(len(t.t), 0)::BIGINT AS n_alpha_tokens,
  len(regexp_extract_all(coalesce(d.text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))::BIGINT AS n_bpeish_tokens
FROM documents d JOIN tokd t ON d.doc_id = t.doc_id"""


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir))


SQL_FINGERPRINT = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(coalesce(t, []))), ' ')) AS fp
FROM tokd"""


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def q_payload_meta(spark, sf_dir):
    media = multimodal.wrap_text_as_media(_docs(spark, sf_dir))
    return multimodal.payload_meta(media).select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), "payload_md5"
    )


SQL_PAYLOAD_META = (
    "SELECT doc_id::BIGINT AS media_id, 'image' AS kind,"
    " strlen(coalesce(text, ''))::BIGINT AS n_bytes,"
    " md5(coalesce(text, '')) AS payload_md5 FROM documents"
)


_FEATURE_DIM = 8


def q_media_features(spark, sf_dir):
    """Feature-extraction plumbing (Arrow mapInPandas over binary payloads),
    exploded to hashable (media_id, kind, n_bytes, dim_idx, value) rows.

    The deterministic fake decoder (md5(payload)[i]/255) IS expressible in
    SQL, so this has a full value-hash oracle — not just a rows check."""
    media = multimodal.wrap_text_as_media(_docs(spark, sf_dir))
    feats = multimodal.extract_features(media, dim=_FEATURE_DIM)
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.posexplode("features").alias("dim_idx", "value"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.round("value", 6).alias("value"),
    )


def q_media_decode(spark, sf_dir):
    """REAL media decode: deterministic PPM/WAV payloads are generated
    distributed (closed-form in doc_id), then actually parsed back by the
    numpy container decoders; the oracle recomputes the expected decoded
    dimensions/means analytically in SQL (no decode on the oracle side) —
    so any parser bug breaks the value hash."""
    media = multimodal.synth_media(_docs(spark, sf_dir))
    out = multimodal.decode_features(media)
    return out.select(
        "media_id", "kind", "dim_a", "dim_b",
        F.round("mean_value", 6).alias("mean_value"),
    )


SQL_MEDIA_DECODE = """SELECT doc_id::BIGINT AS media_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
  (CASE WHEN doc_id % 2 = 0 THEN doc_id % 16 + 1 ELSE doc_id % 64 + 1 END)::BIGINT AS dim_a,
  (CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1 ELSE 8000 END)::BIGINT AS dim_b,
  round((CASE WHEN doc_id % 2 = 0 THEN doc_id % 256
              ELSE doc_id % 1000 - 500 END)::DOUBLE, 6) AS mean_value
FROM documents"""


# fake decoder: features[i] = byte i of md5(payload) / 255; payload is the
# UTF-8 text, so DuckDB's md5(text) sees the same bytes. k/255 has no exact
# 6-decimal ties (255 = 3*5*17 never divides k*10^6 unless k/255 is exact
# in tenths), so cross-engine round(,6) is stable.
SQL_MEDIA_FEATURES = f"""WITH dims AS (SELECT unnest(range(0, {_FEATURE_DIM})) AS dim_idx),
m AS (SELECT doc_id::BIGINT AS media_id, 'image' AS kind,
             strlen(coalesce(text, ''))::BIGINT AS n_bytes,
             md5(coalesce(text, '')) AS h
      FROM documents)
SELECT media_id, kind, n_bytes, dim_idx::BIGINT AS dim_idx,
       round((('0x' || substring(h, dim_idx * 2 + 1, 2))::INT) / 255.0, 6) AS value
FROM m CROSS JOIN dims"""




def q_media_resize(spark, sf_dir):
    """REAL decode->resize kernel: PPM payloads parsed and nearest-neighbor
    resized to 8x4; constant-pixel fixtures make the resized mean
    analytically exact (mean of a constant image is the constant at any
    output size), while the decoder+resampler still run for real."""
    media = multimodal.synth_media(_docs(spark, sf_dir))
    out = multimodal.resize_images(media, out_w=8, out_h=4)
    return out.select(
        "media_id", "in_w", "in_h", "out_w", "out_h",
        F.round("mean_value", 6).alias("mean_value"),
    )


SQL_MEDIA_RESIZE = """SELECT doc_id::BIGINT AS media_id,
  (doc_id % 16 + 1)::BIGINT AS in_w, (doc_id % 8 + 1)::BIGINT AS in_h,
  8::BIGINT AS out_w, 4::BIGINT AS out_h,
  round((doc_id % 256)::DOUBLE, 6) AS mean_value
FROM documents WHERE doc_id % 2 = 0"""


def q_video_frame_sample(spark, sf_dir):
    """Video frame sampling with real per-frame decode: each doc_id gets a
    (doc_id % 5 + 1)-frame synthetic video (length-prefixed PPM frames);
    every 2nd frame is decoded (skipped frames are length-seeked, never
    parsed) and its mean emitted. Frame means are closed-form in
    (doc_id, frame_idx), so the oracle is analytic SQL."""
    media = multimodal.synth_video(_docs(spark, sf_dir))
    out = multimodal.sample_frames(media, every=2)
    return out.select(
        "media_id", "frame_idx", F.round("mean_value", 6).alias("mean_value")
    )


SQL_VIDEO_FRAME_SAMPLE = """SELECT doc_id::BIGINT AS media_id,
  f::BIGINT AS frame_idx,
  round(((doc_id + f) % 256)::DOUBLE, 6) AS mean_value
FROM documents, unnest(range(0, doc_id % 5 + 1, 2)) AS t(f)"""


def q_windowed_counts(spark, sf_dir):
    """Tumbling event-time window x event_type rollup over the events
    table — the batch twin of the watermarked Structured Streaming
    aggregation (streaming/windowed.py stream_windowed_counts; late-data
    semantics asserted by test_stream_windowed_counts_watermark_semantics).
    Window boundaries are epoch-aligned hours, so DuckDB date_trunc is an
    exact oracle."""
    from searchengine_spark.streaming.windowed import windowed_event_agg

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_agg(events, window="1 hour")


SQL_WINDOWED_COUNTS = """SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def q_doc_keywords(spark, sf_dir, k: int = 3):
    """Per-doc top-k TF-IDF keywords (operators/textstats.doc_keywords):
    rank-pushdown window over tf x broadcast stats."""
    from searchengine_spark.operators.textstats import doc_keywords

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return doc_keywords(tf_table, stats, scalars.n_docs, k=k)


SQL_DOC_KEYWORDS = f"""WITH {BASE_CTES},
scored AS (
  SELECT tf.doc_id, tf.term,
    tf.tf * ln(c.n::DOUBLE / s.df) AS tfidf
  FROM tf JOIN stats s USING (term) CROSS JOIN consts c
)
SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf FROM (
  SELECT doc_id, term, tfidf,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3"""


def q_search_snippets(spark, sf_dir, query: str = "spark join",
                      k: int = 10, width: int = 30):
    """Top-k + first-hit snippet (operators/snippets.py): JVM
    lower/locate/substring over the k result docs only."""
    from searchengine_spark.operators.snippets import first_snippet

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    allsc = score_all(tf_table, stats, scalars, query, mode="bm25")
    topk = (
        allsc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    out = first_snippet(docs.join(F.broadcast(topk), "doc_id"),
                        query, width=width)
    return out.select("doc_id", "score", "snip_pos", "snippet")         .orderBy(F.desc("score"), F.asc("doc_id"))


def _search_snippets_sql(query: str = "spark join", k: int = 10,
                         width: int = 30) -> str:
    terms = ["spark", "join"]
    pos_exprs = ", ".join(f"strpos(lower(d.text), '{t}')" for t in terms)
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
topk AS (
  SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT {k}
),
hit AS (
  SELECT t.doc_id, t.score,
    (SELECT coalesce(min(p), 0) FROM unnest([{pos_exprs}]) AS u(p)
     WHERE p > 0) AS snip_pos,
    d.text
  FROM topk t JOIN documents d USING (doc_id)
)
SELECT doc_id, score, snip_pos::BIGINT AS snip_pos,
  CASE WHEN snip_pos > 0
       THEN substr(text, greatest(1, snip_pos - {width}), {2 * width})
       ELSE substr(text, 1, {width}) END AS snippet
FROM hit ORDER BY score DESC, doc_id ASC"""


def q_boolean_topk(spark, sf_dir,
                   query: str = "spark join +fast -slow", k: int = 10):
    """MUST/NOT boolean retrieval (operators/boolquery.py): BM25 over
    the scored terms, every '+' term required (semi-join gate), docs
    with any '-' term excluded (anti-join)."""
    from searchengine_spark.operators.boolquery import boolean_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    out = boolean_topk(tf_table, stats, scalars, query, k=k)
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


SQL_BOOLEAN_TOPK = f"""WITH {BASE_CTES},
{_query_cte("spark join fast")},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
scored AS (SELECT doc_id, sum(w) AS score FROM partial GROUP BY doc_id),
must_ok AS (SELECT doc_id FROM tf WHERE term IN ('fast')
            GROUP BY doc_id HAVING count(DISTINCT term) = 1),
excl AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'slow')
SELECT s.doc_id, round(s.score, 6) AS score
FROM scored s JOIN must_ok USING (doc_id)
WHERE s.doc_id NOT IN (SELECT doc_id FROM excl)
ORDER BY score DESC, doc_id ASC LIMIT 10"""


def q_phrase_topk(spark, sf_dir, phrase: str = "table hash", k: int = 10):
    """Exact-phrase retrieval (operators/positional.py): consecutive
    admitted-token match via posexplode + position-adjacency joins,
    BM25-scored on phrase tf (phrase as one synthetic term)."""
    from searchengine_spark.operators.positional import phrase_topk

    docs, forward, _, _, scalars = _index_parts(spark, sf_dir)
    out = phrase_topk(docs, forward, phrase, scalars.n_docs, scalars.avgdl,
                      k=k + 8)
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_TOKP_CTE = (
    "tokp AS (SELECT doc_id, unnest(t) AS term,"
    " generate_subscripts(t, 1) - 1 AS pos FROM tokd)"
)

_SYNTH_BM25_SELECT = f"""SELECT m.doc_id,
       round(ln((c.n - pd.pdf + 0.5) / (pd.pdf + 0.5) + 1.0)
             * (m.mtf * {BM25_K1 + 1.0})
             / (m.mtf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / c.avgdl)), 6) AS score
FROM m JOIN dl USING (doc_id) CROSS JOIN consts c CROSS JOIN pdfc pd
ORDER BY score DESC, doc_id ASC LIMIT 10"""

SQL_PHRASE_TOPK = f"""WITH {BASE_CTES},
{_TOKP_CTE},
h0 AS (SELECT doc_id, pos AS p0 FROM tokp WHERE term = 'table'),
h1 AS (SELECT doc_id, pos - 1 AS p0 FROM tokp WHERE term = 'hash'),
hits AS (SELECT h0.doc_id FROM h0 JOIN h1 USING (doc_id, p0)),
m AS (SELECT doc_id, count(*)::BIGINT AS mtf FROM hits GROUP BY 1),
pdfc AS (SELECT count(*)::BIGINT AS pdf FROM m)
{_SYNTH_BM25_SELECT}"""


def q_near_topk(spark, sf_dir, term_a: str = "spark", term_b: str = "join",
                window: int = 3, k: int = 10):
    """Proximity retrieval (operators/positional.py): docs with the two
    terms within ``window`` admitted tokens (any order), BM25-scored on
    the within-window occurrence-pair count."""
    from searchengine_spark.operators.positional import near_topk

    docs, forward, _, _, scalars = _index_parts(spark, sf_dir)
    out = near_topk(docs, forward, term_a, term_b, scalars.n_docs,
                    scalars.avgdl, window=window, k=k + 8)
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


SQL_NEAR_TOPK = f"""WITH {BASE_CTES},
{_TOKP_CTE},
m AS (SELECT a.doc_id, count(*)::BIGINT AS mtf
      FROM tokp a JOIN tokp b
        ON a.doc_id = b.doc_id AND b.term = 'join'
       AND abs(a.pos - b.pos) <= 3
      WHERE a.term = 'spark'
      GROUP BY 1),
pdfc AS (SELECT count(*)::BIGINT AS pdf FROM m)
{_SYNTH_BM25_SELECT}"""


def q_slop_topk(spark, sf_dir, term_a: str = "spark", term_b: str = "join",
                slop: int = 2, k: int = 10):
    """Ordered-proximity retrieval (operators/positional.py slop_topk):
    docs where ``term_a`` precedes ``term_b`` by 1..slop admitted tokens
    (Lucene PhraseQuery-with-slop for two terms), BM25-scored on the
    ordered occurrence-pair count."""
    from searchengine_spark.operators.positional import slop_topk

    docs, forward, _, _, scalars = _index_parts(spark, sf_dir)
    out = slop_topk(docs, forward, term_a, term_b, scalars.n_docs,
                    scalars.avgdl, slop=slop, k=k + 8)
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


SQL_SLOP_TOPK = f"""WITH {BASE_CTES},
{_TOKP_CTE},
m AS (SELECT a.doc_id, count(*)::BIGINT AS mtf
      FROM tokp a JOIN tokp b
        ON a.doc_id = b.doc_id AND b.term = 'join'
       AND b.pos - a.pos BETWEEN 1 AND 2
      WHERE a.term = 'spark'
      GROUP BY 1),
pdfc AS (SELECT count(*)::BIGINT AS pdf FROM m)
{_SYNTH_BM25_SELECT}"""


def q_suggest_prefix(spark, sf_dir, prefix: str = "s", k: int = 10):
    """Autocomplete over the term dictionary (operators/lexicon.py):
    contiguous-range prefix filter + df-ranked top-k."""
    from searchengine_spark.operators.lexicon import suggest_prefix

    _, _, _, stats, _ = _index_parts(spark, sf_dir)
    return suggest_prefix(stats, prefix, k=k)


SQL_SUGGEST_PREFIX = f"""WITH {BASE_CTES}
SELECT term, df FROM stats WHERE term LIKE 's%'
ORDER BY df DESC, term ASC LIMIT 10"""


def q_did_you_mean(spark, sf_dir, term: str = "sar", k: int = 5):
    """Spelling suggestion: levenshtein <= 2 over the lexicon with a
    pushed-down length pre-filter, ranked (distance, df)."""
    from searchengine_spark.operators.lexicon import did_you_mean

    _, _, _, stats, _ = _index_parts(spark, sf_dir)
    return did_you_mean(stats, term, k=k)


SQL_DID_YOU_MEAN = f"""WITH {BASE_CTES}
SELECT term, levenshtein(term, 'sar')::BIGINT AS dist, df
FROM stats
WHERE abs(length(term) - 3) <= 2
  AND levenshtein(term, 'sar') <= 2 AND term != 'sar'
ORDER BY dist ASC, df DESC, term ASC LIMIT 5"""


def q_sessionized_counts(spark, sf_dir, gap_minutes: int = 30):
    """Gap-based sessionization rollup (operators/events.py sessionize):
    one shuffle on user_id, lag + running-sum windows sharing the
    exchange+sort, per-session agg reusing the partitioning. Duration is
    integer microseconds so the oracle match is exact (no float drift)."""
    from searchengine_spark.operators.events import session_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_rollup(events, gap_minutes=gap_minutes)
    return out.select(
        "user_id", "session_seq", "n_events", "duration_us",
        F.round("sum_value", 6).alias("sum_value"),
    )


SQL_SESSIONIZED_COUNTS = """WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts) > 30*60*1000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq::BIGINT AS session_seq,
  count(*)::BIGINT AS n_events,
  date_diff('microsecond', min(ts), max(ts))::BIGINT AS duration_us,
  round(sum(value), 6) AS sum_value
FROM sess GROUP BY 1, 2"""


def q_sessionized_counts_bucketed(spark, sf_dir, gap_minutes: int = 30):
    """Same rollup as sessionized_counts but through the SKEW-SAFE
    two-phase sessionizer (operators/events.py sessionize_bucketed:
    (user, time-bucket) windows + summary-table stitching — no
    single-user partition ever exists). Same oracle: the two must be
    bit-identical."""
    from searchengine_spark.operators.events import _us, sessionize_bucketed

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        sessionize_bucketed(events, gap_minutes=gap_minutes,
                            bucket_hours=24)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (_us(F.max("ts")) - _us(F.min("ts"))).alias("duration_us"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    return out.select("user_id", "session_seq", "n_events", "duration_us",
                      "sum_value")


def q_user_top_events(spark, sf_dir, n: int = 2):
    """Per-key top-N (row_number + filter; rank-pushdown keeps only the
    running top-N per task — no full per-user sort materializes)."""
    from searchengine_spark.operators.events import top_events_per_user

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = top_events_per_user(events, n=n)
    return out.select("user_id", "rank", "event_id",
                      F.round("value", 6).alias("value"))


SQL_USER_TOP_EVENTS = """SELECT user_id, rank, event_id,
  round(value, 6) AS value
FROM (
  SELECT user_id, event_id, value,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rank
  FROM events
) WHERE rank <= 2"""


def q_event_props_stats(spark, sf_dir):
    """Typed JSON property extraction + agg, fully JVM-side
    (get_json_object path expression inside whole-stage codegen; the
    props string never reaches Python)."""
    from searchengine_spark.operators.events import props_stats

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return props_stats(events, key="k")


SQL_EVENT_PROPS_STATS = """SELECT event_type,
  count(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS n_with_key,
  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
  min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
  max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY 1"""


# ---------------------------------------------------------------------------
# substring-span dedup / temporal / hybrid retrieval / distribution profiling
# ---------------------------------------------------------------------------

_SPAN_LEN = 8


def _span_cte(source: str = "documents", suffix: str = "") -> str:
    """DuckDB CTEs ``tokd{suffix}``/``spans{suffix}``: every
    length-_SPAN_LEN token window of every ``source`` doc,
    md5-fingerprinted (span semantics of operators/spans.py)."""
    L = _SPAN_LEN
    return f"""tokd{suffix} AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM {source}),
spans{suffix} AS (
  SELECT doc_id, md5(array_to_string(list_slice(t, i, i + {L - 1}), ' ')) AS span_md5
  FROM tokd{suffix}, unnest(range(1, greatest(len(t) - {L - 1}, 0) + 1)) AS u(i)
)"""


def q_span_dups(spark, sf_dir):
    """ExactSubstr-style duplicated token spans (operators/spans.py):
    in-row window fingerprinting + ONE hash agg — never pairwise."""
    from searchengine_spark.operators.spans import duplicated_spans

    return duplicated_spans(_docs(spark, sf_dir), span_len=_SPAN_LEN)


SQL_SPAN_DUPS = f"""WITH {_span_cte()}
SELECT span_md5, count(DISTINCT doc_id)::BIGINT AS n_docs,
  count(*)::BIGINT AS n_occurrences
FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) > 1"""


def q_span_dup_flags(spark, sf_dir):
    """Per-doc duplicated-span coverage — the substring-granular removal
    signal (docs shorter than the span length carry no windows and are
    absent, matching the SQL GROUP BY)."""
    from searchengine_spark.operators.spans import span_dup_flags

    return span_dup_flags(_docs(spark, sf_dir), span_len=_SPAN_LEN)


SQL_SPAN_DUP_FLAGS = f"""WITH {_span_cte()},
dups AS (SELECT span_md5 FROM spans GROUP BY 1
         HAVING count(DISTINCT doc_id) > 1)
SELECT s.doc_id, count(*)::BIGINT AS n_spans,
  sum(CASE WHEN d.span_md5 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
FROM spans s LEFT JOIN dups d USING (span_md5) GROUP BY 1"""


def q_asof_enrich(spark, sf_dir):
    """As-of join (operators/temporal.py): each purchase event gets the
    most recent prior-or-equal view event of the same user — union +
    one running-window pass, no range-join pair explosion."""
    from searchengine_spark.operators.temporal import asof_join

    ev = _load(spark, sf_dir, "events")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "view"),
        key="user_id", ts="ts", tiebreak="event_id",
        payload=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ref_event_id").cast("long").alias("ref_event_id"),
        F.round("ref_value", 6).alias("ref_value"),
    )


SQL_ASOF_ENRICH = """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
v AS (SELECT * FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, v.event_id AS ref_event_id,
  round(v.value, 6) AS ref_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"""


def q_event_bigrams(spark, sf_dir):
    """Adjacent event-type transition counts per user (sequence mining);
    output bounded by |types|^2 regardless of row count."""
    from searchengine_spark.operators.temporal import event_type_bigrams

    return event_type_bigrams(_load(spark, sf_dir, "events"))


SQL_EVENT_BIGRAMS = """WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type
  FROM events)
SELECT prev_type, event_type, count(*)::BIGINT AS n_pairs
FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2"""


_RRF_DEPTH = 20


def q_hybrid_rrf(spark, sf_dir, query: str = "spark join fast",
                 k: int = 10, depth: int = _RRF_DEPTH):
    """Hybrid retrieval: RRF fusion (operators/hybrid.py) of the lexical
    BM25 top-`depth` (documents) and the dense cosine top-`depth`
    (embeddings; vec_id ≡ doc_id). Both inputs are k-row; the fusion is
    a union + one agg over O(2·depth) rows."""
    from searchengine_spark.operators.hybrid import rrf_fuse, with_rank

    lex = _bm25_topk(query, depth)(spark, sf_dir)
    dense = similarity.cosine_topk(
        _load(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir),
        k=depth)
    return rrf_fuse(
        [with_rank(lex, "doc_id", "score"),
         with_rank(dense, "vec_id", "cos")],
        id_col="doc_id", k=k,
    )


def _hybrid_rrf_sql(query: str, k: int = 10, depth: int = _RRF_DEPTH) -> str:
    cos_topk = f"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c
ORDER BY cos DESC, vec_id ASC LIMIT {depth}"""
    return f"""WITH lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM ({_bm25_topk_sql(query, depth)})
),
dense AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r
  FROM ({cos_topk})
),
u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense)
SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf_score,
  count(*)::BIGINT AS n_lists
FROM u GROUP BY 1 ORDER BY rrf_score DESC, doc_id ASC LIMIT {k}"""


_QUANTILE_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9)


def q_quality_quantiles(spark, sf_dir):
    """Per-source EXACT quality-score percentiles (operators/profiling.py)
    — the threshold-picking profile. Exact `percentile` is the validation
    path; the mergeable GK sketch twin (`score_quantiles_approx`) is the
    100 TB path, error-pinned in tests/test_profiling.py."""
    from searchengine_spark.operators.profiling import score_quantiles

    docs = _docs(spark, sf_dir)
    scored = (
        textstats.quality_score(docs).select("doc_id", "quality")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    return score_quantiles(scored, "quality", "source",
                           probs=_QUANTILE_PROBS)


# quality formula as reusable CTE pieces (same arithmetic as SQL_QUALITY)
_QUALITY_CTE = f"""qtok AS (
  SELECT d.doc_id, {_TOKS_TEXT} AS t, coalesce(d.text, '') AS txt FROM documents d
),
qbase AS (
  SELECT doc_id,
    round(least(coalesce(len(t), 0) / 20.0, 1.0) * 0.4
      + (CASE WHEN length(txt) > 0
              THEN length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))::DOUBLE / length(txt)
              ELSE 0.0 END) * 0.4
      + least((CASE WHEN coalesce(len(t), 0) > 0
                    THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
                    ELSE 0.0 END) * 5.0, 1.0) * 0.2, 6) AS quality
  FROM qtok
)"""


SQL_QUALITY_QUANTILES = f"""WITH {_QUALITY_CTE},
qd AS (SELECT b.quality, d.source FROM qbase b JOIN documents d USING (doc_id)),
agg AS (SELECT source,
        quantile_cont(quality, [{', '.join(str(p) for p in _QUANTILE_PROBS)}]) AS qs
        FROM qd GROUP BY 1)
SELECT source, round(p.pct, 6) AS pct, round(qs[p.i], 5) AS value
FROM agg CROSS JOIN (VALUES {', '.join(f'({i + 1}, {p})' for i, p in enumerate(_QUANTILE_PROBS))}) p(i, pct)"""


def q_source_mix(spark, sf_dir):
    """Mixture-weighted deterministic downsampling (operators/mixing.py):
    target = 20% for the first source, the rest uniform; the binding
    source keeps 100%, every other is hash-bucket downsampled so the KEPT
    corpus matches the target weights. One tiny per-source count agg +
    a stateless row filter."""
    from searchengine_spark.operators.mixing import mix_sources

    docs = _docs(spark, sf_dir)
    sources = sorted(r["source"] for r in
                     docs.select("source").distinct().collect())
    heavy, n = sources[0], len(sources)
    target = {s: (0.2 if s == heavy else 0.8 / (n - 1)) for s in sources}
    out = mix_sources(docs, target, salt="mix-v1")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


# Same arithmetic, same order of float ops (w*t/c), floor NOT round for the
# bucket threshold (Spark's cast-to-long truncates; DuckDB CAST rounds).
SQL_SOURCE_MIX = f"""WITH ns AS (SELECT count(DISTINCT source)::BIGINT AS n FROM documents),
heavy AS (SELECT min(source) AS h FROM documents),
cnt AS (SELECT source, count(*)::BIGINT AS c FROM documents GROUP BY 1),
w AS (SELECT source, c,
        CASE WHEN source = h THEN 0.2 ELSE 0.8 / (n - 1) END AS w
      FROM cnt, ns, heavy),
tt AS (SELECT min(c / w) AS t FROM w),
fr AS (SELECT source, least(w * t / c, 1.0) AS f FROM w, tt)
SELECT d.doc_id::BIGINT AS doc_id, d.source
FROM documents d JOIN fr USING (source)
WHERE {_DUCK_BUCKET.format(salt='mix-v1')} < floor(f * 10000)::BIGINT"""





def q_quality_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling (operators/sampling.py
    weighted_sample): each doc kept with probability == its quality score
    — the "data diet" curriculum move — decided by the content-stable
    hash bucket, so membership is reproducible across runs and engines."""
    from searchengine_spark.operators.sampling import weighted_sample

    scored = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality")
    return weighted_sample(scored, "quality", salt="wsample-v1").select(
        F.col("doc_id").cast("long").alias("doc_id"))


SQL_QUALITY_WEIGHTED_SAMPLE = f"""WITH {_QUALITY_CTE}
SELECT doc_id::BIGINT AS doc_id FROM qbase
WHERE {_DUCK_BUCKET.format(salt='wsample-v1')} < floor(quality * 10000)::BIGINT"""


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware cluster canonicalization (operators/dedup.py
    keep_best): within each near-dup component, keep the HIGHEST-quality
    member (tie: min doc_id) instead of the earliest — the keeper choice
    a training pipeline actually wants."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components(pairs)
    scores = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality")
    out = dedup.keep_best(comp, scores)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        "keep",
    )


SQL_DEDUP_KEEP_BEST = f"""WITH RECURSIVE {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
),
comp AS (SELECT node AS doc_id, min(label) AS component
         FROM reach GROUP BY node),
{_QUALITY_CTE}
SELECT c.doc_id::BIGINT AS doc_id, c.component::BIGINT AS component,
  (row_number() OVER (PARTITION BY c.component
                      ORDER BY q.quality DESC, c.doc_id ASC) = 1) AS keep
FROM comp c JOIN qbase q USING (doc_id)"""


def q_bm25_page2(spark, sf_dir, query: str = "spark join fast",
                 k: int = 10):
    """Cursor pagination (operators/topk.py score_topk_after): page 2 is
    fetched through the SEARCH-AFTER predicate (score < cursor OR
    (= cursor AND doc_id > cursor-doc)) seeded from page 1's last row —
    while the oracle fetches it with OFFSET/LIMIT. Two different access
    paths that must agree row-for-row."""
    from searchengine_spark.operators.topk import score_topk_after

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    page1 = _bm25_topk(query, k)(spark, sf_dir).collect()
    last = page1[-1]
    return score_topk_after(tf_table, stats, scalars, query,
                            float(last["score"]), int(last["doc_id"]), k=k)


def _bm25_page2_sql(query: str, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k} OFFSET {k}"""


_MLT_DOC, _MLT_E = 7, 5


def q_more_like_this(spark, sf_dir, doc_id: int = _MLT_DOC, k: int = 10):
    """Related-document retrieval (operators/mlt.py): the seed doc's e
    most characteristic terms (tf·ln(N/df)) run as a BM25 query with the
    seed excluded — the Lucene MoreLikeThis analog."""
    from searchengine_spark.operators.mlt import more_like_this

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return more_like_this(tf_table, stats, scalars, doc_id, k=k, e=_MLT_E)


def _more_like_this_sql(doc_id: int = _MLT_DOC, k: int = 10,
                        e: int = _MLT_E) -> str:
    return f"""WITH {BASE_CTES},
seed AS (
  SELECT tf.term, round(tf.tf * ln(c.n / s.df), 6) AS w
  FROM tf JOIN stats s USING (term) CROSS JOIN consts c
  WHERE tf.doc_id = {doc_id}),
q AS (SELECT term, 1.0::DOUBLE AS qf FROM seed
      ORDER BY w DESC, term ASC LIMIT {e}),
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term)
  JOIN dl USING (doc_id) CROSS JOIN consts c
  WHERE tf.doc_id <> {doc_id}
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_PRF_R, _PRF_E, _PRF_BETA = 10, 3, 0.4


def q_prf_topk(spark, sf_dir, query: str = "spark join fast", k: int = 10):
    """Pseudo-relevance feedback (operators/prf.py): BM25 top-r docs ->
    top-e expansion terms by tf·ln(N/df) -> re-score with expansion terms
    at weight β. Two broadcast-query passes; the mining agg touches only
    the top-r docs' postings."""
    from searchengine_spark.operators.prf import prf_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return prf_topk(tf_table, stats, scalars, query, k=k,
                    r=_PRF_R, e=_PRF_E, beta=_PRF_BETA)


def _prf_topk_sql(query: str, k: int = 10, r: int = _PRF_R,
                  e: int = _PRF_E, beta: float = _PRF_BETA) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial0 AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
base AS (SELECT doc_id FROM (
  SELECT doc_id, round(sum(w), 6) AS score FROM partial0 GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT {r})),
expw AS (
  SELECT tf.term, round(sum(tf.tf * ln(c.n / s.df)), 6) AS w
  FROM tf JOIN base USING (doc_id) JOIN stats s USING (term)
  CROSS JOIN consts c
  WHERE tf.term NOT IN (SELECT term FROM q)
  GROUP BY tf.term),
exp AS (SELECT term, {beta}::DOUBLE AS qf FROM expw
        ORDER BY w DESC, term ASC LIMIT {e}),
q2 AS (SELECT term, qf::DOUBLE AS qf FROM q
       UNION ALL SELECT term, qf FROM exp),
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q2 q USING (term) JOIN stats s USING (term)
  JOIN dl USING (doc_id) CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def q_clean_corpus(spark, sf_dir):
    """End-to-end cleaning recipe — the composition the individual
    operators exist for: exact keep-first dedup -> quality >= 0.75 ->
    lang 'en' -> drop docs with >50% duplicated-span coverage. Span
    coverage is computed over the DEDUPED corpus (order matters: on the
    raw corpus every surviving keep-first winner would be flagged by the
    very duplicate that was just removed). Returns the kept doc_ids (the
    strongest checkable artifact: per-doc membership, not counts). Every
    stage drops rows at sf0.01, so no stage is vacuous. At production
    scale the per-doc text signals are computed as columns of ONE
    tokenizer pass and persisted; here each rides its own operator so
    the gate exercises the real modules."""
    from searchengine_spark.operators.spans import span_dup_flags

    docs = _docs(spark, sf_dir)
    keep_first = docs.groupBy(F.md5("text").alias("_m")).agg(
        F.min("doc_id").alias("doc_id"))
    deduped = docs.join(keep_first.select("doc_id"), "doc_id", "left_semi")
    qual = textstats.quality_score(docs).select("doc_id", "quality")
    lang = textstats.lang_id(docs).select("doc_id", "lang_pred")
    sp = span_dup_flags(deduped).select(
        "doc_id",
        (F.col("n_dup_spans").cast("double") / F.col("n_spans"))
        .alias("_dupfrac"))
    return (
        deduped.select("doc_id")
        .join(qual, "doc_id").where(F.col("quality") >= 0.75)
        .join(lang, "doc_id").where(F.col("lang_pred") == "en")
        .join(sp, "doc_id", "left")
        .where(F.coalesce("_dupfrac", F.lit(0.0)) <= 0.5)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _clean_corpus_sql() -> str:
    return f"""WITH kf AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
qual AS (SELECT doc_id, quality FROM ({SQL_QUALITY})),
lang AS (SELECT doc_id, lang_pred FROM ({SQL_LANG_ID})),
dd AS (SELECT d.doc_id, d.text FROM documents d JOIN kf USING (doc_id)),
{_span_cte(source="dd", suffix="2")},
dups2 AS (SELECT span_md5 FROM spans2 GROUP BY 1
          HAVING count(DISTINCT doc_id) > 1),
sp AS (
  SELECT s.doc_id,
    sum(CASE WHEN d.span_md5 IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
      / count(*) AS dupfrac
  FROM spans2 s LEFT JOIN dups2 d USING (span_md5) GROUP BY 1)
SELECT kf.doc_id::BIGINT AS doc_id
FROM kf JOIN qual USING (doc_id) JOIN lang USING (doc_id)
LEFT JOIN sp USING (doc_id)
WHERE quality >= 0.75 AND lang_pred = 'en'
  AND coalesce(dupfrac, 0.0) <= 0.5"""


def q_pq_topk(spark, sf_dir):
    """PQ-ADC ANN (similarity.py pq_topk): codebook-train + encode +
    asymmetric-distance candidate scan (m JVM array lookups per row over
    the m-byte codes — 16x smaller than the raw vectors) + exact re-rank
    of the top-100 (verified rank-identical to brute force at sf0.001,
    0.01, AND 0.1). At this corpus/config the candidate margin covers the
    quantization error, so the result is rank-identical to brute force —
    the exact SQL oracle; recall honesty is pinned in pytest."""
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, _query_vec(spark, sf_dir), k=10)


def q_source_term_cardinality(spark, sf_dir):
    """Per-source EXACT distinct-term counts (operators/profiling.py) —
    the vocabulary-size profile. Exact countDistinct is the validation
    path; the HLL++ twin (approx=True, one mergeable agg, O(1/rsd²)
    state) is the 100 TB path, error-pinned in pytest."""
    from searchengine_spark.operators.profiling import group_cardinality

    toks = (
        dedup.with_tokens(_docs(spark, sf_dir))
        .select("source", F.explode("tokens").alias("term"))
    )
    return group_cardinality(toks, "source", "term", approx=False)


SQL_SOURCE_TERM_CARDINALITY = f"""WITH tokd AS (
  SELECT source, {_TOKS_TEXT} AS t FROM documents),
toks AS (SELECT source, unnest(t) AS term FROM tokd)
SELECT source, count(DISTINCT term)::BIGINT AS n_distinct
FROM toks GROUP BY 1"""


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

_COLLAPSE_QUERY = "spark join fast"
_COLLAPSE_K = 8


def q_collapse_topk(spark, sf_dir):
    """Field collapsing (operators/collapse.py): grouped top-k with the
    documents' source as the collapse field — best doc per source, groups
    ranked by their best score. The conversation-level serving twin is
    engine.search_convs (WAND over-fetch); this is the exact path."""
    from searchengine_spark.operators.collapse import collapse_topk

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    groups = docs.select("doc_id", F.col("source").alias("group"))
    return collapse_topk(tf_table, stats, scalars, groups,
                         _COLLAPSE_QUERY, k=_COLLAPSE_K, agg="max")


SQL_COLLAPSE_TOPK = f"""WITH {BASE_CTES},
{_query_cte(_COLLAPSE_QUERY)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
scores AS (SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id),
g AS (SELECT d.source AS grp, sc.score, sc.doc_id
      FROM scores sc JOIN documents d USING (doc_id)),
best AS (SELECT grp, doc_id AS best_doc_id FROM (
  SELECT grp, doc_id,
         row_number() OVER (PARTITION BY grp ORDER BY score DESC, doc_id ASC) AS rn
  FROM g) WHERE rn = 1),
aggd AS (SELECT grp, max(score) AS group_score, count(*)::BIGINT AS n_matching
         FROM g GROUP BY 1)
SELECT a.grp AS "group", a.group_score, b.best_doc_id, a.n_matching
FROM aggd a JOIN best b USING (grp)
ORDER BY group_score DESC, "group" ASC LIMIT {_COLLAPSE_K}"""


_PREFIX_Q = "s"
_PREFIX_EXPAND = 5
_FUZZY_Q = "slot"
_FUZZY_DIST = 2
_FUZZY_EXPAND = 3

# the BM25 partial with the expansion standing in for the query-term CTE
# (expansion aliased q so _BM25_W's q.qf resolves to the rewrite weight)
_EXPANDED_SCORE_SQL = f"""partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN exp q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10"""


def q_prefix_search(spark, sf_dir):
    """Wildcard rewrite `s*` (operators/lexicon.py prefix_search_topk):
    dictionary expansion (df-ranked, capped) -> weighted BM25 OR-union."""
    from searchengine_spark.operators.lexicon import prefix_search_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return prefix_search_topk(tf_table, stats, scalars, _PREFIX_Q,
                              k=10, n_expand=_PREFIX_EXPAND)


SQL_PREFIX_SEARCH = f"""WITH {BASE_CTES},
exp AS (
  SELECT term, 1.0 AS qf FROM stats
  WHERE term LIKE '{_PREFIX_Q}%'
  ORDER BY df DESC, term ASC LIMIT {_PREFIX_EXPAND}
),
{_EXPANDED_SCORE_SQL}"""


def q_fuzzy_search(spark, sf_dir):
    """Fuzzy rewrite `slot~2` (operators/lexicon.py fuzzy_search_topk):
    levenshtein expansion weighted 1/(1+dist) -> BM25 OR-union. The
    corpus dictionary expands this to slow (dist 1) + sort (dist 2)."""
    from searchengine_spark.operators.lexicon import fuzzy_search_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return fuzzy_search_topk(tf_table, stats, scalars, _FUZZY_Q,
                             k=10, max_dist=_FUZZY_DIST,
                             n_expand=_FUZZY_EXPAND)


SQL_FUZZY_SEARCH = f"""WITH {BASE_CTES},
exp AS (
  SELECT term, 1.0 / (1 + levenshtein(term, '{_FUZZY_Q}')) AS qf FROM stats
  WHERE abs(length(term) - {len(_FUZZY_Q)}) <= {_FUZZY_DIST}
    AND levenshtein(term, '{_FUZZY_Q}') <= {_FUZZY_DIST}
  ORDER BY levenshtein(term, '{_FUZZY_Q}') ASC, df DESC, term ASC
  LIMIT {_FUZZY_EXPAND}
),
{_EXPANDED_SCORE_SQL}"""


_REGEX_PAT = "ow$"
_REGEX_EXPAND = 5


def q_regex_search(spark, sf_dir):
    """Regex rewrite `/ow$/` (operators/lexicon.py regex_search_topk):
    the dictionary terms matching the pattern (slow/row/window in this
    corpus), df-ranked and capped, scored as a unit-weight BM25
    OR-union."""
    from searchengine_spark.operators.lexicon import regex_search_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return regex_search_topk(tf_table, stats, scalars, _REGEX_PAT,
                             k=10, n_expand=_REGEX_EXPAND)


SQL_REGEX_SEARCH = f"""WITH {BASE_CTES},
exp AS (
  SELECT term, 1.0 AS qf FROM stats
  WHERE regexp_matches(term, '{_REGEX_PAT}')
  ORDER BY df DESC, term ASC LIMIT {_REGEX_EXPAND}
),
{_EXPANDED_SCORE_SQL}"""


_MMR_K = 10
_MMR_POOL = 30
_MMR_LAM = 0.7


def q_mmr_topk(spark, sf_dir):
    """MMR-diversified top-k (operators/similarity.py mmr_topk): exact
    cosine pool (distributed) + greedy maximal-marginal-relevance
    selection over the pool-row candidate set. Query = embeddings[0],
    itself excluded."""
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.mmr_topk(emb, _query_vec(spark, sf_dir), k=_MMR_K,
                               pool=_MMR_POOL, lam=_MMR_LAM,
                               exclude_ids=(0,))


SQL_MMR_TOPK = f"""WITH RECURSIVE
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id, embedding,
    round(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))), 5) AS rel
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
),
pool AS (SELECT vec_id, embedding, rel FROM c ORDER BY rel DESC, vec_id ASC LIMIT {_MMR_POOL}),
sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 5) AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
sel AS (
  SELECT * FROM (
    SELECT 1 AS rank, vec_id, rel, [vec_id] AS picked
    FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
  )
  UNION ALL
  SELECT s.rank + 1, nxt.vec_id, nxt.rel, list_append(s.picked, nxt.vec_id)
  FROM sel s, LATERAL (
    SELECT p.vec_id, p.rel
    FROM pool p
    WHERE NOT list_contains(s.picked, p.vec_id)
    ORDER BY round({_MMR_LAM} * p.rel - {round(1.0 - _MMR_LAM, 10)} *
        (SELECT max(sim) FROM sims WHERE ia = p.vec_id AND list_contains(s.picked, ib)), 5) DESC,
      p.vec_id ASC
    LIMIT 1
  ) nxt
  WHERE s.rank < {_MMR_K}
)
SELECT rank, vec_id, rel FROM sel ORDER BY rank ASC"""


_BUDGET_TOKENS = 800


def q_budget_select(spark, sf_dir):
    """Token-budget corpus selection (operators/packing.py
    budget_select): quality-ranked greedy prefix under a token budget —
    the "best N tokens" curation step. Two-phase prefix sum, no global
    window."""
    from searchengine_spark.operators.packing import budget_select

    qs = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    return budget_select(qs, _BUDGET_TOKENS, len_col="n_tokens")


SQL_BUDGET_SELECT = f"""WITH {_QUALITY_CTE},
qn AS (SELECT doc_id, coalesce(len(t), 0)::BIGINT AS n_tokens FROM qtok),
j AS (SELECT b.doc_id, b.quality, n.n_tokens FROM qbase b JOIN qn n USING (doc_id)),
w AS (SELECT doc_id, quality, n_tokens,
        sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM j)
SELECT doc_id, quality, n_tokens, cum_tokens FROM w
WHERE cum_tokens <= {_BUDGET_TOKENS}
ORDER BY quality DESC, doc_id ASC"""


_LM_QUERY = "spark join fast"
_LM_MU = 2000.0


def q_lm_dirichlet_topk(spark, sf_dir):
    """Dirichlet-smoothed query likelihood (operators/topk.py
    lm_dirichlet_topk) — the second probabilistic scorer next to BM25;
    rank-equivalent sparse form, per-doc addend rides the hash agg."""
    from searchengine_spark.operators.topk import lm_dirichlet_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return lm_dirichlet_topk(tf_table, stats, scalars, _LM_QUERY,
                             k=10, mu=_LM_MU)


def _lm_dirichlet_sql(query: str, k: int = 10, mu: float = _LM_MU) -> str:
    # |q| = IN-VOCAB query tokens (OOV terms have p(t|C)=0 — dropped on
    # both sides of the rank equivalence, matching the operator)
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
tot AS (SELECT sum(dl)::DOUBLE AS c FROM dl),
qlen AS (SELECT sum(qf)::DOUBLE AS n FROM q JOIN stats USING (term)),
partial AS (
  SELECT tf.doc_id, q.qf * ln(1.0 + tf.tf / ({mu} * (s.cf::DOUBLE / t.c))) AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) CROSS JOIN tot t
),
agg AS (SELECT doc_id, sum(w) AS s FROM partial GROUP BY 1)
SELECT a.doc_id, round(a.s + ql.n * ln({mu} / (dl.dl + {mu})), 6) AS score
FROM agg a JOIN dl ON dl.doc_id = a.doc_id CROSS JOIN qlen ql
ORDER BY score DESC, a.doc_id ASC LIMIT {k}"""


_BM25F_QUERY = "spark join fast"
_BM25F_TITLE_LEN = 8
_BM25F_W_TITLE, _BM25F_W_BODY = 2.0, 1.0
_BM25F_B_TITLE, _BM25F_B_BODY = 0.5, 0.75


def q_bm25f_topk(spark, sf_dir):
    """TRUE BM25F (operators/fielded.py bm25f_topk): field-weighted,
    per-field-length-normalized tf accumulated ACROSS fields, saturated
    once with document-level idf (Robertson & Zaragoza 2009 §3.3).
    Fields = title (first 8 tokens) / body (rest)."""
    from searchengine_spark.operators.fielded import bm25f_topk

    docs, _, _, stats, scalars = _index_parts(spark, sf_dir)
    return bm25f_topk(
        docs, stats, scalars.n_docs, _BM25F_QUERY, k=10,
        title_len=_BM25F_TITLE_LEN,
        weights={"title": _BM25F_W_TITLE, "body": _BM25F_W_BODY},
        b_per_field={"title": _BM25F_B_TITLE, "body": _BM25F_B_BODY},
    )


_BM25F_W_SQL = f"CASE WHEN f.field = 'title' THEN {_BM25F_W_TITLE} ELSE {_BM25F_W_BODY} END"
_BM25F_B_SQL = f"CASE WHEN f.field = 'title' THEN {_BM25F_B_TITLE} ELSE {_BM25F_B_BODY} END"


def _bm25f_sql(query: str, k: int = 10) -> str:
    t = _BM25F_TITLE_LEN
    return f"""WITH {BASE_CTES},
fslice AS (SELECT doc_id, t[1:{t}] AS title, t[{t + 1}:] AS body FROM tokd),
funion AS (
  SELECT doc_id, 'title' AS field, unnest(title) AS term, len(title)::BIGINT AS fdl FROM fslice
  UNION ALL
  SELECT doc_id, 'body' AS field, unnest(body) AS term, len(body)::BIGINT AS fdl FROM fslice
),
ftf AS (SELECT doc_id, field, term, fdl, count(*)::BIGINT AS tf FROM funion GROUP BY 1, 2, 3, 4),
fscal AS (SELECT field, avg(fdl) AS avgfdl
          FROM (SELECT DISTINCT doc_id, field, fdl FROM funion) GROUP BY 1),
{_query_cte(query)},
wtf AS (
  SELECT f.doc_id, f.term,
         sum(({_BM25F_W_SQL}) * f.tf
             / (1.0 - ({_BM25F_B_SQL}) + ({_BM25F_B_SQL}) * f.fdl / sc.avgfdl)) AS wtf
  FROM ftf f JOIN q USING (term) JOIN fscal sc USING (field)
  GROUP BY 1, 2
),
partial AS (
  SELECT w.doc_id,
         q.qf * ln((c.n - s.df + 0.5) / (s.df + 0.5) + 1.0)
              * w.wtf / ({BM25_K1} + w.wtf) AS p
  FROM wtf w JOIN q USING (term) JOIN stats s USING (term) CROSS JOIN consts c
)
SELECT doc_id, round(sum(p), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_DECAY_QUERY = "spark join fast"
_DECAY_BASE = 1700000000
_DECAY_NOW = _DECAY_BASE + 600000
_DECAY_HALF = 86400.0


def q_decay_topk(spark, sf_dir):
    """Recency-decayed BM25 (operators/topk.py decay_topk): score *
    2^(-age/half_life), Elasticsearch function_score exp-decay analog.
    The documents proxy carries no timestamp, so the gate derives a
    deterministic one from doc_id (base + (doc_id % 10000) * 60 s) on
    BOTH engines; transcripts use the doc_map ts."""
    from searchengine_spark.operators.topk import decay_topk

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    doc_ts = docs.select(
        "doc_id",
        (F.lit(float(_DECAY_BASE))
         + (F.col("doc_id") % 10000).cast("double") * F.lit(60.0)).alias("ts_s"),
    )
    return decay_topk(tf_table, stats, scalars, doc_ts, _DECAY_QUERY,
                      now_s=float(_DECAY_NOW), half_life_s=_DECAY_HALF, k=10)


def _decay_topk_sql(query: str, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
agg AS (SELECT doc_id, sum(w) AS s FROM partial GROUP BY 1)
SELECT doc_id,
       round(s * power(2.0, -({float(_DECAY_NOW)} - ({float(_DECAY_BASE)} + (doc_id % 10000) * 60.0)) / {_DECAY_HALF}), 6) AS score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_SYN_QUERY = "spark join fast"
_SYN_TABLE = [("join", "merge", 0.6), ("fast", "stream", 0.3)]


def q_synonym_topk(spark, sf_dir):
    """Query-time weighted synonym expansion (operators/lexicon.py
    synonym_search_topk): originals at full weight + synonyms at damped
    weight, summed per term, scored as one weighted BM25 OR-union."""
    from searchengine_spark.operators.lexicon import synonym_search_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    syn = spark.createDataFrame(_SYN_TABLE, "term string, syn string, weight double")
    return synonym_search_topk(tf_table, stats, scalars, _SYN_QUERY, syn, k=10)


def _synonym_topk_sql(query: str, k: int = 10) -> str:
    vals = ", ".join(f"('{t}', '{s}', {w})" for t, s, w in _SYN_TABLE)
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
syn(term, syn, w) AS (VALUES {vals}),
expall AS (
  SELECT term, qf::DOUBLE AS qf FROM q
  UNION ALL
  SELECT s.syn AS term, q0.qf * s.w AS qf FROM q q0 JOIN syn s USING (term)
),
exp AS (SELECT term, sum(qf) AS qf FROM expall GROUP BY 1),
{_EXPANDED_SCORE_SQL}"""


_FILTER_QUERY = "spark join fast"
_FILTER_LANG = "en"


def q_filtered_topk(spark, sf_dir):
    """Metadata-filtered BM25 (operators/topk.py filtered_topk): rank
    only lang='en' docs; left-semi filter BEFORE scoring, global corpus
    stats (standard filtered-search semantics)."""
    from searchengine_spark.operators.topk import filtered_topk

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    allowed = docs.filter(F.col("lang") == _FILTER_LANG).select("doc_id")
    return filtered_topk(tf_table, stats, scalars, allowed,
                         _FILTER_QUERY, k=10)


def _filtered_topk_sql(query: str, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
allowed AS (SELECT doc_id FROM documents WHERE lang = '{_FILTER_LANG}'),
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN allowed USING (doc_id)
          JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_COUNT_QUERY = "spark join fast"


def q_match_count(spark, sf_dir):
    """Total-hit counts (operators/topk.py match_count): one row with
    the OR-semantics candidate count and the AND-semantics count."""
    from searchengine_spark.operators.topk import match_count

    _, _, tf_table, *_ = _index_parts(spark, sf_dir)
    any_n = match_count(tf_table, _COUNT_QUERY, require_all=False)
    all_n = (match_count(tf_table, _COUNT_QUERY, require_all=True)
             .withColumnRenamed("n_hits", "n_hits_all"))
    return any_n.crossJoin(all_n)


def _match_count_sql(query: str) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
matched AS (SELECT DISTINCT tf.doc_id, tf.term FROM tf JOIN q USING (term)),
anyc AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_hits FROM matched),
allc AS (
  SELECT count(*)::BIGINT AS n_hits_all FROM (
    SELECT doc_id FROM matched GROUP BY doc_id
    HAVING count(DISTINCT term) = (SELECT count(*) FROM q)
  )
)
SELECT anyc.n_hits, allc.n_hits_all FROM anyc CROSS JOIN allc"""


# -- round-3: result-set analytics + ranking evaluation --------------------

_SIG_QUERY = "spark join fast"
_SIG_K = 100
_SIG_TOP = 10
_SIG_MIN_DF = 2


def q_significant_terms(spark, sf_dir):
    """JLH significant terms over the query's top-100 hit set
    (operators/sigterms.py) — the ES significant_terms aggregation:
    terms unusually frequent in the hits relative to the corpus. The
    hit set is the same rounded-then-ranked BM25 top-k the facet query
    uses, so both engines derive an identical foreground."""
    from searchengine_spark.operators.sigterms import significant_terms

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    hits = (
        score_all(tf_table, stats, scalars, _SIG_QUERY, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_SIG_K)
        .select("doc_id")
    )
    return significant_terms(tf_table, stats, scalars.n_docs, hits,
                             n_top=_SIG_TOP, min_doc_count=_SIG_MIN_DF)


def _sig_terms_sql(query: str = _SIG_QUERY, k: int = _SIG_K,
                   n_top: int = _SIG_TOP, min_df: int = _SIG_MIN_DF) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
top AS (SELECT doc_id FROM (
  SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT {k})),
fgsize AS (SELECT count(*)::DOUBLE AS m FROM top),
fg AS (SELECT term, count(*)::BIGINT AS fg_df
       FROM tf JOIN top USING (doc_id) GROUP BY 1
       HAVING count(*) >= {min_df})
SELECT f.term, f.fg_df, s.df,
       round(((f.fg_df / g.m) - (s.df::DOUBLE / c.n))
             * ((f.fg_df / g.m) / (s.df::DOUBLE / c.n)), 6) AS score
FROM fg f JOIN stats s USING (term) CROSS JOIN consts c CROSS JOIN fgsize g
ORDER BY score DESC, term ASC LIMIT {n_top}"""


_RE_QUERIES = ["spark join fast", "dup", "window agg stream"]
_RE_K = 10
_RE_CAP = 1000


def q_rank_eval(spark, sf_dir):
    """Per-query nDCG@10 / MRR / P@10 (operators/rankeval.py — the ES
    _rank_eval analog) of the BM25 batch ranking against graded
    judgments mined from the reference scorer's top-10 (rel 3 for ranks
    1-3, 2 for 4-6, 1 for 7-10) — the scorer-A/B harness, measuring how
    far BM25 drifts from the reference ranking. Both rankings are
    rounded-then-ranked so the two engines agree on every rank."""
    from searchengine_spark.functions.tokenize import tokenize_udf
    from searchengine_spark.operators.rankeval import rank_eval
    from searchengine_spark.operators.topk import _partial_weight

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    queries = spark.createDataFrame(
        list(enumerate(_RE_QUERIES)), "query_id int, query string")
    qterms = (
        queries.select("query_id",
                       F.explode(tokenize_udf(F.col("query"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qf"))
    )
    joined = tf_table.join(F.broadcast(qterms), "term").join(stats, "term")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))

    bm = (
        _partial_weight(joined, scalars, "bm25")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    ranking = (
        bm.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RE_K)
        .select("query_id", "rank", "doc_id")
    )

    cw = Window.partitionBy("query_id", "term").orderBy(
        F.desc("tf"), F.asc("doc_id"))
    capped = (
        joined.withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") <= _RE_CAP)
        .drop("_rn")
    )
    ref = (
        _partial_weight(capped, scalars, "reference")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    judgments = (
        ref.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RE_K)
        .select(
            "query_id", "doc_id",
            F.when(F.col("rn") <= 3, 3)
            .when(F.col("rn") <= 6, 2)
            .otherwise(1).alias("rel"),
        )
    )
    return rank_eval(ranking, judgments, k=_RE_K)


def _rank_eval_sql(k: int = _RE_K, cap: int = _RE_CAP) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(*_RE_QUERIES)},
partial AS (
  SELECT q.query_id, tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
scored AS (SELECT query_id, doc_id, round(sum(w), 6) AS score FROM partial GROUP BY 1, 2),
ranking AS (SELECT query_id, doc_id, rank FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored) WHERE rank <= {k}),
rcap AS (SELECT query_id, doc_id, tf, qf, cf FROM (
  SELECT q.query_id, tf.doc_id, tf.tf, q.qf, s.cf,
         row_number() OVER (PARTITION BY q.query_id, tf.term
                            ORDER BY tf.tf DESC, tf.doc_id ASC) AS rn
  FROM tf JOIN q USING (term) JOIN stats s USING (term)) WHERE rn <= {cap}),
rpart AS (SELECT query_id, doc_id, (tf / (cf::DOUBLE / c.n)) * qf AS w
          FROM rcap CROSS JOIN consts c),
rscored AS (SELECT query_id, doc_id, round(sum(w), 6) AS score FROM rpart GROUP BY 1, 2),
judg AS (SELECT query_id, doc_id,
                CASE WHEN rn <= 3 THEN 3 WHEN rn <= 6 THEN 2 ELSE 1 END AS rel
  FROM (SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
        FROM rscored) WHERE rn <= {k}),
hit AS (SELECT r.query_id, r.rank, coalesce(j.rel, 0)::DOUBLE AS rel
        FROM ranking r LEFT JOIN judg j
          ON r.query_id = j.query_id AND r.doc_id = j.doc_id),
perq AS (SELECT query_id,
    sum((power(2.0, rel) - 1.0) / log2(rank + 1.0)) AS dcg,
    coalesce(max(CASE WHEN rel > 0 THEN 1.0 / rank END), 0.0) AS mrr,
    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::DOUBLE / {k} AS p_at_k
  FROM hit GROUP BY 1),
ideal AS (SELECT query_id, sum((power(2.0, rel) - 1.0) / log2(rn + 1.0)) AS idcg
  FROM (SELECT query_id, rel::DOUBLE AS rel,
               row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS rn
        FROM judg) WHERE rn <= {k} GROUP BY 1)
SELECT p.query_id,
       round(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg,
       round(p.mrr, 6) AS mrr, round(p.p_at_k, 6) AS p_at_k
FROM perq p LEFT JOIN ideal i USING (query_id)
ORDER BY query_id ASC"""


_MSM_QUERY = "spark join fast"
_MSM_M = 2


def q_msm_topk(spark, sf_dir):
    """Minimum-should-match retrieval (operators/topk.py msm_topk — the
    ES minimum_should_match knob): BM25 top-k over only the docs that
    match at least 2 of the 3 query terms; the distinct-term count rides
    the same hash agg as the score."""
    from searchengine_spark.operators.topk import msm_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return msm_topk(tf_table, stats, scalars, _MSM_QUERY,
                    min_should_match=_MSM_M, k=10)


def _msm_topk_sql(query: str = _MSM_QUERY, m: int = _MSM_M,
                  k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, tf.term, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
agg AS (SELECT doc_id, count(DISTINCT term)::BIGINT AS n_matched,
               round(sum(w), 6) AS score
        FROM partial GROUP BY 1)
SELECT doc_id, n_matched, score FROM agg WHERE n_matched >= {m}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


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


_EXPLAIN_QUERY = "spark join fast"


def q_explain_score(spark, sf_dir):
    """Score explanation (operators/topk.py explain_score — the ES
    _explain analog): per-term (qf, tf, df, dl, partial) breakdown for
    the query's rounded-rank top-1 doc; partials sum to the reported
    score. Both engines pick the same doc (rounded-then-ranked,
    doc-id tie-break)."""
    from searchengine_spark.operators.topk import explain_score

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    top1 = (
        score_all(tf_table, stats, scalars, _EXPLAIN_QUERY, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(1)
        .collect()[0]["doc_id"]
    )
    return explain_score(tf_table, stats, scalars, _EXPLAIN_QUERY,
                         int(top1))


def _explain_score_sql(query: str = _EXPLAIN_QUERY) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, tf.term, q.qf, tf.tf, s.df, dl.dl, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
top1 AS (SELECT doc_id FROM (
  SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 1))
SELECT p.term, p.qf::BIGINT AS qf, p.tf::BIGINT AS tf, p.df::BIGINT AS df,
       p.dl::BIGINT AS dl, round(p.w, 6) AS partial
FROM partial p JOIN top1 USING (doc_id)
ORDER BY partial DESC, term ASC"""


_PERC_QUERIES = [(0, "spark join"), (1, "dup"), (2, "window agg stream")]


def q_percolate_hits(spark, sf_dir):
    """Percolation (operators/percolate.py — the ES percolate-query /
    Lucene reverse-search analog): match every document against three
    STORED queries under AND semantics; one (doc, query) row per
    triggered alert. The compiled query table is broadcast; the only
    shuffle is the (doc, query) count agg."""
    from searchengine_spark.operators.percolate import (
        compile_queries,
        percolate,
    )

    queries = spark.createDataFrame(_PERC_QUERIES,
                                    "query_id int, query string")
    return percolate(_docs(spark, sf_dir), compile_queries(queries))


def _percolate_sql() -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in _PERC_QUERIES)
    return f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
dterms AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM tokd),
qraw(query_id, query) AS (VALUES {vals}),
qt AS (SELECT DISTINCT query_id, unnest({_TOKS_QUERY}) AS term FROM qraw),
req AS (SELECT query_id, count(*)::BIGINT AS n_required FROM qt GROUP BY 1),
hits AS (SELECT d.doc_id, q.query_id, count(*)::BIGINT AS n_matched
         FROM dterms d JOIN qt q USING (term) GROUP BY 1, 2)
SELECT h.doc_id, h.query_id, h.n_matched, r.n_required
FROM hits h JOIN req r USING (query_id)
WHERE h.n_matched >= r.n_required
ORDER BY doc_id ASC, query_id ASC"""


# -- round-3b: analyzers, substring search, term vectors, range facets ------

# (key, from, to): half-open [from, to), None = unbounded; 'long'
# deliberately overlaps 'mid' to exercise the ES a-doc-counts-in-every-
# matching-range semantics, and 'huge' is empty at gate scale to pin the
# emit-zero-count-ranges contract.
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

_STEM_QUERY = "tables joins sessions"
# crosses a token boundary ("...join fast...") — a raw-text substring the
# term index cannot express; 49 matching docs at sf0.01 (non-vacuous).
_SUBSTR_NEEDLE = "oin f"
_TV_DOC = 7


def q_stemmed_topk(spark, sf_dir, query: str = _STEM_QUERY, k: int = 10):
    """S-stemmed retrieval (operators/analyzers.py): the tf relation is
    re-keyed through Harman's S-stemmer (one portable CASE expression,
    JVM codegen), df/cf recomputed over stems, the query stemmed with the
    identical rules — so 'tables' retrieves docs saying 'table'. No
    second corpus pass: stemming is a projection + one hash re-agg of
    the existing tf table."""
    from searchengine_spark.operators.analyzers import stemmed_topk

    _, _, tf_table, _, scalars = _index_parts(spark, sf_dir)
    return stemmed_topk(tf_table, scalars, query, k=k)


def _stemmed_topk_sql(query: str = _STEM_QUERY, k: int = 10) -> str:
    from searchengine_spark.operators.analyzers import STEM_CASE_SQL

    stem_t = STEM_CASE_SQL.format(c="term")
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
tfs AS (SELECT doc_id, {stem_t} AS term, sum(tf)::BIGINT AS tf
        FROM tf GROUP BY 1, 2),
statss AS (SELECT term, count(*)::BIGINT AS df FROM tfs GROUP BY 1),
qs AS (SELECT {stem_t} AS term, sum(qf)::BIGINT AS qf FROM q GROUP BY 1),
partial AS (
  SELECT tf.doc_id,
         q.qf * ln((c.n - s.df + 0.5) / (s.df + 0.5) + 1.0)
         * (tf.tf * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / c.avgdl)) AS w
  FROM tfs tf JOIN qs q USING (term) JOIN statss s USING (term)
  JOIN dl USING (doc_id) CROSS JOIN consts c
)
SELECT doc_id, round(sum(w), 6) AS score FROM partial GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def q_substring_search(spark, sf_dir, needle: str = _SUBSTR_NEEDLE,
                       k: int = 10):
    """Substring search via the character-trigram index
    (operators/substring.py — the pg_trgm / Lucene wildcard-field shape):
    the needle's trigrams prune the gram posting table (pushed-down IN),
    ALL-grams candidates only are verified with one JVM occurrence-count
    expression; ranked by occurrences. The oracle is the ground-truth
    full LIKE scan — index path == scan path is the correctness claim."""
    from searchengine_spark.operators.substring import substring_search

    return substring_search(_docs(spark, sf_dir), needle, k=k)


def _substring_search_sql(needle: str = _SUBSTR_NEEDLE, k: int = 10) -> str:
    nd = needle.lower()
    return f"""WITH occ AS (
  SELECT doc_id,
         CAST((length(lower(text)) - length(replace(lower(text), '{nd}', '')))
              / {len(nd)} AS BIGINT) AS occ
  FROM documents
)
SELECT doc_id, occ FROM occ WHERE occ > 0
ORDER BY occ DESC, doc_id ASC LIMIT {k}"""


def q_term_vectors(spark, sf_dir, doc_id: int = _TV_DOC):
    """Per-doc term vectors (operators/termvectors.py — the ES
    _termvectors analog): every admitted term of one doc with tf, first
    position (admitted-token ordinal), and corpus df/cf. The doc_id
    filter is pushed to the doc-store scan; the doc's tiny term set is
    broadcast into the stats join."""
    from searchengine_spark.operators.termvectors import term_vectors

    _, _, _, stats, _ = _index_parts(spark, sf_dir)
    return term_vectors(_docs(spark, sf_dir), stats, doc_id)


def _term_vectors_sql(doc_id: int = _TV_DOC) -> str:
    return f"""WITH {BASE_CTES},
{_TOKP_CTE},
tv AS (SELECT term, count(*)::BIGINT AS tf, min(pos)::BIGINT AS first_pos
       FROM tokp WHERE doc_id = {doc_id} GROUP BY 1)
SELECT tv.term, tv.tf, tv.first_pos, s.df, s.cf
FROM tv JOIN stats s USING (term)
ORDER BY term ASC"""


# -- round-3c: sub-aggregations, dis_max, function_score, federation --------


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


_DISMAX_QUERY = "spark join fast"
_DISMAX_TIE = 0.3


def q_dis_max_topk(spark, sf_dir):
    """Disjunction-max multi-field retrieval (operators/fielded.py
    dis_max_topk — ES dis_max / best_fields): per-field BM25 over the
    same title/body split as bm25f, combined as max + tie_breaker *
    rest. Shares the bm25f field-split layout and stats treatment."""
    from searchengine_spark.operators.fielded import (
        build_split_field_tf, dis_max_topk,
    )

    docs, _, _, stats, scalars = _index_parts(spark, sf_dir)
    ftf = build_split_field_tf(docs, title_len=_BM25F_TITLE_LEN)
    return dis_max_topk(
        ftf, stats, scalars.n_docs, _DISMAX_QUERY, k=10,
        tie_breaker=_DISMAX_TIE,
        b_per_field={"title": _BM25F_B_TITLE, "body": _BM25F_B_BODY},
    )


def _dis_max_sql(query: str = _DISMAX_QUERY, k: int = 10,
                 tie: float = _DISMAX_TIE) -> str:
    t = _BM25F_TITLE_LEN
    k1 = BM25_K1
    return f"""WITH {BASE_CTES},
fslice AS (SELECT doc_id, t[1:{t}] AS title, t[{t + 1}:] AS body FROM tokd),
funion AS (
  SELECT doc_id, 'title' AS field, unnest(title) AS term, len(title)::BIGINT AS fdl FROM fslice
  UNION ALL
  SELECT doc_id, 'body' AS field, unnest(body) AS term, len(body)::BIGINT AS fdl FROM fslice
),
ftf AS (SELECT doc_id, field, term, fdl, count(*)::BIGINT AS tf FROM funion GROUP BY 1, 2, 3, 4),
fscal AS (SELECT field, avg(fdl) AS avgfdl
          FROM (SELECT DISTINCT doc_id, field, fdl FROM funion) GROUP BY 1),
{_query_cte(query)},
pf AS (
  SELECT f.doc_id, f.field,
         sum(q.qf * ln((c.n - s.df + 0.5) / (s.df + 0.5) + 1.0)
             * (f.tf * {k1 + 1.0})
             / (f.tf + {k1} * (1.0 - ({_BM25F_B_SQL})
                + ({_BM25F_B_SQL}) * f.fdl / sc.avgfdl))) AS s_f
  FROM ftf f JOIN q USING (term) JOIN stats s USING (term)
       JOIN fscal sc USING (field) CROSS JOIN consts c
  GROUP BY 1, 2
)
SELECT doc_id, round(max(s_f) + {tie} * (sum(s_f) - max(s_f)), 6) AS score
FROM pf GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_FSCORE_QUERY = "spark join fast"
_FSCORE_FACTOR = 0.01


def q_function_score_topk(spark, sf_dir):
    """Field-value-factor scoring (operators/topk.py function_score_topk
    — ES function_score): BM25 * ln(1 + 0.01 * n_chars), the static-
    popularity-signal fold; candidate-side attribute join only."""
    from searchengine_spark.operators.topk import function_score_topk

    docs, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return function_score_topk(
        tf_table, stats, scalars, docs.select("doc_id", "n_chars"),
        _FSCORE_QUERY, attr="n_chars", factor=_FSCORE_FACTOR,
        modifier="log1p", k=10,
    )


def _function_score_sql(query: str = _FSCORE_QUERY, k: int = 10) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
partial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
agg AS (SELECT doc_id, sum(w) AS s FROM partial GROUP BY 1)
SELECT a.doc_id,
       round(a.s * ln(1.0 + {_FSCORE_FACTOR} * coalesce(d.n_chars, 0)), 6) AS score
FROM agg a LEFT JOIN documents d ON d.doc_id = a.doc_id
ORDER BY score DESC, a.doc_id ASC LIMIT {k}"""


_FED_QUERY = "spark join fast"
_FED_SLICES = 3


def q_federated_topk(spark, sf_dir):
    """Federated search over independently-built index slices
    (operators/federation.py): the corpus split into 3 slices by
    doc_id % 3, each slice's tf/stats/scalars built SEPARATELY (as
    independent daily/tenant builds would), then queried together with
    merged global statistics. The oracle is plain monolithic BM25 —
    slice-invariance (identical scores to a single index over the union)
    is exactly the property the statistics merge must deliver."""
    from searchengine_spark.operators.federation import federated_topk

    docs = _docs(spark, sf_dir)
    slices, slice_stats, slice_scalars = [], [], []
    for i in range(_FED_SLICES):
        sdocs = docs.filter(F.col("doc_id") % _FED_SLICES == i)
        fwd = build_forward(sdocs)
        tf = explode_forward(fwd)
        slices.append((f"s{i}", tf))
        slice_stats.append(build_term_stats(tf))
        slice_scalars.append(CorpusScalars.compute(fwd))
    return federated_topk(slices, slice_stats, slice_scalars,
                          _FED_QUERY, k=10)


_RESCORE_QUERY = "spark join fast"
_RESCORE_WINDOW = 50


def q_rescore_topk(spark, sf_dir):
    """Two-pass rescoring (operators/topk.py rescore_topk — ES rescore
    API): BM25 window of 50 candidates re-scored with the Dirichlet
    query likelihood, final = bm25 + 0.5 * lm. The second pass is a
    window-row broadcast join — corpus-size-independent."""
    from searchengine_spark.operators.topk import rescore_topk

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    return rescore_topk(tf_table, stats, scalars, _RESCORE_QUERY, k=10,
                        window=_RESCORE_WINDOW, rescore_weight=0.5)


def _rescore_topk_sql(query: str = _RESCORE_QUERY, k: int = 10,
                      window: int = _RESCORE_WINDOW,
                      rw: float = 0.5, mu: float = 2000.0) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(query)},
bpartial AS (
  SELECT tf.doc_id, {_BM25_W} AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) JOIN dl USING (doc_id)
  CROSS JOIN consts c
),
win AS (
  SELECT doc_id, round(sum(w), 6) AS bm25 FROM bpartial GROUP BY 1
  ORDER BY bm25 DESC, doc_id ASC LIMIT {window}
),
tot AS (SELECT sum(dl)::DOUBLE AS c FROM dl),
qlen AS (SELECT sum(qf)::DOUBLE AS n FROM q JOIN stats USING (term)),
lpartial AS (
  SELECT tf.doc_id, q.qf * ln(1.0 + tf.tf / ({mu} * (s.cf::DOUBLE / t.c))) AS w
  FROM tf JOIN q USING (term) JOIN stats s USING (term) CROSS JOIN tot t
  WHERE tf.doc_id IN (SELECT doc_id FROM win)
),
lagg AS (SELECT doc_id, sum(w) AS s FROM lpartial GROUP BY 1),
lm AS (SELECT a.doc_id, round(a.s + ql.n * ln({mu} / (dl.dl + {mu})), 6) AS lm
       FROM lagg a JOIN dl ON dl.doc_id = a.doc_id CROSS JOIN qlen ql)
SELECT w.doc_id, round(w.bm25 + {rw} * coalesce(lm.lm, 0.0), 6) AS score
FROM win w LEFT JOIN lm USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_LTR_K = 20


def q_ltr_features(spark, sf_dir):
    """LTR training-data assembly (operators/ltr.py): batch candidate
    generation (top-20 BM25 per query) + the lexical feature vector per
    (query, doc) — bm25, matched/query term counts, tf/idf sums, max
    per-term partial, dl — all riding ONE hash agg over the scoring
    join. The offline twin of the serving engine's ranking, for
    training re-rankers on the same corpus statistics."""
    from searchengine_spark.operators.ltr import ltr_features

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    queries = spark.createDataFrame(
        list(enumerate(_BATCH_QUERIES)), "query_id int, query string"
    )
    return ltr_features(queries, tf_table, stats, scalars, k=_LTR_K)


def _ltr_features_sql(k: int = _LTR_K) -> str:
    return f"""WITH {BASE_CTES},
{_query_cte(*_BATCH_QUERIES)},
qlen AS (SELECT query_id, count(DISTINCT term)::BIGINT AS q_terms
         FROM q GROUP BY 1),
partial AS (
  SELECT q.query_id, tf.doc_id, tf.term, {_BM25_W} AS w, tf.tf, dl.dl,
         ln((c.n - s.df + 0.5) / (s.df + 0.5) + 1.0) AS idf
  FROM tf JOIN q USING (term) JOIN stats s USING (term)
       JOIN dl USING (doc_id) CROSS JOIN consts c
),
feats AS (
  SELECT query_id, doc_id, round(sum(w), 6) AS bm25,
         count(DISTINCT term)::BIGINT AS matched_terms,
         sum(tf)::BIGINT AS tf_sum, round(sum(idf), 6) AS idf_sum,
         round(max(w), 6) AS max_partial, max(dl)::BIGINT AS dl
  FROM partial GROUP BY 1, 2
),
ranked AS (
  SELECT *, (row_number() OVER (PARTITION BY query_id
             ORDER BY bm25 DESC, doc_id ASC))::BIGINT AS rank
  FROM feats
)
SELECT r.query_id, r.rank, r.doc_id, r.bm25, r.matched_terms, ql.q_terms,
       r.tf_sum, r.idf_sum, r.max_partial, r.dl
FROM ranked r JOIN qlen ql USING (query_id)
WHERE r.rank <= {k}"""


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


_FEDW_SPLIT_CHARS = 300


def q_federated_wand_topk(spark, sf_dir):
    """Federated block-max WAND over per-slice SEGMENT layouts
    (operators/federation.py federated_wand_topk): corpus split into a
    short-doc and a long-doc slice (n_chars < 300) so each slice's baked
    avgdl diverges from the global one, each slice's segments built
    INDEPENDENTLY with its own stats, then queried together with merged
    global statistics and the max(1, avgdl_g/avgdl_s) block-max
    inflation that keeps pruning admissible. The oracle is plain
    monolithic exhaustive BM25 — the strongest slice-invariance claim:
    even the PRUNED serving path is bit-identical across the
    federation boundary."""
    from searchengine_spark.operators.federation import federated_wand_topk
    from searchengine_spark.operators.segments import build_doc_segments

    docs = _docs(spark, sf_dir)
    slice_segments, slice_stats, slice_scalars = [], [], []
    for name, cond in [
        ("short", F.col("n_chars") < _FEDW_SPLIT_CHARS),
        ("long", F.col("n_chars") >= _FEDW_SPLIT_CHARS),
    ]:
        fwd = build_forward(docs.filter(cond))
        tf = explode_forward(fwd)
        st = build_term_stats(tf)
        sc = CorpusScalars.compute(fwd)
        slice_segments.append(
            (name, build_doc_segments(tf, st, sc.n_docs, sc.avgdl,
                                      n_shards=4)))
        slice_stats.append(st)
        slice_scalars.append(sc)
    topk = federated_wand_topk(slice_segments, slice_stats, slice_scalars,
                               _FED_QUERY, k=10)
    return (
        topk.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_consolidated_topk(spark, sf_dir):
    """Slice retirement end-to-end (operators/federation.py
    consolidate_slices + FederatedEngine.load/search): the corpus is
    split into three doc-id tertile slices; each slice's term layout is
    built independently with its OWN stats and written as an on-disk
    slice dir; the two OUTER slices are consolidated into one — their
    scalars.json records the exact constituent range SET, which is
    non-contiguous because the middle tertile's ids sit in the gap —
    then the consolidated slice federates with the middle slice (the
    exact shape an envelope disjointness check would falsely reject).
    The oracle is plain monolithic exhaustive BM25: consolidation, the
    range-set check, and federation must all be invisible in the served
    results."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from searchengine_spark.operators.federation import (
        FederatedEngine,
        consolidate_slices,
    )
    from searchengine_spark.operators.segments import build_term_segments

    docs = _docs(spark, sf_dir)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    t1, t2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    root = _tempfile.mkdtemp(prefix="consol_gate_")
    try:
        dirs = []
        for name, cond in [
            ("lo", F.col("doc_id") < t1),
            ("mid", (F.col("doc_id") >= t1) & (F.col("doc_id") < t2)),
            ("hi", F.col("doc_id") >= t2),
        ]:
            part = docs.filter(cond)
            fwd = build_forward(part)
            tf = explode_forward(fwd)
            st = build_term_stats(tf)
            sc = CorpusScalars.compute(fwd)
            d = _os.path.join(root, name)
            build_term_segments(tf, st, sc.n_docs, sc.avgdl).write.parquet(
                _os.path.join(d, "term_segments.parquet"))
            st.write.parquet(_os.path.join(d, "term_stats.parquet"))
            fwd.select(
                "doc_id", "dl",
                F.expr("transform(postings, p -> p.term)").alias("terms"),
                F.expr("transform(postings, p -> p.tf)").alias("tfs"),
            ).write.parquet(_os.path.join(d, "doc_map.parquet"))
            span = part.agg(F.min("doc_id").alias("lo"),
                            F.max("doc_id").alias("hi")).collect()[0]
            with open(_os.path.join(d, "scalars.json"), "w") as f:
                _json.dump({
                    "n_docs": sc.n_docs, "sum_dl": sc.sum_dl,
                    "avgdl": sc.avgdl,
                    "doc_id_base": int(span["lo"]),
                    "doc_id_end": int(span["hi"]) + 1,
                }, f)
            dirs.append(d)
        cold = consolidate_slices(spark, [dirs[0], dirs[2]],
                                  _os.path.join(root, "cold"))
        fed = FederatedEngine.load(spark, [cold, dirs[1]])
        out = [(int(r["doc_id"]), float(r["score"]))
               for r in fed.search(_FED_QUERY, k=10)
               .select("doc_id", "score").collect()]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    # k rows, rematerialized because the slice dirs are gone (lazy plans
    # over a deleted tempdir would rescan at driver-collect time)
    res = spark.createDataFrame(out, "doc_id long, score double")
    return (res.select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks a PREFIX of this
    # dict (50 names in rounds 2-3), so never-yet-driver-attested and
    # just-modified operators come FIRST; names already green in a driver
    # CORRECTNESS record sit past the window (all still verifiable any
    # time with tools/check_entry.py).
    return {
        # round-5 window head: the one name with no driver row yet
        # (registered after the r4 gate ran), the new consolidation
        # lifecycle query, and the operators whose code changed this
        # round (quantizer training sample now hash-ordered; percolate
        # defaults to broadcast with no sizing action; federation load
        # checks the exact range set)
        "dedup_components_lsls": q_dedup_components_lsls,
        "consolidated_topk": q_consolidated_topk,
        "pq_topk": q_pq_topk,
        "ivf_topk": q_ivf_topk,
        "ann_topk": q_ann_topk,
        "cosine_topk": q_cosine_topk,
        "percolate_hits": q_percolate_hits,
        # core flagships filling the rest of the ~50-name window for
        # continuous re-attestation (all green in r4)
        "wand_topk": _wand_topk("spark join fast", 10),
        "wand_term_topk": q_wand_term_topk,
        "batch_wand_topk": q_batch_wand_topk,
        "wand_topk_deletes": q_wand_topk_deletes,
        "federated_topk": q_federated_topk,
        "federated_wand_topk": q_federated_wand_topk,
        "merge_segments_roundtrip": q_merge_roundtrip,
        "segment_roundtrip": q_segment_roundtrip,
        "phrase_topk": q_phrase_topk,
        "near_topk": q_near_topk,
        "bm25f_topk": q_bm25f_topk,
        "bm25_topk_multi": _bm25_topk("spark join fast", 10),
        "reference_topk": _reference_topk("spark join", 10, 1000),
        "fielded_reference_topk": q_fielded_reference_topk,
        "term_stats": q_term_stats,
        "corpus_scalars": q_corpus_scalars,
        "tf_postings": q_tf_postings,
        "token_counts": q_token_counts,
        "quality_score": q_quality,
        "dedup_components": q_dedup_components,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "minhash_dedup_pairs": q_minhash_dedup_pairs,
        "span_dups": q_span_dups,
        "clean_corpus": q_clean_corpus,
        "hybrid_rrf_topk": q_hybrid_rrf,
        "mmr_topk": q_mmr_topk,
        "budget_select": q_budget_select,
        "facet_ranges": q_facet_ranges,
        "facet_stats": q_facet_stats,
        "facet_top_hits": q_facet_top_hits,
        "facet_percentiles": q_facet_percentiles,
        "facet_histogram": q_facet_histogram,
        "facet_counts": q_facet_counts,
        "function_score_topk": q_function_score_topk,
        "media_features": q_media_features,
        "media_decode": q_media_decode,
        "media_resize": q_media_resize,
        "video_frame_sample": q_video_frame_sample,
        "pii_scan": q_pii_scan,
        "sessionized_counts": q_sessionized_counts,
        "sessionized_counts_bucketed": q_sessionized_counts_bucketed,
        "user_top_events": q_user_top_events,
        "event_props_stats": q_event_props_stats,
        # --- past the gate window: every name below is green in a driver
        # CORRECTNESS record (r1-r4) and unchanged this round ---
        "windowed_counts": q_windowed_counts,
        "source_divergence": q_source_divergence,
        "source_term_cardinality": q_source_term_cardinality,
        "span_dup_flags": q_span_dup_flags,
        "dis_max_topk": q_dis_max_topk,
        "ltr_features": q_ltr_features,
        "rescore_topk": q_rescore_topk,
        "stemmed_topk": q_stemmed_topk,
        "substring_search": q_substring_search,
        "term_vectors": q_term_vectors,
        "significant_terms": q_significant_terms,
        "rank_eval": q_rank_eval,
        "msm_topk": q_msm_topk,
        "explain_score": q_explain_score,
        "lm_dirichlet_topk": q_lm_dirichlet_topk,
        "decay_topk": q_decay_topk,
        "synonym_topk": q_synonym_topk,
        "filtered_topk": q_filtered_topk,
        "match_count": q_match_count,
        "collapse_topk": q_collapse_topk,
        "prefix_search": q_prefix_search,
        "fuzzy_search": q_fuzzy_search,
        "regex_search": q_regex_search,
        "slop_topk": q_slop_topk,
        "prf_topk": q_prf_topk,
        "more_like_this": q_more_like_this,
        "asof_enrich": q_asof_enrich,
        "event_bigrams": q_event_bigrams,
        "boolean_topk": q_boolean_topk,
        "search_snippets": q_search_snippets,
        "doc_keywords": q_doc_keywords,
        "suggest_prefix": q_suggest_prefix,
        "did_you_mean": q_did_you_mean,
        "quality_quantiles": q_quality_quantiles,
        "source_mix": q_source_mix,
        "doc_fingerprint": q_fingerprint,
        "payload_meta": q_payload_meta,
        "doc_lengths": q_doc_lengths,
        "bm25_topk_rare": _bm25_topk("dup", 10),
        "bm25_topk_dupterms": _bm25_topk("the the data", 10),
        "bm25_page2": q_bm25_page2,
        "reference_topk_capped": _reference_topk("spark join", 10, 50),
        "fielded_topk": q_fielded_topk,
        "batch_topk": q_batch_topk,
        "doc_id_rank": q_doc_id_rank,
        "dedup_exact": q_dedup_exact,
        "dedup_keep_best": q_dedup_keep_best,
        "quality_weighted_sample": q_quality_weighted_sample,
        "split_contamination": q_split_contamination,
        "dedup_keep_first": q_dedup_keep_first,
        "pack_bins": q_pack_bins,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_candidates,
        "simhash32": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "embedding_dup_components": q_embedding_dup_components,
        "lang_id": q_lang_id,
        "split_assign": q_split_assign,
        "turn_context": q_turn_context,
        "conversation_text": q_conversation_text,
        "role_spans": q_role_spans,
        "tool_usage": q_tool_usage,
        "tool_transitions": q_tool_transitions,
        "stratified_sample": q_stratified_sample,
        "bigram_pmi": q_bigram_pmi,
        "doc_logprob": q_doc_logprob,
        "doc_bigram_logprob": q_doc_bigram_logprob,
        "repetition_stats": q_repetition_stats,
    }


def all_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    return {
        "facet_stats": _facet_stats_sql(),
        "facet_top_hits": _facet_top_hits_sql(),
        "dis_max_topk": _dis_max_sql(),
        "function_score_topk": _function_score_sql(),
        "federated_topk": _bm25_topk_sql(_FED_QUERY, 10),
        "federated_wand_topk": _bm25_topk_sql(_FED_QUERY, 10),
        "facet_percentiles": _facet_percentiles_sql(),
        "ltr_features": _ltr_features_sql(),
        "rescore_topk": _rescore_topk_sql(),
        "stemmed_topk": _stemmed_topk_sql(),
        "substring_search": _substring_search_sql(),
        "term_vectors": _term_vectors_sql(),
        "facet_ranges": _facet_ranges_sql(),
        "significant_terms": _sig_terms_sql(),
        "rank_eval": _rank_eval_sql(),
        "facet_histogram": _facet_histogram_sql(),
        "msm_topk": _msm_topk_sql(),
        "percolate_hits": _percolate_sql(),
        "explain_score": _explain_score_sql(),
        "lm_dirichlet_topk": _lm_dirichlet_sql(_LM_QUERY, 10),
        "bm25f_topk": _bm25f_sql(_BM25F_QUERY, 10),
        "decay_topk": _decay_topk_sql(_DECAY_QUERY, 10),
        "synonym_topk": _synonym_topk_sql(_SYN_QUERY, 10),
        "filtered_topk": _filtered_topk_sql(_FILTER_QUERY, 10),
        "match_count": _match_count_sql(_COUNT_QUERY),
        "collapse_topk": SQL_COLLAPSE_TOPK,
        "prefix_search": SQL_PREFIX_SEARCH,
        "fuzzy_search": SQL_FUZZY_SEARCH,
        "regex_search": SQL_REGEX_SEARCH,
        "mmr_topk": SQL_MMR_TOPK,
        "budget_select": SQL_BUDGET_SELECT,
        "slop_topk": SQL_SLOP_TOPK,
        "facet_counts": _facet_counts_sql(),
        "term_stats": SQL_TERM_STATS,
        "doc_lengths": SQL_DOC_LENGTHS,
        "corpus_scalars": SQL_CORPUS_SCALARS,
        "tf_postings": SQL_TF_POSTINGS,
        "bm25_topk_multi": _bm25_topk_sql("spark join fast", 10),
        "bm25_topk_rare": _bm25_topk_sql("dup", 10),
        "bm25_topk_dupterms": _bm25_topk_sql("the the data", 10),
        "bm25_page2": _bm25_page2_sql("spark join fast", 10),
        "reference_topk": _reference_topk_sql("spark join", 10, 1000),
        "reference_topk_capped": _reference_topk_sql("spark join", 10, 50),
        "wand_topk": _bm25_topk_sql("spark join fast", 10),
        "wand_topk_deletes": _wand_topk_deletes_sql("spark join fast", 10),
        "wand_term_topk": _bm25_topk_sql("spark join fast", 10),
        "segment_roundtrip": SQL_TF_POSTINGS,
        "merge_segments_roundtrip": SQL_TF_POSTINGS,
        "fielded_topk": _fielded_topk_sql("spark join fast", 10),
        "fielded_reference_topk": _fielded_reference_topk_sql("spark join fast", 10),
        "batch_topk": _batch_topk_sql(5),
        "batch_wand_topk": _batch_topk_sql(5),
        "doc_id_rank": SQL_DOC_ID_RANK,
        "dedup_exact": SQL_DEDUP_EXACT,
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
        "dedup_components": SQL_DEDUP_COMPONENTS,
        "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
        "quality_weighted_sample": SQL_QUALITY_WEIGHTED_SAMPLE,
        "split_contamination": SQL_SPLIT_CONTAMINATION,
        "dedup_keep_first": SQL_DEDUP_KEEP_FIRST,
        "pack_bins": SQL_PACK_BINS,
        "minhash_signatures": SQL_MINHASH_SIGNATURES,
        "minhash_dedup_pairs": SQL_MINHASH_DEDUP_PAIRS,
        "lsh_candidate_pairs": SQL_LSH_CANDIDATES,
        "simhash32": SQL_SIMHASH,
        "simhash_pairs": SQL_SIMHASH_PAIRS,
        "cosine_topk": SQL_COSINE_TOPK,
        "ann_topk": _ann_topk_sql(sf_dir),
        "ivf_topk": SQL_IVF_TOPK,
        "embedding_dup_pairs": _embedding_dup_pairs_sql(sf_dir),
        "embedding_dup_components": _embedding_dup_components_sql(sf_dir),
        "lang_id": SQL_LANG_ID,
        "split_assign": SQL_SPLIT_ASSIGN,
        "turn_context": SQL_TURN_CONTEXT,
        "conversation_text": SQL_CONVERSATION_TEXT,
        "role_spans": SQL_ROLE_SPANS,
        "tool_usage": SQL_TOOL_USAGE,
        "tool_transitions": SQL_TOOL_TRANSITIONS,
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "bigram_pmi": SQL_BIGRAM_PMI,
        "doc_logprob": SQL_DOC_LOGPROB,
        "doc_bigram_logprob": SQL_DOC_BIGRAM_LOGPROB,
        "repetition_stats": SQL_REPETITION_STATS,
        "dedup_components_lsls": SQL_DEDUP_COMPONENTS,
        "pii_scan": SQL_PII_SCAN,
        "source_divergence": SQL_SOURCE_DIVERGENCE,
        "quality_score": SQL_QUALITY,
        "token_counts": SQL_TOKEN_COUNTS,
        "doc_fingerprint": SQL_FINGERPRINT,
        "payload_meta": SQL_PAYLOAD_META,
        "media_features": SQL_MEDIA_FEATURES,
        "media_decode": SQL_MEDIA_DECODE,
        "media_resize": SQL_MEDIA_RESIZE,
        "video_frame_sample": SQL_VIDEO_FRAME_SAMPLE,
        "windowed_counts": SQL_WINDOWED_COUNTS,
        "boolean_topk": SQL_BOOLEAN_TOPK,
        "phrase_topk": SQL_PHRASE_TOPK,
        "near_topk": SQL_NEAR_TOPK,
        "search_snippets": _search_snippets_sql(),
        "doc_keywords": SQL_DOC_KEYWORDS,
        "suggest_prefix": SQL_SUGGEST_PREFIX,
        "did_you_mean": SQL_DID_YOU_MEAN,
        "sessionized_counts": SQL_SESSIONIZED_COUNTS,
        "sessionized_counts_bucketed": SQL_SESSIONIZED_COUNTS,
        "user_top_events": SQL_USER_TOP_EVENTS,
        "event_props_stats": SQL_EVENT_PROPS_STATS,
        "span_dups": SQL_SPAN_DUPS,
        "span_dup_flags": SQL_SPAN_DUP_FLAGS,
        "asof_enrich": SQL_ASOF_ENRICH,
        "event_bigrams": SQL_EVENT_BIGRAMS,
        "hybrid_rrf_topk": _hybrid_rrf_sql("spark join fast", 10),
        "quality_quantiles": SQL_QUALITY_QUANTILES,
        "source_mix": SQL_SOURCE_MIX,
        "source_term_cardinality": SQL_SOURCE_TERM_CARDINALITY,
        "pq_topk": SQL_COSINE_TOPK,
        "consolidated_topk": _bm25_topk_sql(_FED_QUERY, 10),
        "clean_corpus": _clean_corpus_sql(),
        "prf_topk": _prf_topk_sql("spark join fast", 10),
        "more_like_this": _more_like_this_sql(),
    }
