"""Percolation: match incoming documents against STORED queries.

The Elasticsearch percolate-query analog (Lucene's reverse search): the
query set is the persistent artifact, documents are the transient input —
"which saved alerts / routing rules / topic subscriptions does this new
transcript turn trigger". The primitive behind streaming alert pipelines
and per-subscriber routing at ingest time.

Semantics: a stored query is a bag of admitted terms with a per-query
``min_should_match`` m (default = its distinct term count — AND
semantics, the usual alert-rule reading; m=1 gives OR). A document
matches when it contains >= m of the query's DISTINCT terms (document
term multiplicity does not count twice — ES bool/minimum_should_match
counts clauses, not occurrences).

Scale shape (100 TB ingest): the compiled query table is
subscriber-sized, not corpus-sized — broadcast it. Per doc the plan is:
in-row tokenize + array_distinct, explode, broadcast-join the query
terms, one (doc_id, query_id) hash agg (map-side combinable), filter on
the per-query requirement. ONE shuffle per batch, and it is stateless —
the streaming twin is the same transform run per micro-batch
(``percolate_stream``), no watermark state at all.

Reference: the reference engine has no stored-query surface; this is
part of the serving/ingest completeness a modern engine user expects
(Engine.cs has only the forward search loop, Engine.cs:32-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_udf


def compile_queries(
    queries: DataFrame,
    min_should_match: int | None = None,
) -> DataFrame:
    """(query_id, query) -> compiled percolation table
    (query_id, term, n_required): one row per DISTINCT query term, with
    the per-query match requirement attached to every row.

    ``min_should_match=None`` (default) requires ALL distinct terms (AND
    — alert-rule semantics); an integer m is clamped per query to
    [1, n_terms]. The compiled table is the persistable artifact — store
    it once, percolate every ingest batch against it.
    """
    terms = (
        queries.select(
            "query_id",
            F.explode(F.array_distinct(tokenize_udf(F.col("query"))))
            .alias("term"),
        )
    )
    n_terms = terms.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_terms"))
    if min_should_match is None:
        req = n_terms.select("query_id", F.col("n_terms").alias("n_required"))
    else:
        m = int(min_should_match)
        req = n_terms.select(
            "query_id",
            F.greatest(
                F.lit(1).cast("long"),
                F.least(F.lit(m).cast("long"), F.col("n_terms")),
            ).alias("n_required"),
        )
    return terms.join(req, "query_id")


#: Above this many compiled rows the broadcast hint is dropped and the
#: term join runs as a shuffle hash join. ~10M (query_id, term) rows is
#: a few hundred MB serialized — past any sane driver/executor broadcast
#: budget. An alerting platform with 10^8 stored queries lands here.
BROADCAST_RULE_LIMIT = 10_000_000


def percolate(
    docs: DataFrame,
    compiled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_rules: int | None = None,
) -> DataFrame:
    """Match ``docs`` against a ``compile_queries`` table ->
    (doc_id, query_id, n_matched, n_required), one row per triggered
    (document, stored query) pair, ordered (doc_id, query_id).

    The compiled table is broadcast by default (percolation rule sets
    are subscriber-sized — the common path pays NO sizing action);
    callers with a genuinely huge rule table pass ``n_rules`` (the
    compiled row count, known at registration time by whoever maintains
    the rule store) and above ``BROADCAST_RULE_LIMIT`` rows the term
    join runs as a plain shuffle hash join instead (identical pairs,
    one extra exchange of the exploded doc terms — the right trade once
    the rule set itself is too big to ship to every executor). The only
    other shuffle is the (doc_id, query_id) count agg. Works unchanged
    on a streaming micro-batch (see ``percolate_stream``).
    """
    rules = (F.broadcast(compiled)
             if n_rules is None or n_rules <= BROADCAST_RULE_LIMIT
             else compiled)
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_udf(F.col(text_col))))
        .alias("term"),
    )
    hits = (
        doc_terms.join(rules, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").cast("long").alias("n_matched"),
            F.first("n_required").alias("n_required"),
        )
        .filter(F.col("n_matched") >= F.col("n_required"))
    )
    return hits.orderBy("doc_id", "query_id")


def percolate_stream(
    spark,
    input_dir: str,
    compiled: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """File-source transcript stream -> percolation alert sink: every
    micro-batch runs the SAME stateless ``percolate`` plan against the
    broadcast compiled-query table and appends triggered (doc, query)
    pairs. foreachBatch because the match is a per-batch aggregation
    with no cross-batch state — no watermark, state size zero."""
    from searchengine_spark.streaming.dedup_stream import TRANSCRIPT_SCHEMA

    src = (
        spark.readStream.schema(schema or TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    n_rules = compiled.count()  # sized ONCE, not per micro-batch

    def _emit(batch_df, batch_id):
        (percolate(batch_df.withColumn(
            "doc_id", F.xxhash64("conv_id", "turn_idx")), compiled,
            n_rules=n_rules)
         .write.mode("append").parquet(output_dir))

    return (
        src.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
