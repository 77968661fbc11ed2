"""Index-build orchestrator: transcripts -> full inverted index.

Replaces the reference's 9-stage checkpointed binary-file pipeline
(SearchEngine Indexer/Program.cs:42-65) with one declarative DataFrame DAG:

    transcripts(conv_id, turn_idx, role, text, tool, ts)
      -> tokenized_doc_map     (ONE fused Arrow pass: deterministic dense
                                doc_id + tokenize + per-doc tf vectors + dl)
      -> tf_from_doc_map       (JVM-side explode -> relational tf table)
      -> build_term_stats      (df/cf hash agg)  + CorpusScalars (N, avgdl)
      -> build_doc_segments    (query layout: doc-range shards, block-max)
      -> build_term_segments   (build/merge layout: salted by high-df)

Stage boundaries that were binary files on disk in the reference are
shuffles here; everything between shuffles is whole-stage-codegen fused,
and the corpus text is read exactly once. Persisted-storage +
manifest-resume variants live in ``pipeline.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.forward import CorpusScalars, build_term_stats
from searchengine_spark.operators.ingest import tf_from_doc_map, tokenized_doc_map
from searchengine_spark.operators.segments import (
    DEFAULT_DF_TARGET,
    build_doc_segments,
    build_term_segments,
)


@dataclass
class InvertedIndex:
    doc_map: DataFrame        # (doc_id, conv_id, turn_idx, ..., dl, terms, tfs)
    tf_table: DataFrame       # (term, doc_id, tf, dl)
    term_stats: DataFrame     # (term, df, cf)
    scalars: CorpusScalars    # N, avgdl, sum_dl
    doc_segments: DataFrame | None = None
    term_segments: DataFrame | None = None


def compute_scalars(doc_map: DataFrame) -> CorpusScalars:
    row = doc_map.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
    ).collect()[0]
    n, sum_dl = row["n"], int(row["sum_dl"])
    return CorpusScalars(n_docs=n, avgdl=(sum_dl / n) if n else 0.0, sum_dl=sum_dl)


def build_index(
    transcripts: DataFrame,
    *,
    num_doc_partitions: int | None = None,
    n_shards: int | None = None,
    docs_per_shard: int | None = None,
    df_target: int = DEFAULT_DF_TARGET,
    layouts: tuple[str, ...] = ("doc",),
    cache: bool = True,
) -> InvertedIndex:
    """Full build. ``layouts`` picks which segment layouts to produce
    ("doc" = WAND query layout, "term" = salted merge layout).

    ``docs_per_shard``: width-independent alternative to ``n_shards`` —
    shard count = ceil(n_docs / docs_per_shard). The shard size is the
    SERVING-PARALLELISM knob: a query's grouped WAND gets at most one
    task per shard, so shards must outnumber the cores you want busy.
    The 65k default (operators/segments.py DOCS_PER_SHARD) is right for
    web scale (10^12 docs = ~15M shards) but parallelism-starves small
    corpora — benches pass ~8k here so a 333k-doc corpus still fans out
    to ~41 tasks."""
    doc_map = tokenized_doc_map(transcripts, num_partitions=num_doc_partitions)
    if cache:
        doc_map = doc_map.cache()
    tf_table = tf_from_doc_map(doc_map)
    if cache:
        tf_table = tf_table.cache()
    term_stats = build_term_stats(tf_table)
    if cache:
        term_stats = term_stats.cache()
    scalars = compute_scalars(doc_map)

    doc_segments = term_segments = None
    if "doc" in layouts:
        if n_shards is None and docs_per_shard:
            n_shards = max(1, -(-scalars.n_docs // docs_per_shard))
        doc_segments = build_doc_segments(
            tf_table, term_stats, scalars.n_docs, scalars.avgdl, n_shards=n_shards
        )
        if cache:
            doc_segments = doc_segments.cache()
    if "term" in layouts:
        term_segments = build_term_segments(
            tf_table, term_stats, scalars.n_docs, scalars.avgdl, df_target=df_target
        )
        if cache:
            term_segments = term_segments.cache()

    return InvertedIndex(
        doc_map=doc_map,
        tf_table=tf_table,
        term_stats=term_stats,
        scalars=scalars,
        doc_segments=doc_segments,
        term_segments=term_segments,
    )
