"""Histogram facets over a search hit set.

The Elasticsearch ``date_histogram`` / ``histogram`` aggregation analog:
bucket the hit set by a fixed-width interval of a numeric/timestamp doc
attribute and count per bucket — "when were the matching turns said".
Companion to the categorical facet counts in ``engine.search_facets``.

Scale shape: the hit set is k rows — broadcast it onto the doc store, so
the attribute lookup is a broadcast hash join pruned to k rows, then one
tiny agg. Empty buckets are not emitted (ES ``min_doc_count: 1``
semantics); a serving layer can densify the k-row result driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_histogram(
    hits: DataFrame,
    doc_attr: DataFrame,
    interval: float,
    attr: str = "ts_s",
    origin: float = 0.0,
) -> DataFrame:
    """Counts of ``hits`` per ``interval``-wide bucket of ``doc_attr.attr``.

    ``hits``: small (doc_id) result set. ``doc_attr``: (doc_id, <attr>)
    slice of the doc store (seconds-since-epoch for a date histogram).
    Buckets are left-closed: bucket b covers [origin + b·interval,
    origin + (b+1)·interval). Docs with a NULL attribute are counted
    under a NULL bucket (ES ``missing``-less default drops them; keeping
    them visible is the safer engine default — filter if unwanted).

    Output: (bucket, bucket_start, n) ordered by bucket.
    """
    bucket = F.floor(
        (F.col(attr).cast("double") - F.lit(float(origin)))
        / F.lit(float(interval))
    ).cast("long")
    return (
        doc_attr.join(F.broadcast(hits.select("doc_id")), "doc_id")
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bucket",
            (F.lit(float(origin))
             + F.col("bucket").cast("double") * F.lit(float(interval))
             ).alias("bucket_start"),
            "n",
        )
        .orderBy(F.asc_nulls_last("bucket"))
    )
