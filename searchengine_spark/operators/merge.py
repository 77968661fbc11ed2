"""Sort-merge of term-partitioned segment tables (incremental indexing).

Reference analog: the Indexer's final stage iterates the posting directory
in key order and seek-reads each extent — a single-machine merge of sorted
runs (SearchEngine Indexer/Program.cs:848-859). There is no incremental
path in the reference at all: adding documents means rebuilding everything.

Here, independently built indexes (e.g. daily transcript batches) merge
WITHOUT re-tokenizing:

    union of segment tables (+ per-part docID offset)
      -> repartition(term) + sortWithinPartitions(term, ...)   [one shuffle
         of compact ENCODED payloads — postings never travel row-per-posting]
      -> mapInPandas: decode each part's payloads, concat+sort by docID,
         re-encode chunked at df_target postings per output segment

Output salts are sequential doc-order chunks (salt = chunk index), which
preserves the salted-layout invariant that matters — no segment exceeds
df_target postings — while keeping the merge deterministic. Associativity
(merge(A,B) == build(A++B) up to the salt split) is asserted by tests via
decode equality and query equality.

docID discipline: part i's docIDs are offset by sum(n_docs of parts < i),
matching the dense-global-rank assignment a from-scratch build over the
concatenated corpus (in part order) would produce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from searchengine_spark.operators.segments import (
    DEFAULT_DF_TARGET,
    TERM_SEGMENT_SCHEMA,
    _encode_group_frame,
    decode_payload,
)

_MERGE_IN_EXTRA = T.StructField("doc_offset", T.LongType(), False)


def merge_term_segments(
    parts: list[tuple[DataFrame, int]],
    avgdl_merged: float,
    df_target: int = DEFAULT_DF_TARGET,
    num_partitions: int | None = None,
    tombstones: set | frozenset | None = None,
) -> DataFrame:
    """parts = [(term_segments_df, doc_offset)], doc_offset = sum of n_docs
    of all earlier parts. Returns a merged term-segment table re-encoded
    with the merged corpus's avgdl (block-max metadata stays exact).

    ``tombstones``: GLOBAL doc_ids (post-offset space) dropped during the
    merge — the Lucene model: the merge already decodes and re-encodes
    every posting, so applying deletes here is free; the merged table is
    fully purged."""
    if not parts:
        raise ValueError("no segment tables to merge")
    spark = parts[0][0].sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    with_off = [
        df.withColumn("doc_offset", F.lit(int(off)).cast("long"))
        for df, off in parts
    ]
    unioned = with_off[0]
    for d in with_off[1:]:
        unioned = unioned.unionByName(d)

    avgdl = float(avgdl_merged) if avgdl_merged else 1.0
    dead = (np.asarray(sorted(int(d) for d in tombstones), dtype=np.int64)
            if tombstones else None)

    def _merge_stream(batches):
        """Carry-over streaming merge: input sorted by term within the
        partition; the trailing term's rows carry into the next batch."""
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            terms = pdf["term"].to_numpy()
            tail = int((terms == terms[-1]).sum())
            head = pdf.iloc[: len(pdf) - tail]
            carry = pdf.iloc[len(pdf) - tail:]
            if len(head):
                yield _merge_frame(head, avgdl, df_target, dead)
        if carry is not None and len(carry):
            yield _merge_frame(carry, avgdl, df_target, dead)

    return (
        unioned.repartition(num_partitions, "term")
        .sortWithinPartitions("term", "doc_offset", "salt")
        .mapInPandas(_merge_stream, TERM_SEGMENT_SCHEMA)
    )


def _merge_frame(pdf: pd.DataFrame, avgdl: float, df_target: int,
                 dead: "np.ndarray | None" = None) -> pd.DataFrame:
    """Merge a frame of segment rows (sorted by term) -> re-encoded rows.

    Decodes each input segment, offsets docIDs, concatenates per term,
    sorts by docID (parts are doc-disjoint but salts within a part
    interleave), splits into df_target-posting chunks, then reuses the
    vectorized group encoder."""
    terms = pdf["term"].to_numpy()
    change = np.zeros(len(pdf), bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(pdf))

    out_terms: list[str] = []
    out_salts: list[int] = []
    doc_arrs: list[np.ndarray] = []
    tf_arrs: list[np.ndarray] = []
    dl_arrs: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        docs, tfs, dls = [], [], []
        for i in range(s, e):
            row = pdf.iloc[i]
            d, t, l = decode_payload(row)  # codec-aware (varint | pack128)
            docs.append(d.astype(np.int64) + int(row["doc_offset"]))
            tfs.append(t.astype(np.int64))
            dls.append(l.astype(np.int64))
        d = np.concatenate(docs)
        t = np.concatenate(tfs)
        l = np.concatenate(dls)
        if dead is not None and len(d):
            live = ~np.isin(d, dead, assume_unique=False)
            d, t, l = d[live], t[live], l[live]
            if not len(d):
                continue
        order = np.argsort(d, kind="stable")
        d, t, l = d[order], t[order], l[order]
        for salt, c0 in enumerate(range(0, len(d), df_target)):
            c1 = min(c0 + df_target, len(d))
            out_terms.append(terms[s])
            out_salts.append(salt)
            doc_arrs.append(d[c0:c1])
            tf_arrs.append(t[c0:c1])
            dl_arrs.append(l[c0:c1])

    grouped = pd.DataFrame(
        {
            "term": out_terms,
            "salt": pd.Series(out_salts, dtype="int32"),
            "doc_arr": doc_arrs,
            "tf_arr": tf_arrs,
            "dl_arr": dl_arrs,
        }
    )
    return _encode_group_frame(grouped, ["term", "salt"], avgdl)
