#!/usr/bin/env python
"""spark-submit entry point for the index build (cluster deployment).

    zip -r engine.zip searchengine_spark/
    spark-submit --py-files engine.zip tools/submit_build.py \
        --input  <transcripts table/parquet path or 'synth:<n_convs>'> \
        --output <index dir (manifest + stage parquet tables)> \
        --layouts doc,term --shards 0 --df-target 100000

On a cluster the SparkSession comes from spark-submit's conf (master,
executors, memory); locally it falls back to local[*]. The build is
resumable: re-submitting with the same --output skips COMMITTED stages
(manifest.jsonl) — kill it mid-build and re-run to continue.

Query smoke after build (optional): --query "some words" runs block-max
WAND top-10 over the doc layout and prints the results.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path of transcripts, or synth:<n_convs>")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--layouts", default="doc",
                    help="comma list: doc,term")
    ap.add_argument("--shards", type=int, default=0,
                    help="doc shards (0 = corpus-derived)")
    ap.add_argument("--df-target", type=int, default=100_000)
    ap.add_argument("--doc-partitions", type=int, default=0)
    ap.add_argument("--segment-groups", type=int, default=1,
                    help="sub-checkpoint the doc-segment stage into G "
                         "shard groups (per-segment resume granularity)")
    ap.add_argument("--query", default=None)
    ap.add_argument("--force", action="store_true",
                    help="rebuild even if stages are COMMITTED")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from searchengine_spark.pipeline import read_manifest, run_build

    if args.input.startswith("synth:"):
        from searchengine_spark.sources.synth import transcripts_spark

        transcripts = transcripts_spark(spark, int(args.input.split(":", 1)[1]))
    else:
        transcripts = spark.read.parquet(args.input)

    idx = run_build(
        spark,
        transcripts,
        args.output,
        num_doc_partitions=args.doc_partitions or None,
        n_shards=args.shards or None,
        df_target=args.df_target,
        layouts=tuple(args.layouts.split(",")),
        force=args.force,
        segment_groups=args.segment_groups,
    )
    for m in read_manifest(args.output):
        if m["status"] == "COMMITTED":
            print(json.dumps(m), file=sys.stderr)
    print(json.dumps({
        "n_docs": idx.scalars.n_docs,
        "avgdl": round(idx.scalars.avgdl, 3),
        "out_dir": args.output,
    }))

    if args.query and idx.doc_segments is not None:
        from searchengine_spark.operators.wand import wand_topk

        top = wand_topk(idx.doc_segments, args.query, idx.term_stats,
                        idx.scalars.n_docs, idx.scalars.avgdl, k=10).collect()
        for r in top:
            print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 6)}))

    spark.stop()


if __name__ == "__main__":
    main()
