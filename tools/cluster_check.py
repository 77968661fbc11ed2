"""Cluster-mode CORRECTNESS sweep (spark-submit entry point).

Runs the named registry queries on a REAL standalone multi-executor
cluster session and compares each against its DuckDB oracle exactly like
the driver gate (tools/check_entry.py: row count + column names +
order-insensitive values). Real multi-executor shuffle FETCHES are the
only configuration that randomizes grouped-map/window row arrival order
(local mode fetches deterministically) — round 3's WAND nondeterminism
hid there — so the hash gate's coverage (index build + one query batch)
is widened here to the registry heads that lean on grouped-map kernels,
window functions, iterative joins, and sort-limit boundaries.

Prints ONE JSON line; exit 0 = all named queries match their oracles.
Launched by bench.py's cluster_correctness phase; also runnable by hand:

    spark-submit --master spark://127.0.0.1:7095 \
        --py-files searchengine_spark.zip tools/cluster_check.py \
        --master-url spark://127.0.0.1:7095 [names...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

#: Default sweep: the registry heads most exposed to shuffle-arrival
#: nondeterminism — grouped-map segment/WAND kernels, sort-merge,
#: federation unions, iterative CC, window functions, ADC re-rank.
DEFAULT_NAMES = [
    "wand_topk", "wand_term_topk", "batch_wand_topk", "wand_topk_deletes",
    "federated_topk", "federated_wand_topk", "consolidated_topk",
    "segment_roundtrip", "merge_segments_roundtrip", "phrase_topk",
    "near_topk", "bm25_topk_multi", "reference_topk", "hybrid_rrf_topk",
    "mmr_topk", "pq_topk", "minhash_dedup_pairs", "dedup_components",
    "dedup_components_lsls", "sessionized_counts_bucketed", "budget_select",
    "percolate_hits",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master-url", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from searchengine_spark.entry_queries import all_oracle_sql, all_queries
    from searchengine_spark.session import get_spark

    spark = get_spark("cluster-correctness", master=args.master_url,
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    names = args.names or DEFAULT_NAMES
    qs = all_queries()
    oracles = all_oracle_sql(args.sf_dir)
    per: dict = {}
    failures: list = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            per[name] = {"ok": False, "error": f"spark: {e}"[:200]}
            continue
        rec = {"rows": int(len(sdf)), "sec": round(time.time() - t0, 2)}
        if name not in oracles:
            rec["ok"] = len(sdf) > 0  # rows-only contract, like the driver
        else:
            a = normalize(sdf)
            b = normalize(con.execute(oracles[name]).df())
            rec["ok"] = bool(list(a.columns) == list(b.columns)
                             and len(a) == len(b) and a.equals(b))
        if not rec["ok"]:
            failures.append(name)
        per[name] = rec
    print(json.dumps({"sweep": "cluster_correctness", "n": len(names),
                      "n_failures": len(failures), "failures": failures,
                      "per_query": per}), flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
