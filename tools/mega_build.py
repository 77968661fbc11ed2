"""One-off large-corpus build record: extend the throughput curve past the
bench corpus (333k turns) by an order of magnitude and show turns/sec holds.

Runs the identical north-star pipeline (synthetic transcripts ->
run_build full inverted index) at a sequence of corpus sizes on
local[$SPARK_GRAFT_CPUS] and prints one JSON line per size plus a summary.
Evidence goal: throughput flat-to-rising as the corpus grows 10x-30x =>
the build is data-parallel with no super-linear stage (the 100 TB claim's
local-scale footing). Usage:

    python tools/mega_build.py [n_convs ...]    # default: 150000 1000000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [150_000, 1_000_000]
    os.environ.setdefault("SPARK_GRAFT_BENCH_TMP", "/dev/shm")
    import bench  # reuses the bench harness: same warmup + timing rules

    spark = bench._spark(CPUS, shuffle=int(CPUS))
    out = []
    try:
        for n_convs in sizes:
            r = bench.build_transcripts_index(spark, n_convs, repeats=2)
            rec = {
                "n_convs": n_convs,
                "turns": r["turns"],
                "build_sec": r["build_sec"],
                "all_build_sec": r["all_build_sec"],
                "turns_per_sec": round(r["turns"] / r["build_sec"], 1),
                "terms": r.get("terms"),
                "postings": r.get("postings"),
                "index_bytes": r.get("bytes"),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        spark.stop()
    if len(out) >= 2:
        base, big = out[0], out[-1]
        ratio = big["turns_per_sec"] / base["turns_per_sec"]
        print(json.dumps({
            "mega_build": out,
            "data_scale_x": round(big["turns"] / base["turns"], 2),
            "throughput_ratio_big_over_base": round(ratio, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
