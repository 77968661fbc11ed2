"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB (default sf0.01; override with
SPARK_GRAFT_SF_DIR); compare row count, column names, and
order-insensitive values. Usage: python tools/check_entry.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def main():
    import __spark_entry__ as entry_mod
    from searchengine_spark.session import get_spark

    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    # oracle_sql() is pinned to the driver's sf0.01 per contract; for
    # cross-sf sweeps regenerate the data-dependent oracles for SF_DIR
    from searchengine_spark.entry_queries import all_oracle_sql

    oracles = all_oracle_sql(SF_DIR)
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        msg = None
        if list(a.columns) != list(b.columns):
            msg = f"columns {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            msg = f"rowcount {len(a)} vs {len(b)}"
        elif not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            msg = f"values differ in {int(bad.sum())} rows; first:\n{a[bad].head(3)}\nvs\n{b[bad].head(3)}"
        if msg:
            failures.append((name, msg))
            print(f"FAIL  {name}: {msg[:500]}")
        else:
            print(f"ok    {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures")
    for n, m in failures:
        print(f"  - {n}: {m[:200]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
