"""Table storage abstraction: Iceberg catalog on clusters, Parquet dirs in
the sandbox — one code path (SURVEY.md §7 design stance).

The north star mandates Iceberg tables; this sandbox ships no Iceberg
jars, so the backend is chosen by config: pass ``catalog`` (e.g.
``"ice.search"``) to route every table through ``writeTo`` (Iceberg v2,
partitioned, manifest-tracked by the catalog), or a ``root`` directory for
plain Parquet with identical table names and layouts. ``pipeline.run_build``
accepts either.

Iceberg specifics handled here when a catalog is set:
- identity partitioning on the given column (doc shards / term buckets),
- ``createOrReplace`` for overwrite semantics matching Parquet mode,
- existence = catalog lookup instead of path check.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Storage:
    spark: SparkSession
    root: str | None = None          # Parquet mode: directory of tables
    catalog: str | None = None       # Iceberg mode: "<catalog>.<namespace>"

    def __post_init__(self):
        if not (self.root or self.catalog):
            raise ValueError("Storage needs a Parquet root or an Iceberg catalog")

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def write(self, df: DataFrame, name: str,
              partition_by: str | None = None) -> None:
        if self.catalog:
            w = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            if partition_by:
                w = w.partitionedBy(partition_by)
            w.createOrReplace()
        else:
            wr = df.write.mode("overwrite")
            if partition_by:
                wr = wr.partitionBy(partition_by)
            wr.parquet(self._path(name))

    def read(self, name: str, schema=None) -> DataFrame:
        """``schema`` (when the caller already knows it, e.g. it just wrote
        the table) skips the parquet footer-inference job — one fewer
        driver-blocking job per stage transition."""
        if self.catalog:
            return self.spark.table(f"{self.catalog}.{name}")
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(self._path(name))

    def file_rows(self, name: str) -> dict[str, int] | None:
        """Per-file row counts from parquet footers — driver-side metadata
        only, NO Spark job (footers are O(files), not O(rows)). Returns
        None in catalog mode (callers fall back to a distributed scan;
        Iceberg exposes the same numbers via its manifest tables)."""
        if self.catalog:
            return None
        import pyarrow.parquet as pq

        root = self._path(name)
        out: dict[str, int] = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    full = os.path.join(dirpath, fn)
                    out[os.path.relpath(full, root)] = \
                        pq.read_metadata(full).num_rows
        return out
