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

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(self._path(name))
