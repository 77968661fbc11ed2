"""SparkSession factory tuned for this engine.

Local mode is the sandbox proxy for a multi-executor cluster; the configs
below are the ones that matter at either scale:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (every UDF in this package is Arrow-batched),
- shuffle partitions sized to cores locally (on a cluster: 2-3x total cores),
- UTC session timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all cores).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(n)))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Pre-fault the heap at JVM start: this sandbox's Firecracker kernel
        # has an expensive page-fault path, and demand-faulting a 24g heap
        # from 32 task threads shows up as 40-80% kernel time.
        .config("spark.driver.extraJavaOptions", "-XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # v2 commit: tasks move their own output files; the driver-side
        # job commit is O(1) instead of a sequential rename per file.
        # Stage atomicity lives in the build manifest (COMMITTED rows),
        # not in the committer, so v2's weaker failure story is fine here.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                "2")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
