"""Per-family (Spark, DuckDB-oracle) query definition modules.

The single ordered registry — load-bearing for the driver's prefix
correctness gate — lives in searchengine_spark.entry_queries.
"""
