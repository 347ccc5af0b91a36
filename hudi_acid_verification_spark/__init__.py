"""PySpark-native analytics engine with the capabilities of the
``matthijseikelenboom/hudi-acid-verification`` reference, rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing, cluster-ready confs.
- ``acid``       : ``AcidTable`` — keyed, partitioned, snapshot-isolated COW parquet
                   table with an atomic JSON-manifest commit protocol (replaces the
                   reference's Hudi runtime; SURVEY.md §7.2).
- ``verify``     : the reference's client-side verification algebra (transaction log,
                   expectation fold, seeded workload generator, concurrent harness) —
                   reference defects D3/D4/D5 fixed (SURVEY.md §4.4).
- ``operators``  : the analytics operator surface (SURVEY.md §2B) — scans, joins,
                   aggregations, windows, set ops, scalar/array/json functions, dedup,
                   similarity search, text analysis. Registry-based: each operator
                   registers its PySpark implementation and its DuckDB oracle SQL.
- ``streaming``  : Structured Streaming windows (tumbling/sliding/session, watermark).
- ``functions``  : reusable column expressions / pandas UDFs (cosine, hashes, tokens).
"""

__version__ = "0.1.0"
