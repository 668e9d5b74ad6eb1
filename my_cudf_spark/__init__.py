"""my_cudf_spark — a PySpark-native analytics engine with the capabilities of
the reference cuDF snapshot (RAPIDS cuDF 25.06), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder with a 100TB-minded config profile.
- ``sources``    : table loaders for the driver fixtures (parquet/csv/json
                   readers, ns-timestamp handling), catalog registration.
- ``functions``  : scalar/array/string/datetime/hash function library mapping
                   the reference's expression surface (SURVEY.md §2.8, §2.10)
                   onto ``pyspark.sql.functions``; decimal-stable aggregate
                   helpers for differential testing.
- ``operators``  : relational verbs (the cudf_polars IR node set, SURVEY.md
                   §2.1), joins (incl. as-of, theta, salted), dedup (exact,
                   minhash-LSH, simhash), windows (rolling/resample/ewma/
                   ffill), reshape (melt/pivot/one-hot), similarity (cosine
                   top-k, LSH ANN), multimodal column plumbing.
- ``streaming``  : Structured Streaming equivalents (tumbling/sliding/session
                   windows, watermarks, streaming dedup) — a capability
                   superset of the reference's Kafka ingest (SURVEY.md §2.12).
- ``queries``    : the registry of correctness queries consumed by
                   ``__spark_entry__.py`` (one entry per operator family) with
                   matching DuckDB oracle SQL.

Everything here targets partitioned, distributed execution: no ``collect()``
inside operators, broadcast hints for dimension tables, AQE-friendly plans.
"""

from my_cudf_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
