"""Table sources: fixture loaders + generic readers.

Reference parity: libcudf ``io`` module (SURVEY.md §2.2) — CSV/Parquet/ORC/
JSON/Avro/text readers with projection + predicate pushdown
(``cpp/include/cudf/io/parquet.hpp:56-604``).  In Spark all of that pushdown
is Catalyst-native; this module only centralizes schema quirks of the driver
fixtures (ns timestamps) and catalog registration.
"""

from my_cudf_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
