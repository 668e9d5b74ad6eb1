"""IO connectors (SURVEY.md §2.2 — reference ``cpp/include/cudf/io/``,
the largest libcudf module at ~85k LoC; here each format is a thin,
option-mapped wrapper over Spark's readers/writers, which already do
projection/filter/row-group pruning natively).

Format parity map (reference header → here):
- csv.hpp read/write            → :func:`read_csv` / :func:`write_csv`
- parquet.hpp read/write (projection :60,226; AST pushdown :70,198;
  chunked reader :542)          → :func:`read_parquet` / :func:`write_parquet`
  (Catalyst pushes projections/filters; chunking = input split sizing via
  ``spark.sql.files.maxPartitionBytes``)
- orc.hpp                       → :func:`read_orc` / :func:`write_orc`
- json.hpp (NDJSON, nested)     → :func:`read_json` / :func:`write_json`
- text/multibyte_split.hpp (byte-range parallel raw text with custom
  delimiter)                    → :func:`read_text` (``lineSep``; Spark
  splits files by range across executors natively)
- avro.hpp (read-only)          → :func:`read_avro` (needs the external
  spark-avro package — detected at call time)
- interop.hpp to/from arrow     → :func:`to_arrow` / :func:`from_arrow`
  (Spark 4 ``df.toArrow()`` / ``createDataFrame(pa.Table)``)
- dlpack, feather/hdf           → out of scope (tensor interop / pandas
  round-trip niches, SURVEY.md §2.2)

Schema policy mirrors the reference: explicit schema everywhere, inference
only at the CSV/JSON boundary when the caller asks for it.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "read_csv",
    "write_csv",
    "read_json",
    "write_json",
    "read_parquet",
    "write_parquet",
    "read_orc",
    "write_orc",
    "read_text",
    "read_avro",
    "to_arrow",
    "from_arrow",
    "write_sized",
    "write_clustered",
    "compact",
]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
    sep: str = ",",
    null_value: str | None = None,
    timestamp_format: str | None = None,
    **options: Any,
) -> DataFrame:
    """CSV scan (csv.hpp): explicit schema preferred; ``infer_schema``
    triggers the extra inference pass (same tradeoff as the reference's
    dtype inference)."""
    reader = spark.read.options(header=header, sep=sep, **options)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",", **options: Any) -> None:
    df.write.mode("overwrite").options(header=header, sep=sep, **options).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
    **options: Any,
) -> DataFrame:
    """NDJSON scan (json.hpp reads JSON-lines; ``multiline`` covers whole-
    file documents). Nested dtypes come from the schema, inference
    otherwise."""
    reader = spark.read.options(multiLine=multiline, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, **options: Any) -> None:
    df.write.mode("overwrite").options(**options).json(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Parquet scan (parquet.hpp:56-604).  Column projection and predicate
    land in the scan node (PushedFilters / ReadSchema in .explain) — the
    reader-level options the reference exposes explicitly are what Catalyst
    derives from the plan here."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    **options: Any,
) -> None:
    """Parquet write (parquet.hpp:1346).  ``partition_by`` produces the
    hive layout that enables partition pruning on read — the scale lever
    the single-file reference lacks."""
    w = df.write.mode("overwrite").options(compression=compression, **options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, **options: Any) -> None:
    df.write.mode("overwrite").options(**options).orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    line_sep: str | None = None,
    whole_text: bool = False,
) -> DataFrame:
    """Raw text scan (text/multibyte_split.hpp:40-77): one row per
    delimiter-separated record; Spark parallelizes by byte ranges across
    executors exactly like the reference's byte-range reader."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    if whole_text:
        reader = reader.option("wholetext", True)
    return reader.text(path)


def read_avro(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """Avro scan (avro.hpp).  Spark's Avro support lives in the external
    ``spark-avro`` package; without it on the classpath this raises
    NotImplementedError naming the dependency (by design in this
    environment)."""
    try:
        return spark.read.format("avro").options(**options).load(path)
    except Exception as e:  # AnalysisException: FAILED_FIND_DATA_SOURCE
        if "avro" in str(e).lower():
            raise NotImplementedError(
                "Avro needs the spark-avro package "
                "(--packages org.apache.spark:spark-avro_2.13:<spark version>)"
            ) from e
        raise


def to_arrow(df: DataFrame):
    """DataFrame → pyarrow.Table (interop.hpp:466-722 to_arrow_host)."""
    return df.toArrow()


def from_arrow(spark: SparkSession, table) -> DataFrame:
    """pyarrow.Table → DataFrame (interop.hpp from_arrow)."""
    return spark.createDataFrame(table)


def _plan_size_bytes(df: DataFrame, target_file_bytes: int) -> int:
    """Estimated byte size of ``df`` for sizing output file counts.

    Primary: Catalyst's optimized-plan statistics
    (``LogicalPlan.stats.sizeInBytes`` — driver-side, free, no job).  The
    py4j handle (``_jdf``) is not public API; its shape has been stable
    across Spark 3.x/4.x but this helper is the single pinned touchpoint,
    with two public fallbacks when the handle shape changes: (a) sum of
    the input files' on-disk sizes (``df.inputFiles()`` + ``pyarrow.fs``
    — works for file/hdfs/s3 URIs, slightly UNDERstates post-scan width
    but lands in the right decade), then (b) one target-size file per
    default-parallelism slot."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        pass
    try:
        import pyarrow.fs as pafs

        total = 0
        for uri in df.inputFiles():
            fs, fpath = pafs.FileSystem.from_uri(uri)
            info = fs.get_file_info(fpath)
            if info.size is not None:
                total += int(info.size)
        if total > 0:
            return total
    except Exception:
        pass
    return df.sparkSession.sparkContext.defaultParallelism * target_file_bytes


def write_sized(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    target_file_bytes: int = 128 << 20,
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    **options: Any,
) -> int:
    """Write with OUTPUT FILE SIZING — the knob plain ``df.write`` lacks
    and 100 TB curation pipelines need twice: upstream filtering yields
    thousands of near-empty tasks (small-files problem), while unsplit
    monsters stall single readers.

    File count is derived from Catalyst's optimized-plan size estimate
    (``LogicalPlan.stats.sizeInBytes`` — free: statistics propagation, no
    extra job) divided by ``target_file_bytes``, then enforced with a
    round-robin ``repartition(n)`` so every output file lands near the
    target.  The in-memory estimate overstates on-disk parquet (encoding +
    compression), so files come out under target rather than over — the
    safe side for parallel readers.  ``max_records_per_file`` adds Spark's
    own hard cap as a belt-and-braces bound.  Returns the partition count
    used.

    With ``partition_by``, rows are first hash-distributed on the
    partition columns so each directory is written by as few tasks as
    possible (the files-per-directory explosion of round-robin +
    partitionBy), still capped at ``n`` overall.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    est = _plan_size_bytes(df, target_file_bytes)
    n = max(1, min(1 << 16, -(-est // target_file_bytes)))
    if partition_by:
        out = df.repartition(n, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n)
    writer = out.write.format(format).mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return n


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    format: str = "parquet",
    target_file_bytes: int = 128 << 20,
    **options: Any,
) -> int:
    """Write range-clustered, sorted-within-file output so downstream
    scans prune at BOTH granularities: ``repartitionByRange`` gives each
    file a disjoint key range (file-level skipping from parquet
    min/max footer stats), and ``sortWithinPartitions`` orders rows
    inside each file (row-group-level skipping; also the layout
    MergeSorted/as-of consumers want).  This is the data-layout lever a
    100 TB curation pipeline applies to its hottest filter column —
    a point/range predicate then reads 1/n of the files instead of all
    of them (demonstrated in tests/test_io.py).  File count comes from
    the same plan-statistics sizing as ``write_sized``; returns it.
    """
    if not cluster_by:
        raise ValueError("cluster_by must be non-empty")
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    est = _plan_size_bytes(df, target_file_bytes)
    n = max(1, min(1 << 16, -(-est // target_file_bytes)))
    cols = [F.col(c) for c in cluster_by]
    out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    writer = out.write.format(format).mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return n


def compact(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    target_file_bytes: int = 128 << 20,
    **options: Any,
) -> int:
    """Rewrite a directory of small files into near-target-size files
    (the maintenance pass after many incremental/streaming appends).
    Returns the partition count written.  Writes to ``path + '.compact'``
    then the caller swaps — an in-place overwrite of the input path would
    delete the source mid-read (Spark reads lazily)."""
    df = spark.read.format(format).options(**options).load(path)
    return write_sized(df, path + ".compact", format, target_file_bytes)


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "__z",
) -> DataFrame:
    """Attach a Z-order (Morton) key interleaving the bits of the given
    numeric columns — the MULTI-dimensional data-layout lever
    (Delta/Iceberg OPTIMIZE ZORDER BY): range-clustering on the Morton
    key makes every file's footer stats tight on EVERY participating
    column at once, so predicates on any of them prune files, where 1-D
    range clustering helps only its own column.

    Each column is min-max normalized to a ``bits``-bit integer via one
    tiny aggregate broadcast (merge-order-insensitive min/max — the same
    determinism argument as global_cumsum's bucket path), then bits
    interleave column-major: bit i of column j lands at position
    ``i*len(cols)+j``.  Pure Column arithmetic — shifts and ORs unrolled
    ``bits × len(cols)`` times, all inside whole-stage codegen.  NULLs
    normalize to slot 0.  ``bits × len(cols)`` must fit a long (≤ 62)."""
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    mm = df.agg(*aggs)
    d = df.join(F.broadcast(mm), F.lit(True), "left")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = hi - lo
        q = F.when(
            F.col(c).isNull() | (span <= 0), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - lo) / span * (top + 1)).cast("long"),
            )
        ).cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * len(cols) + j)
            )
    return d.withColumn(out_col, z).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    format: str = "parquet",
    target_file_bytes: int = 128 << 20,
    bits: int = 16,
    **options: Any,
) -> int:
    """Z-order clustered write: Morton key from :func:`zorder_key`, then
    the :func:`write_clustered` range + in-file sort layout on that key
    (key dropped from the output).  Point/range predicates on ANY of the
    ``zorder_by`` columns prune files via footer stats — the 2-D+
    generalization demonstrated quantitatively in tests/test_io.py."""
    keyed = zorder_key(df, list(zorder_by), bits=bits)
    est = _plan_size_bytes(keyed, target_file_bytes)
    n = max(1, min(1 << 16, -(-est // target_file_bytes)))
    out = (
        keyed.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.format(format).mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return n
