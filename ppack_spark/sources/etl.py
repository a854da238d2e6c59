"""Sources & sinks: TSV → partitioned parquet ETL, parquet scans.

Covers the reference's ingestion surface (SURVEY §2 ops 21-23):

* Arrow TSV dataset → column select → hive-partitioned parquet write
  (reference scratch.R:142-151, the NCVR voter-file ETL);
* parquet glob scan / CTAS (scratch.R:155-156);
* in-memory frame registration (``copy_to``, scratch.R:18,29,71).

Scale notes: the partitioned write is the standard layout play — the
partition column becomes a directory key so downstream reads prune
partitions; explicit schemas (never ``inferSchema`` at scale — it
double-reads the file); column pruning and predicate pushdown reach
the parquet scan automatically when reads are expressed lazily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_tsv",
    "tsv_to_partitioned_parquet",
    "read_parquet_glob",
    "write_bucketed",
    "write_jsonl",
    "read_jsonl",
    "write_orc",
    "read_orc",
    "write_sharded",
    "load_tables",
    "register_views",
]

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """TSV scan (reference scratch.R:143 ``open_dataset(format='tsv')``)."""
    reader = spark.read.option("sep", "\t").option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write one JSON object per line (JSONL — the interchange format
    most raw text corpora arrive in). Newlines inside string values
    are JSON-escaped, so the line = record invariant holds for any
    text. Files split per partition: the write is embarrassingly
    parallel and the output re-reads with full parallelism."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """JSONL scan with an explicit schema. The schema is REQUIRED by
    design: schema inference double-reads the input (a full pass just
    to sample types), which is never acceptable at corpus scale, and
    silently widens types between drops. Malformed lines surface in
    the standard ``_corrupt_record`` PERMISSIVE-mode contract if the
    caller adds that field to the schema."""
    return spark.read.schema(schema).json(path)


def tsv_to_partitioned_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    columns: list[str],
    partition_by: str | list[str],
    schema: T.StructType | str | None = None,
    mode: str = "overwrite",
) -> None:
    """TSV → select columns → hive-partitioned parquet
    (reference scratch.R:142-151)."""
    df = read_tsv(spark, src, schema=schema).select(*columns)
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(dest)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table
    and return the re-read handle.

    This is the co-located-join primitive at 100 TB: two tables
    bucketed by the same key with the same bucket count join as a
    SortMergeJoin with NO Exchange on either side (and with
    ``sort=True`` no per-task Sort beyond the merge) — the shuffle is
    paid once at write time and amortized over every subsequent join,
    the standard layout for a fact table joined repeatedly on one key
    (verified by plan test tests/test_etl.py). Requires
    ``saveAsTable`` (bucket metadata lives in the catalog); pass
    ``path`` to make it an external table at a chosen location."""
    w = df.write.mode(mode).bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def read_parquet_glob(spark: SparkSession, pattern: str) -> DataFrame:
    """Glob parquet scan (reference scratch.R:155-156
    ``read_parquet('.../*/*.parquet')``); partition columns are
    recovered from hive paths automatically."""
    return spark.read.option("basePath", _base_of(pattern)).parquet(pattern) \
        if "*" in pattern else spark.read.parquet(pattern)


def _base_of(pattern: str) -> str:
    parts = pattern.split("/")
    base = []
    for p in parts:
        if "*" in p:
            break
        base.append(p)
    return "/".join(base) or "/"


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long (nanos since
    epoch) under ``spark.sql.legacy.parquet.nanosAsLong``; convert to a
    microsecond timestamp — the same ns→us truncation DuckDB applies,
    so oracle comparisons line up."""
    from pyspark.sql import functions as F

    out = df
    for name, dtype in df.dtypes:
        if name == "ts" and dtype == "bigint":
            out = out.withColumn(name, F.timestamp_micros((F.col(name) / 1000).cast("long")))
    return out


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's star-schema fixtures (TESTDATA.md)."""
    return {
        name: _normalize_nanos(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        for name in (names or TABLE_NAMES)
    }


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register fixtures as temp views for the SQL API
    (``copy_to``-equivalent, scratch.R:18)."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC write (Spark-native columnar format; the interchange
    alternative where the downstream stack is Hive/Trino-flavored).
    Same parallel-write contract as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Schema rides in the file footer (self-describing like
    parquet), so no explicit schema is needed; predicate pushdown and
    column pruning work the same as the parquet scan."""
    return spark.read.orc(path)


def write_sharded(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Size-bounded shard export: cap records per output file
    (``maxRecordsPerFile`` — the writer rolls files within each task).
    The contract trainers want for corpus snapshots: bounded shard
    size for shuffle-free loading, no global sort or repartition
    needed to achieve it."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .format(fmt)
        .save(path)
    )
