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
    "zorder_key",
    "write_zordered",
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
    partition_by: list[str] | None = None,
) -> None:
    """Size-bounded shard export: cap records per output file
    (``maxRecordsPerFile`` — the writer rolls files within each task).
    The contract trainers want for corpus snapshots: bounded shard
    size for shuffle-free loading, no global sort or repartition
    needed to achieve it.

    ``partition_by`` adds hive-style directory partitioning (e.g.
    ``["split"]`` or ``["split", "lang"]`` after ``split_corpus``):
    the trainer's train/val/test readers then scan disjoint
    directories and partition pruning makes eval-set reads free.
    """
    w = df.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def zorder_key(
    cols: list,
    bounds: list[tuple[int, int]],
    bits: int = 12,
):
    """Morton (Z-order) interleave key over integer columns — the
    multi-dimensional data-layout primitive: sorting by this key keeps
    rows close in EVERY dimension physically close, so parquet
    row-group/file min-max stats become tight bounding boxes and a
    range filter on ANY of the columns prunes files, not just one on
    the leading sort column (the Delta Lake / ClickHouse
    OPTIMIZE ZORDER layout, here as a pure expression).

    ``bounds`` gives (min, max) per column; values scale to a
    ``bits``-bit grid cell via ``(v − min) · 2^bits / (max − min + 1)``
    (exact: the numerator is capped below 2⁵³ by construction, see the
    guard), clamped into the grid, then bit ``b`` of column ``i``
    lands at interleaved position ``b·m + i``. Every term is a
    shift/mask expression — whole-stage codegen, no UDF, bit-identical
    in any engine with integer shifts (the oracle replays it).
    ``bits · len(cols)`` must fit a long; the default 12-bit grid
    (4096 cells per dimension) is plenty for file-level skipping.
    """
    from pyspark.sql import functions as F

    m = len(cols)
    if m == 0 or m != len(bounds):
        raise ValueError("need one (min, max) bound per column")
    if bits * m > 63:
        raise ValueError(f"bits*cols = {bits * m} exceeds a long")
    z = F.lit(0).cast("long")
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        col = F.col(c) if isinstance(c, str) else c
        span = int(hi) - int(lo) + 1
        if span <= 0:
            raise ValueError(f"empty bound for column {i}: ({lo}, {hi})")
        if span * (1 << bits) >= (1 << 53):
            raise ValueError(
                f"span {span} at {bits} bits overflows exact double "
                "division — reduce bits or pre-bucket the column"
            )
        # (v - lo) * 2^bits / span is a whole-number-exact double here
        # (numerator < 2^53), so the floor-cast is engine-stable
        cell = F.least(
            F.greatest(
                F.floor(
                    (col.cast("long") - F.lit(int(lo)))
                    * F.lit(1 << bits)
                    / F.lit(span)
                ).cast("long"),
                F.lit(0),
            ),
            F.lit((1 << bits) - 1),
        )
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * m + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize ``df`` as parquet laid out in Z-order on ``cols``
    and return the re-read handle.

    Plan: one tiny min/max aggregate per column (driver scalars, like
    the PQ codebooks), then ``repartitionByRange`` on the Morton key
    (range partitioning = contiguous z-ranges = disjoint bounding
    boxes per file) + ``sortWithinPartitions`` so row groups inside a
    file tile too. Cost is ONE extra shuffle at write time; every
    subsequent selective read on any of ``cols`` prunes files via
    parquet min/max stats — the amortization argument as bucketed
    writes, but for multi-dimensional range filters instead of
    equi-joins. The z key column is dropped from the output (derivable
    from the data; layout is its only job)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("long").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    bounds = [(stats[f"mn_{i}"], stats[f"mx_{i}"]) for i in range(len(cols))]
    if any(b[0] is None or b[1] is None for b in bounds):
        # empty input (or an all-NULL layout column): there are no
        # bounds to grid, and nothing to lay out — write the frame
        # as-is instead of dying inside the key builder
        df.write.mode(mode).parquet(path)
        return df.sparkSession.read.parquet(path)
    z = zorder_key(cols, bounds, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)
