"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure a CPU-heavy per-row stage can use the whole cluster.

    Spark sizes scan splits by BYTES (``maxPartitionBytes``), but the
    hashing/similarity operators here are bound by per-row COMPUTE: a
    small parquet file (one split) would pin an entire
    signature-computation stage to a single core. When the input has
    fewer partitions than the cluster's default parallelism,
    round-robin repartition up to it — the shuffle of the raw input is
    cheap relative to the per-row work it unlocks. At real scale
    (thousands of splits) this is a no-op.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
