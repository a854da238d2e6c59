"""Bucketed range (interval) join.

Joining point events to time intervals (``start <= ts < end``) with a
bare non-equi predicate forces Catalyst into a nested-loop join — or,
with an equi key, a hash join whose per-key candidate set is
points×intervals. The standard scale construction used here bins time
into fixed-width buckets: each point lands in one bucket, each
interval explodes to the buckets it covers, and the join becomes a
pure EQUI join on (key, bucket) with the exact range predicate as a
cheap post-filter. Candidate pairs are bounded by bucket co-residency
instead of key cardinality, and each (point, interval) pair meets
exactly once (the point's single bucket is one of the interval's
buckets), so no dedup pass is needed.

Pick ``bucket_width`` near the typical interval length: too small
multiplies the interval fan-out rows, too large grows candidates per
bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_bucketed"]


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts: str,
    start: str,
    end: str,
    bucket_width: float,
) -> DataFrame:
    """Equi-bucket range join: rows of ``points`` matched to rows of
    ``intervals`` with the same ``on`` key(s) and
    ``start <= ts < end`` (inclusive start, exclusive end).

    ``ts``/``start``/``end`` are numeric columns (cast timestamps to
    epoch first). Returns all point columns + all interval columns.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    w = F.lit(float(bucket_width))
    pts = points.withColumn(
        "__bin", F.floor(F.col(ts) / w).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / w).cast("long"),
                F.floor(F.col(end) / w).cast("long"),
            )
        ),
    )
    return (
        pts.join(iv, on=on_cols + ["__bin"], how="inner")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bin")
    )
