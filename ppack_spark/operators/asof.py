"""As-of (backward-looking temporal) join.

Spark has no native ASOF JOIN (DuckDB does; so do kdb/pandas). The
standard scalable construction is the union-sort trick used here:

    tag left/right rows → union → one window per partition key ordered
    by (ts, side) → a single ``last(struct(ts, *right_cols),
    ignorenulls=True)`` carries the most recent right ROW forward onto
    each left row (one struct, so every carried value — including
    NULLs — comes from the same matched right row).

Cost: ONE shuffle on the partition key + a per-partition sort — the
same shape as any windowed aggregate, with none of the range-join
blowup of the join-then-filter formulation (which produces
O(left × right-per-key) intermediates before picking the max). Ties
(left.ts == right.ts) match inclusively, like DuckDB's ``ON l.ts >=
r.ts``: the right row sorts before the left row at equal timestamps.

Right rows should be unique per (key, ts) for deterministic output —
pre-aggregate the right side if needed (the registry query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    right_cols: list[str] | None = None,
    ts_matched: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Join each left row to the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` key(s)
    (``direction='backward'``, the default), or to the NEAREST
    FOLLOWING right row with ``right.ts >= left.ts``
    (``direction='forward'`` — the "next event after" labeling shape:
    next purchase after a click, next failure after a deploy). Both
    directions match ties inclusively, like DuckDB's ``ASOF JOIN``
    with ``>=`` / ``<=``.

    Returns every left column plus the matched ``right_cols`` and the
    matched right timestamp (``ts_matched``, default ``{ts}_matched``).
    ``how='inner'`` drops left rows with no matching right row (DuckDB
    ``ASOF JOIN``); ``how='left'`` keeps them with nulls (``ASOF LEFT
    JOIN``). Forward is the same union-sort plan with the sort
    reversed — one shuffle, no range fan-out, either way.

    ``tolerance`` (pandas ``merge_asof`` surface) bounds the match
    gap: a nearest match farther than ``tolerance`` from the left
    timestamp counts as NO match (dropped under ``how='inner'``,
    NULLed under ``how='left'``) — a click should not join a purchase
    from last month just because nothing newer exists. Correct as a
    post-predicate on the carried match: the as-of match is the
    NEAREST right row, so if it misses the window every other
    candidate misses by more. Units: seconds for timestamp columns
    (TIMESTAMP_NTZ compared under the session zone), the column's own
    units for numeric ``ts``. The plan gains one codegen'd filter —
    no extra shuffle.
    """
    from pyspark.sql import types as T

    on_cols = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on_cols + [ts]]
    ts_matched = ts_matched or f"{ts}_matched"

    # ALL carried values travel in ONE struct filled by a single
    # last(ignorenulls=True): if the matched right row has NULL in some
    # right_col, the output keeps that NULL (DuckDB ASOF semantics) —
    # independent per-column last() would back-fill it from an OLDER
    # right row, stitching values from different right rows.
    carry_type = T.StructType(
        [T.StructField(ts_matched, right.schema[ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__carry", F.lit(None).cast(carry_type)
    )

    r = right.select(
        *on_cols,
        F.col(ts),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts).alias(ts_matched), *[F.col(c) for c in right_cols]
        ).alias("__carry"),
    )
    for c in left.columns:
        if c not in on_cols + [ts]:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    u = l.select(l.columns).unionByName(r.select(l.columns))
    # forward = the same carry trick over the REVERSED timestamp order:
    # preceding rows then have ts >= current, and last(...) picks the
    # nearest following right row. Ties stay inclusive in both
    # directions because the right side (0) sorts before the left (1).
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__carry", F.last("__carry", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")

        def _num(col: "F.Column", dtype) -> "F.Column":
            # TIMESTAMP_NTZ casts to double only via timestamp_ltz
            # (the sources/etl.py _normalize_nanos gotcha)
            if isinstance(dtype, T.TimestampNTZType):
                col = col.cast("timestamp_ltz")
            return col.cast("double")

        lt = _num(F.col(ts), left.schema[ts].dataType)
        rt = _num(F.col(f"__carry.{ts_matched}"), right.schema[ts].dataType)
        gap = lt - rt if direction == "backward" else rt - lt
        out = out.withColumn(
            "__carry",
            F.when(gap <= float(tolerance), F.col("__carry")),
        )
    if how == "inner":
        out = out.filter(F.col("__carry").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"__carry.{ts_matched}").alias(ts_matched),
        *[F.col(f"__carry.{c}").alias(c) for c in right_cols],
    )
