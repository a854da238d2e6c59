"""Comparison vectors, agreement-pattern counts, u-probability estimation.

* ``do_comparisons`` — evaluate named comparator expressions, keeping
  only them (reference linking.R:72-74, a transmute).
* ``pattern_counts`` — multi-column group-by count over the comparison
  vector (reference scratch.R:51-54). Nulls group together, matching
  both R ``count`` and SQL GROUP BY. This is the EM's sufficient
  statistic: its cardinality is bounded by ∏ levels regardless of data
  size, so only a tiny table ever reaches the driver (via Arrow).
* ``u_probability_frequencies`` — the tail of ``calculate_u_probs``
  (reference scratch.R:78-83): unpivot comparator columns to
  (comparator, level), drop missing, count, normalize per comparator.

The whole path is one Catalyst plan: join → project(gammas) →
partial/final hash aggregate. Map-side partial aggregation collapses
each partition to ≤ ∏ levels rows before the shuffle, so the shuffle
volume is O(partitions · patterns), not O(pairs) — this is the reason
pattern counting scales to 100 TB of pairs.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Union

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .exprs import as_column

__all__ = [
    "do_comparisons",
    "pattern_counts",
    "u_probability_frequencies",
    "mu_from_labels",
    "collect_probabilities",
]


def do_comparisons(
    joined_data: DataFrame,
    expr_list: Mapping[str, Union[Column, str]],
    keep: list[str] | None = None,
) -> DataFrame:
    """Project to the named comparator columns (transmute,
    linking.R:73). ``keep`` optionally retains id columns for scoring."""
    cols = [F.col(c) for c in (keep or [])]
    cols += [as_column(e).alias(name) for name, e in expr_list.items()]
    return joined_data.select(*cols)


def pattern_counts(comparisons: DataFrame, gamma_cols: list[str] | None = None) -> DataFrame:
    """Group-by-count over the comparison vector (scratch.R:51-54)."""
    gamma_cols = gamma_cols or comparisons.columns
    return comparisons.groupBy(*gamma_cols).agg(F.count(F.lit(1)).alias("n"))


def u_probability_frequencies(comparisons: DataFrame) -> DataFrame:
    """Per-comparator level frequencies over (random) pairs →
    ``(comparator, level, n, p)`` with ``p`` normalized within
    comparator over non-missing rows (scratch.R:79-83).

    Unpivot via ``stack`` stays in-plan; the per-comparator total uses
    a window sum over the already-aggregated (tiny) counts table, so
    the window is cheap regardless of pair count.
    """
    gamma_cols = comparisons.columns
    k = len(gamma_cols)
    stack_args = ", ".join(f"'{c}', `{c}`" for c in gamma_cols)
    long = comparisons.select(
        F.expr(f"stack({k}, {stack_args}) as (comparator, level)")
    )
    counts = (
        long.filter(F.col("level").isNotNull())  # drop_na, scratch.R:82
        .groupBy("comparator", "level")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("comparator")
    return counts.withColumn("p", F.col("n") / F.sum("n").over(w))


def mu_from_labels(
    comparisons: DataFrame,
    truth_col: str = "true_match",
    gamma_cols: list[str] | None = None,
) -> DataFrame:
    """Supervised Fellegi-Sunter parameter estimation from LABELED
    pairs — the direct-estimation alternative to :func:`~ppack_spark.
    em.run_em` when ground-truth match labels exist (a clerical
    review sample, a golden-record join): per comparator level,
    ``m = P(level | match)`` and ``u = P(level | non-match)``, the
    maximum-likelihood estimates the EM converges toward.

    Returns ``(comparator, level, n_match, n_nonmatch, m, u)`` with
    m/u normalized within comparator over non-missing levels
    (missing-γ rows are excluded from both numerator and denominator,
    matching the EM's NA handling — linking.R:103,108) and rounded to
    6 decimals; rows with a NULL label are skipped (an unjudged pair
    is evidence for neither class). A class with zero labeled pairs
    yields NULL for its probabilities rather than a division error.

    One unpivot + one (comparator, level)-keyed count is the only
    pass over the pairs (map-side partial agg — the
    ``pattern_counts`` scale shape); the normalizing window runs over
    the ≤ ∏ levels cell table.
    """
    gamma_cols = gamma_cols or [
        c for c in comparisons.columns if c != truth_col
    ]
    if not gamma_cols:
        raise ValueError("mu_from_labels: no gamma columns")
    k = len(gamma_cols)
    stack_args = ", ".join(f"'{c}', `{c}`" for c in gamma_cols)
    # Aggregate to the (truth, γ₁..γₖ) pattern table FIRST — the EM's
    # sufficient statistic, ≤ 2·∏ levels rows regardless of pair
    # count — then unpivot THAT. The previous shape unpivoted the pair
    # frame itself (a Generate doubling every pair row k-fold before
    # the partial aggregation); this one's only pass over the pairs is
    # a map-side-combined groupBy on k+1 narrow keys, the
    # pattern_counts scale shape. Identical cells fall out: summing
    # pattern counts per (comparator, level, truth) is the same
    # arithmetic as counting unpivoted rows.
    patt = (
        comparisons.filter(F.col(truth_col).cast("boolean").isNotNull())
        .groupBy(
            F.col(truth_col).cast("boolean").alias("__t"),
            *[F.col(c) for c in gamma_cols],
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    long = patt.select(
        "__t",
        "__n",
        F.expr(f"stack({k}, {stack_args}) as (comparator, level)"),
    ).filter(F.col("level").isNotNull())
    cell = long.groupBy("comparator", "level").agg(
        F.sum(
            F.when(F.col("__t"), F.col("__n")).otherwise(F.lit(0))
        ).alias("n_match"),
        F.sum(
            F.when(~F.col("__t"), F.col("__n")).otherwise(F.lit(0))
        ).alias("n_nonmatch"),
    )
    w = Window.partitionBy("comparator")
    tm = F.sum("n_match").over(w)
    tu = F.sum("n_nonmatch").over(w)
    return cell.select(
        "comparator",
        "level",
        F.col("n_match").cast("long").alias("n_match"),
        F.col("n_nonmatch").cast("long").alias("n_nonmatch"),
        F.round(F.when(tm > 0, F.col("n_match") / tm), 6).alias("m"),
        F.round(F.when(tu > 0, F.col("n_nonmatch") / tu), 6).alias("u"),
    )


def collect_probabilities(freqs: DataFrame) -> dict[str, dict[str, float]]:
    """Collect a ``(comparator, level, p)`` frame into the nested
    dict-of-dicts parameter shape (scratch.R:89-96's
    group_split + set_names, driver-side)."""
    pdf: pd.DataFrame = freqs.select("comparator", "level", "p").toPandas()
    out: dict[str, dict[str, float]] = {}
    for row in pdf.itertuples(index=False):
        out.setdefault(row.comparator, {})[row.level] = float(row.p)
    return {name: dict(sorted(levels.items())) for name, levels in sorted(out.items())}
