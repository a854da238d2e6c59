"""Match-weight scoring, thresholding, truth labelling.

The fitted parameters go *back into the plan*: they are compiled into
one generated CASE-WHEN Column (reference scratch.R:109-129), fully
whole-stage-codegen-able — no UDF, no lookup join, executes at scan
speed over however many pairs exist.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .em import FSParams
from .exprs import match_weight_column, suffixed

__all__ = ["score_pairs", "threshold_and_rank", "label_with_truth", "posterior_probability"]


def score_pairs(
    comparisons: DataFrame,
    params: FSParams,
    gamma_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Append the summed FS ``weight`` column (scratch.R:128-129).
    Missing (NULL) gammas contribute 0 (scratch.R:122)."""
    w = match_weight_column(params.m_probabilities, params.u_probabilities, gamma_cols)
    return comparisons.withColumn("weight", w)


def posterior_probability(scored: DataFrame, params: FSParams) -> DataFrame:
    """Convert weight → posterior match probability using fitted λ:
    p = λ·e^w / (λ·e^w + (1−λ)). In-plan, stable for the weight ranges
    FS produces."""
    lam = float(params.lam)
    odds = F.lit(lam / (1.0 - lam)) * F.exp(F.col("weight"))
    return scored.withColumn("match_probability", odds / (odds + F.lit(1.0)))


def threshold_and_rank(
    scored: DataFrame,
    threshold: float = 5.0,
    top_k: int | None = None,
    per: str | Sequence[str] | None = None,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """weight > τ, ranked best-first (scratch.R:130,134; τ=5 ≈ 148:1 LR).

    Three contracts, cheapest-first at scale:

    * ``top_k`` with ``per=<col(s)>`` — best ``k`` candidates per group
      (e.g. per left record), with a ``match_rank`` column. Rank-pruned
      window: Spark's WindowGroupLimit keeps only ``k`` rows per group
      in the sort buffer, so no partition ever sorts more than it
      keeps. This is the "top candidates for review" contract and the
      100 TB default.
    * ``top_k`` with ``per=None`` — global best ``k``: TakeOrderedAndProject
      (per-partition O(n·log k) heap + driver merge of k·partitions
      rows), no full shuffle-sort.
    * ``top_k=None`` — the reference's full ranked output
      (``arrange(desc(weight))``, scratch.R:134). Executes as a
      range-partitioned distributed sort: it scales out, but the full
      order over O(pairs) is the most expensive stage in the linkage
      chain — prefer a ``top_k`` contract when the consumer allows.

    ``tie_breakers`` makes the order (and therefore which rows survive
    a ``top_k`` cut) deterministic when weights tie — pass the pair id
    columns for engine-independent output.
    """
    out = scored.filter(F.col("weight") > threshold)
    order = [F.desc("weight"), *[F.asc(c) for c in tie_breakers]]
    if top_k is None:
        return out.orderBy(*order)
    if per is None:
        return out.orderBy(*order).limit(top_k)
    per_cols = [per] if isinstance(per, str) else list(per)
    w = Window.partitionBy(*per_cols).orderBy(*order)
    return (
        out.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= top_k)
        .withColumn("match_rank", F.col("match_rank").cast("long"))
    )


def label_with_truth(
    scored: DataFrame,
    truth: DataFrame,
    unique_id: str,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Join ground-truth cluster ids for both sides and flag
    ``true_match = cluster_left == cluster_right``
    (reference scratch.R:131-133).

    The truth table is id→cluster — dimension-sized relative to the
    pair set, so broadcast both joins explicitly.
    """
    t = truth.select(
        F.col(unique_id),
        F.col(cluster_col).alias("__cluster"),
    )
    id_l = suffixed(unique_id, "_left")
    id_r = suffixed(unique_id, "_right")
    left_t = F.broadcast(
        t.select(F.col(unique_id).alias(id_l), F.col("__cluster").alias("cluster_left"))
    )
    right_t = F.broadcast(
        t.select(F.col(unique_id).alias(id_r), F.col("__cluster").alias("cluster_right"))
    )
    return (
        scored.join(left_t, on=id_l, how="left")
        .join(right_t, on=id_r, how="left")
        .withColumn("true_match", F.col("cluster_left") == F.col("cluster_right"))
    )
