"""Match-weight scoring, thresholding, truth labelling.

The fitted parameters go *back into the plan*: they are compiled into
one generated CASE-WHEN Column (reference scratch.R:109-129), fully
whole-stage-codegen-able — no UDF, no lookup join, executes at scan
speed over however many pairs exist.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .em import FSParams
from .exprs import match_weight_column, suffixed

__all__ = [
    "score_pairs",
    "threshold_and_rank",
    "label_with_truth",
    "posterior_probability",
    "term_frequency_table",
    "TFAdjustment",
    "tf_adjusted_weights",
]


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


# ---------------------------------------------------------------------
# Term-frequency adjusted match weights (round 14)
# ---------------------------------------------------------------------


def term_frequency_table(
    df: DataFrame, col: str, value_alias: str = "value"
) -> DataFrame:
    """``(value, tf)`` — each non-NULL value's relative frequency in
    ``df[col]``. One value-keyed groupBy (map-side partial agg) plus
    the 1-row total broadcast back in-plan — no driver-side count, so
    a SQL oracle reproduces ``tf`` with the identical division.

    This is the input table for :func:`tf_adjusted_weights` — compute
    it ONCE per comparator column over the full input (not per pair
    batch) and reuse it across scoring runs.
    """
    nn = df.filter(F.col(col).isNotNull())
    tot = nn.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
    return (
        nn.groupBy(F.col(col).alias(value_alias))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .crossJoin(F.broadcast(tot))
        .select(value_alias, (F.col("__cnt") / F.col("__tot")).alias("tf"))
    )


@dataclass(frozen=True)
class TFAdjustment:
    """One comparator's term-frequency adjustment spec for
    :func:`tf_adjusted_weights`.

    ``gamma_col`` is the comparator's level column in the scored pair
    frame, ``value_col`` the agreeing value carried on the pairs
    (either side — they are equal at the exact-agree level),
    ``u_agree`` the comparator's AVERAGE agree-u the base weight was
    fitted with, and ``tf_table`` a ``(value, tf)`` frame from
    :func:`term_frequency_table`. ``tf_weight`` damps the adjustment
    (1.0 = full Bayes-factor correction); ``min_tf`` floors the
    per-value frequency so a near-unique value cannot mint unbounded
    evidence from one lucky agreement.
    """

    gamma_col: str
    value_col: str
    u_agree: float
    tf_table: DataFrame
    agree_level: str = "agree"
    tf_weight: float = 1.0
    min_tf: float | None = None


def tf_adjusted_weights(
    scored: DataFrame,
    adjustments: Sequence[TFAdjustment],
    weight_col: str = "weight",
    out_col: str = "weight_tf",
) -> DataFrame:
    """Term-frequency adjusted Fellegi-Sunter weights.

    The base FS weight prices an exact agreement on column c with the
    AVERAGE u — the chance two random records agree on c. But
    agreeing on a COMMON value ("Smith") is weak evidence and
    agreeing on a rare one ("Tregunter") is strong: the
    value-specific u is that value's own frequency. For each
    adjusted comparator this adds, on exact-agree pairs only,

        ln(u_agree / max(tf(value), min_tf)) * tf_weight

    — replacing the average-u Bayes factor with the value-specific
    one (the standard term-frequency adjustment of Fellegi-Sunter
    practice; Winkler 1988's value-specific weights). Disagreeing,
    missing-γ, and unseen-value pairs are left untouched, so
    ``out_col`` equals ``weight_col`` exactly where no adjustment
    applies.

    Scale shape: one equi-join per adjusted comparator against its
    ``(value, tf)`` table — value-cardinality-sized, so AQE broadcasts
    it when it fits; the adjustment itself is one codegen CASE
    expression, no UDF. The pair frame never shuffles.
    """
    out = scored
    terms = []
    for i, adj in enumerate(adjustments):
        tf_alias = f"__tf_{i}"
        tfv = adj.tf_table.select(
            F.col("value").alias(f"__val_{i}"), F.col("tf").alias(tf_alias)
        )
        out = out.join(
            tfv, out[adj.value_col] == tfv[f"__val_{i}"], "left"
        ).drop(f"__val_{i}")
        tf_col = F.col(tf_alias)
        if adj.min_tf is not None:
            tf_col = F.greatest(tf_col, F.lit(float(adj.min_tf)))
        terms.append(
            F.when(
                (F.col(adj.gamma_col) == adj.agree_level)
                & F.col(tf_alias).isNotNull(),
                F.log(F.lit(float(adj.u_agree)) / tf_col)
                * F.lit(float(adj.tf_weight)),
            ).otherwise(F.lit(0.0))
        )
    total = terms[0]
    for term in terms[1:]:
        total = total + term
    out = out.withColumn(out_col, F.col(weight_col) + total)
    return out.drop(*[f"__tf_{i}" for i in range(len(adjustments))])
