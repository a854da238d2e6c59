"""Evaluation layer: calibration and accuracy readouts.

Reference scratch.R:130-139: precision on weight>τ pairs, a logistic
calibration model of truth on weight, and a mean-truth-by-rounded-
weight calibration curve (FS weights should be monotone in match
probability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "calibration_curve",
    "fit_calibration",
    "precision_at_threshold",
    "threshold_sweep_metrics",
]


def calibration_curve(labelled: DataFrame) -> DataFrame:
    """``group_by(round(weight)) |> summarise(mean(true_match))``
    (reference scratch.R:139)."""
    return (
        labelled.groupBy(F.round("weight").alias("weight_bin"))
        .agg(
            F.avg(F.col("true_match").cast("double")).alias("match_rate"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy("weight_bin")
    )


def precision_at_threshold(labelled: DataFrame, threshold: float = 5.0) -> float:
    """Share of weight>τ pairs that are true matches (scratch.R:130-135)."""
    row = (
        labelled.filter(F.col("weight") > threshold)
        .agg(F.avg(F.col("true_match").cast("double")).alias("p"))
        .collect()[0]
    )
    return float(row["p"]) if row["p"] is not None else float("nan")


def threshold_sweep_metrics(
    labelled: DataFrame,
    thresholds: "list[float]",
    weight_col: str = "weight",
    truth_col: str = "true_match",
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise precision / recall / F1 at EVERY threshold in one
    input pass — the sweep a linkage user runs to pick τ (the
    reference hard-codes τ=5 and reports precision only,
    scratch.R:130-135; this is the full operating-characteristic
    table).

    The naive form re-filters the pair table once per τ — k scans of
    the chain's biggest intermediate. Instead each pair is assigned
    the LARGEST threshold it passes (one CASE-WHEN projection that
    pipelines into the upstream plan), aggregated once to a
    ≤ k+1-row bucket table (map-side partial agg — only bucket
    subtotals shuffle), and the per-τ counts are cumulative sums over
    the descending threshold axis: a pair with weight ≥ τ_big also
    counts for every smaller τ. The grand truth total (recall's
    denominator) includes the below-every-τ bucket, so recall is
    against ALL true pairs in ``labelled``, not just predicted ones.
    The cumulative window and the total-join run on the k-row frame —
    never pair-sized — so the single-partition window is not a
    reducer risk at any corpus size.

    Returns one row per requested threshold: ``threshold, n_pred,
    n_true_pos, precision, recall, f1`` (NULL precision/F1 when
    nothing is predicted at that τ; NULL recall when ``labelled`` has
    no true pairs). Thresholds are deduplicated and each appears in
    the output even when no pair lands in its bucket.
    """
    from pyspark.sql.window import Window

    ts = sorted({float(x) for x in thresholds})
    if not ts:
        raise ValueError("threshold_sweep_metrics needs at least one threshold")
    w = F.col(weight_col)
    bucket = F.when(w >= F.lit(ts[-1]), F.lit(ts[-1]))
    for tau in reversed(ts[:-1]):
        bucket = bucket.when(w >= F.lit(tau), F.lit(tau))
    agg = labelled.groupBy(bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.coalesce(F.sum(F.col(truth_col).cast("double")), F.lit(0.0)).alias("__t"),
    )
    total = agg.agg(F.sum("__t").alias("__total_true"))
    spark = labelled.sparkSession
    tdf = spark.createDataFrame([(t,) for t in ts], "threshold double")
    joined = tdf.join(agg, tdf["threshold"] == agg["__b"], "left").select(
        "threshold",
        F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
        F.coalesce(F.col("__t"), F.lit(0.0)).alias("__t"),
    )
    win = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = joined.select(
        "threshold",
        F.sum("__n").over(win).alias("n_pred"),
        F.sum("__t").over(win).alias("n_true_pos"),
    ).crossJoin(F.broadcast(total))
    precision = F.when(
        F.col("n_pred") > 0, F.col("n_true_pos") / F.col("n_pred")
    )
    recall = F.when(
        F.col("__total_true") > 0, F.col("n_true_pos") / F.col("__total_true")
    )
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    return cum.select(
        "threshold",
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_true_pos").cast("double").alias("n_true_pos"),
        F.round(precision, round_digits).alias("precision"),
        F.round(recall, round_digits).alias("recall"),
        F.round(f1, round_digits).alias("f1"),
    )


def fit_calibration(labelled: DataFrame):
    """``glm(true_match ~ weight, binomial)`` (reference scratch.R:137)
    via Spark ML logistic regression; returns (intercept, coefficient).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    data = labelled.select(
        F.col("weight").cast("double").alias("weight"),
        F.col("true_match").cast("double").alias("label"),
    ).dropna()
    assembled = VectorAssembler(inputCols=["weight"], outputCol="features").transform(data)
    model = LogisticRegression(featuresCol="features", labelCol="label").fit(assembled)
    return float(model.intercept), float(model.coefficients[0])
