"""Evaluation layer: calibration and accuracy readouts.

Reference scratch.R:130-139: precision on weight>τ pairs, a logistic
calibration model of truth on weight, and a mean-truth-by-rounded-
weight calibration curve (FS weights should be monotone in match
probability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["calibration_curve", "fit_calibration", "precision_at_threshold"]


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
