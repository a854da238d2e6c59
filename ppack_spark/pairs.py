"""Pair rehydration and random-pair sampling.

``compute_pairs_dataset`` (reference linking.R:49-60; exported under
that name, NAMESPACE:10, though defined as ``compute_blocked_dataset``
— we keep the exported name): join the candidate ids back to both
tables' attributes, suffixed ``_left`` / ``_right``.

Scale note: the pair-id table is the large side; the entity tables are
joined to it on their unique ids. Catalyst broadcasts an entity table
when it fits (dimension-sized inputs) and otherwise shuffles on the id
— both sides hash-partitioned on the same key, so the second join
reuses the pairs' partitioning where possible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprs import suffixed, with_suffix

__all__ = ["compute_pairs_dataset", "sample_pair_ids", "sample_pair_ids_inplan"]


def compute_pairs_dataset(
    data_a: DataFrame,
    data_b: DataFrame,
    unique_id_a: str,
    unique_id_b: str,
    comparison_ids: DataFrame,
) -> DataFrame:
    """Left-join pair ids to A's then B's columns (linking.R:56-58).

    Accepts either raw or already-suffixed id names (the reference
    relies on ``add_suffix`` idempotence for this, scratch.R:49 /
    utils.R:14).
    """
    a = with_suffix(data_a, "_left")
    b = with_suffix(data_b, "_right")
    id_l = suffixed(unique_id_a, "_left")
    id_r = suffixed(unique_id_b, "_right")
    return comparison_ids.join(a, on=id_l, how="left").join(b, on=id_r, how="left")


def sample_pair_ids(
    spark: SparkSession,
    ids_a: list,
    ids_b: list | None = None,
    size: int = 1_000_000,
    seed: int = 42,
    id_left: str = "unique_id_left",
    id_right: str = "unique_id_right",
) -> DataFrame:
    """Uniform random id pairs **with replacement** (reference
    scratch.R:68-69 samples driver-side then ``copy_to``s). Seeded
    numpy RNG → exact, reproducible — preferred over ``df.sample``
    which is per-row Bernoulli and cannot produce "exactly N pairs".

    For cluster scale prefer :func:`sample_pair_ids_inplan`, which
    never moves ids through the driver.
    """
    rng = np.random.default_rng(seed)
    ids_a_arr = np.asarray(ids_a)
    ids_b_arr = ids_a_arr if ids_b is None else np.asarray(ids_b)
    left = ids_a_arr[rng.integers(0, len(ids_a_arr), size=size)]
    right = ids_b_arr[rng.integers(0, len(ids_b_arr), size=size)]
    import pandas as pd

    pdf = pd.DataFrame({id_left: left, id_right: right})
    return spark.createDataFrame(pdf)


def sample_pair_ids_inplan(
    spark: SparkSession,
    n_a: int,
    n_b: int | None = None,
    size: int = 1_000_000,
    seed: int = 42,
    id_left: str = "unique_id_left",
    id_right: str = "unique_id_right",
) -> DataFrame:
    """Distributed variant for contiguous 0-based ids: generate the
    sample in-plan with ``F.rand(seed)`` over ``spark.range`` — no
    driver materialization, scales to any ``size``."""
    n_b = n_b if n_b is not None else n_a
    return (
        spark.range(size)
        .select(
            F.floor(F.rand(seed) * n_a).cast("long").alias(id_left),
            F.floor(F.rand(seed + 1) * n_b).cast("long").alias(id_right),
        )
    )
