"""Mergeable-sketch operators (operators/sketch.py): HLL cardinality,
Count-Min frequency, fixed-edge histogram quantiles.

The registry gates (hll_cardinality / cms_frequency /
histogram_quantiles) hash-check the full chains against DuckDB; these
tests pin the properties the oracle compare can't express: merge
losslessness as an algebraic identity, accuracy bounds against exact
answers, the CMS never-undercounts guarantee, and input hardening.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ppack_spark.operators.sketch import (
    cms_estimate,
    cms_sketch,
    histogram_quantiles,
    histogram_sketch,
    hll_cardinality_estimate,
    hll_registers,
    merge_cms_sketches,
    merge_histogram_sketches,
    merge_hll_registers,
    value_range,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def toks(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from ppack_spark.functions.text import tokens

    return (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .cache()
    )


# --------------------------------------------------------------- HLL

def test_hll_merge_equals_direct(spark, toks):
    """Merging per-source register tables is LOSSLESS: identical
    register table (hence identical estimate) as one global pass."""
    per_src = hll_registers(toks, "tok", p=10, by="source")
    merged = merge_hll_registers(per_src)
    direct = hll_registers(toks, "tok", p=10)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_hll_estimate_within_bound(spark, toks):
    exact = toks.select("tok").distinct().count()
    est = hll_cardinality_estimate(
        hll_registers(toks, "tok", p=10), p=10
    ).collect()[0]["estimate"]
    # 1.04/sqrt(1024) ~ 3.3% standard error; allow 4 sigma
    assert exact > 0
    assert abs(est / exact - 1.0) < 4 * 1.04 / math.sqrt(1024)


def test_hll_small_range_exactish(spark):
    """Tiny cardinalities land in the linear-counting branch and come
    out near-exact."""
    df = spark.range(40).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = hll_cardinality_estimate(hll_registers(df, "v"), p=10).collect()[0][
        "estimate"
    ]
    assert abs(est - 40) <= 2


def test_hll_duplicates_do_not_move_estimate(spark):
    """Cardinality sketch: re-observing the same values changes
    nothing (max of identical rhos)."""
    df = spark.range(100).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    once = {tuple(r) for r in hll_registers(df, "v").collect()}
    thrice = {
        tuple(r)
        for r in hll_registers(
            df.unionAll(df).unionAll(df), "v"
        ).collect()
    }
    assert once == thrice


def test_hll_empty_and_nulls(spark):
    empty = spark.createDataFrame([], "v string")
    assert hll_registers(empty, "v").count() == 0
    assert (
        hll_cardinality_estimate(hll_registers(empty, "v"), p=10).collect()[0][
            "estimate"
        ]
        == 0.0
    )
    nulls = spark.createDataFrame([(None,), ("a",)], "v string")
    est = hll_cardinality_estimate(hll_registers(nulls, "v"), p=10).collect()[
        0
    ]["estimate"]
    assert abs(est - 1.0) < 0.01


def test_hll_p_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "v", p=2)
    with pytest.raises(ValueError, match="at least one"):
        merge_hll_registers()


# --------------------------------------------------------------- CMS

def test_cms_never_undercounts_and_bounds(spark, toks):
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    n_total = toks.count()
    sk = cms_sketch(toks, "tok", depth=4, width=1024)
    est = cms_estimate(sk, exact.select("tok"), term_col="tok")
    joined = exact.join(est, exact["tok"] == est["term"]).select(
        "n", "estimate"
    )
    rows = joined.collect()
    assert rows, "no terms"
    assert all(r["estimate"] >= r["n"] for r in rows)
    # expected overcount ~ 2N/w per row pair; generous 8eN/w cap
    cap = 8 * math.e * n_total / 1024
    assert all(r["estimate"] - r["n"] <= cap for r in rows)


def test_cms_merge_equals_direct(spark, toks):
    merged = merge_cms_sketches(
        cms_sketch(toks, "tok", depth=4, width=1024, by="source")
    )
    direct = cms_sketch(toks, "tok", depth=4, width=1024)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_cms_unseen_term_estimates_low(spark):
    df = spark.createDataFrame([("a",)] * 50 + [("b",)] * 3, "v string")
    sk = cms_sketch(df, "v", depth=4, width=1024)
    q = spark.createDataFrame(
        [("a",), ("b",), ("never-seen",)], "term string"
    )
    got = {r["term"]: r["estimate"] for r in cms_estimate(sk, q).collect()}
    assert got["a"] >= 50 and got["b"] >= 3
    # 53 tokens over 4x1024 cells: a miss on every row is ~certain
    assert got["never-seen"] <= 53


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="depth, width"):
        cms_sketch(df, "v", depth=0)
    with pytest.raises(ValueError, match="at least one"):
        merge_cms_sketches()


# --------------------------------------------------------- histogram

def test_histogram_merge_equals_direct(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rng = value_range(ev, "value")
    assert rng is not None
    lo, hi = rng
    merged = merge_histogram_sketches(
        histogram_sketch(ev, "value", lo, hi, k=64, by="event_type")
    )
    direct = histogram_sketch(ev, "value", lo, hi, k=64)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_histogram_quantiles_within_bin_width(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = value_range(ev, "value")
    k = 64
    hist = histogram_sketch(ev, "value", lo, hi, k=k)
    qs = [0.25, 0.5, 0.9, 0.99]
    got = {
        r["quantile"]: r["estimate"]
        for r in histogram_quantiles(hist, qs, lo, hi, k=k).collect()
    }
    vals = sorted(
        r["value"] for r in ev.select("value").collect() if r["value"] is not None
    )
    binw = (hi - lo) / k
    for q in qs:
        exact = vals[min(int(q * len(vals)), len(vals) - 1)]
        assert abs(got[q] - exact) <= binw + 1e-9, q


def test_histogram_quantiles_monotone_and_bounded(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = value_range(ev, "value")
    hist = histogram_sketch(ev, "value", lo, hi, k=32)
    qs = [0.1, 0.5, 0.9]
    got = [
        r["estimate"]
        for r in histogram_quantiles(hist, qs, lo, hi, k=32)
        .orderBy("quantile")
        .collect()
    ]
    assert got == sorted(got)
    assert all(lo - 1e-9 <= g <= hi + 1e-9 for g in got)


def test_histogram_nulls_dropped_and_empty(spark):
    df = spark.createDataFrame([(None,), (1.0,), (2.0,)], "value double")
    h = histogram_sketch(df, "value", 1.0, 2.0, k=4)
    assert h.agg(F.sum("cnt")).collect()[0][0] == 2
    empty = spark.createDataFrame([], "value double")
    assert value_range(empty, "value") is None
    eh = histogram_sketch(empty, "value", 0.0, 1.0, k=4)
    assert histogram_quantiles(eh, [0.5], 0.0, 1.0, k=4).count() == 0


def test_histogram_validation(spark):
    df = spark.createDataFrame([(1.0,)], "value double")
    h = histogram_sketch(df, "value", 0.0, 1.0, k=4)
    with pytest.raises(ValueError, match="k >= 1"):
        histogram_sketch(df, "value", 0.0, 1.0, k=0)
    with pytest.raises(ValueError, match="at least one quantile"):
        histogram_quantiles(h, [], 0.0, 1.0, k=4)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        histogram_quantiles(h, [1.5], 0.0, 1.0, k=4)
