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
    kll_quantiles,
    kll_sketch,
    merge_cms_sketches,
    merge_histogram_sketches,
    merge_hll_registers,
    merge_kll_sketches,
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


# --------------------------------------------------------------- KLL

@pytest.fixture(scope="module")
def ev_vals(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    ).cache()


def test_kll_merge_equals_direct(spark, ev_vals):
    """Per-shard sketches merged reproduce the direct one-pass sketch
    BIT-FOR-BIT — the losslessness the md5-tier compaction buys over
    sequential KLL (and the property the gate's oracle compare rests
    on: the oracle computes the direct build)."""
    per = kll_sketch(ev_vals, "value", "event_id", k=128, by="event_type")
    merged = merge_kll_sketches(per, k=128)
    direct = kll_sketch(ev_vals, "value", "event_id", k=128)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_kll_merge_associative_over_splits(spark, ev_vals):
    """Sketch-of-sketches: merging two DIFFERENT shardings (by type,
    by id parity) of the same data gives the same sketch."""
    a = merge_kll_sketches(
        kll_sketch(ev_vals, "value", "event_id", k=64, by="event_type"), k=64
    )
    half1 = ev_vals.filter(F.col("event_id") % 2 == 0)
    half2 = ev_vals.filter(F.col("event_id") % 2 == 1)
    b = merge_kll_sketches(
        kll_sketch(half1, "value", "event_id", k=64),
        kll_sketch(half2, "value", "event_id", k=64),
        k=64,
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_kll_sketch_bounded_and_level_minimal(spark, ev_vals):
    sk = kll_sketch(ev_vals, "value", "event_id", k=256).collect()
    assert 0 < len(sk) <= 256
    levels = {r["level"] for r in sk}
    assert len(levels) == 1
    lvl = levels.pop()
    assert all(r["tier"] >= lvl for r in sk)
    # retained count is within (k/2, k] in expectation; assert > k/4
    # (a hard floor that holds w.h.p. for the md5 tiers)
    assert len(sk) > 256 // 4


def test_kll_quantiles_rank_error_bound(spark, ev_vals):
    """The retained rows are a uniform 2^-L sample, so each estimate's
    RANK in the full data must sit within ~4σ = 4·√(q(1-q)/k) of q."""
    sk = kll_sketch(ev_vals, "value", "event_id", k=256)
    n = ev_vals.count()
    for q in (0.25, 0.5, 0.9):
        est = kll_quantiles(sk, [q]).collect()[0]["estimate"]
        rank = ev_vals.filter(F.col("value") <= est).count() / n
        tol = 4 * math.sqrt(q * (1 - q) / 256)
        assert abs(rank - q) <= tol, (q, rank, tol)


def test_kll_small_input_is_exact(spark):
    """n <= k keeps level 0 — every row retained, quantiles exact."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])],
        "id long, v double",
    )
    sk = kll_sketch(df, "v", "id", k=64)
    assert sk.count() == 10
    assert sk.agg(F.max("level")).collect()[0][0] == 0
    got = {r["quantile"]: r["estimate"] for r in
           kll_quantiles(sk, [0.5, 0.25]).collect()}
    # q*(n-1)+1 rule: p50 of 1..10 = 5.5, p25 = 3.25
    assert got[0.5] == pytest.approx(5.5)
    assert got[0.25] == pytest.approx(3.25)


def test_kll_nulls_empty_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 2.0)], "id long, v double"
    )
    assert kll_sketch(df, "v", "id", k=8).count() == 0
    empty = kll_sketch(df.filter(F.lit(False)), "v", "id", k=8)
    assert kll_quantiles(empty, [0.5]).count() == 0
    with pytest.raises(ValueError):
        kll_sketch(df, "v", "id", k=1)
    with pytest.raises(ValueError):
        merge_kll_sketches()
    sk = kll_sketch(df, "v", "id", k=8)
    with pytest.raises(ValueError):
        kll_quantiles(sk, [])
    with pytest.raises(ValueError):
        kll_quantiles(sk, [0.0])
    with pytest.raises(ValueError):
        kll_quantiles(sk, [1.5])


def test_hll_estimate_rejects_unmerged_shards(spark, toks):
    """The r13 advisor's trap: per-shard register tables passed
    straight to the estimator used to return a silently wild/negative
    number — now it raises."""
    per_src = hll_registers(toks, "tok", p=6, by="source")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        hll_cardinality_estimate(per_src, p=6).collect()


def test_histogram_degenerate_range_matches_oracle(spark):
    """mx == mn events: Spark puts everything in bin 0 and estimates
    mn; the oracle SQL's degenerate-range CASE (r13 advisor fix) must
    agree instead of dividing by a zero bin width."""
    import duckdb

    df = spark.createDataFrame(
        [(i, 7.5) for i in range(10)], "event_id long, value double"
    )
    lo, hi = value_range(df, "value")
    assert lo == hi == 7.5
    h = histogram_sketch(df, "value", lo, hi, k=64)
    got = {r["quantile"]: r["estimate"] for r in
           histogram_quantiles(h, [0.25, 0.9], lo, hi, k=64).collect()}
    assert got == {0.25: 7.5, 0.9: 7.5}
    # replay the gate's oracle SQL on a constant-value events table
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["histogram_quantiles"]
    con = duckdb.connect()
    con.execute(
        "create view events as select * from (values "
        + ", ".join(f"({i}, 7.5)" for i in range(10))
        + ") as t(event_id, value)"
    )
    want = {float(r[0]): float(r[1]) for r in con.execute(sql).fetchall()}
    assert want == {0.25: 7.5, 0.5: 7.5, 0.9: 7.5, 0.99: 7.5}
