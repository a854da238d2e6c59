"""Bucketed range join: boundary semantics, bucket-crossing
intervals, and the no-nested-loop plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from ppack_spark.operators.rangejoin import range_join_bucketed


def _run(spark, points, intervals, width):
    pts = spark.createDataFrame(points, "k long, ts double, pid long")
    iv = spark.createDataFrame(intervals, "k long, start double, end double, iid long")
    return range_join_bucketed(pts, iv, on="k", ts="ts", start="start", end="end", bucket_width=width)


def test_boundaries_inclusive_start_exclusive_end(spark):
    out = _run(
        spark,
        points=[(1, 10.0, 1), (1, 20.0, 2), (1, 9.99, 3)],
        intervals=[(1, 10.0, 20.0, 100)],
        width=5.0,
    )
    got = {r["pid"] for r in out.collect()}
    assert got == {1}  # ts==start in, ts==end out, ts<start out


def test_interval_spanning_many_buckets_matches_once(spark):
    """A long interval explodes to many buckets but each (point,
    interval) pair must appear exactly once."""
    out = _run(
        spark,
        points=[(1, 50.0, 1), (1, 999.0, 2)],
        intervals=[(1, 0.0, 1000.0, 100)],
        width=10.0,
    ).collect()
    assert len(out) == 2
    assert {r["pid"] for r in out} == {1, 2}


def test_key_isolation_and_plan_shape(spark):
    out = _run(
        spark,
        points=[(1, 10.0, 1), (2, 10.0, 2)],
        intervals=[(1, 0.0, 100.0, 100)],
        width=50.0,
    )
    assert {r["pid"] for r in out.collect()} == {1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzz_against_brute_force(spark):
    """Seeded random points/intervals vs a brute-force Python range
    join ([start, end) semantics), across bucket widths including ones
    much smaller and larger than typical interval lengths."""
    import random

    for seed, width in ((1, 3.0), (7, 10.0), (42, 100.0)):
        rng = random.Random(seed)
        points = [
            (rng.randint(1, 4), round(rng.uniform(0, 100), 2), i) for i in range(80)
        ]
        intervals = []
        for j in range(30):
            s = round(rng.uniform(0, 100), 2)
            intervals.append((rng.randint(1, 4), s, round(s + rng.uniform(0, 25), 2), j))
        want = sorted(
            (pid, iid)
            for k, ts, pid in points
            for ik, s, e, iid in intervals
            if k == ik and s <= ts < e
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in _run(spark, points, intervals, width).collect()
        )
        assert got == want, (seed, width)
