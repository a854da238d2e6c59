"""asof_join edge semantics: inclusive ties, no-match handling,
inner vs left, multi-key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ppack_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 99, 300.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_inclusive_tie_and_latest_prior(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["ts_matched"], r["v"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert out["a"] == (10, 100.0)  # tie: ts == right ts matches (>=)
    assert out["b"] == (18, 200.0)  # latest prior, not the first
    assert "c" not in out           # before any right row → dropped (inner)
    assert "d" not in out           # right row is in the future


def test_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["ts_matched"]
        for r in asof_join(left, right, on="k", ts="ts", how="left").collect()
    }
    assert len(out) == 4
    assert out["c"] is None and out["d"] is None


def test_null_in_matched_row_not_backfilled(spark):
    """If the MATCHED (most recent) right row has NULL in a right_col,
    the output must keep that NULL — not back-fill it from an older
    right row (DuckDB ASOF returns the matched row's NULL). All
    carried values must come from the same right row."""
    left = spark.createDataFrame([(1, 30, "x")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "old"), (1, 20, None, "new")],
        "k long, ts long, v double, label string",
    )
    row = asof_join(left, right, on="k", ts="ts").collect()[0]
    assert row["ts_matched"] == 20
    assert row["label"] == "new"
    assert row["v"] is None  # matched row's NULL, not 100.0 from ts=10


def test_single_shuffle_plan(spark):
    """The union-sort construction must stay one exchange on the key —
    no join node at all (the range-join blowup is the thing avoided)."""
    left, right = _frames(spark)
    plan = asof_join(left, right, on="k", ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # hash partition + union legs


def test_fuzz_against_brute_force(spark):
    """Seeded random frames vs a brute-force Python as-of: latest-prior
    match, inclusive ties, NULL right values carried from the matched
    row only, inner and left modes."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        left_rows = [
            (rng.randint(1, 5), rng.randint(0, 50), i) for i in range(60)
        ]
        seen = set()
        right_rows = []
        for j in range(40):
            k, ts = rng.randint(1, 5), rng.randint(0, 50)
            if (k, ts) in seen:
                continue  # asof requires unique right (key, ts)
            seen.add((k, ts))
            v = None if rng.random() < 0.3 else round(rng.random(), 3)
            right_rows.append((k, ts, v, j))
        left = spark.createDataFrame(left_rows, "k long, ts long, lid long")
        right = spark.createDataFrame(right_rows, "k long, ts long, v double, rid long")

        def brute(how):
            out = []
            for k, ts, lid in left_rows:
                cands = [r for r in right_rows if r[0] == k and r[1] <= ts]
                if cands:
                    m = max(cands, key=lambda r: r[1])
                    out.append((lid, m[1], m[2], m[3]))
                elif how == "left":
                    out.append((lid, None, None, None))
            return sorted(out, key=lambda t: t[0])

        for how in ("inner", "left"):
            got = sorted(
                (
                    (r["lid"], r["ts_matched"], r["v"], r["rid"])
                    for r in asof_join(left, right, on="k", ts="ts", how=how).collect()
                ),
                key=lambda t: t[0],
            )
            assert got == brute(how), (seed, how)


def test_asof_forward_semantics(spark):
    """Forward direction: nearest FOLLOWING right row, ties inclusive,
    inner drops rows with nothing ahead, left keeps them as nulls."""
    import pytest
    from pyspark.sql import functions as F

    from ppack_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 40, "c"), (2, 5, "d")],
        ["k", "ts", "tag"],
    )
    r = spark.createDataFrame(
        [(1, 10, 100.0), (1, 30, 300.0)], ["k", "ts", "p"]
    )
    got = {
        row["tag"]: (row["ts_matched"], row["p"])
        for row in asof_join(
            l, r, on="k", ts="ts", right_cols=["p"], direction="forward"
        ).collect()
    }
    assert got["a"] == (10, 100.0)  # tie: right at same ts matches
    assert got["b"] == (30, 300.0)  # nearest following
    assert "c" not in got           # nothing ahead → inner drops
    assert "d" not in got           # key 2 has no right rows

    left_rows = {
        row["tag"]: row["p"]
        for row in asof_join(
            l, r, on="k", ts="ts", right_cols=["p"],
            direction="forward", how="left",
        ).collect()
    }
    assert left_rows["c"] is None and left_rows["d"] is None

    with pytest.raises(ValueError):
        asof_join(l, r, on="k", ts="ts", direction="sideways")


def test_asof_join_tolerance(spark):
    """A nearest match farther than tolerance is NO match: dropped
    under inner, NULLed under left; forward direction bounds the gap
    the other way; negative tolerance rejected."""
    import pytest
    from pyspark.sql import functions as F

    from ppack_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100.0), (1, 200.0), (2, 50.0)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 95.0, "a"), (1, 110.0, "b"), (2, 10.0, "c")],
        "k long, ts double, v string",
    )
    # backward, tolerance 20: (1,100)->95 gap 5 ok; (1,200)->110 gap 90 out;
    # (2,50)->10 gap 40 out
    got = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, on="k", ts="ts", tolerance=20.0
        ).collect()
    }
    assert got == {(1, 100.0): "a"}
    # left keeps the out-of-window rows with NULLs
    lr = {
        (r["k"], r["ts"]): (r["v"], r["ts_matched"])
        for r in asof_join(
            left, right, on="k", ts="ts", how="left", tolerance=20.0
        ).collect()
    }
    assert lr[(1, 200.0)] == (None, None) and lr[(2, 50.0)] == (None, None)
    # forward, tolerance 15: (1,100)->110 gap 10 ok
    fwd = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, on="k", ts="ts",
            direction="forward", tolerance=15.0,
        ).collect()
    }
    assert fwd == {(1, 100.0): "b"}
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", ts="ts", tolerance=-1.0)
