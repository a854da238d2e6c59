"""Oracle-checked tests for the core relational operators
(SURVEY §2d items 1-5, 7; customer self-link shape from FIXTURES §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import assert_same

from ppack_spark import (
    compute_pairs_dataset,
    do_comparisons,
    exact_comparator,
    extract_blocks,
    ordered_pairs,
    pattern_counts,
    with_suffix,
    bucket_comparator,
)
from ppack_spark.spec import BlockingRule


def test_suffix_projection(tables, oracle):
    got = with_suffix(tables["customer"], "_left")
    want = oracle.execute(
        """
        select c_custkey as c_custkey_left, c_name as c_name_left,
               c_nationkey as c_nationkey_left, c_acctbal as c_acctbal_left,
               c_mktsegment as c_mktsegment_left
        from customer
        """
    ).df()
    assert_same(got, want)


def test_suffix_idempotent(tables):
    df = with_suffix(tables["customer"], "_left")
    again = with_suffix(df, "_left")
    assert df.columns == again.columns


BLOCK_ORACLE = """
    with a as (select * from customer), b as (select * from customer),
    pass1 as (
        select a.c_custkey as c_custkey_left, b.c_custkey as c_custkey_right
        from a join b on a.c_nationkey = b.c_nationkey
    ),
    pass2 as (
        select a.c_custkey as c_custkey_left, b.c_custkey as c_custkey_right
        from a join b
          on substr(a.c_name, 1, 12) = substr(b.c_name, 1, 12)
         and a.c_mktsegment = b.c_mktsegment
    )
    select distinct c_custkey_left, c_custkey_right
    from (select * from pass1 union all select * from pass2)
"""


def test_extract_blocks_multi_pass(tables, oracle):
    got = extract_blocks(
        tables["customer"],
        tables["customer"],
        "c_custkey",
        "c_custkey",
        blocking_variables=["c_nationkey"],
        blocking_expressions=[
            (F.substring("c_name_left", 1, 12) == F.substring("c_name_right", 1, 12))
            & (F.col("c_mktsegment_left") == F.col("c_mktsegment_right"))
        ],
    )
    want = oracle.execute(BLOCK_ORACLE).df()
    assert_same(got, want)


def test_ordered_pairs(tables, oracle):
    pairs = extract_blocks(
        tables["customer"], tables["customer"], "c_custkey", "c_custkey",
        blocking_variables=["c_nationkey"],
    )
    got = ordered_pairs(pairs)
    want = oracle.execute(
        """
        select distinct a.c_custkey as c_custkey_left, b.c_custkey as c_custkey_right
        from customer a join customer b on a.c_nationkey = b.c_nationkey
        where a.c_custkey < b.c_custkey
        """
    ).df()
    assert_same(got, want)


def test_pairs_dataset_and_exact_comparator(tables, oracle):
    pairs = ordered_pairs(
        extract_blocks(
            tables["customer"], tables["customer"], "c_custkey", "c_custkey",
            blocking_variables=["c_nationkey"],
        )
    )
    joined = compute_pairs_dataset(
        tables["customer"], tables["customer"], "c_custkey", "c_custkey", pairs
    )
    cmp = do_comparisons(
        joined,
        {
            "mktsegment": exact_comparator("c_mktsegment"),
            "acctbal": bucket_comparator(
                F.abs(F.col("c_acctbal_left") - F.col("c_acctbal_right")),
                [
                    (F.abs(F.col("c_acctbal_left") - F.col("c_acctbal_right")) < 100, "close"),
                    (F.abs(F.col("c_acctbal_left") - F.col("c_acctbal_right")) < 1000, "near"),
                ],
                "far",
            ),
        },
        keep=["c_custkey_left", "c_custkey_right"],
    )
    got = pattern_counts(cmp, ["mktsegment", "acctbal"])
    want = oracle.execute(
        """
        with pairs as (
            select distinct a.c_custkey as idl, b.c_custkey as idr
            from customer a join customer b on a.c_nationkey = b.c_nationkey
            where a.c_custkey < b.c_custkey
        ),
        joined as (
            select p.*, a.c_mktsegment as seg_l, a.c_acctbal as bal_l,
                   b.c_mktsegment as seg_r, b.c_acctbal as bal_r
            from pairs p
            left join customer a on p.idl = a.c_custkey
            left join customer b on p.idr = b.c_custkey
        ),
        cmp as (
            select
              case when seg_l = seg_r then 'agree'
                   when seg_l <> seg_r then 'disagree' end as mktsegment,
              case when abs(bal_l - bal_r) < 100 then 'close'
                   when abs(bal_l - bal_r) < 1000 then 'near'
                   else 'far' end as acctbal
            from joined
        )
        select mktsegment, acctbal, count(*) as n from cmp group by 1, 2
        """
    ).df()
    assert_same(got, want)


def test_exact_comparator_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), (None, "a"), ("a", None), (None, None)],
        "x_left string, x_right string",
    )
    rows = df.select(exact_comparator("x").alias("g")).collect()
    assert [r["g"] for r in rows] == ["agree", "disagree", None, None, None]


def test_bucket_comparator_null_goes_default(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "v double")
    rows = df.select(
        bucket_comparator(
            F.col("v"), [(F.col("v") > 0.5, "high")], "none"
        ).alias("g")
    ).collect()
    assert [r["g"] for r in rows] == ["high", "none"]


def test_blocking_rule_coercion(tables):
    pairs = extract_blocks(
        tables["customer"], tables["customer"], "c_custkey", "c_custkey",
        blocking_variables=[
            BlockingRule.on("c_nationkey"),
            BlockingRule.where("c_mktsegment_left = c_mktsegment_right"),
        ],
    )
    assert pairs.columns == ["c_custkey_left", "c_custkey_right"]
    assert pairs.count() > 0


def test_blocking_pass_counts_reports_zero_pass(spark, tables):
    """A pass yielding zero candidate pairs must still produce an
    explicit n_pairs=0 row — the guardrail may not go silent exactly
    when a pass is degenerate/misconfigured."""
    from ppack_spark.blocking import blocking_pass_counts

    customer = tables["customer"]
    counts = {
        r["pass_idx"]: r["n_pairs"]
        for r in blocking_pass_counts(
            customer,
            customer,
            "c_custkey",
            "c_custkey",
            [
                BlockingRule.on("c_nationkey"),
                # impossible rule: name never equals mktsegment
                BlockingRule.where(F.col("c_name_left") == F.col("c_mktsegment_right")),
            ],
        ).collect()
    }
    assert set(counts) == {0, 1}
    assert counts[0] > 0
    assert counts[1] == 0


def test_salted_block_pairs_exact_parity(spark, tables):
    """The salted triangle decomposition must produce the identical
    pair set as the plain blocked self-join — each unordered pair
    exactly once (no distinct in the plan), for several salt counts
    including s=1 (degenerate, no split)."""
    from ppack_spark.blocking import salted_block_pairs

    customer = tables["customer"]
    want = sorted(
        (r["c_custkey_left"], r["c_custkey_right"])
        for r in ordered_pairs(
            extract_blocks(
                customer, customer, "c_custkey", "c_custkey", ["c_nationkey"]
            )
        ).collect()
    )
    for s in (1, 3, 8):
        got_df = salted_block_pairs(customer, "c_custkey", "c_nationkey", num_salts=s)
        got = sorted((r["id_left"], r["id_right"]) for r in got_df.collect())
        assert got == want, f"num_salts={s}"
        assert len(got) == len(set(got)), "pair met more than once"
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_blocking_estimate_equals_measured_counts(spark, tables):
    """The histogram estimator must equal the materialized pass count
    exactly for equi passes (it is the same sum, computed join-free),
    including a NULL-key side and a zero-match pass; expression rules
    must raise."""
    import pytest
    from pyspark.sql import functions as F

    from ppack_spark.blocking import (
        blocking_pass_counts,
        estimate_blocking_counts,
    )
    from ppack_spark.spec import BlockingRule

    cust = tables["customer"].withColumn(
        "__nk",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(
            F.col("c_nationkey")
        ),
    )
    rules = [
        BlockingRule.on("__nk"),
        BlockingRule.on("c_mktsegment"),
    ]
    measured = {
        r["pass_idx"]: r["n_pairs"]
        for r in blocking_pass_counts(
            cust, cust, "c_custkey", "c_custkey", rules
        ).collect()
    }
    estimated = {
        r["pass_idx"]: r["est_pairs"]
        for r in estimate_blocking_counts(cust, cust, rules).collect()
    }
    assert estimated == measured

    # a pass with no matching keys estimates 0 (not an empty frame)
    a = cust.withColumn("__z", F.lit("a"))
    b = cust.withColumn("__z", F.lit("b"))
    est0 = {
        r["pass_idx"]: r["est_pairs"]
        for r in estimate_blocking_counts(a, b, [BlockingRule.on("__z")]).collect()
    }
    assert est0 == {0: 0}

    with pytest.raises(ValueError):
        estimate_blocking_counts(
            cust, cust, [BlockingRule.where(F.lit(True))]
        ).collect()


def test_choose_blocking_spec_policy(spark, tables):
    """Within budget the LARGEST spec wins (candidates ≈ recall); with
    no spec within budget the cheapest wins flagged infeasible; a
    multi-pass spec's cost is the sum of its passes; exactly one row
    is chosen; pick_blocking_spec returns the chosen rules coerced."""
    from ppack_spark.blocking import (
        choose_blocking_spec,
        estimate_blocking_counts,
        pick_blocking_spec,
    )
    from ppack_spark.spec import BlockingRule

    cust = tables["customer"]
    candidates = {
        "nk": [BlockingRule.on("c_nationkey")],
        "seg": [BlockingRule.on("c_mktsegment")],
        "key": [BlockingRule.on("c_custkey")],
        "both": [BlockingRule.on("c_nationkey"), BlockingRule.on("c_custkey")],
    }
    est = {
        name: sum(
            r["est_pairs"]
            for r in estimate_blocking_counts(cust, cust, rules).collect()
        )
        for name, rules in candidates.items()
    }
    assert est["both"] == est["nk"] + est["key"]  # multi-pass = sum

    # budget admits key/nk/both but not seg -> largest admitted wins
    budget = est["seg"] - 1
    assert est["both"] < budget < est["seg"]
    rows = {
        r["spec"]: r
        for r in choose_blocking_spec(cust, cust, candidates, budget).collect()
    }
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    assert not rows["seg"]["within_budget"] and rows["nk"]["within_budget"]
    expect = max((n for n in est if est[n] <= budget), key=lambda n: (est[n], n))
    assert rows[expect]["chosen"]

    # nothing within budget -> cheapest wins, flagged infeasible
    rows0 = {
        r["spec"]: r
        for r in choose_blocking_spec(cust, cust, candidates, 0).collect()
    }
    winner0 = [n for n, r in rows0.items() if r["chosen"]]
    assert winner0 == [min(est, key=lambda n: (est[n], n))]
    assert not rows0[winner0[0]]["within_budget"]

    name, rules = pick_blocking_spec(cust, cust, candidates, budget)
    assert name == expect
    assert all(isinstance(r, BlockingRule) for r in rules)

    import pytest

    with pytest.raises(ValueError):
        choose_blocking_spec(cust, cust, {}, 10)


def test_key_skew_report_finds_planted_hot_key(spark, tables):
    """A planted hot key must rank first with the right count and
    fraction; NULL keys are reported as a group, not dropped."""
    from pyspark.sql import functions as F

    from ppack_spark.blocking import key_skew_report

    base = tables["customer"].select(
        F.when(F.col("c_custkey") % 3 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("k")
    )
    hot = spark.range(5000).select(F.lit(999).alias("k"))
    df = base.unionByName(hot)
    total = df.count()
    rows = key_skew_report(df, ["k"], top_n=3).collect()
    assert rows[0]["k"] == 999 and rows[0]["n"] == 5000
    assert abs(rows[0]["frac"] - 5000 / total) < 1e-6
    assert any(r["k"] is None for r in rows)  # NULL group is a finding


def test_sorted_neighborhood_pairs_hand_fixture(spark):
    """Five records sorted by key: window=3 pairs each record with the
    next two in sort order; ties in the key break on id; NULL keys
    sort FIRST (pinned). Output oriented id_left < id_right."""
    from pyspark.sql import functions as F

    from ppack_spark.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(10, 5.0), (20, 1.0), (30, None), (40, 1.0), (50, 9.0)],
        "rid long, k double",
    )
    # sort order: NULL(30), 1.0(20), 1.0(40), 5.0(10), 9.0(50)
    got = {
        (r["rid_left"], r["rid_right"])
        for r in sorted_neighborhood_pairs(df, "rid", F.col("k"), window=3).collect()
    }
    # windows of 3 over [30,20,40,10,50]: (30,20),(30,40),(20,40),
    # (20,10),(40,10),(40,50),(10,50) -> oriented:
    want = {(20, 30), (30, 40), (20, 40), (10, 20), (10, 40), (40, 50), (10, 50)}
    assert got == want

    with __import__("pytest").raises(ValueError):
        sorted_neighborhood_pairs(df, "rid", F.col("k"), window=1)


def test_sorted_neighborhood_pairs_layout_invariant(spark, tables):
    """The minted global rank (range repartition + local row_number +
    offsets) must produce the SAME pair set whatever the input
    partitioning — the determinism claim the docstring makes."""
    from pyspark.sql import functions as F

    from ppack_spark.blocking import sorted_neighborhood_pairs

    customer = tables["customer"].select("c_custkey", "c_acctbal")
    base = {
        (r[0], r[1])
        for r in sorted_neighborhood_pairs(
            customer, "c_custkey", F.col("c_acctbal"), window=4
        ).collect()
    }
    shuffled = customer.repartition(7, F.col("c_custkey"))
    alt = {
        (r[0], r[1])
        for r in sorted_neighborhood_pairs(
            shuffled, "c_custkey", F.col("c_acctbal"), window=4
        ).collect()
    }
    assert base == alt
    # exact pair budget: sum over rank gaps d=1..w-1 of (n-d) = 3n-6
    assert len(base) == 3 * customer.count() - 6


def test_sorted_neighborhood_pairs_matches_bruteforce(spark):
    """Randomized (seeded) cross-check: the distributed rank + block
    join must emit EXACTLY the pairs a single-node sort would — ranks
    minted over range partitions equal row_number over the total
    order for any key distribution (duplicates, negatives, NULLs)."""
    import random

    from pyspark.sql import functions as F

    from ppack_spark.blocking import sorted_neighborhood_pairs

    rng = random.Random(1234)
    rows = [
        (i, rng.choice([None, float(rng.randint(-50, 50))]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "rid long, k double").repartition(11)
    for w in (2, 4, 7):
        got = {
            (r[0], r[1])
            for r in sorted_neighborhood_pairs(df, "rid", F.col("k"), window=w).collect()
        }
        # brute force: NULLS FIRST, tie-break on id, all |Δrank| < w
        order = sorted(rows, key=lambda t: (t[1] is not None, t[1] if t[1] is not None else 0.0, t[0]))
        want = set()
        for i in range(len(order)):
            for j in range(i + 1, min(i + w, len(order))):
                a, b = order[i][0], order[j][0]
                want.add((min(a, b), max(a, b)))
        assert got == want, f"window={w}: {len(got)} vs {len(want)}"
