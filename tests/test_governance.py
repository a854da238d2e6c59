"""Governance-operator invariants (operators/governance.py): NULL
quasi-identifier groups, empty inputs, violation semantics on NULL
predicates — the edges the TPC-H-shaped oracle fixtures don't hold."""

from __future__ import annotations

import pytest

from ppack_spark.operators.governance import (
    fk_orphans_report,
    k_anonymity_report,
    suppress_rare_groups,
    validate_expectations,
)


def _people(spark):
    # (zip, age) quasi: group A has 3 rows, group B 1, NULL-zip 2
    rows = [
        (1, "111", 30),
        (2, "111", 30),
        (3, "111", 30),
        (4, "222", 40),
        (5, None, 50),
        (6, None, 50),
    ]
    return spark.createDataFrame(rows, "id long, zip string, age long")


def test_k_anonymity_report_counts(spark):
    r = k_anonymity_report(_people(spark), ["zip", "age"], k=3).collect()[0]
    assert r["n_rows"] == 6
    assert r["n_groups"] == 3
    assert r["n_violating_groups"] == 2  # ('222',40) size 1, (NULL,50) size 2
    assert r["rows_at_risk"] == 3
    assert r["min_group_size"] == 1
    assert r["is_k_anonymous"] is False


def test_k_anonymity_report_all_anonymous(spark):
    r = k_anonymity_report(_people(spark), ["zip", "age"], k=1).collect()[0]
    assert r["n_violating_groups"] == 0
    assert r["rows_at_risk"] == 0
    assert r["is_k_anonymous"] is True


def test_k_anonymity_empty_input(spark):
    df = spark.createDataFrame([], "id long, zip string, age long")
    r = k_anonymity_report(df, ["zip"], k=5).collect()[0]
    assert r["n_rows"] == 0 and r["n_groups"] == 0
    assert r["is_k_anonymous"] is True
    assert r["min_group_size"] is None


def test_suppress_rare_groups_drops_null_group_too(spark):
    """The NULL-zip group (size 2 < 3) must be suppressed — a plain
    equality join would never match NULL and silently keep it."""
    out = suppress_rare_groups(_people(spark), ["zip", "age"], k=3)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    assert out.columns == ["id", "zip", "age"]


def test_suppress_validates_args(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        suppress_rare_groups(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["zip"], k=0)


def test_validate_expectations_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id long, v double"
    )
    got = {
        r["rule"]: (r["n_violations"], r["violation_rate"])
        for r in validate_expectations(df, [("v_pos", "v > 0")]).collect()
    }
    # row 2 (NULL v) and row 3 (-1.0) both violate
    assert got == {"v_pos": (2, round(2 / 3, 6))}


def test_validate_expectations_multiple_rules_one_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "id long, v double"
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in validate_expectations(
            df, [("lt_100", "v < 100"), ("id_nn", "id is not null")]
        ).collect()
    }
    assert got == {"lt_100": 1, "id_nn": 0}


def test_validate_expectations_empty_input_rate_zero(spark):
    df = spark.createDataFrame([], "id long, v double")
    r = validate_expectations(df, [("v_pos", "v > 0")]).collect()[0]
    assert (r["n_rows"], r["n_violations"], r["violation_rate"]) == (0, 0, 0.0)


def test_validate_expectations_guards(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate_expectations(df, [])
    with pytest.raises(ValueError):
        validate_expectations(df, [("a", "id > 0"), ("a", "id < 9")])


def test_fk_orphans_nulls_count_as_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = fk_orphans_report(child, parent, "fk", "pk").collect()[0]
    assert (r["n_rows"], r["n_orphans"]) == (4, 2)  # NULL fk + 99
    assert r["orphan_rate"] == 0.5


def test_fk_orphans_clean(spark):
    child = spark.createDataFrame([(1, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (10,)], "pk long")
    r = fk_orphans_report(child, parent, "fk", "pk").collect()[0]
    assert (r["n_orphans"], r["orphan_rate"]) == (0, 0.0)


def test_l_diversity_report_counts(spark):
    from ppack_spark.operators.governance import l_diversity_report

    # group ('111',30): sensitive {a, b} -> div 2; ('222',40): {a} ->
    # div 1; (NULL,50): one NULL + one 'c' -> div 1 (NULLs don't count)
    rows = [
        (1, "111", 30, "a"),
        (2, "111", 30, "b"),
        (3, "111", 30, "a"),
        (4, "222", 40, "a"),
        (5, None, 50, None),
        (6, None, 50, "c"),
    ]
    df = spark.createDataFrame(rows, "id long, zip string, age long, dx string")
    r = l_diversity_report(df, ["zip", "age"], "dx", l=2).collect()[0]
    assert r["n_rows"] == 6
    assert r["n_groups"] == 3
    assert r["n_violating_groups"] == 2
    assert r["rows_at_risk"] == 3
    assert r["min_diversity"] == 1
    assert r["is_l_diverse"] is False


def test_l_diversity_all_null_sensitive_group_violates(spark):
    from ppack_spark.operators.governance import l_diversity_report

    df = spark.createDataFrame(
        [(1, "111", None), (2, "111", None)], "id long, zip string, dx string"
    )
    r = l_diversity_report(df, ["zip"], "dx", l=1).collect()[0]
    assert r["min_diversity"] == 0
    assert r["is_l_diverse"] is False
    assert r["n_violating_groups"] == 1


def test_l_diversity_empty_and_validation(spark):
    from ppack_spark.operators.governance import l_diversity_report

    df = spark.createDataFrame([], "id long, zip string, dx string")
    r = l_diversity_report(df, ["zip"], "dx", l=3).collect()[0]
    assert r["n_rows"] == 0 and r["is_l_diverse"] is True
    with pytest.raises(ValueError):
        l_diversity_report(df, [], "dx")
    with pytest.raises(ValueError):
        l_diversity_report(df, ["zip"], "dx", l=0)


# ------------------------------------------------ t-closeness (E169)

from ppack_spark.operators.governance import t_closeness_report  # noqa: E402


def test_t_closeness_identical_group_distance_zero(spark):
    # one group == the whole table: its distribution IS the global one
    df = spark.createDataFrame(
        [("a", "flu"), ("a", "flu"), ("a", "hiv"), ("a", "ok")],
        "zip string, dx string",
    )
    row = t_closeness_report(df, ["zip"], "dx", t=0.1).collect()[0]
    assert row["max_tvd"] == 0.0
    assert row["n_violating_groups"] == 0
    assert row["is_t_close"] is True
    assert row["n_rows"] == 4 and row["n_groups"] == 1


def test_t_closeness_skewed_group_distance(spark):
    """Global over 8 rows: flu 5/8, hiv 3/8. Group 'b' (all-flu) has
    TVD = 0.5*(|1 - 5/8| + |0 - 3/8|) = 0.375, and group 'a'
    (flu 1/4, hiv 3/4) mirrors it at 0.375 — both flag at t=0.3,
    both clean at t=0.4."""
    df = spark.createDataFrame(
        [
            ("a", "flu"), ("a", "hiv"), ("a", "hiv"), ("a", "hiv"),
            ("b", "flu"), ("b", "flu"), ("b", "flu"), ("b", "flu"),
        ],
        "zip string, dx string",
    )
    strict = t_closeness_report(df, ["zip"], "dx", t=0.3).collect()[0]
    assert strict["max_tvd"] == pytest.approx(0.375, abs=1e-8)
    assert strict["n_groups"] == 2
    assert strict["n_violating_groups"] == 2
    assert strict["rows_at_risk"] == 8
    assert strict["is_t_close"] is False
    loose = t_closeness_report(df, ["zip"], "dx", t=0.4).collect()[0]
    assert loose["n_violating_groups"] == 0
    assert loose["is_t_close"] is True


def test_t_closeness_null_sensitive_is_a_category(spark):
    """A group concentrating NULL diagnoses is still a disclosure
    pattern: NULLs join the distribution instead of vanishing."""
    df = spark.createDataFrame(
        [("a", "flu"), ("a", "flu"), ("b", None), ("b", None)],
        "zip string, dx string",
    )
    row = t_closeness_report(df, ["zip"], "dx", t=0.2).collect()[0]
    # global {flu .5, NULL .5}; each group is pure: TVD 0.5 each
    assert row["max_tvd"] == pytest.approx(0.5, abs=1e-8)
    assert row["n_violating_groups"] == 2
    assert row["rows_at_risk"] == 4


def test_t_closeness_empty_input(spark):
    df = spark.createDataFrame([], "zip string, dx string")
    row = t_closeness_report(df, ["zip"], "dx", t=0.2).collect()[0]
    assert row["n_rows"] == 0 and row["n_groups"] == 0
    assert row["max_tvd"] == 0.0
    assert row["is_t_close"] is True


def test_t_closeness_validates_args(spark):
    df = spark.createDataFrame([("a", "x")], "zip string, dx string")
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_report(df, [], "dx")
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_report(df, ["zip"], "dx", t=0.0)
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_report(df, ["zip"], "dx", t=1.5)
