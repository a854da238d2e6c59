"""Data-governance operators: privacy audits and release-gate
validation for large-scale training-data pipelines.

Release pre-flights a dataset publisher runs before shipping:

* **k-anonymity** (Sweeney 2002): does any quasi-identifier
  combination isolate fewer than k records? ``k_anonymity_report``
  audits, ``suppress_rare_groups`` enforces by suppression (drop the
  rows whose quasi-identifier group is smaller than k — the standard
  baseline treatment when generalization hierarchies aren't
  available).
* **l-diversity** (Machanavajjhala et al. 2007): k-anonymity's
  homogeneity-attack companion — a group needs at least l distinct
  sensitive values, not just k members. ``l_diversity_report``.
* **expectation validation** (the Great-Expectations-style release
  gate): declarative per-row predicates evaluated corpus-wide in ONE
  aggregation pass, reported as violation counts/rates per rule.
* **referential integrity**: orphan foreign keys between two tables
  (the classic ETL regression a 100 TB ingest must catch before
  training joins silently drop rows).

Scale notes: the k-anonymity group table is keyed on the quasi
columns (map-side partial agg; the violating-group set rejoins via a
left-anti join whose strategy AQE picks at runtime — it can be nearly
the whole table when quasi-identifiers are near-unique, so it is
never force-broadcast); expectation validation is a single
full scan folded into one 1-row aggregate — adding rules adds
columns, not passes; the orphan check is one left-anti join on the
key, AQE-broadcast when the parent's distinct key set fits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_report",
    "l_diversity_report",
    "t_closeness_report",
    "suppress_rare_groups",
    "validate_expectations",
    "fk_orphans_report",
]


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """One-row k-anonymity audit over the quasi-identifier columns.

    A dataset is k-anonymous when every combination of the quasi
    identifiers matches at least k records (Sweeney 2002). NULLs
    group together (a NULL ZIP code is itself a quasi-identifier
    value — both engines' GROUP BY agrees on that).

    Returns one row: ``k, n_rows, n_groups, n_violating_groups,
    rows_at_risk, min_group_size, is_k_anonymous`` — ``rows_at_risk``
    is the number of records whose group is smaller than k (the rows
    suppression would remove).

    One groupBy on the quasi columns (map-side partial agg), then a
    group-table-sized aggregate — the second pass never touches the
    data again.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return groups.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(
            F.sum((F.col("__n") < k).cast("long")), F.lit(0)
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("long").alias("rows_at_risk"),
        F.min("__n").cast("long").alias("min_group_size"),
        F.coalesce(F.min("__n") >= k, F.lit(True)).alias("is_k_anonymous"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """One-row l-diversity audit: k-anonymity's necessary companion
    (Machanavajjhala et al. 2007, "l-Diversity: Privacy Beyond
    k-Anonymity"). A k-anonymous group whose members all share ONE
    sensitive value still discloses that value for everyone in it
    (the homogeneity attack); a group is l-diverse when its
    ``sensitive_col`` takes at least ``l`` distinct values.

    Distinctness counts non-NULL sensitive values (both engines'
    COUNT(DISTINCT) semantics) — a group whose sensitive column is
    entirely NULL has diversity 0 and violates any l ≥ 1, which is
    the conservative read (an all-unknown group proves nothing about
    disclosure safety). NULL quasi values group together, as in
    :func:`k_anonymity_report`.

    Returns one row: ``l, n_rows, n_groups, n_violating_groups,
    rows_at_risk, min_diversity, is_l_diverse``. Plan: one groupBy on
    the quasi columns computing count + count-distinct(sensitive)
    (partial-aggregated), then a group-table-sized 1-row rollup.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(F.col(sensitive_col)).alias("__div"),
    )
    return groups.agg(
        F.lit(int(l)).cast("long").alias("l"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(
            F.sum((F.col("__div") < l).cast("long")), F.lit(0)
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__div") < l, F.col("__n")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("long").alias("rows_at_risk"),
        F.min("__div").cast("long").alias("min_diversity"),
        F.coalesce(F.min("__div") >= l, F.lit(True)).alias("is_l_diverse"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    round_digits: int = 9,
) -> DataFrame:
    """One-row t-closeness audit: the distributional companion to
    k-anonymity and l-diversity (Li, Li & Venkatasubramanian 2007,
    "t-Closeness: Privacy Beyond k-Anonymity and l-Diversity"). An
    l-diverse group whose sensitive values are MOSTLY one value still
    leaks (the skewness attack); a group satisfies t-closeness when
    the distance between its sensitive-value distribution and the
    GLOBAL distribution is at most ``t``. For categorical sensitive
    attributes the standard equal-distance EMD equals the total
    variation distance, ``0.5 * Σ_v |p_group(v) − p_global(v)|``.

    NULL sensitive values form their own category (an unknown
    diagnosis concentrated in one ZIP code is still a disclosure
    pattern); NULL quasi values group together as in the sibling
    audits. Distances are carried in FIXED-POINT integer units of
    10^-``round_digits`` (each probability floored to the grid once,
    then only exact integer sums — the graph module's determinization,
    so a SQL oracle reproduces every group's distance bit-for-bit);
    the grid costs at most ``n_values × 10^-round_digits`` of
    distance per group. Absent values contribute their full global
    mass via the complement identity
    ``Σ_{v∉group} q(v) = q_total − Σ_{v∈group} q(v)`` — no
    group × value cross join ever materializes.

    Returns one row: ``t, n_rows, n_groups, n_violating_groups,
    rows_at_risk, max_tvd, is_t_close``. Plan: one groupBy on
    (quasi, sensitive) — the only pass over the data — then
    cell-table-sized joins against the broadcast global distribution
    and a group-table rollup.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not 0.0 < t <= 1.0:
        raise ValueError(f"t must be in (0, 1], got {t}")
    sc = float(10**round_digits)
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__nqv"))
    # cell-table-sized, but read by THREE subtrees (group totals,
    # global distribution, per-group distances) — without this the
    # one pass over the data re-executes once per consumer
    cells = cells.localCheckpoint(eager=False)
    gtot = cells.groupBy(*quasi_cols).agg(F.sum("__nqv").alias("__nq"))
    vtot = cells.groupBy("__v").agg(F.sum("__nqv").alias("__nv"))
    ntot = vtot.agg(F.sum("__nv").cast("double").alias("__n"))
    qdist = vtot.crossJoin(F.broadcast(ntot)).select(
        F.col("__v").alias("__qv"),
        F.floor(
            F.lit(sc) * (F.col("__nv").cast("double") / F.col("__n"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__qi"),
    )
    qtot = qdist.agg(F.coalesce(F.sum("__qi"), F.lit(0)).alias("__qtot"))
    per = (
        cells.join(gtot, quasi_cols)
        .join(F.broadcast(qdist), F.col("__v").eqNullSafe(F.col("__qv")))
        .select(
            *quasi_cols,
            F.col("__nq"),
            F.col("__qi"),
            F.abs(
                F.floor(
                    F.lit(sc)
                    * (F.col("__nqv").cast("double") / F.col("__nq").cast("double"))
                    + F.lit(0.5)
                ).cast("long")
                - F.col("__qi")
            ).alias("__diff"),
        )
    )
    grp = (
        per.groupBy(*quasi_cols)
        .agg(
            F.max("__nq").alias("__nq"),
            F.sum("__diff").alias("__d"),
            F.sum("__qi").alias("__qpres"),
        )
        .crossJoin(F.broadcast(qtot))
        .select(
            "__nq",
            (
                F.col("__d") + (F.col("__qtot") - F.col("__qpres"))
            ).alias("__tvd_i"),
        )
    )
    thr = float(t) * (2.0 * sc)
    return grp.agg(
        F.lit(float(t)).alias("t"),
        F.coalesce(F.sum("__nq"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(
            F.sum((F.col("__tvd_i").cast("double") > thr).cast("long")),
            F.lit(0),
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__tvd_i").cast("double") > thr, F.col("__nq")
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("rows_at_risk"),
        F.coalesce(
            F.max(F.col("__tvd_i").cast("double") / F.lit(2.0 * sc)), F.lit(0.0)
        ).alias("max_tvd"),
        F.coalesce(
            F.max(F.col("__tvd_i").cast("double")) <= thr, F.lit(True)
        ).alias("is_t_close"),
    )


def suppress_rare_groups(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """Drop every row whose quasi-identifier group has fewer than
    ``k`` members — suppression, the baseline k-anonymity treatment
    when no generalization hierarchy is defined. Returns the input
    columns unchanged for surviving rows.

    The violating-group frame comes back as a left-anti join on the
    quasi columns. No broadcast hint: for realistic quasi-identifiers
    (the Sweeney zip+DOB+sex case, where most groups are near-unique)
    the <k set is nearly the WHOLE table, so forcing a broadcast would
    OOM exactly on the datasets this audit exists to catch — AQE picks
    broadcast at runtime when (and only when) the set is actually
    small. NULL-safe equality is used in the join predicate so
    NULL-valued groups are suppressed correctly too (a plain ``=``
    would never match the NULL group and silently keep it).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rare = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") < k)
        .select(*[F.col(c).alias(f"__r_{c}") for c in quasi_cols])
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(rare[f"__r_{c}"])
        cond = eq if cond is None else (cond & eq)
    return df.join(rare, cond, "left_anti")


def validate_expectations(
    df: DataFrame, rules: "list[tuple[str, str | Column]]"
) -> DataFrame:
    """Evaluate declarative per-row expectations corpus-wide in ONE
    aggregation pass — the release gate a dataset build runs last
    ("no NULL keys, prices positive, quantities in range").

    ``rules`` is a list of (rule_name, predicate) where the predicate
    is a SQL boolean expression string (or a Column). A row VIOLATES
    a rule when the predicate is not TRUE for it — NULL predicate
    results count as violations (unknown is not a pass; this is the
    conservative gate semantics, and both engines agree on it via an
    explicit ``IS NOT TRUE``-shaped count).

    Returns one row per rule: ``rule, n_rows, n_violations,
    violation_rate`` (rate rounded to 6, 0.0 on an empty input).
    The plan is a single scan folded into a 1-row conditional-sum
    aggregate (adding rules adds COLUMNS, not passes), unpivoted to
    the per-rule shape with ``stack`` — no shuffle at all beyond the
    final 1-row exchange.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [name for name, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    for name in names:
        # rule names are interpolated into the stack() unpivot below;
        # quotes/backslashes would break (or inject into) that SQL
        if "'" in name or "\\" in name:
            raise ValueError(
                f"rule name {name!r} must not contain quotes or backslashes"
            )
    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for i, (_, pred) in enumerate(rules):
        p = F.expr(pred) if isinstance(pred, str) else pred
        viol = F.when(p, F.lit(0)).otherwise(F.lit(1))
        aggs.append(F.coalesce(F.sum(viol), F.lit(0)).alias(f"__v{i}"))
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', __v{i}" for i, (name, _) in enumerate(rules)
    )
    return one.select(
        F.expr(f"stack({len(rules)}, {pairs}) as (rule, n_violations)"),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_violations") / F.col("n_rows"), 6))
        .alias("violation_rate"),
    )


def fk_orphans_report(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Referential-integrity check: one row with the child's row
    count, the number of ORPHAN rows (child key matches no parent
    row), and the orphan rate (rounded to 6).

    NULL child keys count as orphans — a NULL foreign key also drops
    out of the training join this check exists to protect, and the
    gate's job is to count every silently-lost row, whatever the
    cause. One left-anti join on the key (AQE broadcasts the parent
    key set when it fits) folded into a 1-row count.
    """
    pk = parent_key or child_key
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(pk).alias("__k")).distinct(),
        "__k",
        "left_anti",
    )
    n_child = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    n_orph = orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_orphans")
    )
    return n_child.crossJoin(n_orph).select(
        "n_rows",
        "n_orphans",
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_orphans") / F.col("n_rows"), 6))
        .alias("orphan_rate"),
    )
