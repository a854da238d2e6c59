"""Column-expression compiler: the engine's essence.

The reference (nerskin/ppack) is a *plan-authoring* library — it
metaprograms dplyr/SQL expressions (quosures spliced with ``!!``,
reduced with ``+``) and lets DuckDB execute them. PySpark ``Column``
objects are already unevaluated expression trees, so the whole
metaprogramming layer (reference linking.R:65-74, scratch.R:107-124)
becomes ordinary functions that build and compose ``Column``s. Every
expression here is Catalyst/codegen-friendly — no UDFs.

Null-semantics notes (the top parity risk, SURVEY §7):

* R ``if_else(l == r, a, b)`` via dbplyr renders
  ``CASE WHEN l=r THEN a WHEN NOT(l=r) THEN b END`` → NULL when either
  side is NULL. :func:`exact_comparator` reproduces that exactly with
  two ``when`` branches and no ``otherwise``.
* R ``case_when(..., TRUE ~ default)`` via dbplyr renders a CASE with
  ELSE — a NULL condition falls through to the default. Bucket
  comparators therefore map NULL similarity to the default level.
"""

from __future__ import annotations

import operator
from collections.abc import Iterable, Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "suffixed",
    "with_suffix",
    "suffix_columns",
    "as_column",
    "exact_comparator",
    "bucket_comparator",
    "dict_lookup_case_when",
    "match_weight_column",
    "sum_columns",
    "log_sum_exp_cols",
]


def suffixed(name: str, suffix: str) -> str:
    """``add_suffix_char`` (reference utils.R:24-27): append unless present."""
    return name if name.endswith(suffix) else f"{name}{suffix}"


def suffix_columns(names: Iterable[str], suffix: str) -> list[str]:
    return [suffixed(n, suffix) for n in names]


def with_suffix(df: DataFrame, suffix: str) -> DataFrame:
    """``add_suffix`` (reference utils.R:11-18): rename every column,
    idempotently, via a pure projection (no data movement)."""
    return df.select([F.col(c).alias(suffixed(c, suffix)) for c in df.columns])


def as_column(expr: Column | str) -> Column:
    """Accept either a Column or a SQL string (reference accepts quosures
    and raw expressions interchangeably, linking.R:65-67)."""
    return F.expr(expr) if isinstance(expr, str) else expr


def exact_comparator(
    var: str,
    left: str | None = None,
    right: str | None = None,
    agree: str = "agree",
    disagree: str = "disagree",
) -> Column:
    """Exact-equality comparator, 2 levels + NULL for missing.

    Mirrors ``build_exact_comparator_expressions`` (reference
    comparators.R:18-23): ``if_else(l == r, 'agree', 'disagree')``,
    whose dbplyr/SQL rendering yields NULL when either input is NULL
    (missing-data level consumed by the EM, linking.R:103,108).
    """
    l = F.col(left if left is not None else suffixed(var, "_left"))
    r = F.col(right if right is not None else suffixed(var, "_right"))
    return F.when(l == r, agree).when(l != r, disagree)


def bucket_comparator(
    measure: Column | str,
    thresholds_and_labels: Iterable[tuple[Column | str, str]],
    default: str,
) -> Column:
    """First-match-wins CASE over a measure column — the structure of
    ``build_jw_comparator_expressions`` (reference comparators.R:4-14).

    ``thresholds_and_labels`` is an ordered list of (condition, label);
    a NULL measure fails every condition and lands on ``default``
    (R ``case_when`` / SQL CASE ELSE semantics).
    """
    out: Column | None = None
    for cond, label in thresholds_and_labels:
        cond = as_column(cond)
        out = F.when(cond, label) if out is None else out.when(cond, label)
    if out is None:
        return F.lit(default)
    return out.otherwise(default)


def dict_lookup_case_when(col: Column | str, mapping: Mapping[str, float]) -> Column:
    """Compile a level→probability lookup into a chained CASE WHEN
    (reference scratch.R:109-115). Unknown / NULL level → NULL.

    Levels are compiled in sorted order so generated plans are
    deterministic across runs.
    """
    c = F.col(col) if isinstance(col, str) else col
    out: Column | None = None
    for level in sorted(mapping):
        branch = (c == F.lit(level), F.lit(float(mapping[level])))
        out = F.when(*branch) if out is None else out.when(*branch)
    if out is None:
        return F.lit(None).cast("double")
    return out


def match_weight_column(
    m_probabilities: Mapping[str, Mapping[str, float]],
    u_probabilities: Mapping[str, Mapping[str, float]],
    gamma_cols: Mapping[str, str] | None = None,
) -> Column:
    """Summed Fellegi-Sunter log-likelihood-ratio weight.

    Per comparator: ``if_else(!is.na(γ), log(m(γ)/u(γ)), 0)`` summed
    across comparators (reference scratch.R:117-124). Compiles to one
    codegen-able expression — fitted parameters are inlined as
    literals, no UDF, no join.
    """
    gamma_cols = gamma_cols or {name: name for name in m_probabilities}
    terms = []
    for name in sorted(m_probabilities):
        g = F.col(gamma_cols[name])
        m_expr = dict_lookup_case_when(g, m_probabilities[name])
        u_expr = dict_lookup_case_when(g, u_probabilities[name])
        terms.append(F.when(g.isNotNull(), F.log(m_expr / u_expr)).otherwise(F.lit(0.0)))
    return sum_columns(terms).alias("weight")


def sum_columns(cols: Iterable[Column]) -> Column:
    """``reduce(exprs, +)`` (reference linking.R:105,110; scratch.R:124)."""
    cols = list(cols)
    if not cols:
        return F.lit(0.0)
    return reduce(operator.add, cols)


def log_sum_exp_cols(a: Column, b: Column) -> Column:
    """In-plan 2-arg log-sum-exp, the stable trick of reference
    utils.R:33-35 — provided for in-plan posterior scoring."""
    g = F.greatest(a, b)
    return g + F.log(F.exp(a - g) + F.exp(b - g))
