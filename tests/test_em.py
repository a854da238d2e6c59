"""EM correctness: independent probability-space reimplementation,
separable fixture, missing-data (NULL) semantics, and invariants.
These are pure-driver tests — no Spark needed (the EM runs on the
collected pattern-counts sufficient statistic)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from ppack_spark.em import run_em


def brute_force_em(patterns, counts, total_pairs, u0, maxiter, levels):
    """Straight probability-space EM, one pattern at a time — an
    intentionally different implementation (no vectorization, no log
    space) to cross-check ppack_spark.em.run_em."""
    names = list(levels)
    m = {
        name: dict(zip(sorted(levels[name]), np.linspace(0.1, 0.8, len(levels[name]))))
        for name in names
    }
    u = {name: dict(u0[name]) for name in names}
    lam = 1e-7
    for _ in range(maxiter):
        probs = []
        for pat in patterns:
            pm, pu = lam, 1.0 - lam
            for name, val in zip(names, pat):
                if val is not None:
                    pm *= m[name][val]
                    pu *= u[name][val]
            probs.append(pm / (pm + pu))
        lam = sum(c * p for c, p in zip(counts, probs)) / total_pairs
        new_m, new_u = {}, {}
        for name in names:
            i = names.index(name)
            nm_den = sum(c * p for pat, c, p in zip(patterns, counts, probs) if pat[i] is not None)
            nu_den = sum(c * (1 - p) for pat, c, p in zip(patterns, counts, probs) if pat[i] is not None)
            new_m[name] = {
                l: sum(c * p for pat, c, p in zip(patterns, counts, probs) if pat[i] == l) / nm_den
                for l in levels[name]
            }
            new_u[name] = {
                l: sum(c * (1 - p) for pat, c, p in zip(patterns, counts, probs) if pat[i] == l) / nu_den
                for l in levels[name]
            }
        m, u = new_m, new_u
    return m, u, lam


PATTERNS = [
    ("agree", "agree"),
    ("agree", "disagree"),
    ("disagree", "agree"),
    ("disagree", "disagree"),
    (None, "agree"),
    ("agree", None),
]
COUNTS = [120, 40, 35, 900, 12, 9]
LEVELS = {"a": ["agree", "disagree"], "b": ["agree", "disagree"]}
U0 = {
    "a": {"agree": 0.2, "disagree": 0.8},
    "b": {"agree": 0.25, "disagree": 0.75},
}


def _pattern_df():
    return pd.DataFrame(
        {
            "a": [p[0] for p in PATTERNS],
            "b": [p[1] for p in PATTERNS],
            "n": COUNTS,
        }
    )


def test_em_matches_independent_reimplementation():
    total = 5000.0
    params = run_em(_pattern_df(), total_pairs=total, u_probabilities=U0, maxiter=7, levels=LEVELS)
    m2, u2, lam2 = brute_force_em(PATTERNS, COUNTS, total, U0, 7, LEVELS)
    assert params.lam == pytest.approx(lam2, rel=1e-9)
    for name in LEVELS:
        for l in LEVELS[name]:
            assert params.m_probabilities[name][l] == pytest.approx(m2[name][l], rel=1e-9)
            assert params.u_probabilities[name][l] == pytest.approx(u2[name][l], rel=1e-9)


def test_em_separable_mixture_recovers_structure():
    """Perfectly separated data: matches agree on both comparators,
    non-matches disagree on both. EM must drive m(agree)→1, u(agree)→0,
    λ→ n_match/total."""
    df = pd.DataFrame(
        {
            "a": ["agree", "disagree"],
            "b": ["agree", "disagree"],
            "n": [100, 900],
        }
    )
    params = run_em(
        df,
        total_pairs=1000.0,
        u_probabilities={
            "a": {"agree": 0.1, "disagree": 0.9},
            "b": {"agree": 0.1, "disagree": 0.9},
        },
        maxiter=50,
        levels=LEVELS,
    )
    assert params.lam == pytest.approx(0.1, abs=1e-3)
    assert params.m_probabilities["a"]["agree"] > 0.999
    assert params.u_probabilities["a"]["agree"] < 1e-3
    # FS weights: agreement strongly positive, disagreement negative
    assert params.weights["a"]["agree"] > 5
    assert params.weights["a"]["disagree"] < 0


def test_em_probabilities_are_distributions():
    params = run_em(_pattern_df(), total_pairs=5000.0, u_probabilities=U0, maxiter=10, levels=LEVELS)
    assert 0.0 <= params.lam <= 1.0
    for d in (params.m_probabilities, params.u_probabilities):
        for name, lv in d.items():
            assert sum(lv.values()) == pytest.approx(1.0, abs=1e-9)
            assert all(0.0 <= v <= 1.0 for v in lv.values())


def test_em_missing_levels_excluded_from_mstep():
    """A pattern with NULL for comparator 'a' must not contribute to
    a's m/u denominators (linking.R:127-136 semantics)."""
    with_null = pd.DataFrame({"a": [None], "b": ["agree"], "n": [10_000]})
    base = _pattern_df()
    combined = pd.concat([base, with_null], ignore_index=True)
    p1 = run_em(base, 5000.0, U0, maxiter=3, levels=LEVELS)
    p2 = run_em(combined, 5000.0, U0, maxiter=3, levels=LEVELS)
    # adding a huge a-missing pattern changes b's params but must leave
    # a's m-numerators/denominators driven by the same patterns —
    # ratios shift only via the shared posteriors, so check directly:
    # one iteration from identical inits keeps a's update identical.
    p1_once = run_em(base, 5000.0, U0, maxiter=1, levels=LEVELS)
    p2_once = run_em(combined, 5000.0, U0, maxiter=1, levels=LEVELS)
    for l in LEVELS["a"]:
        assert p1_once.m_probabilities["a"][l] == pytest.approx(
            p2_once.m_probabilities["a"][l], rel=1e-12
        )
    assert p1.lam != p2.lam  # sanity: the extra pattern does affect λ


def test_em_levels_from_spec_not_data():
    """A level absent from the data must still get a (zero-ish)
    probability slot — fixes linking.R:82's limitation."""
    df = pd.DataFrame({"a": ["agree"], "b": ["agree"], "n": [100]})
    params = run_em(
        df,
        total_pairs=200.0,
        u_probabilities=U0,
        maxiter=2,
        levels=LEVELS,
    )
    assert "disagree" in params.m_probabilities["a"]
    assert params.weights["a"]["disagree"] is not None  # no KeyError, no -inf crash


def test_em_weights_are_log_ratios():
    params = run_em(_pattern_df(), total_pairs=5000.0, u_probabilities=U0, maxiter=5, levels=LEVELS)
    for name in LEVELS:
        for l in LEVELS[name]:
            expect = math.log(params.m_probabilities[name][l]) - math.log(
                params.u_probabilities[name][l]
            )
            assert params.weights[name][l] == pytest.approx(expect, rel=1e-12)


def test_em_u_estimated_from_marginals_when_absent():
    params = run_em(_pattern_df(), total_pairs=5000.0, u_probabilities=None, maxiter=3, levels=LEVELS)
    for name in LEVELS:
        assert sum(params.u_probabilities[name].values()) == pytest.approx(1.0, abs=1e-9)
