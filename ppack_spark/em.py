"""Driver-side EM for the Fellegi-Sunter mixture model.

Re-implements ``run_em`` (reference linking.R:78-156) over the
collected pattern-counts table. The table has at most ∏ levels rows
(the sufficient statistic), so this is intentionally NOT distributed —
numpy matmuls on the driver replace the reference's interpreted
``rowwise()`` loop (linking.R:111-116), with the same log-space
discipline (log_sum_exp, utils.R:33-35).

Deliberate fixes over the reference (SURVEY §4):

* the u-update iterates level *names*; the reference's inner loop
  ``for (l in u_probabilities[[name]])`` iterates over probability
  *values* (linking.R:133) — an evident bug;
* levels come from the comparator spec when provided, not only from
  observed data (linking.R:82 "can do better");
* the author's underflow TODO (linking.R:79) is addressed by keeping
  every per-pattern quantity in log space via ``np.logaddexp``.

Model/update equations follow Fellegi & Sunter (JASA 1969) and the EM
update in Enamorado, Fifield & Imai (APSR 2019) supplementary
materials — per-pattern posterior match probability, then
count-weighted conditional frequencies for m/u over patterns where the
comparator is non-missing (missing levels contribute 0 log-likelihood
and are excluded from M-step denominators, linking.R:103,108,127-136).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Mapping, Sequence

import numpy as np
import pandas as pd

__all__ = ["FSParams", "run_em", "em_pattern_posteriors"]

Probs = dict[str, dict[str, float]]


@dataclass
class FSParams:
    """Fitted Fellegi-Sunter parameters (reference linking.R:143-155)."""

    m_probabilities: Probs
    u_probabilities: Probs
    lam: float
    total_pairs: float
    weights: Probs = field(default_factory=dict)  # log(m) - log(u), natural log
    history: list[dict] = field(default_factory=list)
    pattern_posteriors: pd.DataFrame | None = None

    def __post_init__(self) -> None:
        if not self.weights:
            self.weights = {
                name: {
                    level: math.log(self.m_probabilities[name][level])
                    - math.log(self.u_probabilities[name][level])
                    for level in sorted(self.m_probabilities[name])
                }
                for name in sorted(self.m_probabilities)
            }


def _level_matrix(values: pd.Series, levels: Sequence[str]) -> np.ndarray:
    """(patterns × levels) one-hot; all-zero row = missing (NULL)."""
    idx = {lvl: j for j, lvl in enumerate(levels)}
    a = np.zeros((len(values), len(levels)))
    for i, v in enumerate(values):
        if v is not None and not (isinstance(v, float) and math.isnan(v)):
            a[i, idx[v]] = 1.0
    return a


def run_em(
    pattern_counts: pd.DataFrame,
    total_pairs: float,
    u_probabilities: Probs | None = None,
    maxiter: int = 10,
    levels: Mapping[str, Sequence[str]] | None = None,
    lambda_init: float = 1e-7,
    update_u: bool = True,
    count_col: str = "n",
    verbose: bool = False,
) -> FSParams:
    """EM over the pattern-counts table.

    ``pattern_counts``: one row per distinct agreement pattern; gamma
    columns hold level strings or None/NaN for missing; ``n`` holds the
    pair count. ``total_pairs`` is the λ denominator — the reference
    uses n²/2 (scratch.R:56), a documented FS-on-blocked-data
    approximation whose semantics we keep.

    Initialization mirrors the reference: m = linspace(0.1, 0.8) over
    *sorted* levels (linking.R:85-88), λ₀ = 1e-7 (linking.R:94), u
    supplied (from random-pair sampling) or estimated from the pattern
    marginals if absent.
    """
    names = [c for c in pattern_counts.columns if c != count_col]
    n = pattern_counts[count_col].to_numpy(dtype=float)
    if len(n) == 0 or float(n.sum()) == 0.0 or total_pairs <= 0:
        raise ValueError(
            "run_em: no candidate pairs to fit on (empty pattern-counts "
            "table or zero total_pairs) — blocking produced nothing; "
            "check the blocking rules before estimating parameters"
        )

    if levels is None:
        levels = {
            name: sorted(
                v for v in pattern_counts[name].dropna().unique()
            )
            for name in names
        }
    levels = {name: list(levels[name]) for name in names}

    # Validate observed levels against the spec up front: a spec typo or
    # drifting comparator would otherwise surface as a bare KeyError.
    for name in names:
        observed = {
            v
            for v in pattern_counts[name].unique()
            if v is not None and not (isinstance(v, float) and math.isnan(v))
        }
        unknown = observed - set(levels[name])
        if unknown:
            raise ValueError(
                f"pattern counts for comparator {name!r} contain levels "
                f"{sorted(unknown)} absent from the spec levels {levels[name]}"
            )

    ind = {name: _level_matrix(pattern_counts[name], levels[name]) for name in names}
    nonmissing = {name: ind[name].sum(axis=1) > 0 for name in names}

    # init over SORTED level names (reference linking.R:85-88 applies
    # seq(0.1, 0.8) to sort(levels)); spec-supplied level lists keep
    # their declaration order elsewhere, but the init must not depend
    # on it.
    m = {
        name: dict(zip(sorted(levels[name]), np.linspace(0.1, 0.8, len(levels[name]))))
        for name in names
    }
    # Pattern-marginal level frequencies: the u fallback for levels a
    # Monte-Carlo u sample never observed (e.g. a rare 'full agreement'
    # JW bucket) — a supplied-u dict is NOT assumed complete.
    u_floor = 1e-10
    marginals = {}
    for name in names:
        counts = ind[name].T @ n
        tot = counts.sum()
        marginals[name] = dict(zip(levels[name], (counts / tot) if tot else counts))
    if u_probabilities is not None:
        u = {
            name: {
                l: float(
                    u_probabilities.get(name, {}).get(
                        l, max(marginals[name][l], u_floor)
                    )
                )
                for l in levels[name]
            }
            for name in names
        }
    else:
        u = {name: dict(marginals[name]) for name in names}

    lam = float(lambda_init)
    history: list[dict] = []
    prob_est = np.zeros_like(n)

    tiny = 1e-300  # clamp before log: an M-step can drive a level to exactly 0
    for it in range(maxiter):
        log_m_vec = {
            name: np.log(np.maximum([m[name][l] for l in levels[name]], tiny))
            for name in names
        }
        log_u_vec = {
            name: np.log(np.maximum([u[name][l] for l in levels[name]], tiny))
            for name in names
        }
        # E-step: per-pattern log-likelihoods; missing comparator → 0 term.
        loglik_m = sum(ind[name] @ log_m_vec[name] for name in names)
        loglik_u = sum(ind[name] @ log_u_vec[name] for name in names)
        log_num = math.log(lam) + loglik_m
        log_den = np.logaddexp(log_num, math.log1p(-lam) + loglik_u)
        prob_est = np.exp(log_num - log_den)

        # M-step (linking.R:120-136, with the u-loop bug fixed).
        expected_matches = float(n @ prob_est)
        lam = expected_matches / total_pairs
        m_old = {name: dict(m[name]) for name in names}
        u_old = {name: dict(u[name]) for name in names}
        for name in names:
            mask = nonmissing[name]
            nm = n * prob_est
            nu = n * (1.0 - prob_est)
            m_den = float(nm[mask].sum())
            u_den = float(nu[mask].sum())
            m_num = ind[name].T @ nm
            u_num = ind[name].T @ nu
            for j, l in enumerate(levels[name]):
                if m_den > 0:
                    m[name][l] = float(m_num[j] / m_den)
                if update_u and u_den > 0:
                    u[name][l] = float(u_num[j] / u_den)
        delta_m = max(
            abs(m[name][l] - m_old[name][l]) for name in names for l in levels[name]
        )
        delta_u = max(
            abs(u[name][l] - u_old[name][l]) for name in names for l in levels[name]
        )
        history.append(
            {"iter": it + 1, "lambda": lam, "max_delta_m": delta_m, "max_delta_u": delta_u}
        )
        if verbose:  # convergence diagnostics, linking.R:137-140
            print(f"iter {it + 1}: lambda={lam:.6g} dm={delta_m:.3g} du={delta_u:.3g}")

    posteriors = pattern_counts.copy()
    posteriors["prob_est"] = prob_est

    # Guard log(0) in weights for levels EM drove to zero.
    eps = 1e-300
    m = {k: {l: max(v, eps) for l, v in d.items()} for k, d in m.items()}
    u = {k: {l: max(v, eps) for l, v in d.items()} for k, d in u.items()}

    return FSParams(
        m_probabilities={k: dict(sorted(m[k].items())) for k in sorted(m)},
        u_probabilities={k: dict(sorted(u[k].items())) for k in sorted(u)},
        lam=lam,
        total_pairs=total_pairs,
        history=history,
        pattern_posteriors=posteriors,
    )


def em_pattern_posteriors(params: FSParams) -> pd.DataFrame:
    if params.pattern_posteriors is None:
        raise ValueError("run_em was not executed")
    return params.pattern_posteriors
