"""End-to-end accuracy fixture (reference scratch.R:130-139 style, the
splink ``historical_figures`` pattern): a synthetic dirty-duplicates
table with KNOWN entity clusters, driven through the full Linker
pipeline — blocking → comparisons → u sampling → EM → scoring →
threshold → connected-components clustering — asserting pairwise
precision/recall and recovered-partition quality against ground truth.

The fixture is deterministic: entity "surnames" are md5-derived 20-char
strings (distinct entities collide on ~0 characters), duplicates get 1
or 2 character substitutions at fixed tail positions (normalized
Levenshtein 0.95 / 0.90 — the strong/weak comparator buckets), copies
share the entity's city block and category, and balances differ by
<100 within an entity and ≥1000 across entities.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import ppack_spark as pp

N_ENTITIES = 40


def _surname(entity: int) -> str:
    return hashlib.md5(f"entity:{entity}".encode()).hexdigest()[:20]


def _dirty(name: str, copy: int, entity: int) -> str:
    """copy 0: exact; copy 1: one substitution (lev sim 0.95) except
    every 4th entity keeps an EXACT duplicate (so 'full agreement'
    is observed among true pairs); copy 2: two substitutions (lev sim
    0.90 → 'weak' bucket)."""
    sub = {"0": "z", "1": "y", "2": "x"}

    def repl(s: str, pos: int) -> str:
        c = s[pos]
        return s[:pos] + sub.get(c, "0" if c != "0" else "1") + s[pos + 1 :]

    if copy == 1:
        return name if entity % 4 == 0 else repl(name, 14)
    if copy == 2:
        return repl(repl(name, 14), 17)
    return name


def _fixture_rows():
    rows = []
    rid = 0
    for e in range(N_ENTITIES):
        n_copies = 2 + (e % 2)  # clusters of size 2 or 3
        base = _surname(e)
        for c in range(n_copies):
            rows.append(
                (
                    rid,
                    e,  # ground-truth cluster
                    _dirty(base, c, e),
                    f"city{e % 7}",
                    f"cat{e % 5}",
                    1000.0 * e + 30.0 * c,
                )
            )
            rid += 1
    return rows


TRUTH_PAIRS = None  # filled lazily


def _truth_pairs(rows):
    truth = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if a[1] == b[1]:
                truth.add((min(a[0], b[0]), max(a[0], b[0])))
    return truth


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        _fixture_rows(),
        "rec_id long, entity long, name string, city string, cat string, balance double",
    )


@pytest.fixture(scope="module")
def fitted_linker(spark, fixture_df):
    bal_diff = F.abs(F.col("balance_left") - F.col("balance_right"))
    spec = pp.LinkerSpec(
        unique_id_left="rec_id",
        unique_id_right="rec_id",
        blocking_rules=[
            pp.BlockingRule.on("city"),
            pp.BlockingRule.where(
                F.substring("name_left", 1, 10) == F.substring("name_right", 1, 10)
            ),
        ],
        comparisons=[
            pp.Comparison.levenshtein("name"),
            pp.Comparison.exact("cat"),
            pp.Comparison.buckets(
                "balance",
                bal_diff,
                [(bal_diff < 100, "close"), (bal_diff < 1000, "near")],
                "far",
            ),
        ],
    )
    linker = pp.Linker(spark, fixture_df, None, spec)
    linker.estimate(maxiter=25, u_sample_size=4000, seed=11, lambda_init=0.05)
    return linker


def test_pairwise_precision_and_recall(fitted_linker):
    """scratch.R:130-135: weight>τ pairs vs ground-truth clusters."""
    pred = {
        (r["rec_id_left"], r["rec_id_right"])
        for r in fitted_linker.score(threshold=5.0)
        .select("rec_id_left", "rec_id_right")
        .collect()
    }
    truth = _truth_pairs(_fixture_rows())
    assert pred, "no pairs above threshold — estimation collapsed"
    tp = len(pred & truth)
    precision = tp / len(pred)
    recall = tp / len(truth)
    assert precision >= 0.95, (precision, len(pred), tp)
    assert recall >= 0.90, (recall, len(truth), tp)


def test_cluster_recovers_partition(fitted_linker, fixture_df):
    """Linker.cluster() must reproduce the ground-truth partition:
    same-entity records share a cluster_id, distinct entities don't
    (allowing the few dropped weak-copy edges the recall bound admits
    — measured as ≥0.9 Rand-index-style pair agreement)."""
    out = fitted_linker.cluster(threshold=5.0).select("rec_id", "entity", "cluster_id")
    rows = [(r["rec_id"], r["entity"], r["cluster_id"]) for r in out.collect()]
    same_entity = same_cluster = both = 0
    for i, (_, ea, ca) in enumerate(rows):
        for _, eb, cb in rows[i + 1 :]:
            se, sc = ea == eb, ca == cb
            same_entity += se
            same_cluster += sc
            both += se and sc
    # pairwise cluster precision/recall against the truth partition
    assert both / same_cluster >= 0.95
    assert both / same_entity >= 0.90


def test_em_learned_informative_params(fitted_linker):
    """The EM must land on the informative fixed point: m(full/strong
    agreement) ≫ u, positive weights for agreement levels, λ near the
    true match share."""
    params = fitted_linker.params
    w = params.weights["name"]
    assert w["full agreement"] > 0
    assert w["strong partial agreement"] > 0
    assert w["no agreement"] < 0
    truth = _truth_pairs(_fixture_rows())
    n = len(_fixture_rows())
    lam_true = len(truth) / (n * n / 2.0)
    assert params.lam == pytest.approx(lam_true, rel=0.5)
