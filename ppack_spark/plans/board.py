"""Driver correctness-board curation.

The external driver verifies ``__spark_entry__.queries()`` against the
DuckDB oracle at sf0.01 — but it records ONLY THE FIRST 50 entries in
dict-iteration order.  Measured evidence across rounds (the registry
grew 28 → 43 → 54 → 80 while the board recorded 28 → 43 → 50 → 50
rows, and the round-3→4 board diff — dropped ``ann_lsh_topk`` /
``eval_decontamination``, gained ``threshold_topk`` /
``bucketed_join_revenue`` — is exactly the first-50 cut of the
round-4 registration order):

    round  registry  board rows   board set
    r1       28         28        all
    r2       43         43        all
    r3       54         50        first 50 in order
    r4       80         50        first 50 in order

With ~130 registered gates the board can never show everything, so
this module makes the cut deliberate instead of accidental: ``BOARD``
lists the 50 queries that lead the iteration order this round, and
everything else follows in registration order.  The full gate suite —
every registered query, board or not — is verified against the same
oracle at the same scale by ``tests/test_registry_oracle.py``; board
rotation only changes which 50 rows the driver snapshot shows.

Round-9 rotation policy (r8 verdict item 7 — "board the
never-recorded remainder; overlap with r8 by < 50%"): slots go first
to this round's NEW gates (the A-B scaled linkage chain, its
estimator, the E123 spec-choice operator whose pick flips between
the two driver scales, and the E124-E126 evaluation family:
threshold sweep, B-cubed, F1-argmax τ), then to the gates whose
OUTPUT changed this round
(``semantic_dedup`` now auto-scales its plane count;
``simhash_near_dup_banded`` is re-pointed to the 64-bit production
config — both need a fresh external row against the new oracle), then
to the ENTIRE stale set whose last driver row is r6 or older (42
gates, including every name the verdict called out: ``pairs_dataset``,
``u_prob_frequencies``, ``etl_roundtrip``, ``calibration_glm``,
``orc_roundtrip``, ``zorder_layout``, the E94-E107 cohort); the six
new-gate seats displaced the r7-stale fill (those rows' last driver
record is one round old — the juniormost staleness claim).  Overlap
with the r8 board: 2 of 50
(``semantic_dedup``, ``jw_approx_buckets`` — both changed materially
this round, which is exactly when re-boarding is worth a seat).
``linkage_em_end_to_end`` (last row r4) stays off-board as a
deliberate no-oracle carry — property-tested in tests/test_em.py.
The complete all-gate artifact is published alongside the board
(verify_all.py → CORRECTNESS_full.json, commit-stamped since r9) so
off-board gates stay externally auditable.
"""

from __future__ import annotations

# The 50 queries the driver board records this round, in order.
BOARD: list[str] = [
    # -- new this round (never recorded on any board) --
    "two_dataset_linkage_scaled",
    "blocking_estimate_ab",
    "blocking_spec_choice",
    "threshold_sweep",
    "bcubed_quality",
    "best_threshold",
    # -- output/config changed this round (fresh row vs new oracle) --
    "semantic_dedup",
    "simhash_near_dup_banded",
    "simhash_near_dup_capped",
    "jw_approx_buckets",
    # -- stalest: last driver row r5 --
    "corpus_upsample",
    "key_skew_report",
    "quality_classifier_score",
    "salted_join_orders",
    "script_fractions",
    "events_trailing_agg",
    "events_asof_forward",
    # -- stale: last driver row r6 --
    "pairs_dataset",
    "pattern_counts",
    "u_prob_frequencies",
    "posterior_probability",
    "calibration_curve",
    "calibration_glm",
    "etl_roundtrip",
    "two_dataset_linkage",
    "bucketed_join_revenue",
    "q1_pricing_summary",
    "dedup_exact",
    "simhash_near_dup",
    "phash_near_dup_banded",
    "ann_recall_report",
    "ann_lsh_topk",
    "sequence_packing",
    "stratified_topk",
    "curriculum_order",
    "budget_mix",
    "quantile_length_filter",
    "orc_roundtrip",
    "minhash_lsh_pairs_capped",
    "distinct_sketch_merge",
    "lm_ref_score",
    "lm_interp_score",
    "corpus_data_card",
    "doc_chunks",
    "zorder_layout",
    "blocking_estimate",
    "trainer_export_e2e",
    "tfidf_cosine_pairs",
    "events_anomaly_flags",
    "profile_columns",
]


def board_order(names) -> list[str]:
    """Order ``names`` with the BOARD first (in board order), then the
    rest in their original order.  Raises if a BOARD entry is unknown
    or duplicated so a registry rename can't silently shrink the
    board."""
    name_list = list(names)
    name_set = set(name_list)
    assert len(BOARD) == 50, f"board must have exactly 50 rows, has {len(BOARD)}"
    assert len(set(BOARD)) == len(BOARD), "duplicate board entry"
    missing = [n for n in BOARD if n not in name_set]
    assert not missing, f"board entries not registered: {missing}"
    rest = [n for n in name_list if n not in set(BOARD)]
    return BOARD + rest
