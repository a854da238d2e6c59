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

Round-12 rotation policy (r11 verdict item 8 — "same policy, overlap
with r11 < 50%, re-seat whatever items 1-6 touch"): slots go first to
this round's NEVER-BOARDED gates (the r12 additions
``jaccard_prefix_pairs_ab``/``fuzzy_decontamination``/
``l_diversity_report``/``corpus_mix``), then to gates r12 items
TOUCHED in engine or oracle (``ngram_jaccard_pairs`` — repointed at
the prefix-filtered block-restricted plan, its first board seat since
r7; ``jaccard_prefix_pairs`` — bucketed-df ordering is now the
default; ``bm25_search`` — N counts non-NULL-text docs, oracle
changed in lockstep; ``heavy_hitters`` — per-batch summary
compaction; ``corpus_diff`` — single full-outer join;
``k_anonymity_suppress`` — forced broadcast dropped;
``expectation_report`` — rule-name validation; ``ann_ivf_append`` —
the E103 contract fix; ``near_dedup_keep_best`` — the r11 scale-tail
adjudication target), then to the 17 stalest gates (unboarded since
r8: the full cohort r11 deferred, ``linkage_em_end_to_end`` excepted
as the deliberate no-oracle off-board carry), then to 20 of the
r9-stale cohort (unboarded since r9).  Overlap with the r11 board:
8 of 50 (the touched cohort above minus ``ngram_jaccard_pairs``,
which wasn't on r11's board).  The complete all-gate artifact is
published alongside the board (verify_all.py →
CORRECTNESS_full.json, commit-stamped since r9) so off-board gates
stay externally auditable.
"""

from __future__ import annotations

# The 50 queries the driver board records this round, in order.
BOARD: list[str] = [
    # -- new this round / never recorded on any board --
    "jaccard_prefix_pairs_ab",
    "fuzzy_decontamination",
    "l_diversity_report",
    "corpus_mix",
    # -- touched by r12 items (fresh rows vs changed code/oracle) --
    "ngram_jaccard_pairs",
    "jaccard_prefix_pairs",
    "bm25_search",
    "heavy_hitters",
    "corpus_diff",
    "k_anonymity_suppress",
    "expectation_report",
    "ann_ivf_append",
    "near_dedup_keep_best",
    # -- the 17 stalest (unboarded since r8) --
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "blocking_estimate_scaled",
    "blocking_multi_pass",
    "comparison_vectors",
    "corpus_shuffle",
    "dedup_clusters_star",
    "dup_rate_report",
    "events_cohort_retention",
    "events_funnel",
    "jsonl_roundtrip",
    "jw_comparator_buckets",
    "minhash_jaccard_est",
    "sample_uniform_hash",
    "temperature_mix",
    "threshold_rank",
    "top_term_coverage",
    # -- 20 of the r9-stale cohort --
    "ann_lsh_topk",
    "ann_recall_report",
    "bcubed_quality",
    "blocking_estimate",
    "blocking_estimate_ab",
    "blocking_spec_choice",
    "bucketed_join_revenue",
    "budget_mix",
    "calibration_curve",
    "calibration_glm",
    "corpus_data_card",
    "corpus_upsample",
    "curriculum_order",
    "dedup_exact",
    "distinct_sketch_merge",
    "doc_chunks",
    "etl_roundtrip",
    "events_anomaly_flags",
    "events_asof_forward",
    "events_trailing_agg",
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
