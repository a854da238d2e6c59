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

Round-13 rotation policy (continuing the r11 verdict item-8 policy —
new gates first, then touched, then stalest; overlap with the prior
board < 50%): slots go first to this round's NEVER-BOARDED gates (the
r13 additions: the mergeable-sketch family ``hll_cardinality``/
``cms_frequency``/``histogram_quantiles``, the link-graph family
``host_pagerank``/``link_degree_report``, and the embedding-curation
pair ``cluster_balanced_sample``/``hard_negative_topk``), then — r13
touched no previously-boarded gate's engine or oracle (the advisor
fixes were tests/tools/docstring-only) — to the ENTIRE 29-gate
r9-stale cohort (every oracled gate unboarded since r9), then to the
14 alphabetically-first of the r10-stale cohort.
``linkage_em_end_to_end`` remains the deliberate no-oracle off-board
carry. Overlap with the r12 board: 0 of 50. The complete all-gate
artifact is published alongside the board (verify_all.py →
CORRECTNESS_full.json, commit-stamped since r9) so off-board gates
stay externally auditable.
"""

from __future__ import annotations

# The 50 queries the driver board records this round, in order.
BOARD: list[str] = [
    # -- new this round / never recorded on any board --
    "hll_cardinality",
    "cms_frequency",
    "histogram_quantiles",
    "host_pagerank",
    "link_degree_report",
    "cluster_balanced_sample",
    "hard_negative_topk",
    # -- the full r9-stale cohort (unboarded since r9) --
    "jw_approx_buckets",
    "key_skew_report",
    "lm_interp_score",
    "lm_ref_score",
    "minhash_lsh_pairs_capped",
    "orc_roundtrip",
    "pairs_dataset",
    "pattern_counts",
    "phash_near_dup_banded",
    "posterior_probability",
    "profile_columns",
    "q1_pricing_summary",
    "quality_classifier_score",
    "quantile_length_filter",
    "salted_join_orders",
    "script_fractions",
    "semantic_dedup",
    "sequence_packing",
    "simhash_near_dup",
    "simhash_near_dup_banded",
    "simhash_near_dup_capped",
    "stratified_topk",
    "tfidf_cosine_pairs",
    "threshold_sweep",
    "trainer_export_e2e",
    "two_dataset_linkage",
    "two_dataset_linkage_scaled",
    "u_prob_frequencies",
    "zorder_layout",
    # -- 14 of the r10-stale cohort (alphabetical) --
    "ann_ivf_topk",
    "ann_ivfpq_topk_scan",
    "ann_pq_topk_scan",
    "best_threshold",
    "blocking_pass_counts",
    "blocking_salted_pass",
    "bloom_decontamination",
    "corpus_delta_merge",
    "corpus_pipeline_e2e",
    "corpus_split",
    "corpus_split_leakage_safe",
    "dedup_keep_best",
    "dedup_keep_first",
    "doc_fingerprints",
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
