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

Round-11 rotation policy (r10 verdict item 6 — "re-seat anything
items 1-5 touch plus the stalest cohort; overlap with r10 < 50%"):
slots go first to this round's NEVER-BOARDED gates (the r11 additions
``linkage_eval_report_scaled``/``corpus_stage_report_reuse``/
``url_canonicalize``/``url_dedup``/``url_host_report``/
``ks_drift_report``/``events_asof_tolerance``/``weighted_sample``,
the two late-r10 gates whose registration postdated the r10 board
snapshot, ``cluster_size_histogram``/``psi_cat_drift_report``, and
the eleven operators added mid-r11 after the first rotation pass —
``bm25_search``/``host_boilerplate``/``jaccard_prefix_pairs``/
``heavy_hitters``/``k_anonymity_report``/``k_anonymity_suppress``/
``expectation_report``/``fk_orphans``/``corpus_diff``/
``join_size_estimate``/``ann_ivf_append``), then to gates r11 items
TOUCHED (``ari_quality`` — the grouping-sets single-execution
rewrite; ``psi_drift_report`` — the constant-reference degenerate
rule changed in engine AND oracle; ``corpus_stage_report`` — the
reuse-mode edit shares its function body; ``near_dedup_keep_best``/
``corpus_delta_merge_fuzzy`` — the r10 bench-drift adjudication
cohort, now also on the scale-proof roster), then to 24 of the 42
r8-stale gates.  18 stale names defer to r12: the 7 from the first
rotation pass (``jsonl_roundtrip``/``corpus_shuffle``/
``events_funnel``/``events_cohort_retention``/``temperature_mix``/
``top_term_coverage``/...) plus the 11 displaced by the mid-round
additions (``ann_ivfpq_topk``/``ann_pq_topk``/
``blocking_estimate_scaled``/``blocking_multi_pass``/
``comparison_vectors``/``dedup_clusters_star``/``dup_rate_report``/
``jw_comparator_buckets``/``minhash_jaccard_est``/
``sample_uniform_hash``/``threshold_rank``) — all untouched
pure-relational gates with no changed code path anywhere near them,
still covered by the full census every round.
Overlap with the r10 board: 4 of 50 (``ari_quality``/
``psi_drift_report``/``corpus_stage_report``/
``corpus_delta_merge_fuzzy``, each re-boarded because its
implementation or oracle changed this round).
``linkage_em_end_to_end`` stays a deliberate off-board carry
(no-oracle by design, property-tested in tests/test_em.py).  The
complete all-gate artifact is published alongside the board
(verify_all.py → CORRECTNESS_full.json, commit-stamped since r9) so
off-board gates stay externally auditable.
"""

from __future__ import annotations

# The 50 queries the driver board records this round, in order.
BOARD: list[str] = [
    # -- new this round / never recorded on any board --
    "linkage_eval_report_scaled",
    "corpus_stage_report_reuse",
    "url_canonicalize",
    "url_dedup",
    "url_host_report",
    "ks_drift_report",
    "events_asof_tolerance",
    "weighted_sample",
    "cluster_size_histogram",
    "psi_cat_drift_report",
    "bm25_search",
    "host_boilerplate",
    "jaccard_prefix_pairs",
    "heavy_hitters",
    "k_anonymity_report",
    "k_anonymity_suppress",
    "expectation_report",
    "fk_orphans",
    "corpus_diff",
    "join_size_estimate",
    "ann_ivf_append",
    # -- touched by r11 items (fresh rows vs changed code) --
    "ari_quality",
    "psi_drift_report",
    "corpus_stage_report",
    "near_dedup_keep_best",
    "corpus_delta_merge_fuzzy",
    # -- 24 of the r8-stale cohort --
    "blocking_multi_pass_scaled",
    "comparison_vectors_scaled",
    "dedup_clusters",
    "dedup_clusters_adaptive",
    "jw_scaled_buckets",
    "jw_sql_buckets",
    "line_dedup_corpus",
    "linkage_em_params",
    "lm_bigram_score",
    "lm_perplexity_buckets",
    "lm_quality_score",
    "match_weight_scoring_scaled",
    "media_near_dedup",
    "minhash_lsh_pairs_ab",
    "minhash_lsh_pairs_wide",
    "near_dedup_corpus_wide",
    "pii_stats",
    "quality_filter_flags",
    "remove_repeated_spans",
    "repeated_spans",
    "repetition_signals",
    "sample_stratified_quota",
    "simhash_near_dup_wide64",
    "threshold_topk",
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
