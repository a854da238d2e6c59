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

Round-10 rotation policy (r9 verdict item 6 — "re-seat the r7-stale
cohort the r9 new-gate seats displaced, plus fresh rows for anything
item 1-5 touches; overlap with r9 < 50%, no gate older than r7"):
slots go first to this round's NEW gates (``linkage_eval_report`` —
the one-execution eval facade, ``linkage_ab_clusters_scaled`` — the
A-B cluster chain on the linear banded spec, plus the r10 coverage
additions ``snm_pairs``/``ari_quality``/``psi_drift_report``), then
to gates items 1-5 TOUCHED (``ann_pq_topk_scan``/
``ann_ivfpq_topk_scan`` — the pq_train GEMM fix changes the
production codebooks, so their rows-only records need refreshing;
``best_threshold`` — its kernel now routes through the shared
``_weight_counts`` helpers; ``near_dedup_corpus``/
``corpus_split_leakage_safe``/``match_weight_scoring`` — the
bench-regression adjudication cohort; ``linkage_ab_clusters`` — the
chain E128 re-specs), then to the ENTIRE r7-stale cohort (38 gates —
every name whose last driver row the r9 new-gate seats pushed to
three rounds old).  After this board
no gate's last driver row is older than r8 except the deliberate
``linkage_em_end_to_end`` carry (no-oracle by design, property-tested
in tests/test_em.py).  Overlap with the r9 board: 1 of 50
(``best_threshold``, re-boarded because its implementation changed).
The complete all-gate artifact is published alongside the board
(verify_all.py → CORRECTNESS_full.json, commit-stamped since r9) so
off-board gates stay externally auditable.
"""

from __future__ import annotations

# The 50 queries the driver board records this round, in order.
BOARD: list[str] = [
    # -- new this round (never recorded on any board) --
    "linkage_eval_report",
    "linkage_ab_clusters_scaled",
    "snm_pairs",
    "ari_quality",
    "psi_drift_report",
    # -- touched by r10 items 1-5 (fresh rows vs changed code) --
    "ann_pq_topk_scan",
    "ann_ivfpq_topk_scan",
    "best_threshold",
    "near_dedup_corpus",
    "corpus_split_leakage_safe",
    "match_weight_scoring",
    "linkage_ab_clusters",
    # -- the full r7-stale cohort (displaced by the r9 new-gate seats) --
    "suffix_projection",
    "blocking_pass_counts",
    "blocking_salted_pass",
    "levenshtein_comparator",
    "soundex_comparator",
    "segment_revenue",
    "top_orders_per_customer",
    "events_window_agg",
    "events_sessionize",
    "events_json_extract",
    "events_sliding_window",
    "events_value_quantiles",
    "events_range_join",
    "events_rollup",
    "events_asof_join",
    "dedup_keep_first",
    "token_stats",
    "quality_scores",
    "lang_id",
    "tfidf_top_terms",
    "doc_fingerprints",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "media_metadata",
    "media_phash_near_dup",
    "embedding_cosine_topk",
    "embedding_near_dup",
    "ann_ivf_topk",
    "eval_decontamination",
    "bloom_decontamination",
    "corpus_delta_merge",
    "corpus_pipeline_e2e",
    "corpus_stage_report",
    "corpus_delta_merge_fuzzy",
    "corpus_split",
    "dsir_importance",
    "dedup_keep_best",
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
