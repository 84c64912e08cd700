"""Driver-contract query registry.

Each submodule defines QUERIES (name → (spark, sf_dir) → DataFrame)
and ORACLES (name → equivalent DuckDB SQL). Column names/aliases are
identical on both sides; every float aggregate is rounded on both
sides (the driver hash-compares values order-insensitively).
"""

from . import (
    dedup_q,
    exprs_q,
    extras_q,
    ml_q,
    relational,
    stats_q,
    text_q,
    windows_q,
)

MODULES = [stats_q, relational, extras_q, windows_q, text_q, exprs_q, ml_q, dedup_q]

# Registry order is a verification surface: the driver snapshots the
# FIRST 50 entries each round.
#
# The r10 window. Slots 1-6: every plan CHANGED in r10 —
# q_dedup_ngram_jaccard + q_dedup_cluster (jaccard_pairs moved to
# the hash-ordered zero-corpus-shuffle prefix plan; cluster composes
# it), q_heavy_hitters (mergeable bucketed batch twin),
# q_synthesis + q_synthesis_check (pre-projected/memoized scoring),
# q_bpe_encode (null-text coalesce). Slot 7: the q1 sentinel.
# Slots 8-50: the stale cohort, oldest-first — every query whose
# last driver check predates r7: the r3 trio (q_dedup_simhash,
# q_knn_ivf, q_sample), r4's q_approx_distinct, the six r5-green
# overflow members documented in the r9 queue (q_approx_distinct_
# check, q_approx_quantiles, q_vocabulary, q_welch_t,
# q_window_cumsum, q_window_rank, q_window_rolling — 7 with
# q_approx_quantiles joining from the same vintage), then the
# r6-green cohort alphabetically. Four r6-green members with
# UNCHANGED one-pass conditional-agg plans overflow to r11
# (documented below).
#
# (The r9 window text lives in git history: slots 1-4 were the four
# late-r9 queries, 5-8 the derived-partsupp TPC-H composites, 9-16
# the r9 plan changes, 17-18 sentinels, 19-50 the r8 overflow +
# r5-green cohorts.)
# (never driver-checked — highest priority class): q_bpe /
# q_bpe_encode (distributed BPE tokenizer training; the oracle
# replays the full 8-round training loop in chained CTEs),
# q_ppl_buckets (CCNet per-language perplexity head/middle/tail),
# and q_heavy_hitters (space-saving top-k batch twin, exact-regime
# oracle). Slots 5-8: the four NEW derived-partsupp TPC-H
# composites (never driver-checked before this round).
# Slots 9-16: every plan CHANGED in r9 — q_fingerprint +
# q_corpus_filter (the polynomial fingerprint moved from a per-
# character JVM fold to an Arrow numpy kernel, values bit-identical,
# regression-pinned); q_semdedup + q_semdedup_check (k now derives
# from parquet footer counts instead of an emb.count() job — same k
# at every SF); q_knn_lsh + q_knn_lsh_recall (hyperplane_sketch
# nulls the bucket for empty/null-poisoned vectors under dim=None —
# ALSO covers ADVICE r8 #3: these two changed plans in r8 (dim
# default 64 -> None) and missed that window; they re-enter now);
# q_synthesis + q_synthesis_check (r9 beam-search scale work).
# Slots 17-18: sentinels. Slots 19-26: the documented r8 overflow
# cohort (q_union, q_set_ops late-r8 evictions, then the
# provenance-annotated q_dates/q7/q9/q13/q_filter_nulls/
# q_frequencies). Slots 27-50: the r5-green cohort by the r8 queue
# order (24 of its 30 remaining members; q_corpus_filter already
# re-enters in slot 10).
#
# Re-enter OVERFLOW, documented: six r5-green cohort members
# (q_welch_t, q_window_cumsum, q_window_rank, q_vocabulary —
# displaced by the four new-query slots — plus q_window_rolling,
# q_approx_distinct_check) miss this window; all six plans are
# UNCHANGED since their r5 green and all carry this round's
# committed full-registry sf0.01/sf0.1/ANSI parity artifacts — they
# queue first for r10 alongside the r6-green cohort.
WINDOW_PRIORITY = [
    # 1-6: plans changed in r10 (must re-enter)
    "q_dedup_ngram_jaccard",
    "q_dedup_cluster",
    "q_heavy_hitters",
    "q_synthesis_check",
    "q_synthesis",
    "q_bpe_encode",
    # 7: sentinel
    "q1_pricing_summary",
    # 8-10: last checked r3
    "q_dedup_simhash",
    "q_knn_ivf",
    "q_sample",
    # 11: last checked r4
    "q_approx_distinct",
    # 12-18: last checked r5
    "q_approx_distinct_check",
    "q_approx_quantiles",
    "q_vocabulary",
    "q_welch_t",
    "q_window_cumsum",
    "q_window_rank",
    "q_window_rolling",
    # 19-50: r6-green cohort (34 of 38; 4 overflow to r11, below)
    "q_approx_quantiles_check",
    "q_asof_join",
    "q_bloom_check",
    "q_bm25",
    "q_chi_square",
    "q_cms_check",
    "q_decision_tree",
    "q_decontaminate",
    "q_dedup_minhash",
    "q_dedup_paragraphs",
    "q_dedup_simhash_check",
    "q_doc_chunks",
    "q_dsir",
    "q_funnel",
    "q_fuzzy_pairs",
    "q_hash_split",
    "q_histogram",
    "q_lang_id",
    "q_lead_lag",
    "q_logreg_classifier",
    "q_ols",
    "q_onehot_hash",
    "q_pagerank",
    "q_parse_defaults",
    "q_pca_check",
    "q_perplexity",
    "q_pmi",
    "q_remove_spans",
    "q_retention",
    "q_sample_check",
    "q_scale",
    "q_temperature_mix",
]

# R11 ROTATION QUEUE (stale-first): q_token_budget, q_token_entropy,
# q_validate, q_winsorize — the four r6-green members displaced by
# this round's six plan-change slots; all four are single-pass
# conditional-agg plans UNCHANGED since their r6 green and carry the
# r9 full-registry sf0.01/sf0.1/ANSI parity artifacts. Then the
# r7-green cohort by age.
# All remain under continuous full-registry pytest parity at sf0.001.
#
# (Previous rounds' windows live in git history for the rotation
# audit trail.)
# plain raise, not assert: the guard must survive python -O
if len(WINDOW_PRIORITY) != 50:
    raise ValueError(f"window must have 50 slots, has {len(WINDOW_PRIORITY)}")


def _ordered(attr):
    merged = {}
    for m in MODULES:
        merged.update(getattr(m, attr))
    out = {}
    for name in WINDOW_PRIORITY:
        if name in merged:
            out[name] = merged.pop(name)
    if attr == "QUERIES":
        # a typo'd window name would otherwise silently shrink the
        # driver-verified set
        missing = [n for n in WINDOW_PRIORITY if n not in out]
        if missing:
            raise ValueError(f"window names not in registry: {missing}")
    out.update(merged)
    return out


def all_queries():
    return _ordered("QUERIES")


def all_oracles():
    return _ordered("ORACLES")
