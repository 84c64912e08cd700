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
# The r11 window. Slot 1: q_bucket_cosine — the ONE registry entry
# never driver-checked (landed late r10; VERDICT r10 ask #3), and
# its plan changed again in r11 (null-bucket filter + mega-bucket
# sub-split tiles, ADVICE r10 #1/#2). Slots 2-4: plans changed in
# r11 — q_dedup_ngram_jaccard (_verify_jaccard rework: slim pair
# broadcast, candidate-doc pruning of the array table, persisted
# truncated-filter slim; VERDICT r10 ask #1 + ADVICE r10 #3),
# q_dedup_cluster (composes jaccard_pairs), q_dedup_minhash (calls
# _verify_jaccard; its sf0.01 plan takes the unchanged non-broadcast
# shape, windowed anyway because the function changed). Slots 5-8:
# the remaining r10 plan-change dependents re-enter per VERDICT r10
# ask #8 (q_heavy_hitters, q_synthesis_check, q_synthesis,
# q_bpe_encode). Slot 9: the q1 sentinel. Slots 10-13: the
# documented r10 overflow — the four r6-green members displaced by
# r10's plan-change slots (q_token_budget, q_token_entropy,
# q_validate, q_winsorize; single-pass conditional-agg plans
# unchanged since r6). Slots 14-49: the ENTIRE r7-green cohort (36
# members, CORRECTNESS_r07 order) — after this window no query's
# last driver check predates r8. Slot 50: q_pagerank — its plan
# changed late in r11 (the contribution join's rank side now
# broadcasts under the node-count gate), so it re-enters despite
# its r10 green.
WINDOW_PRIORITY = [
    # 1: never driver-checked + r11 plan change
    "q_bucket_cosine",
    # 2-4: r11 plan changes (jaccard verify rework)
    "q_dedup_ngram_jaccard",
    "q_dedup_cluster",
    "q_dedup_minhash",
    # 5-8: r10 plan-change dependents (VERDICT r10 ask #8)
    "q_heavy_hitters",
    "q_synthesis_check",
    "q_synthesis",
    "q_bpe_encode",
    # 9: sentinel
    "q1_pricing_summary",
    # 10-13: r10 overflow, last checked r6
    "q_token_budget",
    "q_token_entropy",
    "q_validate",
    "q_winsorize",
    # 14-49: the full r7-green cohort (36), CORRECTNESS_r07 order
    "q_spearman",
    "q_kaplan_meier",
    "q_logrank",
    "q_cox_check",
    "q_rmst",
    "q_stats_agg",
    "q17_small_quantity",
    "q_bloom_semi",
    "q_skew_join",
    "q_source_overlap",
    "q_scd2",
    "q_ewma",
    "q_cdc",
    "q_top_paths",
    "q_cusum",
    "q_holt",
    "q_stream_window",
    "q_stream_dedup",
    "q_c4_filter",
    "q_token_count",
    "q_repetition",
    "q_redact",
    "q_pack",
    "q_mixture",
    "q_text_quality",
    "q_text_split",
    "q_numeric_fns",
    "q_cube",
    "q_mutual_info",
    "q_mad_outliers",
    "q_binary_metrics",
    "q_multiclass_metrics",
    "q_lift",
    "q_target_encode",
    "q_embed_norm",
    "q_embed_centroid",
    # 50: r11 plan change (pagerank broadcast-ranks gate)
    "q_pagerank",
]

# R12 ROTATION QUEUE (stale-first): the full r8-green cohort
# (CORRECTNESS_r08 order, 44 members starting q_bootstrap), then
# the r9-green cohort. All remain under continuous full-registry
# pytest parity at sf0.001 and the HEAD CERT_parity sweeps at
# sf0.01/sf0.1/ANSI.
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
