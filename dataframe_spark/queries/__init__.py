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
# FIRST 50 entries each round. The r5 window (VERDICT r4 ask #1)
# prioritizes (a) the 10 oracle-backed/rows-only queries added after
# the r4 window froze — never driver-checked, (b) the 16 veterans
# last hard-checked in r1/r2 (two rounds of engine churn ago),
# (c) every plan CHANGED this round (summarize scaling fix, dedup
# perf work, sample_weighted NaN filter) plus the q1 and
# q_sessionize sentinels, and (d) the longest-unverified r3 queries.
# The r4-green TPC-H composites and stats suite rotate behind the
# window — they keep their recorded green rows plus continuous
# full-registry parity in pytest at sf0.001.
WINDOW_PRIORITY = [
    "q_welch_t",               # 1-10: added post-r4-freeze, never checked
    "q_mann_whitney",
    "q_ks_test",
    "q_psi",
    "q_corr_matrix",
    "q_js_divergence",
    "q_stream_psi",
    "q_sample_weighted_group",
    "q_boilerplate",
    "q_approx_quantiles",      # rows-only by design
    "q_select",                # 11-26: r1/r2 veterans, longest unverified
    "q_exclude",
    "q_filter",
    "q_derive",
    "q_distinct",
    "q_take_sorted",
    "q_group_agg",
    "q_recode",
    "q_apply_where",
    "q_impute",
    "q_join_left",
    "q_join_full",
    "q_join_semi_anti",
    "q_union",
    "q_set_ops",
    "q_dates",
    "q1_pricing_summary",      # 27-32: sentinels + plans changed in r5
    "q_sessionize",            # sentinel (failed r1+r2 — keep hard signal)
    "q_summarize",             # distributed-path cutover reworked r5
    "q_quantiles",             # same reworked two-pass engine
    "q_group_quantiles",       # grouped path of the reworked engine
    "q_dedup_ngram_jaccard",   # perf work r5
    "q_dedup_minhash",         # collapse rewrite + perm-index fix r5
    "q_sample_weighted",       # NaN-weight filter changed r5
    "q_dedup_exact",           # 33-50: r3-last longest-unverified +
    "q_dedup_embedding",       # the r5 rows-only→oracle upgrades
    "q_dedup_cluster",
    "q_knn_brute",
    "q_knn_ivf_recall",
    "q_asof_join",
    "q_window_rank",
    "q_window_cumsum",
    "q_window_rolling",
    "q_resample",
    "q_melt",
    "q_pivot",
    "q_tfidf",
    "q_corpus_filter",
    "q_vocabulary",
    "q_approx_distinct_check",
]
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
