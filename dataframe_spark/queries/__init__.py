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
# FIRST 50 entries each round. The r4 window prioritizes (a) every
# stats plan changed since its last driver-green row (VERDICT r3 #1:
# group-quantiles gate, stats-agg split, summarize kernel — repacked
# AGAIN late-r4), (b) all 18 TPC-H composite shapes (12 of them new
# or never driver-checked this round), (c) the changed/new r4 extras
# and dedup rewrites plus the q_sessionize sentinel, and (d) every
# late-r4 query (never driver-checked). The r1/r2-green core verbs
# (q_select/q_exclude/...) rotate behind the window — they keep
# their recorded green rows plus continuous full-registry parity in
# pytest at sf0.001.
WINDOW_PRIORITY = [
    *stats_q.QUERIES,          # 14 stats queries (changed plans + new chi-square)
    "q1_pricing_summary",      # 14-31: all TPC-H composite shapes
    "q_join_inner",            # (Q3)
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",         # new late-r4
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_lines",
    "q13_order_counts",        # new late-r4
    "q14_promo_revenue",
    "q15_top_supplier",        # new late-r4
    "q17_small_quantity",      # new late-r4
    "q18_large_orders",
    "q19_basket_revenue",
    "q21_waiting_supplier",    # new late-r4
    "q22_global_sales",        # new late-r4
    "q_winsorize",             # 32-40: changed/new r3-r4 extras
    "q_sample_group",
    "q_hcat",
    "q_duplicated_spans",
    "q_quantile_bucket",
    "q_dedup_ngram_jaccard",   # prefix-rank plan rewritten r4
    "q_decontaminate",         # in-row broadcast rewrite r4
    "q_interval_join",
    "q_sessionize",            # sentinel (failed r1+r2 — keep hard signal)
    "q_json_extract",          # 41-49: late-r4 additions, never checked
    "q_lead_lag",
    "q_ntile",
    "q_ohlc",
    "q_perplexity",
    "q_logreg_classifier",
    "q_fuzzy_pairs",
    "q_sample_weighted",
    "q_grouping_sets",         # 50
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
