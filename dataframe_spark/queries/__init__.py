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
# The r12 window (VERDICT r11 ask #5: retire the r8 cohort — after
# r11 the 44 queries below were the only ones whose last driver
# check predated r9). Slots 1-5: r12 plan changes —
# q_bucket_cosine (bucketed-GEMM tile rows now pre-normalized in
# place, ADVICE r11 #1: same cosine to 4dp, but the kernel math
# changed so it re-verifies), q_pagerank (npart clamp for
# implausible plan-size estimates, ADVICE r11 #2, + the profile
# hook), q_dedup_ngram_jaccard / q_dedup_minhash / q_dedup_cluster
# (the _materialize barrier gained the SPARK_GRAFT_NO_CACHE_BARRIER
# cert toggle — default path identical, windowed because the
# function changed). Slot 6: the q1 sentinel. Slots 7-50: the
# ENTIRE r8-stale cohort (44 members, CORRECTNESS_r08 order) —
# after this window no query's last driver check predates r9.
WINDOW_PRIORITY = [
    # 1-5: r12 plan changes
    "q_bucket_cosine",
    "q_pagerank",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    "q_dedup_cluster",
    # 6: sentinel
    "q1_pricing_summary",
    # 7-50: the full r8-stale cohort (44), CORRECTNESS_r08 order
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_basket_revenue",
    "q21_waiting_supplier",
    "q22_global_sales",
    "q_collect_list",
    "q_correlation",
    "q_describe",
    "q_duplicated_spans",
    "q_grouping_sets",
    "q_hcat",
    "q_interval_join",
    "q_join_inner",
    "q_json_extract",
    "q_mode",
    "q_ntile",
    "q_ohlc",
    "q_quantile_bucket",
    "q_rollup",
    "q_sample_group",
    "q_skewness",
    "q_value_counts",
    "q_multimodal_meta",
    "q_summarize",
    "q_bootstrap",
    "q_naive_bayes",
    "q_bigram_ppl",
    "q_image_phash_dedup",
    "q_image_quality",
    "q_knn_ivf_recall",
    "q_derive",
    "q_apply_where",
    "q_filter",
    "q_take_sorted",
    "q_impute",
    "q_join_left",
    "q_join_semi_anti",
]

# R13 ROTATION QUEUE (stale-first): the r9-green cohort
# (CORRECTNESS_r09 order, 45 members starting q_bpe), then the
# r10-green cohort. All remain under continuous full-registry
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
