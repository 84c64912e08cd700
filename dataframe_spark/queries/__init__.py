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
# The r8 window (VERDICT r7 ask #1: finish the backfill — no
# oracle-backed green older than r5). Slots 1-31: the ENTIRE stale
# cohort — every query whose latest driver green is r4 or older
# (all 12 remaining TPC-H composites + the r1-era stats/join/
# sampling verbs + r3-vintage q_multimodal_meta), plus q_semdedup,
# the single registry entry never driver-run (rows-only by design —
# a driver row is still a hard executed-at-the-gate signal; its
# oracle-backed sibling q_semdedup_check re-enters below). This
# empties the stale queue: after r8, no hard signal is older than
# two rounds anywhere. Slots 32-39: every plan/oracle CHANGED in r8
# (q_summarize all-JVM sorted-tails rewrite; q_bootstrap chunked-
# digest weights + wide-agg path, oracle updated to match;
# q_naive_bayes vocab-cache gate; q_bigram_ppl collect()
# materialization; q_image_phash_dedup + q_image_quality
# null-payload oracle alignment; q_semdedup_check + q_knn_ivf_recall
# sit downstream of the kmeans_fit posexplode centroid rewrite).
# Slots 40-41: sentinels. Slots 42-50: the oldest (r5-green) cohort
# members whose plans were touched by the r8 derive/apply provenance
# annotation (metadata-only aliases — value-identical by
# construction, but the must-re-enter rule is cheap insurance).
#
# Re-enter OVERFLOW, documented: the provenance annotation also
# touched r5-green q_dates and r7-green q1 (sentinel, in), q7, q9,
# q13, q_filter_nulls, q_frequencies — more changed plans than free
# slots. The annotation adds column METADATA only (no expression
# change; the driver compares values + column names, not metadata),
# and every one of these is covered by this round's committed
# full-registry sf0.01 parity artifact (CERT_parity_sf0.01.json,
# 163/163) — the overflow queries carry that hard local signal and
# queue first for r9.
WINDOW_PRIORITY = [
    # 1-12: TPC-H composites, r4-green backfill
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
    # 13-30: r4-green verb backfill
    "q_collect_list",
    "q_correlation",
    "q_describe",             # also r8-changed (derived_from dropped
                              # from the cross-engine contract)
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
    "q_multimodal_meta",      # r3-vintage — the oldest green anywhere
    # 31: never driver-run (rows-only; oracle sibling re-enters below)
    "q_semdedup",
    # 32-39: r8 plan/oracle changes (must re-enter)
    "q_summarize",
    "q_bootstrap",
    "q_naive_bayes",
    "q_bigram_ppl",
    "q_image_phash_dedup",
    "q_image_quality",
    "q_semdedup_check",
    "q_knn_ivf_recall",
    # 40-41: sentinels
    "q1_pricing_summary",
    "q_sessionize",           # failed r1+r2 — keep hard signal
    # 42-48: r5-green + r8 provenance-annotated derive/apply plans
    "q_derive",
    "q_apply_where",
    "q_filter",
    "q_take_sorted",
    "q_impute",
    "q_join_left",
    "q_join_semi_anti",
    # 49-50: LATE-r8 plan change (beam_search now balances its
    # persisted working set — 255 s → 52 s uncached at 10x): the
    # must-re-enter rule outranks the provenance cohort, taking the
    # q_union / q_set_ops slots (metadata-only changes, covered by
    # CERT_parity_sf0.01.json, queued first for r9)
    "q_synthesis_check",
    "q_synthesis",
]

# R9 ROTATION QUEUE (stale-first): the provenance-overflow cohort
# (q_union, q_set_ops — late-r8 evictions — then q_dates,
# q7_nation_volume, q9_product_profit, q13_order_counts,
# q_filter_nulls, q_frequencies), then the remaining r5-green cohort
# by age (q_boilerplate, q_corpus_filter, q_corr_matrix,
# q_dedup_embedding, q_dedup_exact, q_distinct, q_exclude,
# q_group_agg, q_group_quantiles, q_join_full, q_js_divergence,
# q_knn_brute, q_ks_test, q_mann_whitney, q_melt, q_pivot, q_psi,
# q_quantiles, q_recode, q_resample, q_sample_weighted,
# q_sample_weighted_group, q_select, q_stream_psi, q_tfidf,
# q_vocabulary, q_welch_t, q_window_cumsum, q_window_rank,
# q_window_rolling, q_approx_distinct_check), then r6 greens. All
# remain under continuous full-registry pytest parity at sf0.001.
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
