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
# The r13 window. Slots 1-9: this round's plan-changed / engine-
# defaulted queries (VERDICT r12 ask #3a) — q_bpe + q_bpe_encode
# (replace-chain trainer, r12, missed the r12 window; + any r13
# trainer change), q_semdedup_check (bound norms + persist, r12),
# q_bigram_ppl (fit persist, r12), q_bootstrap (the arrow kernel is
# its default at every SF — keep it driver-verified),
# q_dedup_minhash / q_dedup_ngram_jaccard / q_dedup_cluster /
# q_decontaminate (the r13 shingle-chain arrow kernel is now the
# default at sf0.1 — the 256 KB knee puts the BENCH SF on the
# kernel plan, so the driver re-verifies exactly what it benches).
# Slot 10: the q1 sentinel. Slots 11-50: the r9-green cohort,
# stale-first (CORRECTNESS_r09 order — their last driver check is
# r9), EXCLUDING its three rows-only members (q_semdedup, q_knn_lsh,
# q_synthesis: generative/sampling outputs the driver hash cannot
# pin by design — their hard-signal companions q_semdedup_check,
# q_knn_lsh_recall, q_synthesis_check are windowed instead) and
# keeping the last three (q_select, q_stream_psi, q_tfidf) for the
# r14 rotation.
WINDOW_PRIORITY = [
    # 1-9: r13 plan changes + VERDICT r12 ask #3a
    "q_bpe",
    "q_bpe_encode",
    "q_semdedup_check",
    "q_bigram_ppl",
    "q_bootstrap",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_cluster",
    "q_decontaminate",
    # 10: sentinel
    "q1_pricing_summary",
    # 11-50: r9-green cohort, CORRECTNESS_r09 order (see above)
    "q_ppl_buckets",
    "q_heavy_hitters",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_relation",
    "q20_excess_stock",
    "q_fingerprint",
    "q_corpus_filter",
    "q_knn_lsh_recall",
    "q_synthesis_check",
    "q_sessionize",
    "q_union",
    "q_set_ops",
    "q_dates",
    "q7_nation_volume",
    "q9_product_profit",
    "q13_order_counts",
    "q_filter_nulls",
    "q_frequencies",
    "q_boilerplate",
    "q_corr_matrix",
    "q_dedup_embedding",
    "q_dedup_exact",
    "q_distinct",
    "q_exclude",
    "q_group_agg",
    "q_group_quantiles",
    "q_join_full",
    "q_js_divergence",
    "q_knn_brute",
    "q_ks_test",
    "q_mann_whitney",
    "q_melt",
    "q_pivot",
    "q_psi",
    "q_quantiles",
    "q_recode",
    "q_resample",
    "q_sample_weighted",
    "q_sample_weighted_group",
]

# R14 ROTATION QUEUE (stale-first): the r9 tail (q_select,
# q_stream_psi, q_tfidf), then the r10-green cohort
# (CORRECTNESS_r10 order). All remain under continuous
# full-registry pytest parity at sf0.001 and the HEAD CERT_parity
# sweeps at sf0.01/sf0.1/ANSI (which DO hash-verify the rows-only
# trio's check companions and row production).
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
