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
# FIRST 50 entries each round. The r6 window (VERDICT r5 ask #1)
# prioritizes (a) every plan changed THIS round (dedup perf rework,
# decontamination cache sharing, asof suffix uniquification, the TAO
# tree) plus the SIX queries new this round (simhash/LSH invariants
# in slots 7-8; late-r6 q_bm25 + three rows-only-upgrade invariants
# in slots 44-47), (b) the r5-fixed plans
# whose driver-green rows predate their fixes (histogram null
# bucket, chunk overlap, type-inference rework, fuzzy short-block
# re-band), (c) the late-r4 cohort that churned under r5 review
# fixes, (d) the r3-last longest-unverified block, and the two
# sentinels. The r5-green core-verb/stats/window cohort rotates
# behind the window — recorded green rows plus continuous
# full-registry parity in pytest at sf0.001.
WINDOW_PRIORITY = [
    "q_dedup_ngram_jaccard",   # 1-8: plans changed r6 + new invariants
    "q_dedup_minhash",
    "q_dedup_cluster",
    "q_decontaminate",
    "q_decision_tree",         # now greedy + TAO
    "q_asof_join",
    "q_dedup_simhash_check",   # new r6: banding completeness invariant
    "q_knn_lsh_recall",        # new r6: multiprobe recall invariant
    "q_histogram",             # 9-12: r5 fixes postdating green rows
    "q_doc_chunks",
    "q_parse_defaults",
    "q_fuzzy_pairs",
    "q_lead_lag",              # 13-19: late-r4 cohort, churned r5
    "q_winsorize",
    "q_chi_square",
    "q_logreg_classifier",
    "q_perplexity",
    "q1_pricing_summary",      # 20-21: sentinels
    "q_sessionize",            # sentinel (failed r1+r2 — keep hard signal)
    # the two NEVER-driver-checked queries with the most novel
    # correctness surface take the last two r3-green unchanged-plan
    # slots (q_source_overlap, q_stream_window — both under
    # continuous sf0.001 pytest parity, plans untouched since r3):
    # q_pagerank (iterative power method vs a recursive-CTE oracle)
    # and q_ewma (Arrow grouped kernel vs a closed-form float
    # oracle). The nine remaining late-r6 additions (q_scd2,
    # q_binary_metrics, q_multiclass_metrics, q_bloom_semi, q_lift,
    # q_kaplan_meier, q_logrank, q_cox_check, q_rmst — all sf0.01
    # parity-PASS this session) enter next rotation, the q_validate
    # precedent.
    "q_pagerank",
    "q_ewma",
    # five NEVER-driver-checked late-r6 additions (one_hot/hash_encode,
    # the scaler triple, paragraph dedup, token entropy, PMI) take the
    # slots of five r3-green unchanged-plan entries (q_repetition,
    # q_redact, q_pack, q_mixture, q_embed_norm — none touched since
    # their green rows; all stay under continuous full-registry pytest
    # parity at sf0.001 and each new query passed tools/parity at
    # sf0.01 this session). q_lang_id / q_fingerprint / q_token_budget
    # KEEP their slots: their plans changed r5 (null-clamp, unicode
    # punct, quality_score) after their r3 green rows.
    "q_onehot_hash",
    "q_scale",
    "q_dedup_paragraphs",
    "q_token_entropy",
    "q_pmi",
    "q_lang_id",
    "q_fingerprint",
    "q_token_budget",
    # the three NEVER-driver-checked end-of-round additions
    # (q_validate, q_ols, q_target_encode) outrank three r3-green
    # unchanged-plan refreshes (q_filter_nulls, q_text_split,
    # q_numeric_fns — all under continuous full-registry pytest
    # parity at sf0.001; never a failing driver row):
    "q_validate",              # Deequ-style data-quality contract
    "q_ols",                   # closed-form linear regression verb
    "q_target_encode",         # smoothed + LOO target encoding
    # four NEVER-driver-checked late-r6 additions take the slots of
    # four r3-green unchanged-plan entries (q_token_count,
    # q_mutual_info, q_multimodal_meta [rows-only — weakest signal],
    # q_embed_centroid), which stay under continuous full-registry
    # pytest parity at sf0.001:
    "q_c4_filter",             # C4 rule filter (oracle-backed)
    "q_hash_split",            # leakage-safe split (oracle-backed)
    "q_temperature_mix",       # α-temperature resampling (oracle-backed)
    "q_pca_check",             # distributed-PCA invariant (oracle-pinned)
    "q_bloom_check",           # Bloom incremental-dedup invariant
                               # (oracle-pinned; takes q_cube's slot —
                               # r3-green, plan unchanged, pytest parity)
    "q_bigram_ppl",            # interpolated bigram-LM perplexity
                               # (oracle-backed; takes q_frequencies'
                               # slot — same r3-green rationale)
    "q_cms_check",             # Count-Min sketch invariant (oracle-
                               # pinned; takes q_stream_dedup's slot —
                               # r3-green batch twin, plan unchanged,
                               # the stream family keeps q_stream_window
                               # r3 + q_interval_join r4 + q_stream_psi
                               # r5 in/near the window)
    "q_naive_bayes",           # fully-oracle-backed NB classifier
                               # (takes q_text_quality's slot —
                               # r3-green; quality_score stays driver-
                               # exercised via in-window q_token_budget)
    "q_funnel",                # sequential funnel analysis (oracle-
                               # backed; takes q_json_extract's slot —
                               # r4-green AND judge-re-verified in the
                               # r5 session, plan unchanged since)
    "q_retention",             # cohort retention triangle (oracle-
                               # backed; takes q_ohlc's slot — same
                               # r4-green + judge-re-verified rationale)
    "q_dsir",                  # NEW late-r6 oracle-backed DSIR selection
                               # (evicts rows-only q_synthesis, whose hard
                               # signal is q_synthesis_check in slot 47)
    "q_bm25",                  # 44-47: NEW late-r6 (never driver-checked)
    "q_approx_quantiles_check",  # new: GK rank-bound invariant
    "q_sample_check",          # new: seeded-sample replay invariant
    "q_synthesis_check",       # new: recomputed-score invariant
    "q_semdedup_check",        # 48: NEW r6 SemDeDup invariant
    "q_knn_ivf_recall",        # 49: kmeans_fit null-filter touched its plan
    "q_remove_spans",          # 50: NEW r6 exact-substring-dedup cleaner
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
