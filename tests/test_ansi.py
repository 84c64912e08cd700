"""ANSI-mode compatibility tripwires.

The driver runs queries in ITS OWN session, where ANSI may be on
(it is Spark 4's default). Any bare division, overflow-prone sum, or
0/0 aggregate that silently nulls in non-ANSI mode becomes a hard
error there. These tests flip the runtime conf on the shared session
and run the historically risky paths at sf0.001."""

import pytest

SF = "/root/testdata/sf0.001"

RISKY = [
    "q_skew_join",       # r7 md5-uniform hot-key cast + /1e9 scaling
    "q_image_phash_dedup",  # r7 bigint shifts/bit_count + hash casts
    "q_image_quality",   # r7 aspect division (nullif) + entropy kernel
    "q_dedup_cluster",   # hash-sum convergence checksum (overflow)
    "q_synthesis",       # pearson corr on constant candidates (0/0)
    "q_numeric_fns",     # division-heavy expression surface
    "q_histogram",       # zero-width bucket division
    "q_text_quality",    # ratio expressions with nullif guards
    "q_embed_norm",      # zero-vector normalization
    "q_tfidf",           # r3 in-row run-length tf + log(n/df) division
    "q_winsorize",       # r3 quantile-band clip (casts, percentile)
    "q_group_quantiles", # r3 buffered/radix gate (floor/casts in radix)
    "q_sessionize",      # r3 sum-of-flags aggregate (epoch arithmetic)
    "q_sample_group",    # r3 md5 row-order ranking
    "q_source_overlap",  # r3 shingle self-join matrix
    "q_duplicated_spans",  # r4 span-frac division (nullif guarded)
    "q_quantile_bucket",   # r4 bucket-cut comparisons over casts
    "q_hcat",              # r4 row-index offsets (count arithmetic)
    "q_interval_join",     # r4 timestamp + interval arithmetic
    "q_boilerplate",       # r4 line-hash size arithmetic
    "q_json_extract",      # r4 JSON path casts (malformed -> null vs error)
    "q_lead_lag",          # r4 sum/count/1e6 gap division
    "q_perplexity",        # r4 cross-entropy division + log
    "q_fuzzy_pairs",       # r4 substr/sequence gram window arithmetic
    "q_logreg_classifier", # r4 GD sigmoid/exp + standardization division
    "q_sample_weighted",   # r4 pow(u, 1/w) + md5 conv casts
    "q_grouping_sets",     # r4 multi-level agg null group keys
    "q_ohlc",              # r4 argmin/argmax struct-ordered aggregates
    "q8_market_share",     # r4 conditional-sum ratio division
    "q17_small_quantity",  # r4 avg-threshold comparison + /7.0
    "q_chi_square",        # r4 expected-count divisions
    "q_ks_test",           # r4 ECDF divisions (nullif guarded)
    "q_mann_whitney",      # r4 rank-sum / sigma divisions (nullif guarded)
    "q_js_divergence",     # r4 probability-ratio logs and divisions
    "q_psi",               # r4 proportion ratios + log (eps floored)
    "q_welch_t",           # r4 variance-ratio divisions (nullif guarded)
    "q_sample_weighted_group",  # r4 pow(u, 1/w) rank per group
    "q_quantiles",              # r5 two-pass radix engine (log2/floor/casts)
    "q_summarize",              # r5 fused-int-key pass-2 join arithmetic
    "q_approx_distinct_check",  # r5 relative-error division
    "q_knn_ivf_recall",         # r5 recall count comparison
    "q_dedup_minhash",          # r5 collapse + expansion joins
    "q_dedup_simhash_check",    # r6 bit ops + all-pairs count compare
    "q_knn_lsh_recall",         # r6 hamming probe + recall comparison
    "q_decision_tree",          # r6 TAO care-point aggregates + loss div
    "q_decontaminate",          # r6 hashed-cache derivation + frac division
    "q_bm25",                   # r6 idf log + length-norm divisions
    "q_approx_quantiles_check", # r6 rank-fraction divisions
    "q_sample_check",           # r6 binomial sd sqrt + size arithmetic
    "q_synthesis_check",        # r6 corr recompute (0/0 on constants)
    "q_semdedup_check",         # r6 cosine divisions + CC checksum
    "q_remove_spans",           # r6 positional window arithmetic
    "q_dsir",                   # r6 smoothed log-prob ratios + Gumbel logs
    "q_c4_filter",              # r6 mean-word-length division (nullif guarded)
    "q_hash_split",             # r6 md5 conv casts + threshold compare
    "q_temperature_mix",        # r6 pow(n, a-1) rate division
    "q_pca_check",              # r6 var/corr divisions + eigval compares
    "q_bloom_check",            # r6 31-bit-masked hash affine + bit shifts
    "q_bigram_ppl",             # r6 interpolated-prob logs + divisions
    "q_cms_check",              # r6 sketch slot hashing + bound division
    "q_naive_bayes",            # r6 log-prob sums + prior division
    "q_funnel",                 # r6 ts comparisons + stack casts
    "q_retention",              # r6 date_trunc diffs + offset division
    "q_validate",               # r6 violation-fraction division + regex
    "q_ols",                    # r6 regr_* covariance divisions
    "q_target_encode",          # r6 smoothed-mean + LOO divisions
    "q_onehot_hash",            # r6 md5 conv cast + modulo bucketing
    "q_dedup_paragraphs",       # r6 split/posexplode index arithmetic
    "q_scale",                  # r6 three scaler divisions (CASE-guarded)
    "q_token_entropy",          # r6 log2 + entropy divisions (guarded)
    "q_pmi",                    # r6 pmi probability-ratio divisions
    "q_pagerank",               # r6 rank/outdeg divisions x10 iterations
    "q_binary_metrics",         # r6 auc/logloss divisions + clipped logs
    "q_multiclass_metrics",     # r6 per-class ratio divisions (nullif)
    "q_lift",                   # r6 rate/base-rate/capture divisions
    "q_ewma",                   # r6 decay-weight powers + float sums
    "q_kaplan_meier",           # r6 risk-ratio logs + exp cumulative
    "q_logrank",                # r6 hypergeometric variance divisions
    "q_cox_check",              # r6 exp/log risk-set ratios x Newton
    "q_rmst",                   # r6 KM step-integral arithmetic
    "q_bootstrap",              # r6 weighted-mean ratios + md5 casts
    "q_spearman",               # r6 midrank arithmetic + corr
    "q_cdc",                    # r6 modulo predicates + merge coalesces
    "q_top_paths",              # r6 slice/sequence index arithmetic
    "q_cusum",                  # r6 standardized recurrence divisions
    "q_mad_outliers",           # r6 MAD-scaled threshold compares
    "q_holt",                   # r6 coupled smoothing recurrences
    "q2_min_cost_supplier",     # r9 derived-partsupp div/mod key math
    "q11_important_stock",      # r9 cents*qty sums + fraction threshold
    "q16_supplier_relation",    # r9 derived-partsupp + distinct count
    "q20_excess_stock",         # r9 0.5*shipped comparison + key casts
]


@pytest.fixture()
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", RISKY)
def test_query_survives_ansi(ansi, name):
    import __spark_entry__ as entry

    assert entry.queries()[name](ansi, SF).count() >= 0
