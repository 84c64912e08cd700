"""Round-3 pipeline extras: winsorization, deterministic per-group
sampling, inter-source overlap. Registered between windows_q and
relational so all three land inside the driver's 50-entry
correctness window on their first round."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import DataFrame
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


def q_winsorize(spark, sf_dir):
    """Per-group outlier clipping at the [p05, p95] exact-quantile
    band (operators/quantiles.py winsorize: gated quantile strategy,
    broadcast bounds join) — reported as per-group means before and
    after clipping."""
    from ..operators.quantiles import winsorize

    li = _t(spark, sf_dir, "lineitem").df
    out = winsorize(li, "l_extendedprice", ["l_returnflag"], 0.05, 0.95)
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_raw"),
        F.round(F.avg("l_extendedprice_winsorized"), 2).alias("avg_winsor"),
    )


def q_sample_group(spark, sf_dir):
    """Deterministic 5-per-source document sample via the portable
    md5 row order (core.py sample_k_per_group) — identical rows on
    any engine/run, unlike rand()-based sampling."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.sample_k_per_group("source", 5, ["doc_id"])
        .df.select("source", "doc_id")
    )


def q_ks_test(spark, sf_dir):
    """Distribution drift: exact two-sample KS between click and
    purchase event values (partition-offset cumulative plan — no
    single-partition sort)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.ks_test("value", F.col("event_type"), "click", "purchase").df
    return out.select(
        F.round("ks", 6).alias("ks"), "n_a", "n_b", "n_values"
    )


def q_corr_matrix(spark, sf_dir):
    """All pairwise correlations of four lineitem measures in one
    aggregation pass (long-form upper triangle)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.corr_matrix(
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).df
    return out.select("col_a", "col_b", F.round("r", 6).alias("r"))


def q_psi(spark, sf_dir):
    """Population stability index of event values, click (reference)
    vs purchase (current), over exact reference deciles."""
    ev = _t(spark, sf_dir, "events")
    out = ev.psi("value", F.col("event_type"), "click", "purchase").df
    return out.select(F.round("psi", 6).alias("psi"), "n_a", "n_b")


def q_welch_t(spark, sf_dir):
    """Parametric mean comparison: Welch's t between click and
    purchase event values (one conditional-agg pass)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.welch_t_test("value", F.col("event_type"), "click", "purchase").df
    return out.select(
        F.round("t", 4).alias("t"),
        F.round("df", 2).alias("df"),
        F.round("mean_a", 4).alias("mean_a"),
        F.round("mean_b", 4).alias("mean_b"),
        "n_a",
        "n_b",
    )


def q_mann_whitney(spark, sf_dir):
    """Location-shift drift: exact tie-corrected Mann–Whitney U
    between click and purchase event values, on the same parallel
    rank machinery as q_ks_test."""
    ev = _t(spark, sf_dir, "events")
    out = ev.mann_whitney_u("value", F.col("event_type"), "click", "purchase").df
    return out.select(
        F.round("u_a", 2).alias("u_a"),
        F.round("u_b", 2).alias("u_b"),
        F.round("z", 4).alias("z"),
        "n_a",
        "n_b",
    )


def q_sample_weighted(spark, sf_dir):
    """Quality-weighted 100-doc sample (Efraimidis–Spirakis over the
    portable md5 uniform): inclusion odds proportional to n_chars,
    deterministic on any engine. The ln(u)/w rank keys (well-
    conditioned log form) are computed identically on both sides,
    so the SELECTED SET matches exactly;
    only ids and the integer weight are emitted (no float key)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.sample_weighted(100, F.col("n_chars"), ["doc_id"])
        .df.select("doc_id", "n_chars")
    )


def q_sample_weighted_group(spark, sf_dir):
    """Length-weighted 5-doc sample per source (per-group A-ES over
    the portable md5 uniform; one group-key shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.sample_weighted_per_group("source", 5, F.col("n_chars"), ["doc_id"])
        .df.select("source", "doc_id", "n_chars")
    )


def q_grouping_sets(spark, sf_dir):
    """Explicit grouping sets: (returnflag, linestatus) detail,
    returnflag subtotals, and the grand total — one pass, one
    shuffle, skipping the (linestatus)-only level a cube would
    also compute."""
    li = _t(spark, sf_dir, "lineitem")
    return li.grouping_sets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        n=F.count(F.lit(1)),
        sum_qty=F.round(F.sum("l_quantity"), 2),
    ).df


def q_hcat(spark, sf_dir):
    """Positional horizontal concat (core.py hcat, reference
    Merge.hs:59 ``|||``): nation (25 rows) glued beside region
    (5 rows) under explicit per-side orders — region columns
    null-fill past row 5."""
    nation = _t(spark, sf_dir, "nation").select(["n_nationkey", "n_name"])
    region = _t(spark, sf_dir, "region").select(["r_regionkey", "r_name"])
    return nation.hcat(
        region, order_by=["n_nationkey"], other_order_by=["r_regionkey"]
    ).df


def q_duplicated_spans(spark, sf_dir):
    """Cross-document duplicated-span scoring (operators/dedup.py
    duplicated_spans — window-hash simplification of Lee et al.
    suffix-array dedup): fraction of each doc covered by 20-token
    spans appearing in ≥2 documents. The oracle recomputes with span
    STRINGS instead of xxhash64 (same counts absent 2^-64 hash
    collisions)."""
    from ..operators.dedup import duplicated_spans

    docs = _t(spark, sf_dir, "documents").df
    return duplicated_spans(docs, "doc_id", "text", window=20, min_docs=2)


def q_remove_spans(spark, sf_dir):
    """Exact substring dedup — the CLEANING op (operators/dedup.py
    remove_duplicated_spans): rewrite every document with all
    non-canonical occurrences of cross-document 20-token spans
    removed (canonical = smallest (id, pos)). The oracle recomputes
    the identical removal with span STRINGS instead of xxhash64
    (same result absent 2^-64 collisions) and re-derives every
    cleaned text with STRING_AGG over the surviving positions."""
    from ..operators.dedup import remove_duplicated_spans

    docs = _t(spark, sf_dir, "documents").df
    return remove_duplicated_spans(
        docs, "doc_id", "text", window=20, min_docs=2
    )


def q_dedup_paragraphs(spark, sf_dir):
    """Paragraph-level exact dedup (operators/dedup.py
    dedup_paragraphs — the RefinedWeb line-dedup stage): split each
    document on the ' a ' separator (the synthetic corpus has no
    newlines), keep the first global occurrence of every duplicated
    >=10-char paragraph, rebuild the text. The oracle recomputes the
    identical removal with paragraph STRINGS instead of xxhash64
    (same result absent 2^-64 collisions) and re-derives every
    cleaned text with STRING_AGG over the surviving indexes."""
    from ..operators.dedup import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents").df
    return dedup_paragraphs(docs, "doc_id", "text", sep=" a ", min_chars=10)


def q_quantile_bucket(spark, sf_dir):
    """Equi-depth bucketing (operators/quantiles.py quantile_bucket):
    exact quartile cuts broadcast as one row, assignment map-side —
    NTILE semantics without NTILE's single-ordering scale problem.
    Reported as per-bucket count + value band."""
    from ..operators.quantiles import quantile_bucket

    li = _t(spark, sf_dir, "lineitem").df
    out = quantile_bucket(li, "l_extendedprice", 4)
    return out.groupBy(
        F.col("l_extendedprice_bucket").cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(F.col("l_extendedprice").cast("double")), 2).alias("lo"),
        F.round(F.max(F.col("l_extendedprice").cast("double")), 2).alias("hi"),
    )


def q_approx_quantiles(spark, sf_dir):
    """Greenwald-Khanna bounded-state quantile sketch (core.py
    approx_quantiles) — the 100 TB profiling path. Rows-only by
    design: sketch values are implementation-defined within the
    rank-error bound (the bound itself is asserted in pytest)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.approx_quantiles(
        ["l_quantity", "l_extendedprice"], [0.1, 0.5, 0.9], rel_err=0.01
    ).df
    return out.select(
        "column_name",
        F.round("prob", 2).alias("prob"),
        F.round("value", 4).alias("value"),
    )


def q_approx_quantiles_check(spark, sf_dir):
    """Hard-signal invariant for the GK sketch path (oracle-backed
    upgrade of rows-only q_approx_quantiles, the q_knn_ivf_recall
    pattern): every sketch value must satisfy the Greenwald-Khanna
    rank guarantee — the fraction of rows strictly below the value
    is ≤ prob + rel_err and the fraction at-or-below is
    ≥ prob - rel_err — with BOTH sides computed in Spark (the rank
    recount is one conditional agg over the unpivoted columns joined
    to the broadcast 6-row sketch). Deterministic for fixed data, so
    the booleans are a stable hard check; the oracle pins them."""
    li = _t(spark, sf_dir, "lineitem")
    probs = [0.1, 0.5, 0.9]
    rel_err = 0.01
    cols = ["l_quantity", "l_extendedprice"]
    sk = li.approx_quantiles(cols, probs, rel_err=rel_err).df
    # data-sized stages key on an INT column index, not the name
    # string — string join/group keys over the unpivoted stream cost
    # ~4x (measured r5); the index maps back to the name only on the
    # 6-row result
    name_to_ci = F.when(F.col("column_name") == cols[0], 0).otherwise(1)
    sk_ix = sk.select(name_to_ci.alias("__ci"), "prob", "value")
    vals = li.df.selectExpr(
        "stack(2, 0, CAST(l_quantity AS DOUBLE), "
        "1, CAST(l_extendedprice AS DOUBLE)) AS (__ci, x)"
    ).where(F.col("x").isNotNull())
    counts = (
        vals.join(F.broadcast(sk_ix), "__ci")
        .groupBy("__ci", "prob")
        .agg(
            F.sum((F.col("x") < F.col("value")).cast("long")).alias("__lt"),
            F.sum((F.col("x") <= F.col("value")).cast("long")).alias("__le"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    eps = rel_err + 1e-9
    within = (
        F.col("__lt") / F.col("__n") <= F.col("prob") + F.lit(eps)
    ) & (F.col("__le") / F.col("__n") >= F.col("prob") - F.lit(eps))
    return counts.select(
        F.when(F.col("__ci") == 0, cols[0])
        .otherwise(cols[1])
        .alias("column_name"),
        F.round("prob", 2).alias("prob"),
        within.alias("within_rank_bound"),
    ).orderBy("column_name", "prob")


def q_source_overlap(spark, sf_dir):
    """Cross-source 3-gram overlap matrix (operators/dedup.py
    source_overlap): shared distinct shingles per source pair."""
    from ..operators.dedup import source_overlap

    docs = _t(spark, sf_dir, "documents").df
    return source_overlap(docs, "source", "text", n=3)


def q_validate(spark, sf_dir):
    """Deequ-style contract over orders: five rules — completeness,
    allowed-set (binding: 'P' status rows violate), format regex,
    value range (binding above 300k), and key uniqueness — all
    row-level rules in ONE conditional-count agg pass."""
    from ..operators import validate as V

    o = load_table(spark, sf_dir, "orders")
    return V.validate(
        o,
        row_rules={
            "custkey_not_null": V.is_null("o_custkey"),
            "status_in_of": V.not_in_set("o_orderstatus", ["O", "F"]),
            "priority_format": V.not_matching(
                "o_orderpriority", "^[1-5]-[A-Z ]+$"
            ),
            "totalprice_range": V.not_in_range("o_totalprice", 0, 300000),
        },
        unique_keys={"orderkey_unique": ["o_orderkey"]},
    )


QUERIES = {
    "q_validate": q_validate,
    "q_winsorize": q_winsorize,
    "q_sample_group": q_sample_group,
    "q_ks_test": q_ks_test,
    "q_mann_whitney": q_mann_whitney,
    "q_welch_t": q_welch_t,
    "q_psi": q_psi,
    "q_corr_matrix": q_corr_matrix,
    "q_sample_weighted": q_sample_weighted,
    "q_sample_weighted_group": q_sample_weighted_group,
    "q_grouping_sets": q_grouping_sets,
    "q_hcat": q_hcat,
    "q_duplicated_spans": q_duplicated_spans,
    "q_remove_spans": q_remove_spans,
    "q_dedup_paragraphs": q_dedup_paragraphs,
    "q_quantile_bucket": q_quantile_bucket,
    "q_approx_quantiles": q_approx_quantiles,
    "q_approx_quantiles_check": q_approx_quantiles_check,
    "q_source_overlap": q_source_overlap,
}

ORACLES = {
    "q_validate": """
        WITH base AS (
          SELECT COUNT(*) AS n,
            SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
            SUM(CASE WHEN o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('O', 'F')
                     THEN 1 ELSE 0 END) AS v_set,
            SUM(CASE WHEN o_orderpriority IS NULL
                       OR NOT REGEXP_MATCHES(o_orderpriority,
                                             '^[1-5]-[A-Z ]+$')
                     THEN 1 ELSE 0 END) AS v_fmt,
            SUM(CASE WHEN o_totalprice IS NULL
                       OR o_totalprice < 0 OR o_totalprice > 300000
                     THEN 1 ELSE 0 END) AS v_rng,
            COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uni
          FROM orders
        )
        SELECT rule, n AS n_rows,
               CAST(viol AS BIGINT) AS n_violations,
               ROUND(viol / CAST(n AS DOUBLE), 6) AS frac_violations
        FROM (
          SELECT 'custkey_not_null' AS rule, n, v_null AS viol FROM base
          UNION ALL SELECT 'status_in_of', n, v_set FROM base
          UNION ALL SELECT 'priority_format', n, v_fmt FROM base
          UNION ALL SELECT 'totalprice_range', n, v_rng FROM base
          UNION ALL SELECT 'orderkey_unique', n, v_uni FROM base
        )
    """,
    "q_approx_quantiles_check": """
        SELECT column_name, CAST(prob AS DOUBLE) AS prob,
               TRUE AS within_rank_bound FROM (VALUES
          ('l_extendedprice', 0.1), ('l_extendedprice', 0.5),
          ('l_extendedprice', 0.9),
          ('l_quantity', 0.1), ('l_quantity', 0.5), ('l_quantity', 0.9)
        ) AS t(column_name, prob)
        ORDER BY column_name, prob
    """,
    "q_welch_t": """
        WITH s AS (
          SELECT COUNT(CASE WHEN event_type = 'click' THEN value END) AS n_a,
                 COUNT(CASE WHEN event_type = 'purchase' THEN value END) AS n_b,
                 AVG(CASE WHEN event_type = 'click' THEN value END) AS mean_a,
                 AVG(CASE WHEN event_type = 'purchase' THEN value END) AS mean_b,
                 VAR_SAMP(CASE WHEN event_type = 'click' THEN value END) AS va,
                 VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END) AS vb
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
        )
        SELECT ROUND((mean_a - mean_b)
                     / NULLIF(SQRT(va / n_a + vb / n_b), 0.0), 4) AS t,
               ROUND((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                     / NULLIF((va / n_a) * (va / n_a) / (n_a - 1)
                              + (vb / n_b) * (vb / n_b) / (n_b - 1), 0.0),
                     2) AS df,
               ROUND(mean_a, 4) AS mean_a,
               ROUND(mean_b, 4) AS mean_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
        FROM s
    """,
    "q_corr_matrix": """
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS r FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_discount',
               ROUND(CORR(l_quantity, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_tax',
               ROUND(CORR(l_quantity, l_tax), 6) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_discount',
               ROUND(CORR(l_extendedprice, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_tax',
               ROUND(CORR(l_extendedprice, l_tax), 6) FROM lineitem
        UNION ALL SELECT 'l_discount', 'l_tax',
               ROUND(CORR(l_discount, l_tax), 6) FROM lineitem
    """,
    "q_psi": """
        WITH src AS (
          SELECT value AS v, event_type AS g FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
        ), e AS (
          SELECT QUANTILE_CONT(CAST(v AS DOUBLE),
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
          FROM src WHERE g = 'click'
        ), binned AS (
          SELECT LEN(LIST_FILTER(edges, x -> CAST(v AS DOUBLE) > x)) AS bin, g
          FROM src CROSS JOIN e
        ), c AS (
          SELECT bin,
                 SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS nb
          FROM binned GROUP BY bin
        ), t AS (
          SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
          FROM c
        )
        SELECT ROUND(SUM(
                 (GREATEST(na / CAST(ta AS DOUBLE), 1e-6)
                  - GREATEST(nb / CAST(tb AS DOUBLE), 1e-6))
                 * LN(GREATEST(na / CAST(ta AS DOUBLE), 1e-6)
                      / GREATEST(nb / CAST(tb AS DOUBLE), 1e-6))), 6) AS psi,
               MAX(ta) AS n_a, MAX(tb) AS n_b
        FROM c CROSS JOIN t
    """,
    "q_mann_whitney": """
        WITH c AS (
          SELECT value AS v,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
          GROUP BY value
        ), t AS (
          SELECT CAST(SUM(na) AS DOUBLE) AS ta, CAST(SUM(nb) AS DOUBLE) AS tb
          FROM c
        ), cum AS (
          SELECT na, nb, na + nb AS m,
                 SUM(na + nb) OVER (ORDER BY v) AS cend
          FROM c
        ), parts AS (
          SELECT SUM(na * (cend - m + 1 + (m - 1) / 2.0)) AS ra,
                 SUM(CAST(m * m * m - m AS DOUBLE)) AS ties
          FROM cum
        )
        SELECT ROUND(ra - ta * (ta + 1) / 2.0, 2) AS u_a,
               ROUND(ta * tb - (ra - ta * (ta + 1) / 2.0), 2) AS u_b,
               ROUND(((ra - ta * (ta + 1) / 2.0) - ta * tb / 2.0)
                     / NULLIF(SQRT(ta * tb / 12.0
                       * ((ta + tb + 1)
                          - ties / NULLIF((ta + tb) * (ta + tb - 1), 0.0))), 0.0),
                     4) AS z,
               CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b
        FROM parts CROSS JOIN t
    """,
    "q_ks_test": """
        WITH c AS (
          SELECT value AS v,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
          GROUP BY value
        ), t AS (
          SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
          FROM c
        ), cum AS (
          SELECT SUM(na) OVER (ORDER BY v) AS ca,
                 SUM(nb) OVER (ORDER BY v) AS cb
          FROM c
        )
        SELECT ROUND(MAX(ABS(CAST(ca AS DOUBLE) / NULLIF(ta, 0)
                             - CAST(cb AS DOUBLE) / NULLIF(tb, 0))), 6) AS ks,
               MAX(ta) AS n_a, MAX(tb) AS n_b, COUNT(*) AS n_values
        FROM cum CROSS JOIN t
    """,
    "q_sample_weighted": """
        SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars,
                 LN((CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) + 1) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE) AS aes
          FROM documents
          WHERE n_chars IS NOT NULL AND n_chars > 0
        )
        ORDER BY aes DESC, doc_id ASC LIMIT 100
    """,
    "q_sample_weighted_group": """
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY LN((CAST('0x' ||
                       SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 1) / 4294967296.0)
                     / CAST(n_chars AS DOUBLE) DESC, doc_id ASC
                 ) AS rn
          FROM documents
          WHERE n_chars IS NOT NULL AND n_chars > 0
        ) WHERE rn <= 5
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
    "q_winsorize": """
        WITH b AS (
          SELECT l_returnflag,
                 QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
                 QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
          FROM lineitem GROUP BY 1
        )
        SELECT l.l_returnflag,
               COUNT(*) AS n,
               ROUND(AVG(l_extendedprice), 2) AS avg_raw,
               ROUND(AVG(LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), lo), hi)), 2)
                 AS avg_winsor
        FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        GROUP BY 1
    """,
    "q_sample_group": """
        -- Spark side coalesces NULL keys to a \\x00 sentinel inside the
        -- md5 input; doc_id is non-null here so the hashes are identical
        -- without mirroring the coalesce (DuckDB cannot embed NUL chars).
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY MD5(CONCAT_WS(CHR(31), doc_id)), doc_id) AS rn
          FROM documents
        ) WHERE rn <= 5
    """,
    "q_hcat": """
        WITH a AS (
          SELECT n_nationkey, n_name,
                 ROW_NUMBER() OVER (ORDER BY n_nationkey) AS idx
          FROM nation
        ),
        b AS (
          SELECT r_regionkey, r_name,
                 ROW_NUMBER() OVER (ORDER BY r_regionkey) AS idx
          FROM region
        )
        SELECT n_nationkey, n_name, r_regionkey, r_name
        FROM a FULL OUTER JOIN b USING (idx)
    """,
    "q_duplicated_spans": """
        WITH tok AS (
          SELECT doc_id AS id,
                 LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ),
        win AS (
          SELECT DISTINCT id,
                 UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 19),
                        i -> ARRAY_TO_STRING(t[i:i+19], ' '))) AS span
          FROM tok
        ),
        wfreq AS (
          SELECT span FROM win GROUP BY span HAVING COUNT(*) >= 2
        )
        SELECT w.id AS id,
               COUNT(*) AS n_windows,
               COUNT(f.span) AS n_dup_windows,
               ROUND(COUNT(f.span) / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0), 4)
                 AS dup_span_frac
        FROM win w LEFT JOIN wfreq f ON w.span = f.span
        GROUP BY w.id
    """,
    "q_dedup_paragraphs": """
        WITH parts AS (
          SELECT id, r['i'] AS idx, r['p'] AS para, TRIM(r['p']) AS norm
          FROM (
            SELECT doc_id AS id,
                   UNNEST(LIST_TRANSFORM(
                     GENERATE_SERIES(1, LEN(sp)),
                     i -> {'i': i - 1, 'p': sp[i]})) AS r
            FROM (SELECT doc_id,
                         STRING_SPLIT(COALESCE(text, ''), ' a ') AS sp
                  FROM documents)
          )
        ),
        canon AS (
          SELECT norm, MIN({'d': id, 'x': idx}) AS w0
          FROM parts WHERE LEN(norm) >= 10
          GROUP BY norm HAVING COUNT(*) >= 2
        ),
        flagged AS (
          SELECT p.id, p.idx, p.para,
                 (LEN(p.norm) < 10 OR c.norm IS NULL
                  OR (p.id = c.w0['d'] AND p.idx = c.w0['x'])) AS keep
          FROM parts p
          LEFT JOIN canon c
            ON p.norm = c.norm AND LEN(p.norm) >= 10
        )
        SELECT id, COUNT(*) AS n_paras,
               CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_removed,
               COALESCE(STRING_AGG(CASE WHEN keep THEN para END,
                                   ' a ' ORDER BY idx), '') AS clean_text
        FROM flagged GROUP BY id
    """,
    "q_remove_spans": """
        WITH tok AS (
          SELECT doc_id AS id,
                 LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ),
        wins AS (
          SELECT id, r['pos'] AS pos, r['w'] AS w
          FROM (
            SELECT id,
                   UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 19),
                          i -> {'pos': i - 1,
                                'w': ARRAY_TO_STRING(t[i:i+19], ' ')})) AS r
            FROM tok
          )
        ),
        canon AS (
          SELECT w, MIN({'d': id, 'p': pos}) AS w0
          FROM wins GROUP BY w HAVING COUNT(DISTINCT id) >= 2
        ),
        dups AS (
          SELECT v.id, v.pos
          FROM wins v JOIN canon c ON v.w = c.w
          WHERE NOT (v.id = c.w0['d'] AND v.pos = c.w0['p'])
        ),
        covered AS (
          SELECT DISTINCT id,
                 UNNEST(GENERATE_SERIES(pos, pos + 19)) AS cpos
          FROM dups
        ),
        tokrows AS (
          SELECT id, r['p'] AS p, r['tk'] AS tk
          FROM (
            SELECT id,
                   UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t)),
                          i -> {'p': i - 1, 'tk': t[i]})) AS r
            FROM tok
          )
        ),
        kept AS (
          SELECT tr.id, tr.p, tr.tk
          FROM tokrows tr
          LEFT JOIN covered c ON tr.id = c.id AND tr.p = c.cpos
          WHERE c.id IS NULL
        )
        SELECT t.id AS id,
               CAST(LEN(t.t) AS BIGINT) AS n_tokens,
               CAST(LEN(t.t) - COUNT(k.tk) AS BIGINT) AS n_removed,
               COALESCE(STRING_AGG(k.tk, ' ' ORDER BY k.p), '')
                 AS clean_text
        FROM tok t LEFT JOIN kept k ON t.id = k.id
        GROUP BY t.id, LEN(t.t)
    """,
    "q_quantile_bucket": """
        WITH cuts AS (
          SELECT QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE),
                               [0.25, 0.5, 0.75]) AS c
          FROM lineitem
        ),
        assigned AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                 CAST(CASE WHEN v > c[1] THEN 1 ELSE 0 END
                    + CASE WHEN v > c[2] THEN 1 ELSE 0 END
                    + CASE WHEN v > c[3] THEN 1 ELSE 0 END AS INT) AS bucket
          FROM lineitem, cuts
        )
        SELECT bucket, COUNT(*) AS n,
               ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi
        FROM assigned GROUP BY bucket
    """,
    "q_source_overlap": """
        WITH tok AS (
          SELECT source, LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                                     x -> x <> '') AS t
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT source,
                 UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM tok
        )
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2
    """,
}
