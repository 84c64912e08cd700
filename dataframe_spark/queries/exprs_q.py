"""Expression-DSL coverage queries: null combinators, string ops,
numeric functions, z-score — each exercising Functions.hs surface
with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import DataFrame
from ..expr import (
    clip,
    match,
    match_all,
    relu,
    split_on,
)
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


def q_filter_nulls(spark, sf_dir):
    """filterJust / filterNothing / fromMaybe on a null-seeded column."""
    c = _t(spark, sf_dir, "customer")
    seeded = c.derive(
        "bal", F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    )
    just = seeded.filter_just("bal").aggregate(n_just=F.count(F.lit(1)))
    nothing = seeded.filter_nothing("bal").aggregate(n_nothing=F.count(F.lit(1)))
    filled = seeded.derive("bal_filled", F.coalesce(F.col("bal"), F.lit(0.0))).aggregate(
        total=F.round(F.sum("bal_filled"), 2)
    )
    return just.df.crossJoin(nothing.df).crossJoin(filled.df)


def q_text_split(spark, sf_dir):
    """splitOn / match / matchAll (Functions.hs string ops)."""
    docs = _t(spark, sf_dir, "documents").df
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_parts"),
        F.get(toks, 0).alias("first_part"),
        match(r"[a-z]*a[a-z]*", F.col("text")).alias("first_a_word"),
        F.size(match_all(r"\bspark\b", F.col("text"))).alias("n_spark"),
    )


def q_numeric_fns(spark, sf_dir):
    """relu / pow / clip / round / toDouble / zScore (the z-score is
    the DataFrame verb: one-row agg broadcast back, no global window)."""
    p = _t(spark, sf_dir, "part").z_score("p_retailprice", "z").df
    return p.select(
        "p_partkey",
        relu(F.col("p_size") - 25).cast("int").alias("relu_size"),
        F.round(F.pow(F.col("p_retailprice"), 2) / 1e6, 4).alias("price_sq_m"),
        clip(10, 40, F.col("p_size")).cast("int").alias("clipped"),
        F.round(F.col("z"), 4).alias("z"),
    )


def q_frequencies(spark, sf_dir):
    """frequencies = valueCounts with proportions (Statistics.hs)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.value_counts("o_orderstatus", normalize=True)
        .derive("proportion", F.round(F.col("proportion"), 4))
        .df
    )


def q_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube(
        ["l_returnflag", "l_linestatus"],
        n=F.count(F.lit(1)),
        avg_disc=F.round(F.avg("l_discount"), 4),
    ).df


def q_parse_defaults(spark, sf_dir):
    """Typing.hs parseDefaults: all-string frame → inferred types."""
    from ..typing import parse_defaults

    o = _t(spark, sf_dir, "orders")
    as_strings = DataFrame(
        o.df.select(
            F.col("o_orderkey").cast("string").alias("k"),
            F.col("o_totalprice").cast("string").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    typed = parse_defaults(as_strings)
    return (
        typed.group_by(["status"])
        .aggregate(
            n=F.count(F.lit(1)),
            total=F.round(F.sum("price"), 2),
            max_k=F.max("k"),
        )
        .df
    )


def q_decision_tree(spark, sf_dir):
    """Fit a decision tree (greedy gini build + TAO refinement, the
    reference fitDecisionTree pipeline) to recover the price-tier
    thresholds from (p_size, p_retailprice); output the confusion
    matrix.

    Oracle-checkable even though fitting is iterative: p_size has few
    distinct values, so exact-midpoint candidates let CART recover
    the tier rule perfectly; TAO is loss-non-increasing, so the
    confusion matrix must stay equal to the diagonal tier counts —
    which IS static SQL."""
    from ..ml import fit_decision_tree, tree_to_expr

    p = _t(spark, sf_dir, "part").df.withColumn(
        "tier",
        F.when(F.col("p_size") >= 35, "large")
        .when(F.col("p_size") >= 15, "medium")
        .otherwise("small"),
    )
    tree = fit_decision_tree(
        p, "tier", ["p_size", "p_retailprice"], max_depth=3
    )
    return (
        p.withColumn("predicted", tree_to_expr(tree))
        .groupBy("tier", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_json_extract(spark, sf_dir):
    """Semi-structured metadata: pull a typed field out of the JSON
    ``props`` column two ways — path extraction (json_get, parses
    only the requested path) and a typed struct parse (json_parse) —
    and aggregate per event type. Both are JVM expressions that
    compose into the scan; no Python, no shuffle beyond the agg."""
    from ..expr import json_get, json_parse

    ev = _t(spark, sf_dir, "events").df
    k_path = json_get("$.k", "props").cast("long")
    k_struct = json_parse("k BIGINT", "props")["k"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k_path).alias("sum_k"),
        F.round(F.avg(k_path), 4).alias("avg_k"),
        F.max(k_struct).alias("max_k"),
    )


def q_melt(spark, sf_dir):
    """Wide→long unpivot over lineitem quantity/price columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
        .melt(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount"],
            "measure",
            "val",
        )
        .group_by(["measure"])
        .aggregate(n=F.count(F.lit(1)), total=F.round(F.sum("val"), 2))
        .df
    )


def q_pivot(spark, sf_dir):
    """Long→wide: order counts per priority pivoted by status."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.pivot(
            ["o_orderpriority"],
            "o_orderstatus",
            ["F", "O", "P"],
            n=F.count(F.lit(1)),
        )
        .df
    )


QUERIES = {
    "q_melt": q_melt,
    "q_pivot": q_pivot,
    "q_decision_tree": q_decision_tree,
    "q_filter_nulls": q_filter_nulls,
    "q_text_split": q_text_split,
    "q_numeric_fns": q_numeric_fns,
    "q_frequencies": q_frequencies,
    "q_cube": q_cube,
    "q_parse_defaults": q_parse_defaults,
    "q_json_extract": q_json_extract,
}

ORACLES = {
    "q_melt": """
        SELECT measure, COUNT(*) AS n, ROUND(SUM(val), 2) AS total FROM (
          SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
          UNION ALL
          SELECT 'l_discount' AS measure, l_discount AS val FROM lineitem
        ) GROUP BY 1
    """,
    "q_pivot": """
        SELECT o_orderpriority,
          COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
          COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
          COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
        FROM orders GROUP BY 1
    """,
    "q_filter_nulls": """
        WITH seeded AS (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
          FROM customer
        )
        SELECT
          (SELECT COUNT(*) FROM seeded WHERE bal IS NOT NULL) AS n_just,
          (SELECT COUNT(*) FROM seeded WHERE bal IS NULL) AS n_nothing,
          (SELECT ROUND(SUM(COALESCE(bal, 0.0)), 2) FROM seeded) AS total
    """,
    "q_text_split": """
        SELECT doc_id,
          LEN(STRING_SPLIT(text, ' ')) AS n_parts,
          STRING_SPLIT(text, ' ')[1] AS first_part,
          NULLIF(REGEXP_EXTRACT(text, '[a-z]*a[a-z]*'), '') AS first_a_word,
          LEN(REGEXP_EXTRACT_ALL(text, '\\bspark\\b')) AS n_spark
        FROM documents
    """,
    "q_numeric_fns": """
        SELECT p_partkey,
          GREATEST(p_size - 25, 0)::INT AS relu_size,
          ROUND(POW(p_retailprice, 2) / 1e6, 4) AS price_sq_m,
          LEAST(GREATEST(p_size, 10), 40)::INT AS clipped,
          ROUND((p_retailprice - AVG(p_retailprice) OVER ())
                / STDDEV_SAMP(p_retailprice) OVER (), 4) AS z
        FROM part
    """,
    "q_frequencies": """
        SELECT o_orderstatus,
               ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders), 4) AS proportion
        FROM orders GROUP BY o_orderstatus
    """,
    "q_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_parse_defaults": """
        SELECT o_orderstatus AS status, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total,
               MAX(o_orderkey) AS max_k
        FROM orders GROUP BY 1
    """,
    # json_valid guard: Spark's get_json_object nulls malformed JSON,
    # DuckDB's json_extract_string raises — the guard keeps the
    # oracle comparable if the fixture ever gains a malformed row
    "q_json_extract": """
        WITH j AS (
          SELECT event_type,
                 CASE WHEN props IS NOT NULL AND json_valid(props)
                   THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                 END AS k
          FROM events
        )
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               ROUND(AVG(k), 4) AS avg_k,
               MAX(k) AS max_k
        FROM j GROUP BY event_type
    """,
    "q_decision_tree": """
        SELECT tier, tier AS predicted, COUNT(*) AS n FROM (
          SELECT CASE WHEN p_size >= 35 THEN 'large'
                      WHEN p_size >= 15 THEN 'medium'
                      ELSE 'small' END AS tier
          FROM part
        ) GROUP BY tier
    """,
}
