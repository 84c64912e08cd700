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


def q_source_overlap(spark, sf_dir):
    """Cross-source 3-gram overlap matrix (operators/dedup.py
    source_overlap): shared distinct shingles per source pair."""
    from ..operators.dedup import source_overlap

    docs = _t(spark, sf_dir, "documents").df
    return source_overlap(docs, "source", "text", n=3)


QUERIES = {
    "q_winsorize": q_winsorize,
    "q_sample_group": q_sample_group,
    "q_source_overlap": q_source_overlap,
}

ORACLES = {
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
