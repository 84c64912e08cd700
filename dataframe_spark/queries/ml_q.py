"""ML-adjacent queries: mutual information (oracle-checked) and
beam-search feature synthesis (rows-only — iterative algorithm).

Reference: Statistics.hs:209 mutualInformationBinned, Synthesis.hs:349
beamSearch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml.synthesis import BeamConfig, beam_search, mutual_information
from ..tables import load_table


def q_mutual_info(spark, sf_dir):
    """MI(l_quantity; l_extendedprice) in bits, equi-width binned with
    k = max(10, ceil(sqrt(n))) bins per axis. Fully distributed: one
    stats pass, one k²-bounded groupBy, window marginals, final sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return mutual_information(li, "l_quantity", "l_extendedprice")


# The oracle mirrors the Spark plan's floating-point evaluation ORDER
# (k * ((v-lo)/(hi-lo)), not (k*(v-lo))/(hi-lo)) so bin boundaries
# agree bit-for-bit between engines.
_MI_ORACLE = """
WITH src AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), stats AS (
  SELECT MIN(x) AS xmin, MAX(x) AS xmax,
         MIN(y) AS ymin, MAX(y) AS ymax,
         COUNT(*) AS n,
         GREATEST(10, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k
  FROM src
), binned AS (
  SELECT
    CASE WHEN xmax = xmin THEN 0
         ELSE GREATEST(0, LEAST(k - 1,
              CAST(FLOOR(CAST(k AS DOUBLE) * ((x - xmin) / (xmax - xmin))) AS BIGINT)))
    END AS bx,
    CASE WHEN ymax = ymin THEN 0
         ELSE GREATEST(0, LEAST(k - 1,
              CAST(FLOOR(CAST(k AS DOUBLE) * ((y - ymin) / (ymax - ymin))) AS BIGINT)))
    END AS by,
    n
  FROM src, stats
), joint AS (
  SELECT bx, by, COUNT(*) AS cxy, MAX(n) AS n
  FROM binned GROUP BY bx, by
), m AS (
  SELECT cxy, n,
         SUM(cxy) OVER (PARTITION BY bx) AS cx,
         SUM(cxy) OVER (PARTITION BY by) AS cy
  FROM joint
)
SELECT ROUND(SUM((cxy * 1.0 / n)
             * LOG2((cxy * 1.0 / n) / ((cx * 1.0 / n) * (cy * 1.0 / n)))), 4) AS mi
FROM m
"""


def q_synthesis(spark, sf_dir):
    """Beam-search synthesis over (l_quantity, l_extendedprice,
    l_tax) predicting the planted target l_quantity*l_extendedprice
    (gross value); depth-2 search must recover the product exactly
    (squared-Pearson score ≈ 1). Whole beam scored per round in
    chunked single-pass aggs; rows-only (iterative, not
    SQL-expressible)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_extendedprice",
        "l_tax",
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("gross"),
    )
    cfg = BeamConfig(search_depth=2, beam_length=8, max_candidates=300)
    res = beam_search(li, "gross", cfg)
    rows = (
        []
        if res is None
        else [(res.key, round(res.score, 4))]
    )
    return spark.createDataFrame(rows, "expr string, score double")


QUERIES = {
    "q_mutual_info": q_mutual_info,
    "q_synthesis": q_synthesis,
}

ORACLES = {
    "q_mutual_info": _MI_ORACLE,
}
