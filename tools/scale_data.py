"""Deterministic 10x scale-up of the sf0.1 test tables, for the
bench's scaling check (no driver-provided sf1 data exists).

Only the tables the scaling queries touch are generated:

- ``lineitem``: 10 copies with ``l_orderkey`` offset per copy —
  same group-by cardinality, 10x the rows.
- ``documents``: 10 copies with ``doc_id`` offset and every TOKEN
  prefixed with a copy tag. Prefixing each token makes every shingle
  copy-unique, so cross-copy similarity is exactly zero while the
  within-copy near-dup structure is preserved verbatim — a corpus
  10x the size whose true duplicate-pair count is exactly 10x,
  which is what makes wall-clock scaling interpretable for the
  dedup pipeline.

Output is partitioned parquet (one dir per table) under the target
dir, written once and reused across runs.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COPIES = 10


def generate(spark: SparkSession, src_dir: str, out_dir: str) -> None:
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    li_big = li.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c")
    ).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__c") * F.lit(max_ok)
    ).drop("__c")
    li_big.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    # trim + drop empty tokens BEFORE tagging: splitting untrimmed
    # text yields '' tokens whose tags ('c0_') would be shared across
    # every doc of a copy, silently breaking the exactly-10x
    # pair-count invariant
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    tagged = F.array_join(
        F.transform(
            toks,
            lambda t: F.concat(F.lit("c"), F.col("__c").cast("string"),
                               F.lit("_"), t),
        ),
        " ",
    )
    docs_big = (
        docs.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c")
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__c") * F.lit(max_id))
        .withColumn("text", tagged)
        .drop("__c")
    )
    docs_big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def ensure(spark: SparkSession, src_dir: str, out_dir: str) -> bool:
    """Generate once; True if the scaled tables are available."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return True
    try:
        os.makedirs(out_dir, exist_ok=True)
        generate(spark, src_dir, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
        return True
    except Exception as e:  # scaling check is best-effort
        print(f"scale_data: generation failed: {e}", file=sys.stderr)
        return False


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    from dataframe_spark.session import get_spark

    spark = get_spark("scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    ensure(spark, src, out)
