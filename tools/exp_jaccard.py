"""Stage-level timing for jaccard_pairs at sf0.1: materialize each
successive subplan through the noop sink to localize the wall."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "documents,embeddings,lineitem")

from pyspark.sql import functions as F

from dataframe_spark.operators.dedup import (
    _hash_arrays,
    _reusable,
    _verify_jaccard,
    jaccard_pairs,
    shingle_arrays,
)
from dataframe_spark.session import get_spark
from dataframe_spark.tables import load_table, warm_cache

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("expj", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
warm_cache(spark, sf_dir)
docs = load_table(spark, sf_dir, "documents")


def t(name, df, n=3):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: {best:.3f}")


threshold = 0.8
arrs = _reusable(_hash_arrays(shingle_arrays(docs, "doc_id", "text", 3)))
t("A_arrs(shingle+hash, persisted)", arrs)
exploded = arrs.select("id", "n_sh", F.explode("sh_arr").alias("shingle"))
dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") >= 2)
t("B_dfreq", dfreq)
rep = exploded.join(F.broadcast(dfreq), "shingle")
per_doc = rep.groupBy("id", "n_sh").agg(
    F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("__reps")
)
t("C_per_doc_reps", per_doc)
prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
n1 = F.col("n_sh") - F.size("__reps")
k = (prefix_len - n1).cast("int")
prefix = per_doc.select(
    "id", "n_sh", n1.alias("__n1"),
    F.posexplode(F.slice("__reps", F.lit(1), F.greatest(k, F.lit(0)))),
).select(
    "id", F.col("col.shingle").alias("shingle"), "n_sh",
    (F.col("__n1") + F.col("pos") + 1).alias("pos"),
)
a = prefix.select(F.col("id").alias("a_id"), "shingle", F.col("n_sh").alias("__na"), F.col("pos").alias("__pa"))
b = prefix.select(F.col("id").alias("b_id"), "shingle", F.col("n_sh").alias("__nb"), F.col("pos").alias("__pb"))
alpha = F.ceil(F.lit(threshold / 1.8) * (F.col("__na") + F.col("__nb")))
overlap_ub = F.least(F.col("__na") - F.col("__pa"), F.col("__nb") - F.col("__pb")) + 1
cands = (
    a.join(b, "shingle")
    .where(
        (F.col("a_id") < F.col("b_id"))
        & (F.least("__na", "__nb") >= F.lit(threshold) * F.greatest("__na", "__nb"))
        & (overlap_ub >= alpha)
    )
    .select("a_id", "b_id")
    .distinct()
)
t("D_candidates", cands)
t("E_full(jaccard_pairs)", jaccard_pairs(docs, "doc_id", "text", 3, 0.8))
print("n_cands:", cands.count(), "n_docs:", arrs.count())
