"""Stage-level timing for the r10 hash-order jaccard_pairs at the
1000x cert corpus: materialize each successive subplan cold (cache
cleared) to localize the top-decade wall, plus persist-strategy
variants for the shared hashed-shingle-array cache."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

from pyspark import StorageLevel
from pyspark.sql import functions as F

import dataframe_spark.operators.dedup as dd
from dataframe_spark.session import get_spark
from dataframe_spark.tables import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf100"
spark = get_spark("expj1000")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, sf_dir, "documents")


def t(name, build, n=1):
    best = None
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: {best:.1f}", flush=True)


def arrs_build():
    return dd._hash_arrays(dd.shingle_arrays(docs, "doc_id", "text", 3))


# A: one cold pass of the scan+shingle+hash chain, NO persist
if not os.environ.get("SKIP_AB"):
    t("A_chain_nopersist", arrs_build)

# B: persist cost + one read (build cache then count-materialize)
for lvl_name, lvl in () if os.environ.get("SKIP_AB") else (
    ("MEMORY_AND_DISK", StorageLevel.MEMORY_AND_DISK),
    ("MEMORY_AND_DISK_SER", StorageLevel(True, True, False, False, 1)),
    ("DISK_ONLY", StorageLevel.DISK_ONLY),
):
    def build(lvl=lvl):
        a = arrs_build().persist(lvl)
        return a

    spark.catalog.clearCache()
    t0 = time.monotonic()
    a = arrs_build().persist(lvl)
    a.write.format("noop").mode("overwrite").save()
    el1 = time.monotonic() - t0
    t0 = time.monotonic()
    a.write.format("noop").mode("overwrite").save()
    el2 = time.monotonic() - t0
    print(f"B_persist_{lvl_name}: build+write {el1:.1f}, re-read {el2:.1f}",
          flush=True)
    spark.catalog.clearCache()

# C: full pipeline stages under the default path
spark.catalog.clearCache()
t0 = time.monotonic()
arrs = dd.hashed_shingle_arrays(docs, "doc_id", "text", 3)
arrs.write.format("noop").mode("overwrite").save()
print(f"C1_arrs_persisted: {time.monotonic()-t0:.1f}", flush=True)

t0 = time.monotonic()
prefix = dd._hash_order_prefix(arrs, docs, "doc_id", "text", 3, 0.8, None)
prefix.write.format("noop").mode("overwrite").save()
print(f"C2_prefix (warm arrs): {time.monotonic()-t0:.1f}", flush=True)

t0 = time.monotonic()
cands = dd._prefix_candidates(prefix, 0.8)
cands.write.format("noop").mode("overwrite").save()
print(f"C3_candidates (warm prefix): {time.monotonic()-t0:.1f}", flush=True)

t0 = time.monotonic()
out = dd._verify_jaccard(cands, arrs, 0.8)
out.write.format("noop").mode("overwrite").save()
print(f"C4_verify (warm all): {time.monotonic()-t0:.1f}", flush=True)

n_pref = prefix.count()
n_cands = cands.count()
n_docs = arrs.count()
print(f"counts: docs={n_docs} prefix_rows={n_pref} cands={n_cands}",
      flush=True)
