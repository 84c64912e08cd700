"""Deterministic 10x scale-up of the sf0.1 test tables, for the
bench's scaling check (no driver-provided sf1 data exists).

FACT tables are replicated 10x with structure preserved:

- ``lineitem`` + ``orders``: 10 copies with the order key offset per
  copy, using ONE shared base (max over both tables) so the
  lineitem↔orders join stays consistent across copies. Dim keys
  (custkey/suppkey/partkey) are kept, so each dim row simply serves
  10x the fact rows — the usual facts-grow-faster shape.
- ``events``: 10 copies with ``event_id`` AND ``user_id`` offset per
  copy — 10x users, each with the original event/session structure.
- ``documents``: 10 copies with ``doc_id`` offset and every TOKEN
  prefixed with a copy tag. Prefixing each token makes every shingle
  copy-unique, so cross-copy similarity is exactly zero while the
  within-copy near-dup structure is preserved verbatim — a corpus
  10x the size whose true duplicate-pair count is exactly 10x,
  which is what makes wall-clock scaling interpretable for the
  dedup pipeline. When the SOURCE is itself a scaled dir (chaining
  10x -> 100x -> 1000x), the existing tag is FOLDED into one
  (``c9_tok`` + copy 7 -> ``c97_tok``) instead of stacked
  (``c7_c9_tok``): v4's stacked tags grew text bytes ~40% per decade
  on a 4.5-char mean token, which inflated every per-byte operator's
  measured decade factor (q_token_count read 14.5x for genuinely
  linear work). Folding keeps bytes-per-token near-constant (one
  digit added per decade, ~12%) so wall factors reflect the
  operators, not the generator.

DIMENSION tables (region/nation/customer/supplier/part) are linked
unscaled.

``embeddings`` (r8) is SYNTHESIZED at 10x rows and dim 256 instead
of replicated or linked: replication can't work for vectors — any
in-row perturbation cheap enough to run here leaves cross-copy
cosines ~N(0, 1/sqrt(dim)), which at the source's dim=64 puts
~0.07% of all cross-copy pairs above the 0.4 near-dup threshold,
corrupting every pair-count invariant. The synthetic corpus is
fully deterministic (xxhash64-derived components, no RNG state):
vec(id) = ALPHA·center(label(id)) + noise(id), component-wise
uniform in [-1, 1), which makes expected within-cluster cosine
ALPHA²/(ALPHA²+1) ≈ 0.55 (above the 0.4 near-dup threshold) and
cross-cluster cosine ~N(0, 1/sqrt(256)) (P(>0.4) ≈ 1e-10, i.e.
zero cross-cluster noise pairs). Cluster count scales with the
corpus (target mean cluster size EMB_CLUSTER_SIZE), so
within-cluster pair work grows LINEARLY in rows — the regime the
SemDeDup paper prescribes (k ∝ corpus) and the one worth
measuring. Chaining 10x → 100x re-synthesizes at 10x the rows
with the same dim and the same per-id determinism.

Output is parquet (one dir per table) plus symlinks under the
target dir, written once and reused across runs.
"""

from __future__ import annotations

import glob
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COPIES = 10
LINKED_TABLES = ("region", "nation", "customer", "supplier", "part")

# synthetic embedding corpus shape (see module docstring)
EMB_DIM = 256
EMB_CLUSTER_SIZE = 256  # target mean cluster size; k scales with n
EMB_ALPHA = 1.1  # within-cluster cosine ≈ α²/(α²+1) ≈ 0.55


def _copies(df):
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c")
    )


def generate(spark: SparkSession, src_dir: str, out_dir: str) -> None:
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{src_dir}/orders.parquet")
    # one shared base keeps the lineitem<->orders join consistent
    max_ok = max(
        li.agg(F.max("l_orderkey")).first()[0],
        orders.agg(F.max("o_orderkey")).first()[0],
    ) + 1
    li_big = _copies(li).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__c") * F.lit(max_ok)
    ).drop("__c")
    li_big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    o_big = _copies(orders).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__c") * F.lit(max_ok)
    ).drop("__c")
    o_big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    # events.parquet carries TIMESTAMP(NANOS) — a raw read fails on
    # a fresh session; _load_raw sets the legacy conf and rebuilds ts
    from dataframe_spark.tables import _load_raw

    ev = _load_raw(spark, src_dir, "events")
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    max_user = ev.agg(F.max("user_id")).first()[0] + 1
    ev_big = (
        _copies(ev)
        .withColumn("event_id", F.col("event_id") + F.col("__c") * F.lit(max_ev))
        .withColumn("user_id", F.col("user_id") + F.col("__c") * F.lit(max_user))
        .drop("__c")
    )
    ev_big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    # trim + drop empty tokens BEFORE tagging: splitting untrimmed
    # text yields '' tokens whose tags ('c0_') would be shared across
    # every doc of a copy, silently breaking the exactly-10x
    # pair-count invariant
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    # fold an existing copy tag when chaining from a scaled dir (see
    # module docstring); gated on the src marker, NOT the token shape,
    # so an original-corpus token that happens to look like a tag can
    # never be folded (uniqueness would break). folded id old*10+c is
    # injective over (old, copy), so cross-copy shingle overlap stays
    # exactly zero at every decade.
    fold = bool(glob.glob(os.path.join(src_dir, "_DONE_*")))

    def _tag(t):
        fresh = F.concat(
            F.lit("c"), F.col("__c").cast("string"), F.lit("_"), t
        )
        if not fold:
            return fresh
        old = F.regexp_extract(t, r"^c([0-9]+)_(.*)$", 1)
        rest = F.regexp_extract(t, r"^c([0-9]+)_(.*)$", 2)
        folded = F.concat(
            F.lit("c"),
            (old.cast("long") * F.lit(COPIES) + F.col("__c")).cast("string"),
            F.lit("_"), rest,
        )
        return F.when(old != F.lit(""), folded).otherwise(fresh)

    tagged = F.array_join(F.transform(toks, _tag), " ")
    docs_big = (
        _copies(docs)
        .withColumn("doc_id", F.col("doc_id") + F.col("__c") * F.lit(max_id))
        .withColumn("text", tagged)
        .drop("__c")
    )
    docs_big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    _synth_embeddings(spark, src_dir, out_dir)

    for t in LINKED_TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        # islink, not exists: exists() is False for a broken link and
        # would re-symlink into FileExistsError forever; abspath so a
        # relative src_dir can't create broken links in the first place
        if not (os.path.islink(dst) or os.path.exists(dst)):
            os.symlink(
                os.path.abspath(os.path.join(src_dir, f"{t}.parquet")), dst
            )


def _unif(*cols):
    """Deterministic uniform in [-1, 1) from xxhash64 of ``cols`` —
    in-row, engine-native, no RNG state to thread."""
    h = F.xxhash64(*cols)
    return (
        F.pmod(h, F.lit(1 << 20)).cast("double") / F.lit(float(1 << 19))
    ) - F.lit(1.0)


def _synth_embeddings(spark: SparkSession, src_dir: str, out_dir: str):
    """Deterministic 10x embedding corpus at dim EMB_DIM with
    planted clusters (module docstring). Everything is in-row
    expression work over spark.range — the generator itself scales
    to any decade."""
    # a pre-v3 dir linked embeddings to the READ-ONLY source; an
    # overwrite through the symlink would try to write there
    dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.islink(dst):
        os.unlink(dst)
    n_src = spark.read.parquet(f"{src_dir}/embeddings.parquet").count()
    n_out = n_src * COPIES
    n_clusters = max(64, n_out // EMB_CLUSTER_SIZE)
    dims = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    label = F.pmod(
        F.xxhash64(F.col("vec_id"), F.lit(11)), F.lit(n_clusters)
    ).cast("int")
    out = (
        spark.range(n_out)
        .withColumnRenamed("id", "vec_id")
        .withColumn("label", label)
        .withColumn(
            "embedding",
            F.transform(
                dims,
                lambda j: (
                    F.lit(EMB_ALPHA) * _unif(F.col("label"), j, F.lit(3))
                    + _unif(F.col("vec_id"), j, F.lit(7))
                ).cast("float"),
            ),
        )
        .select("vec_id", "embedding", "label")
    )
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def ensure(spark: SparkSession, src_dir: str, out_dir: str) -> bool:
    """Generate once; True if the scaled tables are available.

    The marker is versioned: v2 added scaled orders/events and the
    linked dim tables; v3 (r8) replaced the unscaled-embeddings
    symlink with the synthetic clustered corpus; v4 (r9) repartitions
    every fact table before writing — the v3 writer inherited the
    source's partitioning, so the 100x lineitem came out as ONE
    single-task 350 MB file with 3 row groups, a layout no
    multi-executor writer produces (it also hid 90% of the cores
    from every scan until the effective_scan_partitions fix). Older
    dirs regenerate in place. v5 (r9) folds chained copy tags so
    text bytes stay near-constant per decade (module docstring)."""
    marker = os.path.join(out_dir, "_DONE_v5")
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
