"""Similarity-search tests: cosine math, brute-force top-k, LSH
bucket behavior."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.operators import similarity
from dataframe_spark.tables import load_table


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),      # identical to 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
        (3, [-1.0, 0.0, 0.0]),     # opposite
        (4, [0.6, 0.8, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_identities(vecs):
    out = vecs.limit(1).select(
        similarity.cosine(F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(0.0))).alias("same"),
        similarity.cosine(F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(0.0), F.lit(1.0))).alias("orth"),
    ).collect()[0]
    assert out["same"] == pytest.approx(1.0)
    assert out["orth"] == pytest.approx(0.0)


def test_knn_brute_ordering(vecs):
    out = similarity.knn_brute(vecs, "vec_id", "embedding", query_id=0, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 4, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[1]["cosine"] == pytest.approx(0.6)


def test_cosine_pairs_threshold(vecs):
    pairs = similarity.cosine_pairs(vecs, "vec_id", "embedding", 0.99).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(0, 1)}


def test_knn_lsh_contains_identical(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.knn_brute(emb, "vec_id", "embedding", 0, k=10).collect()
    approx = similarity.knn_lsh(emb, "vec_id", "embedding", 0, k=10, planes=4).collect()
    assert len(approx) > 0
    # approximate result must be a subset of the corpus scored
    # identically (same cosine value for any id both return)
    bmap = {r["vec_id"]: r["cosine"] for r in brute}
    for r in approx:
        if r["vec_id"] in bmap:
            assert r["cosine"] == bmap[r["vec_id"]]


def test_knn_ivf_recall(spark, sf_dir):
    from dataframe_spark.operators.similarity import knn_brute, knn_ivf
    from dataframe_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {r["vec_id"] for r in knn_brute(emb, "vec_id", "embedding", 0, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in knn_ivf(
            emb, "vec_id", "embedding", 0, k=10, nlist=8, nprobe=4, max_iter=3
        ).collect()
    }
    assert len(approx) == 10
    # nprobe = half the lists must recover at least half the true top-k
    assert len(exact & approx) >= 5


def test_l2_normalize_and_quantize(spark):
    from dataframe_spark.operators import embeddings as E
    import math

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<float>"
    )
    from pyspark.sql import functions as F

    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            E.l2_normalize("v").alias("n"),
            E.quantize_int8("v").alias("q"),
        ).collect()
    }
    assert abs(rows[1]["n"][0] - 0.6) < 1e-9 and abs(rows[1]["n"][1] - 0.8) < 1e-9
    assert rows[1]["q"] == [95, 127]  # round(127*3/4)=95
    # zero vector -> null elements, not Inf/error
    assert rows[2]["n"] == [None, None] and rows[2]["q"] == [None, None]


def test_centroids(spark):
    from dataframe_spark.operators import embeddings as E

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [5.0, 6.0])],
        "label string, v array<float>",
    )
    out = {(r["label"], r["pos"]): r["avg_val"] for r in E.centroids(df, "label", "v").collect()}
    assert out == {("a", 0): 2.0, ("a", 1): 3.0, ("b", 0): 5.0, ("b", 1): 6.0}


def test_ivf_index_roundtrip_and_partition_pruning(spark, sf_dir, tmp_path_factory):
    """Persisted IVF index: querying the on-disk index must match the
    in-memory knn_ivf given the same probes, and the __cid filter
    must prune at the PARTITION level (scan reads nprobe dirs, not
    the corpus)."""
    from dataframe_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )
    from dataframe_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path_factory.mktemp("ivf_index"))
    build_ivf_index(emb, "vec_id", "embedding", idx, nlist=8, max_iter=3)

    qv = emb.where("vec_id = 0").first()["embedding"]
    out = query_ivf_index(
        spark, idx, qv, "vec_id", "embedding", k=10, nprobe=4
    )
    rows = out.collect()
    assert len(rows) == 10
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == 1.0  # self at top

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__cid" in plan  # partition column drives pruning
    # files actually read come from <= nprobe list dirs
    import glob

    n_dirs = len(glob.glob(idx + "/lists/__cid=*"))
    assert n_dirs >= 6  # the index fanned out into real partitions


def test_knn_lsh_multiprobe_improves_recall(spark, sf_dir):
    """Multiprobe must strictly widen the candidate set: results at
    radius r are a superset-quality answer — recall vs brute force
    is monotonically non-decreasing in the probe radius."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = {r["vec_id"] for r in similarity.knn_brute(
        emb, "vec_id", "embedding", 0, k=10).collect()}
    recalls = []
    for radius in (0, 1, 2):
        got = {r["vec_id"] for r in similarity.knn_lsh(
            emb, "vec_id", "embedding", 0, k=10, planes=4,
            probe_radius=radius).collect()}
        recalls.append(len(brute & got) / len(brute))
    assert recalls == sorted(recalls)
    assert recalls[2] >= 0.5


def test_kmeans_wide_vectors_single_digit_agg_plan(spark):
    """The r8 centroid update must survive REAL embedding widths:
    at dim=1024 the old per-dimension unroll was 1024 avg aggregate
    columns per iteration (codegen pressure and a wide one-row
    collect); the posexplode plan keeps the agg-column count
    constant in dim and must recover planted cluster centers."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, per = 1024, 40
    centers = [np.zeros(dim), np.zeros(dim)]
    centers[0][0] = 10.0
    centers[1][1] = 10.0
    rows = []
    for ci, c in enumerate(centers):
        for j in range(per):
            v = c + rng.normal(0, 0.05, dim)
            rows.append((ci * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = similarity.kmeans_fit(df, "id", "vec", k=2, max_iter=4)
    assert got.shape == (2, dim)
    # each planted center recovered by SOME centroid (order free)
    for c in centers:
        dists = np.linalg.norm(got - c, axis=1)
        assert dists.min() < 1.0
    # plan shape: the update aggregates a constant number of columns
    assigned = df.where(F.col("vec").isNotNull()).select(
        F.col("id"), F.col("vec")
    ).withColumn("__cid", F.lit(0))
    plan = (
        assigned.select("__cid", F.posexplode("vec").alias("__pos", "__x"))
        .groupBy("__cid", "__pos")
        .agg(F.avg("__x").alias("__m"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate posexplode" in plan


def test_semdedup_known_groups(spark):
    """Two duplicate groups + two isolated vectors: semdedup must
    keep exactly one per group (the min id) and every isolated row,
    regardless of how k-means splits the space — each group's
    members are EXACTLY the same direction (scaled copies), so their
    unit vectors produce identical centroid dot products and the
    argmax assignment co-clusters them under ANY centroids, not
    just this seed's."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),     # same direction as 0
        (2, [0.5, 0.0, 0.0, 0.0]),     # same direction as 0
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 3.0, 0.0, 0.0]),     # same direction as 3
        (5, [0.0, 0.0, 1.0, 0.0]),     # isolated
        (6, [0.0, 0.0, 0.0, 1.0]),     # isolated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semdedup(
        df, "vec_id", "embedding", k=2, tau=0.95, max_iter=3
    )
    got = {r["id"]: r["keep"] for r in out.collect()}
    assert len(got) == 7
    assert got[0] and not got[1] and not got[2]
    assert got[3] and not got[4]
    assert got[5] and got[6]


def test_semdedup_edge_engines_agree(spark, monkeypatch):
    """The GEMM edge path (bucket = cluster id, unrounded threshold)
    must produce the same (id, cluster, keep) rows as the expression
    join for non-degenerate data — same fit (engine-independent),
    same clusters, same edge set, same components. Random unit-ish
    vectors keep every pair's cosine far from tau, so float
    summation-order differences between GEMM and the sequential
    expression dot cannot flip an edge."""
    import random

    rng = random.Random(77)
    rows = []
    for i in range(120):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, [round(x, 3) for x in base]))
        if i % 4 == 0:  # a near-duplicate partner
            rows.append(
                (1000 + i, [round(x * 1.5, 3) for x in base])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {}
    for eng in ("jvm", "gemm"):
        monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_EDGES", eng)
        res = similarity.semdedup(
            df, "vec_id", "embedding", k=4, tau=0.9, max_iter=2
        )
        out[eng] = sorted(
            (r["id"], r["cluster"], r["keep"]) for r in res.collect()
        )
    assert out["jvm"] == out["gemm"]
    assert any(not keep for _, _, keep in out["jvm"])  # dups found


def test_semdedup_null_embedding_excluded(spark):
    rows = [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semdedup(df, "vec_id", "embedding", k=1, tau=0.9)
    got = {r["id"]: r["keep"] for r in out.collect()}
    assert set(got) == {0, 2}
    assert got[0] and not got[2]


def test_knn_ivf_null_embedding_excluded(spark):
    """A corpus row with a missing embedding must be ignored, not
    crash the assignment UDF (regression: np.stack over None)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, None),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.knn_ivf(
        df, "vec_id", "embedding", query_id=0, k=2, nlist=2, nprobe=2,
        max_iter=2,
    ).collect()
    assert [r["vec_id"] for r in out] == [2, 3]


def test_pca_recovers_planted_axes(spark):
    # rank-2 planted structure in 6-d: x = a*u + b*v + tiny noise,
    # u/v orthogonal axes; PCA must put >99% of variance on 2 comps
    import numpy as np

    from dataframe_spark.operators.embeddings import pca_fit, pca_project

    rng = np.random.RandomState(7)
    u = np.array([1.0, 0, 0, 0, 0, 0])
    v = np.array([0, 1.0, 0, 0, 0, 0])
    X = (
        np.outer(rng.randn(300) * 3.0, u)
        + np.outer(rng.randn(300), v)
        + rng.randn(300, 6) * 1e-3
    )
    rows = [(i, X[i].tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    comps, eigvals, mean, total = pca_fit(df, "embedding", k=2)
    assert eigvals[0] > eigvals[1] > 0
    assert (eigvals[0] + eigvals[1]) / total > 0.99
    # components align with the planted axes (sign-fixed)
    assert abs(abs(comps[0] @ u) - 1.0) < 1e-3
    assert abs(abs(comps[1] @ v) - 1.0) < 1e-3
    # projected variance equals the eigenvalues; comps decorrelated
    from pyspark.sql import functions as F

    proj = pca_project(df, "embedding", comps, mean, out_col="p")
    r = proj.agg(
        F.var_samp(F.element_at("p", 1)).alias("v0"),
        F.var_samp(F.element_at("p", 2)).alias("v1"),
        F.corr(F.element_at("p", 1), F.element_at("p", 2)).alias("c"),
        F.avg(F.element_at("p", 1)).alias("m0"),
    ).collect()[0]
    assert abs(r["v0"] - eigvals[0]) < 1e-6 * eigvals[0]
    assert abs(r["v1"] - eigvals[1]) < 1e-6 * max(eigvals[1], 1e-9)
    assert abs(r["c"]) < 1e-6
    assert abs(r["m0"]) < 1e-9  # centered


def test_pca_null_vectors_and_guards(spark):
    import numpy as np

    from dataframe_spark.operators.embeddings import pca_fit, pca_project

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(4).tolist()) for i in range(50)] + [
        (100, None),
        (101, None),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    comps, eigvals, mean, total = pca_fit(df, "embedding", k=4)
    assert comps.shape == (4, 4)
    out = pca_project(df, "embedding", comps, mean, out_col="p")
    got = {r["id"]: r["p"] for r in out.collect()}
    assert len(got) == 52  # null-vec rows survive projection...
    assert got[100] is None or all(x is None for x in got[100])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pca_fit(df, "embedding", k=9)  # k > dim
    with _pytest.raises(ValueError):
        pca_fit(df.where("id < 0"), "embedding", k=2)  # no vectors


def test_pca_whitening_unit_variance(spark):
    import numpy as np

    from dataframe_spark.operators.embeddings import pca_fit, pca_project
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    X = rng.randn(400, 5) * np.array([4.0, 2.0, 1.0, 0.5, 0.25])
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(400)],
        "id long, embedding array<double>",
    )
    comps, ev, mean, _ = pca_fit(df, "embedding", k=3)
    proj = pca_project(
        df, "embedding", comps, mean, out_col="p", whiten=True, eigvals=ev
    )
    r = proj.agg(
        *[F.var_samp(F.element_at("p", i + 1)).alias(f"v{i}") for i in range(3)]
    ).collect()[0]
    for i in range(3):
        assert abs(r[f"v{i}"] - 1.0) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pca_project(df, "embedding", comps, mean, whiten=True)
    with _pytest.raises(ValueError):
        pca_project(df, "embedding", comps, mean, whiten=True, eigvals=ev[:2])


def test_hyperplane_sketch_degenerate_vectors_null_bucket(spark):
    """dim=None must NULL the bucket for empty / null-element
    vectors instead of pooling them in bucket 0 (the r5 silent-
    collapse failure, re-introduced by the r8 per-row sizing and
    fixed in r9)."""
    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, []),                    # empty
        (2, [1.0, None, 3.0]),      # null-poisoned
        (3, None),                  # null vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = df.select(
        "vec_id",
        similarity.hyperplane_sketch(F.col("embedding"), planes=4).alias("b"),
    ).collect()
    by_id = {r["vec_id"]: r["b"] for r in out}
    assert by_id[0] is not None
    assert by_id[1] is None
    assert by_id[2] is None
    assert by_id[3] is None
    # fixed-width corpora keep their historic buckets: explicit dim
    # agrees with per-row sizing on well-formed vectors
    ref = df.where("vec_id = 0").select(
        similarity.hyperplane_sketch(F.col("embedding"), planes=4, dim=3).alias("b")
    ).collect()[0]["b"]
    assert by_id[0] == ref


def test_hierarchical_kmeans_semdedup_contract(spark):
    """Two-level codebook (k > HIER_KMEANS_MIN_K): valid partition —
    every non-null row appears exactly once; every drop is justified
    by a same-cluster neighbor at cosine >= tau; kept rows in one
    cluster are pairwise below tau (the q_semdedup_check invariants,
    which hold for ANY clustering); and the fit is deterministic."""
    import numpy as np

    rows = []
    rng = np.random.RandomState(7)
    for i in range(600):
        center = rng.RandomState if False else None
        base = np.zeros(16)
        base[i % 8] = 1.0
        noise = rng.rand(16) * 0.05
        rows.append((i, (base + noise).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.semdedup(
        df, "vec_id", "embedding", k=100, tau=0.95, max_iter=2
    ).collect()
    assert len(out) == 600
    assert len({r["id"] for r in out}) == 600
    dropped = [r for r in out if not r["keep"]]
    assert dropped  # near-identical basis groups must dedup
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    vecs = {i: np.asarray(v) for i, v in rows}

    def cos(a, b):
        return float(
            vecs[a] @ vecs[b]
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )

    for cl, members in by_cluster.items():
        kept = [r["id"] for r in members if r["keep"]]
        ids = [r["id"] for r in members]
        for r in members:
            if not r["keep"]:
                assert any(
                    cos(r["id"], o) >= 0.95 - 1e-9 for o in ids if o != r["id"]
                ), (cl, r["id"])
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                assert cos(a, b) < 0.95 + 1e-9, (cl, a, b)
    # determinism: the same call returns the same clusters
    out2 = similarity.semdedup(
        df, "vec_id", "embedding", k=100, tau=0.95, max_iter=2
    ).collect()
    assert sorted((r["id"], r["cluster"], r["keep"]) for r in out) == sorted(
        (r["id"], r["cluster"], r["keep"]) for r in out2
    )


def test_bucketed_cosine_pairs_matches_global_within_buckets(spark):
    """Per-bucket GEMM pairs == the bucket-filtered subset of the
    global exact pairs, including across GEMM row-block boundaries
    (block_rows=3 forces multi-tile buckets)."""
    import random

    from dataframe_spark.operators import similarity as S

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in S.bucketed_cosine_pairs(
            df, "vec_id", "embedding", "label", threshold=0.2, block_rows=3
        ).collect()
    }
    label = {i: i % 3 for i in range(40)}
    want = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in S.cosine_pairs(
            df, "vec_id", "embedding", threshold=0.2
        ).collect()
        if label[r["a_id"]] == label[r["b_id"]]
    }
    assert got == want and len(want) > 10
    import pytest

    with pytest.raises(TypeError):
        S.bucketed_cosine_pairs(
            df.withColumn("sid", df.vec_id.cast("string")),
            "sid", "embedding", "label",
        )


def test_bucketed_cosine_pairs_null_buckets_dropped(spark):
    """NULL bucket values must not pool into a phantom bucket
    (ADVICE r10 #1): the contract is a bucket-key equijoin, and
    equijoins never match NULL = NULL."""
    from dataframe_spark.operators import similarity as S

    rows = [
        (1, [1.0, 0.0], "x"),
        (2, [1.0, 0.0], "x"),
        (3, [1.0, 0.0], None),
        (4, [1.0, 0.0], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in S.bucketed_cosine_pairs(
            df, "vec_id", "embedding", "label", threshold=0.5
        ).collect()
    )
    assert got == [(1, 2)]  # the two null-label rows never pair


def test_bucketed_cosine_pairs_mega_bucket_split(spark):
    """A bucket past max_bucket_rows splits into sub-block tile
    pairs (ADVICE r10 #2); result identical to the single-task
    shape, each unordered pair exactly once."""
    import random

    from dataframe_spark.operators import similarity as S

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 2)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    whole = S.bucketed_cosine_pairs(
        df, "vec_id", "embedding", "label", threshold=0.2
    ).collect()
    split = S.bucketed_cosine_pairs(
        df, "vec_id", "embedding", "label", threshold=0.2,
        block_rows=3, max_bucket_rows=7,
    ).collect()
    key = lambda r: (r["a_id"], r["b_id"], r["cosine"])
    ws, ss = sorted(map(key, whole)), sorted(map(key, split))
    assert ws == ss and len(ws) > 20
    assert len(set(ws)) == len(ws)  # no pair emitted twice
