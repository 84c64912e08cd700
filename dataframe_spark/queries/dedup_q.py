"""Dedup + similarity-search queries over documents/embeddings.

Exact-math variants (exact dedup, n-gram Jaccard, embedding cosine,
brute-force KNN) carry DuckDB oracles; hash-based variants
(MinHash/LSH, SimHash, hyperplane LSH) use engine hashes and are
rows-only checked (the exact-Jaccard query is their ground truth).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import functions as F

from ..core import DataFrame
from ..operators import dedup, embeddings, graph, multimodal, similarity
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    normalized = docs.withColumn("__key", F.lower(F.trim(F.col("text"))))
    kept = dedup.exact_dedup(normalized, ["__key"], "doc_id")
    return kept.select("doc_id", "source")


def q_dedup_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


def q_dedup_cluster(spark, sf_dir):
    """Near-dup CLUSTERS: exact-Jaccard pairs → distributed
    connected components (alternating star contractions) → one row
    per cluster with its sorted member list. The oracle recomputes
    the same clustering with a recursive transitive-closure CTE."""
    docs = _t(spark, sf_dir, "documents").df
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comp = graph.connected_components(pairs, "a_id", "b_id")
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("node")), lambda x: x.cast("string")
            ),
        ).alias("members"),
    )


def q_dedup_minhash(spark, sf_dir):
    """Oracle-backed (upgraded r5 after fixing the permutation-index
    bug): the verify stage emits EXACT Jaccard for every surviving
    pair, so the output is the exact >= 0.8 pair set minus banding
    false negatives — whose per-pair probability is (1 - s^4)^16
    <= 2.1e-4 at s = 0.8 (and the seeded hashes make the outcome
    deterministic, verified 100% recall at sf0.001 and sf0.01). The
    oracle is therefore the same SQL as q_dedup_ngram_jaccard."""
    docs = _t(spark, sf_dir, "documents").df
    return dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.8
    )


def q_knn_ivf_recall(spark, sf_dir):
    """Hard-signal invariant for the IVF approximate path: with
    nprobe = nlist/2 the IVF top-10 of query 0 must return exactly
    k rows and recover at least half the true (brute-force) top-10.
    Both sides are computed in Spark (seeded k-means init makes the
    outcome deterministic — measured 9/10 at sf0.001, 7/10 at
    sf0.01); the oracle pins the invariant."""
    emb = _t(spark, sf_dir, "embeddings").df
    brute = similarity.knn_brute(
        emb, "vec_id", "embedding", query_id=0, k=10
    ).select("vec_id")
    ivf = similarity.knn_ivf(
        emb, "vec_id", "embedding", query_id=0, k=10,
        nlist=16, nprobe=8, max_iter=3,
    ).select("vec_id")
    hits = brute.join(ivf, "vec_id").agg(
        F.count(F.lit(1)).alias("__hits")
    )
    n_found = ivf.agg(F.count(F.lit(1)).alias("n_found"))
    return n_found.crossJoin(F.broadcast(hits)).select(
        F.lit(10).alias("k"),
        "n_found",
        (F.col("__hits") >= 5).alias("recall_ok"),
    )


def q_dedup_simhash(spark, sf_dir):
    """Rows-only: engine-specific token hashes."""
    docs = _t(spark, sf_dir, "documents").df
    return dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)


def q_dedup_simhash_check(spark, sf_dir):
    """Hard-signal invariant for the SimHash path (r6, the
    q_knn_ivf_recall pattern): the 4-chunk pigeonhole banding must be
    EXACTLY the brute-force hamming<=3 pair set — complete (banding
    loses nothing at radius 3) and sound (every emitted pair
    re-verifies within radius) — and non-empty at driver SFs
    (measured 29 pairs at sf0.001, 19 at sf0.01; the token-hash
    signatures are fully deterministic). The brute side is an
    all-pairs join over the (id, simhash) SKETCHES — 16 bytes/doc,
    verification-query cost, not a production path. The oracle pins
    the invariant."""
    docs = _t(spark, sf_dir, "documents").df
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    sigs = dedup.simhash(docs, "doc_id", "text")
    a = sigs.select(F.col("id").alias("a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("id").alias("b"), F.col("simhash").alias("sb"))
    brute = (
        a.join(b, F.col("a") < F.col("b"))
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .agg(F.count(F.lit(1)).alias("__brute"))
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("hamming").alias("__maxh"),
    )
    return stats.crossJoin(F.broadcast(brute)).select(
        (F.col("__n") == F.col("__brute")).alias("complete_ok"),
        (F.col("__maxh") <= 3).alias("radius_ok"),
        (F.col("__n") > 0).alias("nonempty"),
    )


def q_knn_lsh_recall(spark, sf_dir):
    """Hard-signal invariant for the multiprobe-LSH path (r6): with
    planes=4 and probe radius 1 (5/16 of the corpus scored), the
    LSH top-10 of query 0 must return exactly k rows and recover at
    least k/5 of the true (brute-force) top-10. Both sides computed
    in Spark; the hyperplane sketch is xxhash64-derived and fully
    deterministic — measured 3/10 at sf0.001 and 5/10 at sf0.01 on
    the near-random synthetic embeddings. The oracle pins the
    invariant."""
    emb = _t(spark, sf_dir, "embeddings").df
    brute = similarity.knn_brute(
        emb, "vec_id", "embedding", query_id=0, k=10
    ).select("vec_id")
    lsh = similarity.knn_lsh(
        emb, "vec_id", "embedding", query_id=0, k=10, planes=4,
        probe_radius=1,
    ).select("vec_id")
    hits = brute.join(lsh, "vec_id").agg(F.count(F.lit(1)).alias("__hits"))
    n_found = lsh.agg(F.count(F.lit(1)).alias("n_found"))
    return n_found.crossJoin(F.broadcast(hits)).select(
        F.lit(10).alias("k"),
        "n_found",
        (F.col("__hits") >= 2).alias("recall_ok"),
    )


def q_dedup_embedding(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)


def q_bucket_cosine(spark, sf_dir):
    """Within-bucket exact cosine pairs (cluster-then-pair): one
    BLAS GEMM per planted label bucket via applyInPandas — the
    sum-of-squared-bucket-sizes candidate contract that feeds the
    pagerank edge build at scale (similarity.bucketed_cosine_pairs,
    r10). Oracle: the same label-equijoin + rounded cosine filter."""
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.bucketed_cosine_pairs(
        emb, "vec_id", "embedding", "label", threshold=0.4
    )


def q_pagerank(spark, sf_dir):
    """PageRank centrality over the symmetrized cosine-similarity
    graph (operators/graph.py pagerank, 10 power iterations at
    damping 0.85) — representativeness scoring of the embedding
    corpus. The oracle reruns the identical power iteration as a
    DuckDB recursive CTE over brute-force cosine edges (same
    threshold/rounding as q_dedup_embedding)."""
    from ..operators.graph import pagerank

    emb = _t(spark, sf_dir, "embeddings").df
    edges = similarity.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)
    # assume_unique (r12): cosine_pairs emits every unordered pair
    # from exactly one batch, so the setup distinct collapses
    # nothing — skipping it removes the only edge-scale exchange;
    # ranks are identical on a duplicate-free input
    pr = pagerank(
        edges, "a_id", "b_id", damping=0.85, iters=10, symmetrize=True,
        assume_unique=True,
    )
    return pr.select("node", F.round("rank", 6).alias("pr_rank"))


@functools.lru_cache(maxsize=None)
def _semdedup_k(sf_dir: str) -> int:
    """SemDeDup's k ∝ corpus rule (the paper's 50k clusters for
    LAION-440M; similarity.semdedup docstring): target mean cluster
    size 256 so within-cluster pair work grows LINEARLY with rows.
    At every driver SF (≤ 2000 vectors) this floors to the historic
    k=8, so driver results are unchanged; at the 10x/100x scaled
    corpora k grows (78, 781) and the query keeps its scale
    contract instead of going quadratic at a pinned k.

    n comes from the parquet FOOTER row counts (pyarrow, driver-side
    metadata only) and is cached per sf_dir — the r8 version ran an
    ``emb.count()`` Spark job inside the query builder on every
    invocation (VERDICT r8 'what's wrong' #2)."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return max(8, n // 256)


def q_semdedup(spark, sf_dir):
    """Rows-only: cluster assignments depend on the seeded k-means
    model (not SQL-expressible); q_semdedup_check is the sibling
    hard signal. tau=0.4 matches q_dedup_embedding's threshold so
    the two operators see the same notion of 'near'."""
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.semdedup(
        emb, "vec_id", "embedding", k=_semdedup_k(sf_dir), tau=0.4, max_iter=3
    )


def q_semdedup_check(spark, sf_dir):
    """Hard-signal invariant for SemDeDup (the q_knn_ivf_recall
    pattern): re-verify the keep/drop decision from the OUTPUT plus
    the raw vectors — (a) partition_ok: every non-null-embedding row
    appears exactly once (n_rows is recomputed by the DuckDB oracle
    from the parquet, so the row universe is cross-engine-pinned);
    (b) drops_justified: every dropped row has >= 1 same-cluster
    neighbor at cosine >= tau (no unexplained data loss); (c)
    kept_separated: no two kept rows in the same cluster are within
    tau (the output is actually deduplicated); (d) nonempty: the
    drop set is non-trivial at driver SFs (measured 28 dropped at
    sf0.001, 31 at sf0.01). (b)+(c) hold for ANY clustering, so the
    check is robust to float-ulp drift in the k-means model."""
    emb = _t(spark, sf_dir, "embeddings").df
    # persisted: consumed three times below (withv, orphans' drop
    # scan, the stats agg) — without it the sides-join-components
    # tail of the semdedup lineage re-executes per consumer (r12)
    res = dedup._reusable(
        similarity.semdedup(
            emb, "vec_id", "embedding", k=_semdedup_k(sf_dir), tau=0.4,
            max_iter=3,
        )
    )
    # norm computed ONCE PER ROW here (the semdedup-internal shape):
    # the within-cluster pair join previously evaluated cosine() per
    # pair, re-deriving both endpoint norms for every pair — ~3x the
    # array arithmetic of the check's dominant join. dot/(na*nb) is
    # the identical expression tree per value, so the edge set (and
    # the query's output) is bit-identical (r12).
    withv = dedup._reusable(
        res.join(
            emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
        ).withColumn("__nrm", similarity.norm("embedding"))
    )
    a = withv.select(
        F.col("id").alias("a_id"),
        F.col("cluster"),
        F.col("keep").alias("__ka"),
        F.col("embedding").alias("__ea"),
        F.col("__nrm").alias("__na"),
    )
    b = withv.select(
        F.col("id").alias("b_id"),
        F.col("cluster"),
        F.col("keep").alias("__kb"),
        F.col("embedding").alias("__eb"),
        F.col("__nrm").alias("__nb"),
    )
    sim = similarity.dot(F.col("__ea"), F.col("__eb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    edges = dedup._reusable(
        a.join(b, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(sim >= 0.4)
        .select("a_id", "b_id", "__ka", "__kb")
    )
    kept_adjacent = edges.where(F.col("__ka") & F.col("__kb")).agg(
        F.count(F.lit(1)).alias("__kk")
    )
    endpoints = (
        edges.select(F.col("a_id").alias("id"))
        .unionByName(edges.select(F.col("b_id").alias("id")))
        .distinct()
    )
    orphans = (
        res.where(~F.col("keep"))
        .join(endpoints, "id", "left_anti")
        .agg(F.count(F.lit(1)).alias("__orph"))
    )
    stats = res.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((~F.col("keep")).cast("long")).alias("__nd"),
    )
    return (
        stats.crossJoin(F.broadcast(kept_adjacent))
        .crossJoin(F.broadcast(orphans))
        .select(
            F.col("__n").alias("n_rows"),
            (F.col("__orph") == 0).alias("drops_justified"),
            (F.col("__kk") == 0).alias("kept_separated"),
            (F.col("__nd") > 0).alias("nonempty"),
        )
    )


def q_knn_brute(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.knn_brute(emb, "vec_id", "embedding", query_id=0, k=10)


def q_knn_lsh(spark, sf_dir):
    """Rows-only: approximate (bucketed) neighbors. Multiprobe
    radius 1 (5/16 of the corpus scored) — on these near-random
    synthetic embeddings single-bucket recall is ~0.1; radius 1
    lifts it to ~0.3-0.5 (radius 2: ~0.8) at proportional cost."""
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.knn_lsh(
        emb, "vec_id", "embedding", query_id=0, k=10, planes=4,
        probe_radius=1,
    )


def q_knn_ivf(spark, sf_dir):
    """Rows-only: IVF-partitioned approximate neighbors (k-means
    buckets are engine-specific); recall vs q_knn_brute asserted in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings").df
    return similarity.knn_ivf(
        emb, "vec_id", "embedding", query_id=0, k=10,
        nlist=16, nprobe=8, max_iter=3,
    )


def q_multimodal_meta(spark, sf_dir):
    """Binary payload plumbing: byte length + md5 digest of the
    payload (deterministic, oracle-checkable)."""
    docs = _t(spark, sf_dir, "documents").df
    media = multimodal.attach_payload(docs, "doc_id", "text")
    return media.select(
        "media_id", "byte_length", F.md5(F.col("payload")).alias("digest")
    )


def q_image_phash_dedup(spark, sf_dir):
    """Perceptual-hash near-dup pairs over binary payloads
    (multimodal.phash_pairs): 48-bit strided-sum aHash, 4-chunk
    pigeonhole banding, hamming <= 3. The oracle recomputes the hash
    from the same deterministic fake-decode bytes and brute-forces
    ALL pairs — so a green row certifies both the Arrow hash kernel
    and the banding's completeness (banded ≡ brute force)."""
    docs = _t(spark, sf_dir, "documents").df
    media = multimodal.attach_payload(docs, "doc_id", "text")
    return multimodal.phash_pairs(media, "media_id", "payload")


def q_image_quality(spark, sf_dir):
    """Image quality gates (multimodal.image_quality): width/height
    from the deterministic fake decode, aspect, Shannon byte-entropy,
    and the combined keep verdict — every column re-derived by the
    oracle from the same payload bytes (ASCII: ORD(char) == byte)."""
    docs = _t(spark, sf_dir, "documents").df
    media = multimodal.attach_payload(docs, "doc_id", "text")
    out = multimodal.image_quality(
        media, min_width=64, max_aspect=1.6, min_entropy=1.0
    )
    return out.select(
        "media_id", "width", "height", "aspect", "entropy", "keep"
    )


def q_embed_norm(spark, sf_dir):
    """L2 normalization + int8 quantization, verified per row: the
    raw norm, the first normalized element, and the integer checksum
    of the quantized vector (exactly portable across engines)."""
    emb = _t(spark, sf_dir, "embeddings").df
    normed = embeddings.l2_normalize("embedding")
    quant = embeddings.quantize_int8("embedding")
    return emb.select(
        "vec_id",
        F.round(similarity.norm("embedding"), 4).alias("raw_norm"),
        F.round(F.get(normed, 0), 5).alias("n0"),
        F.aggregate(quant, F.lit(0), lambda a, x: a + x).alias("q8_sum"),
        F.get(quant, 0).alias("q8_0"),
    )


def q_embed_centroid(spark, sf_dir):
    """Per-label per-dimension centroid (first 8 dims)."""
    emb = _t(spark, sf_dir, "embeddings").df
    return (
        embeddings.centroids(emb, "label", "embedding")
        .where(F.col("pos") < 8)
        .select("label", "pos", F.round("avg_val", 4).alias("avg_val"))
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 97 == 0 act as
    the held-out eval set; every other doc is scored by the fraction
    of its distinct 3-gram shingles that appear in that set.

    Both sides derive from the SAME persisted hashed-shingle frame
    the n=3 dedup queries build (hashed_shingle_arrays — byte-
    identical plan ⇒ shared cache entry), so in a query mix the
    corpus is tokenized once, not once per operator (r6). The
    broadcast-vs-shuffle gate keeps its pre-r6 semantics: it sizes
    the RAW bench docs, exactly what contamination_scores gates on."""
    from ..operators.dedup import (
        BENCH_BROADCAST_MAX_BYTES,
        contamination_scores_hashed,
        hashed_shingle_arrays,
    )
    from ..plans.stats import plan_size_bytes

    docs = _t(spark, sf_dir, "documents").df
    arrs = hashed_shingle_arrays(docs, "doc_id", "text", 3)
    bench = arrs.where(F.col("id") % 97 == 0).select(
        F.explode("sh_arr").alias("shingle")
    )
    corpus = arrs.where(F.col("id") % 97 != 0)
    broadcast_bench = (
        plan_size_bytes(docs.where(F.col("doc_id") % 97 == 0))
        <= BENCH_BROADCAST_MAX_BYTES
    )
    out = contamination_scores_hashed(corpus, bench, broadcast_bench)
    return out.select(
        F.col("id").alias("doc_id"), "n_sh", "n_contaminated", "contamination"
    )


def q_fuzzy_pairs(spark, sf_dir):
    """Entity resolution: all DISTINCT part-name pairs within
    levenshtein distance 2 (Ed-Join q-gram prefix filtering + exact
    verify; identical names collapse to their min-key representative
    first — exact duplicates are exact_dedup's job, and expanding
    g-copy groups is O(g²) noise). The oracle is the quadratic
    self-join over distinct names — feasible at oracle scale, which
    is exactly why the prefix-filtered plan must agree with it while
    staying size-of-data at corpus scale."""
    parts = _t(spark, sf_dir, "part").df
    return dedup.edit_distance_pairs(parts, "p_partkey", "p_name", k=2, q=2)


def q_sample(spark, sf_dir):
    """Rows-only: seeded Bernoulli sample (engine-specific RNG);
    the driver checks schema + row production."""
    li = _t(spark, sf_dir, "lineitem")
    return li.sample(0.1, seed=42).select(["l_orderkey", "l_linenumber"]).df


def q_sample_check(spark, sf_dir):
    """Hard-signal invariant for the seeded Bernoulli sampler
    (oracle-backed upgrade of rows-only q_sample, the
    q_knn_ivf_recall pattern): (a) replaying the same seed yields
    the SAME row set (symmetric difference of two independently
    built sample plans is empty — the reproducibility contract a
    training pipeline relies on for resumable runs), and (b) the
    sample size lands within 6 binomial standard deviations of
    fraction·n. Both sides computed in Spark; the oracle pins the
    booleans."""
    li = _t(spark, sf_dir, "lineitem")
    frac = 0.1
    keys = ["l_orderkey", "l_linenumber"]
    s1 = li.sample(frac, seed=42).select(keys).df
    s2 = li.sample(frac, seed=42).select(keys).df
    diff = s1.exceptAll(s2).unionByName(s2.exceptAll(s1))
    d = diff.agg(F.count(F.lit(1)).alias("__d"))
    k = s1.agg(F.count(F.lit(1)).alias("__k"))
    n = li.df.agg(F.count(F.lit(1)).alias("__n"))
    mean = frac * F.col("__n")
    sd = F.sqrt(F.lit(frac * (1 - frac)) * F.col("__n"))
    return (
        d.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("__d") == 0).alias("deterministic_replay"),
            (F.abs(F.col("__k") - mean) <= 6 * sd).alias("size_within_6sd"),
        )
    )


def q_bloom_check(spark, sf_dir):
    """Hard-signal invariant for Bloom incremental dedup (the
    q_knn_ivf_recall pattern — the filter's bit layout is
    engine-hash-specific, so the INVARIANTS are what cross-engine
    verification can pin): fingerprint the "seen" corpus (docs with
    doc_id % 3 != 0), screen the full corpus as the "new" batch,
    then recount exactly — (a) no_false_negatives: zero survivors
    whose text IS in the seen corpus (an exact semi-join recount;
    the filter's hard guarantee); (b) fp_ok: the genuinely-new rows
    lost to false positives (exact anti-join recount) stay under
    1% + 5 of the truly-new count (theory: ~7e-6 at driver SFs for
    m = 2^20, k = 5); (c) nonvacuous: the survivor set is non-empty
    and smaller than the batch. n_docs is pinned by the oracle's own
    parquet count, so the row universe is cross-engine-verified."""
    docs = _t(spark, sf_dir, "documents").df
    seen = docs.where(F.col("doc_id") % 3 != 0)
    # _reusable, not bare persist: connect-safe and disk-spillable
    # (three downstream consumers — viol, fp, survivor count)
    survivors = dedup._reusable(
        dedup.bloom_filter_new(docs, seen, ["text"], m_bits=1 << 20, k=5)
    )
    seen_texts = seen.select("text").distinct()
    viol = survivors.join(seen_texts, "text", "left_semi").agg(
        F.count(F.lit(1)).alias("__viol")
    )
    truly_new = docs.join(seen_texts, "text", "left_anti")
    fp = truly_new.join(
        survivors.select("doc_id"), "doc_id", "left_anti"
    ).agg(F.count(F.lit(1)).alias("__fp"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(truly_new.agg(F.count(F.lit(1)).alias("__new")))
    ).crossJoin(
        F.broadcast(survivors.agg(F.count(F.lit(1)).alias("__surv")))
    )
    return (
        stats.crossJoin(F.broadcast(viol))
        .crossJoin(F.broadcast(fp))
        .select(
            "n_docs",
            (F.col("__viol") == 0).alias("no_false_negatives"),
            (
                F.col("__fp")
                <= F.lit(5) + F.lit(0.01) * F.col("__new")
            ).alias("fp_ok"),
            (
                (F.col("__surv") > 0) & (F.col("__surv") < F.col("n_docs"))
            ).alias("nonvacuous"),
        )
    )


def q_cms_check(spark, sf_dir):
    """Hard-signal invariant for the Count-Min frequency sketch
    (operators/sketch.py, the q_knn_ivf_recall pattern): sketch the
    corpus BIGRAM occurrence stream (the hot-key probe you'd run
    before salting a 100 TB join), then compare the top-20 exact
    bigram counts against their estimates — (a) lower_ok: every
    estimate >= its exact count (the CMS one-sided guarantee; any
    build/probe hash mismatch breaks it instantly); (b) upper_ok:
    the worst overestimate stays under 4·N/width (twice the Markov
    eps·N bound — deterministic with fixed seeds, measured 0 at
    driver SFs); (c) n_checked pinned at 20 and the stream size
    n_bigrams pinned by the oracle's own recount, so the row
    universe is cross-engine-verified."""
    from ..operators import sketch as S
    from ..operators.text import tokens

    width, depth = 2048, 4
    docs = _t(spark, sf_dir, "documents").df
    stream = dedup._reusable(
        docs.select(
            F.explode(
                dedup.window_array_expr(tokens("text"), 2)
            ).alias("k")
        )
    )
    cms = S.cms_build(stream, ["k"], width=width, depth=depth)
    exact = (
        stream.groupBy("k")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("k"))
        .limit(20)
    )
    total = stream.agg(F.count(F.lit(1)).alias("n_bigrams"))
    est = exact.crossJoin(F.broadcast(cms)).select(
        "__n", S.cms_estimate(["k"], width=width, depth=depth).alias("__est")
    )
    checked = est.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((F.col("__est") < F.col("__n")).cast("int")).alias("__under"),
        F.max(F.col("__est") - F.col("__n")).alias("__over"),
    )
    return checked.crossJoin(F.broadcast(total)).select(
        "n_checked",
        "n_bigrams",
        (F.col("__under") == 0).alias("lower_ok"),
        (
            F.col("__over") <= F.lit(4.0) * F.col("n_bigrams") / F.lit(width)
        ).alias("upper_ok"),
    )


QUERIES = {
    "q_bloom_check": q_bloom_check,
    "q_cms_check": q_cms_check,
    "q_sample_check": q_sample_check,
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "q_dedup_cluster": q_dedup_cluster,
    "q_decontaminate": q_decontaminate,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_simhash_check": q_dedup_simhash_check,
    "q_knn_lsh_recall": q_knn_lsh_recall,
    "q_dedup_embedding": q_dedup_embedding,
    "q_bucket_cosine": q_bucket_cosine,
    "q_pagerank": q_pagerank,
    "q_semdedup": q_semdedup,
    "q_semdedup_check": q_semdedup_check,
    "q_knn_brute": q_knn_brute,
    "q_knn_lsh": q_knn_lsh,
    "q_knn_ivf_recall": q_knn_ivf_recall,
    "q_knn_ivf": q_knn_ivf,
    "q_multimodal_meta": q_multimodal_meta,
    "q_image_phash_dedup": q_image_phash_dedup,
    "q_image_quality": q_image_quality,
    "q_embed_norm": q_embed_norm,
    "q_embed_centroid": q_embed_centroid,
    "q_fuzzy_pairs": q_fuzzy_pairs,
    "q_sample": q_sample,
}

_SHINGLES = """
    tok AS (
      SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM tok
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
"""

ORACLES = {
    "q_bloom_check": """
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               TRUE AS no_false_negatives,
               TRUE AS fp_ok,
               TRUE AS nonvacuous
    """,
    "q_cms_check": """
        SELECT 20 AS n_checked,
               (SELECT CAST(SUM(GREATEST(LEN(
                  LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                              x -> x <> '')) - 1, 0)) AS BIGINT)
                FROM documents) AS n_bigrams,
               TRUE AS lower_ok,
               TRUE AS upper_ok
    """,
    "q_sample_check": """
        SELECT TRUE AS deterministic_replay, TRUE AS size_within_6sd
    """,
    "q_fuzzy_pairs": """
        WITH v AS (
          SELECT p_name, MIN(p_partkey) AS id FROM part
          WHERE p_name IS NOT NULL GROUP BY p_name
        )
        SELECT a.id AS a_id, b.id AS b_id,
               LEVENSHTEIN(a.p_name, b.p_name) AS dist
        FROM v a JOIN v b ON a.id < b.id
        WHERE ABS(LEN(a.p_name) - LEN(b.p_name)) <= 2
          AND LEVENSHTEIN(a.p_name, b.p_name) <= 2
    """,
    "q_decontaminate": """
        WITH tok AS (
          SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                                     x -> x <> '') AS t
          FROM documents
        ), sh3 AS (
          SELECT doc_id,
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
          FROM tok WHERE LEN(t) >= 3
        ), bench AS (
          SELECT DISTINCT UNNEST(sh) AS shingle FROM sh3 WHERE doc_id % 97 = 0
        ), corp AS (
          SELECT doc_id, LEN(sh) AS n_sh, UNNEST(sh) AS shingle
          FROM sh3 WHERE doc_id % 97 <> 0
        )
        SELECT doc_id, n_sh, COUNT(*) AS n_contaminated,
               ROUND(COUNT(*) / NULLIF(CAST(n_sh AS DOUBLE), 0.0), 4)
                 AS contamination
        FROM corp JOIN bench USING (shingle)
        GROUP BY doc_id, n_sh
    """,
    "q_embed_norm": """
        WITH base AS (
          SELECT vec_id,
            LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
            NULLIF(LIST_MAX(LIST_TRANSFORM(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))), 0.0) AS ma
          FROM embeddings
        )
        SELECT vec_id,
          ROUND(nrm, 4) AS raw_norm,
          ROUND(v[1] / NULLIF(nrm, 0.0), 5) AS n0,
          CAST(LIST_SUM(LIST_TRANSFORM(v,
               x -> CAST(ROUND(127.0 * x / ma) AS INT))) AS INT) AS q8_sum,
          CAST(ROUND(127.0 * v[1] / ma) AS INT) AS q8_0
        FROM base
    """,
    "q_embed_centroid": """
        SELECT label, pos, ROUND(AVG(val), 4) AS avg_val
        FROM (
          SELECT label,
                 UNNEST(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS val,
                 UNNEST(GENERATE_SERIES(0, LEN(embedding) - 1)) AS pos
          FROM embeddings
        )
        WHERE pos < 8
        GROUP BY label, pos
    """,
    "q_dedup_exact": """
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY LOWER(TRIM(text))
                                    ORDER BY doc_id ASC) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "q_dedup_ngram_jaccard": f"""
        WITH {_SHINGLES},
        common AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) >= 0.8
    """,
    # identical exact-Jaccard set: banding false negatives are
    # deterministic-zero at the driver SFs (see q_dedup_minhash)
    "q_dedup_minhash": f"""
        WITH {_SHINGLES},
        common AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) >= 0.8
    """,
    "q_dedup_simhash_check": """
        SELECT TRUE AS complete_ok, TRUE AS radius_ok, TRUE AS nonempty
    """,
    "q_knn_lsh_recall": """
        SELECT 10 AS k, CAST(10 AS BIGINT) AS n_found, TRUE AS recall_ok
    """,
    "q_knn_ivf_recall": """
        SELECT 10 AS k, CAST(10 AS BIGINT) AS n_found, TRUE AS recall_ok
    """,
    "q_dedup_cluster": f"""
        WITH RECURSIVE {_SHINGLES},
        common AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT a_id, b_id
          FROM common
          JOIN sizes sa ON sa.doc_id = a_id
          JOIN sizes sb ON sb.doc_id = b_id
          WHERE ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) >= 0.8
        ),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
          WHERE r.u <> e.v
        ),
        labels AS (
          SELECT u AS node, LEAST(MIN(v), u) AS component
          FROM reach GROUP BY u
        )
        SELECT component, COUNT(*) AS size,
               STRING_AGG(node, ',' ORDER BY node) AS members
        FROM labels GROUP BY component
    """,
    "q_semdedup_check": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS drops_justified,
               TRUE AS kept_separated,
               TRUE AS nonempty
        FROM embeddings WHERE embedding IS NOT NULL
    """,
    "q_pagerank": """
        WITH RECURSIVE e0 AS (
          SELECT a.vec_id AS u, b.vec_id AS v
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])),
                      4) >= 0.4
        ),
        edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        outdeg AS (SELECT u, COUNT(*) AS od FROM edges GROUP BY 1),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        pr(iter, node, r) AS (
          SELECT 0, node, 1.0 / n FROM nodes CROSS JOIN nn
          UNION ALL
          SELECT p.iter + 1, e.v,
                 (1.0 - 0.85) / nn.n + 0.85 * SUM(p.r / o.od)
          FROM pr p
          JOIN edges e ON e.u = p.node
          JOIN outdeg o ON o.u = p.node
          CROSS JOIN nn
          WHERE p.iter < 10
          GROUP BY p.iter, e.v, nn.n
        )
        SELECT node, ROUND(r, 6) AS pr_rank FROM pr WHERE iter = 10
    """,
    "q_bucket_cosine": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    """,
    "q_dedup_embedding": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    """,
    "q_knn_brute": """
        SELECT b.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(b.embedding AS DOUBLE[]),
                                            CAST(a.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
        WHERE a.vec_id = 0
        ORDER BY cosine DESC, b.vec_id ASC LIMIT 10
    """,
    "q_multimodal_meta": """
        SELECT doc_id AS media_id, STRLEN(text)::BIGINT AS byte_length,
               MD5(text) AS digest
        FROM documents
    """,
    # ahash recomputed from the same fake-decode bytes (ASCII text:
    # ORD(char) == payload byte — the q_fingerprint convention), then
    # BRUTE-FORCE all-pairs hamming: the oracle certifies banding
    # completeness, not just hash parity.
    "q_image_phash_dedup": """
        WITH cp AS (
          SELECT doc_id AS media_id,
                 LIST_TRANSFORM(
                   LIST_FILTER(STRING_SPLIT(text, ''), c -> c <> ''),
                   c -> CAST(ORD(c) AS BIGINT)) AS v
          FROM documents
          -- operator contract: null/empty payloads hash to null and
          -- are filtered before pairing (an all-zero grid would
          -- otherwise pair every empty doc at hamming 0)
          WHERE text IS NOT NULL AND LEN(text) > 0
        ), grid AS (
          SELECT media_id, i,
                 COALESCE(LIST_SUM(
                   LIST_FILTER(v, (x, j) -> (j - 1) % 48 = i)), 0) AS g
          FROM cp, RANGE(48) t(i)
        ), hm AS (
          SELECT media_id,
                 CAST(SUM(CASE WHEN g > avg_g
                           THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                           ELSE 0 END) AS BIGINT) AS ahash
          FROM (SELECT media_id, i, g,
                       AVG(g) OVER (PARTITION BY media_id) AS avg_g
                FROM grid) s
          GROUP BY media_id
        )
        SELECT a.media_id AS a_id, b.media_id AS b_id,
               BIT_COUNT(XOR(a.ahash, b.ahash)) AS hamming
        FROM hm a JOIN hm b ON a.media_id < b.media_id
        WHERE BIT_COUNT(XOR(a.ahash, b.ahash)) <= 3
    """,
    # every feature re-derived from the payload bytes: width/height
    # are the documented fake-decode (64 + n % 64, 64 + n % 48 over
    # the byte length), entropy is Shannon over the byte histogram
    # (ASCII text: ORD(char) == byte), keep = the same gates the
    # Spark side applies (rounded aspect <= 1.6, entropy >= 1.0,
    # width >= 64)
    "q_image_quality": """
        WITH cp AS (
          SELECT doc_id,
                 UNNEST(LIST_TRANSFORM(
                   LIST_FILTER(STRING_SPLIT(text, ''), c -> c <> ''),
                   c -> ORD(c))) AS b
          FROM documents
        ), hist AS (
          SELECT doc_id, b, COUNT(*) AS c FROM cp GROUP BY 1, 2
        ), tot AS (
          SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM hist GROUP BY 1
        ), feat AS (
          SELECT h.doc_id,
                 -SUM((c / n) * LOG2(c / n)) AS entropy,
                 CAST(MAX(64 + CAST(n AS BIGINT) % 64) AS INT) AS width,
                 CAST(MAX(64 + CAST(n AS BIGINT) % 48) AS INT) AS height
          FROM hist h JOIN tot t USING (doc_id) GROUP BY 1
        )
        -- LEFT JOIN from documents: the operator emits a row for
        -- EVERY doc — null/empty payloads get null features and an
        -- explicit keep=false (cp produces no rows for them, so an
        -- inner shape would drop them from the oracle)
        SELECT d.doc_id AS media_id, f.width, f.height,
               ROUND(GREATEST(f.width, f.height) * 1.0
                     / LEAST(f.width, f.height), 4) AS aspect,
               ROUND(f.entropy, 4) AS entropy,
               COALESCE(f.width >= 64
                AND ROUND(GREATEST(f.width, f.height) * 1.0
                          / LEAST(f.width, f.height), 4) <= 1.6
                AND f.entropy >= 1.0, FALSE) AS keep
        FROM documents d LEFT JOIN feat f ON d.doc_id = f.doc_id
    """,
    # q_dedup_minhash / q_dedup_simhash / q_knn_lsh / q_sample:
    # intentionally no oracle (engine-hash / RNG dependent) —
    # rows-only check; cross-validated in tests/test_dedup.py.
}
