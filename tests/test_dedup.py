"""Dedup operator tests: exact invariants, MinHash recall vs exact
Jaccard ground truth, SimHash sanity."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.operators import dedup


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different text about spark query engines here"),
        (5, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TODAY"),  # case dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_first(dup_docs):
    normalized = dup_docs.withColumn("k", F.lower(F.trim(F.col("text"))))
    kept = dedup.exact_dedup(normalized, ["k"], "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4]


def test_exact_dedup_idempotent(dup_docs):
    normalized = dup_docs.withColumn("k", F.lower(F.col("text")))
    once = dedup.exact_dedup(normalized, ["k"], "doc_id")
    twice = dedup.exact_dedup(once, ["k"], "doc_id")
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


def test_jaccard_pairs_finds_near_dups(dup_docs):
    pairs = dedup.jaccard_pairs(dup_docs, "doc_id", "text", n=3, threshold=0.5)
    found = {(r["a_id"], r["b_id"]): r["jaccard"] for r in pairs.collect()}
    assert found[(1, 2)] == 1.0
    assert found[(1, 5)] == 1.0  # case-normalized
    assert 0.5 <= found[(1, 3)] < 1.0
    assert (1, 4) not in found


def test_minhash_recall_vs_exact(docs):
    """MinHash+LSH (64 perms, 16 bands) must recover the exact
    Jaccard >= 0.8 pairs on the documents table (planted dups)."""
    exact = {
        (r["a_id"], r["b_id"])
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    approx = {
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", 3, 64, 16, 0.8
        ).collect()
    }
    assert exact, "expected planted near-dups in documents table"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9
    assert approx <= exact  # verify step kills false positives


def test_simhash_finds_exact_dups(dup_docs):
    pairs = dedup.simhash_pairs(dup_docs, "doc_id", "text", max_hamming=3)
    found = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (1, 2) in found and (1, 5) in found


def test_connected_components_chain_and_clusters(spark):
    from dataframe_spark.operators.graph import connected_components

    # chain 1-2-3-4 (worst diameter), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_corpus_keeps_canonical(spark, docs):
    from dataframe_spark.operators.dedup import jaccard_pairs
    from dataframe_spark.operators.graph import dedup_corpus

    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    kept = dedup_corpus(docs, "doc_id", pairs)
    n_docs = docs.count()
    n_pairs_nodes = (
        pairs.selectExpr("a_id AS id")
        .union(pairs.selectExpr("b_id AS id"))
        .distinct()
        .count()
    )
    n_kept = kept.count()
    assert n_kept < n_docs
    assert n_kept >= n_docs - n_pairs_nodes
    # idempotent: survivors contain no pair above threshold
    again = jaccard_pairs(kept, "doc_id", "text", n=3, threshold=0.8)
    assert again.count() == 0


def test_contamination_scores(spark):
    from dataframe_spark.operators.dedup import contamination_scores

    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w v")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c q r s")], "doc_id long, text string")
    out = {
        r["id"]: r
        for r in contamination_scores(
            corpus, "doc_id", "text", bench, "text", n=3
        ).collect()
    }
    # doc 1 shares exactly the shingle "a b c" of its 3; doc 2 clean (absent)
    assert out[1]["n_contaminated"] == 1 and abs(out[1]["contamination"] - 0.3333) < 1e-4
    assert 2 not in out


def test_source_overlap_symmetric_bounds(docs):
    from pyspark.sql import functions as F

    from dataframe_spark.operators.dedup import source_overlap

    out = source_overlap(docs, "source", "text", n=3).collect()
    assert len(out) > 0
    n_sources = docs.select("source").distinct().count()
    assert len(out) <= n_sources * (n_sources - 1) // 2
    for r in out:
        assert r["source_a"] < r["source_b"] and r["n_shared"] > 0
    # spot-check one pair against a direct distinct-shingle intersect
    from dataframe_spark.operators.dedup import shingle_arrays

    a, b = out[0]["source_a"], out[0]["source_b"]
    sh = (
        shingle_arrays(docs.where(F.col("source").isin(a, b)), "source", "text", 3)
        .select(F.col("id").alias("s"), F.explode("sh_arr").alias("g"))
        .distinct()
    )
    direct = (
        sh.where(F.col("s") == a)
        .select("g")
        .intersect(sh.where(F.col("s") == b).select("g"))
        .count()
    )
    assert direct == out[0]["n_shared"]


def test_duplicated_spans_flags_shared_boilerplate(spark):
    from dataframe_spark.operators.dedup import duplicated_spans

    boiler = "this license text is identical across documents " * 2
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " unrelated words entirely here"),
            (3, "totally unique content with no shared spans at all xyz"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in duplicated_spans(docs, "doc_id", "text", window=5).collect()
    }
    # docs 1 and 2 share the boilerplate spans; doc 3 shares nothing
    assert out[1]["dup_span_frac"] > 0.3
    assert out[2]["dup_span_frac"] > 0.3
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_span_frac"] == 0.0
    # every window counted, none double-counted
    for r in out.values():
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]


def test_duplicated_spans_in_doc_repeat_not_cross_doc(spark):
    """A span repeated only WITHIN one document is not a cross-doc
    duplicate (distinct-per-doc collapses it; df counts docs)."""
    from dataframe_spark.operators.dedup import duplicated_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e " * 10), (2, "v w x y z q r s t u")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r for r in duplicated_spans(docs, "doc_id", "text", 5).collect()
    }
    assert out[1]["n_dup_windows"] == 0
    assert out[2]["n_dup_windows"] == 0


# --- edit-distance pairs ----------------------------------------------


def test_edit_distance_pairs_matches_brute_force(spark):
    from itertools import combinations

    from dataframe_spark.operators.dedup import edit_distance_pairs

    names = [
        "red widget", "red widgit", "red widget", "blue widget",
        "small bolt", "small bolts", "smol bolt", "ring", "rings",
        "a", "ab", "b", "zz", "completely different thing",
    ]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", k=2, q=2, dedup_values=False).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j, lev(names[i], names[j]))
        for i, j in combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 2
    }
    assert got == want
    # the gramless strings ('a','b') still pair via the short block
    assert (9, 11, 1) in got
    # default mode collapses identical values to min-id representatives
    vals = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", k=2, q=2).collect()
    }
    reps = {s: min(i for i, x in enumerate(names) if x == s) for s in set(names)}
    want_v = {
        (min(reps[x], reps[y]), max(reps[x], reps[y]), lev(x, y))
        for x in reps
        for y in reps
        if x < y and 1 <= lev(x, y) <= 2
    }
    assert vals == want_v


def test_edit_distance_pairs_empty_and_null(spark):
    from dataframe_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "")], "id long, s string"
    )
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", k=2, q=2).collect()
    }
    assert got == set()  # null dropped; ''<->'abc' is distance 3


def test_minhash_identical_docs_collapse(spark):
    """A pathologically duplicated corpus (1000 byte-identical docs)
    must not pair quadratically inside the LSH band join: identical
    shingle sets collapse to one representative before banding, so
    the candidate join sees ONE member per band bucket while the
    expanded output still contains every C(1000,2) pair at 1.0."""
    n = 1000
    rows = [(i, "the same exact document text repeated verbatim here")
            for i in range(n)]
    rows += [(n + 1, "a completely different singleton document body"),
             (n + 2, "another unrelated text with no duplicate twin")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs_rows = dedup.minhash_signatures(df, "doc_id", "text", 3, 64)
    # collapse check: candidate generation over collapsed reps is tiny
    from dataframe_spark.operators.dedup import (
        _hash_arrays, lsh_candidate_pairs, shingle_arrays)
    arrs = _hash_arrays(shingle_arrays(df, "doc_id", "text", 3)).withColumn(
        "__g", F.xxhash64(F.array_sort("sh_arr")))
    reps = arrs.groupBy("__g").agg(F.min("id").alias("id"),
                                   F.first("sh_arr").alias("sh_arr"))
    assert reps.count() == 3  # 1000 identical -> 1 representative

    pairs = dedup.minhash_dedup_pairs(df, "doc_id", "text", 3, 64, 16, 0.8)
    agg = pairs.agg(F.count(F.lit(1)).alias("n"),
                    F.min("jaccard").alias("jmin")).collect()[0]
    assert agg["n"] == n * (n - 1) // 2
    assert agg["jmin"] == 1.0
    assert sigs_rows.count() == n + 2


def test_minhash_sig_kernel_matches_jvm(spark):
    """The arrow signature kernel must reproduce the JVM expression
    EXACTLY (integer equality over every doc and permutation): the
    banding candidate set — and with it q_dedup_minhash's
    deterministic 100% recall at the driver SFs — depends on the
    values, so bit-equality is the equivalence proof, not a
    statistical check."""
    import random

    rng = random.Random(12)
    words = ["alpha", "bravo", "pad", "x9", "zulu", "kilo", "mike", "nn"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.minhash_signatures(df, "doc_id", "text", 3, 64, engine="arrow")
    j = dedup.minhash_signatures(df, "doc_id", "text", 3, 64, engine="jvm")
    av = {r["id"]: r["sig"] for r in a.collect()}
    jv = {r["id"]: r["sig"] for r in j.collect()}
    assert len(av) == 200
    assert av == jv


def test_minhash_sig_kernel_empty_array_matches_jvm(spark):
    """Defensive parity for an input minhash_signatures itself never
    produces (shingle_arrays filters n_sh > 0): an EMPTY sh_arr row
    yields num_perm null entries on both engines (array_min over an
    empty transform is null per permutation)."""
    from dataframe_spark.operators.dedup import _minhash_sigs_frame

    src = spark.createDataFrame(
        [(1, [123456789, -42]), (2, [])], "id long, sh_arr array<bigint>"
    )
    a = {r["id"]: r["sig"] for r in _minhash_sigs_frame(src, 8, "arrow").collect()}
    j = {r["id"]: r["sig"] for r in _minhash_sigs_frame(src, 8, "jvm").collect()}
    assert a == j
    assert a[2] == [None] * 8


def test_shingle_kernel_matches_jvm(spark):
    """The arrow shingle-chain kernel must reproduce the JVM
    expression chain EXACTLY — same ids kept, same xxhash64 values,
    same in-array (first-occurrence) order, same n_sh: every
    shingle-based operator (jaccard prefixes, minhash signatures and
    banding, contamination intersections) consumes these rows, so
    row-level bit-equality is the equivalence proof for all of them.
    The corpus covers every boundary the chain has: Java-\\s-class
    whitespace runs (tab/newline/vtab/formfeed/cr), leading/trailing
    whitespace vs Spark's space-only trim, empty and whitespace-only
    and sub-n-token docs (dropped on both engines), repeated
    shingles (distinct order), case folding incl. non-ASCII Unicode
    (Python str.lower fallback vs UTF8String.toLowerCase), non-\\s
    Unicode whitespace kept inside tokens, >32-byte windows (the
    XXH64 stripe path), and a null text row."""
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "  LEADING and trailing   spaces  ",
        "\ttab\nnewline\x0bvtab\ffeed\rcr mix  of\t\twhitespace runs",
        "", "   ", "\t\n", "one", "one two", "one two three",
        "dup dup dup dup dup dup",
        "a b c a b c a b c d",
        "Uppercase MIXED Case TOKENS here Everywhere",
        "Éclair naïve ÊTRE Σοφός ΒΑΣΙΛΕΙΑΣ weiß STRASSE tokens",
        "supercalifragilisticexpialidocious"
        " antidisestablishmentarianism"
        " floccinaucinihilipilification extra words",
        None,
        "x" * 40 + " " + "y" * 40 + " " + "z" * 40 + " tail words",
        "a b c d e f",  # non-breaking space is NOT Java \s
        "ΣΟΦΟΣ word ends sigma ΑΒΓΣ mid",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    j = dedup.hashed_shingle_arrays(df, "doc_id", "text", 3, engine="jvm")
    a = dedup.hashed_shingle_arrays(df, "doc_id", "text", 3, engine="arrow")
    jr = [(r.id, list(r.sh_arr), r.n_sh) for r in j.orderBy("id").collect()]
    ar = [(r.id, list(r.sh_arr), r.n_sh) for r in a.orderBy("id").collect()]
    assert len(jr) > 0 and jr == ar


def test_xxh64_kernel_exact(spark):
    """_xxh64_np vs Catalyst's xxhash64, bit-for-bit, over EVERY
    byte length 0..100 plus multi-stripe lengths — the tail rounds
    (remaining 8-byte words, the 4-byte word, single bytes) each get
    exercised at every possible residue."""
    import random

    import numpy as np

    from dataframe_spark.operators.dedup import _xxh64_np

    rng = random.Random(11)
    strs = [
        "".join(chr(rng.randrange(33, 127)) for _ in range(L))
        for L in list(range(101)) + [127, 128, 255, 300]
    ]
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    expected = [r[0] for r in sdf.select(F.xxhash64("s")).collect()]
    buf = b"".join(s.encode() for s in strs)
    data = np.zeros(len(buf) + 8, np.uint8)
    data[: len(buf)] = np.frombuffer(buf, np.uint8)
    starts, lens, off = [], [], 0
    for s in strs:
        b = s.encode()
        starts.append(off)
        lens.append(len(b))
        off += len(b)
    got = _xxh64_np(
        data, np.array(starts, np.int64), np.array(lens, np.int64)
    )
    assert list(got) == expected


def test_jaccard_pairs_engine_invariant(spark, monkeypatch):
    """End-to-end: jaccard_pairs output is identical under either
    shingle engine (the env override is the cert/parity hook)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "totally different words in this document here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for eng in ("jvm", "arrow"):
        monkeypatch.setenv("SPARK_GRAFT_SHINGLE_ENGINE", eng)
        pairs = dedup.jaccard_pairs(df, "doc_id", "text", 3, 0.5)
        out[eng] = sorted(
            (r.a_id, r.b_id, r.jaccard) for r in pairs.collect()
        )
    assert out["jvm"] == out["arrow"] and len(out["jvm"]) == 3


def test_lsh_max_bucket_caps_candidates(spark):
    """max_bucket bounds per-bucket pairing deterministically."""
    from dataframe_spark.operators.dedup import lsh_candidate_pairs

    # 10 ids sharing one band signature
    sigs = spark.createDataFrame(
        [(i, [7] * 64) for i in range(10)],
        "id long, sig array<bigint>",
    )
    full = lsh_candidate_pairs(sigs, 16, 4).count()
    capped = lsh_candidate_pairs(sigs, 16, 4, max_bucket=4).count()
    assert full == 45
    assert capped == 6  # C(4,2): first 4 ids by order survive


def test_lsh_band_refactor_matches_reference(spark):
    """r13: the band signature moved from xxhash64 over a
    comma-joined STRING of the slice to xxhash64 over the long slice
    directly, and the banded frame optionally persists before the
    self-join. Both are deterministic functions of the band slice,
    so the candidate set — pairs sharing at least one identical
    band slice — must be IDENTICAL to the old string-hash reference
    (collisions aside), and persist_bands must not change output."""
    import random

    from pyspark.sql import functions as F

    from dataframe_spark.operators.dedup import lsh_candidate_pairs

    rng = random.Random(7)

    def rand_sig():
        return [rng.randrange(-(1 << 62), 1 << 62) for _ in range(64)]

    # 10 fully-random singletons (no shared bands), then 10 pairs
    # each sharing exactly one band (a different band per pair)
    rows = [(i, rand_sig()) for i in range(10)]
    for p in range(10):
        s1, s2 = rand_sig(), rand_sig()
        b = p % 16
        s2[b * 4 : b * 4 + 4] = s1[b * 4 : b * 4 + 4]
        rows.append((10 + 2 * p, s1))
        rows.append((11 + 2 * p, s2))
    sigs = spark.createDataFrame(rows, "id long, sig array<bigint>")

    got = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(sigs, 16, 4).collect()
    }
    got_persist = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(
            sigs, 16, 4, persist_bands=True
        ).collect()
    }
    # the r5-r12 string-hash reference, inline
    band_arr_old = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.xxhash64(
            F.concat_ws(",", F.transform(
                F.slice(F.col("sig"), b * 4 + 1, 4),
                lambda x: x.cast("string"),
            ))
        ),
    )
    banded = sigs.select(
        "id", F.posexplode(band_arr_old).alias("band_idx", "band_hash")
    )
    a = banded.select(F.col("id").alias("a_id"), "band_idx", "band_hash")
    b = banded.select(F.col("id").alias("b_id"), "band_idx", "band_hash")
    want = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, ["band_idx", "band_hash"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .collect()
    }
    assert got == want == got_persist
    # exactly the 10 planted single-band pairs, nothing else
    assert want == {(10 + 2 * p, 11 + 2 * p) for p in range(10)}


def test_contamination_paths_equivalent(docs):
    """The gated broadcast (in-row array) and shuffle-join plans of
    contamination_scores must produce identical rows."""
    from dataframe_spark.operators.dedup import contamination_scores

    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    a = sorted(map(str, contamination_scores(
        corpus, "doc_id", "text", bench, "text", n=3,
        broadcast_bench=True).collect()))
    b = sorted(map(str, contamination_scores(
        corpus, "doc_id", "text", bench, "text", n=3,
        broadcast_bench=False).collect()))
    assert a == b and len(a) > 0


def test_remove_duplicated_spans_canonical_keep(spark):
    """Hand-computed removal: the canonical (smallest id, pos)
    occurrence of a cross-doc span survives, every other occurrence
    is excised token-by-token; unique docs pass through rebuilt."""
    from dataframe_spark.operators.dedup import remove_duplicated_spans

    rows = [
        (1, "a b c d e"),    # canonical "a b c" at (1,0) — untouched
        (2, "x y a b c"),    # loses pos 2..4 -> "x y"
        (3, "a b c"),        # whole doc is a dup occurrence -> ""
        (4, "p q r s"),      # unique — rebuilt verbatim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in remove_duplicated_spans(
            df, "doc_id", "text", window=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "a b c d e" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "x y" and out[2]["n_removed"] == 3
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 3
    assert out[4]["clean_text"] == "p q r s" and out[4]["n_removed"] == 0
    assert all(out[i]["n_tokens"] == len(rows[i - 1][1].split()) for i in out)


def test_remove_duplicated_spans_overlap_and_indoc(spark):
    """(a) Overlapping duplicated windows union their coverage;
    (b) a span repeated only WITHIN one doc is untouched
    (cross-document criterion, matching duplicated_spans)."""
    from dataframe_spark.operators.dedup import remove_duplicated_spans

    rows = [
        (1, "a b c d"),          # canonical for both "a b c","b c d"
        (2, "z a b c d"),        # windows at 1,2 both dup -> "z"
        (3, "m n m n"),          # in-doc repeat only: no 2-doc span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in remove_duplicated_spans(
            df, "doc_id", "text", window=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "z" and out[2]["n_removed"] == 4
    assert out[3]["clean_text"] == "m n m n" and out[3]["n_removed"] == 0


def test_bloom_membership_and_fp_bound(spark):
    from dataframe_spark.operators.dedup import (
        bloom_build,
        bloom_filter_new,
        bloom_might_contain,
    )

    seen = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(500)], "id long, key string"
    )
    new = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(400, 900)], "id long, key string"
    )
    out = bloom_filter_new(new, seen, ["key"], m_bits=1 << 14, k=5)
    got = {r["id"] for r in out.collect()}
    # hard guarantee: every key present in seen is screened out
    assert got.isdisjoint(set(range(400, 500)))
    # genuinely-new keys survive modulo a small fp loss
    truly_new = set(range(500, 900))
    lost = truly_new - got
    assert got <= truly_new
    assert len(lost) <= 0.02 * len(truly_new)
    # direct probe: all seen keys positive
    bloom = bloom_build(seen, ["key"], m_bits=1 << 14, k=5)
    probed = (
        seen.crossJoin(F.broadcast(bloom))
        .select(bloom_might_contain(["key"], 1 << 14, 5).alias("hit"))
        .collect()
    )
    assert all(r["hit"] for r in probed)


def test_bloom_deterministic_and_guards(spark):
    from dataframe_spark.operators.dedup import bloom_build, bloom_filter_new

    seen = spark.createDataFrame(
        [(i, f"k{i}") for i in range(100)], "id long, key string"
    )
    new = spark.createDataFrame(
        [(i, f"k{i}") for i in range(50, 200)], "id long, key string"
    )
    a = sorted(r["id"] for r in bloom_filter_new(new, seen, ["key"]).collect())
    b = sorted(r["id"] for r in bloom_filter_new(new, seen, ["key"]).collect())
    assert a == b
    with pytest.raises(ValueError):
        bloom_build(seen, ["key"], m_bits=1000)  # not a power of 2
    with pytest.raises(ValueError):
        bloom_build(seen, ["key"], m_bits=1 << 14, k=0)


def test_cms_estimates_and_hot_keys(spark):
    from dataframe_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        hot_keys,
    )

    # skewed stream: 'hot' x 300, 'warm' x 60, 200 singletons
    rows = (
        [("hot",)] * 300 + [("warm",)] * 60 + [(f"cold{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k string")
    sketch = cms_build(df, ["k"], width=1024, depth=4)
    est = (
        df.select("k").distinct()
        .crossJoin(F.broadcast(sketch))
        .withColumn("est", cms_estimate(["k"], width=1024, depth=4))
    )
    got = {r["k"]: r["est"] for r in est.collect()}
    # one-sided guarantee: never under the true count
    assert got["hot"] >= 300 and got["warm"] >= 60
    assert all(v >= 1 for v in got.values())
    # 560 increments over 1024x4 slots: overestimates stay tiny
    assert got["hot"] <= 300 + 5 and got["warm"] <= 60 + 5
    # hot_keys finds exactly the skewed keys at threshold 50
    hot = {r["k"] for r in hot_keys(df, ["k"], threshold=50, width=1024).collect()}
    assert {"hot", "warm"} <= hot and len(hot) <= 4


def test_cms_guards(spark):
    from dataframe_spark.operators.sketch import cms_build

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        cms_build(df, ["k"], width=0)
    with pytest.raises(ValueError):
        cms_build(df, ["k"], width=1 << 23, depth=4)  # slot cap


def test_dedup_paragraphs_keep_first_and_structure(spark):
    from dataframe_spark.operators.dedup import dedup_paragraphs

    boiler = "subscribe to our newsletter today"
    rows = [
        (1, f"unique opening line\n{boiler}\nmore unique text"),
        (2, f"{boiler}\nanother page entirely"),
        (3, f"x\n{boiler}"),          # 'x' is short: always survives
        (4, None),                     # null text -> empty document
        (5, boiler),                   # single all-removed paragraph
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in dedup_paragraphs(
            df, "doc_id", "text", sep="\n", min_chars=3
        ).collect()
    }
    assert len(out) == 5  # null-text doc kept as a row
    # doc 1 owns the canonical occurrence (smallest (id, idx))
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == rows[0][1]
    # later occurrences removed, structure rejoined with the sep
    assert out[2]["n_removed"] == 1
    assert out[2]["clean_text"] == "another page entirely"
    # short paragraph survives even though it repeats nowhere
    assert out[3]["clean_text"] == "x"
    assert out[4]["n_paras"] == 1 and out[4]["clean_text"] == ""
    assert out[5]["clean_text"] == "" and out[5]["n_removed"] == 1
    # regex-special separator is treated literally
    df2 = spark.createDataFrame(
        [(1, "aa|bb"), (2, "aa|cc")], "doc_id long, text string"
    )
    got = {
        r["id"]: r["clean_text"]
        for r in dedup_paragraphs(
            df2, "doc_id", "text", sep="|", min_chars=2
        ).collect()
    }
    assert got[1] == "aa|bb" and got[2] == "cc"


def test_pagerank_closed_form_and_guards(spark):
    from dataframe_spark.operators.graph import pagerank

    # directed 3-node graph with known 10-iteration ranks (computed
    # by plain-python power iteration: 1->3, 2->3, 3->1, 1->2)
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 1), (1, 2)], "src long, dst long"
    )
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=10).collect()}
    expect = {1: 0.388913, 2: 0.214416, 3: 0.396670}
    for n, v in expect.items():
        assert abs(got[n] - v) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # symmetric graph: a hub (touching everything) outranks leaves
    sym = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long"
    )
    pr = {r["node"]: r["rank"]
          for r in pagerank(sym, symmetrize=True, iters=10).collect()}
    assert pr[0] == max(pr.values()) and pr[3] == min(pr.values())
    assert abs(sum(pr.values()) - 1.0) < 1e-9

    import pytest as _pytest

    # dangling node (2 has no out-edge) must raise, not leak mass
    dang = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        pagerank(dang, iters=2)
    with _pytest.raises(ValueError):
        pagerank(edges, damping=1.0)
    with _pytest.raises(ValueError):
        pagerank(edges, iters=0)


def test_pagerank_assume_unique_matches_default(spark):
    """assume_unique skips the setup distinct (r12). On inputs that
    satisfy the attestation — duplicate-free rows for the directed
    case, ONE orientation per undirected pair for the symmetrized
    case (what cosine_pairs/bucketed_cosine_pairs emit) — ranks must
    be IDENTICAL to the default path."""
    from dataframe_spark.operators.graph import pagerank

    directed = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 1), (1, 2), (4, 1), (1, 4)],
        "src long, dst long",
    )
    want = {r["node"]: r["rank"]
            for r in pagerank(directed, iters=7).collect()}
    got = {r["node"]: r["rank"]
           for r in pagerank(directed, iters=7, assume_unique=True).collect()}
    assert got == want

    undirected = spark.createDataFrame(
        [(1, 3), (2, 3), (1, 2), (1, 4)], "src long, dst long"
    )
    want = {r["node"]: r["rank"]
            for r in pagerank(undirected, iters=5, symmetrize=True).collect()}
    got = {r["node"]: r["rank"]
           for r in pagerank(
               undirected, iters=5, symmetrize=True, assume_unique=True
           ).collect()}
    assert got == want

    # the attestation is real: both orientations of one undirected
    # pair DO break the flag under symmetrize (they collide after
    # the swap-union) — the default path dedups them instead
    both = spark.createDataFrame(
        [(1, 3), (3, 1), (2, 3), (1, 2), (1, 4)], "src long, dst long"
    )
    want = {r["node"]: r["rank"]
            for r in pagerank(both, iters=5, symmetrize=True).collect()}
    got = {r["node"]: r["rank"]
           for r in pagerank(
               both, iters=5, symmetrize=True, assume_unique=True
           ).collect()}
    assert got != want


def test_jaccard_broadcast_gate_strategies_agree(spark, sf_dir):
    """Every candidate strategy must produce the identical pair set:
    the legacy df-order under forced broadcast, forced shuffle, and
    the auto gate (the r9 1000x find auto-gated it), AND the r10
    hash-order plan with demotion off and forced on. The global
    order / join strategy move only performance, never the result."""
    from dataframe_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def pairs(**kw):
        return {
            (r["a_id"], r["b_id"], round(r["jaccard"], 6))
            for r in dedup.jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.8, **kw
            ).collect()
        }

    p_auto = pairs(order="df", broadcast_df_table=None)
    p_bc = pairs(order="df", broadcast_df_table=True)
    p_sh = pairs(order="df", broadcast_df_table=False)
    p_hash = pairs(order="hash", demote_hot=False)
    p_hot = pairs(order="hash", demote_hot=True)
    assert p_auto == p_bc == p_sh == p_hash == p_hot
    assert len(p_auto) > 0


def test_jaccard_hot_demotion_bitmap_is_order_only(spark):
    """A corpus with a genuinely hot shingle (a shared template
    sentence in every doc): force the sampled hot bitmap to be
    non-empty (fraction 1.0, hot_min 2) and pin that demotion
    changes candidates, never the verified pair set."""
    import dataframe_spark.operators.dedup as dd

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"unique text {i} a b c d e {base}") for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta eta iota")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    probe = dd._sampled_hot_probe(
        docs, "doc_id", "text", 3, fraction=1.0, hot_min=2
    )
    assert probe is not None  # the template grams really are hot
    orig = dd._sampled_hot_probe
    dd._sampled_hot_probe = lambda *a, **kw: orig(
        *a, fraction=1.0, hot_min=2
    )
    try:
        p_hot = {
            (r["a_id"], r["b_id"], round(r["jaccard"], 6))
            for r in dd.jaccard_pairs(
                docs, "doc_id", "text", 3, 0.5,
                order="hash", demote_hot=True,
            ).collect()
        }
    finally:
        dd._sampled_hot_probe = orig
    p_df = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 6))
        for r in dd.jaccard_pairs(
            docs, "doc_id", "text", 3, 0.5, order="df"
        ).collect()
    }
    assert p_hot == p_df
    assert len(p_df) > 0


def test_long_array_literal_matches_list_literal(spark):
    """The bulk single-node array literal (r13: one py4j byte[] copy
    + JVM LongBuffer fill, replacing the 124 s CreateArray-per-
    element list literal in the demotion bitmaps) must be
    bit-identical to F.lit(list).cast('array<bigint>') — including
    words with the sign bit set (two's complement) and zero."""
    import dataframe_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    words = [0, 1, (1 << 63), (1 << 64) - 1, 0xDEADBEEFCAFEBABE,
             (1 << 63) - 1, 42]
    signed = [w - (1 << 64) if w >= 1 << 63 else w for w in words]
    fast = dd._long_array_literal(words)
    slow = F.lit(signed).cast("array<bigint>")
    row = spark.range(1).select(
        fast.alias("fast"), slow.alias("slow")
    ).first()
    assert list(row["fast"]) == list(row["slow"]) == signed
    # element_at over the fast literal behaves like the probe uses it
    got = spark.range(1, len(words) + 1).select(
        F.element_at(dd._long_array_literal(words),
                     F.col("id").cast("int")).alias("w")
    ).collect()
    assert [r["w"] for r in got] == signed


def test_jaccard_prefix_asymmetry_matches_brute_force(spark):
    """The r13 index/probe prefix asymmetry directs pairs by
    (n_sh, id) and truncates the smaller side to the PPJoin index
    prefix — lossless by the overlap lemma. Pin the full pair set
    against a brute-force all-pairs Jaccard on a corpus designed to
    stress the asymmetric direction: near-dup pairs of UNEQUAL
    length (subset/superset docs near the threshold), equal-length
    ties (the id tie-break branch), and ids whose numeric order
    disagrees with length order."""
    import itertools

    import dataframe_spark.operators.dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (9, base),                                 # big id, short doc
        (1, base + " lam mu"),                     # small id, longer
        (2, base + " lam mu nu"),                  # longer still
        (3, base + " lam mu nu"),                  # equal-length tie w/ 2
        (4, "totally different words entirely here now ok fine yes"),
        (5, base + " xi omicron pi rho sigma tau upsilon phi chi psi"),
        (6, "alpha beta gamma"),                   # sub-n after shingling
        (7, ""),                                   # empty
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def shingles(text, n=2):
        toks = text.lower().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    t = 0.6
    want = set()
    sh = {i: shingles(txt) for i, txt in rows}
    for (i, a), (j, b) in itertools.combinations(sorted(sh.items()), 2):
        if not a or not b:
            continue
        jac = round(len(a & b) / len(a | b), 4)
        if jac >= t:
            want.add((i, j, round(jac, 6)))
    for order in ("hash", "df"):
        got = {
            (r["a_id"], r["b_id"], round(r["jaccard"], 6))
            for r in dd.jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=t, order=order
            ).collect()
        }
        assert got == want, order
    assert len(want) >= 3  # unequal-length pairs really are present
    # doc 9 is SHORTER than doc 1/2 yet has the larger id, so the
    # asymmetric direction (by n_sh) disagrees with id order — make
    # sure such a pair is actually exercised and re-normalized
    assert any(b == 9 for a, b, _ in want)
    assert all(a < b for a, b, _ in want)


def test_truncated_bound_and_counted_verify_paths(spark):
    """The big-corpus machinery (truncated-bound pre-verify +
    counted broadcast verify) must be EXACT on any corpus — pin
    both verify shapes against the plain small-path result (r11:
    these paths only auto-engage past the 128 MB knee, so tests
    drive them explicitly)."""
    import dataframe_spark.operators.dedup as dd

    rows = [(i, f"common words here {i % 7} plus tail {i}") for i in range(40)]
    rows += [(100 + i, "a near duplicate body of text shared by the group "
              + ("x" if i else "y")) for i in range(3)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 6))
        for r in dd.jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    arrs = dd.hashed_shingle_arrays(docs, "doc_id", "text", 3)
    prefix = dd._hash_order_prefix(arrs, docs, "doc_id", "text", 3, 0.5, False)
    cands = dd._prefix_candidates(prefix, 0.5)
    pruned = dd._truncated_bound_filter(cands, arrs, 0.5)
    for bc in (True, False):
        got = {
            (r["a_id"], r["b_id"], round(r["jaccard"], 6))
            for r in dd._verify_jaccard(
                pruned, arrs, 0.5, broadcast_pairs=bc
            ).collect()
        }
        assert got == want, bc
    assert len(want) > 0
