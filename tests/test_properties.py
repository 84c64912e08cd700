"""Property-based tests (hypothesis) for operator invariants —
SURVEY §5. Kept to few examples per property: each example is a
Spark round-trip."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataframe_spark.constructors import from_named_columns
from dataframe_spark.operators import dedup, text

FEW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "spark", "query"])
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


@given(st.lists(texts, min_size=1, max_size=8))
@FEW
def test_exact_dedup_idempotent_and_bounded(spark, docs_):
    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df.withColumn("k", F.lower(F.col("text")))
    once = dedup.exact_dedup(df, ["k"], "doc_id")
    twice = dedup.exact_dedup(once, ["k"], "doc_id")
    n_once = once.count()
    assert n_once == twice.count()
    assert n_once <= len(docs_)
    assert n_once == len({d.lower() for d in docs_})


@given(st.lists(texts, min_size=2, max_size=6))
@FEW
def test_jaccard_pairs_bounds_and_symmetry_convention(spark, docs_):
    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    pairs = dedup.jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.1).collect()
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert 0.0 <= r["jaccard"] <= 1.0


@given(texts)
@FEW
def test_token_count_matches_python(spark, t):
    df = from_named_columns(spark, {"text": [t]}).df
    got = df.select(text.token_count("text").alias("n")).first()["n"]
    assert got == len(t.split())


@given(st.lists(texts, min_size=1, max_size=6), st.integers(2, 6))
@FEW
def test_chunks_partition_tokens_exactly(spark, docs_, chunk_size):
    """With overlap=0 the chunks partition the token stream: their
    concatenation per doc equals the doc's tokens."""
    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    chunks = text.chunk_tokens(df, "doc_id", "text", chunk_size, overlap=0)
    rebuilt = {
        r["id"]: r["toks"]
        for r in chunks.groupBy("id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk"))
                ).chunk
            ).alias("toks")
        )
        .collect()
    }
    for i, d in enumerate(docs_):
        toks = [t for t in d.lower().split() if t]
        if toks:
            assert rebuilt[i] == toks
        else:
            assert i not in rebuilt


@given(st.lists(texts, min_size=1, max_size=6))
@FEW
def test_tfidf_tf_sums_to_token_count(spark, docs_):
    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    out = text.tf_idf(df, "doc_id", "text")
    sums = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()
    }
    for i, d in enumerate(docs_):
        n = len([t for t in d.lower().split() if t])
        assert sums.get(i, 0) == n


@given(st.lists(texts, min_size=1, max_size=6))
@FEW
def test_term_freq_pairs_is_a_counter(spark, docs_):
    """In-row run-length tf == collections.Counter of the tokens."""
    from collections import Counter

    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    rows = df.select(
        "doc_id", F.explode(text.term_freq_pairs("text")).alias("p")
    ).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["p"]["token"]] = r["p"]["tf"]
    for i, d in enumerate(docs_):
        want = dict(Counter(t for t in d.lower().split() if t))
        assert got.get(i, {}) == want


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=4,
        max_size=40,
    )
)
@FEW
def test_winsorize_bounded_monotone_and_lossless(spark, vals):
    """Clipped values equal numpy's interpolated quantile band clip,
    row count is preserved, and clipping is monotone (order of raw
    values never inverts). NOTE: winsorization is deliberately NOT
    idempotent — a second pass clips at the CLIPPED data's
    quantiles, which sit inside the first band."""
    import numpy as np

    from dataframe_spark.operators.quantiles import winsorize

    df = spark.createDataFrame([("g", v) for v in vals], "g string, x double")
    out = winsorize(df, "x", ["g"], 0.1, 0.9)
    rows = sorted((r["x"], r["x_winsorized"]) for r in out.collect())
    assert len(rows) == len(vals)
    lo, hi = np.quantile(np.array(vals), [0.1, 0.9])
    want = sorted(float(np.clip(v, lo, hi)) for v in vals)
    assert [w for _, w in rows] == pytest.approx(want, rel=1e-9, abs=1e-9)
    clipped = [w for _, w in rows]
    assert clipped == sorted(clipped)  # monotone in the raw order


# short alphabet strings maximize near-collisions (shared grams,
# vacuous-bound shorties, empty strings)
fuzzy_strings = st.text(alphabet="abc ", min_size=0, max_size=8)


@given(st.lists(fuzzy_strings, min_size=2, max_size=10, unique=True))
@FEW
def test_edit_distance_pairs_equals_brute_force(spark, vals):
    from itertools import combinations

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    df = from_named_columns(
        spark, {"id": list(range(len(vals))), "s": vals}
    ).df
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in dedup.edit_distance_pairs(
            df, "id", "s", k=2, q=2, dedup_values=False
        ).collect()
    }
    want = {
        (i, j, lev(vals[i], vals[j]))
        for i, j in combinations(range(len(vals)), 2)
        if lev(vals[i], vals[j]) <= 2
    }
    assert got == want


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.floats(0.0, 1.0), min_size=1, max_size=4),
)
@FEW
def test_exact_quantiles_match_numpy(spark, vals, probs):
    """The r5 two-pass histogram-refine engine must agree with
    numpy's linear interpolation on arbitrary doubles and probs —
    including duplicated values, p=0/1, and heavy ties."""
    import numpy as np

    from dataframe_spark.operators.quantiles import exact_quantiles

    df = from_named_columns(spark, {"v": vals}).df
    got = {
        round(r["prob"], 9): r["value"]
        for r in exact_quantiles(df, ["v"], sorted(set(probs))).collect()
    }
    for p in sorted(set(probs)):
        expect = float(np.quantile(np.array(vals, dtype="float64"), p))
        assert got[round(p, 9)] == pytest.approx(expect, rel=1e-9, abs=1e-9)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@FEW
def test_grouped_exact_quantiles_match_numpy(spark, rows):
    import numpy as np

    from dataframe_spark.operators.quantiles import exact_quantiles_grouped

    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], round(r["prob"], 9)): r["value"]
        for r in exact_quantiles_grouped(df, ["g"], "v", [0.25, 0.5, 0.75]).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        for p in (0.25, 0.5, 0.75):
            expect = float(np.quantile(np.array(vs, dtype="float64"), p))
            assert got[(g, round(p, 9))] == pytest.approx(
                expect, rel=1e-9, abs=1e-9
            )


def _brute_remove_spans(docs_, window, min_docs=2):
    """Pure-Python reimplementation of remove_duplicated_spans'
    contract: canonical = smallest (id, pos) per qualifying span."""
    toks = {i: d.lower().split() for i, d in enumerate(docs_)}
    occ = {}
    for i, t in toks.items():
        for p in range(max(0, len(t) - window + 1)):
            occ.setdefault(" ".join(t[p : p + window]), []).append((i, p))
    covered = {i: set() for i in toks}
    for span, hits in occ.items():
        if len({i for i, _ in hits}) < min_docs:
            continue
        canon = min(hits)
        for i, p in hits:
            if (i, p) != canon:
                covered[i].update(range(p, p + window))
    return {
        i: " ".join(tok for p, tok in enumerate(t) if p not in covered[i])
        for i, t in toks.items()
    }


@given(st.lists(texts, min_size=2, max_size=7), st.integers(2, 3))
@FEW
def test_remove_duplicated_spans_equals_brute_force(spark, docs_, window):
    from dataframe_spark.operators.dedup import remove_duplicated_spans

    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    got = {
        r["id"]: r["clean_text"]
        for r in remove_duplicated_spans(
            df, "doc_id", "text", window=window
        ).collect()
    }
    assert got == _brute_remove_spans(docs_, window)


@given(st.lists(texts, min_size=1, max_size=6))
@FEW
def test_dsir_scores_match_python(spark, docs_):
    """dsir_scores equals a pure-Python reimplementation of the
    hashed {1,2}-gram importance weight (portable md5 buckets)."""
    import hashlib
    import math

    from dataframe_spark.operators import dsir

    B, a = 64, 0.01
    df = from_named_columns(
        spark, {"doc_id": list(range(len(docs_))), "text": docs_}
    ).df
    target = df.where(F.col("doc_id") == 0)

    def buckets_of(s):
        t = [w for w in s.lower().split() if w]
        grams = t + [f"{x} {y}" for x, y in zip(t, t[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams
        ]

    rc, tc = [0] * B, [0] * B
    for i, d in enumerate(docs_):
        for b in buckets_of(d):
            rc[b] += 1
            if i == 0:
                tc[b] += 1
    rn, tn = sum(rc), sum(tc)
    lr = [
        math.log((tc[b] + a) / (tn + a * B))
        - math.log((rc[b] + a) / (rn + a * B))
        for b in range(B)
    ]
    expect = {
        i: round(sum(lr[b] for b in buckets_of(d)), 6)
        for i, d in enumerate(docs_)
    }
    ratios = dsir.dsir_log_ratios(df, target, "text", buckets=B, alpha=a)
    got = {
        r["id"]: round(r["score"], 6)
        for r in dsir.dsir_scores(df, "doc_id", "text", ratios, B).collect()
    }
    assert got == pytest.approx(expect)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=12,
    )
)
@FEW
def test_pagerank_matches_python_power_iteration(spark, edges_):
    from dataframe_spark.operators.graph import pagerank

    # symmetrize so no node dangles
    und = sorted({(a, b) for a, b in edges_} | {(b, a) for a, b in edges_})
    nodes = sorted({n for e in und for n in e})
    od = {}
    for a, _ in und:
        od[a] = od.get(a, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        nxt = {v: 0.15 / n for v in nodes}
        for a, b in und:
            nxt[b] += 0.85 * r[a] / od[a]
        r = nxt
    df = spark.createDataFrame(und, "src long, dst long")
    got = {
        row["node"]: row["rank"]
        for row in pagerank(df, iters=5).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aaaa", "bbbb", "cc", "dddd", ""]),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
@FEW
def test_dedup_paragraphs_equals_brute_force(spark, paras_):
    from dataframe_spark.operators.dedup import dedup_paragraphs

    docs_ = ["|".join(p) for p in paras_]
    MIN = 3
    # python brute force: global keep-first of trimmed paras >= MIN chars
    seen = set()
    want = {}
    for i, txt in enumerate(docs_):
        kept, removed, parts = [], 0, txt.split("|")
        for p in parts:
            t = p.strip()
            if len(t) < MIN:
                kept.append(p)
            elif t not in seen:
                seen.add(t)
                kept.append(p)
            else:
                removed += 1
        want[i] = (len(parts), removed, "|".join(kept))
    df = spark.createDataFrame(
        list(enumerate(docs_)), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_paras"], r["n_removed"], r["clean_text"])
        for r in dedup_paragraphs(
            df, "doc_id", "text", sep="|", min_chars=MIN
        ).collect()
    }
    assert got == want


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.floats(min_value=0.05, max_value=1.0),
)
@FEW
def test_ewma_matches_pandas(spark, vals, alpha):
    import pandas as pd

    from dataframe_spark.operators.window import ewma

    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (1, base + timedelta(hours=i), i, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
    got = [
        r["ewma"]
        for r in ewma(df, ["k"], "ts", "v", alpha=alpha,
                      tiebreak_cols=["eid"])
        .orderBy("eid").collect()
    ]
    want = pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().tolist()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.integers(0, 1)),
        min_size=1,
        max_size=15,
    )
)
@FEW
def test_kaplan_meier_matches_python(spark, pairs):
    from dataframe_spark.core import DataFrame

    # python reference KM over distinct durations
    times = sorted({t for t, _ in pairs})
    n_all = len(pairs)
    want, s, used = {}, 1.0, 0
    for t in times:
        d = sum(1 for x, e in pairs if x == t and e == 1)
        m = sum(1 for x, _ in pairs if x == t)
        r = n_all - used
        if d > 0:
            s *= (r - d) / r
        want[t] = (r, d, m - d, s)
        used += m
    df = DataFrame(spark.createDataFrame(pairs, "d int, e int"))
    got = {
        r["t"]: (r["n_risk"], r["n_event"], r["n_censored"], r["survival"])
        for r in df.kaplan_meier("d", "e").collect()
    }
    assert set(got) == set(want)
    for t in times:
        assert got[t][:3] == want[t][:3]
        assert abs(got[t][3] - want[t][3]) < 1e-9
