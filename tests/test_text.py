"""Text-operator tests: token counts, quality, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.operators import text as T


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "the quick brown fox is on the hill"),
        (2, "der hund ist auf der straße und die katze"),
        (3, "xyzzy plugh"),
        (4, "   spaced    out   tokens  "),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_token_count(frame):
    out = {r["id"]: r["n"] for r in frame.select("id", T.token_count("text").alias("n")).collect()}
    assert out[1] == 8
    assert out[4] == 3


def test_quality_score_bounds(frame):
    vals = [r["q"] for r in frame.select(T.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_lang_id(frame):
    out = {r["id"]: r["lang"] for r in frame.select("id", T.lang_id("text").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "unknown"


def test_fingerprint_deterministic_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world"), (3, "hello worlds")],
        "id long, text string",
    )
    out = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint("text").alias("fp")).collect()}
    assert out[1] == out[2]  # normalized
    assert out[1] != out[3]
    assert 0 <= out[1] < 1000000007


def test_vocabulary_top_n(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b")], "id long, text string"
    )
    out = {r["token"]: r["n"] for r in T.vocabulary(df, "text").collect()}
    assert out == {"a": 3, "b": 3, "c": 1}
    top = T.vocabulary(df, "text", top_n=2).collect()
    # ties on n broken by token text
    assert [(r["token"], r["n"]) for r in top] == [("a", 3), ("b", 3)]


def test_tf_idf(spark):
    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat fish"), (3, "cat cat bird")],
        "id long, text string",
    )
    import math

    rows = T.tf_idf(df, "id", "text").collect()
    by = {(r["doc_id"], r["token"]): r for r in rows}
    # 'cat' appears in all 3 docs -> idf = ln(1) = 0
    assert by[(1, "cat")]["tfidf"] == 0.0
    # 'dog': tf=1, df=1 -> ln(3)
    assert abs(by[(1, "dog")]["tfidf"] - math.log(3)) < 1e-9
    # 'cat' in doc 3 has tf=2
    assert by[(3, "cat")]["tf"] == 2


def test_term_freq_pairs_matches_explode_groupby(docs):
    """The in-row run-length tf must equal the explode+groupBy tf on
    real corpus text (including empty/whitespace-edge docs)."""
    from pyspark.sql import functions as F

    docs = docs.limit(200)
    inrow = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in docs.select(
            "doc_id", F.explode(T.term_freq_pairs("text")).alias("p")
        )
        .select("doc_id", "p.token", "p.tf")
        .collect()
    }
    ref = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in docs.select("doc_id", F.explode(T.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    }
    assert inrow == ref and len(ref) > 0


def test_term_freq_pairs_edge_cases(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a a a"), (2, ""), (3, "   "), (4, None), (5, "x")],
        "id long, text string",
    )
    rows = df.select(
        "id", T.term_freq_pairs("text").alias("p")
    ).collect()
    by = {r["id"]: r["p"] for r in rows}
    assert [(p["token"], p["tf"]) for p in by[1]] == [("a", 3)]
    assert by[2] == [] and by[3] == []
    assert by[4] is None  # null text propagates
    assert [(p["token"], p["tf"]) for p in by[5]] == [("x", 1)]


def test_chunk_tokens_grid_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, ""), (3, "solo")],
        "id long, text string",
    )
    out = T.chunk_tokens(df, "id", "text", chunk_size=4, overlap=1).collect()
    by = {(r["id"], r["chunk_idx"]): r for r in out}
    # doc 1: starts at 0,3,6 -> chunks of 4,4,4 tokens; a start at 9
    # would emit [t9] alone, wholly contained in the chunk at 6 —
    # suppressed since the r5 redundant-tail fix
    assert [by[(1, i)]["n_tokens"] for i in range(3)] == [4, 4, 4]
    assert (1, 3) not in by
    assert by[(1, 1)]["chunk"][0] == "t3"  # overlap of 1: second chunk starts at t3
    # every token still covered: the union of chunks spans t0..t9
    covered = set()
    for i in range(3):
        covered.update(by[(1, i)]["chunk"])
    assert covered == {f"t{i}" for i in range(10)}
    # empty text -> no chunks; single token -> one chunk
    assert not any(r["id"] == 2 for r in out)
    assert by[(3, 0)]["n_tokens"] == 1


def test_token_budget_select_greedy(spark):
    df = spark.createDataFrame(
        [(1, "a " * 30, "s"), (2, "b " * 30, "s"), (3, "c " * 30, "s")],
        "id long, text string, grp string",
    )
    from pyspark.sql import functions as F

    # equal quality -> tie-break by id; budget fits exactly 2 docs
    out = T.token_budget_select(df, "id", "text", "grp", budget=60).collect()
    assert sorted(r["id"] for r in out) == [1, 2]


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top word 3/4, dup words 2/4 (distinct a,b)
            (2, "x y z"),           # no repetition
            (3, "go go go go"),     # fully repeated; bigrams all equal
            (4, ""),                # empty -> null fractions
        ],
        "id long, text string",
    )
    by = {r["id"]: r for r in T.repetition_metrics(df, "id", "text").collect()}
    assert by[1]["top_word_frac"] == 0.75
    assert by[1]["dup_word_frac"] == 0.5
    assert by[2]["dup_word_frac"] == 0.0
    assert by[2]["dup_2gram_frac"] == 0.0
    assert by[3]["top_word_frac"] == 1.0
    # 3 bigrams "go go", 1 distinct -> 2/3 duplicated
    assert abs(by[3]["dup_2gram_frac"] - 0.6667) < 1e-4
    assert by[4]["n_tokens"] == 0 and by[4]["dup_word_frac"] is None


def test_redact_sequential_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com or a@b.com call 555-1234"), (2, "clean text")],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in T.redact(
            df, "text", {"email": "[a-z0-9.]+@[a-z0-9.]+", "phone": "555-[0-9]{4}"}
        ).collect()
    }
    assert out[1]["n_redactions"] == 3
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL> call <PHONE>"
    assert out[2]["n_redactions"] == 0
    assert out[2]["redacted"] == "clean text"


def test_repetition_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b a")], "id long, text string")
    plan = (
        T.repetition_metrics(df, "id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences(spark):
    rows = [(1, i, 40, "s") for i in range(10)]  # 10 chunks x 40 tokens
    df = spark.createDataFrame(rows, "id long, chunk_idx int, n_tokens int, shard string")
    out = T.pack_sequences(
        df, seq_len=100, group_col="shard", order_by=["id", "chunk_idx"]
    ).collect()
    # offsets 0,40,80,... -> packs: floor(offset/100)
    packs = {r["chunk_idx"]: r["pack_id"] for r in out}
    assert packs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_mixture_select_deterministic_rates(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "id long, grp string",
    )
    kept = T.mixture_select(
        df, "grp", {"a": 1.0, "b": 0.25}, key_cols=[F.col("id").cast("string")]
    )
    counts = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["a"] == 1000                # rate 1.0 keeps everything
    assert 150 < counts["b"] < 350            # ~250 expected
    # deterministic: identical selection on re-run
    ids1 = sorted(r["id"] for r in kept.collect())
    ids2 = sorted(r["id"] for r in kept.collect())
    assert ids1 == ids2
    # default_rate=0 drops unlisted groups
    none_kept = T.mixture_select(
        df, "grp", {"a": 0.5}, key_cols=[F.col("id").cast("string")]
    ).where(F.col("grp") == "b")
    assert none_kept.count() == 0


def test_remove_boilerplate_lines(spark):
    """Lines recurring in >= min_docs docs vanish everywhere; blank
    and doc-specific lines survive with order intact."""
    from dataframe_spark.operators.text import remove_boilerplate_lines

    footer = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n\n{footer}"),
            (2, f"beta two\nSubscribe To Our Newsletter  "),  # case/trim variant
            (3, f"gamma three\n{footer}\ngamma tail"),
            (4, "delta only"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, "doc_id", "text", min_docs=3)
        .collect()
    }
    assert out[1]["cleaned"] == "alpha one\n"          # blank line kept
    assert out[2]["cleaned"] == "beta two"
    assert out[3]["cleaned"] == "gamma three\ngamma tail"
    assert out[4]["cleaned"] == "delta only"
    assert out[3]["n_lines_removed"] == 1 and out[4]["n_lines_removed"] == 0


def test_remove_boilerplate_lines_counts_distinct_docs(spark):
    """Duplicate rows of the SAME document must not inflate a line's
    document frequency (review r4): dfreq is countDistinct(id), so a
    doc-specific line repeated across a doc's rows stays intact."""
    from dataframe_spark.operators.text import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "unique alpha\nfooter"), (1, "unique alpha\nfooter"),
         (2, "solo beta")],
        "doc_id long, text string",
    )
    out = remove_boilerplate_lines(docs, "doc_id", "text", min_docs=2).collect()
    assert all(r["cleaned"] == r["text"] for r in out)
    assert all(r["n_lines_removed"] == 0 for r in out)


def test_remove_boilerplate_lines_no_boilerplate(spark):
    from dataframe_spark.operators.text import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "c\nd")], "doc_id long, text string"
    )
    out = remove_boilerplate_lines(docs, "doc_id", "text").collect()
    assert {r["cleaned"] for r in out} == {"a\nb", "c\nd"}


def test_perplexity_ranks_fluent_below_gibberish(spark):
    """Docs made of corpus-frequent tokens must score lower ppl than
    all-OOV gibberish; uniform-token docs match the closed form."""
    import math

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "qqq www zzz ppp fff ggg"))
    docs = spark.createDataFrame(rows, "id long, text string")
    lm, totals = T.unigram_lm(docs, "text", top_v=5)
    out = {
        r["id"]: r
        for r in T.perplexity_score(docs, "id", "text", lm, totals).collect()
    }
    fluent = [out[i]["ppl"] for i in range(20)]
    assert all(p < out[100]["ppl"] for p in fluent)
    assert all(out[i]["n_tokens"] == 6 for i in range(20))
    # all-OOV doc: ce = -logp_oov = ln(N + V + 1) exactly
    n_total = 20 * 6 + 6
    assert out[100]["cross_entropy"] == pytest.approx(math.log(n_total + 5 + 1))


def test_perplexity_zero_token_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "   "), (3, None)], "id long, text string"
    )
    lm, totals = T.unigram_lm(docs, "text")
    ids = {r["id"] for r in T.perplexity_score(docs, "id", "text", lm, totals).collect()}
    assert ids == {1}


def test_js_divergence_bounds_and_known_cases(spark):
    # identical slices -> 0; disjoint vocabularies -> 1 bit
    same = [(1, "a", "x y z"), (2, "b", "x y z")]
    df = spark.createDataFrame(same, "id long, g string, text string")
    r = T.js_divergence(df, "text", "g", "a", "b").collect()[0]
    assert abs(r["jsd_bits"]) < 1e-12
    assert r["vocab_union"] == 3

    disjoint = [(1, "a", "x y z"), (2, "b", "p q r")]
    df2 = spark.createDataFrame(disjoint, "id long, g string, text string")
    r2 = T.js_divergence(df2, "text", "g", "a", "b").collect()[0]
    assert abs(r2["jsd_bits"] - 1.0) < 1e-12

    # symmetric in the two slices
    half = [(1, "a", "x x y"), (2, "b", "x y y")]
    df3 = spark.createDataFrame(half, "id long, g string, text string")
    ab = T.js_divergence(df3, "text", "g", "a", "b").collect()[0]["jsd_bits"]
    ba = T.js_divergence(df3, "text", "g", "b", "a").collect()[0]["jsd_bits"]
    assert abs(ab - ba) < 1e-12 and 0 < ab < 1


def test_bm25_ranks_rare_term_and_length_norm(spark):
    # doc 1: rare term; docs 2-3: common term only (3 longer);
    # doc 4: no query terms; doc 5: empty (dropped by dl > 0)
    rows = [
        (1, "zebra alpha alpha"),
        (2, "alpha alpha alpha"),
        (3, "alpha alpha alpha beta beta beta beta beta"),
        (4, "beta beta"),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = T.bm25_topk(df, "id", "text", ["zebra", "alpha"], k=10)
    got = [(r["id"], r["bm25"]) for r in out.collect()]
    ids = [i for i, _ in got]
    # only docs containing a query term score > 0
    assert set(ids) == {1, 2, 3}
    # the rare-term doc dominates (idf of 'zebra' >> 'alpha')
    assert ids[0] == 1
    # equal tf, shorter doc wins on length normalization
    assert ids.index(2) < ids.index(3)
    # scores are positive and descending
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0


def test_bm25_topk_limit_and_guards(spark):
    rows = [(i, "alpha " * (i + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = T.bm25_topk(df, "id", "text", ["alpha"], k=7)
    assert out.count() == 7
    with pytest.raises(ValueError):
        T.bm25_topk(df, "id", "text", [])
    with pytest.raises(ValueError):
        T.bm25_topk(df, "id", "text", ["a", "a"])


def test_c4_flags_rules(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),  # good
        (2, "too short"),                                          # < min_words
        (3, "a b c d e f g h i j"),                                # mean_wl 1 < 3
        (4, "this page uses JavaScript frameworks " + "word " * 5),  # bad phrase
        (5, None),                                                 # null text
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in T.c4_flags(df, "text", min_words=5, mean_wl_range=(3.0, 10.0))
        .collect()
    }
    assert out[1]["keep"] and not out[1]["has_bad_phrase"]
    assert not out[2]["keep"] and out[2]["n_words"] == 2
    assert not out[3]["keep"] and out[3]["mean_word_len"] == 1.0
    assert not out[4]["keep"] and out[4]["has_bad_phrase"]
    assert not out[5]["keep"] and not out[5]["has_bad_phrase"]
    # null document audits as NULL n_words, not legacy size() -1
    assert out[5]["n_words"] is None and out[5]["mean_word_len"] is None
    # all input columns survive (audit mode)
    assert "text" in out[1].asDict()


def test_hash_split_leakage_safe_and_stable(spark):
    rows = [(i, f"user{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, key string")
    out = T.hash_split(df, ["key"], {"train": 0.8, "valid": 0.1, "test": 0.1})
    got = out.collect()
    # every row of a key lands in ONE split
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_key.values())
    # deterministic across plans/runs
    again = {r["id"]: r["split"] for r in
             T.hash_split(df, ["key"], {"train": 0.8, "valid": 0.1, "test": 0.1})
             .collect()}
    assert all(again[r["id"]] == r["split"] for r in got)
    # growing the corpus never reassigns an existing key
    bigger = spark.createDataFrame(
        rows + [(1000 + i, f"newuser{i}") for i in range(60)],
        "id long, key string",
    )
    grown = {r["key"]: r["split"] for r in
             T.hash_split(bigger, ["key"],
                          {"train": 0.8, "valid": 0.1, "test": 0.1}).collect()}
    for k, s in by_key.items():
        assert grown[k] == next(iter(s))
    # every row is assigned; with 40 keys the split sizes are lumpy
    # but all three names must be drawn from the configured set
    assert {r["split"] for r in got} <= {"train", "valid", "test"}
    assert len(got) == 400


def test_hash_split_guards(spark):
    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError):
        T.hash_split(df, ["key"], {})
    with pytest.raises(ValueError):
        T.hash_split(df, ["key"], {"train": 0.7, "test": 0.2})
    with pytest.raises(ValueError):
        T.hash_split(df, ["key"], {"train": 1.2, "test": -0.2})


def test_temperature_mixture_rates_and_nulls(spark):
    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "small") for i in range(50)]
        + [(2000 + i, None) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "id long, g string")
    kept = T.temperature_mixture(
        df, "g", [F.col("id").cast("string")], alpha=0.5
    )
    counts = {r["g"]: r["n"] for r in
              kept.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the smallest groups (small=50, null=50) are the reference: kept whole
    assert counts["small"] == 50
    assert counts[None] == 50
    # the dominant group downsamples near rate sqrt(50/400) ~ 0.3536
    assert 100 <= counts["big"] <= 185
    # alpha = 1 is a no-op (every rate 1.0)
    assert (
        T.temperature_mixture(df, "g", [F.col("id").cast("string")], alpha=1.0)
        .count() == 500
    )
    # deterministic: same selection on a second run
    a = sorted(r["id"] for r in kept.collect())
    b = sorted(r["id"] for r in T.temperature_mixture(
        df, "g", [F.col("id").cast("string")], alpha=0.5).collect())
    assert a == b
    with pytest.raises(ValueError):
        T.temperature_mixture(df, "g", ["id"], alpha=-0.1)


def test_bigram_ppl_detects_word_order(spark):
    # 30 fluent docs with a fixed word order + 1 scrambled doc with
    # the SAME bag of tokens: the unigram LM cannot tell them apart;
    # the bigram LM must score the scrambled transitions worse
    fluent = "the cat sat on the mat and the dog sat on the rug"
    scrambled = "mat the on and sat cat rug the dog the on sat the"
    rows = [(i, fluent) for i in range(30)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, "id long, text string")
    bilm, unilm, totals = T.bigram_lm(df, "text", top_v=100, top_b=1000)
    out = {
        r["id"]: r["ppl"]
        for r in T.bigram_perplexity_score(
            df, "id", "text", bilm, unilm, totals, lam=0.7
        ).collect()
    }
    assert out[99] > out[0] * 2
    # same bag of words -> unigram ppl identical for both
    uni = T.perplexity_score(df, "id", "text", unilm, totals)
    got = {r["id"]: r["ppl"] for r in uni.collect()}
    assert abs(got[99] - got[0]) < 1e-9


def test_bigram_ppl_interpolation_floor_and_edges(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "zz qq xx yy"),   # transitions never seen elsewhere
        (3, "single"),        # < 2 tokens: absent
        (4, ""),              # empty: absent
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    bilm, unilm, totals = T.bigram_lm(df, "text", top_v=50, top_b=100)
    out = {r["id"]: r for r in T.bigram_perplexity_score(
        df, "id", "text", bilm, unilm, totals).collect()}
    assert set(out) == {1, 2}
    # unigram back-off keeps every probability finite and positive
    import math
    for r in out.values():
        assert math.isfinite(r["cross_entropy"]) and r["ppl"] > 0
    assert out[1]["n_bigrams"] == 3
    with pytest.raises(ValueError):
        T.bigram_perplexity_score(df, "id", "text", bilm, unilm, totals, lam=1.5)


def test_token_entropy_closed_form(spark):
    import math
    from dataframe_spark.operators.text import token_entropy

    rows = [
        (1, "a a a a"),            # single token: H = 0
        (2, "a b c d"),            # uniform over 4: H = 2 bits
        (3, "a a b"),              # H = -(2/3)log2(2/3) - (1/3)log2(1/3)
        (4, ""),                   # empty doc: explicit zeros
        (5, None),                 # null doc: explicit zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["norm_entropy"] == 0.0
    assert abs(got[2]["entropy"] - 2.0) < 1e-12
    assert abs(got[2]["norm_entropy"] - 1.0) < 1e-12
    h3 = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[3]["entropy"] - h3) < 1e-12
    assert abs(got[3]["norm_entropy"] - h3 / 1.0) < 1e-12  # log2(2)=1
    for i in (4, 5):
        assert got[i]["n_tokens"] == 0 and got[i]["entropy"] == 0.0
        assert got[i]["norm_entropy"] == 0.0


def test_pmi_collocations_closed_form(spark):
    import math
    import pytest as _pytest
    from dataframe_spark.operators.text import pmi_collocations

    # 'x y' always collocates; 'a b' co-occurs at chance
    rows = [(i, "x y a b a c b a") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, "text", min_count=6, top_n=10)
    got = {(r["w1"], r["w2"]): r for r in out.collect()}
    assert ("x", "y") in got
    r = got[("x", "y")]
    # closed form: 48 tokens, 42 bigrams, c(x)=c(y)=6, c_pair=6
    expect = math.log2((6 / 42) / ((6 / 48) * (6 / 48)))
    assert abs(r["pmi"] - round(expect, 4)) < 1e-9
    assert r["c_pair"] == 6 and r["c1"] == 6 and r["c2"] == 6
    # the perfect collocation outranks every chance pair
    assert max(got.values(), key=lambda v: v["pmi"])["pmi"] == r["pmi"]
    # min_count floor excludes rarer pairs entirely
    assert all(v["c_pair"] >= 6 for v in got.values())
    with _pytest.raises(ValueError):
        pmi_collocations(df, "text", min_count=0)


def test_fingerprint_matches_jvm_fold_and_edge_cases(spark):
    """The r9 Arrow kernel must be bit-identical to the portable
    left fold acc←(acc·31+ord)%p the oracle runs (and the pre-r9
    JVM per-character aggregate implemented)."""
    from pyspark.sql import functions as F

    texts = [
        (1, "Hello World"),
        (2, "  padded  "),
        (3, ""),
        (4, None),
        (5, "x" * 5000),
        (6, "naïve café — ünïcode ✓"),
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    jvm_fold = F.aggregate(
        F.filter(F.split(F.lower(F.trim(F.col("text"))), ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(1000000007),
    )
    out = df.select(
        "id",
        T.fingerprint("text").alias("fp"),
        jvm_fold.alias("ref"),
    ).collect()
    for r in out:
        assert r["fp"] == r["ref"], (r["id"], r["fp"], r["ref"])
    by_id = {r["id"]: r["fp"] for r in out}
    assert by_id[3] == 0
    assert by_id[4] is None


def test_ppl_buckets_thirds_and_ordering(docs):
    out = T.ppl_buckets(docs, "doc_id", "text", "lang", top_v=200)
    rows = out.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r["bucket"]] += 1
        # thirds up to tie granularity: no bucket may be empty and
        # none may exceed half the group (the corpus has enough
        # distinct CE values per lang for that to hold)
        assert all(v > 0 for v in sizes.values()), (lang, sizes)
        assert max(sizes.values()) <= n / 2 + 1, (lang, sizes)
        # bucket boundaries respect the CE ordering
        ce = {
            b: [r["cross_entropy"] for r in rs if r["bucket"] == b]
            for b in sizes
        }
        assert max(ce["head"]) <= min(ce["middle"])
        assert max(ce["middle"]) <= min(ce["tail"])


def test_ppl_buckets_deterministic(docs):
    a = T.ppl_buckets(docs, "doc_id", "text", "lang", top_v=200)
    b = T.ppl_buckets(docs, "doc_id", "text", "lang", top_v=200)
    ra = {r["id"]: r["bucket"] for r in a.collect()}
    rb = {r["id"]: r["bucket"] for r in b.collect()}
    assert ra == rb


def test_ppl_buckets_two_labels(docs):
    out = T.ppl_buckets(
        docs, "doc_id", "text", "lang", top_v=200, labels=("keep", "drop")
    )
    rows = out.collect()
    assert set(r["bucket"] for r in rows) == {"keep", "drop"}
