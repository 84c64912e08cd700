"""Text-analysis queries over the documents table with DuckDB
oracles (same formulas expressed in both dialects)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import DataFrame
from ..operators import text as T
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


def q_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_ish_token_count("text").alias("n_subtokens"),
    )


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return docs.select(
        "doc_id",
        T.quality_score("text").alias("quality"),
        F.round(T.stopword_ratio("text"), 4).alias("stop_ratio"),
        F.round(T.punct_ratio("text"), 4).alias("punct_ratio"),
    )


def q_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return (
        docs.select("lang", T.lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return docs.select(
        "doc_id", T.fingerprint("text").alias("fingerprint")
    )


def q_corpus_filter(spark, sf_dir):
    """End-to-end training-data filter pipeline: quality gate +
    language gate + exact near-dup removal (fingerprint keep-first),
    reporting per-source survivor counts. One narrow scoring
    projection, one dedup window shuffle, one agg shuffle."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").df
    scored = docs.select(
        "doc_id",
        "source",
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("pred_lang"),
        T.fingerprint("text").alias("fp"),
    )
    filt = scored.where(
        (F.col("quality") > 0.3) & (F.col("pred_lang") == "en")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = filt.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


def q_vocabulary(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    return T.vocabulary(docs, "text", top_n=50)


def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution
    (operators/text.py token_entropy — wholly in-row via the
    run-length term-frequency kernel, zero shuffle). The oracle
    recomputes H = log2(n) - Σc·log2(c)/n from an explicit
    (doc, token) group-count."""
    docs = _t(spark, sf_dir, "documents").df
    e = T.token_entropy(docs, "doc_id", "text")
    return e.select(
        "id",
        "n_tokens",
        "n_distinct",
        F.round("entropy", 4).alias("entropy"),
        F.round("norm_entropy", 4).alias("norm_entropy"),
    )


def q_pmi(spark, sf_dir):
    """PMI collocation extraction (operators/text.py
    pmi_collocations): top-50 adjacent token pairs by rounded
    pointwise mutual information at pair-count floor 10. Both sides
    order by (pmi desc, w1, w2) — a deterministic total order, so
    the LIMIT cut selects the identical set."""
    docs = _t(spark, sf_dir, "documents").df
    return T.pmi_collocations(docs, "text", min_count=10, top_n=50)


def q_tfidf(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").df
    out = T.tf_idf(docs, "doc_id", "text")
    return (
        out.withColumn("tfidf", F.round("tfidf", 4))
        .orderBy(F.desc("tfidf"), F.asc("doc_id"), F.asc("token"))
        .limit(100)
    )


def q_perplexity(spark, sf_dir):
    """Unigram-LM perplexity quality filter (CCNet-style): train an
    add-one-smoothed LM with a 1000-token vocabulary on the corpus,
    score every document. Cross-entropy is a bounded per-doc float
    sum, rounded on both sides."""
    docs = _t(spark, sf_dir, "documents").df
    lm, totals = T.unigram_lm(docs, "text", top_v=1000)
    out = T.perplexity_score(docs, "doc_id", "text", lm, totals)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("cross_entropy", 4).alias("cross_entropy"),
        F.round("ppl", 2).alias("ppl"),
    )


def q_js_divergence(spark, sf_dir):
    """Token-distribution JSD between two ingest sources (corpus
    drift / mirrored-source similarity)."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.js_divergence(docs, "text", "source", "src0", "src1")
    return out.select(
        F.round("jsd_bits", 6).alias("jsd_bits"),
        "n_tokens_a",
        "n_tokens_b",
        "vocab_union",
    )


def q_doc_chunks(spark, sf_dir):
    """Chunk documents into 64-token windows (overlap 16); verify
    the chunk grid by count/size/first-token per chunk."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.chunk_tokens(docs, "doc_id", "text", chunk_size=64, overlap=16)
    return out.select(
        F.col("id").alias("doc_id"),
        "chunk_idx",
        "n_tokens",
        F.get(F.col("chunk"), 0).alias("first_tok"),
    )


def q_token_budget(spark, sf_dir):
    """Per-source greedy quality-first selection under a 10k-token
    budget."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.token_budget_select(
        docs, "doc_id", "text", "source", budget=10_000
    )
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("grp").alias("source"),
        "n_tokens",
        "quality",
        "cum_tokens",
    )


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (shuffle-free in-row
    plan; see operators/text.py repetition_metrics)."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.repetition_metrics(docs, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "dup_word_frac",
        "top_word_frac",
        "dup_2gram_frac",
    )


def q_redact(spark, sf_dir):
    """PII scrubbing over synthetic contact strings: both engines
    derive the same 'contact userN@example.com or 555-NNNN' suffix,
    then redact emails and phone numbers with identical RE2-safe
    patterns. Redaction counts are SEQUENTIAL (each pattern counts
    on the text as already redacted by earlier patterns)."""
    docs = _t(spark, sf_dir, "documents").df
    aug = docs.withColumn(
        "t",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    out = T.redact(
        aug,
        "t",
        {"email": "[a-z0-9.]+@[a-z0-9.]+", "phone": "555-[0-9]{4}"},
    )
    return out.select(
        "doc_id", "n_redactions", F.expr("right(redacted, 50)").alias("tail")
    )


def q_pack(spark, sf_dir):
    """Training-sequence packing: 64-token chunks laid end-to-end
    into 512-token packs within 8 shards; one pack-level summary row
    per (shard, pack_id)."""
    docs = _t(spark, sf_dir, "documents").df
    chunks = T.chunk_tokens(docs, "doc_id", "text", chunk_size=64).withColumn(
        "shard", (F.col("id") % 8).cast("int")
    )
    packed = T.pack_sequences(
        chunks, seq_len=512, group_col="shard", order_by=["id", "chunk_idx"]
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
    )


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.1}


def q_mixture(spark, sf_dir):
    """Deterministic weighted mixture: each source kept at its target
    rate by a portable md5-derived uniform (same selection on any
    engine — unlike rand() sampling); summarized per source."""
    docs = _t(spark, sf_dir, "documents").df
    kept = T.mixture_select(
        docs,
        "source",
        _MIX_WEIGHTS,
        key_cols=[F.col("doc_id").cast("string")],
        default_rate=0.05,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("checksum"),
    )


def q_boilerplate(spark, sf_dir):
    """Line-level boilerplate removal. The synthetic corpus has no
    newlines, so both engines derive identical line structure first
    (break on the literal token ' the '); a line recurring in >= 2
    distinct docs is then dropped everywhere, order preserved."""
    docs = _t(spark, sf_dir, "documents").df
    lined = docs.select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text")
    )
    out = T.remove_boilerplate_lines(lined, "doc_id", "text", min_docs=2)
    return out.select("doc_id", "cleaned", "n_lines_removed")


def q_bm25(spark, sf_dir):
    """BM25 top-20 retrieval for a fixed 3-term query over the
    documents corpus ('dup' is the rare discriminative term —
    df ≈ 5% — 'vector'/'key' are common): per-doc tf/dl in-row,
    corpus stats in one broadcast one-row agg, global top-k."""
    docs = _t(spark, sf_dir, "documents").df
    return T.bm25_topk(docs, "doc_id", "text", ["dup", "vector", "key"], k=20)


def q_dsir(spark, sf_dir):
    """DSIR data selection (operators/dsir.py, Xie et al. 2023):
    select the 100 documents most like the src0 subcorpus by hashed
    {1,2}-gram importance weight, via deterministic Gumbel-top-k
    resampling. Fully oracle-backed: bucket ids and the Gumbel
    uniform both derive from md5, so DuckDB reproduces the model,
    the scores, and the exact selection; sel_key is rounded BEFORE
    the ordering cut (round-first, the bm25 convention)."""
    from ..operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents").df
    target = docs.where(F.col("source") == "src0")
    return dsir_select(
        docs, target, "doc_id", "text", k=100, buckets=4096, alpha=0.01
    )


def q_c4_filter(spark, sf_dir):
    """C4-style rule-filter audit per source: both engines first
    plant the 'lorem ipsum' bad phrase on every 7th doc (the
    q_redact augmentation convention — the synthetic corpus contains
    none), then apply the word-count band (>= 40), the mean-word-
    length sanity band (3.0..5.0 — the corpus averages ~4.5), and
    the bad-phrase gate, and report per-source rule hit counts."""
    docs = _t(spark, sf_dir, "documents").df
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" lorem ipsum")),
        ).otherwise(F.col("text")),
    )
    out = T.c4_flags(aug, "text", min_words=40, mean_wl_range=(3.0, 5.0))
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.sum((F.col("n_words") < 40).cast("int")).alias("n_too_short"),
        F.sum(F.col("has_bad_phrase").cast("int")).alias("n_bad_phrase"),
        F.round(F.avg("mean_word_len"), 4).alias("avg_word_len"),
    )


def q_hash_split(spark, sf_dir):
    """Leakage-safe split assignment keyed on SOURCE: every document
    of a source lands in the same split (the group-level key is the
    leakage defense — chunks/near-dupes of one origin can never
    straddle train and test). Output pins the full assignment: one
    row per (split, source) with count and id checksum."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.hash_split(
        docs, ["source"], {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return out.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("checksum"),
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature (α = 0.5) resampling over the skewed ``lang``
    column (en dominates the synthetic corpus ~3:1): rare languages
    keep everything, dominant ones downsample toward p^α shares via
    the portable md5 uniform — summarized per language."""
    docs = _t(spark, sf_dir, "documents").df
    kept = T.temperature_mixture(
        docs, "lang", [F.col("doc_id").cast("string")], alpha=0.5
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("checksum"),
    )


def q_bigram_ppl(spark, sf_dir):
    """Interpolated bigram-LM perplexity (context-sensitive upgrade
    of q_perplexity): top-1000 vocab, top-20000 in-vocab bigram
    table, λ = 0.7 ML-bigram weight with add-one unigram back-off.
    Scores the n−1 transitions per doc; fully oracle-backed (both
    model tables are deterministic total orders)."""
    docs = _t(spark, sf_dir, "documents").df
    bilm, unilm, totals = T.bigram_lm(docs, "text", top_v=1000, top_b=20_000)
    out = T.bigram_perplexity_score(
        docs, "doc_id", "text", bilm, unilm, totals, lam=0.7
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("cross_entropy", 4).alias("cross_entropy"),
        F.round("ppl", 2).alias("ppl"),
    )


def q_ppl_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity bucketing (head/middle/
    tail thirds per lang) — the corpus-curation selection knob. The
    cutoffs are per-group quantiles broadcast back (never an NTILE
    window, which would pin each language to one reducer's sort)."""
    docs = _t(spark, sf_dir, "documents").df
    out = T.ppl_buckets(docs, "doc_id", "text", "lang", top_v=1000)
    return out.select(
        F.col("id").alias("doc_id"),
        "lang",
        "n_tokens",
        "cross_entropy",
        "ppl",
        "bucket",
    )


# BPE training is driver-coordinated (one bounded argmax collect per
# merge round); q_bpe and q_bpe_encode share one fit per sf_dir —
# the q_synthesis memoization precedent.
_BPE_CACHE: dict = {}
_BPE_MERGES = 8


def _bpe_model(spark, sf_dir):
    from ..operators import bpe as B

    key = (spark.sparkContext.applicationId, sf_dir, _BPE_MERGES)
    if key not in _BPE_CACHE:
        docs = _t(spark, sf_dir, "documents").df
        model = B.bpe_train(docs, "text", n_merges=_BPE_MERGES)
        # one live fit: bench/certify iterate sf_dirs, and stale
        # (applicationId, sf_dir) keys would otherwise accumulate
        # for the life of the process
        _BPE_CACHE.clear()
        _BPE_CACHE[key] = model
    return _BPE_CACHE[key]


def q_bpe(spark, sf_dir):
    """Distributed BPE tokenizer training: the 8-round merge table
    (rank, lhs, rhs, n). The DuckDB oracle replays the ENTIRE
    training loop (8 chained argmax+greedy-replace CTE stages over
    the same sentinel-char word encoding), so the learned merges are
    value-verified end-to-end, not spot-checked."""
    from ..operators import bpe as B

    return B.bpe_merge_table(spark, _bpe_model(spark, sf_dir))


def q_bpe_encode(spark, sf_dir):
    """Apply the trained BPE model to the corpus: per-document token
    and subtoken counts (the tokenizer's emitted sequence length) —
    in-row JVM replace chain, zero shuffle. Shares q_bpe's fit."""
    from ..operators import bpe as B

    model = _bpe_model(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").df
    out = B.bpe_subtoken_counts(docs, "doc_id", "text", model)
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "n_subtokens"
    )


QUERIES = {
    "q_bigram_ppl": q_bigram_ppl,
    "q_c4_filter": q_c4_filter,
    "q_hash_split": q_hash_split,
    "q_temperature_mix": q_temperature_mix,
    "q_dsir": q_dsir,
    "q_bm25": q_bm25,
    "q_boilerplate": q_boilerplate,
    "q_token_count": q_token_count,
    "q_repetition": q_repetition,
    "q_redact": q_redact,
    "q_pack": q_pack,
    "q_mixture": q_mixture,
    "q_text_quality": q_text_quality,
    "q_lang_id": q_lang_id,
    "q_fingerprint": q_fingerprint,
    "q_vocabulary": q_vocabulary,
    "q_token_entropy": q_token_entropy,
    "q_pmi": q_pmi,
    "q_tfidf": q_tfidf,
    "q_corpus_filter": q_corpus_filter,
    "q_perplexity": q_perplexity,
    "q_js_divergence": q_js_divergence,
    "q_doc_chunks": q_doc_chunks,
    "q_token_budget": q_token_budget,
    "q_ppl_buckets": q_ppl_buckets,
    "q_bpe": q_bpe,
    "q_bpe_encode": q_bpe_encode,
}


def _sql_stops(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


_TOKS = "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), x -> x <> '')"

_LANG_SCORE = {
    lang: f"LEN(LIST_FILTER({_TOKS}, t -> LIST_CONTAINS({_sql_stops(lang)}, t)))"
    for lang in T.STOPWORDS
}

_MIX_CASE = " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in
    [("src0", 1.0), ("src1", 0.75), ("src2", 0.5), ("src3", 0.25), ("src4", 0.1)]
)

ORACLES = {
    "q_bigram_ppl": f"""
        WITH tok AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ), big AS (
          SELECT doc_id,
                 LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g
          FROM tok WHERE LEN(t) >= 2
        ), uni AS (
          SELECT UNNEST(t) AS token FROM tok
        ), counts AS (
          SELECT token, COUNT(*) AS n FROM uni GROUP BY 1
        ), n_tot AS (
          SELECT SUM(n) AS n_total FROM counts
        ), vocab AS (
          SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 1000
        ), vsize AS (
          SELECT COUNT(*) AS v FROM vocab
        ), bgc AS (
          SELECT bigram, COUNT(*) AS c
          FROM (SELECT UNNEST(g) AS bigram FROM big) GROUP BY 1
        ), bilm AS (
          SELECT b.bigram, b.c, v1.n AS n_w1
          FROM bgc b
          JOIN vocab v1 ON v1.token = SPLIT_PART(b.bigram, ' ', 1)
          JOIN vocab v2 ON v2.token = SPLIT_PART(b.bigram, ' ', 2)
          ORDER BY b.c DESC, b.bigram ASC LIMIT 20000
        ), pos AS (
          SELECT doc_id, UNNEST(g) AS bigram FROM big
        ), scored AS (
          SELECT pos.doc_id,
            0.7 * COALESCE(CAST(bilm.c AS DOUBLE) / bilm.n_w1, 0.0)
            + 0.3 * EXP(COALESCE(LN(v2.n + 1) - LN(n_total + v + 1),
                                 -LN(n_total + v + 1))) AS p
          FROM pos
          LEFT JOIN bilm ON pos.bigram = bilm.bigram
          LEFT JOIN vocab v2 ON v2.token = SPLIT_PART(pos.bigram, ' ', 2)
          CROSS JOIN n_tot CROSS JOIN vsize
        )
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          ROUND(-SUM(LN(p)) / COUNT(*), 4) AS cross_entropy,
          ROUND(EXP(-SUM(LN(p)) / COUNT(*)), 2) AS ppl
        FROM scored GROUP BY doc_id
    """,
    "q_c4_filter": f"""
        WITH aug AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' lorem ipsum'
                      ELSE text END AS text
          FROM documents
        ), flags AS (
          SELECT doc_id, source,
            LEN({_TOKS}) AS n_words,
            ROUND(LIST_SUM(LIST_TRANSFORM({_TOKS}, w -> LEN(w)))
                  / NULLIF(CAST(LEN({_TOKS}) AS DOUBLE), 0.0), 4) AS mwl,
            (CONTAINS(LOWER(text), 'lorem ipsum')
             OR CONTAINS(LOWER(text), 'javascript')
             OR CONTAINS(LOWER(text), '{{')) AS bad
          FROM aug
        )
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN n_words >= 40 AND mwl >= 3.0 AND mwl <= 5.0
                        AND NOT bad THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(SUM(CASE WHEN n_words < 40 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_too_short,
          CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_phrase,
          ROUND(AVG(mwl), 4) AS avg_word_len
        FROM flags GROUP BY source
    """,
    "q_hash_split": """
        WITH u AS (
          SELECT doc_id, source,
            CAST('0x' || SUBSTR(MD5(source), 1, 8) AS BIGINT)
              / 4294967296.0 AS u
          FROM documents
        )
        SELECT CASE WHEN u < 0.8 THEN 'train'
                    WHEN u < 0.9 THEN 'valid'
                    ELSE 'test' END AS split,
               source, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS checksum
        FROM u GROUP BY 1, 2
    """,
    "q_temperature_mix": """
        WITH cnt AS (
          SELECT lang AS g, COUNT(*) AS n FROM documents GROUP BY 1
        ), mx AS (
          SELECT MAX(POW(n, -0.5)) AS m FROM cnt
        ), rates AS (
          SELECT g, ROUND(POW(n, -0.5) / m, 6) AS rate
          FROM cnt CROSS JOIN mx
        ), u AS (
          SELECT doc_id, lang,
            CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              / 4294967296.0 AS u
          FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS checksum
        FROM u JOIN rates ON u.lang = rates.g
        WHERE u.u < rates.rate GROUP BY lang
    """,
    "q_dsir": f"""
        WITH tok AS (
          SELECT doc_id, source, {_TOKS} AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, source,
                 LIST_CONCAT(t, LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
                             i -> t[i] || ' ' || t[i+1])) AS g
          FROM tok
        ),
        feat AS (
          SELECT doc_id, source,
                 UNNEST(LIST_TRANSFORM(g, s ->
                   CAST('0x' || SUBSTR(MD5(s), 1, 8) AS BIGINT) % 4096))
                   AS bucket
          FROM grams
        ),
        rc AS (SELECT bucket, COUNT(*) AS rcnt FROM feat GROUP BY bucket),
        tc AS (SELECT bucket, COUNT(*) AS tcnt FROM feat
               WHERE source = 'src0' GROUP BY bucket),
        tot AS (
          SELECT (SELECT COUNT(*) FROM feat) AS rn,
                 (SELECT COUNT(*) FROM feat WHERE source = 'src0') AS tn
        ),
        ratio AS (
          SELECT d.b AS bucket,
                 LN((COALESCE(tc.tcnt, 0) + 0.01) / (tot.tn + 0.01 * 4096))
               - LN((COALESCE(rc.rcnt, 0) + 0.01) / (tot.rn + 0.01 * 4096))
                   AS lr
          FROM (SELECT UNNEST(GENERATE_SERIES(0, 4095)) AS b) d
          LEFT JOIN rc ON rc.bucket = d.b
          LEFT JOIN tc ON tc.bucket = d.b
          CROSS JOIN tot
        ),
        persc AS (
          SELECT f.doc_id, SUM(r.lr) AS s
          FROM feat f JOIN ratio r ON f.bucket = r.bucket
          GROUP BY f.doc_id
        ),
        scores AS (
          SELECT t.doc_id, COALESCE(p.s, 0.0) AS score
          FROM tok t LEFT JOIN persc p ON t.doc_id = p.doc_id
        )
        SELECT doc_id AS id, ROUND(score, 4) AS score,
               ROUND(score - LN(-LN(
                 (CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 0.5) / 4294967296.0)), 6) AS sel_key
        FROM scores
        ORDER BY sel_key DESC, doc_id ASC LIMIT 100
    """,
    "q_bm25": f"""
        WITH base AS (
          SELECT doc_id,
                 LEN({_TOKS}) AS dl,
                 LEN(LIST_FILTER({_TOKS}, t -> t = 'dup')) AS tf0,
                 LEN(LIST_FILTER({_TOKS}, t -> t = 'vector')) AS tf1,
                 LEN(LIST_FILTER({_TOKS}, t -> t = 'key')) AS tf2
          FROM documents
          WHERE LEN({_TOKS}) > 0
        ), stats AS (
          SELECT COUNT(*) AS n_docs,
                 AVG(dl) AS avgdl,
                 SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                 SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
          FROM base
        )
        SELECT doc_id AS id,
               ROUND(
                 LN(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                   * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + LN(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                   * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + LN(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                   * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               , 4) AS bm25
        FROM base CROSS JOIN stats
        WHERE ROUND(
                 LN(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                   * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + LN(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                   * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + LN(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                   * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               , 4) > 0
        ORDER BY bm25 DESC, id ASC LIMIT 20
    """,
    "q_boilerplate": """
        WITH lined AS (
          SELECT doc_id, replace(text, ' the ', chr(10)) AS text
          FROM documents
        ),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM lined),
        lines AS (
          SELECT doc_id, unnest(arr) AS line,
                 generate_subscripts(arr, 1) AS ord
          FROM ls
        ),
        freq AS (
          SELECT lower(trim(line)) AS nl, COUNT(DISTINCT doc_id) AS n
          FROM lines WHERE trim(line) <> '' GROUP BY 1
        ),
        boiler AS (SELECT nl FROM freq WHERE n >= 2),
        kept AS (
          SELECT l.doc_id, l.line, l.ord
          FROM lines l LEFT JOIN boiler b ON lower(trim(l.line)) = b.nl
          WHERE b.nl IS NULL
        ),
        rebuilt AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY ord) AS cleaned,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT ls.doc_id,
               COALESCE(r.cleaned, '') AS cleaned,
               (len(ls.arr) - COALESCE(r.n_kept, 0))::BIGINT
                 AS n_lines_removed
        FROM ls LEFT JOIN rebuilt r ON ls.doc_id = r.doc_id
    """,
    "q_mixture": f"""
        WITH u AS (
          SELECT doc_id, source,
            CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              / 4294967296.0 AS u
          FROM documents
        )
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS checksum
        FROM u
        WHERE u < CASE source {_MIX_CASE} ELSE 0.05 END
        GROUP BY source
    """,
    "q_pack": f"""
        WITH tok AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ), grid AS (
          SELECT doc_id, t,
            UNNEST(GENERATE_SERIES(0, GREATEST(LEN(t) - 1, 0), 64)) AS start
          FROM tok
        ), chunks AS (
          SELECT doc_id, CAST(start / 64 AS INT) AS chunk_idx,
                 LEN(LIST_SLICE(t, start + 1, start + 64)) AS n_tokens,
                 CAST(doc_id % 8 AS INT) AS shard
          FROM grid WHERE LEN(LIST_SLICE(t, start + 1, start + 64)) > 0
        ), packed AS (
          SELECT shard, n_tokens,
            CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id, chunk_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
            AS INT) AS pack_id
          FROM chunks
        )
        SELECT shard, pack_id, COUNT(*) AS n_chunks,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM packed GROUP BY 1, 2
    """,
    "q_repetition": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS l FROM documents
        ), g AS (
          SELECT doc_id, LEN(l) AS n, LEN(LIST_DISTINCT(l)) AS nd,
            CASE WHEN LEN(l) >= 2
                 THEN [l[i] || ' ' || l[i+1] FOR i IN RANGE(1, LEN(l))]
                 ELSE [] END AS grams
          FROM toks
        ), top AS (
          SELECT doc_id AS tid, MAX(c) AS top_run FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(l) AS w FROM toks) GROUP BY 1, 2
          ) GROUP BY 1
        )
        SELECT g.doc_id, n AS n_tokens,
          ROUND((n - nd) / NULLIF(CAST(n AS DOUBLE), 0.0), 4) AS dup_word_frac,
          ROUND(top_run / NULLIF(CAST(n AS DOUBLE), 0.0), 4) AS top_word_frac,
          ROUND((LEN(grams) - LEN(LIST_DISTINCT(grams)))
                / NULLIF(CAST(LEN(grams) AS DOUBLE), 0.0), 4) AS dup_2gram_frac
        FROM g JOIN top ON g.doc_id = top.tid
    """,
    "q_redact": """
        WITH aug AS (
          SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com or 555-'
                 || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
          FROM documents
        ), s1 AS (
          SELECT doc_id,
                 LEN(REGEXP_EXTRACT_ALL(t, '[a-z0-9.]+@[a-z0-9.]+')) AS c1,
                 REGEXP_REPLACE(t, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g') AS t1
          FROM aug
        )
        SELECT doc_id,
               c1 + LEN(REGEXP_EXTRACT_ALL(t1, '555-[0-9]{4}')) AS n_redactions,
               RIGHT(REGEXP_REPLACE(t1, '555-[0-9]{4}', '<PHONE>', 'g'), 50) AS tail
        FROM s1
    """,
    "q_doc_chunks": f"""
        WITH tok AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ), grid AS (
          SELECT doc_id, t,
            UNNEST(GENERATE_SERIES(0, GREATEST(LEN(t) - 17, 0), 48)) AS start
          FROM tok
        )
        SELECT doc_id,
          CAST(start / 48 AS INT) AS chunk_idx,
          LEN(LIST_SLICE(t, start + 1, start + 64)) AS n_tokens,
          LIST_SLICE(t, start + 1, start + 64)[1] AS first_tok
        FROM grid
        WHERE LEN(LIST_SLICE(t, start + 1, start + 64)) > 0
    """,
    "q_token_budget": f"""
        WITH scored AS (
          SELECT doc_id, source,
            LEN({_TOKS}) AS n_tok,
            {_LANG_SCORE['en']} AS n_stop,
            (STRLEN(text) - STRLEN(REGEXP_REPLACE(text, '[^\\p{{L}}\\p{{N}}_\\s]', '', 'g')))
              / NULLIF(CAST(STRLEN(text) AS DOUBLE), 0.0) AS praw
          FROM documents
        ), q AS (
          SELECT doc_id, source, n_tok,
            CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0 ELSE
              ROUND(GREATEST(
              (LEAST(n_tok / 50.0, 1.0) * 0.5
               + LEAST(n_stop / NULLIF(CAST(n_tok AS DOUBLE), 0.0) * 5.0, 1.0) * 0.5)
              - LEAST(praw * 2.0, 1.0) * 0.25, 0.0), 4) END AS quality
          FROM scored
        ), cum AS (
          SELECT doc_id, source, n_tok AS n_tokens, quality,
            CAST(SUM(n_tok) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS cum_tokens
          FROM q
        )
        SELECT doc_id, source, n_tokens, quality, cum_tokens
        FROM cum WHERE cum_tokens <= 10000
    """,
    "q_corpus_filter": f"""
        WITH base AS (
          SELECT doc_id, source,
            LEN({_TOKS}) AS n_tok,
            {_LANG_SCORE['de']} AS s_de, {_LANG_SCORE['en']} AS s_en,
            {_LANG_SCORE['es']} AS s_es, {_LANG_SCORE['fr']} AS s_fr,
            (STRLEN(text) - STRLEN(REGEXP_REPLACE(text, '[^\\p{{L}}\\p{{N}}_\\s]', '', 'g')))
              / NULLIF(CAST(STRLEN(text) AS DOUBLE), 0.0) AS praw,
            LIST_REDUCE(
              LIST_PREPEND(CAST(0 AS BIGINT),
                LIST_TRANSFORM(
                  LIST_FILTER(STRING_SPLIT(LOWER(TRIM(text)), ''), c -> c <> ''),
                  c -> CAST(ORD(c) AS BIGINT))),
              (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp
          FROM documents
        ), scored AS (
          SELECT doc_id, source, fp,
            CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0 ELSE
              ROUND(GREATEST(
              (LEAST(n_tok / 50.0, 1.0) * 0.5
               + LEAST(s_en / NULLIF(CAST(n_tok AS DOUBLE), 0.0) * 5.0, 1.0) * 0.5)
              - LEAST(praw * 2.0, 1.0) * 0.25, 0.0), 4) END AS quality,
            CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                 WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr' END AS pred_lang
          FROM base
        ), kept AS (
          SELECT source, quality,
            ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM scored
          WHERE quality > 0.3 AND pred_lang = 'en'
        )
        SELECT source, COUNT(*) AS n_docs,
               ROUND(AVG(quality), 4) AS avg_quality
        FROM kept WHERE rn = 1 GROUP BY source
    """,
    "q_token_entropy": f"""
        WITH tok AS (
          SELECT doc_id AS id, {_TOKS} AS t FROM documents
        ), tf AS (
          SELECT id, token, COUNT(*) AS c
          FROM (SELECT id, UNNEST(t) AS token FROM tok) GROUP BY 1, 2
        ), h AS (
          SELECT id, CAST(SUM(c) AS BIGINT) AS n,
                 COUNT(*) AS nd,
                 SUM(c * LOG2(c)) AS s
          FROM tf GROUP BY 1
        )
        SELECT tok.id,
               COALESCE(h.n, 0) AS n_tokens,
               COALESCE(h.nd, 0) AS n_distinct,
               CASE WHEN COALESCE(h.n, 0) <= 0 THEN 0.0
                    ELSE ROUND(LOG2(h.n) - h.s / h.n, 4) END AS entropy,
               CASE WHEN COALESCE(h.nd, 0) <= 1 THEN 0.0
                    ELSE ROUND((LOG2(h.n) - h.s / h.n) / LOG2(h.nd), 4)
                    END AS norm_entropy
        FROM tok LEFT JOIN h ON tok.id = h.id
    """,
    "q_pmi": f"""
        WITH tok AS (
          SELECT {_TOKS} AS t FROM documents
        ), uni AS (
          SELECT token, COUNT(*) AS n
          FROM (SELECT UNNEST(t) AS token FROM tok) GROUP BY 1
        ), big AS (
          SELECT bigram, COUNT(*) AS c_pair
          FROM (
            SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
                          i -> t[i] || ' ' || t[i+1])) AS bigram
            FROM tok WHERE LEN(t) >= 2
          ) GROUP BY 1
        ), tot AS (
          SELECT (SELECT CAST(SUM(n) AS DOUBLE) FROM uni) AS n_tok,
                 (SELECT CAST(SUM(c_pair) AS DOUBLE) FROM big) AS n_pair
        )
        SELECT w1, w2, c_pair, c1, c2,
               ROUND(LOG2((c_pair / n_pair)
                          / ((c1 / n_tok) * (c2 / n_tok))), 4) AS pmi
        FROM (
          SELECT SPLIT_PART(bigram, ' ', 1) AS w1,
                 SPLIT_PART(bigram, ' ', 2) AS w2, c_pair
          FROM big WHERE c_pair >= 10
        ) b
        JOIN (SELECT token AS w1, n AS c1 FROM uni) u1 USING (w1)
        JOIN (SELECT token AS w2, n AS c2 FROM uni) u2 USING (w2)
        CROSS JOIN tot
        ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 50
    """,
    "q_vocabulary": f"""
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST({_TOKS}) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token ASC LIMIT 50
    """,
    "q_js_divergence": f"""
        WITH tok AS (
          SELECT source AS g, UNNEST({_TOKS}) AS t FROM documents
          WHERE source IN ('src0', 'src1')
        ), c AS (
          SELECT t,
                 SUM(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS nb
          FROM tok GROUP BY t
        ), tt AS (
          SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
          FROM c
        ), contrib AS (
          SELECT
            (CASE WHEN na > 0 THEN
               0.5 * (na / CAST(ta AS DOUBLE))
                   * LN((na / CAST(ta AS DOUBLE))
                        / ((na / CAST(ta AS DOUBLE)
                            + nb / CAST(tb AS DOUBLE)) / 2.0))
             ELSE 0.0 END)
            + (CASE WHEN nb > 0 THEN
               0.5 * (nb / CAST(tb AS DOUBLE))
                   * LN((nb / CAST(tb AS DOUBLE))
                        / ((na / CAST(ta AS DOUBLE)
                            + nb / CAST(tb AS DOUBLE)) / 2.0))
             ELSE 0.0 END) AS ct,
            ta, tb
          FROM c CROSS JOIN tt
        )
        SELECT ROUND(SUM(ct) / LN(2.0), 6) AS jsd_bits,
               MAX(ta) AS n_tokens_a, MAX(tb) AS n_tokens_b,
               COUNT(*) AS vocab_union
        FROM contrib
    """,
    "q_perplexity": f"""
        WITH tok AS (
          SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
        ), counts AS (
          SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
        ), n_tot AS (
          SELECT SUM(n) AS n_total FROM counts
        ), vocab AS (
          SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 1000
        ), vsize AS (
          SELECT COUNT(*) AS v FROM vocab
        ), lm AS (
          SELECT token, LN(n + 1) - LN(n_total + v + 1) AS logp
          FROM vocab CROSS JOIN n_tot CROSS JOIN vsize
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        )
        SELECT doc_id,
          CAST(SUM(tf) AS BIGINT) AS n_tokens,
          ROUND(-SUM(tf * COALESCE(logp, -LN(n_total + v + 1))) / SUM(tf), 4)
            AS cross_entropy,
          ROUND(EXP(-SUM(tf * COALESCE(logp, -LN(n_total + v + 1))) / SUM(tf)), 2)
            AS ppl
        FROM tf LEFT JOIN lm USING (token)
        CROSS JOIN n_tot CROSS JOIN vsize
        GROUP BY doc_id
    """,
    "q_tfidf": f"""
        WITH tok AS (
          SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), dfreq AS (
          SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
        ), total AS (
          SELECT COUNT(*) AS n_docs FROM documents
        )
        SELECT doc_id, token, tf, df,
               ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN total
        ORDER BY tfidf DESC, doc_id ASC, token ASC LIMIT 100
    """,
    "q_token_count": f"""
        SELECT doc_id,
          LEN({_TOKS}) AS n_tokens,
          CAST(LIST_SUM(LIST_TRANSFORM(
            LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x <> ''),
            w -> CAST(CEIL(LEN(w) / 4.0) AS INT))) AS INT) AS n_subtokens
        FROM documents
    """,
    "q_text_quality": f"""
        WITH base AS (
          SELECT doc_id,
            LEN({_TOKS}) AS n_tok,
            {_LANG_SCORE['en']} AS n_stop,
            (STRLEN(text) - STRLEN(REGEXP_REPLACE(text, '[^\\p{{L}}\\p{{N}}_\\s]', '', 'g')))
              / NULLIF(CAST(STRLEN(text) AS DOUBLE), 0.0) AS praw
          FROM documents
        )
        SELECT doc_id,
          CASE WHEN n_tok IS NULL OR n_tok <= 0 THEN 0.0 ELSE
            ROUND(GREATEST(
            (LEAST(n_tok / 50.0, 1.0) * 0.5
             + LEAST(n_stop / NULLIF(CAST(n_tok AS DOUBLE), 0.0) * 5.0, 1.0) * 0.5)
            - LEAST(praw * 2.0, 1.0) * 0.25, 0.0), 4) END AS quality,
          ROUND(n_stop / NULLIF(CAST(n_tok AS DOUBLE), 0.0), 4) AS stop_ratio,
          ROUND(praw, 4) AS punct_ratio
        FROM base
    """,
    "q_lang_id": f"""
        WITH scored AS (
          SELECT lang,
            {_LANG_SCORE['de']} AS s_de, {_LANG_SCORE['en']} AS s_en,
            {_LANG_SCORE['es']} AS s_es, {_LANG_SCORE['fr']} AS s_fr
          FROM documents
        )
        SELECT lang,
          CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
               WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
               WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
               WHEN s_es >= s_fr THEN 'es'
               ELSE 'fr' END AS predicted,
          COUNT(*) AS n
        FROM scored GROUP BY 1, 2
    """,
    "q_fingerprint": """
        SELECT doc_id,
          LIST_REDUCE(
            LIST_PREPEND(CAST(0 AS BIGINT),
              LIST_TRANSFORM(
                LIST_FILTER(STRING_SPLIT(LOWER(TRIM(text)), ''), c -> c <> ''),
                c -> CAST(ORD(c) AS BIGINT))),
            (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fingerprint
        FROM documents
    """,
}


# --- BPE + CCNet-bucketing oracles (generated SQL) --------------------
#
# The BPE oracle replays training EXACTLY: words are encoded as
# strings whose every symbol is one character (round t's merged
# symbol = the private-use sentinel chr(0xE001+t), end-of-word =
# chr(0xE000)), so per-round pair counting is a substring unnest and
# merge application is SQL REPLACE — which, like the trainer, is
# greedy, left-to-right, and non-overlapping. Chained CTE stages
# b0..b{k-1} ARE the training loop; the final projection expands
# sentinels back to readable symbols by replaying the replaces in
# reverse rank order.

_BPE_EOW_CP = 0xE000
_BPE_SENT0_CP = 0xE001


def _bpe_stages(k: int) -> str:
    stages = [
        f"""tok AS (SELECT UNNEST({_TOKS}) AS tok FROM documents),
  w0 AS (
    SELECT tok || chr({_BPE_EOW_CP}) AS w, COUNT(*) AS n FROM tok
    WHERE NOT regexp_matches(tok, '[-]')
    GROUP BY 1)"""
    ]
    for t in range(k):
        stages.append(
            f"""p{t} AS (
    SELECT substring(w, CAST(i AS INT), 1) AS l,
           substring(w, CAST(i AS INT) + 1, 1) AS r,
           SUM(n) AS cnt
    FROM (SELECT w, n, UNNEST(range(1, length(w))) AS i FROM w{t})
    GROUP BY 1, 2)"""
        )
        stages.append(
            f"""b{t} AS (
    SELECT l, r, cnt FROM p{t} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"""
        )
        stages.append(
            f"""w{t + 1} AS (
    SELECT REPLACE(w, (SELECT l || r FROM b{t}), chr({_BPE_SENT0_CP + t}))
             AS w, n
    FROM w{t})"""
        )
    return ",\n  ".join(stages)


def _bpe_expand(x: str, k: int) -> str:
    # sentinel u expands to its raw (sentinel-level) pair, which may
    # contain sentinels < u — so replay DESCENDING and let the lower
    # rounds resolve what the higher ones introduce
    e = x
    for u in range(k - 1, -1, -1):
        e = f"REPLACE({e}, chr({_BPE_SENT0_CP + u}), (SELECT l || r FROM b{u}))"
    return f"REPLACE({e}, chr({_BPE_EOW_CP}), '</w>')"


def _bpe_oracle(k: int) -> str:
    union = " UNION ALL ".join(
        f"SELECT {t + 1} AS rank, l, r, cnt FROM b{t}" for t in range(k)
    )
    return f"""
        WITH {_bpe_stages(k)}
        SELECT CAST(rank AS INT) AS rank,
               {_bpe_expand('l', k)} AS lhs,
               {_bpe_expand('r', k)} AS rhs,
               CAST(cnt AS BIGINT) AS n
        FROM ({union})
        ORDER BY rank
    """


def _bpe_encode_oracle(k: int) -> str:
    chain = f"tok || chr({_BPE_EOW_CP})"
    for t in range(k):
        chain = (
            f"REPLACE({chain}, (SELECT l || r FROM b{t}),"
            f" chr({_BPE_SENT0_CP + t}))"
        )
    return f"""
        WITH {_bpe_stages(k)},
        dtok AS (SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_tok, SUM(LENGTH({chain})) AS n_sub
          FROM dtok GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(a.n_tok, 0) AS INT) AS n_tokens,
               CAST(COALESCE(a.n_sub, 0) AS INT) AS n_subtokens
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """


ORACLES["q_bpe"] = _bpe_oracle(_BPE_MERGES)
ORACLES["q_bpe_encode"] = _bpe_encode_oracle(_BPE_MERGES)

# CCNet bucketing: q_perplexity's LM/scoring CTEs + per-language
# QUANTILE_CONT tertile cutoffs over the 4dp-rounded cross-entropy,
# cutoffs rounded to 6dp on both sides so the boundary comparison is
# engine-reproducible (raw float sums differ in the last bits).
ORACLES["q_ppl_buckets"] = f"""
    WITH tok AS (
      SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
    ), n_tot AS (
      SELECT SUM(n) AS n_total FROM counts
    ), vocab AS (
      SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 1000
    ), vsize AS (
      SELECT COUNT(*) AS v FROM vocab
    ), lm AS (
      SELECT token, LN(n + 1) - LN(n_total + v + 1) AS logp
      FROM vocab CROSS JOIN n_tot CROSS JOIN vsize
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), ce AS (
      SELECT doc_id,
        CAST(SUM(tf) AS BIGINT) AS n_tokens,
        -SUM(tf * COALESCE(logp, -LN(n_total + v + 1))) / SUM(tf) AS ce_raw
      FROM tf LEFT JOIN lm USING (token)
      CROSS JOIN n_tot CROSS JOIN vsize
      GROUP BY doc_id
    ), scored AS (
      SELECT ce.doc_id, d.lang, ce.n_tokens,
             ROUND(ce.ce_raw, 4) AS ce4, ce.ce_raw
      FROM ce JOIN documents d ON ce.doc_id = d.doc_id
    ), cuts AS (
      SELECT lang,
        ROUND(QUANTILE_CONT(ce4, 1.0/3), 6) AS c1,
        ROUND(QUANTILE_CONT(ce4, 2.0/3), 6) AS c2
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.n_tokens,
           s.ce4 AS cross_entropy,
           ROUND(EXP(s.ce_raw), 2) AS ppl,
           CASE WHEN s.ce4 <= c.c1 THEN 'head'
                WHEN s.ce4 <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c ON s.lang = c.lang
"""
