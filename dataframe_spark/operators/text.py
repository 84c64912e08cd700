"""Text-analysis operators for corpus curation.

LLM-pipeline extension; the reference's nearest surface is the
string Expr functions (Functions.hs: splitOn/match/matchAll). All
expressions are JVM builtins — no Python in the hot path — so they
fuse into the scan stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "auf", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "con"],
}


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tokens(text) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(_c(text))), r"\s+"), lambda t: t != ""
    )


def token_count(text) -> Column:
    """Whitespace token count (reference-free; BPE-ish variant below)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish count: splits on non-alphanumerics AND counts
    ~4-char chunks of long words (a cheap stand-in for BPE growth)."""
    words = F.filter(
        F.split(F.lower(_c(text)), r"[^a-z0-9]+"), lambda t: t != ""
    )
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )


def punct_ratio(text) -> Column:
    """Fraction of characters that are neither word chars nor
    whitespace. Unicode-aware via \\p{L}\\p{N} (supported by both
    Java regex and DuckDB's RE2): the earlier ASCII-only ``\\w``
    counted every accented letter as punctuation, systematically
    down-scoring the de/fr/es text STOPWORDS supports (review r5)."""
    t = _c(text)
    stripped = F.regexp_replace(t, r"[^\p{L}\p{N}_\s]", "")
    return (F.length(t) - F.length(stripped)) / F.nullif(
        F.length(t).cast("double"), F.lit(0.0)
    )


def stopword_ratio(text, lang: str = "en") -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop / F.nullif(F.size(toks).cast("double"), F.lit(0.0))


def quality_score(text) -> Column:
    """Heuristic document quality in [0, 1]: length band + stopword
    presence − punctuation excess (deterministic, SQL-portable).

    Null or zero-token documents score 0.0 explicitly: least() and
    greatest() SKIP nulls in Spark, so without the guard an empty
    doc's undefined ratios silently clamped to the MAX score and
    garbage sailed through quality gates (review r5)."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(text) * 2.0, F.lit(1.0))
    # <= 0, not == 0: with ANSI off, size(null array) is LEGACY -1
    return F.when(
        n_tok.isNull() | (n_tok <= 0), F.lit(0.0)
    ).otherwise(
        F.round(
            F.greatest(
                (len_score * 0.5 + stop_score * 0.5) - punct_pen * 0.25,
                F.lit(0.0),
            ),
            4,
        )
    )


def lang_scores(text) -> dict[str, Column]:
    """Per-language stopword hit-count (n-gram-free heuristic ID)."""
    toks = tokens(text)
    out = {}
    for lang, words in STOPWORDS.items():
        stops = F.array(*[F.lit(s) for s in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return out


def lang_id(text) -> Column:
    """argmax language with deterministic tie-break (alphabetical)."""
    scores = lang_scores(text)
    langs = sorted(scores)  # alphabetical tie-break
    best = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best = (F.lit(lang), s)
        else:
            name, cur = best
            best = (
                F.when(s > cur, F.lit(lang)).otherwise(name),
                F.greatest(s, cur),
            )
    name, cur = best
    return F.when(cur > 0, name).otherwise(F.lit("unknown"))


_FP_MOD = 1_000_000_007
# per-worker cache of [31^0, 31^1, ...] mod p, grown geometrically
_fp_pows = None


def _fp_powers(n: int):
    import numpy as np

    global _fp_pows
    if _fp_pows is None or _fp_pows.size < n:
        size = max(n, 1024, 0 if _fp_pows is None else 2 * _fp_pows.size)
        p = np.empty(size, dtype=np.int64)
        p[0] = 1
        for k in range(1, size):
            p[k] = p[k - 1] * 31 % _FP_MOD
        _fp_pows = p
    return _fp_pows


def _fingerprint_kernel(s):
    """pandas kernel: H(s) = Σ ord(s[i])·31^(n-1-i) mod 1e9+7 —
    identical to the left fold acc←(acc·31+ord) the oracle runs."""
    import numpy as np
    import pandas as pd

    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        cps = np.frombuffer(v.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        n = cps.size
        if n == 0:
            out.append(0)
            continue
        pw = _fp_powers(n)
        # every term < p after %p; int64 sum safe to ~9e9 chars
        out.append(int(((cps % _FP_MOD) * pw[:n][::-1] % _FP_MOD).sum() % _FP_MOD))
    return pd.Series(out, dtype="Int64")


def fingerprint(text) -> Column:
    """Polynomial rolling hash (base 31, mod 1e9+7) over the
    characters of normalized text — an engine-portable document
    fingerprint (same value in any system implementing the fold).

    Normalization (lower/trim) stays JVM-side; the polynomial runs
    as ONE Arrow-batched numpy modular dot product per document.
    The previous pure-JVM form folded an interpreted higher-order
    lambda over a per-CHARACTER split array (one single-char string
    object per byte) — the worst 10x scaler in BENCH_r08
    (wall_factor 15.96); the Arrow kernel does the same math at
    memory bandwidth. Values are bit-identical (regression-pinned
    against the fold in tests), so the DuckDB oracle's portable
    closed form is unchanged."""
    from pyspark.sql.functions import pandas_udf

    fp = pandas_udf(_fingerprint_kernel, "long")
    return fp(F.lower(F.trim(_c(text))))


def repetition_metrics(df, id_col: str, text_col: str):
    """Gopher-style repetition quality signals per document:
    (id, n_tokens, dup_word_frac, top_word_frac, dup_2gram_frac).

    - dup_word_frac: 1 − distinct/total tokens
    - top_word_frac: share of the single most-repeated token
    - dup_2gram_frac: 1 − distinct/total word bigrams

    High values flag boilerplate/spam for corpus filtering (the
    "repetitious text" filters of quality-pipeline papers). Entirely
    IN-ROW: the most-common-token count is a single O(n) aggregate
    scan over the sorted token array carrying (prev, current-run,
    best-run) struct state — 6x faster than the index-based
    boundary-scan formulation (element_at per index runs interpreted
    per element; measured 1.3 s -> 0.2 s at sf0.1). A narrow
    projection that fuses into the scan with zero shuffles at any
    corpus size."""
    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    toks = tokens(text_col)
    n = F.size(toks)
    s = F.array_sort(toks)
    run = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["cur"] + 1
    ).otherwise(F.lit(1))
    top_run = F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("cur"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    nd = F.size(F.array_distinct(toks))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ng = F.size(grams)
    ngd = F.size(F.array_distinct(grams))
    frac = lambda num, den: F.round(  # noqa: E731
        num / F.nullif(den.cast("double"), F.lit(0.0)), 4
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        frac(n - nd, n).alias("dup_word_frac"),
        frac(top_run, n).alias("top_word_frac"),
        frac(ng - ngd, ng).alias("dup_2gram_frac"),
    )


def redact(df, text_col: str, patterns: dict[str, str], out_col: str = "redacted"):
    """PII scrubbing: replace every match of each named pattern with
    ``<NAME>`` and count total redactions per row (column
    ``n_redactions``). A chained regexp_replace — pure JVM, fused
    into the scan; patterns should stay in the RE2-compatible subset
    (character classes, quantifiers, alternation) so the same
    pattern text runs on any engine."""
    t = _c(text_col)
    n_red = None
    for name, pat in patterns.items():
        cnt = F.regexp_count(t, F.lit(pat))
        n_red = cnt if n_red is None else n_red + cnt
        t = F.regexp_replace(t, pat, f"<{name.upper()}>")
    # n_red is a Python None for an empty pattern dict — coalesce
    # would raise on it; the no-op contract is text unchanged, 0
    return df.withColumn(out_col, t).withColumn(
        "n_redactions", n_red if n_red is not None else F.lit(0)
    )


def pack_sequences(
    chunks,
    seq_len: int,
    group_col: str,
    order_by: list[str],
    tokens_col: str = "n_tokens",
):
    """Assign chunks to fixed-budget training sequences (GPT-style
    document packing): within each ``group_col`` partition, chunks
    are laid end-to-end in ``order_by`` order and chunk c belongs to
    pack floor(start_offset(c) / seq_len) — contiguous greedy
    packing, deterministic, one windowed cumsum.

    Packing is per-group so the plan stays parallel at corpus scale
    (a single global order would serialize); choose a group key with
    enough cardinality (source, shard, date) for your cluster."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return chunks.withColumn(
        "pack_id", F.floor(start / F.lit(seq_len)).cast("int")
    )


def mixture_select(
    df,
    group_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
):
    """Deterministic data-mixture downsampling: keep each row with
    its group's target rate, decided by a PORTABLE per-row uniform —
    the first 8 hex chars of md5 over the key columns, scaled to
    [0, 1) — so the same rows are selected on any engine/run/retry
    (unlike rand()-based sampling, which depends on partition
    layout). Map-only: fuses into the scan, no shuffle; rates
    compile to one chained CASE."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", *key_cols)), 1, 8), 16, 10
        )
        .cast("bigint")
        .cast("double")
        / F.lit(float(1 << 32))
    )
    rate = None
    g = _c(group_col)
    for grp, w in weights.items():
        rate = (
            F.when(g == grp, F.lit(float(w)))
            if rate is None
            else rate.when(g == grp, F.lit(float(w)))
        )
    rate = (
        F.lit(float(default_rate))
        if rate is None
        else rate.otherwise(F.lit(float(default_rate)))
    )
    return df.where(u < rate)


# --- corpus-level: vocabulary and TF-IDF ------------------------------


def vocabulary(df, text_col: str, top_n: int | None = None):
    """Corpus vocabulary with token frequencies — explode + one
    shuffled agg with map-side partial counts. ``top_n`` uses
    orderBy+limit (TakeOrderedAndProject: per-partition heaps, no
    full sort). Ties broken by token text for determinism."""
    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_n is not None:
        counts = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    return counts


def term_freq_pairs(text) -> Column:
    """Per-document term frequencies computed IN-ROW:
    ``array<struct<token, tf>>`` via a single O(n) aggregate scan
    over the sorted token array (state: previous token, current run
    length, emitted pairs — the same run-length pattern as
    repetition_metrics' top-run scan). Appends happen only at run
    boundaries, so copying is bounded by the doc's DISTINCT token
    count, not its length. Eliminates the (doc, token) shuffle of
    the full token stream that an explode+groupBy term-frequency
    plan pays — at corpus scale that shuffle is the dominant cost."""
    return _freq_pairs(F.array_sort(tokens(text)))


def _freq_pairs(s) -> Column:
    """Run-length (value, count) pairs over an already-SORTED string
    array — the in-row frequency kernel shared by term_freq_pairs
    (unigrams) and bigram_perplexity_score (bigram strings)."""
    emit = lambda acc: F.concat(  # noqa: E731 — close the open run
        acc["acc"],
        F.array(F.struct(acc["prev"].alias("token"), acc["cnt"].alias("tf"))),
    )
    return F.aggregate(
        s,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("cnt"),
            F.array().cast("array<struct<token:string,tf:int>>").alias("acc"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["cnt"] + 1).otherwise(F.lit(1)).alias("cnt"),
            F.when(acc["prev"].isNull() | (x == acc["prev"]), acc["acc"])
            .otherwise(emit(acc))
            .alias("acc"),
        ),
        lambda acc: F.when(acc["prev"].isNull(), acc["acc"]).otherwise(emit(acc)),
    )


def token_entropy(df, id_col: str, text_col: str):
    """Per-document Shannon entropy of the token distribution (bits)
    — the information-density quality signal: templated/repetitive
    documents score low where ``repetition_metrics`` needs an
    explicit n-gram to catch them, and machine-generated keyword
    stuffing scores low while reading as 'diverse' to stopword
    ratios. Returns (id, n_tokens, n_distinct, entropy,
    norm_entropy) with norm_entropy = entropy / log2(n_distinct)
    in [0, 1] (0 for <= 1 distinct token; empty docs score 0, not
    null — same explicit-zero contract as quality_score post-r5).

    Plan: entirely IN-ROW via the run-length term-frequency kernel
    (``term_freq_pairs``) — H = log2(n) - (Σ c·log2 c)/n needs no
    per-token shuffle; the whole operator is one map-side
    projection."""
    # null text -> empty token array, NOT null-propagated aggregates
    pairs = term_freq_pairs(F.coalesce(F.col(text_col), F.lit("")))
    n = F.aggregate(
        pairs, F.lit(0).cast("long"), lambda a, p: a + p["tf"]
    )
    clogc = F.aggregate(
        pairs,
        F.lit(0.0),
        lambda a, p: a + p["tf"].cast("double") * F.log2(p["tf"].cast("double")),
    )
    ent = F.when(n <= 0, F.lit(0.0)).otherwise(
        F.log2(n.cast("double")) - clogc / n.cast("double")
    )
    nd = F.size(pairs)
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        ent.alias("entropy"),
        F.when(nd <= 1, F.lit(0.0))
        .otherwise(ent / F.log2(nd.cast("double")))
        .alias("norm_entropy"),
    )


def pmi_collocations(df, text_col: str, min_count: int = 5, top_n: int = 100):
    """Corpus collocation extraction by pointwise mutual information
    (Church & Hanks 1990): PMI(w1, w2) = log2(p(w1 w2) / (p(w1)
    p(w2))) over adjacent token pairs — the classic vocabulary-
    induction / multi-word-expression signal ('new york' scores
    high, 'of the' low). ``min_count`` floors the pair count (PMI is
    notoriously noisy on rare pairs); the result is the ``top_n``
    pairs by ROUNDED pmi (4 dp, round-first like bm25) with (w1, w2)
    tie-breaks — deterministic on any engine.

    Plan: one bigram-count shuffle + one unigram-count shuffle
    (both map-side combined), two joins of the bigram table against
    the unigram counts (AQE picks broadcast when the vocab fits),
    totals as one broadcast row. No driver state, no pairwise work
    beyond adjacency."""
    from .dedup import window_array_expr

    from ..plans.hints import ensure_scan_parallelism

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    src = ensure_scan_parallelism(df)
    from .dedup import _reusable

    # BOTH count frames are multi-consumer: uni feeds the token
    # total + the w1 and w2 join sides (3 consumers), bg_all feeds
    # the unfiltered pair total + the min_count-filtered scoring
    # side — unpersisted, each extra consumer re-pays the tokenize +
    # count shuffle (review r6)
    uni = _reusable(vocabulary(src, text_col))
    bg_all = _reusable(
        src.select(
            F.explode(window_array_expr(tokens(text_col), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    bg = bg_all.where(F.col("c_pair") >= min_count)
    totals = uni.agg(F.sum("n").alias("__n_tok")).crossJoin(
        bg_all.agg(F.sum("c_pair").alias("__n_pair"))
    )
    u1 = uni.select(F.col("token").alias("w1"), F.col("n").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("n").alias("c2"))
    scored = (
        bg.withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c_pair",
            "c1",
            "c2",
            F.round(
                F.log2(
                    (F.col("c_pair").cast("double") / F.col("__n_pair"))
                    / (
                        (F.col("c1").cast("double") / F.col("__n_tok"))
                        * (F.col("c2").cast("double") / F.col("__n_tok"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(top_n)


def tf_idf(df, id_col: str, text_col: str):
    """Per (doc, token) TF-IDF: tf * ln(n_docs / df).

    Plan shape (the 100 TB design): tf is computed IN-ROW
    (term_freq_pairs — narrow projection + generator, zero shuffle);
    document frequency explodes each doc's DISTINCT tokens and
    aggregates with map-side partials, so its shuffle volume is
    bounded by vocabulary × map tasks, not the token stream; the
    tf ⋈ dfreq join is left to AQE, which broadcasts dfreq when the
    runtime vocabulary fits. The corpus row count rides in via a
    broadcast one-row crossJoin (no driver collect). Nothing in the
    plan ever shuffles the full token stream.

    PRECONDITION: one row per document id. Ids spanning multiple
    rows would inflate n_docs and df (row counts, not distinct ids)
    and emit split (doc, token) rows; pre-aggregate such inputs
    (e.g. concat the fragments) before calling."""
    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    tf = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(term_freq_pairs(text_col)).alias("__p"),
    ).select(
        "doc_id",
        F.col("__p.token").alias("token"),
        F.col("__p.tf").cast("long").alias("tf"),
    )
    dfreq = (
        df.select(F.explode(F.array_distinct(tokens(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    total = df.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))).alias("tfidf"),
        )
    )


def _top_vocab(counts, top_v: int | None):
    """The bounded (token, n) vocab cut under ITS one deterministic
    total order (count desc, token asc) — shared by unigram_lm and
    bigram_lm so the two models can never silently disagree on what
    the vocabulary is."""
    if top_v is None:
        return counts
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(top_v)


def unigram_lm(df, text_col: str, top_v: int | None = None, counts=None):
    """Add-one-smoothed unigram language model over the corpus
    (CCNet-style perplexity filtering, Wenzek et al. 2020 — trained
    here on the corpus itself; swap ``df`` for a clean reference
    corpus to score against external text).

    Retains the ``top_v`` most frequent tokens (ties broken by token
    text; per-partition heaps via orderBy+limit, no full sort) and
    folds everything else into one OOV bucket:
    ``logp(tok) = ln(n_tok + 1) - ln(N + V + 1)`` with
    ``logp(OOV) = -ln(N + V + 1)``, where N counts ALL token
    occurrences and V the retained vocabulary.

    Returns ``(lm, totals)``: lm = (token, logp) bounded by top_v;
    totals = one row (__n_total, __v, __oov_logp) for the scorer.
    One token-count shuffle total; no driver collect. ``counts``
    lets a caller that already built the (token, n) frame (e.g.
    bigram_lm, which needs the raw vocab counts too) share it
    instead of paying the token-count shuffle twice."""
    if counts is None:
        counts = vocabulary(df, text_col)
    n_total = counts.agg(F.sum("n").alias("__n_total"))
    counts = _top_vocab(counts, top_v)
    v = counts.agg(F.count(F.lit(1)).alias("__v"))
    denom = F.log(F.col("__n_total") + F.col("__v") + 1)
    totals = (
        n_total.crossJoin(F.broadcast(v))
        .select("__n_total", "__v", (-denom).alias("__oov_logp"))
    )
    lm = (
        counts.crossJoin(F.broadcast(totals))
        .select("token", (F.log(F.col("n") + 1) + F.col("__oov_logp")).alias("logp"))
    )
    return lm, totals


def perplexity_score(df, id_col: str, text_col: str, lm, totals, carry=()):
    """Per-document cross-entropy and perplexity under a unigram LM
    from ``unigram_lm`` — the standard LM-based quality filter for
    training corpora (low ppl ≈ fluent text, high ppl ≈ noise).

    Plan shape (the 100 TB design): term frequencies are computed
    IN-ROW (term_freq_pairs), so only each doc's DISTINCT tokens
    explode; the lm side is bounded by top_v and broadcasts; the
    only shuffle is the per-doc aggregation of distinct-token rows.
    The full token stream is never shuffled.

    ``carry`` names extra ``df`` columns to ride through scoring
    onto the output (they key the same per-doc aggregation, so a
    caller needing doc attributes — ppl_buckets needs the language —
    skips a join back against the corpus).

    Returns (id, *carry, n_tokens, cross_entropy, ppl); docs with
    zero tokens are absent (no distribution to score)."""
    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    carry = list(carry)
    pairs = df.select(
        F.col(id_col).alias("id"),
        *carry,
        F.explode(term_freq_pairs(text_col)).alias("__p"),
    ).select(
        "id",
        *carry,
        F.col("__p.token").alias("token"),
        F.col("__p.tf").cast("long").alias("tf"),
    )
    # broadcast only a BOUNDED lm: with top_v=None the lm is the full
    # corpus vocabulary, and forcing a broadcast would ship it to the
    # driver at corpus scale — leave that case to AQE (same escape
    # hatch rationale as jaccard_pairs' broadcast_df_table)
    from ..plans.stats import plan_size_bytes

    lm_side = (
        F.broadcast(lm) if plan_size_bytes(lm) <= 256 * 1024 * 1024 else lm
    )
    scored = (
        pairs.join(lm_side, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            *carry,
            "tf",
            F.coalesce("logp", F.col("__oov_logp")).alias("logp"),
        )
    )
    ce = -F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")
    return (
        scored.groupBy("id", *carry)
        .agg(
            F.sum("tf").alias("n_tokens"),
            ce.alias("cross_entropy"),
        )
        .withColumn("ppl", F.exp("cross_entropy"))
    )


def ppl_buckets(
    df,
    id_col: str,
    text_col: str,
    group_col: str,
    top_v: int | None = 1000,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020 §4.4): train one corpus LM, score every document, and split
    each ``group_col`` slice (CCNet: language) into equal thirds by
    perplexity — ``head`` (most fluent) / ``middle`` / ``tail``. The
    bucket column is the standard curriculum/selection knob for
    training-data pipelines (e.g. keep head+middle, drop tail).

    Plan shape (the 100 TB design): scoring is perplexity_score's
    bounded-broadcast plan; the per-group cutoffs are len(labels)-1
    quantiles per group (gated buffered/sharded-radix strategy —
    winsorize's pattern) that ride back as a BROADCAST side, so
    bucket assignment is a map-side comparison. The tempting
    NTILE-over-(language) window is NOT used: it pins each
    language's whole corpus slice to one reducer's sort, which at
    corpus scale makes the largest language the job.

    Engine-portability: bucketing compares the 4dp-ROUNDED
    cross-entropy against 6dp-rounded cutoffs, so the comparison is
    reproducible across engines (raw float sums differ in the last
    bits with aggregation order); ties at a cutoff land in the LOWER
    bucket (quantile_bucket's convention). Zero-token docs are
    absent (nothing to score), matching perplexity_score."""
    from ..plans.stats import plan_size_bytes
    from .quantiles import exact_quantiles_grouped, grouped_quantiles_buffered

    from ..operators.dedup import _reusable

    lm, totals = unigram_lm(df, text_col, top_v=top_v)
    # group_col rides through scoring (no join back against the
    # corpus), and the scored frame is PERSISTED: both the cutoff
    # aggregation and the final bucket assignment consume it, and
    # without the persist the whole LM + scoring lineage runs twice
    # (measured 3.0 s -> 0.93 s steady at sf0.1, late r9)
    scored = _reusable(
        perplexity_score(
            df.withColumn("__grp", F.col(group_col)),
            id_col, text_col, lm, totals, carry=["__grp"],
        ).withColumn("__ce4", F.round("cross_entropy", 4))
    )
    probs = [i / len(labels) for i in range(1, len(labels))]
    fn = (
        exact_quantiles_grouped
        if plan_size_bytes(df) > 256 * 1024 * 1024
        else grouped_quantiles_buffered
    )
    cuts = (
        fn(scored, ["__grp"], "__ce4", probs)
        .groupBy("__grp")
        .agg(F.array_sort(F.collect_list(F.round("value", 6))).alias("__cuts"))
    )
    idx = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, cut: acc + F.when(F.col("__ce4") > cut, 1).otherwise(0),
    )
    label_arr = F.array(*[F.lit(x) for x in labels])
    return (
        scored.join(F.broadcast(cuts), "__grp")
        .select(
            "id",
            F.col("__grp").alias(group_col),
            "n_tokens",
            F.col("__ce4").alias("cross_entropy"),
            F.round("ppl", 2).alias("ppl"),
            F.get(label_arr, idx).alias("bucket"),
        )
    )


def js_divergence(df, text_col: str, group_col: str, a, b):
    """Jensen–Shannon divergence (bits) between the unigram token
    distributions of two corpus slices — the bounded symmetric
    corpus-drift / source-similarity metric (0 = identical token
    mix, 1 = disjoint vocabularies).

    One shuffle total: per-token conditional counts for both slices
    in a single vocabulary-bounded aggregation; the two totals ride
    back as a broadcast one-row crossJoin and the per-token KL
    contributions (0·ln0 = 0 by construction: each side only
    contributes where its count is positive) reduce in a final tiny
    agg. Returns one row (jsd_bits, n_tokens_a, n_tokens_b,
    vocab_union)."""
    from ..plans.hints import ensure_scan_parallelism

    g = F.col(group_col)
    df = ensure_scan_parallelism(df).where(g.isin(a, b))
    tok = df.select(g.alias("__g"), F.explode(tokens(text_col)).alias("__t"))
    counts = tok.groupBy("__t").agg(
        F.sum(F.when(F.col("__g") == a, 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__g") == b, 1).otherwise(0)).alias("__nb"),
    )
    totals = counts.agg(
        F.sum("__na").alias("__ta"), F.sum("__nb").alias("__tb")
    )

    # a slice with zero tokens has no distribution: every per-token
    # contribution null-poisons and the result silently degraded to
    # a null jsd_bits — raise instead, mirroring psi's contract for
    # an empty reference population (review r5)
    def _chk(c, side):
        return (
            F.when(
                F.col(c).isNull() | (F.col(c) == 0),
                F.raise_error(
                    F.lit(f"js_divergence: slice {side!r} has no tokens")
                ).cast("bigint"),
            )
            .otherwise(F.col(c))
            .alias(c)
        )

    totals = totals.select(_chk("__ta", a), _chk("__tb", b))
    pa = F.col("__na") / F.nullif(F.col("__ta"), F.lit(0)).cast("double")
    pb = F.col("__nb") / F.nullif(F.col("__tb"), F.lit(0)).cast("double")
    m = (pa + pb) / 2.0
    contrib = F.when(F.col("__na") > 0, 0.5 * pa * F.log(pa / m)).otherwise(
        0.0
    ) + F.when(F.col("__nb") > 0, 0.5 * pb * F.log(pb / m)).otherwise(0.0)
    import math

    return (
        counts.crossJoin(F.broadcast(totals))
        .select(contrib.alias("__c"), "__ta", "__tb")
        .agg(
            (F.sum("__c") / F.lit(math.log(2.0))).alias("jsd_bits"),
            F.max("__ta").alias("n_tokens_a"),
            F.max("__tb").alias("n_tokens_b"),
            F.count(F.lit(1)).alias("vocab_union"),
        )
    )


# --- sequence prep: chunking and token-budget selection ---------------


def chunk_tokens(df, id_col: str, text_col: str, chunk_size: int, overlap: int = 0):
    """Split each document into token chunks of ``chunk_size`` with
    ``overlap`` (training sequence prep). The chunk grid is built
    in-row with higher-order functions (sequence + slice) and then
    posexploded — a narrow projection plus one generator, no shuffle,
    no Python; composes into the scan at any corpus size.

    Returns (id, chunk_idx, chunk: array<string>, n_tokens), empty
    chunks dropped."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    toks = tokens(text_col)
    # last start: size - overlap - 1. A start beyond that begins
    # inside the previous chunk's tail and its content is wholly
    # contained in that chunk — with overlap > 0 the old size-1
    # bound emitted a fully redundant trailing chunk for most docs,
    # duplicating training data (review r5).
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .withColumn("n_tokens", F.size("chunk"))
        .where(F.col("n_tokens") > 0)
    )


def token_budget_select(
    df,
    id_col: str,
    text_col: str,
    group_col: str,
    budget: int,
    quality_col=None,
):
    """Greedy per-group selection under a token budget: within each
    group, take documents best-quality-first while the running token
    total stays within ``budget``. The cumsum window is PARTITIONED
    by group — each group sorts independently on its own reducer, so
    the plan scales with group count (a single global ordering would
    serialize the corpus; if you need one, pre-shard by a hash of the
    id into pseudo-groups and budget per shard)."""
    from pyspark.sql import Window

    from ..plans.hints import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    # _c: accept a column name string like every other *_col param
    quality = (
        _c(quality_col) if quality_col is not None else quality_score(text_col)
    )
    scored = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        token_count(text_col).alias("n_tokens"),
        quality.alias("quality"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.desc("quality"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    ).where(F.col("cum_tokens") <= budget)


def remove_boilerplate_lines(
    df,
    id_col: str,
    text_col: str,
    min_docs: int = 3,
    out_col: str = "cleaned",
):
    """CCNet-style line-level boilerplate removal: a line whose
    normalized (lowercased, trimmed) form appears in >= ``min_docs``
    DISTINCT documents is dropped from every document; blank lines
    and doc-specific lines pass through, line order is preserved.

    Plan shape mirrors contamination_scores: document frequency is a
    countDistinct(id) over IN-ROW distinct line hashes (explode of
    the deduped per-doc hash array — never the raw lines; the
    distinct handles ids that span multiple rows), the repeated-line
    set collects into a single broadcast array row, and the rebuild
    is a narrow per-row filter over split(text) — no reassembly
    groupBy, no second pass over the corpus. Boilerplate vocabularies are bounded by repetition
    (a line must recur across docs to qualify), the same broadcast
    rationale as the jaccard df table."""
    raw_lines = F.split(F.col(text_col), "\n")
    norm = lambda l: F.lower(F.trim(l))  # noqa: E731
    doc_hashes = F.array_distinct(
        F.transform(
            F.filter(raw_lines, lambda l: F.trim(l) != F.lit("")),
            lambda l: F.xxhash64(norm(l)),
        )
    )
    dfreq = (
        df.select(F.col(id_col).alias("__id"), F.explode(doc_hashes).alias("__lh"))
        .groupBy("__lh")
        .agg(F.countDistinct("__id").alias("__n"))
        .where(F.col("__n") >= min_docs)
    )
    boiler_row = dfreq.agg(F.collect_set("__lh").alias("__boiler"))
    kept = F.filter(
        raw_lines,
        lambda l: (F.trim(l) == F.lit(""))
        | ~F.array_contains(F.col("__boiler"), F.xxhash64(norm(l))),
    )
    return (
        df.join(F.broadcast(boiler_row))
        .withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn(
            "n_lines_removed", F.size(raw_lines) - F.size(kept)
        )
        .drop("__boiler")
    )


def bm25_topk(
    df,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 keyword retrieval: score every document against a
    fixed bag of query terms, return the top ``k`` (the retrieval
    primitive a training-data pipeline uses for targeted corpus
    pulls and eval-set mining; complements tf_idf's corpus-wide
    weights — reference scope: Operations/Aggregation.hs-style
    derived scoring, no direct Haskell counterpart).

    Plan shape (the 100 TB design): per-document term frequencies
    and document length are computed IN-ROW (size/filter over the
    token array — narrow projection, ZERO shuffle, no token-stream
    explode); the corpus stats the formula needs (N, avgdl, per-term
    document frequency) reduce to ONE one-row aggregate that rides
    back in via a broadcast crossJoin. Scoring is then a per-row
    expression and the only shuffle in the plan is the global top-k
    (TakeOrderedAndProject — bounded by k per partition).

    idf uses the standard non-negative Robertson-Sparck-Jones form
    ln(1 + (N - df + 0.5)/(df + 0.5)). Output: (id, bm25) rounded to
    4, ordered by rounded score desc then id asc (the round-first
    ordering keeps the top-k cutoff engine-stable under float ulp
    drift)."""
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    # tokens() lowercases the text and splits on whitespace — a term
    # with an uppercase letter or embedded whitespace would silently
    # match nothing, so normalize case here and reject multi-token
    # input instead of scoring it as 0
    import re as _re

    if any(_re.search(r"\s", t) for t in query_terms):
        raise ValueError("bm25_topk: query_terms must be single tokens")
    query_terms = [t.lower() for t in query_terms]
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25_topk: query_terms must be distinct")

    def _tf(term):
        # factory, NOT a 2-arg lambda with a default: PySpark passes
        # the array index as the 2nd arg, shadowing the closure var
        return F.size(F.filter(F.col("__toks"), lambda t: t == F.lit(term)))

    # materialize the token array ONCE per row: higher-order filters
    # are CodegenFallback (no common-subexpression elimination) and
    # CollapseProject inlines a plain alias into every consumer, so a
    # two-step select still re-tokenizes per term (verified in the
    # physical plan). explode(array(...)) is a Generate node — a
    # collapse barrier — and one-element explode keeps row counts
    # (plan-verified: exactly one split(lower(trim)) remains)
    toked = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens(text_col))).alias("__toks"),
    )
    base = toked.select(
        "id",
        F.size(F.col("__toks")).alias("__dl"),
        *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(query_terms)],
    ).where(F.col("__dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    parts = []
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        dfreq = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
        )
        parts.append(idf * tf * F.lit(k1 + 1.0) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    scored = base.crossJoin(F.broadcast(stats)).select(
        "id", F.round(score, 4).alias("bm25")
    )
    return (
        scored.where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("id"))
        .limit(k)
    )


# --- corpus splitting & resampling ------------------------------------


def row_uniform(key_cols) -> Column:
    """Portable per-row uniform in [0, 1): the first 8 hex chars of
    md5 over the null-coalesced, '\\x1f'-joined key columns, scaled
    by 2^32. The same value on any engine/run/retry (unlike
    ``rand()``, which depends on partition layout) — the backbone of
    every deterministic sampling operator here. Null keys coalesce
    to a '\\x00' sentinel so distinct key tuples stay injective
    (concat_ws SKIPS null parts — ('a', NULL, 'b') and ('a', 'b')
    would otherwise collide)."""
    keyed = [
        F.coalesce(_c(k).cast("string"), F.lit("\x00")) for k in key_cols
    ]
    return (
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", *keyed)), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(float(1 << 32))
    )


def row_uniform_slice(hash_col, j: int) -> Column:
    """Uniform j (0..3) packed in one md5 digest: hex slice
    [1+8j, 8] scaled by 2^32 — the row_uniform convention, four
    draws per digest. The md5 IS the cost of wide deterministic
    weight draws (a bootstrap at B replicates needs B uniforms per
    row); slicing cuts digest evaluations 4x. Mirror in DuckDB:
    CAST('0x' || SUBSTR(MD5(key), 1 + 8*j, 8) AS BIGINT) /
    4294967296.0."""
    return (
        F.conv(F.substring(hash_col, 1 + 8 * j, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(float(1 << 32))
    )


def row_digest(key_cols, salt: str) -> Column:
    """The md5 digest behind row_uniform/row_uniform_slice, exposed
    so callers can bind it to a real column once (a projection
    boundary) and slice it four ways without trusting codegen CSE
    to dedupe repeated md5 subtrees."""
    keyed = [
        F.coalesce(_c(k).cast("string"), F.lit("\x00")) for k in key_cols
    ]
    return F.md5(F.concat_ws("\x1f", *keyed, F.lit(salt)))


def c4_flags(
    df,
    text_col: str,
    min_words: int = 5,
    mean_wl_range: tuple[float, float] = (3.0, 10.0),
    bad_phrases: tuple[str, ...] = ("lorem ipsum", "javascript", "{"),
):
    """C4-style heuristic rule filter (Raffel et al. 2020 §2.2,
    adapted to whole-document granularity): appends per-document
    rule flags and a combined ``keep`` verdict without dropping any
    input column, so the caller can either filter or audit.

    Columns appended: ``n_words`` (whitespace tokens),
    ``mean_word_len`` (rounded to 4 — the classic 3..10 sanity band
    that catches lorem-ipsum-ish and minified-code-ish text),
    ``has_bad_phrase`` (case-insensitive literal containment of any
    configured phrase — C4 uses "lorem ipsum"/"javascript"/"{"),
    and ``keep``. Everything is an in-row JVM expression over ONE
    tokenization — map-only, fuses into the scan, zero shuffle at
    any scale. Null/empty documents fail ``keep`` explicitly (the
    quality_score null-clamp convention)."""
    toks = tokens(text_col)
    # legacy (non-ANSI) size(null) is -1; audit column should read
    # NULL for a null document, matching the SQL oracle
    n = F.when(_c(text_col).isNotNull(), F.size(toks))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.round(
        total_len / F.nullif(n.cast("double"), F.lit(0.0)), 4
    )
    low = F.lower(_c(text_col))
    bad = F.lit(False)
    for p in bad_phrases:
        bad = bad | low.contains(p.lower())
    bad = F.coalesce(bad, F.lit(False))
    lo, hi = mean_wl_range
    # <= 0 guard: with ANSI off, size(null array) is LEGACY -1
    keep = F.coalesce(
        (n >= min_words)
        & (mean_wl >= lo)
        & (mean_wl <= hi)
        & ~bad,
        F.lit(False),
    )
    return df.withColumns(
        {
            "n_words": n,
            "mean_word_len": mean_wl,
            "has_bad_phrase": bad,
            "keep": keep,
        }
    )


def hash_split(
    df,
    key_cols,
    fractions: dict[str, float],
    out_col: str = "split",
):
    """Leakage-safe deterministic train/valid/test assignment: the
    split is a pure function of the KEY TUPLE (portable md5 uniform
    vs cumulative fraction thresholds), so every row sharing a key —
    all chunks of one document, all documents of one user/domain —
    lands in the SAME split, the standard defense against eval
    leakage through near-duplicates that row-level random splits
    cannot give. Map-only (one chained CASE fused into the scan),
    stable across engines, runs, retries, and re-partitioning;
    growing the corpus never reassigns an existing key.

    ``fractions`` must be positive and sum to 1 (insertion order
    fixes the threshold layout; the last named split absorbs the
    float residue so every u in [0, 1) is assigned)."""
    if not fractions:
        raise ValueError("hash_split: fractions must be non-empty")
    if any(w <= 0 for w in fractions.values()):
        raise ValueError("hash_split: fractions must be positive")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split: fractions must sum to 1, got {sum(fractions.values())}"
        )
    u = row_uniform(key_cols)
    names = list(fractions)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        # round the cumulative threshold: 0.8 + 0.1 is
        # 0.9000000000000001 in float — a boundary no other engine's
        # literal 0.9 would reproduce
        acc = round(acc + fractions[name], 9)
        cond = u < F.lit(acc)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def temperature_mixture(
    df,
    group_col,
    key_cols,
    alpha: float = 0.5,
    rate_decimals: int = 6,
):
    """Temperature-based group resampling (the mT5/XLM-R α-sampling
    scheme): rebalance group shares toward p_g^α — α < 1 upweights
    rare groups (languages, sources) relative to dominant ones —
    realized by DOWNSAMPLING ONLY, so no row is ever duplicated.
    The per-group keep rate is rate_g = (n_g)^(α-1) / max_h (n_h)^(α-1)
    (the reference group — smallest for α < 1 — keeps everything;
    shares of the kept corpus then land proportional to p_g^α).

    Plan shape: one tiny groupBy count (#groups rows), one one-row
    max agg, rates broadcast back on a null-safe equi-join, then the
    portable-uniform filter — the corpus itself is scanned once and
    never shuffled. Rates are ROUNDED to ``rate_decimals`` before
    the comparison so the selection boundary sits on a coarse
    decimal grid any engine reproduces (pow may differ by an ulp
    across libm implementations). Rows with a NULL group form their
    own group (null-safe join), matching groupBy semantics."""
    if alpha < 0:
        raise ValueError(f"temperature_mixture: alpha must be >= 0, got {alpha}")
    g = _c(group_col)
    cnt = df.groupBy(g.alias("__g")).agg(F.count(F.lit(1)).alias("__n"))
    raw = cnt.select(
        "__g",
        F.pow(F.col("__n").cast("double"), F.lit(alpha - 1.0)).alias("__raw"),
    )
    mx = raw.agg(F.max("__raw").alias("__mx"))
    rates = raw.crossJoin(F.broadcast(mx)).select(
        "__g",
        F.round(F.col("__raw") / F.col("__mx"), rate_decimals).alias("__rate"),
    )
    u = row_uniform(key_cols)
    return (
        df.join(F.broadcast(rates), g.eqNullSafe(F.col("__g")), "left")
        .where(u < F.col("__rate"))
        .drop("__g", "__rate")
    )


def bigram_lm(df, text_col: str, top_v: int = 1000, top_b: int = 20_000):
    """Interpolated bigram language model over the corpus — the
    context-sensitive upgrade of ``unigram_lm`` (toward what CCNet's
    KenLM 5-gram does, kept engine-portable): scoring interpolates a
    maximum-likelihood bigram term with the add-one unigram back-off
    (Jelinek–Mercer), so fluent-but-unseen transitions degrade
    smoothly instead of zeroing out.

    Bounded model state: the unigram side keeps the ``top_v`` vocab
    (ties by token — identical to unigram_lm); the bigram table
    keeps only bigrams whose BOTH tokens are in the vocab, then the
    ``top_b`` most frequent (ties by bigram text) — broadcastable at
    any corpus size. Per-bigram context counts use the w1 unigram
    count (the standard doc-boundary shortcut). One token-count
    shuffle and one bigram-count shuffle total; no driver collect.

    Returns ``(bilm, unilm, totals)``: bilm = (bigram, c, n_w1);
    unilm/totals exactly as unigram_lm (shared scorer back-off).
    All three come back MATERIALIZED as local literal frames
    (bounded model state: <= top_b + top_v + 1 rows — the
    naive_bayes/CoxModel precedent, never row data); without this
    every scoring execution re-ran the full fit lineage — vocabulary
    + unigram LM + the bigram-count shuffle per submission."""
    from ..plans.hints import ensure_scan_parallelism

    from .dedup import window_array_expr
    from ..plans.cache import try_persist, try_unpersist

    # persisted for the FIT's lifetime only (r12): the (token, n)
    # lineage — a full corpus tokenize + count shuffle — is consumed
    # by unigram_lm's n_total/vocab aggs, the bilm's two vocab
    # sides, and again by each of the three collect() jobs below;
    # unpersisted before return because the fit materializes into
    # local literal frames, so nothing references it afterwards
    # (cold fit at sf0.1: ~5 corpus token-count executions -> 1)
    counts = try_persist(vocabulary(df, text_col))
    unilm, totals = unigram_lm(df, text_col, top_v=top_v, counts=counts)
    vocab = _top_vocab(counts, top_v)
    src = ensure_scan_parallelism(df)
    bg = (
        src.select(
            F.explode(
                window_array_expr(tokens(text_col), 2)
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    v1 = vocab.select(
        F.col("token").alias("__w1"), F.col("n").alias("n_w1")
    )
    v2 = vocab.select(F.col("token").alias("__w2"))
    bilm = (
        bg.withColumn("__w1", F.substring_index("bigram", " ", 1))
        .withColumn("__w2", F.substring_index("bigram", " ", -1))
        .join(F.broadcast(v1), "__w1")
        .join(F.broadcast(v2), "__w2", "left_semi")
        .select("bigram", "c", "n_w1")
        .orderBy(F.desc("c"), F.asc("bigram"))
        .limit(top_b)
    )
    spark = df.sparkSession
    # collect()-based materialization (the fit_naive_bayes idiom):
    # a pandas round-trip would coerce any nullable long column to
    # float64/NaN and then fail or silently quantize against the
    # long schema — Row lists re-create losslessly.
    try:
        return tuple(
            spark.createDataFrame(m.collect(), m.schema)
            for m in (bilm, unilm, totals)
        )
    finally:
        try_unpersist(counts)


def bigram_perplexity_score(
    df,
    id_col: str,
    text_col: str,
    bilm,
    unilm,
    totals,
    lam: float = 0.7,
):
    """Per-document cross-entropy/perplexity under the interpolated
    bigram LM from ``bigram_lm``:
    p(w2 | w1) = λ·c(w1,w2)/n(w1) + (1−λ)·p_uni(w2), the bigram
    term zero outside the bounded table, p_uni the add-one unigram
    with OOV back-off. Scores the ``n−1`` bigram positions; docs
    with < 2 tokens are absent (no transition to score).

    Plan shape mirrors perplexity_score: bigram frequencies are
    computed IN-ROW (run-length over the sorted in-row bigram
    array), so only per-doc DISTINCT bigrams explode; both model
    sides broadcast (plan-size-gated like perplexity_score); the
    only shuffle is the per-doc aggregation. The (1−λ) weight is
    rounded to 12 decimals so engines quoting ``0.3`` literally
    agree with the float ``1.0 − 0.7``."""
    from ..plans.hints import ensure_scan_parallelism
    from ..plans.stats import plan_size_bytes

    from .dedup import window_array_expr

    if not 0.0 < lam < 1.0:
        raise ValueError(f"bigram_perplexity_score: lam must be in (0,1), got {lam}")
    om = round(1.0 - lam, 12)
    if om <= 0.0:
        # lam within 5e-13 of 1 rounds the back-off weight to zero:
        # out-of-table bigrams would get prob 0, log(0) = null, and
        # the "every probability finite and positive" contract would
        # break silently — fail fast instead
        raise ValueError(
            f"bigram_perplexity_score: lam={lam} leaves no back-off mass"
        )
    df = ensure_scan_parallelism(df)
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            _freq_pairs(
                F.array_sort(window_array_expr(tokens(text_col), 2))
            )
        ).alias("__p"),
    ).select(
        "id",
        F.col("__p.token").alias("bigram"),
        F.col("__p.tf").cast("long").alias("tf"),
    )
    bilm_side = (
        F.broadcast(bilm) if plan_size_bytes(bilm) <= 256 * 1024 * 1024 else bilm
    )
    uni_side = (
        F.broadcast(unilm)
        if plan_size_bytes(unilm) <= 256 * 1024 * 1024
        else unilm
    )
    scored = (
        pairs.join(bilm_side, "bigram", "left")
        .withColumn("__w2", F.substring_index("bigram", " ", -1))
        .join(
            uni_side.select(
                F.col("token").alias("__w2"), F.col("logp").alias("__lpu")
            ),
            "__w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            "tf",
            (
                F.lit(lam)
                * F.coalesce(
                    F.col("c").cast("double") / F.col("n_w1"), F.lit(0.0)
                )
                + F.lit(om)
                * F.exp(F.coalesce("__lpu", F.col("__oov_logp")))
            ).alias("__prob"),
        )
    )
    ce = -F.sum(F.col("tf") * F.log("__prob")) / F.sum("tf")
    return (
        scored.groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            ce.alias("cross_entropy"),
        )
        .withColumn("ppl", F.exp("cross_entropy"))
    )
