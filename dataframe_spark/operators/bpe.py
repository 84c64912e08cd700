"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-fitting step of a training-data pipeline, run on the corpus
the model will be trained on.

LLM-pipeline extension (no reference counterpart; the reference's
nearest surface is the tokenize/split Expr family, Functions.hs
splitOn). Everything here is engine-portable by construction so the
DuckDB oracle can replay training exactly (see queries/text_q.py).

Scale design (the 100 TB story):

- The ONLY corpus-sized work is the initial word-type count — one
  shuffle keyed on the word. Every merge round then runs on the
  word-TYPE table (vocabulary-sized, weighted by count), exactly like
  single-node BPE trainers do; a 100 TB corpus with a 100 M-type
  vocabulary trains at vocabulary scale, not corpus scale.
- Words are kept as STRINGS in which every symbol is ONE character:
  round t's merged symbol is the private-use sentinel chr(0xE001+t)
  and end-of-word is chr(0xE000). That makes pair counting a
  substring explode and merge application a single JVM ``replace``
  (greedy, left-to-right, non-overlapping — which IS the BPE merge
  rule), so no Python touches the hot path and the whole round is
  whole-stage-codegen'd.
- The driver holds only the bounded merge table (``n_merges`` rows)
  plus one 1-row collect per round (the argmax pair) — no corpus or
  vocabulary data ever collects.

Determinism: the winning pair each round is argmax by (count DESC,
left ASC, right ASC) over the sentinel-level characters — a total
order identical in any engine with binary string collation.

PRECONDITION: corpus tokens must not contain private-use characters
U+E000..U+F8FF (they are this module's symbol alphabet); offending
word types are dropped at count time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

EOW = "\ue000"  # end-of-word symbol (displayed as '</w>')
SENT0 = 0xE001  # round t's merged symbol is chr(SENT0 + t)
EOW_DISPLAY = "</w>"


@dataclass
class BPEModel:
    """Learned merge list. ``merges`` carries the human-readable rows
    (rank, lhs, rhs, n) with sentinels expanded; ``ops`` the raw
    (two-char pattern, one-char sentinel) replace chain, in rank
    order, for applying the model with ``bpe_subtoken_counts``."""

    merges: list[dict] = field(default_factory=list)
    ops: list[tuple[str, str]] = field(default_factory=list)


def _word_types(df, text_col: str):
    from .text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(~F.col("w").rlike("[\ue000-\uf8ff]"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat(F.col("w"), F.lit(EOW)).alias("w"), "n")
    )


def _pair_positions(words):
    # sequence(1, length-1) guarded: a fully merged word has length 1
    # and sequence(1, 0) would DESCEND ([1, 0]), not come back empty
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        words.select(F.explode(idx).alias("i"), "w", "n")
        .selectExpr(
            "substring(w, i, 1) AS l", "substring(w, i + 1, 1) AS r", "n"
        )
    )


# merge rounds between re-materializations of the word-type table:
# each argmax job re-applies at most this many chained in-row
# replaces over the persisted base vocabulary — cheap next to the
# pair explode in the same job — so a round costs ONE Spark job
# (the argmax collect) instead of two (argmax + persist count).
# Unbounded chaining would make round t recompute t replaces, so
# long trainings re-base periodically to keep it O(RECHAIN_EVERY).
BPE_RECHAIN_EVERY = 8


def _speculative_prefix(rows, t0, n_merges, min_count, k):
    """The ACCEPTED prefix of a collected top-``k`` pair table —
    merges that are provably the next argmaxes without recounting.

    Soundness (each accepted pair j is the true round argmax after
    applying the accepted pairs before it):

    - A replace "lr" -> s shrinks 2 chars to 1, so two OLD symbols
      never become newly adjacent: every OLD pair's count can only
      DECREASE, and the count of a pair sharing NO symbol with the
      applied pair cannot change at all (its occurrences cannot
      overlap an "lr" occurrence). Candidate j is accepted only if
      symbol-disjoint from every earlier accepted pair, so its own
      count is unchanged, and every old pair ordered after it (by
      the cnt DESC, l ASC, r ASC total order) stays at-or-below its
      old count — j still beats them (ties keep their symbol order:
      both counts unchanged under disjointness).
    - NEW pairs contain an accepted sentinel s_i and are bounded by
      the PRE-batch table: count(x, s_i) <= count(x, l_i) and
      count(s_i, y) <= count(r_i, y) (every occurrence of the new
      adjacency was an occurrence of the old one). Each such bound
      is either a collected count or <= the k-th collected count, so
      accepting j requires cnt_j STRICTLY greater than all of them
      (strict so a tie can never be decided by the sentinel's
      position in the symbol order). Second-order creations (x
      itself a sentinel from this batch) obey the same bound
      transitively.

    Any candidate failing a condition stops the prefix — the next
    Spark job recounts and decides it exactly, so worst case the
    trainer degenerates to the sequential one-argmax-per-job shape
    with identical output (pinned by
    tests/test_bpe.py::test_bpe_speculative_matches_sequential)."""
    accepted = []
    ck = rows[-1]["cnt"] if len(rows) == k else 0  # bound for pairs
    # outside the collected table (complete table -> no outside)
    used: set[str] = set()
    bound = 0
    for j, row in enumerate(rows):
        if t0 + len(accepted) >= n_merges or row["cnt"] < min_count:
            break
        l, r, cnt = row["l"], row["r"], int(row["cnt"])
        if j > 0:
            if l in used or r in used:
                break
            if cnt <= bound:
                break
        accepted.append((l, r, cnt))
        used.update((l, r))
        # bound for pairs CREATED by this acceptance: collected
        # counts of (x, l) / (r, y), else <= ck
        created = [
            int(p["cnt"])
            for p in rows
            if p["r"] == l or p["l"] == r
        ]
        bound = max([bound, ck] + created)
    return accepted


def bpe_train(
    df,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 1,
    speculative_k: int = 16,
) -> BPEModel:
    """Learn ``n_merges`` BPE merges over the whitespace tokens of
    ``text_col``. Stops early when no pair reaches ``min_count``.
    Pair counts follow the classic trainer: occurrences are counted
    at every position (overlaps included), application is greedy
    non-overlapping left-to-right.

    Merge rounds are inherently sequential (round t+1's counts
    depend on round t's replace), and on a vocabulary-sized table
    each round's cost is dominated by the driver-coordinated job
    floor — r12 halved it to one job per round (the replace chain);
    the residual n_merges sequential argmax jobs were the #1
    remaining headline cost (guide §1.2: remove passes). r13: each
    job now collects the top ``speculative_k`` pairs instead of one
    and applies the longest PROVABLY-independent prefix
    (_speculative_prefix — symbol-disjointness plus a strict
    created-pair bound make each accepted pair the exact argmax of
    its round), so one job can retire several rounds while the
    learned merges stay IDENTICAL — the oracle replays all training
    rounds, and equality with the sequential trainer is test-pinned.
    ``speculative_k=1`` forces the sequential shape."""
    base = _word_types(df, text_col).persist()
    base.count()
    model = BPEModel()
    expanded: dict[str, str] = {EOW: EOW_DISPLAY}

    def _chained(src, ops):
        out = src
        for pat, s in ops:
            out = out.select(
                F.replace(F.col("w"), F.lit(pat), F.lit(s)).alias("w"), "n"
            )
        return out

    # replaces applied since `base` was materialized, in rank order —
    # composing them as lineage is string-identical to materializing
    # after every round (replace is applied per row; rows are never
    # re-grouped between rounds on either shape)
    pending: list[tuple[str, str]] = []
    t = 0
    try:
        while t < n_merges:
            rows = (
                _pair_positions(_chained(base, pending))
                .groupBy("l", "r")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(max(1, speculative_k))
                .collect()
            )
            if not rows or rows[0]["cnt"] < min_count:
                break
            batch = _speculative_prefix(
                rows, t, n_merges, min_count, max(1, speculative_k)
            )
            for l, r, cnt in batch:
                s = chr(SENT0 + t)
                lhs, rhs = expanded.get(l, l), expanded.get(r, r)
                expanded[s] = lhs + rhs
                model.ops.append((l + r, s))
                model.merges.append(
                    {"rank": t + 1, "lhs": lhs, "rhs": rhs, "n": cnt}
                )
                pending.append((l + r, s))
                t += 1
            if len(pending) >= BPE_RECHAIN_EVERY and t < n_merges:
                nxt = _chained(base, pending).persist()
                try:
                    nxt.count()
                except Exception:
                    # materialization failed: release nxt here — the
                    # finally below only knows the `base` binding
                    nxt.unpersist()
                    raise
                base.unpersist()
                base = nxt
                pending = []
    finally:
        base.unpersist()
    return model


def bpe_merge_table(spark, model: BPEModel):
    """The learned merge list as a DataFrame (rank, lhs, rhs, n) —
    bounded by n_merges, so createDataFrame is driver-safe."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("lhs", StringType()),
            StructField("rhs", StringType()),
            StructField("n", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["rank"], m["lhs"], m["rhs"], m["n"]) for m in model.merges],
        schema,
    )


def _apply_ops(col, ops):
    out = F.concat(col, F.lit(EOW))
    for pat, s in ops:
        out = F.replace(out, F.lit(pat), F.lit(s))
    return out


def bpe_subtoken_counts(df, id_col: str, text_col: str, model: BPEModel):
    """Apply a learned model to the corpus: per-document whitespace
    token count and BPE subtoken count (the sequence length the
    tokenizer would emit). Fully in-row — the merge chain is
    ``n_merges`` JVM replaces per token inside one higher-order
    transform, zero shuffles, zero Python — so it composes with the
    scan at any scale (the token-budget / packing operators take
    this count as input). NULL text counts as an empty document —
    (0, 0), matching a LEFT JOIN + COALESCE oracle — not null/-1."""
    from .text import tokens

    toks = F.coalesce(tokens(text_col), F.array().cast("array<string>"))
    n_sub = F.aggregate(
        F.transform(
            toks, lambda tok: F.length(_apply_ops(tok, model.ops))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        n_sub.alias("n_subtokens"),
    )


def bpe_segment(df, id_col: str, text_col: str, model: BPEModel):
    """Per-document BPE segmentation: explode tokens and emit each
    token's symbol sequence (array of human-readable symbols, EOW as
    '</w>'). The sentinel->symbol map is bounded by n_merges and
    ships as a literal map expression — in-row, no shuffle beyond
    the explode the caller asked for."""
    from .text import tokens

    mapping: dict[str, str] = {EOW: EOW_DISPLAY}
    for m, (_, s) in zip(model.merges, model.ops):
        mapping[s] = m["lhs"] + m["rhs"]
    kv = []
    for k, v in mapping.items():
        kv.extend([F.lit(k), F.lit(v)])
    sym_map = F.create_map(*kv) if kv else F.create_map()
    encoded = _apply_ops(F.col("token"), model.ops)
    symbols = F.transform(
        F.split(encoded, ""),
        lambda ch: F.coalesce(sym_map.getItem(ch), ch),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(tokens(text_col)).alias("token_idx", "token"),
        )
        .select(
            "id",
            "token_idx",
            "token",
            F.filter(symbols, lambda s: s != "").alias("symbols"),
        )
    )
