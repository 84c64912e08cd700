"""BPE tokenizer training (operators/bpe.py).

The ground truth is an independent pure-Python reference trainer
(classic Sennrich-style: positional pair counts over word types,
greedy left-to-right merge application) — the Spark trainer's
sentinel-string encoding must reproduce it merge-for-merge.
"""

from __future__ import annotations

import pytest

from dataframe_spark.operators import bpe as B


# --- pure-Python reference ------------------------------------------


def _ref_train(word_counts: dict[str, int], n_merges: int, min_count: int = 1):
    """Reference BPE: words as symbol tuples (chars + '</w>').

    Tie-break mirrors the trainer's sentinel-char total order: raw
    chars sort by codepoint, '</w>' above all raw chars (it IS
    chr(0xE000) there), and merged symbols by CREATION order above
    that (merge t is chr(0xE001 + t))."""
    words = {
        tuple(w) + ("</w>",): n for w, n in word_counts.items()
    }
    code = {"</w>": 0xE000}

    def _code(sym: str) -> int:
        if sym in code:
            return code[sym]
        assert len(sym) == 1, f"unregistered merged symbol {sym!r}"
        return ord(sym)

    merges = []
    for t in range(n_merges):
        pairs: dict[tuple, int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n
                )
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (-kv[1], _code(kv[0][0]), _code(kv[0][1])),
        )
        (a, b), cnt = best
        if cnt < min_count:
            break
        code[a + b] = 0xE001 + t
        merges.append((a, b, cnt))
        merged = a + b
        out = {}
        for syms, n in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + n
        words = out
    return merges, words


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _counts_from_texts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "wider new newer lowest",
]


def test_bpe_matches_reference(spark):
    docs = _mk_docs(spark, TEXTS)
    model = B.bpe_train(docs, "text", n_merges=6)
    ref, _ = _ref_train(_counts_from_texts(TEXTS), 6)
    got = [(m["lhs"], m["rhs"], m["n"]) for m in model.merges]
    assert got == ref


def test_bpe_merge_table_schema(spark):
    docs = _mk_docs(spark, TEXTS)
    model = B.bpe_train(docs, "text", n_merges=3)
    tbl = B.bpe_merge_table(spark, model)
    rows = tbl.collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all(r["n"] >= 1 for r in rows)


def test_bpe_min_count_early_stop(spark):
    # every word unique => max pair count is 1; min_count=2 stops at 0
    docs = _mk_docs(spark, ["alpha beta gamma"])
    model = B.bpe_train(docs, "text", n_merges=5, min_count=4)
    assert model.merges == []


def test_bpe_overlap_is_greedy_left_to_right(spark):
    # 'aaaa' + '</w>': pair (a,a) counts 3 (overlapping positions),
    # but application merges positions (0,1) and (2,3) only
    docs = _mk_docs(spark, ["aaaa aaaa aaaa"])
    model = B.bpe_train(docs, "text", n_merges=1)
    assert (model.merges[0]["lhs"], model.merges[0]["rhs"]) == ("a", "a")
    assert model.merges[0]["n"] == 9  # 3 positions x 3 occurrences
    seg = B.bpe_segment(
        _mk_docs(spark, ["aaaa"]), "doc_id", "text", model
    ).collect()
    assert seg[0]["symbols"] == ["aa", "aa", "</w>"]


def test_bpe_subtoken_counts_match_segment_lengths(spark):
    docs = _mk_docs(spark, TEXTS + [""])  # include an empty doc
    model = B.bpe_train(docs, "text", n_merges=4)
    counts = {
        r["id"]: (r["n_tokens"], r["n_subtokens"])
        for r in B.bpe_subtoken_counts(docs, "doc_id", "text", model).collect()
    }
    from pyspark.sql import functions as F

    seg = (
        B.bpe_segment(docs, "doc_id", "text", model)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.size("symbols")).alias("n_sub"),
        )
        .collect()
    )
    for r in seg:
        assert counts[r["id"]] == (r["n_tok"], r["n_sub"])
    # empty doc present with zeros in counts, absent from segment rows
    assert counts[len(TEXTS)] == (0, 0)


def test_bpe_sentinel_tokens_dropped_from_training(spark):
    # a token carrying a private-use char may not poison the alphabet
    poisoned = TEXTS + ["low \ue005bad low"]
    docs = _mk_docs(spark, poisoned)
    model = B.bpe_train(docs, "text", n_merges=6)
    clean = _counts_from_texts(TEXTS)
    clean["low"] = clean["low"] + 2  # the two extra 'low's still count
    ref, _ = _ref_train(clean, 6)
    got = [(m["lhs"], m["rhs"], m["n"]) for m in model.merges]
    assert got == ref


def test_bpe_speculative_matches_sequential(spark):
    """The speculative top-K trainer must learn IDENTICAL merges to
    the one-argmax-per-job trainer (speculative_k=1) — the
    acceptance rule (_speculative_prefix) claims each accepted pair
    is the exact round argmax, so any divergence is a soundness bug.
    Random corpora stress tie-breaks, interacting pairs (shared
    symbols), and created-pair overtakes; the driver-side reference
    trainer adjudicates both."""
    import random

    rng = random.Random(1234)
    alphabet = "abcde"
    for trial in range(6):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(4, 14))
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(2, 12)))
            for _ in range(4)
        ]
        docs = _mk_docs(spark, texts)
        spec = B.bpe_train(docs, "text", n_merges=8)
        seq = B.bpe_train(docs, "text", n_merges=8, speculative_k=1)
        assert spec.merges == seq.merges, (trial, texts)
        assert spec.ops == seq.ops
        ref, _ = _ref_train(_counts_from_texts(texts), 8)
        got = [(m["lhs"], m["rhs"], m["n"]) for m in spec.merges]
        assert got == ref, (trial, texts)


def test_bpe_deterministic(spark):
    docs = _mk_docs(spark, TEXTS)
    m1 = B.bpe_train(docs, "text", n_merges=5)
    m2 = B.bpe_train(docs, "text", n_merges=5)
    assert m1.merges == m2.merges


@pytest.mark.parametrize("n_merges", [0, 1])
def test_bpe_zero_and_one_merge(spark, n_merges):
    docs = _mk_docs(spark, TEXTS)
    model = B.bpe_train(docs, "text", n_merges=n_merges)
    assert len(model.merges) == n_merges
    out = B.bpe_subtoken_counts(docs, "doc_id", "text", model).collect()
    # with zero merges, subtokens = chars + EOW per token
    if n_merges == 0:
        for r, t in zip(sorted(out, key=lambda r: r["id"]), TEXTS):
            toks = t.split()
            assert r["n_subtokens"] == sum(len(w) + 1 for w in toks)
