"""Spark-native beam-search feature synthesis.

Reference analogue: Synthesis.hs — beamSearch (:349), generatePrograms
(:67), generateConditions (:45), deduplicate (:163), pickTopN (:381),
percentiles (:262), fitRegression (:298), fitClassifier (:243),
LossFunction (:318).

The reference interprets every candidate expression into an in-memory
vector and scores it on the driver. Here a round's WHOLE BEAM is
scored in ONE distributed aggregation pass: each candidate contributes
a few agg expressions (loss sufficient-statistics, a result-hash
signature for equivalence dedup, a NaN/Inf/null validity flag) over
the same scan. Depth-d search therefore costs O(d × ceil(|beam
expansion| / chunk)) jobs regardless of data size, no candidate column
is ever materialized, and nothing but (candidate, score) tuples ever
reaches the driver.

ANSI-safety: candidate constructors guard every partial function
(x/0, sqrt(<0), log(<= -1)) with when()-null instead of relying on
non-ANSI null semantics, so the search runs identically under an
ANSI-enabled session. Candidates producing ANY null/NaN/Inf are
discarded, mirroring the reference's hasInvalid filter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

_INF = float("inf")

from ..core import is_numeric_dtype


@dataclass(frozen=True)
class Prog:
    """A candidate program: canonical key (dedup + display), node
    count (eSize analogue), compiled pyspark Column."""

    key: str
    size: int
    col: Column = field(compare=False, hash=False, repr=False)
    is_lit: bool = False
    is_cond: bool = False
    # source columns the program reads (Synthesis getColumns
    # analogue) — drives disallowed_combinations filtering
    cols: frozenset = field(
        default=frozenset(), compare=False, hash=False, repr=False
    )


@dataclass(frozen=True)
class BeamConfig:
    """Synthesis.hs:339 BeamConfig."""

    search_depth: int = 2
    beam_length: int = 24
    loss: str = "pearson"  # pearson | mse | f1
    include_conditionals: bool = False
    # scale knob (no reference analogue): bound the symbolic expansion
    max_candidates: int = 1200
    # reference DecisionTree.hs:50 SynthConfig.disallowedCombinations:
    # (l, r) feature-name pairs that may never appear together in one
    # candidate expression (checked at generation, DecisionTree.hs:601)
    disallowed_combinations: tuple = ()


@dataclass(frozen=True)
class SynthesisResult:
    key: str
    col: Column
    score: float


def _fmt_lit(v: float) -> str:
    return f"{v:g}"


def lit_prog(v: float) -> Prog:
    return Prog(_fmt_lit(float(v)), 1, F.lit(float(v)), is_lit=True)


def var_prog(name: str) -> Prog:
    return Prog(name, 1, F.col(name).cast("double"), cols=frozenset({name}))


def _unary(name: str, col: Column, p: Prog) -> Prog:
    return Prog(f"{name}({p.key})", p.size + 1, col, cols=p.cols)


def _binop(op: str, p: Prog, q: Prog, col: Column) -> Prog:
    return Prog(
        f"({p.key} {op} {q.key})", p.size + q.size + 1, col, cols=p.cols | q.cols
    )


def _pair_blocker(disallowed):
    """Compile disallowed (l, r) pairs into a column-set predicate:
    blocked(cols) ⇔ some pair is fully contained in cols — exactly
    the reference's generation-time guard (DecisionTree.hs:601:
    ``l `elem` cols && r `elem` cols``)."""
    pairs = [frozenset((l, r)) for l, r in disallowed]

    def blocked(cols: frozenset) -> bool:
        return any(pair <= cols for pair in pairs)

    return blocked if pairs else None


_UNARY_FNS = [
    ("sqrt", lambda c: F.when(c >= 0, F.sqrt(c))),
    ("abs", F.abs),
    ("log1p", lambda c: F.when(c > -1, F.log1p(c))),
    ("exp", F.exp),
    ("sin", F.sin),
    ("cos", F.cos),
    ("relu", lambda c: F.greatest(c, F.lit(0.0))),
    ("signum", F.signum),
]


def generate_programs(
    include_conds: bool,
    conds: list[Prog],
    variables: list[Prog],
    constants: list[Prog],
    ps: list[Prog],
    disallowed: tuple = (),
) -> list[Prog]:
    """Synthesis.hs:67 generatePrograms — the symbolic expansion of
    one beam round. With an empty beam it returns variables +
    constants (the base generation). ``disallowed`` feature pairs
    are rejected at combination time (DecisionTree.hs:601)."""
    if not ps:
        return variables + constants
    blocked = _pair_blocker(disallowed)
    existing = ps + variables + constants
    out: list[Prog] = list(existing)
    for p in ps + variables:
        if p.is_cond:
            continue
        for name, fn in _UNARY_FNS:
            out.append(_unary(name, fn(p.col), p))
    for p in existing:
        if p.is_cond:
            continue
        for i in range(2, 7):
            out.append(
                Prog(f"pow({p.key}, {i})", p.size + 1, F.pow(p.col, F.lit(i)), cols=p.cols)
            )
    # One pass over pairs emitting every operator family together, so
    # the max_candidates truncation (applied after a size-stable sort)
    # samples across + - * / min max instead of exhausting the budget
    # on the first family generated.
    for i, p in enumerate(existing):
        for j, q in enumerate(existing):
            if p.is_lit and q.is_lit:
                continue
            if p.is_cond or q.is_cond:
                continue
            if blocked is not None and blocked(p.cols | q.cols):
                continue
            if i >= j:  # commutative ops once per unordered pair
                out.append(_binop("+", p, q, p.col + q.col))
                out.append(_binop("*", p, q, p.col * q.col))
                if include_conds and i != j:
                    out.append(
                        Prog(
                            f"min({p.key}, {q.key})",
                            p.size + q.size + 1,
                            F.least(p.col, q.col),
                            cols=p.cols | q.cols,
                        )
                    )
                    out.append(
                        Prog(
                            f"max({p.key}, {q.key})",
                            p.size + q.size + 1,
                            F.greatest(p.col, q.col),
                            cols=p.cols | q.cols,
                        )
                    )
            if i != j:
                out.append(_binop("-", p, q, p.col - q.col))
                # guarded division: null (→ invalid) instead of ANSI error
                out.append(
                    _binop("/", p, q, p.col / F.nullif(q.col, F.lit(0.0)))
                )
    if include_conds:
        for c in conds:
            for r in existing:
                for s in existing:
                    if r.is_cond or s.is_cond or r.key == s.key:
                        continue
                    merged = c.cols | r.cols | s.cols
                    if blocked is not None and blocked(merged):
                        continue
                    out.append(
                        Prog(
                            f"if({c.key}, {r.key}, {s.key})",
                            c.size + r.size + s.size + 1,
                            F.when(c.col, r.col).otherwise(s.col),
                            is_cond=True,
                            cols=merged,
                        )
                    )
    return out


def generate_conditions(
    work: SparkDF,
    target: str,
    conds: list[Prog],
    ps: list[Prog],
    loss: str,
    disallowed: tuple = (),
    memo: dict | None = None,
) -> list[Prog]:
    """Synthesis.hs:45 generateConditions — boolean predicates built
    from <=-comparisons of programs, negations, and and/or
    combinations with prior conditions; the 10 best-scoring (as 0/1
    features under the same loss) survive. ``disallowed`` pairs are
    rejected at combination time, mirroring the reference's
    column-pair guard (DecisionTree.hs:676)."""
    blocked = _pair_blocker(disallowed)
    new: list[Prog] = []
    for p in ps:
        if p.is_lit:
            continue
        for q in ps:
            if p.key == q.key:
                continue
            if blocked is not None and blocked(p.cols | q.cols):
                continue
            new.append(_binop("<=", p, q, p.col <= q.col))
    new.extend(
        Prog(f"not({c.key})", c.size + 1, ~c.col, cols=c.cols) for c in conds
    )
    expanded = list(conds) + list(new)
    for p in new:
        for q in conds:
            if p.key != q.key:
                if blocked is not None and blocked(p.cols | q.cols):
                    continue
                expanded.append(_binop("and", p, q, p.col & q.col))
                expanded.append(_binop("or", p, q, p.col | q.col))
    as_num = [
        replace(c, col=c.col.cast("double")) for c in _nub_by_key(expanded)
    ]
    scored = _score(work, target, as_num, loss, memo=memo)
    top = sorted(scored, key=lambda t: -t[1])[:10]
    # restore boolean columns (the cast was only for scoring)
    by_key = {c.key: c for c in expanded}
    return [by_key[p.key] for p, _ in top]


def _nub_by_key(ps: list[Prog]) -> list[Prog]:
    seen, out = set(), []
    for p in sorted(ps, key=lambda p: p.size):
        if p.key not in seen:
            seen.add(p.key)
            out.append(p)
    return out


def _score(
    work: SparkDF,
    target: str,
    progs: list[Prog],
    loss: str,
    memo: dict | None = None,
) -> list[tuple[Prog, float]]:
    """Score candidates against the target in chunked single-pass
    aggregations; drop invalid (null/NaN/Inf-producing) candidates
    and result-duplicates (keep the smallest expression per identical
    result signature — Synthesis.hs:163 deduplicate semantics).

    ``memo`` (r10): a per-search cache of raw (score, sig) results
    keyed by program key. Beam rounds regenerate a large fraction of
    the previous round's candidates, and the working set is
    identical across rounds, so a cache hit is EXACT — only genuinely
    new programs pay an aggregation pass. The signature dedup still
    runs over the full candidate list, so cross-round duplicate
    results resolve the same way the uncached loop did."""
    t = F.col(target)
    results: list[tuple[Prog, float, int]] = []
    progs = _nub_by_key(progs)
    cfg_chunk = 100

    def _score_chunk(chunk):
        # Aggregates reference the program expressions INLINE — an
        # r10 variant pre-projected the 100 candidate columns before
        # the aggregate and measured 110 s vs 12.9 s per pass at 60 M
        # rows (tools/..: the projection materializes an 800-byte row
        # per input row, while re-evaluating a depth-2 arithmetic
        # program inside each aggregate is near-free and Catalyst
        # already de-duplicates IDENTICAL aggregate functions).
        aggs = []
        for i, p in enumerate(chunk):
            c = p.col
            bad = F.max(
                F.when(c.isNull(), 1)
                .when(F.isnan(c) | (F.abs(c) == _INF), 1)
                .otherwise(0)
            ).alias(f"b{i}")
            # pmod keeps the dedup signature inside int64 under ANSI
            # (raw xxhash64 sums overflow -> hard error in ANSI mode)
            sig = F.sum(F.pmod(F.xxhash64(c), F.lit(1 << 30))).alias(f"g{i}")
            if loss == "pearson":
                # covar + per-candidate stddev collected RAW; the
                # ratio (with its 0-denominator -> null guard,
                # matching the old nullif under both ANSI modes)
                # happens driver-side. stddev(target) appears once —
                # though Catalyst de-duplicates identical aggregate
                # functions, so this is clarity, not a buffer saving.
                score_exprs = [
                    F.covar_samp(t, c).alias(f"s{i}"),
                    F.stddev_samp(c).alias(f"sd{i}"),
                ]
            elif loss == "mse":
                score_exprs = [F.avg((t - c) * (t - c)).alias(f"s{i}")]
            elif loss == "f1":
                pos = c > 0
                tpos = t > 0
                score_exprs = [
                    F.sum(F.when(pos & tpos, 1).otherwise(0)).alias(f"tp{i}"),
                    F.sum(F.when(pos & ~tpos, 1).otherwise(0)).alias(f"fp{i}"),
                    F.sum(F.when(~pos & tpos, 1).otherwise(0)).alias(f"fn{i}"),
                ]
            else:
                raise ValueError(f"unknown loss {loss!r}")
            aggs.extend([bad, sig, *score_exprs])
        if loss == "pearson":
            aggs.append(F.stddev_samp(t).alias("__sdt"))
        row = work.agg(*aggs).first()
        chunk_results: list[tuple[Prog, float | None, int | None]] = []
        for i, p in enumerate(chunk):
            if row[f"b{i}"]:
                chunk_results.append((p, None, None))
                continue
            if loss == "pearson":
                cov, sdc, sdt = row[f"s{i}"], row[f"sd{i}"], row["__sdt"]
                if cov is None or sdc is None or sdt is None:
                    score = None
                else:
                    denom = sdt * sdc
                    score = None if denom == 0.0 else (cov / denom) ** 2
            elif loss == "mse":
                m = row[f"s{i}"]
                score = None if m is None else -m
            else:
                tp, fp, fn = row[f"tp{i}"], row[f"fp{i}"], row[f"fn{i}"]
                if tp is None:  # empty working set: sums come back null
                    chunk_results.append((p, None, None))
                    continue
                prec = 0.0 if tp + fp == 0 else tp / (tp + fp)
                rec = 0.0 if tp + fn == 0 else tp / (tp + fn)
                score = (
                    None
                    if prec + rec == 0
                    else 2 * prec * rec / (prec + rec)
                )
            if score is None or math.isnan(score) or math.isinf(score):
                chunk_results.append((p, None, None))
                continue
            chunk_results.append((p, score, row[f"g{i}"]))
        return chunk_results

    # Chunks are independent aggregations over the SAME persisted
    # working set — submit them as CONCURRENT Spark jobs (py4j job
    # submission is thread-safe; the scheduler interleaves their
    # stages across the executor cores) instead of serially paying
    # ~n_chunks x per-job latency. Results are reassembled in progs
    # order so the stable size-sort's tie-breaks — and therefore the
    # returned beam — are byte-identical to the serial loop.
    fresh = (
        progs if memo is None else [p for p in progs if p.key not in memo]
    )
    chunks = [
        fresh[lo : lo + cfg_chunk] for lo in range(0, len(fresh), cfg_chunk)
    ]
    scored: dict = {}
    if len(chunks) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(chunks))) as ex:
            for part in ex.map(_score_chunk, chunks):
                for p, score, sig in part:
                    scored[p.key] = (score, sig)
    else:
        for chunk in chunks:
            for p, score, sig in _score_chunk(chunk):
                scored[p.key] = (score, sig)
    if memo is not None:
        memo.update(scored)
        scored = memo
    for p in progs:
        score, sig = scored[p.key]
        if score is not None:
            results.append((p, score, sig))
    # result-equivalence dedup: smallest expression wins per signature
    results.sort(key=lambda r: r[0].size)
    seen_sigs, out = set(), []
    for p, score, sig in results:
        if sig in seen_sigs:
            continue
        seen_sigs.add(sig)
        out.append((p, score))
    return out


def percentile_constants(work: SparkDF, feature_cols: list[str]) -> list[Prog]:
    """Synthesis.hs:262 percentiles — per numeric column the 1/25/75/
    99th percentiles plus variance and stddev, rounded to 2
    significant digits, as literal constants. One aggregation pass
    for every column."""
    probs = [0.01, 0.25, 0.75, 0.99]
    aggs = []
    for c in feature_cols:
        cc = F.col(c)
        aggs.append(
            F.percentile(cc, F.array(*[F.lit(p) for p in probs])).alias(f"p_{c}")
        )
        aggs.append(F.var_samp(cc).alias(f"v_{c}"))
    row = work.agg(*aggs).first()
    vals: list[float] = []
    for c in feature_cols:
        ps = row[f"p_{c}"] or []
        vals.extend(ps)
        v = row[f"v_{c}"]
        if v is not None:
            vals.append(v)
            if v >= 0:
                vals.append(math.sqrt(v))
    out, seen = [], set()
    for v in vals:
        if v is None or math.isnan(v) or math.isinf(v):
            continue
        r = _round_sig(v, 2)
        if r not in seen:
            seen.add(r)
            out.append(lit_prog(r))
    return out


def _round_sig(x: float, n: int) -> float:
    """Synthesis.hs:283 roundToSigDigits."""
    if x == 0:
        return 0.0
    magnitude = math.floor(math.log10(abs(x)))
    scale = 10.0 ** (n - 1 - magnitude)
    return round(x * scale) / scale


def beam_search(
    df: SparkDF,
    target: str,
    cfg: BeamConfig,
    extra_constants: list[Prog] | None = None,
) -> SynthesisResult | None:
    """Synthesis.hs:349 beamSearch. Feature columns are every numeric
    column except the target. The projected working set is persisted
    for the duration of the search (it is re-scanned once per scoring
    chunk) and unpersisted before returning."""
    feature_cols = [
        c for c, ty in df.dtypes if is_numeric_dtype(ty) and c != target
    ]
    if not feature_cols:
        return None
    work = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(target).cast("double").alias("__target"),
    ).where(F.col("__target").isNotNull())
    # Balance BEFORE persisting — UNCONDITIONALLY: the working set is
    # re-scanned once per scoring chunk (~1 + candidates/100 passes
    # per round), so every pass inherits the persisted layout. A raw
    # file scan can be few-partition and SKEWED (the 10x corpus: 12
    # files, one straggler held every scoring stage at (11+1)/12 —
    # 255 s uncached vs 40 s balanced). The r8 version gated this on
    # ``rdd.getNumPartitions()``, which counts PLANNED byte-range
    # splits, not non-empty ones: the 100x corpus is one single-task-
    # written 350 MB file with 3 ROW GROUPS, so the planner's ~32
    # splits put all 60 M rows in 3 tasks, the gate skipped the
    # repartition, and every scoring pass ran on 3 of 32 cores —
    # the "super-linear" 23.7x decade factor (1233 s) was 90 passes
    # at 1/10th the cores, not memory or codegen. One bounded
    # shuffle of the projected working set (4 doubles/row) amortizes
    # over all ~90 downstream passes: measured clean 10x 56 s,
    # 100x 1233 s → 335 s, per-decade factor 6.0 (sub-linear).
    try:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    except AttributeError:  # Spark Connect: no sparkContext handle
        try:
            parallelism = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except Exception:
            parallelism = 64
    work = work.repartition(parallelism).persist()
    try:
        variables = [var_prog(c) for c in feature_cols]
        constants = percentile_constants(work, feature_cols) + list(
            extra_constants or []
        )
        beam: list[tuple[Prog, float]] = []
        conds: list[Prog] = []
        # per-search score memo: rounds regenerate most of the prior
        # round's candidates over the SAME persisted working set, so
        # only new programs pay an aggregation pass (r10; exact)
        memo: dict = {}
        for _ in range(cfg.search_depth):
            ps = [p for p, _ in beam]
            if cfg.include_conditionals:
                conds = generate_conditions(
                    work, "__target", conds, variables + constants, cfg.loss,
                    disallowed=cfg.disallowed_combinations, memo=memo,
                )
            cands = generate_programs(
                cfg.include_conditionals, conds, variables, constants, ps,
                disallowed=cfg.disallowed_combinations,
            )
            cands = _nub_by_key(cands)[: cfg.max_candidates]
            scored = _score(work, "__target", cands, cfg.loss, memo=memo)
            beam = sorted(scored, key=lambda t: -t[1])[: cfg.beam_length]
            if not beam:
                return None
        best, score = beam[0]
        return SynthesisResult(best.key, best.col, score)
    finally:
        work.unpersist()


def synthesize_feature_expr(
    df: SparkDF, target: str, cfg: BeamConfig | None = None
) -> SynthesisResult | None:
    """Synthesis.hs:192 synthesizeFeatureExpr (default loss: squared
    Pearson correlation)."""
    return beam_search(df, target, cfg or BeamConfig())


def fit_regression(
    df: SparkDF, target: str, depth: int = 2, beam: int = 24
) -> SynthesisResult | None:
    """Synthesis.hs:298 fitRegression — negated-MSE loss; constants
    additionally include the target mean and powers of 10/1/0.1."""
    mean = df.agg(F.avg(F.col(target).cast("double"))).first()[0]
    extra = [] if mean is None else [lit_prog(mean)]
    pow_consts = {float(b) ** i for b in (10.0, 1.0, 0.1) for i in range(1, 7)}
    extra.extend(lit_prog(v) for v in sorted(pow_consts))
    cfg = BeamConfig(
        search_depth=depth, beam_length=beam, loss="mse",
        include_conditionals=True,
    )
    return beam_search(df, target, cfg, extra_constants=extra)


def fit_classifier(
    df: SparkDF, target: str, depth: int = 2, beam: int = 24
) -> SynthesisResult | None:
    """Synthesis.hs:243 fitClassifier — F1 loss over sign(program);
    returns the thresholded 0/1 expression."""
    extra = [lit_prog(1.0), lit_prog(0.0), lit_prog(-1.0)]
    cfg = BeamConfig(
        search_depth=depth, beam_length=beam, loss="f1",
        include_conditionals=True,
    )
    res = beam_search(df, target, cfg, extra_constants=extra)
    if res is None:
        return None
    return SynthesisResult(
        f"if(({res.key}) > 0, 1, 0)",
        F.when(res.col > 0, F.lit(1)).otherwise(F.lit(0)),
        res.score,
    )


def mutual_information(
    df: SparkDF, x_col: str, y_col: str
) -> SparkDF:
    """Statistics.hs:209 mutualInformationBinned — equi-width binning
    with k = max(10, ceil(sqrt(n))) bins per axis, MI in bits.

    Fully distributed plan: one stats pass (broadcast back), one
    groupBy over (bx, by) — at most k² rows — then window marginals
    and a final sum. Returns a one-row DataFrame (column ``mi``)."""
    from pyspark.sql.window import Window

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    src = df.select(x.alias("__x"), y.alias("__y")).where(
        x.isNotNull() & y.isNotNull()
    )
    stats = src.agg(
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
        F.count(F.lit(1)).alias("__n"),
        F.greatest(
            F.lit(10), F.ceil(F.sqrt(F.count(F.lit(1))))
        ).alias("__k"),
    )
    k = F.col("__k")

    def bin_of(v, lo, hi):
        t = (v - lo) / (hi - lo)
        ix = F.floor(k.cast("double") * t)
        return (
            F.when(hi == lo, F.lit(0).cast("long"))
            .otherwise(F.greatest(F.lit(0).cast("long"), F.least(k - 1, ix)))
        )

    binned = src.crossJoin(F.broadcast(stats)).select(
        bin_of(F.col("__x"), F.col("__xmin"), F.col("__xmax")).alias("bx"),
        bin_of(F.col("__y"), F.col("__ymin"), F.col("__ymax")).alias("by"),
        F.col("__n"),
    )
    joint = binned.groupBy("bx", "by").agg(
        F.count(F.lit(1)).alias("cxy"), F.max("__n").alias("n")
    )
    wx = Window.partitionBy("bx")
    wy = Window.partitionBy("by")
    m = joint.select(
        "cxy",
        "n",
        F.sum("cxy").over(wx).alias("cx"),
        F.sum("cxy").over(wy).alias("cy"),
    )
    pxy = F.col("cxy") / F.col("n")
    px = F.col("cx") / F.col("n")
    py = F.col("cy") / F.col("n")
    return m.agg(
        F.round(F.sum(pxy * F.log2(pxy / (px * py))), 4).alias("mi")
    )
