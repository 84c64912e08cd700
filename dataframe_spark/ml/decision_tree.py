"""Decision-tree classifier (greedy CART + TAO refinement), Spark-native.

Reference: /root/reference/src/DataFrame/DecisionTree.hs
(``fitDecisionTree`` :98 = greedy build + ``taoOptimize`` :125,
``treeToExpr`` :92, ``buildGreedyTree`` — greedy gini splits on
per-column percentile thresholds; TAO alternating optimization added
in reference 0.4.1.0).

Spark-first formulation (the MLlib-style level-wise sweep, not a
per-node driver loop):

- All nodes of a depth level train in TWO distributed passes:
  pass A aggregates per-node candidate thresholds (array-percentile
  per feature), pass B aggregates per (node, label) the conditional
  counts for every candidate via map-literal lookups keyed on the
  node id. Only O(nodes x features x percentiles) counters reach
  the driver; rows never do.
- The fitted tree compiles to a nested CASE expression
  (``tree_to_expr``), so prediction is a pure column — usable inside
  any query, pushed through codegen, zero Python at predict time.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..core import is_numeric_dtype


@dataclass
class Tree:
    """A fitted node: either a leaf (prediction) or a split."""

    prediction: object = None
    feature: str | None = None
    threshold: float | None = None
    left: "Tree | None" = None   # feature <= threshold
    right: "Tree | None" = None
    n: int = 0
    gini: float = 0.0

    @property
    def is_leaf(self) -> bool:
        return self.feature is None

    def depth(self) -> int:
        if self.is_leaf:
            return 0
        return 1 + max(self.left.depth(), self.right.depth())


def tree_to_expr(tree: Tree) -> Column:
    """Compile the tree to a nested CASE expression
    (DecisionTree.hs ``treeToExpr``)."""
    if tree.is_leaf:
        return F.lit(tree.prediction)
    return F.when(
        F.col(tree.feature) <= tree.threshold, tree_to_expr(tree.left)
    ).otherwise(tree_to_expr(tree.right))


def _blocked_features(
    used: set[str] | frozenset[str],
    disallowed: Sequence[tuple[str, str]],
) -> set[str]:
    """Features that may not be combined with the already-``used``
    set under ``disallowed`` pair constraints (reference
    DecisionTree.hs:50 ``disallowedCombinations``): for each
    forbidden (l, r), using l blocks r and vice versa. A (f, f)
    self-pair blocks re-use of f."""
    out: set[str] = set()
    for l, r in disallowed:
        if l in used:
            out.add(r)
        if r in used:
            out.add(l)
    return out


def _gini_from_counts(counts: dict) -> float:
    total = sum(counts.values())
    if total == 0:
        return 0.0
    return 1.0 - sum((c / total) ** 2 for c in counts.values())


def fit_decision_tree(
    df: SparkDF,
    target: str,
    features: list[str] | None = None,
    max_depth: int = 3,
    min_samples_split: int = 2,
    min_leaf: int = 1,
    percentiles: tuple = (10, 25, 50, 75, 90),
    exact_midpoints_max: int = 64,
    tao_iterations: int = 10,
    tao_tol: float = 1e-6,
    disallowed_combinations: Sequence[tuple[str, str]] = (),
) -> Tree:
    """Fit a classification tree on numeric features.

    ``disallowed_combinations`` — feature-name pairs that may never
    be tested together (reference DecisionTree.hs:50 SynthConfig
    ``disallowedCombinations``; applied to condition generation at
    DecisionTree.hs:601/676). With single-feature threshold splits
    the pair constraint binds PATH-wise: no root-to-leaf path tests
    both members of a forbidden pair (and a (f, f) self-pair forbids
    re-splitting on f below itself). Enforced in the greedy build
    and in TAO's per-node re-optimization.

    Deterministic: candidate order and argmax tie-breaks are fixed
    (best gini, then feature name, then threshold).

    Features with at most ``exact_midpoints_max`` distinct values
    additionally contribute every adjacent-distinct-value midpoint
    as a split candidate (CART's exact rule), so low-cardinality
    boundaries are recovered exactly instead of at the nearest
    percentile. Two extra bounded aggregations (a countDistinct
    probe, then collect_set only for the qualifying features); the
    midpoints are global, the per-node conditional counts still come
    from the same single pass-B aggregation.

    After the greedy build, ``tao_iterations`` rounds of TAO
    alternating optimization refine the fixed structure (reference
    ``taoOptimize`` DecisionTree.hs:125; 0 disables). The result
    never has higher training loss than the greedy tree:
    tao_optimize returns the lowest-loss tree it observed, the
    greedy input included."""
    if features is None:
        features = [c for c, t in df.dtypes if is_numeric_dtype(t) and c != target]
    if not features:
        raise ValueError("no numeric feature columns")

    data = df.select(
        target, *[F.col(f).cast("double").alias(f) for f in features]
    )

    global_mids: dict[str, list[float]] = {}
    if exact_midpoints_max > 0:
        cd = data.agg(
            *[F.countDistinct(F.col(f)).alias(f) for f in features]
        ).first()
        low = [f for f in features if cd[f] <= exact_midpoints_max]
        if low:
            vals = data.agg(
                *[F.sort_array(F.collect_set(F.col(f))).alias(f) for f in low]
            ).first()
            for f in low:
                vs = vals[f] or []
                global_mids[f] = [
                    (a + b) / 2.0 for a, b in zip(vs, vs[1:])
                ]
    root = Tree()
    # frontier: node_id -> Tree to expand; node assignment expression
    # rebuilt per level from the tree-so-far
    frontier = {0: root}
    # features tested on each frontier node's path from the root
    # (drives the disallowed_combinations path constraint)
    frontier_paths: dict[int, frozenset[str]] = {0: frozenset()}

    def node_expr() -> Column:
        """Column assigning each row to its current frontier node
        (-1 = settled in a leaf that is not expanding)."""

        def walk(t: Tree, nid: int, depth: int) -> Column:
            if id(t) in frontier_ids:
                return F.lit(frontier_ids[id(t)])
            if t.is_leaf:
                return F.lit(-1)
            return F.when(
                F.col(t.feature) <= t.threshold,
                walk(t.left, nid * 2 + 1, depth + 1),
            ).otherwise(walk(t.right, nid * 2 + 2, depth + 1))

        frontier_ids = {id(t): nid for nid, t in frontier.items()}
        return walk(root, 0, 0)

    for _depth in range(max_depth + 1):
        if not frontier:
            break
        assigned = data.withColumn("__node", node_expr()).where(
            F.col("__node") >= 0
        )
        # pass B0: label counts per node (for leaf predictions and gini)
        label_counts = (
            assigned.groupBy("__node", target).count().collect()
        )
        node_labels: dict[int, dict] = {}
        for r in label_counts:
            node_labels.setdefault(r["__node"], {})[r[target]] = r["count"]
        # settle predictions for every frontier node now (majority,
        # deterministic tie-break by label repr)
        for nid, t in frontier.items():
            counts = node_labels.get(nid, {})
            t.n = sum(counts.values())
            t.gini = _gini_from_counts(counts)
            t.prediction = (
                max(counts.items(), key=lambda kv: (kv[1], str(kv[0])))[0]
                if counts
                else None
            )
        if _depth == max_depth:
            break
        expandable = {
            nid: t
            for nid, t in frontier.items()
            if t.n >= min_samples_split and t.gini > 0.0
        }
        if not expandable:
            break
        # pass A: per-node candidate thresholds (percentiles per
        # feature) — only for EXPANDABLE nodes: the percentile value
        # buffer is the loop's most expensive aggregate, and pure /
        # too-small nodes' rows were previously aggregated then
        # discarded on the driver (review r5; pass B already filters)
        pct = F.array(*[F.lit(p / 100.0) for p in percentiles])
        cand_rows = (
            assigned.where(F.col("__node").isin(list(expandable)))
            .groupBy("__node")
            .agg(
                *[
                    F.percentile(F.col(f), pct).alias(f"__p_{f}")
                    for f in features
                ]
            )
            .collect()
        )
        cands: dict[int, dict[str, list[float]]] = {}
        for r in cand_rows:
            if r["__node"] in expandable:
                cands[r["__node"]] = {
                    f: sorted(set(r[f"__p_{f}"] or [])) for f in features
                }
        # pass B: conditional counts for every (feature, percentile slot)
        # via per-node threshold map literals
        agg_exprs = []
        thr_maps: dict[tuple[str, int], dict[int, float]] = {}
        for f in features:
            for i in range(len(percentiles)):
                per_node = {
                    nid: c[f][i]
                    for nid, c in cands.items()
                    if i < len(c[f])
                }
                if not per_node:
                    continue
                thr_maps[(f, i)] = per_node
                m = F.create_map(
                    *[
                        x
                        for nid, thr in per_node.items()
                        for x in (F.lit(nid), F.lit(thr))
                    ]
                )
                agg_exprs.append(
                    F.sum(
                        F.when(F.col(f) <= m[F.col("__node")], 1).otherwise(0)
                    ).alias(f"__le_{f}_{i}")
                )
        # global midpoint candidates: constant thresholds, same for
        # every node, so no per-node map — one counter per midpoint
        mid_slots: dict[tuple[str, int], float] = {}
        for f, mids in global_mids.items():
            for j, thr in enumerate(mids):
                mid_slots[(f, j)] = thr
                agg_exprs.append(
                    F.sum(
                        F.when(F.col(f) <= F.lit(thr), 1).otherwise(0)
                    ).alias(f"__lem_{f}_{j}")
                )
        if not agg_exprs:
            break
        split_rows = (
            assigned.where(F.col("__node").isin(list(expandable)))
            .groupBy("__node", target)
            .agg(*agg_exprs)
            .collect()
        )
        # driver-side gini argmax per node
        by_node: dict[int, list] = {}
        for r in split_rows:
            by_node.setdefault(r["__node"], []).append(r)
        new_frontier: dict[int, Tree] = {}
        new_paths: dict[int, frozenset[str]] = {}
        next_id = 0
        for nid, t in sorted(expandable.items()):
            rows = by_node.get(nid, [])
            total = t.n
            best = None  # (score, feature, threshold)
            blocked = _blocked_features(
                frontier_paths.get(nid, frozenset()), disallowed_combinations
            )
            cand_iter = [
                (f, per_node[nid], f"__le_{f}_{i}")
                for (f, i), per_node in sorted(thr_maps.items())
                if nid in per_node
            ] + [
                (f, thr, f"__lem_{f}_{j}")
                for (f, j), thr in sorted(mid_slots.items())
            ]
            for f, thr, cnt_col in cand_iter:
                if f in blocked:
                    continue
                left_counts = {
                    r[target]: r[cnt_col] for r in rows
                }
                nl = sum(left_counts.values())
                nr = total - nl
                if nl < min_leaf or nr < min_leaf:
                    continue
                right_counts = {
                    lab: node_labels[nid][lab] - left_counts.get(lab, 0)
                    for lab in node_labels[nid]
                }
                score = (
                    nl / total * _gini_from_counts(left_counts)
                    + nr / total * _gini_from_counts(right_counts)
                )
                key = (round(score, 12), f, thr)
                if score < t.gini - 1e-12 and (best is None or key < best):
                    best = key
            if best is not None:
                _, f, thr = best
                t.feature = f
                t.threshold = thr
                t.left = Tree()
                t.right = Tree()
                child_path = frontier_paths.get(nid, frozenset()) | {f}
                new_frontier[next_id] = t.left
                new_paths[next_id] = child_path
                new_frontier[next_id + 1] = t.right
                new_paths[next_id + 1] = child_path
                next_id += 2
        frontier = new_frontier
        frontier_paths = new_paths
    if tao_iterations > 0:
        root = tao_optimize(
            data,
            target,
            features,
            root,
            iterations=tao_iterations,
            tol=tao_tol,
            min_leaf=min_leaf,
            percentiles=percentiles,
            global_mids=global_mids,
            disallowed_combinations=disallowed_combinations,
        )
    return root


def _clone_tree(t: Tree | None) -> Tree | None:
    """Fresh node per POSITION: isolates the caller's tree from
    tao_optimize's in-place sweeps and breaks any aliasing (a
    hand-built tree reusing one Tree object in two positions would
    otherwise collapse two distinct routing nodes into one id —
    review r6)."""
    if t is None:
        return None
    return Tree(
        prediction=t.prediction,
        feature=t.feature,
        threshold=t.threshold,
        left=_clone_tree(t.left),
        right=_clone_tree(t.right),
        n=t.n,
        gini=t.gini,
    )


# candidate (errors, left-count) pairs aggregated per pass — bounds
# the per-agg expression tree the way the minhash HOF rewrite bounds
# the signature tree (review r6: a wide low-cardinality feature set
# can push the global grid to hundreds of candidates)
TAO_CAND_CHUNK = 64


def _nodes_at_depth(root: Tree, d: int) -> list[Tree]:
    out: list[Tree] = []

    def walk(t: Tree, depth: int) -> None:
        if depth == d:
            out.append(t)
            return
        if not t.is_leaf:
            walk(t.left, depth + 1)
            walk(t.right, depth + 1)

    walk(root, 0)
    return out


def _ancestor_feature_map(root: Tree, d: int) -> dict[int, frozenset]:
    """id(node-at-depth-d) -> features tested on its path from the
    root (exclusive of the node itself)."""
    out: dict[int, frozenset] = {}

    def walk(t: Tree | None, depth: int, feats: frozenset) -> None:
        if t is None:
            return
        if depth == d:
            out[id(t)] = feats
            return
        if t.is_leaf:
            return
        walk(t.left, depth + 1, feats | {t.feature})
        walk(t.right, depth + 1, feats | {t.feature})

    walk(root, 0, frozenset())
    return out


def _descendant_features(t: Tree) -> set[str]:
    """Features tested anywhere strictly below ``t``."""
    out: set[str] = set()

    def walk(n: Tree | None) -> None:
        if n is None or n.is_leaf:
            return
        out.add(n.feature)
        walk(n.left)
        walk(n.right)

    walk(t.left)
    walk(t.right)
    return out


def _goes_left(f: str, thr: float) -> Column:
    """Row routing for a candidate split, matching tree_to_expr's
    otherwise-branch semantics: a NULL feature routes right."""
    return F.coalesce(F.col(f) <= F.lit(thr), F.lit(False))


def tao_optimize(
    df: SparkDF,
    target: str,
    features: list[str],
    root: Tree,
    iterations: int = 10,
    tol: float = 1e-6,
    min_leaf: int = 1,
    percentiles: tuple = (10, 25, 50, 75, 90),
    global_mids: dict[str, list[float]] | None = None,
    disallowed_combinations: Sequence[tuple[str, str]] = (),
) -> Tree:
    """TAO alternating optimization over a FIXED tree structure
    (reference ``taoOptimize``/``taoIteration``/``optimizeNode``,
    DecisionTree.hs:125-292, added in reference 0.4.1.0).

    Each iteration sweeps depth levels bottom-to-top. At each level,
    every node is re-optimized against the rows the CURRENT tree
    routes to it, holding the rest of the tree fixed:

    - a leaf re-fits its majority label;
    - a branch re-picks its split over the global candidate grid to
      minimize CARE-POINT errors — care points are rows exactly one
      (fixed) child subtree classifies correctly, and an error is a
      care point routed to its wrong side. Splits leaving either
      side under ``min_leaf`` are invalid; with no valid candidate
      or no care points the current split stays, and a node whose
      final split underfills a side collapses to its majority leaf
      (reference ``optimizeNode``).

    Spark-first: one level = a (node, label) counts aggregation for
    majorities/totals, plus groupBy("__node") passes whose columns
    are (errors, left-count) per candidate — chunked at
    TAO_CAND_CHUNK candidates per pass so the expression tree stays
    bounded however wide the grid — with the fixed child subtrees
    compiled to CASE columns so care-point identification is pure
    JVM expression work. Rows never reach the driver; per-level
    driver state is O(nodes × candidates). Convergence: stop when
    the full tree's misclassification loss improves by less than
    ``tol`` (one extra one-row aggregation per iteration).

    The caller's tree is NOT mutated (it is cloned on entry), and
    the return value is the LOWEST-LOSS tree observed across
    iterations including the input itself — so the result never
    degrades the initial fit even when a re-routed node's incumbent
    split becomes invalid and a forced replacement or collapse
    raises loss mid-run (the reference returns the final iteration
    unconditionally; the snapshot makes the non-degradation
    guarantee real — review r6).

    Deterministic: exact integer counts, candidate ties broken by
    (errors, feature, threshold)."""
    data = df.select(
        target, *[F.col(f).cast("double").alias(f) for f in features]
    )
    # Global candidate grid, as in the reference (conds generated once
    # over the full frame): full-data percentiles per feature, plus
    # the exact low-cardinality midpoints when the caller has them.
    pct = F.array(*[F.lit(p / 100.0) for p in percentiles])
    pct_row = data.agg(
        *[F.percentile(F.col(f), pct).alias(f) for f in features]
    ).first()
    grid: set[tuple[str, float]] = set()
    for f in features:
        for v in pct_row[f] or []:
            if v is not None:
                grid.add((f, float(v)))
    for f, mids in (global_mids or {}).items():
        for v in mids:
            grid.add((f, float(v)))

    root = _clone_tree(root)  # isolate the caller's tree + unshare

    def loss() -> float:
        pred = tree_to_expr(root)
        row = data.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                (~pred.eqNullSafe(F.col(target))).cast("long")
            ).alias("__err"),
        ).first()
        return (row["__err"] / row["__n"]) if row["__n"] else 0.0

    def route_expr(d: int, ids: dict[int, int]) -> Column:
        def walk(t: Tree, depth: int) -> Column:
            if depth == d:
                return F.lit(ids[id(t)])
            if t.is_leaf:
                return F.lit(-1)
            return F.when(
                F.col(t.feature) <= t.threshold, walk(t.left, depth + 1)
            ).otherwise(walk(t.right, depth + 1))

        return walk(root, 0)

    def majority(counts: dict) -> object:
        return (
            max(counts.items(), key=lambda kv: (kv[1], str(kv[0])))[0]
            if counts
            else None
        )

    prev_loss = loss()
    best_loss, best_tree = prev_loss, _clone_tree(root)
    for _it in range(iterations):
        for d in range(root.depth(), -1, -1):
            nodes = _nodes_at_depth(root, d)
            if not nodes:
                continue
            ids = {id(t): i for i, t in enumerate(nodes)}
            assigned = data.withColumn("__node", route_expr(d, ids)).where(
                F.col("__node") >= 0
            )
            lab_rows = assigned.groupBy("__node", target).count().collect()
            node_labels: dict[int, dict] = {}
            for r in lab_rows:
                node_labels.setdefault(r["__node"], {})[r[target]] = r["count"]
            for t in nodes:
                nid = ids[id(t)]
                if t.is_leaf and node_labels.get(nid):
                    t.prediction = majority(node_labels[nid])
            branches = [t for t in nodes if not t.is_leaf]
            if not branches:
                continue
            # disallowed_combinations: re-picking node t's split must
            # not pair with any ANCESTOR feature nor any feature in
            # t's FIXED subtrees (the path constraint holds for every
            # root-to-leaf path through t)
            anc = (
                _ancestor_feature_map(root, d)
                if disallowed_combinations
                else {}
            )
            blocked_for: dict[int, set[str]] = {}
            for t in branches:
                used = set(anc.get(id(t), frozenset()))
                if disallowed_combinations:
                    used |= _descendant_features(t)
                blocked_for[ids[id(t)]] = _blocked_features(
                    used, disallowed_combinations
                )
            # candidate grid + each branch's current split (so the
            # per-node argmin can never do worse than the status quo)
            cands = sorted(
                grid | {(t.feature, float(t.threshold)) for t in branches}
            )
            lp = rp = None
            for t in branches:
                here = F.col("__node") == ids[id(t)]
                le, re_ = tree_to_expr(t.left), tree_to_expr(t.right)
                lp = F.when(here, le) if lp is None else lp.when(here, le)
                rp = F.when(here, re_) if rp is None else rp.when(here, re_)
            correct_l = lp.eqNullSafe(F.col(target))
            correct_r = rp.eqNullSafe(F.col(target))
            care = correct_l != correct_r
            branch_rows = assigned.where(
                F.col("__node").isin([ids[id(t)] for t in branches])
            )
            brow: dict[int, dict] = {}
            for lo in range(0, len(cands), TAO_CAND_CHUNK):
                aggs = [
                    F.count(F.lit(1)).alias("__tot"),
                    F.sum(care.cast("long")).alias("__care"),
                ]
                for i in range(lo, min(lo + TAO_CAND_CHUNK, len(cands))):
                    f, thr = cands[i]
                    goes_left = _goes_left(f, thr)
                    aggs.append(
                        F.sum(
                            (care & (correct_l != goes_left)).cast("long")
                        ).alias(f"__err_{i}")
                    )
                    aggs.append(
                        F.sum(goes_left.cast("long")).alias(f"__nl_{i}")
                    )
                for r in (
                    branch_rows.groupBy("__node").agg(*aggs).collect()
                ):
                    brow.setdefault(r["__node"], {}).update(r.asDict())
            for t in branches:
                nid = ids[id(t)]
                r = brow.get(nid)
                if r is None:  # no rows reach this node: leave as-is
                    continue
                tot = r["__tot"]
                cur = (t.feature, float(t.threshold))
                cur_i = cands.index(cur)
                if r["__care"] == 0:
                    # no care points: keep the current split
                    # (reference identifyCarePoints -> currentCond)
                    best = (0, *cur, cur_i)
                else:
                    best = None  # (errors, feature, threshold, idx)
                    for i, (f, thr) in enumerate(cands):
                        if f in blocked_for.get(nid, ()):
                            continue
                        nl = r[f"__nl_{i}"]
                        if nl < min_leaf or tot - nl < min_leaf:
                            continue
                        key = (r[f"__err_{i}"], f, thr, i)
                        if best is None or key[:3] < best[:3]:
                            best = key
                    if best is None:
                        # no valid candidate: fall back to the
                        # current split (reference findBestSplitTAO)
                        best = (0, *cur, cur_i)
                _, f, thr, i = best
                nl = r[f"__nl_{i}"]
                if nl < min_leaf or tot - nl < min_leaf:
                    # chosen (fallback) split underfills a side:
                    # collapse to the majority leaf (reference
                    # optimizeNode)
                    t.feature = None
                    t.threshold = None
                    t.left = None
                    t.right = None
                    t.prediction = majority(node_labels.get(nid, {}))
                else:
                    t.feature, t.threshold = f, thr
        new_loss = loss()
        if new_loss < best_loss:
            best_loss, best_tree = new_loss, _clone_tree(root)
        if prev_loss - new_loss < tol:
            break
        prev_loss = new_loss
    return best_tree


def predict(df: SparkDF, tree: Tree, out_col: str = "prediction") -> SparkDF:
    return df.withColumn(out_col, tree_to_expr(tree))
