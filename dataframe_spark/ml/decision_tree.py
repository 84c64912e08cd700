"""Greedy gini decision-tree classifier, Spark-native.

Reference: /root/reference/src/DataFrame/DecisionTree.hs
(``fitDecisionTree`` :98, ``treeToExpr`` :92, ``buildGreedyTree`` — greedy
gini splits on per-column percentile thresholds; the TAO refinement
pass is out of scope this round).

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
) -> Tree:
    """Fit a classification tree on numeric features.

    Deterministic: candidate order and argmax tie-breaks are fixed
    (best gini, then feature name, then threshold).

    Features with at most ``exact_midpoints_max`` distinct values
    additionally contribute every adjacent-distinct-value midpoint
    as a split candidate (CART's exact rule), so low-cardinality
    boundaries are recovered exactly instead of at the nearest
    percentile. Two extra bounded aggregations (a countDistinct
    probe, then collect_set only for the qualifying features); the
    midpoints are global, the per-node conditional counts still come
    from the same single pass-B aggregation."""
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
        next_id = 0
        for nid, t in sorted(expandable.items()):
            rows = by_node.get(nid, [])
            total = t.n
            best = None  # (score, feature, threshold)
            cand_iter = [
                (f, per_node[nid], f"__le_{f}_{i}")
                for (f, i), per_node in sorted(thr_maps.items())
                if nid in per_node
            ] + [
                (f, thr, f"__lem_{f}_{j}")
                for (f, j), thr in sorted(mid_slots.items())
            ]
            for f, thr, cnt_col in cand_iter:
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
                new_frontier[next_id] = t.left
                new_frontier[next_id + 1] = t.right
                next_id += 2
        frontier = new_frontier
    return root


def predict(df: SparkDF, tree: Tree, out_col: str = "prediction") -> SparkDF:
    return df.withColumn(out_col, tree_to_expr(tree))
