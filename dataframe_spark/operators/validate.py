"""Declarative data-quality validation (Deequ/Great-Expectations
style, sized for Spark).

LLM-pipeline / warehouse extension (no reference analogue; the
nearest verbs are describeColumns' null/unique profiling): before a
100 TB table feeds training or analytics, you assert a CONTRACT —
completeness, ranges, formats, key uniqueness — and want every
violation counted in as few passes as the checks allow.

Plan shape: all ROW-LEVEL rules (null / range / set / regex /
arbitrary boolean) fold into ONE conditional-count aggregate over a
single scan — adding a rule adds a column to the agg, never a pass.
Key-uniqueness rules are genuinely aggregate-level (count vs
distinct count) and run as one extra agg per key set. Output is
long-form ``(rule, n_rows, n_violations, frac_violations)`` —
engine-portable exact integers plus one rounded ratio.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def is_null(col: str) -> Column:
    """Violation predicate: completeness check."""
    return F.col(col).isNull()


def not_in_range(col: str, lo, hi) -> Column:
    """Violation predicate: value outside [lo, hi] (nulls violate —
    an absent measurement cannot satisfy a range contract)."""
    c = F.col(col)
    return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))


def not_in_set(col: str, allowed) -> Column:
    """Violation predicate: value not in the allowed set (nulls
    violate)."""
    c = F.col(col)
    return c.isNull() | ~c.isin(list(allowed))


def not_matching(col: str, pattern: str) -> Column:
    """Violation predicate: string does not match the regex
    (UNANCHORED, the SQL REGEXP convention — add ^...$ to require a
    full match; keep patterns RE2-safe for engine portability;
    nulls violate)."""
    c = F.col(col)
    return c.isNull() | ~c.rlike(pattern)


def validate(
    df: SparkDF,
    row_rules: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    frac_decimals: int = 6,
) -> SparkDF:
    """Run the contract. ``row_rules`` maps rule name → VIOLATION
    predicate (true = bad row); ``unique_keys`` maps rule name →
    key column list whose tuples must be unique (violations = rows
    beyond the first per duplicated key, counted exactly as
    n − n_distinct; rows with any NULL key component count as
    violations — a null key cannot witness uniqueness).
    Returns one row per rule:
    (rule, n_rows, n_violations, frac_violations)."""
    row_rules = row_rules or {}
    unique_keys = unique_keys or {}
    if not row_rules and not unique_keys:
        raise ValueError("validate: no rules given")
    for name in set(row_rules) & set(unique_keys):
        raise ValueError(f"validate: duplicate rule name {name!r}")

    frames = []
    if row_rules:
        names = list(row_rules)
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(cond.cast("long")).alias(f"__v_{i}")
                for i, cond in enumerate(row_rules.values())
            ],
        )
        # long-form via one stack over the single agg row; rule
        # names are caller strings — hoisted _q-style escaping
        from ..core import _q

        cells = ", ".join(
            f"{_q(n)}, __v_{i}" for i, n in enumerate(names)
        )
        frames.append(
            agg.selectExpr(
                "__n", f"stack({len(names)}, {cells}) as (rule, __viol)"
            )
        )
    for name, keys in unique_keys.items():
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("__n"),
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(k) for k in keys])
                ).alias("__viol"),
            ).select("__n", F.lit(name).alias("rule"), "__viol")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "rule",
        F.col("__n").alias("n_rows"),
        F.coalesce(F.col("__viol"), F.lit(0)).alias("n_violations"),
        F.round(
            F.coalesce(F.col("__viol"), F.lit(0))
            / F.nullif(F.col("__n").cast("double"), F.lit(0.0)),
            frac_decimals,
        ).alias("frac_violations"),
    )
