"""FrameM — chained-mutation builder (reference DataFrame/Monad.hs).

The reference wraps its eager frame in a state monad so a pipeline
can thread one evolving frame while each step hands back a column
REFERENCE for later steps (Monad.hs:23 ``FrameM``, :52 ``deriveM``
returns ``Col name``, :57 ``renameM``, :63 ``filterWhereM``, :77
``filterJustM``, :82 ``imputeM``, :90 ``runFrameM``).

Python has no do-notation; the idiomatic equivalent is a small
mutable builder: every verb updates the internal frame in place and
returns what the reference's action returns (a ``pyspark.sql.Column``
for column-producing steps, None for frame-only steps). Nothing is
materialized — the builder only accumulates a lazy Spark plan, so a
FrameM chain compiles to exactly the plan the fluent immutable API
would have produced and Catalyst optimizes it whole.

    fm = FrameM(df)
    total = fm.derive("total", F.col("price") * F.col("qty"))
    fm.filter_where(total > 100)
    revenue = fm.rename(total, "revenue")
    result = fm.frame()          # execFrameM
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import DataFrame

__all__ = ["FrameM"]


def _name_of(col: str | Column) -> str:
    """Column name behind a reference (Monad.hs pattern-matches
    ``Col name``; pyspark Columns expose it via the expression)."""
    if isinstance(col, str):
        return col
    # Connect-safe extraction first: repr(Column) is "Column<'expr'>"
    # in both classic and Connect modes; fall back to the classic-only
    # JVM handle. (Connect Columns have no _jc — reaching for it first
    # would break every column-reference verb under a Connect session.)
    s = None
    r = repr(col)
    if r.startswith("Column<'") and r.endswith("'>"):
        s = r[8:-2]
    elif hasattr(col, "_jc"):  # pragma: no cover - classic fallback
        s = col._jc.toString()
    if s is None:
        raise ValueError(f"cannot extract a column name from {col!r}")
    # plain NAME (no expression syntax): reject anything containing
    # operator/call/quote characters; everything else — including
    # digit-leading names and names with spaces, both legal Spark
    # column names the old identifier regex rejected (review r5) —
    # passes through as-is
    import re

    if re.search(r"[()+*/<>=,'\"`|&%^!]| AS | as ", s) or s == "":
        raise ValueError(
            f"need a plain column reference, got compound expression {s!r}"
        )
    return s


class FrameM:
    """State-monad analogue: one evolving frame, verbs return column
    references. ``frame()`` is ``execFrameM``; pair it with a normal
    Python return value for ``runFrameM``/``evalFrameM``."""

    def __init__(self, df: DataFrame):
        self._df = df if isinstance(df, DataFrame) else DataFrame(df)

    # -- runFrameM surface --------------------------------------------

    def frame(self) -> DataFrame:
        """execFrameM — the accumulated (still lazy) frame."""
        return self._df

    def modify(self, fn) -> None:
        """modifyM — apply any DataFrame -> DataFrame step."""
        self._df = fn(self._df)

    def inspect(self, fn):
        """inspectM — read something off the current frame without
        changing it (e.g. ``fm.inspect(lambda d: d.column_names)``)."""
        return fn(self._df)

    # -- column-producing actions (return a reference) ----------------

    def derive(self, name: str, expr: Column) -> Column:
        """deriveM — add a computed column, return its reference."""
        self._df = self._df.derive(name, expr)
        return F.col(name)

    def rename(self, col: str | Column, new_name: str) -> Column:
        """renameM — rename a referenced column (compound expressions
        fall back to derive, as in Monad.hs:60)."""
        try:
            old = _name_of(col)
        except ValueError:
            return self.derive(new_name, col if isinstance(col, Column) else F.col(col))
        self._df = self._df.rename(old, new_name)
        return F.col(new_name)

    def filter_just(self, col: str | Column) -> Column:
        """filterJustM — drop rows where the column is null; the
        reference refuses compound expressions (Monad.hs:80)."""
        name = _name_of(col)
        self._df = self._df.filter_just(name)
        return F.col(name)

    def impute(self, col: str | Column, strategy="mean") -> Column:
        """imputeM — fill the column's nulls, return its reference."""
        name = _name_of(col)
        self._df = self._df.impute([name], strategy)
        return F.col(name)

    # -- frame-only actions -------------------------------------------

    def filter_where(self, cond: Column) -> None:
        self._df = self._df.filter_where(cond)

    def sample(self, fraction: float, seed: int = 42) -> None:
        self._df = self._df.sample(fraction, seed)

    def take(self, n: int) -> None:
        self._df = self._df.take(n)
