"""Expression DSL — the analogue of the reference's ``DataFrame.Functions``.

Reference: /root/reference/src/DataFrame/Functions.hs (Expr DSL:
col/lit/lift/comparisons/boolean/conditional/aggregations) and
/root/reference/src/DataFrame/Internal/Expression.hs.

Every function here returns a :class:`pyspark.sql.Column`, i.e. a
Catalyst expression node. Nothing executes eagerly; the whole
pipeline stays inside whole-stage codegen on the JVM. ``lift`` /
``lift2`` are the only escape hatches into Python and use
Arrow-batched pandas UDFs, never row-at-a-time UDFs.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --- column / literal -------------------------------------------------

col = F.col
lit = F.lit


def _c(x) -> Column:
    """Accept either a column name or a Column."""
    return F.col(x) if isinstance(x, str) else x


def bq(name: str) -> str:
    """Backtick-quoted identifier reference for selectExpr/SQL
    interpolation (doubles embedded backticks). The single shared
    quoting helper — core and operators alias this so a column name
    containing a backtick can never break or inject into an
    interpolated expression string."""
    return "`" + name.replace("`", "``") + "`"


# --- comparisons & boolean (Functions.hs: eq/lt/gt/leq/geq/and/or/not)

def eq(a, b) -> Column:
    return _c(a) == _c(b)


def lt(a, b) -> Column:
    return _c(a) < _c(b)


def gt(a, b) -> Column:
    return _c(a) > _c(b)


def leq(a, b) -> Column:
    return _c(a) <= _c(b)


def geq(a, b) -> Column:
    return _c(a) >= _c(b)


def and_(a, b) -> Column:
    return _c(a) & _c(b)


def or_(a, b) -> Column:
    return _c(a) | _c(b)


def not_(a) -> Column:
    return ~_c(a)


def if_then_else(cond, then, otherwise) -> Column:
    """Functions.hs ``ifThenElse``."""
    return F.when(_c(cond), then).otherwise(otherwise)


# --- scalar math (Functions.hs: pow/relu/toDouble/abs/min/max/div/mod)

def pow_(a, n) -> Column:
    return F.pow(_c(a), n)


def relu(a) -> Column:
    # when-guard: greatest() SKIPS nulls, so relu(null) fabricated 0
    # instead of propagating null (Maybe semantics — review r5)
    c = _c(a)
    return F.when(c.isNotNull(), F.greatest(c, F.lit(0)))


def to_double(a) -> Column:
    return _c(a).cast("double")


def min2(a, b) -> Column:
    """Binary min (Functions.hs ``min``); null if either side is
    null (least() alone SKIPS nulls — review r5)."""
    ca, cb = _c(a), _c(b)
    return F.when(ca.isNotNull() & cb.isNotNull(), F.least(ca, cb))


def max2(a, b) -> Column:
    """Binary max (Functions.hs ``max``); null if either side is
    null (greatest() alone SKIPS nulls — review r5)."""
    ca, cb = _c(a), _c(b)
    return F.when(ca.isNotNull() & cb.isNotNull(), F.greatest(ca, cb))


def int_div(a, b) -> Column:
    """Integral division flooring toward -inf (Haskell ``div``)."""
    return F.floor(_c(a) / F.nullif(_c(b), F.lit(0))).cast("long")


def mod(a, b) -> Column:
    """Floored modulo (Haskell ``mod``, Functions.hs:121): result has
    the sign of the divisor, consistent with ``int_div`` flooring.
    Spark's ``%`` is truncated remainder (sign of dividend) and
    ``F.pmod`` only matches for positive divisors, so derive it from
    the flooring division."""
    ca, cb = _c(a), _c(b)
    return ca - cb * F.floor(ca / F.nullif(cb, F.lit(0)))


def round_to(n: int, a) -> Column:
    """Statistics.hs ``roundTo``."""
    return F.round(_c(a), n)


def clip(lo, hi, a) -> Column:
    # when-guard: least/greatest SKIP nulls, so clip(10, 40, null)
    # fabricated the lower bound instead of null (review r5)
    c = _c(a)
    return F.when(
        c.isNotNull(), F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    )


# --- null handling (Maybe combinators) --------------------------------

def is_just(a) -> Column:
    return _c(a).isNotNull()


def is_nothing(a) -> Column:
    return _c(a).isNull()


def from_maybe(default, a) -> Column:
    """``fromMaybe``: replace null with a default."""
    return F.coalesce(_c(a), F.lit(default))


def when_present(f: Callable[[Column], Column], a) -> Column:
    """``whenPresent``: apply f, propagating null (Spark does this
    natively for almost all builtins)."""
    c = _c(a)
    return F.when(c.isNotNull(), f(c))


def when_both_present(f: Callable[[Column, Column], Column], a, b) -> Column:
    """Functions.hs:262 ``whenBothPresent`` — apply a binary fn only
    when both inputs are non-null (the Maybe-applicative lift2)."""
    ca, cb = _c(a), _c(b)
    return F.when(ca.isNotNull() & cb.isNotNull(), f(ca, cb))


def recode_with_condition(
    fallback, cases: list[tuple[Callable[[Column], Column], object]], a
) -> Column:
    """Functions.hs:280 ``recodeWithCondition`` — first matching
    predicate wins, else the fallback; compiles to one chained CASE
    (codegen-friendly, no UDF)."""
    c = _c(a)
    expr = None
    for cond, value in cases:
        expr = (
            F.when(cond(c), F.lit(value))
            if expr is None
            else expr.when(cond(c), F.lit(value))
        )
    # fallback follows the CASE VALUES' convention (a literal unless
    # an explicit Column) — as a _c() column ref, a plain-string
    # fallback silently bound to a column of that name (review r5)
    fb = fallback if isinstance(fallback, Column) else F.lit(fallback)
    if expr is None:
        return fb
    return expr.otherwise(fb)


# --- strings (Functions.hs: splitOn/match/matchAll) -------------------

def split_on(sep: str, a) -> Column:
    """Split on a LITERAL separator (reference splitOn semantics) —
    quoted with \\Q…\\E so regex metacharacters like '.' or '|'
    split literally, not as patterns (review r5). Use
    ``F.split(col, pattern)`` directly for regex splits."""
    quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    return F.split(_c(a), quoted)


def match(pattern: str, a) -> Column:
    """First regex match or null (``match``)."""
    m = F.regexp_extract(_c(a), pattern, 0)
    return F.when(m != "", m)


def match_all(pattern: str, a) -> Column:
    """All regex matches (``matchAll``)."""
    return F.regexp_extract_all(_c(a), F.lit(pattern), F.lit(0))


# --- argmin/argmax aggregates (beyond the reference) ------------------

def arg_min(value, *order) -> Column:
    """Value of ``value`` on the row minimizing ``order`` (struct-
    ordered, so pass a tiebreak column for determinism). One
    bounded-state aggregate — the scale-safe form of 'first row by
    time' that needs no window or sort."""
    return F.min_by(_c(value), F.struct(*[_c(o) for o in order]))


def arg_max(value, *order) -> Column:
    """Value of ``value`` on the row maximizing ``order``."""
    return F.max_by(_c(value), F.struct(*[_c(o) for o in order]))


# --- semi-structured (beyond the reference: JSON columns) -------------

def json_get(path: str, a) -> Column:
    """Extract a JSON path (``$.k`` / ``$.a.b[0]``) from a JSON
    string column, null on missing key or malformed JSON. JVM-side
    (get_json_object) — parses only the requested path, so it
    composes into the scan for metadata-bearing event/props columns
    without a full from_json schema pass."""
    return F.get_json_object(_c(a), path)


def json_parse(schema: str, a) -> Column:
    """Parse a JSON string column into a typed struct with the given
    DDL schema (``"k INT, tags ARRAY<STRING>"``). Malformed rows
    yield a null struct (PERMISSIVE). Use when several fields are
    consumed downstream — one parse instead of N path extractions."""
    return F.from_json(_c(a), schema)


# --- dates (Functions.hs: daysBetween/parseDate) ----------------------

def days_between(a, b) -> Column:
    return F.datediff(_c(b), _c(a))


def parse_date(fmt: str, a) -> Column:
    return F.to_date(_c(a), fmt)


# --- aggregations (Functions.hs agg exprs) ----------------------------

sum_ = lambda a: F.sum(_c(a))  # noqa: E731
mean = lambda a: F.avg(_c(a))  # noqa: E731
minimum = lambda a: F.min(_c(a))  # noqa: E731
maximum = lambda a: F.max(_c(a))  # noqa: E731
count = lambda a: F.count(_c(a))  # noqa: E731
n_distinct = lambda a: F.countDistinct(_c(a))  # noqa: E731
stddev = lambda a: F.stddev_samp(_c(a))  # noqa: E731
variance = lambda a: F.var_samp(_c(a))  # noqa: E731
skewness = lambda a: F.skewness(_c(a))  # noqa: E731
mode_agg = lambda a: F.mode(_c(a))  # noqa: E731
collect = lambda a: F.collect_list(_c(a))  # noqa: E731


def median(a) -> Column:
    """Exact median with linear interpolation (Statistics.hs
    ``median``); matches DuckDB ``quantile_cont(x, 0.5)``."""
    return F.percentile(_c(a), F.lit(0.5))


def percentile(p: float, a) -> Column:
    """Exact interpolated percentile; p in [0, 1]."""
    return F.percentile(_c(a), F.lit(p))


def first_or_nothing(a) -> Column:
    return F.get(_c(a), 0)


def last_or_nothing(a) -> Column:
    c = _c(a)
    return F.get(c, F.size(c) - 1)


# zScore lives on DataFrame (``DataFrame.z_score``): standardizing
# needs the global mean/stddev, which as a Column could only be an
# empty-partition window — a single-executor bottleneck at scale.
# The verb computes them as a one-row agg broadcast back instead.


# --- Python escape hatches (lift/lift2 → Arrow pandas UDFs) -----------

def lift(fn: Callable, return_type: str):
    """Lift a scalar Python fn to a vectorized column fn.

    Reference ``F.lift``. The slow path by design: prefer builtins.
    Arrow-batched, so ~10-100x faster than row-at-a-time UDFs.
    """

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return lambda a: _udf(_c(a))


def lift2(fn: Callable, return_type: str):
    """Lift a binary Python fn (reference ``F.lift2``)."""

    @pandas_udf(return_type)
    def _udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series([fn(x, y) for x, y in zip(s1, s2)])

    return lambda a, b: _udf(_c(a), _c(b))
