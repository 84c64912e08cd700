"""Type inference over string columns.

Reference: /root/reference/src/DataFrame/Operations/Typing.hs
(``parseDefaults``/``parseWithTypes`` — promote Text columns to
Int/Double/Bool/Date when every non-null value parses) and
Internal/Parsing.hs.

Spark-first: candidate parses are evaluated executor-side in ONE
aggregation pass using ``try_cast`` counts; only the per-column
decision (a few integers) reaches the driver, then the chosen casts
are applied as plan expressions. Works at any table size."""

from __future__ import annotations

from pyspark.sql import functions as F

from .core import DataFrame

_CANDIDATES = ["bigint", "double", "boolean", "date"]

# Cheap shape prefilters: try_cast's failure path raises and catches
# a JVM exception PER VALUE (~6 µs measured — 150k failing rows cost
# seconds), so feed it only values that can parse. Each regex
# accepts exactly the try_cast-parseable surface (boolean mirrors
# Spark's t/true/y/yes/1 / f/false/n/no/0 set; bigint overflow of
# >19-digit strings still falls through to try_cast's own check).
# [\x00-\x20]* padding tolerance: F.trim strips only spaces while
# the cast's own trimAll removes every control char <= 0x20 — the
# guard must accept at least what try_cast accepts (review r5)
_PAD = r"[\x00-\x20]*"
_PREFILTER = {
    "bigint": rf"^{_PAD}[+-]?[0-9]+{_PAD}$",
    "boolean": rf"^{_PAD}(?i)(t|true|y|yes|1|f|false|n|no|0){_PAD}$",
}


def _try_cast_guarded(col, t: str):
    pat = _PREFILTER.get(t)
    if pat is None:
        return col.try_cast(t)
    return F.when(col.rlike(pat), col).try_cast(t)


def parse_defaults(df: DataFrame, nullish: list[str] | None = None) -> DataFrame:
    """Promote every string column to the narrowest type that parses
    all its non-null values (Int ≻ Double ≻ Bool ≻ Date ≻ Text)."""
    sdf = df.df
    if nullish:
        for c, t in sdf.dtypes:
            if t == "string":
                sdf = sdf.withColumn(
                    c, F.when(~F.col(c).isin(nullish), F.col(c))
                )
    str_cols = [c for c, t in sdf.dtypes if t == "string"]
    if not str_cols:
        return DataFrame(sdf)
    aggs = []
    for c in str_cols:
        col = F.trim(F.col(c))
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        for t in _CANDIDATES:
            aggs.append(
                F.count(_try_cast_guarded(col, t)).alias(f"__{t}_{c}")
            )
    counts = sdf.agg(*aggs).first()
    out = sdf
    for c in str_cols:
        nn = counts[f"__nn_{c}"]
        if nn == 0:
            continue
        # first candidate (in priority order) that parses every
        # non-null value wins; bigint precedes double so integral
        # columns stay integral
        for t in _CANDIDATES:
            if counts[f"__{t}_{c}"] == nn:
                out = out.withColumn(c, F.trim(F.col(c)).try_cast(t))
                break
    return DataFrame(out)


def parse_with_types(
    df: DataFrame, schema: dict[str, str], track_failures: bool = False
) -> DataFrame:
    """Explicit column→type casts (Typing.hs ``parseWithTypes``);
    unparseable values become null (try_cast semantics).

    ``track_failures=True`` is the analogue of the reference's
    ``Either``-typed parse columns: each cast column gets a
    ``__failed_<col>`` marker (non-null input, null output) that
    ``describe_columns`` surfaces as ``partially_parsed``
    (Core.hs:580). Markers are plain plan expressions — zero extra
    passes."""
    out = df.df
    for c, t in schema.items():
        parsed = F.col(c).try_cast(t)
        if track_failures:
            out = out.withColumn(
                f"__failed_{c}", F.col(c).isNotNull() & parsed.isNull()
            )
        out = out.withColumn(c, parsed)
    return DataFrame(out)
