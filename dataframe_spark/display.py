"""Terminal display helpers.

Reference: /root/reference/src/DataFrame/Display/Terminal/
{PrettyPrint,Plot}.hs — boxed table rendering with a type row, and
ASCII histograms. Rendering collects only the displayed slice
(``take n`` → limit pushdown), never the table."""

from __future__ import annotations

from .core import DataFrame, is_numeric_dtype


def to_string(df: DataFrame, n: int = 10) -> str:
    """Reference-style boxed table with a type header row."""
    rows = df.take(n).collect()
    cols = df.column_names
    types = dict(df.df.dtypes)

    def cell(v) -> str:
        # newlines would break the box alignment (to_markdown guards
        # the same way — review r5)
        if v is None:
            return ""
        return str(v).replace("\r\n", "␤").replace("\n", "␤").replace("\r", "␤")

    cells = [[cell(c) for c in cols], [types[c] for c in cols]] + [
        [cell(r[c]) for c in cols] for r in rows
    ]
    widths = [max(len(row[i]) for row in cells) for i in range(len(cols))]

    def line(row, pad=" "):
        return " | ".join(v.ljust(w, pad) for v, w in zip(row, widths))

    sep = "-+-".join("-" * w for w in widths)
    out = [line(cells[0]), sep, line(cells[1]), sep]
    out += [line(r) for r in cells[2:]]
    return "\n".join(out)


def to_markdown(df: DataFrame, n: int = 10) -> str:
    """GitHub-style markdown table (reference ``toMarkdownTable``,
    src/DataFrame/Internal/DataFrame.hs:91 / Display/Terminal/
    PrettyPrint.hs:50 ``showTable properMarkdown=True``): header
    cells are ``name<br>type``, one ``---`` separator row, padded
    pipe-delimited value rows. Collects only the displayed slice."""
    rows = df.take(n).collect()
    cols = df.column_names
    types = dict(df.df.dtypes)

    def cell(v) -> str:
        # pipes break the table structure, newlines break the row;
        # escape/replace so arbitrary document text renders intact
        if v is None:
            return ""
        return (
            str(v).replace("|", "\\|").replace("\r\n", "<br>")
            .replace("\n", "<br>").replace("\r", "<br>")
        )

    header = [cell(f"{c}<br>{types[c]}") for c in cols]
    body = [[cell(r[c]) for c in cols] for r in rows]
    widths = [
        max(len(header[i]), *(len(b[i]) for b in body)) if body else len(header[i])
        for i in range(len(cols))
    ]

    def line(cells):
        return "| " + " | ".join(v.ljust(w) for v, w in zip(cells, widths)) + " |"

    sep = "| " + "-|-".join("-" * w for w in widths) + " |"
    return "\n".join([line(header), sep, *[line(b) for b in body]])


def plot_histogram(df: DataFrame, column: str, bins: int = 10, width: int = 50) -> str:
    """ASCII histogram (Display/Terminal/Plot.hs:56 plotHistogram
    analogue; default bins differ — the reference uses 30)."""
    buckets = df.histogram(column, bins).collect()
    if not buckets:
        return "(empty)"
    peak = max(r["count"] for r in buckets)
    lines = []
    for r in buckets:
        bar = "#" * max(1, round(r["count"] / peak * width))
        lines.append(f"{r['bucket']:>3} | {bar} {r['count']}")
    return "\n".join(lines)


# Every plot below reduces IN SPARK (bucket counts, grid densities,
# quantiles, correlations — all bounded by the plot's pixel count or
# the column count) and collects only that aggregate to render; the
# raw table never reaches the driver, so plotting a 100 TB frame
# ships the same few KB as plotting 100 rows.

_SHADE = " .:-=+*#%@"


def _shade(frac: float) -> str:
    frac = 0.0 if frac != frac else min(max(frac, 0.0), 1.0)
    return _SHADE[min(int(frac * (len(_SHADE) - 1) + 0.5), len(_SHADE) - 1)]


def plot_bars(
    df: DataFrame, column: str, width: int = 50, max_bars: int = 20
) -> str:
    """Horizontal bar chart of a categorical column's value counts
    (Display/Terminal/Plot.hs:184 plotBars)."""
    from pyspark.sql import functions as F

    rows = (
        df.value_counts(column)
        .df.orderBy(F.desc("count"), column)
        .limit(max_bars)
        .collect()
    )
    if not rows:
        return "(empty)"
    peak = max(r["count"] for r in rows)
    label_w = max(len(str(r[column])) for r in rows)
    return "\n".join(
        f"{str(r[column]):>{label_w}} | "
        f"{'#' * max(1, round(r['count'] / peak * width))} {r['count']}"
        for r in rows
    )


def plot_scatter(
    df: DataFrame, x: str, y: str, width: int = 60, height: int = 20
) -> str:
    """Density scatter of y vs x (Display/Terminal/Plot.hs:66
    plotScatter): the plane is binned to width x height cells in one
    groupBy, each cell shaded by its point count."""
    from pyspark.sql import functions as F

    sdf = df.df.where(
        F.col(x).isNotNull()
        & F.col(y).isNotNull()
        & ~F.isnan(F.col(x).cast("double"))
        & ~F.isnan(F.col(y).cast("double"))
    )
    ext = sdf.agg(
        F.min(F.col(x).cast("double")).alias("x0"),
        F.max(F.col(x).cast("double")).alias("x1"),
        F.min(F.col(y).cast("double")).alias("y0"),
        F.max(F.col(y).cast("double")).alias("y1"),
    ).first()
    if ext["x0"] is None:
        return "(empty)"
    x0, x1, y0, y1 = ext["x0"], ext["x1"], ext["y0"], ext["y1"]
    xs = (x1 - x0) or 1.0
    ys = (y1 - y0) or 1.0
    cells = (
        sdf.groupBy(
            F.least(
                F.floor((F.col(x).cast("double") - x0) / xs * width),
                F.lit(width - 1),
            ).alias("xi"),
            F.least(
                F.floor((F.col(y).cast("double") - y0) / ys * height),
                F.lit(height - 1),
            ).alias("yi"),
        )
        .count()
        .collect()
    )
    grid = {(r["xi"], r["yi"]): r["count"] for r in cells}
    peak = max(grid.values())
    lines = [f"{y}"]
    for yi in range(height - 1, -1, -1):
        row = "".join(
            _shade(grid.get((xi, yi), 0) / peak) for xi in range(width)
        )
        lines.append(f"{y1 if yi == height - 1 else y0 if yi == 0 else '':>10.6} |{row}|")
    lines.append(" " * 11 + f"{x0:<10.6}{' ' * max(0, width - 20)}{x1:>10.6}")
    lines.append(" " * 11 + f"{x:^{width}}")
    return "\n".join(lines)


def plot_lines(
    df: DataFrame, x: str, cols: list[str], width: int = 60, height: int = 15
) -> str:
    """Multi-series line chart (Display/Terminal/Plot.hs:94
    plotLines): x is bucketed to ``width`` bins, each series plots
    its per-bin average with its own glyph."""
    from pyspark.sql import functions as F

    glyphs = "*o+x#@%&"
    sdf = df.df.where(
        F.col(x).isNotNull() & ~F.isnan(F.col(x).cast("double"))
    )
    ext = sdf.agg(
        F.min(F.col(x).cast("double")).alias("x0"),
        F.max(F.col(x).cast("double")).alias("x1"),
    ).first()
    if ext["x0"] is None:
        return "(empty)"
    x0, x1 = ext["x0"], ext["x1"]
    xs = (x1 - x0) or 1.0
    def clean(c):
        # Spark avg skips nulls but propagates NaN; drop both so a
        # single NaN can't poison a bin (or the axis min/max below)
        cc = F.col(c).cast("double")
        return F.avg(F.when(~F.isnan(cc), cc)).alias(c)

    binned = (
        sdf.groupBy(
            F.least(
                F.floor((F.col(x).cast("double") - x0) / xs * width),
                F.lit(width - 1),
            ).alias("xi")
        )
        .agg(*[clean(c) for c in cols])
        .collect()
    )
    vals = {r["xi"]: r for r in binned}
    flat = [
        r[c] for r in binned for c in cols
        if r[c] is not None and r[c] == r[c]
    ]
    if not flat:
        return "(empty)"
    v0, v1 = min(flat), max(flat)
    vs = (v1 - v0) or 1.0
    grid = [[" "] * width for _ in range(height)]
    for si, c in enumerate(cols):
        g = glyphs[si % len(glyphs)]
        for xi in range(width):
            r = vals.get(xi)
            if r is None or r[c] is None:
                continue
            yi = min(int((r[c] - v0) / vs * (height - 1) + 0.5), height - 1)
            grid[height - 1 - yi][xi] = g
    lines = [
        f"{v1:>10.6} |{''.join(grid[0])}|",
        *[f"{'':>10} |{''.join(row)}|" for row in grid[1:-1]],
        f"{v0:>10.6} |{''.join(grid[-1])}|",
        " " * 11 + f"{x0:<10.6}{' ' * max(0, width - 20)}{x1:>10.6}",
        " " * 11
        + "  ".join(
            f"{glyphs[i % len(glyphs)]}={c}" for i, c in enumerate(cols)
        ),
    ]
    return "\n".join(lines)


def plot_box_plots(df: DataFrame, cols: list[str], width: int = 60) -> str:
    """Side-by-side box plots (Display/Terminal/Plot.hs:106
    plotBoxPlots). Five-number summaries come from ONE agg pass of
    percentile_approx — approximate on purpose: a terminal box is
    accurate to a character cell, far coarser than the sketch."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        cc = F.col(c).cast("double")
        # NaN's unordered comparisons corrupt the quantile sketch;
        # map it to null, which percentile_approx skips
        aggs.append(
            F.percentile_approx(
                F.when(~F.isnan(cc), cc), [0.0, 0.25, 0.5, 0.75, 1.0], 10000
            ).alias(c)
        )
    row = df.df.agg(*aggs).first()
    fives = {c: row[c] for c in cols if row[c] is not None}
    if not fives:
        return "(empty)"
    lo = min(v[0] for v in fives.values())
    hi = max(v[4] for v in fives.values())
    span = (hi - lo) or 1.0
    label_w = max(len(c) for c in fives)

    def pos(v):
        return min(int((v - lo) / span * (width - 1)), width - 1)

    lines = []
    for c, (mn, q1, med, q3, mx) in fives.items():
        cells = [" "] * width
        for i in range(pos(mn), pos(q1)):
            cells[i] = "-"
        for i in range(pos(q1), pos(q3) + 1):
            cells[i] = "="
        for i in range(pos(q3) + 1, pos(mx) + 1):
            cells[i] = "-"
        cells[pos(mn)] = "|"
        cells[pos(mx)] = "|"
        cells[pos(med)] = "#"
        lines.append(f"{c:>{label_w}} {''.join(cells)}")
    lines.append(f"{'':>{label_w}} {lo:<12.6}{'':^{max(0, width - 24)}}{hi:>12.6}")
    return "\n".join(lines)


def plot_stacked_bars(
    df: DataFrame, category: str, value_cols: list[str], width: int = 50
) -> str:
    """Stacked horizontal bars: per category, each value column's
    summed share rendered with its own glyph (Display/Terminal/
    Plot.hs:117 plotStackedBars)."""
    from pyspark.sql import functions as F

    glyphs = "#=+:*o%&"

    def _sum(c):
        cc = F.col(c).cast("double")
        return F.sum(F.when(~F.isnan(cc), cc)).alias(c)

    rows = (
        df.df.groupBy(category)
        .agg(*[_sum(c) for c in value_cols])
        .orderBy(category)
        .collect()
    )
    if not rows:
        return "(empty)"
    totals = [sum((r[c] or 0.0) for c in value_cols) for r in rows]
    # clamp at zero: negative sums would yield a negative (or, with
    # an all-negative peak, absurdly wide) bar; the numeric total
    # still shows the true signed value (review r5)
    peak = max([*totals, 0.0]) or 1.0
    label_w = max(len(str(r[category])) for r in rows)
    lines = []
    for r, tot in zip(rows, totals):
        bar = ""
        for i, c in enumerate(value_cols):
            seg = max(0, round(max(r[c] or 0.0, 0.0) / peak * width))
            bar += glyphs[i % len(glyphs)] * seg
        lines.append(f"{str(r[category]):>{label_w}} |{bar} {tot:.4g}")
    lines.append(
        f"{'':>{label_w}}  "
        + "  ".join(
            f"{glyphs[i % len(glyphs)]}={c}" for i, c in enumerate(value_cols)
        )
    )
    return "\n".join(lines)


def plot_correlation_matrix(df: DataFrame, cols: list[str] | None = None) -> str:
    """Pearson correlation heat grid over the numeric columns
    (Display/Terminal/Plot.hs:155 plotCorrelationMatrix): all
    k(k-1)/2 correlations in ONE agg pass."""
    if cols is None:
        cols = [c for c, t in df.df.dtypes if is_numeric_dtype(t)]
    if not cols:
        return "(empty)"
    # reuse core's corr_matrix (same one-pass agg, with its name
    # escaping and zero-variance handling) instead of a second copy
    # of the construction that could drift (review r5)
    pair_r = {}
    if len(cols) > 1:
        for r in df.corr_matrix(cols).collect():
            pair_r[(r["col_a"], r["col_b"])] = r["r"]

    def corr(i, j):
        if i == j:
            return 1.0
        a, b = cols[min(i, j)], cols[max(i, j)]
        v = pair_r.get((a, b))
        return v if v is not None else float("nan")

    label_w = max(len(c) for c in cols)
    hdr = " " * (label_w + 1) + " ".join(f"{c[:6]:>6}" for c in cols)
    lines = [hdr]
    for i, a in enumerate(cols):
        cells = []
        for j in range(len(cols)):
            v = corr(i, j)
            s = "   nan" if v != v else f"{v:>6.2f}"
            cells.append(s)
        lines.append(f"{a:>{label_w}} " + " ".join(cells))
    return "\n".join(lines)


def plot_all_histograms(
    df: DataFrame, bins: int = 10, width: int = 40
) -> str:
    """One histogram per numeric column (Display/Terminal/Plot.hs:148
    plotAllHistograms). All columns' min/max extents come from ONE
    shared agg pass (k+1 jobs total, not the 2k of calling
    plot_histogram per column — review r5); a plot is an action, so
    the collected extents feeding literal bucket bounds is fine."""
    from pyspark.sql import functions as F

    cols = [c for c, t in df.df.dtypes if is_numeric_dtype(t)]
    if not cols:
        return "(empty)"
    # NaN-filtered extents, matching histogram()'s src filter: NaN
    # sorts greatest in Spark, so a bare F.max would return NaN and
    # collapse every bucket to floor(NaN)=0 (ADVICE r5).
    def _clean(c):
        v = F.col(c).cast("double")
        return F.when(~F.isnan(v), v)

    ext = df.df.agg(
        *[
            x
            for c in cols
            for x in (
                F.min(_clean(c)).alias(f"__lo_{c}"),
                F.max(_clean(c)).alias(f"__hi_{c}"),
            )
        ]
    ).first()
    parts = []
    for c in cols:
        parts.append(f"== {c} ==")
        lo, hi = ext[f"__lo_{c}"], ext[f"__hi_{c}"]
        if lo is None:
            parts.append("(empty)")
            continue
        v = F.col(c).cast("double")
        width_val = (hi - lo) / bins
        if width_val == 0:
            bucket = F.lit(0)
        else:
            bucket = F.least(
                F.floor((v - F.lit(lo)) / F.lit(width_val)),
                F.lit(bins - 1),
            ).cast("int")
        buckets = (
            df.df.where(v.isNotNull() & ~F.isnan(v))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy("bucket")
            .collect()
        )
        if not buckets:
            parts.append("(empty)")
            continue
        peak = max(r["count"] for r in buckets)
        for r in buckets:
            bar = "#" * max(1, round(r["count"] / peak * width))
            parts.append(f"{r['bucket']:>3} | {bar} {r['count']}")
    return "\n".join(parts)
