"""Terminal display helpers.

Reference: /root/reference/src/DataFrame/Display/Terminal/
{PrettyPrint,Plot}.hs — boxed table rendering with a type row, and
ASCII histograms. Rendering collects only the displayed slice
(``take n`` → limit pushdown), never the table."""

from __future__ import annotations

from .core import DataFrame


def to_string(df: DataFrame, n: int = 10) -> str:
    """Reference-style boxed table with a type header row."""
    rows = df.take(n).collect()
    cols = df.column_names
    types = dict(df.df.dtypes)
    cells = [[str(c) for c in cols], [types[c] for c in cols]] + [
        ["" if r[c] is None else str(r[c]) for c in cols] for r in rows
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
    """ASCII histogram (Display/Terminal/Plot.hs analogue)."""
    buckets = df.histogram(column, bins).collect()
    if not buckets:
        return "(empty)"
    peak = max(r["count"] for r in buckets)
    lines = []
    for r in buckets:
        bar = "#" * max(1, round(r["count"] / peak * width))
        lines.append(f"{r['bucket']:>3} | {bar} {r['count']}")
    return "\n".join(lines)
