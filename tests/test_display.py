from dataframe_spark.display import plot_histogram, to_markdown, to_string
from dataframe_spark.errors import ColumnNotFoundError


def test_to_markdown(small):
    """Reference toMarkdownTable shape: name<br>type header, one
    --- separator row, pipe-delimited padded value rows."""
    s = to_markdown(small.sort_by(["id"]), n=2)
    lines = s.splitlines()
    assert len(lines) == 4  # header, separator, 2 rows
    assert lines[0].startswith("| ") and lines[0].endswith(" |")
    assert "id<br>int" in lines[0].replace(" ", "")
    assert set(lines[1]) <= {"|", "-", " "}
    # every row has the same pipe structure
    assert {ln.count("|") for ln in lines} == {lines[0].count("|")}


def test_to_string_boxed(small):
    s = to_string(small.sort_by(["id"]), n=2)
    lines = s.splitlines()
    assert "id" in lines[0] and "grp" in lines[0]
    assert "int" in lines[2] and "double" in lines[2]
    assert len(lines) == 6  # header, sep, types, sep, 2 rows


def test_plot_histogram(lineitem):
    s = plot_histogram(lineitem, "l_quantity", bins=5)
    assert s.count("\n") == 4
    assert "#" in s


def test_column_not_found_hint(small):
    try:
        small.apply("grpp", lambda c: c)
        raise AssertionError("no error")
    except ColumnNotFoundError as e:
        assert "grp" in str(e)  # did-you-mean hint


def test_pipe_and_fold(small):
    from pyspark.sql import functions as F

    out = small.pipe(lambda d: d.filter_where(F.col("id") > 1))
    assert out.n_rows() == 3
    out2 = small.fold(
        lambda col, d: d.derive(f"{col}_copy", F.col(col)), ["id", "val"]
    )
    assert "id_copy" in out2.column_names and "val_copy" in out2.column_names


def test_to_markdown_escapes_pipes_and_newlines(spark):
    from dataframe_spark import DataFrame
    from dataframe_spark.display import to_markdown

    df = DataFrame(
        spark.createDataFrame([("a|b", "l1\nl2")], "p string, m string")
    )
    md = to_markdown(df)
    lines = md.splitlines()
    # one header + one separator + exactly one body row: the newline
    # did not split the row, and every row has the same cell count
    assert len(lines) == 3
    assert "a\\|b" in lines[2] and "l1<br>l2" in lines[2]
    counts = {line.count("|") - line.count("\\|") for line in lines}
    assert len(counts) == 1
