"""REPL namespace tests (dataframe_spark/repl.py — reference
app/Main.hs analogue). The interactive loop itself is stdlib
code.interact; what's ours — and what these pin — is the session
namespace (every table bound AND registered as a SQL view, sql()
wrapper) and the displayhook contract (a DataFrame renders as the
boxed table, everything else as repr, `_` rebinding preserved)."""

import sys

from dataframe_spark.repl import _namespace


def test_namespace_tables_and_sql(spark, sf_dir):
    ns, loaded = _namespace(sf_dir)
    assert {"spark", "D", "F", "sql"} <= set(ns)
    assert "lineitem" in loaded and "embeddings" in loaded
    from dataframe_spark.core import DataFrame

    assert isinstance(ns["lineitem"], DataFrame)
    out = ns["sql"]("select count(*) as n from lineitem").collect()
    assert out[0]["n"] > 0


def test_namespace_tolerates_partial_dir(spark, tmp_path):
    ns, loaded = _namespace(str(tmp_path))  # no tables present
    assert loaded == [] and "sql" in ns


def test_displayhook_renders_dataframe(spark, small, capsys):
    import builtins

    from dataframe_spark.core import DataFrame
    from dataframe_spark.repl import _make_displayhook

    hook = _make_displayhook()
    hook(small.take(2))
    rendered = capsys.readouterr().out
    assert "val" in rendered and "---" in rendered  # boxed table
    assert isinstance(builtins._, DataFrame)
    hook(42)
    assert capsys.readouterr().out.strip() == "42"
