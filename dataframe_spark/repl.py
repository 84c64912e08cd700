"""Interactive REPL — ``python -m dataframe_spark.repl [sf_dir]``.

Reference analogue: the ``dataframe`` executable (reference
app/Main.hs; CHANGELOG 0.4.1.0 repl signal handling / startup
cache). The reference ships its own line-editor REPL because
Haskell has no standard interactive session; Python already has
one, so this wraps the stdlib ``code.interact`` with the tuned
SparkSession, every test table registered (both as ``D.DataFrame``
variables and as SQL temp views for ``spark.sql``), and the
terminal renderer from display.py as the default formatter —
``df`` at the prompt prints the boxed table, not the class repr.

Session namespace:

    spark        tuned SparkSession (AQE on, 32 shuffle partitions)
    D, F         dataframe_spark, dataframe_spark.expr
    lineitem, orders, ... — one D.DataFrame per table in sf_dir
    sql("...")   spark.sql wrapped into a D.DataFrame
"""

from __future__ import annotations

import code
import sys


def _namespace(sf_dir: str):
    import dataframe_spark as D
    from dataframe_spark import expr as F
    from dataframe_spark.tables import TABLES, load_table

    spark = D.get_spark("dataframe_spark_repl")
    spark.sparkContext.setLogLevel("ERROR")
    ns = {"spark": spark, "D": D, "F": F}
    loaded = []
    for t in TABLES:
        try:
            df = load_table(spark, sf_dir, t)
        except Exception:  # a partial/absent sf dir is fine
            continue
        df.createOrReplaceTempView(t)
        ns[t] = D.DataFrame(df)
        loaded.append(t)
    ns["sql"] = lambda q: D.DataFrame(spark.sql(q))
    return ns, loaded


def _make_displayhook():
    """Boxed-table default formatter (reference Display/Terminal):
    typing ``df`` displays rows, matching the reference repl's
    show-by-default ergonomics; everything else keeps the stock
    repr + ``_`` rebinding semantics."""
    from dataframe_spark.core import DataFrame
    from dataframe_spark.display import to_string

    def hook(value):
        if value is None:
            return
        import builtins

        builtins._ = value
        if isinstance(value, DataFrame):
            print(to_string(value))
        else:
            print(repr(value))

    return hook


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    ns, loaded = _namespace(sf_dir)
    sys.displayhook = _make_displayhook()
    banner = (
        f"dataframe_spark repl — tables from {sf_dir}\n"
        f"  loaded: {', '.join(loaded) or '(none)'}\n"
        "  spark / D / F / sql('...') are bound; a DataFrame result "
        "prints as a boxed table"
    )
    code.interact(banner=banner, local=ns, exitmsg="")


if __name__ == "__main__":
    main()
