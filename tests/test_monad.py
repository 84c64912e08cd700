"""FrameM chained-mutation builder (reference DataFrame/Monad.hs,
examples/Chipotle.hs:32 execFrameM do-block)."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.monad import FrameM


def test_framem_chipotle_flow(small):
    """Mirror of the Chipotle.hs do-block: deriveM twice, use the
    returned references in later steps, exec the final frame."""
    fm = FrameM(small)
    # deriveM "val2" (conditional rewrite of an existing column)
    val2 = fm.derive(
        "val2", F.when(F.col("id") == 1, F.col("val") + 2).otherwise(F.col("val"))
    )
    total = fm.derive("total", val2 * F.col("id"))
    fm.filter_where(total > 0)
    df = fm.frame()  # execFrameM
    assert "val2" in df.column_names and "total" in df.column_names
    rows = {r["id"]: r for r in df.sort_by(["id"]).collect()}
    assert rows[1]["val2"] == pytest.approx(rows[1]["val"] + 2)
    for i, r in rows.items():
        assert r["total"] == pytest.approx(r["val2"] * i)


def test_framem_rename_and_references(small):
    fm = FrameM(small)
    v = fm.derive("double_val", F.col("val") * 2)
    revenue = fm.rename(v, "revenue")  # renameM on a Col reference
    fm.filter_where(revenue >= 0)
    out = fm.frame()
    assert "revenue" in out.column_names
    assert "double_val" not in out.column_names
    # renameM on a compound expression falls back to deriveM
    fm2 = FrameM(small)
    c = fm2.rename(F.col("val") + 1, "val_plus")
    assert "val_plus" in fm2.frame().column_names
    assert c is not None


def test_framem_impute_filter_just(spark):
    from dataframe_spark.core import DataFrame

    df = DataFrame(
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0)], "id int, score double"
        )
    )
    fm = FrameM(df)
    score = fm.impute("score", strategy="mean")  # imputeM
    fm.filter_where(score > 15)
    vals = sorted(r["score"] for r in fm.frame().collect())
    assert vals == [20.0, 30.0]  # null imputed to mean(10,30)=20

    fm2 = FrameM(df)
    ref = fm2.filter_just("score")  # filterJustM
    assert fm2.frame().n_rows() == 2 and ref is not None


def test_framem_inspect_modify_take(small):
    fm = FrameM(small)
    ncols = fm.inspect(lambda d: d.n_columns())  # inspectM
    fm.modify(lambda d: d.exclude(["grp"]))  # modifyM
    assert fm.inspect(lambda d: d.n_columns()) == ncols - 1
    fm.take(2)  # takeM
    assert fm.frame().n_rows() == 2


def test_framem_compound_reference_rejected(small):
    fm = FrameM(small)
    with pytest.raises(ValueError):
        fm.filter_just(F.col("val") + 1)  # Monad.hs:80 error case


def test_name_of_connect_safe(small):
    """_name_of must not require the classic-only _jc handle: repr
    extraction works in both classic and Connect modes."""
    from pyspark.sql import functions as F

    from dataframe_spark.monad import _name_of

    class FakeConnectColumn:
        # no _jc attribute, repr like pyspark.sql.connect Column
        def __repr__(self):
            return "Column<'some_col'>"

    assert _name_of(FakeConnectColumn()) == "some_col"
    assert _name_of(F.col("plain")) == "plain"
    import pytest

    with pytest.raises(ValueError):
        _name_of(F.col("a") + F.col("b"))
