"""Core verb tests (model: reference tests/Operations/{Core,Subset,
Take,Filter,Derive,Apply}.hs and test_coverage.md)."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark import expr as E


def test_select_subset(small):
    assert small.select(["id", "grp"]).column_names == ["id", "grp"]


def test_select_by_property(small):
    out = small.select_by_property(lambda c: c.startswith("g"))
    assert out.column_names == ["grp"]


def test_exclude(small):
    assert small.exclude(["grp"]).column_names == ["id", "val"]


def test_take_negative_is_noop(small):
    assert small.take(-3).n_rows() == 4


def test_take_more_than_rows(small):
    assert small.take(100).n_rows() == 4


def test_take_drop_range(small):
    s = small.sort_by(["id"])
    assert s.take(2).n_rows() == 2
    assert s.drop_rows(3).n_rows() == 1
    assert s.range_rows(1, 3).n_rows() == 2
    assert s.take_last(1, order_by="id").n_rows() == 1
    assert s.drop_last(3, order_by="id").n_rows() == 1


def test_take_last_requires_order(small):
    from dataframe_spark.errors import ColumnNotFoundError, MissingOrderError

    with pytest.raises(MissingOrderError):
        small.take_last(1)
    with pytest.raises(MissingOrderError):
        small.drop_last(1)
    with pytest.raises(ColumnNotFoundError):
        small.take_last(1, order_by="nope")


def test_take_last_deterministic(small):
    ids = sorted(r["id"] for r in small.collect())
    last2 = [r["id"] for r in small.take_last(2, order_by="id").collect()]
    assert last2 == ids[-2:]
    kept = sorted(r["id"] for r in small.drop_last(1, order_by="id").collect())
    assert kept == ids[:-1]


def test_filter_where(small):
    assert small.filter_where(F.col("val") > 15).n_rows() == 2


def test_filter_nonexistent_value_empty(small):
    out = small.filter_where(F.col("grp") == "zzz")
    assert out.n_rows() == 0
    assert out.n_columns() == 3


def test_filter_nulls(small):
    assert small.filter_just("val").n_rows() == 3
    assert small.filter_nothing("val").n_rows() == 1
    assert small.filter_all_just().n_rows() == 2


def test_distinct(small):
    assert small.select(["grp"]).distinct().n_rows() == 3


def test_derive_and_apply(small):
    out = small.derive("doubled", F.col("val") * 2)
    row = {r["id"]: r["doubled"] for r in out.collect()}
    assert row[1] == 20.0 and row[2] is None
    out2 = small.apply("val", lambda c: c + 1)
    assert {r["val"] for r in out2.collect()} == {11.0, None, 31.0, 41.0}


def test_apply_missing_column_raises(small):
    with pytest.raises(KeyError):
        small.apply("nope", lambda c: c)


def test_apply_where(small):
    out = small.apply_where(F.col("id") <= 2, "val", lambda c: c * 0)
    vals = {r["id"]: r["val"] for r in out.collect()}
    assert vals[1] == 0.0 and vals[3] == 30.0 and vals[2] is None


def test_rename_and_clone(small):
    assert "key" in small.rename("id", "key").column_names
    out = small.clone_column("id", "id2")
    assert [r["id2"] for r in out.sort_by(["id"]).collect()] == [1, 2, 3, 4]


def test_recode(small):
    out = small.recode("grp", {"a": "alpha"}, default="other")
    vals = {r["id"]: r["grp"] for r in out.collect()}
    assert vals[1] == "alpha" and vals[2] == "other"


def test_recode_unmapped_is_null(small):
    # reference recode: unmapped keys yield Nothing, not the original
    out = small.recode("grp", {"a": "alpha"})
    vals = {r["id"]: r["grp"] for r in out.collect()}
    assert vals[1] == "alpha" and vals[2] is None and vals[4] is None


def test_recode_empty_mapping(small):
    out = small.recode("grp", {}, default="x")
    assert all(r["grp"] == "x" for r in out.collect())
    out = small.recode("grp", {})
    assert all(r["grp"] is None for r in out.collect())


def test_floored_mod(spark):
    from dataframe_spark.core import DataFrame

    df = DataFrame(
        spark.createDataFrame(
            [(-7, 3), (7, -3), (7, 3), (-7, -3), (5, 0)], "a int, b int"
        )
    ).derive("m", E.mod("a", "b"))
    vals = {(r["a"], r["b"]): r["m"] for r in df.collect()}
    # Haskell mod: sign of the divisor; x `mod` 0 is an error → null here
    assert vals[(-7, 3)] == 2 and vals[(7, -3)] == -2
    assert vals[(7, 3)] == 1 and vals[(-7, -3)] == -1
    assert vals[(5, 0)] is None


def test_impute_mean(small):
    out = small.impute(["val"], "mean")
    vals = sorted(r["val"] for r in out.collect())
    assert vals == [10.0, pytest.approx(80 / 3), 30.0, 40.0]
    assert out.filter_nothing("val").n_rows() == 0


def test_sample_and_split(lineitem):
    n = lineitem.n_rows()
    s = lineitem.sample(0.1, seed=7).n_rows()
    assert 0.05 * n < s < 0.2 * n
    parts = lineitem.random_split([0.5, 0.5], seed=7)
    assert abs(parts[0].n_rows() + parts[1].n_rows() - n) == 0


def test_k_folds_disjoint_cover(lineitem):
    folds = lineitem.k_folds(3, seed=7)
    assert sum(f.n_rows() for f in folds) == lineitem.n_rows()


def test_expr_dsl(small):
    out = small.derive(
        "flag",
        E.if_then_else(E.gt(E.col("id"), E.lit(2)), E.lit("hi"), E.lit("lo")),
    )
    assert {r["flag"] for r in out.collect()} == {"hi", "lo"}
    out2 = small.filter_where(E.and_(E.is_just("grp"), E.geq("id", E.lit(3))))
    assert out2.n_rows() == 1


def test_when_both_present(small):
    out = small.derive("s", E.when_both_present(lambda a, b: a + b, "id", "val"))
    rows = {r["id"]: r["s"] for r in out.collect()}
    assert rows[1] == 11.0 and rows[3] == 33.0 and rows[4] == 44.0
    assert rows[2] is None  # val is null ⇒ result is null


def test_recode_with_condition(small):
    out = small.derive(
        "band",
        E.recode_with_condition(
            E.lit("mid"),
            [(lambda c: c < 15, "low"), (lambda c: c > 35, "high")],
            "val",
        ),
    )
    rows = {r["id"]: r["band"] for r in out.collect()}
    assert rows == {1: "low", 2: "mid", 3: "mid", 4: "high"}


def test_recode_with_condition_no_cases(small):
    out = small.derive("k", E.recode_with_condition(E.lit("x"), [], "val"))
    assert {r["k"] for r in out.collect()} == {"x"}


def test_sample_by_strata(spark):
    from dataframe_spark.core import DataFrame

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = DataFrame(spark.createDataFrame(rows, "id int, s string"))
    out = df.sample_by("s", {"a": 0.5, "b": 0.0}, seed=1).collect()
    assert 0 < len(out) < 1000
    assert all(r["s"] == "a" for r in out)


def test_sample_k_per_group_deterministic(docs):
    from dataframe_spark.core import DataFrame

    d = DataFrame(docs)
    s1 = d.sample_k_per_group("source", 3, ["doc_id"])
    s2 = d.sample_k_per_group("source", 3, ["doc_id"])
    rows1 = sorted((r["source"], r["doc_id"]) for r in s1.df.collect())
    rows2 = sorted((r["source"], r["doc_id"]) for r in s2.df.collect())
    assert rows1 == rows2  # deterministic across runs
    from collections import Counter

    per = Counter(s for s, _ in rows1)
    assert all(v == 3 for v in per.values())


def test_rename_raises_on_missing_column(small):
    import pytest as _pytest

    from dataframe_spark.errors import ColumnNotFoundError

    with _pytest.raises(ColumnNotFoundError):
        small.rename("nope", "x")
    with _pytest.raises(ColumnNotFoundError):
        small.rename_many({"id": "id2", "nope": "x"})
    out, err = small.rename_safe("nope", "x")
    assert err is not None and out.column_names == small.column_names
    out2, err2 = small.rename_safe("id", "id2")
    assert err2 is None and "id2" in out2.column_names


def test_introspection_helpers(small):
    assert not small.is_empty()
    from pyspark.sql import functions as F

    assert small.filter_where(F.col("id") > 99).is_empty()
    assert small.is_numeric("id") and small.is_numeric("val")
    assert not small.is_numeric("grp")
    assert small.has_missing("val") and small.has_missing("grp")
    assert not small.has_missing("id")


def test_select_exclude_typed_errors(small):
    import pytest as _pytest

    from dataframe_spark.errors import ColumnNotFoundError

    with _pytest.raises(ColumnNotFoundError) as e:
        small.select(["id", "vall"])
    assert "val" in str(e.value)  # did-you-mean hint
    with _pytest.raises(ColumnNotFoundError):
        small.exclude(["nope"])
    # expressions still pass through select
    from pyspark.sql import functions as F

    assert small.select([F.col("id") * 2]).n_rows() == 4


def test_sample_k_per_group_salted_identical(docs):
    """The salted two-phase top-k must return exactly the unsalted
    result (global top-k ⊆ union of cell top-ks)."""
    from dataframe_spark.core import DataFrame

    d = DataFrame(docs)
    plain = sorted(
        (r["source"], r["doc_id"])
        for r in d.sample_k_per_group("source", 4, ["doc_id"]).df.collect()
    )
    salted = sorted(
        (r["source"], r["doc_id"])
        for r in d.sample_k_per_group("source", 4, ["doc_id"], salt=8).df.collect()
    )
    assert plain == salted and len(plain) > 0


def test_groupby_sortby_valuecounts_typed_errors(small):
    import pytest as _pytest

    from dataframe_spark.errors import ColumnNotFoundError

    with _pytest.raises(ColumnNotFoundError):
        small.group_by(["id", "nope"])
    with _pytest.raises(ColumnNotFoundError):
        small.sort_by(["nope"])
    with _pytest.raises(ColumnNotFoundError):
        small.value_counts("nope")


def test_sample_k_per_group_null_keys_distinct(spark):
    """concat_ws skips NULL parts; the coalesce-to-sentinel keeps the
    md5 order key injective over distinct key tuples, so rows like
    ('a', NULL) and (NULL, 'a') don't collide and results stay
    deterministic across runs."""
    from dataframe_spark import DataFrame

    rows = [("g", "a", None), ("g", None, "a"), ("g", "b", "c"), ("g", None, None)]
    df = DataFrame(spark.createDataFrame(rows, "grp string, k1 string, k2 string"))
    key = lambda t: tuple("" if v is None else str(v) for v in t)
    out1 = sorted(map(tuple, df.sample_k_per_group("grp", 2, ["k1", "k2"]).collect()), key=key)
    out2 = sorted(map(tuple, df.sample_k_per_group("grp", 2, ["k1", "k2"]).collect()), key=key)
    assert out1 == out2 and len(out1) == 2


def test_hcat_positional(spark):
    """Merge.hs (|||): positional glue, null-fill on the shorter
    side, other's column replaces same-named column in place."""
    from dataframe_spark import DataFrame

    a = DataFrame(spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id int, tag string"))
    b = DataFrame(spark.createDataFrame(
        [(10, "p"), (20, "q")], "score int, tag string"))
    out = a.hcat(b, order_by=["id"], other_order_by=["score"])
    assert out.column_names == ["id", "tag", "score"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] == 10 and rows[1]["tag"] == "p"  # b's tag wins
    assert rows[3]["score"] is None and rows[3]["tag"] is None  # null-fill
    assert out.n_rows() == 3

    # longer right side extends the frame with nulls on the left
    out2 = b.hcat(a.select(["id"]), order_by=["score"], other_order_by=["id"])
    assert out2.n_rows() == 3
    assert [r["score"] for r in out2.sort_by(["id"]).collect()][2] is None

    from dataframe_spark.errors import ColumnNotFoundError
    with pytest.raises(ColumnNotFoundError):
        a.hcat(b, order_by=["nope"])


def test_json_get_and_parse(spark):
    from dataframe_spark.expr import json_get, json_parse

    df = spark.createDataFrame(
        [
            ('{"k": 7, "tags": ["a", "b"]}',),
            ('{"k": null}',),
            ("not json",),
            (None,),
        ],
        "props string",
    )
    rows = df.select(
        json_get("$.k", "props").cast("long").alias("k"),
        json_parse("k BIGINT, tags ARRAY<STRING>", "props").alias("s"),
    ).collect()
    assert rows[0]["k"] == 7 and list(rows[0]["s"]["tags"]) == ["a", "b"]
    assert rows[1]["k"] is None
    # malformed and null inputs degrade to nulls, never raise
    assert rows[2]["k"] is None and rows[3]["k"] is None
    assert rows[3]["s"] is None


def test_sample_weighted_deterministic_and_weight_biased(spark):
    import hashlib

    from dataframe_spark import DataFrame

    rows = [(i, 1.0 if i else 1e6) for i in range(200)]
    df = DataFrame(spark.createDataFrame(rows, "id long, w double"))
    out1 = sorted(r["id"] for r in df.sample_weighted(20, F.col("w"), ["id"]).df.collect())
    out2 = sorted(r["id"] for r in df.sample_weighted(20, F.col("w"), ["id"]).df.collect())
    assert out1 == out2  # deterministic across runs
    assert 0 in out1  # the 1e6-weight row is (near-)surely selected

    # matches the A-ES formula computed by hand
    import math

    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1) / 2**32
        return math.log(u) / w

    want = sorted(
        sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:20]
    )
    assert out1 == sorted(i for i, _ in want)


def test_sample_weighted_drops_nonpositive_weights(spark):
    from dataframe_spark import DataFrame

    df = DataFrame(
        spark.createDataFrame(
            [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
        )
    )
    got = [r["id"] for r in df.sample_weighted(10, F.col("w"), ["id"]).df.collect()]
    assert got == [4]


def test_grouping_sets_levels(lineitem):
    out = lineitem.grouping_sets(
        [["l_returnflag", "l_linestatus"], []], n=F.count(F.lit(1))
    ).df.collect()
    total = [r for r in out if r["l_returnflag"] is None and r["l_linestatus"] is None]
    detail = [r for r in out if r["l_returnflag"] is not None]
    assert len(total) == 1
    assert total[0]["n"] == sum(r["n"] for r in detail)
    # no returnflag-only subtotal level was computed
    assert not any(
        r["l_returnflag"] is not None and r["l_linestatus"] is None for r in out
    )


def test_sample_weighted_per_group_counts_and_determinism(spark):
    from dataframe_spark import DataFrame

    rows = [(i, f"g{i % 3}", float(1 + i % 7)) for i in range(90)]
    df = DataFrame(spark.createDataFrame(rows, "id long, g string, w double"))
    out1 = sorted(
        (r["g"], r["id"])
        for r in df.sample_weighted_per_group("g", 4, F.col("w"), ["id"]).df.collect()
    )
    out2 = sorted(
        (r["g"], r["id"])
        for r in df.sample_weighted_per_group("g", 4, F.col("w"), ["id"]).df.collect()
    )
    assert out1 == out2
    from collections import Counter

    per_g = Counter(g for g, _ in out1)
    assert all(n == 4 for n in per_g.values()) and len(per_g) == 3


def test_drop_last_null_order_keys(spark):
    """NULL order-key values sort first under asc but still enter the
    last-n tail when n exceeds the non-null count — the boundary join
    must be null-safe (review r5)."""
    from dataframe_spark.core import DataFrame

    df = DataFrame(
        spark.createDataFrame([(None,), (None,), (1,), (2,)], "x int")
    )
    got = [r["x"] for r in df.drop_last(3, order_by="x").collect()]
    assert got == [None]
    kept = sorted(
        (-99 if r["x"] is None else r["x"])
        for r in df.drop_last(1, order_by="x").collect()
    )
    assert kept == [-99, -99, 1]


def test_expr_combinators_propagate_null(spark):
    """relu/clip/min2/max2 must propagate null, not fabricate values
    from least/greatest's null-skipping (review r5)."""
    df = spark.createDataFrame([(None, 5), (20, None), (30, 7)], "a int, b int")
    rows = df.select(
        E.relu("a").alias("r"),
        E.clip(10, 15, "a").alias("c"),
        E.min2("a", "b").alias("mn"),
        E.max2("a", "b").alias("mx"),
    ).collect()
    assert [r["r"] for r in rows] == [None, 20, 30]
    assert [r["c"] for r in rows] == [None, 15, 15]
    assert [r["mn"] for r in rows] == [None, None, 7]
    assert [r["mx"] for r in rows] == [None, None, 30]


def test_drop_last_tied_boundary_value(spark):
    """A heavily tied boundary value (one dominant order-key value in
    the tail) must trim exactly n rows via the salted bucket quotas,
    not a single value-partitioned window task (ADVICE r5)."""
    from dataframe_spark.core import DataFrame

    rows = [(1, i) for i in range(10)] + [(5, i) for i in range(990)]
    df = DataFrame(spark.createDataFrame(rows, "x int, payload int"))
    out = df.drop_last(7, order_by="x").collect()
    assert len(out) == 993
    # all drops must come from the tied boundary value x=5
    assert sum(1 for r in out if r["x"] == 1) == 10
    assert sum(1 for r in out if r["x"] == 5) == 983
    # drop count spanning the boundary value entirely: 990 fives and
    # 5 of the ones go
    out2 = df.drop_last(995, order_by="x").collect()
    assert len(out2) == 5 and all(r["x"] == 1 for r in out2)


def test_drop_last_multi_column_order(spark):
    from dataframe_spark.core import DataFrame

    df = DataFrame(
        spark.createDataFrame(
            [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)], "x int, y int"
        )
    )
    kept = [(r["x"], r["y"]) for r in df.drop_last(2, order_by=["x", "y"]).collect()]
    assert kept == [(1, 1), (1, 2), (2, 1)]


def test_validate_rules_and_uniqueness(spark):
    from pyspark.sql import functions as F

    from dataframe_spark.operators import validate as V

    rows = [
        (1, "a@x.com", 5.0, "ok"),
        (2, None, 50.0, "ok"),        # null email
        (3, "bad-email", -1.0, "ok"),  # bad fmt, out of range
        (3, "c@x.com", 5.0, "bad"),   # dup id, bad status
        (None, "d@x.com", None, "ok"),  # null id, null val
    ]
    df = spark.createDataFrame(rows, "id long, email string, v double, s string")
    out = {r["rule"]: r for r in V.validate(
        df,
        row_rules={
            "email_format": V.not_matching("email", "^[a-z]+@[a-z.]+$"),
            "v_range": V.not_in_range("v", 0, 10),
            "status_ok": V.not_in_set("s", ["ok"]),
            "id_present": V.is_null("id"),
        },
        unique_keys={"id_unique": ["id"]},
    ).collect()}
    assert out["email_format"]["n_violations"] == 2  # null + bad-email
    assert out["v_range"]["n_violations"] == 3       # 50, -1, null
    assert out["status_ok"]["n_violations"] == 1
    assert out["id_present"]["n_violations"] == 1
    # 5 rows, 3 distinct non-null ids -> 2 violations (dup + null key)
    assert out["id_unique"]["n_violations"] == 2
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["status_ok"]["frac_violations"] == 0.2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        V.validate(df)
    with _pytest.raises(ValueError):
        V.validate(df, row_rules={"x": V.is_null("id")}, unique_keys={"x": ["id"]})
