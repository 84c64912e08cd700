"""IO tests: CSV/TSV/JSON round-trips, schema inference, null markers
(model: reference tests/Operations/ReadCsv.hs + IO/CSV.hs options)."""

import pytest

import dataframe_spark as D


@pytest.fixture()
def tmpd(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip_and_inference(spark, tmpd):
    p = f"{tmpd}/data.csv"
    with open(p, "w") as f:
        f.write("id,score,name,when\n1,1.5,alpha,2024-01-01\n2,NA,beta,2024-02-03\n3,3.5,N/A,2024-03-05\n")
    df = D.read_csv(spark, p)
    types = dict(df.df.dtypes)
    assert types["id"] == "int"
    assert types["score"] == "double"
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["score"] is None  # NA → null
    assert rows[3]["name"] is None  # N/A marker → null
    out = f"{tmpd}/out_csv"
    D.write_csv(df, out)
    back = D.read_csv(spark, out)
    assert back.n_rows() == 3


def test_tsv(spark, tmpd):
    p = f"{tmpd}/data.tsv"
    with open(p, "w") as f:
        f.write("a\tb\n1\tx\n2\ty\n")
    df = D.read_tsv(spark, p)
    assert df.n_rows() == 2
    assert df.column_names == ["a", "b"]


def test_scan_csv_batches(spark, tmpd):
    from dataframe_spark.sources.csv import scan_csv, write_csv
    from dataframe_spark.constructors import from_named_columns

    df = from_named_columns(spark, {"x": list(range(100))})
    write_csv(df, f"{tmpd}/scan")
    batches = list(scan_csv(spark, f"{tmpd}/scan", batch_rows=30))
    assert [len(b) for b in batches[:-1]] == [30] * (len(batches) - 1)
    assert sum(len(b) for b in batches) == 100
    assert sorted(x for b in batches for x in b["x"]) == list(range(100))


def test_json_roundtrip(spark, tmpd):
    p = f"{tmpd}/data.json"
    with open(p, "w") as f:
        f.write('{"id": 1, "v": "x"}\n{"id": 2, "v": null}\n')
    df = D.read_json(spark, p)
    assert df.n_rows() == 2
    out = f"{tmpd}/out_json"
    D.write_json(df, out)
    assert D.read_json(spark, out).n_rows() == 2


def test_parquet_roundtrip_partitioned(spark, tmpd, lineitem):
    out = f"{tmpd}/li"
    D.write_parquet(lineitem.take(500), out, partition_by=["l_returnflag"])
    back = D.read_parquet(spark, out)
    assert back.n_rows() == 500
    import os

    assert any(d.startswith("l_returnflag=") for d in os.listdir(out))


def test_json_flatten_structs(spark, tmpd):
    from dataframe_spark.sources.json import flatten_structs

    p = f"{tmpd}/nested.json"
    with open(p, "w") as f:
        f.write('{"id": 1, "meta": {"lang": "en", "n": 5}}\n{"id": 2, "meta": {"lang": "de", "n": 7}}\n')
    df = D.read_json(spark, p)
    flat = flatten_structs(df)
    assert set(flat.column_names) == {"id", "meta.lang", "meta.n"}
    rows = {r["id"]: r["meta.lang"] for r in flat.collect()}
    assert rows == {1: "en", 2: "de"}


def test_orc_roundtrip(spark, tmpd):
    from dataframe_spark.sources.orc import read_orc, write_orc
    from dataframe_spark.core import DataFrame

    df = DataFrame(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    write_orc(df, tmpd + "/t.orc")
    back = read_orc(spark, tmpd + "/t.orc")
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_text_lines_roundtrip(spark, tmpd):
    from dataframe_spark.sources.orc import read_text, write_text
    from dataframe_spark.core import DataFrame

    df = DataFrame(spark.createDataFrame([("hello",), ("world",)], "value string"))
    write_text(df, tmpd + "/corpus")
    back = read_text(spark, tmpd + "/corpus")
    assert sorted(r["value"] for r in back.collect()) == ["hello", "world"]


def test_write_parquet_sorted_yields_disjoint_file_ranges(spark, tmpd):
    import glob

    import pyarrow.parquet as pq

    from dataframe_spark.core import DataFrame
    from dataframe_spark.sources.parquet import write_parquet_sorted

    rows = [(i * 37 % 10_000, f"v{i}") for i in range(10_000)]
    df = DataFrame(spark.createDataFrame(rows, "k int, v string"))
    write_parquet_sorted(df, tmpd + "/sorted", ["k"], num_files=8)

    ranges = []
    for f in glob.glob(tmpd + "/sorted/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    # files cover disjoint key ranges -> min/max stats prune scans
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_write_parquet_zordered_clusters_both_columns(spark, tmpd):
    """Z-ordered layout: EVERY z column's per-file min/max range must
    be much narrower than its global range (the multi-column data-
    skipping property a single-key sort cannot give: sorting by a
    alone leaves b's per-file ranges full-width)."""
    import glob

    import pyarrow.parquet as pq

    from dataframe_spark.core import DataFrame
    from dataframe_spark.sources.parquet import write_parquet_zordered

    # two independent uniform columns
    rows = [((i * 37) % 4096, (i * 101) % 4096) for i in range(8192)]
    df = DataFrame(spark.createDataFrame(rows, "a int, b int"))
    write_parquet_zordered(df, tmpd + "/zord", ["a", "b"], num_files=16)

    def spans(col_idx):
        out = []
        for f in glob.glob(tmpd + "/zord/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append(max(maxs) - min(mins))
        return out

    n_files = len(glob.glob(tmpd + "/zord/*.parquet"))
    assert n_files >= 8
    for ci in (0, 1):
        avg_span = sum(spans(ci)) / n_files
        assert avg_span < 4096 * 0.55, f"col {ci} not clustered: {avg_span}"
    # rows survive the reshuffle intact
    back = spark.read.parquet(tmpd + "/zord")
    assert back.count() == 8192
    assert back.selectExpr("sum(a)", "sum(b)").collect()[0][:] == (
        spark.createDataFrame(rows, "a int, b int")
        .selectExpr("sum(a)", "sum(b)")
        .collect()[0][:]
    )


def test_jdbc_roundtrip_embedded_derby(spark, tmpd):
    """read_jdbc/write_jdbc against the embedded Derby that ships
    with Spark (reference dataframe-persistent parity: frames
    to/from a SQL store). Covers plain, query, and partitioned
    reads (4 range-predicated partitions)."""
    url = f"jdbc:derby:{tmpd}/jdbcdb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    # uppercase column names: Spark CREATEs them quoted, and Derby
    # resolves unquoted identifiers in later SQL to uppercase
    src = spark.createDataFrame(
        [(i, float(i) * 1.5, f"n{i}") for i in range(20)],
        "ID int, SCORE double, NAME string",
    )
    D.write_jdbc(D.DataFrame(src), url, "people", mode="overwrite", driver=driver)

    back = D.read_jdbc(spark, url, table="people", driver=driver)
    assert back.n_rows() == 20
    assert dict(back.df.dtypes)["SCORE"] == "double"

    q = D.read_jdbc(
        spark,
        url,
        query="SELECT COUNT(*) AS N, SUM(SCORE) AS TOTAL FROM people",
        driver=driver,
    )
    row = q.collect()[0]
    assert row["N"] == 20

    part = D.read_jdbc(
        spark,
        url,
        table="people",
        partition_column="ID",
        num_partitions=4,
        driver=driver,
    )
    assert part.df.rdd.getNumPartitions() == 4
    assert part.n_rows() == 20
    got = sorted(r["ID"] for r in part.collect())
    assert got == list(range(20))


def test_jdbc_partitioned_empty_table_raises(spark, tmpd):
    """The min/max bounds probe on an empty table yields NULL bounds;
    the reader must raise a clear error instead of passing NULL to
    lowerBound/upperBound."""
    import pytest

    url = f"jdbc:derby:{tmpd}/jdbcdb2;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src = spark.createDataFrame([], "ID int, NAME string")
    D.write_jdbc(D.DataFrame(src), url, "empty_t", mode="overwrite", driver=driver)
    with pytest.raises(ValueError, match="partition bounds"):
        D.read_jdbc(
            spark, url, table="empty_t",
            partition_column="ID", num_partitions=4, driver=driver,
        )


def test_read_parquet_files_multi(spark, tmpd, lineitem):
    from dataframe_spark.sources import read_parquet_files, write_parquet

    a = lineitem.take(5)
    b = lineitem.drop_rows(5).take(7)
    write_parquet(a, f"{tmpd}/pa")
    write_parquet(b, f"{tmpd}/pb")
    got = read_parquet_files(spark, [f"{tmpd}/pa", f"{tmpd}/pb"])
    assert got.n_rows() == 12
    assert set(got.df.columns) == set(lineitem.df.columns)
