"""Bucketed-table join: co-bucketed tables join without any
exchange — the repeated-big-join strategy at scale."""

import pytest
from pyspark.sql import functions as F

import dataframe_spark as D
from dataframe_spark.plans import plan_summary


@pytest.mark.usefixtures("spark")
def test_bucketed_join_skips_shuffle(spark, lineitem, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    assert wh  # managed tables need a warehouse dir
    li = lineitem.select(["l_orderkey", "l_quantity"])
    orders = lineitem.group_by(["l_orderkey"]).aggregate(
        n_lines=F.count(F.lit(1))
    )
    D.write_parquet_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8)
    D.write_parquet_bucketed(orders, "ord_b", ["l_orderkey"], num_buckets=8)
    a = D.DataFrame(spark.table("li_b"))
    b = D.DataFrame(spark.table("ord_b"))
    joined = a.inner_join(["l_orderkey"], b)
    joined.df.count()
    s = plan_summary(joined)
    assert s["shuffles"] == 0, s
    assert joined.n_rows() == li.n_rows()
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
