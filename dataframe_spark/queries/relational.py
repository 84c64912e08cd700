"""Core relational queries (reference Operations/{Core,Subset,
Transformations,Aggregation,Join,Merge}.hs surface) with DuckDB
oracles. TPC-H-shaped composites exercise multi-operator plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import DataFrame
from ..expr import if_then_else
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


# --- flagship: TPC-H Q1 pricing summary (groupBy+agg over filter) ----

def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter_where(F.col("l_shipdate") <= "2000-09-02")
        .derive("disc_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .derive("charge", F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
        .group_by(["l_returnflag", "l_linestatus"])
        .aggregate(
            sum_qty=F.round(F.sum("l_quantity"), 2),
            sum_base_price=F.round(F.sum("l_extendedprice"), 2),
            sum_disc_price=F.round(F.sum("disc_price"), 2),
            sum_charge=F.round(F.sum("charge"), 2),
            avg_qty=F.round(F.avg("l_quantity"), 4),
            avg_price=F.round(F.avg("l_extendedprice"), 4),
            avg_disc=F.round(F.avg("l_discount"), 4),
            count_order=F.count(F.lit(1)),
        )
        .df
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  ROUND(AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- select / exclude / filter / derive / distinct -------------------

def q_select(spark, sf_dir):
    return (
        _t(spark, sf_dir, "nation").select(["n_nationkey", "n_name"]).df
    )


def q_exclude(spark, sf_dir):
    return _t(spark, sf_dir, "nation").exclude(["n_regionkey"]).df


def q_filter(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter_where(
            (F.col("c_acctbal") > 5000) & (F.col("c_mktsegment") == "BUILDING")
        )
        .derive("c_acctbal", F.round(F.col("c_acctbal"), 2))
        .select(["c_custkey", "c_name", "c_acctbal"])
        .df
    )


def q_derive(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.derive(
            "price_tier",
            if_then_else(
                F.col("p_retailprice") >= 1500,
                F.lit("premium"),
                if_then_else(
                    F.col("p_retailprice") >= 1000, F.lit("mid"), F.lit("budget")
                ),
            ),
        )
        .derive("margin", F.round(F.col("p_retailprice") * 0.1, 4))
        .select(["p_partkey", "price_tier", "margin"])
        .df
    )


def q_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(["l_returnflag", "l_linestatus"])
        .distinct()
        .df
    )


def q_take_sorted(spark, sf_dir):
    """take/limit after a total order (unique tie-break key ⇒
    deterministic row set)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.sort_by(["o_totalprice", "o_orderkey"], ["desc", "asc"])
        .take(100)
        .derive("o_totalprice", F.round(F.col("o_totalprice"), 2))
        .select(["o_orderkey", "o_totalprice"])
        .df
    )


def q_group_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.group_by(["o_orderpriority"])
        .aggregate(
            n=F.count(F.lit(1)),
            total=F.round(F.sum("o_totalprice"), 2),
            avg_price=F.round(F.avg("o_totalprice"), 4),
            first_date=F.min(F.col("o_orderdate").cast("date")),
            last_date=F.max(F.col("o_orderdate").cast("date")),
        )
        .df
    )


def q_recode(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    return (
        r.recode(
            "r_name",
            {"AFRICA": "AF", "AMERICA": "AM", "ASIA": "AS"},
            default="OTHER",
        )
        .select(["r_regionkey", "r_name"])
        .df
    )


def q_apply_where(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.apply_where(F.col("o_orderstatus") == "F", "o_orderpriority", F.lower)
        .group_by(["o_orderpriority"])
        .aggregate(n=F.count(F.lit(1)))
        .df
    )


def q_impute(spark, sf_dir):
    """Null-seed a column then mean-impute; single-row checksum."""
    li = _t(spark, sf_dir, "lineitem")
    nulled = li.derive(
        "qn",
        F.when(F.col("l_quantity") > 40, None).otherwise(F.col("l_quantity")),
    )
    return (
        nulled.impute(["qn"], "mean")
        .aggregate(checksum=F.round(F.sum("qn"), 2), n_null=F.count(F.lit(1)) - F.count("qn"))
        .df
    )


# --- joins ------------------------------------------------------------

def q_join_inner(spark, sf_dir):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, broadcast the
    dim side, top-10 revenue with unique tie-break."""
    c = _t(spark, sf_dir, "customer").filter_where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter_where(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter_where(F.col("l_shipdate") > "1998-03-15")
    return (
        o.inner_join(
            ["o_custkey"],
            c.rename("c_custkey", "o_custkey"),
            broadcast=True,
        )
        .inner_join(["o_orderkey"], li.rename("l_orderkey", "o_orderkey"))
        .derive("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .group_by(["o_orderkey", "o_orderpriority"])
        .aggregate(revenue=F.round(F.sum("rev"), 2))
        .sort_by(["revenue", "o_orderkey"], ["desc", "asc"])
        .take(10)
        .df
    )


def q_join_left(spark, sf_dir):
    """Customers with zero orders per nation (left join + null count)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").group_by(["o_custkey"]).aggregate(
        n_orders=F.count(F.lit(1))
    )
    return (
        c.left_join(["c_custkey"], o.rename("o_custkey", "c_custkey"))
        .derive("has_orders", F.col("n_orders").isNotNull())
        .group_by(["c_nationkey", "has_orders"])
        .aggregate(n=F.count(F.lit(1)))
        .df
    )


def q_join_full(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier").group_by(["s_nationkey"]).aggregate(
        n_supp=F.count(F.lit(1))
    ).rename("s_nationkey", "nationkey")
    c = _t(spark, sf_dir, "customer").group_by(["c_nationkey"]).aggregate(
        n_cust=F.count(F.lit(1))
    ).rename("c_nationkey", "nationkey")
    return s.full_outer_join(["nationkey"], c).df


def q_bloom_semi(spark, sf_dir):
    """Bloom-prefiltered semi join (plans/hints.py bloom_semi_join):
    lineitem rows whose order is urgent-and-finished, screened by a
    broadcast Bloom over the selective build keys BEFORE the exact
    semi join — result exactly equal to the ANSI semi join (no false
    negatives; the exact join removes false positives), which is
    precisely what the oracle runs."""
    from ..plans.hints import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem").df
    o = (
        _t(spark, sf_dir, "orders")
        .df.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey")
    )
    kept = bloom_semi_join(li, o, ["l_orderkey"], ["o_orderkey"])
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("double")).cast("long").alias(
            "sum_qty"
        ),
    )


def q_skew_join(spark, sf_dir):
    """Salted join over a zipf-shaped key (plans/hints.py
    salted_join): 20% of lineitem rows collapse onto ONE hot key
    (md5-uniform < 0.2 — deterministic, engine-portable), the rest
    spread over 500 keys; the dim side is a 500-row aggregate of
    part. Both sides carry merge hints so the join exercises the
    skewed sort-merge path a broadcast would otherwise hide, and the
    salt splits the hot key across 16 tasks. The hot partition sits
    BELOW AQE's skew-split byte threshold at bench scale — exactly
    the regime where explicit salting is the only mitigation.
    Measured at 10x sf0.1: unsalted 11.7 s vs salted 7.3 s (1.60x).
    Result is key-exact: oracle runs the plain (unsalted) join."""
    from ..operators.text import row_uniform
    from ..plans.hints import salted_join

    li = _t(spark, sf_dir, "lineitem").df
    sk = (
        F.when(row_uniform(["l_orderkey", "l_linenumber"]) < 0.2, F.lit(0))
        .otherwise(F.pmod(F.col("l_partkey"), F.lit(500)))
        .cast("bigint")
    )
    left = li.select(
        sk.alias("sk"), "l_returnflag", F.col("l_extendedprice").alias("val")
    )
    dim = (
        _t(spark, sf_dir, "part")
        .df.groupBy(
            F.pmod(F.col("p_partkey"), F.lit(500)).cast("bigint").alias("sk")
        )
        .agg(F.avg("p_retailprice").alias("dim_price"))
    )
    j = salted_join(left.hint("merge"), dim.hint("merge"), ["sk"])
    return j.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("val") * F.col("dim_price")) / 1e9, 2).alias("w")
    )


def q_join_semi_anti(spark, sf_dir):
    """Per nation: customers with orders (semi join) vs without
    (anti join). Both joins ship only the key column of orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").rename("o_custkey", "c_custkey")
    with_o = (
        c.semi_join(["c_custkey"], o)
        .group_by(["c_nationkey"])
        .aggregate(n_with=F.count(F.lit(1)))
    )
    without = (
        c.anti_join(["c_custkey"], o)
        .group_by(["c_nationkey"])
        .aggregate(n_without=F.count(F.lit(1)))
    )
    return (
        with_o.full_outer_join(["c_nationkey"], without)
        .derive("n_with", F.coalesce(F.col("n_with"), F.lit(0)))
        .derive("n_without", F.coalesce(F.col("n_without"), F.lit(0)))
        .df
    )


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with two broadcast dims; revenue
    per nation for ASIA, 1996."""
    r = _t(spark, sf_dir, "region").filter_where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter_where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    nr = n.inner_join(["n_regionkey"], r.rename("r_regionkey", "n_regionkey"), broadcast=True)
    return (
        li.rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o)
        .inner_join(
            ["o_custkey"],
            c.rename("c_custkey", "o_custkey"),
        )
        .rename("l_suppkey", "s_suppkey")
        .inner_join(["s_suppkey"], s, broadcast=True)
        .filter_where(F.col("c_nationkey") == F.col("s_nationkey"))
        .rename("s_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], nr, broadcast=True)
        .derive("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .group_by(["n_name"])
        .aggregate(revenue=F.round(F.sum("rev"), 2))
        .df
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: scan-heavy filter+agg; predicates push to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter_where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .aggregate(revenue=F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2))
        .df
    )


def q_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(["c_nationkey"]).derive(
        "kind", F.lit("customer")
    ).rename("c_nationkey", "nationkey")
    s = _t(spark, sf_dir, "supplier").select(["s_nationkey"]).derive(
        "kind", F.lit("supplier")
    ).rename("s_nationkey", "nationkey")
    return (
        c.concat(s)
        .group_by(["nationkey", "kind"])
        .aggregate(n=F.count(F.lit(1)))
        .df
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS expressed as a semi join (the right
    side ships only its join key; no row widening, no dedup
    needed)."""
    o = _t(spark, sf_dir, "orders").filter_where(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    # predicate adapted to the synthetic schema (no commit/receipt
    # dates): orders containing at least one bulk line
    late = _t(spark, sf_dir, "lineitem").filter_where(
        F.col("l_quantity") > 45
    ).select(["l_orderkey"]).rename("l_orderkey", "o_orderkey")
    return (
        o.semi_join(["o_orderkey"], late)
        .group_by(["o_orderpriority"])
        .aggregate(order_count=F.count(F.lit(1)))
        .df
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20
    — broadcast nation dim, TakeOrderedAndProject for the top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter_where(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter_where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o)
        .rename("o_custkey", "c_custkey")
        .inner_join(["c_custkey"], c)
        .rename("c_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], n, broadcast=True)
        .derive("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .group_by(["c_custkey", "c_name", "n_name"])
        .aggregate(revenue=F.round(F.sum("rev"), 2))
        .sort_by(["revenue", "c_custkey"], ["desc", "asc"])
        .take(20)
        .df
    )


def q_set_ops(spark, sf_dir):
    """Nations having customers INTERSECT/EXCEPT nations having
    suppliers."""
    c = _t(spark, sf_dir, "customer").select(["c_nationkey"]).rename(
        "c_nationkey", "nationkey"
    ).distinct()
    s = _t(spark, sf_dir, "supplier").select(["s_nationkey"]).rename(
        "s_nationkey", "nationkey"
    ).distinct()
    both = c.intersect(s).derive("op", F.lit("both"))
    only_c = c.except_rows(s).derive("op", F.lit("cust_only"))
    return both.concat(only_c).df


def q_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.derive("order_year", F.year("o_orderdate"))
        .derive("order_month", F.month("o_orderdate"))
        .derive(
            "days_to_ref",
            F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")),
        )
        .group_by(["order_year"])
        .aggregate(
            n=F.count(F.lit(1)),
            avg_days=F.round(F.avg("days_to_ref"), 4),
            n_months=F.countDistinct(F.col("order_month")),
        )
        .df
    )


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional trade volume between two
    nations by (supplier nation, customer nation, ship year).
    Supplier-side dim chain broadcasts (tiny at any scale); the
    customer join shuffles — at 100 TB customers are not a
    broadcastable side."""
    n = _t(spark, sf_dir, "nation").filter_where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .rename("s_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], n, broadcast=True)
        .rename("n_name", "supp_nation")
        .select(["s_suppkey", "supp_nation"])
    )
    cn = (
        _t(spark, sf_dir, "customer")
        .rename("c_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], n, broadcast=True)
        .rename("n_name", "cust_nation")
        .select(["c_custkey", "cust_nation"])
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rename("l_suppkey", "s_suppkey")
        .inner_join(["s_suppkey"], sn, broadcast=True)
        .rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o)
        .rename("o_custkey", "c_custkey")
        .inner_join(["c_custkey"], cn)
        .filter_where(F.col("supp_nation") != F.col("cust_nation"))
        .derive("l_year", F.year("l_shipdate"))
        .derive("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .group_by(["supp_nation", "cust_nation", "l_year"])
        .aggregate(revenue=F.round(F.sum("volume"), 2))
        .df
    )


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: the synthetic schema has no
    partsupp, so supply cost is proxied as 10% of retail price x
    quantity): profit by supplier nation and order year over parts
    named like '%gear%'."""
    p = _t(spark, sf_dir, "part").filter_where(
        F.col("p_name").contains("gear")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sn = (
        s.rename("s_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], n, broadcast=True)
        .select(["s_suppkey", "n_name"])
    )
    return (
        li.rename("l_partkey", "p_partkey")
        .inner_join(["p_partkey"], p, broadcast=True)
        .rename("l_suppkey", "s_suppkey")
        .inner_join(["s_suppkey"], sn, broadcast=True)
        .rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o)
        .derive("o_year", F.year("o_orderdate"))
        .derive(
            "amount",
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity"),
        )
        .group_by(["n_name", "o_year"])
        .aggregate(sum_profit=F.round(F.sum("amount"), 2))
        .df
    )


def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape (adapted: no shipmode column — lines are
    classed by l_linestatus): per line status, counts of lines from
    high- vs low-priority orders shipped in 1996."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter_where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o)
        .group_by(["l_linestatus"])
        .aggregate(
            high_line_count=F.sum(if_then_else(high, F.lit(1), F.lit(0))),
            low_line_count=F.sum(if_then_else(high, F.lit(0), F.lit(1))),
        )
        .df
    )


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: share of September-1996 revenue from ECONOMY
    parts (stand-in for the PROMO type class) — broadcast part dim,
    conditional-sum ratio, null-safe division."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter_where(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rename("l_partkey", "p_partkey")
        .inner_join(["p_partkey"], p, broadcast=True)
        .aggregate(
            promo_revenue=F.round(
                F.lit(100.0)
                * F.sum(
                    if_then_else(F.col("p_type") == "ECONOMY", rev, F.lit(0.0))
                )
                / F.nullif(F.sum(rev), F.lit(0.0)),
                4,
            )
        )
        .df
    )


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (HAVING over a pre-aggregated lineitem), joined back
    to customer — top 20 by order value."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.group_by(["l_orderkey"])
        .aggregate(sum_qty=F.round(F.sum("l_quantity"), 2))
        .filter_where(F.col("sum_qty") > 150)
        .rename("l_orderkey", "o_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.inner_join(["o_orderkey"], big)
        .rename("o_custkey", "c_custkey")
        .inner_join(["c_custkey"], c)
        .select(["c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty"])
        .derive("o_totalprice", F.round(F.col("o_totalprice"), 2))
        .sort_by(["o_totalprice", "o_orderkey"], ["desc", "asc"])
        .take(20)
        .df
    )


def q19_basket_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate baskets over a
    broadcast part join (brand x quantity bands) — exercises
    disjunctive predicate pushdown through the join."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    basket = (
        ((F.col("p_brand") == "Brand#12") & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & (q >= 20) & (q <= 30))
    )
    return (
        li.rename("l_partkey", "p_partkey")
        .inner_join(["p_partkey"], p, broadcast=True)
        .filter_where(basket)
        .aggregate(
            revenue=F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            )
        )
        .df
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1's share of ASIA-customer widget
    revenue per order year. All dim chains broadcast; the only
    shuffles are the fact-fact orders join and the final tiny agg.
    The share is a conditional-sum ratio inside one aggregation —
    no second pass over the data."""
    r = _t(spark, sf_dir, "region").filter_where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter_where(F.col("p_name").contains("widget"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cn = (
        _t(spark, sf_dir, "customer")
        .rename("c_nationkey", "n_nationkey")
        .inner_join(
            ["n_nationkey"],
            n.inner_join(
                ["n_regionkey"], r.rename("r_regionkey", "n_regionkey"),
                broadcast=True,
            ).select(["n_nationkey"]),
            broadcast=True,
        )
        .select(["c_custkey"])
    )
    sn = (
        s.rename("s_nationkey", "n_nationkey")
        .inner_join(["n_nationkey"], n, broadcast=True)
        .rename("n_name", "supp_nation")
        .select(["s_suppkey", "supp_nation"])
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rename("l_partkey", "p_partkey")
        .inner_join(["p_partkey"], p.select(["p_partkey"]), broadcast=True)
        .rename("l_suppkey", "s_suppkey")
        .inner_join(["s_suppkey"], sn, broadcast=True)
        .rename("l_orderkey", "o_orderkey")
        .inner_join(["o_orderkey"], o.select(["o_orderkey", "o_custkey", "o_orderdate"]))
        .rename("o_custkey", "c_custkey")
        .inner_join(["c_custkey"], cn)
        .derive("o_year", F.year("o_orderdate"))
        .derive("volume", vol)
        .group_by(["o_year"])
        .aggregate(
            mkt_share=F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0)
                )
                / F.sum("volume"),
                4,
            )
        )
        .df
    )


def q13_order_counts(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers (left join, null-counted), orders
    filtered to non-'P' status. Two shuffles: the count agg and the
    distribution agg (the left join broadcasts the per-customer
    counts' dimension side is the fact — it shuffles)."""
    c = _t(spark, sf_dir, "customer").select(["c_custkey"])
    o = _t(spark, sf_dir, "orders").filter_where(F.col("o_orderstatus") != "P")
    per_cust = o.group_by(["o_custkey"]).aggregate(
        c_count=F.count(F.lit(1))
    ).rename("o_custkey", "c_custkey")
    return (
        c.left_join(["c_custkey"], per_cust)
        .derive("c_count", F.coalesce(F.col("c_count"), F.lit(0)))
        .group_by(["c_count"])
        .aggregate(custdist=F.count(F.lit(1)))
        .df
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly
    revenue — the max rides back as a broadcast one-row join (no
    driver collect, tie-complete like the spec's view formulation)."""
    li = _t(spark, sf_dir, "lineitem").filter_where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.derive(
        "r", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).group_by(["l_suppkey"]).aggregate(total_revenue=F.round(F.sum("r"), 2))
    mx = DataFrame(rev.df.agg(F.max("total_revenue").alias("__mx")))
    return (
        rev.df.crossJoin(F.broadcast(mx.df))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(s.df, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue impact of small-quantity orders for
    one brand — the per-part average quantity is an aggregation of
    the SAME lineitem scan, joined back broadcast (the brand filter
    makes that side dimension-sized at any scale)."""
    p = _t(spark, sf_dir, "part").filter_where(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem")
    li_p = li.rename("l_partkey", "p_partkey").inner_join(
        ["p_partkey"], p.select(["p_partkey"]), broadcast=True
    )
    avg_q = li_p.group_by(["p_partkey"]).aggregate(
        avg_qty=F.avg("l_quantity")
    )
    return (
        li_p.inner_join(["p_partkey"], avg_q, broadcast=True)
        .filter_where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .aggregate(
            avg_yearly=F.round(F.sum("l_extendedprice") / 7.0, 2),
            n_lines=F.count(F.lit(1)),
        )
        .df
    )


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted: no commit/receipt dates in the
    synthetic schema — 'late' is a ship date past 1997-06-30):
    suppliers who were the ONLY late shipper in a multi-supplier
    finished order. The exists/not-exists pair collapses into one
    per-order aggregation (distinct suppliers vs distinct late
    suppliers) — a single shuffle on the order key instead of two
    correlated self-joins."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter_where(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > "1997-06-30"
    per_order = (
        li.rename("l_orderkey", "o_orderkey")
        .semi_join(["o_orderkey"], o.select(["o_orderkey"]))
        .group_by(["o_orderkey"])
        .aggregate(
            n_supp=F.countDistinct(F.col("l_suppkey")),
            n_late_supp=F.countDistinct(F.when(late, F.col("l_suppkey"))),
            late_supp=F.max(F.when(late, F.col("l_suppkey"))),
        )
    )
    flagged = per_order.filter_where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        flagged.df.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(s.df), F.col("late_supp") == F.col("s_suppkey")
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape (adapted: nation key stands in for the phone
    country code, and 'lapsed' means no order since 2000 — every
    synthetic customer has SOME order, so the spec's no-orders-ever
    test selects nothing): rich customers (acctbal above the
    positive-balance average) who lapsed, counted per nation. The
    global average rides in as a broadcast one-row crossJoin; the
    lapsed test is an anti join shipping only order keys."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter_where(F.col("o_orderdate") >= "2000-01-01")
        .select(["o_custkey"])
        .rename("o_custkey", "c_custkey")
    )
    avg_bal = DataFrame(
        c.filter_where(F.col("c_acctbal") > 0.0)
        .df.agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        c.df.crossJoin(F.broadcast(avg_bal.df))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o.df, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )




# --- derived partsupp + TPC-H Q2/Q11/Q16/Q20 -------------------------
#
# The synthetic schema has no partsupp table, so the four TPC-H
# queries whose defining shape is a (correlated) aggregate over the
# part-supplier relation were inexpressible (SURVEY section-2 item 63
# gap note; VERDICT r8 ask #2). partsupp is DERIVED deterministically
# from part x supplier with the TPC-H dbgen supplier-assignment
# formula (4 suppliers per part, 0-based keys here):
#   ps_suppkey = (p_partkey + p_partkey div S + i*max(1, S div 4)) mod S
# (dbgen's own stride S/4 + p/S collapses duplicates when S is small
# enough that p/S reaches S/4 — at sf0.001 S=10 gives stride 5, and
# i*5 mod 10 yields only 2 distinct suppliers; max(1, S div 4) keeps
# 3*stride < S, so the 4 assignments are provably distinct for any
# S >= 4 — invariant-pinned in tests/test_joins.py)
# and hash-free arithmetic surrogates for availqty/supplycost, so the
# SAME rows are constructible in any engine — the DuckDB oracles
# rebuild it as a CTE and every value (supplycost in integer CENTS)
# is exact-integer math until the final display division.


def _partsupp(spark, sf_dir):
    """Derived partsupp as a pure Spark plan: part scan (one narrow
    column) x broadcast 1-row supplier count x explode(0..3) — no
    shuffle, no data written, size 4x|part| at any scale."""
    part = _t(spark, sf_dir, "part").df.select("p_partkey")
    scnt = _t(spark, sf_dir, "supplier").df.agg(
        F.count(F.lit(1)).cast("long").alias("__s")
    )
    return (
        part.crossJoin(F.broadcast(scnt))
        .select(
            F.col("p_partkey").cast("long").alias("ps_partkey"),
            F.col("__s"),
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("__i"),
        )
        .select(
            "ps_partkey",
            F.expr(
                "(ps_partkey + (ps_partkey div __s) + CAST(__i AS BIGINT)"
                " * greatest(CAST(1 AS BIGINT), __s div 4)) % __s"
            ).alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((F.col("ps_partkey") * 47 + F.col("ps_suppkey") * 31) % 9999 + 1
             ).alias("ps_availqty"),
            ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7) % 99900 + 100
             ).alias("ps_supplycost_cents"),
        )
        .withColumn(
            "ps_supplycost", F.col("ps_supplycost_cents") / F.lit(100.0)
        )
    )


# shared oracle prelude: WITH <PS_CTE> SELECT ...
PS_CTE = """
  scnt AS (SELECT COUNT(*) AS s FROM supplier),
  ps0 AS (
    SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
           (CAST(p_partkey AS BIGINT)
             + (CAST(p_partkey AS BIGINT) // scnt.s)
             + i.i * GREATEST(CAST(1 AS BIGINT), scnt.s // 4))
             % scnt.s AS ps_suppkey
    FROM part, scnt, (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) AS i(i)),
  partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 47 + ps_suppkey * 31) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 13 + ps_suppkey * 7) % 99900 + 100
             AS ps_supplycost_cents,
           ((ps_partkey * 13 + ps_suppkey * 7) % 99900 + 100) / 100.0
             AS ps_supplycost
    FROM ps0)
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: minimum-cost EUROPE supplier for mid-size
    ECONOMY parts. The spec's correlated scalar subquery (min
    supplycost per part over the region) decorrelates into a
    per-part min aggregate of the SAME candidate set joined back —
    one shuffle on ps_partkey; all dimension joins broadcast. Exact:
    the min/equality runs on integer cents."""
    ps = _partsupp(spark, sf_dir)
    region = _t(spark, sf_dir, "region").df.where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").df
    sup = _t(spark, sf_dir, "supplier").df
    part = (
        _t(spark, sf_dir, "part").df
        .where((F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_brand")
    )
    eu_sup = (
        sup.join(F.broadcast(nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey,
        )), sup.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(
        F.broadcast(eu_sup), ps.ps_suppkey == eu_sup.s_suppkey
    ).join(
        F.broadcast(part),
        F.col("ps_partkey") == F.col("p_partkey").cast("long"),
    )
    minc = cand.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("__minc")
    )
    return (
        # minc is bounded by the FILTERED part count (one row per
        # qualifying part), broadcastable at any corpus scale
        cand.join(F.broadcast(minc), "ps_partkey")
        .where(F.col("ps_supplycost_cents") == F.col("__minc"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand", "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH {PS_CTE}
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_brand,
       ps_supplycost
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
JOIN part ON ps_partkey = p_partkey
WHERE p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 20
  AND ps_supplycost_cents = (
    SELECT MIN(p2.ps_supplycost_cents)
    FROM partsupp p2
    JOIN supplier s2 ON p2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE r2.r_name = 'EUROPE' AND p2.ps_partkey = partsupp.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part inventory value held by EUROPE
    suppliers, keeping parts above 1.2x the MEAN per-part value (the spec's\n    0.0001/SF fraction is scale-dependent; the mean keeps a stable\n    selectivity at every corpus size) —
    the scalar-aggregate subquery rides back as a broadcast one-row
    cross join (the q15 pattern), so the plan is two aggregations
    over one shuffled candidate set, no driver collect. Exact: sums
    run on integer cents x quantity, divided only for display."""
    ps = _partsupp(spark, sf_dir)
    region = _t(spark, sf_dir, "region").df.where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").df
    sup = _t(spark, sf_dir, "supplier").df
    eu_keys = sup.join(
        F.broadcast(nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey,
        )), sup.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    cand = ps.join(
        F.broadcast(eu_keys), ps.ps_suppkey == eu_keys.s_suppkey
    ).withColumn(
        "__v", F.col("ps_supplycost_cents") * F.col("ps_availqty")
    )
    per_part = cand.groupBy("ps_partkey").agg(F.sum("__v").alias("__pv"))
    # spec's fixed fraction (0.0001/SF) is scale-dependent; 1.2x the
    # MEAN per-part value keeps the scalar-aggregate-subquery shape
    # while selecting a stable share of parts at every corpus size
    total = per_part.agg(
        (1.2 * F.sum("__pv") / F.count(F.lit(1))).alias("__cut")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__pv") > F.col("__cut"))
        .select(
            "ps_partkey",
            F.round(F.col("__pv") / F.lit(100.0), 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


Q11_SQL = f"""
WITH {PS_CTE},
eu AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
pv AS (
  SELECT ps_partkey,
         CAST(SUM(ps_supplycost_cents * ps_availqty) AS BIGINT) AS v
  FROM partsupp JOIN eu ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey)
SELECT ps_partkey, ROUND(v / 100.0, 2) AS value
FROM pv
WHERE v > (SELECT 1.2 * CAST(SUM(v) AS BIGINT) / COUNT(*) FROM pv)
ORDER BY value DESC, ps_partkey
"""


def q16_supplier_relation(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, type,
    size) for a filtered part set, excluding flagged suppliers (the
    spec's complaints NOT IN; this schema has no s_comment, so the
    flag is s_acctbal < 0). NOT IN is a broadcast ANTI join —
    null-safe here because s_suppkey is a key; the distinct count is
    one shuffle keyed on the group columns."""
    ps = _partsupp(spark, sf_dir)
    part = (
        _t(spark, sf_dir, "part").df
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin([1, 4, 7, 10, 15, 23, 45, 50])
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = (
        _t(spark, sf_dir, "supplier").df
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(
            F.broadcast(part),
            F.col("ps_partkey") == F.col("p_partkey").cast("long"),
        )
        .join(F.broadcast(flagged), ["ps_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_SQL = f"""
WITH {PS_CTE}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 15, 23, 45, 50)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_stock(spark, sf_dir):
    """TPC-H Q20 shape: EUROPE suppliers holding stock of 'small'
    parts in excess of half what they shipped in 1996. The spec's
    doubly-correlated subquery (sum of lineitem quantity per
    (part, supplier)) decorrelates into ONE aggregation of the
    date-filtered lineitem keyed on (l_partkey, l_suppkey), joined
    to partsupp — empty shipped-sets drop out of the inner join
    exactly as the spec's NULL comparison does. The part-name and
    supplier-region filters broadcast."""
    ps = _partsupp(spark, sf_dir)
    small = (
        _t(spark, sf_dir, "part").df
        .where(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").cast("long").alias("ps_partkey"))
    )
    shipped = (
        _t(spark, sf_dir, "lineitem").df
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.col("l_partkey").cast("long").alias("ps_partkey"),
            F.col("l_suppkey").cast("long").alias("ps_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("__shipped"))
    )
    region = _t(spark, sf_dir, "region").df.where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").df
    sup = _t(spark, sf_dir, "supplier").df
    eu_sup = sup.join(
        F.broadcast(nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey,
        )), sup.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name", "s_acctbal")
    qualifying = (
        ps.join(F.broadcast(small), ["ps_partkey"])
        .join(shipped, ["ps_partkey", "ps_suppkey"])
        .where(F.col("ps_availqty") > 0.5 * F.col("__shipped"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        eu_sup.join(
            qualifying, eu_sup.s_suppkey == qualifying.ps_suppkey
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {PS_CTE}
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps_availqty > (
      SELECT 0.5 * SUM(l.l_quantity) FROM lineitem l
      WHERE l.l_partkey = partsupp.ps_partkey
        AND l.l_suppkey = partsupp.ps_suppkey
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'))
ORDER BY s_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q8_market_share": q8_market_share,
    "q13_order_counts": q13_order_counts,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_global_sales": q22_global_sales,
    "q_select": q_select,
    "q_exclude": q_exclude,
    "q_filter": q_filter,
    "q_derive": q_derive,
    "q_distinct": q_distinct,
    "q_take_sorted": q_take_sorted,
    "q_group_agg": q_group_agg,
    "q_recode": q_recode,
    "q_apply_where": q_apply_where,
    "q_impute": q_impute,
    "q_join_inner": q_join_inner,
    "q_join_left": q_join_left,
    "q_join_full": q_join_full,
    "q_join_semi_anti": q_join_semi_anti,
    "q_bloom_semi": q_bloom_semi,
    "q_skew_join": q_skew_join,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_union": q_union,
    "q_set_ops": q_set_ops,
    "q_dates": q_dates,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q12_priority_lines": q12_priority_lines,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_basket_revenue": q19_basket_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_relation": q16_supplier_relation,
    "q20_excess_stock": q20_excess_stock,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_supplier_relation": Q16_SQL,
    "q20_excess_stock": Q20_SQL,

    "q_skew_join": """
        WITH lt AS (
          SELECT CASE WHEN CAST('0x' || SUBSTR(MD5(
                   CAST(l_orderkey AS VARCHAR) || CHR(31) ||
                   CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT)
                   / 4294967296.0 < 0.2
                 THEN 0 ELSE l_partkey % 500 END AS sk,
                 l_returnflag, l_extendedprice AS val
          FROM lineitem
        ), dim AS (
          SELECT p_partkey % 500 AS sk, AVG(p_retailprice) AS dim_price
          FROM part GROUP BY 1
        )
        SELECT l_returnflag, ROUND(SUM(val * dim_price) / 1e9, 2) AS w
        FROM lt JOIN dim USING (sk)
        GROUP BY l_returnflag
    """,
    "q8_market_share": """
        WITH base AS (
          SELECT YEAR(o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 ns.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          JOIN region r ON nc.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA' AND p.p_name LIKE '%widget%'
        )
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_1'
                              THEN volume ELSE 0.0 END) / SUM(volume), 4)
                 AS mkt_share
        FROM base GROUP BY o_year
    """,
    "q13_order_counts": """
        WITH per_cust AS (
          SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
          FROM customer c
          LEFT JOIN (SELECT o_custkey FROM orders
                     WHERE o_orderstatus <> 'P') o
            ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "q17_small_quantity": """
        WITH li_p AS (
          SELECT l.* FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#23'
        ), avg_q AS (
          SELECT l_partkey, AVG(l_quantity) AS avg_qty
          FROM li_p GROUP BY l_partkey
        )
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_lines
        FROM li_p l JOIN avg_q a ON l.l_partkey = a.l_partkey
        WHERE l.l_quantity < 0.2 * a.avg_qty
    """,
    "q21_waiting_supplier": """
        WITH per_order AS (
          SELECT l.l_orderkey,
                 COUNT(DISTINCT l.l_suppkey) AS n_supp,
                 COUNT(DISTINCT CASE WHEN l.l_shipdate > '1997-06-30'
                                     THEN l.l_suppkey END) AS n_late_supp,
                 MAX(CASE WHEN l.l_shipdate > '1997-06-30'
                          THEN l.l_suppkey END) AS late_supp
          FROM lineitem l
          WHERE l.l_orderkey IN
                (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
          GROUP BY l.l_orderkey
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM per_order f JOIN supplier s ON f.late_supp = s.s_suppkey
        WHERE f.n_supp >= 2 AND f.n_late_supp = 1
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC LIMIT 10
    """,
    "q22_global_sales": """
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '2000-01-01')
        GROUP BY c_nationkey
    """,
    "q7_nation_volume": """
        SELECT sn.supp_nation, cn.cust_nation,
               EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name IN ('NATION_1','NATION_2')) sn
          ON l.l_suppkey = sn.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN (SELECT c_custkey, n_name AS cust_nation FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              WHERE n_name IN ('NATION_1','NATION_2')) cn
          ON o.o_custkey = cn.c_custkey
        WHERE sn.supp_nation <> cn.cust_nation
        GROUP BY sn.supp_nation, cn.cust_nation, l_year
    """,
    "q9_product_profit": """
        SELECT n.n_name,
               EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity), 2)
                 AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY n.n_name, o_year
    """,
    "q12_priority_lines": """
        SELECT l.l_linestatus,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
        GROUP BY l.l_linestatus
    """,
    "q14_promo_revenue": """
        SELECT ROUND(
                 100.0 * SUM(CASE WHEN p.p_type = 'ECONOMY'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                 / NULLIF(SUM(l.l_extendedprice * (1 - l.l_discount)), 0),
               4) AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= '1996-09-01' AND l.l_shipdate < '1996-10-01'
    """,
    "q18_large_orders": """
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               ROUND(o.o_totalprice, 2) AS o_totalprice, big.sum_qty
        FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING ROUND(SUM(l_quantity), 2) > 150) big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY ROUND(o.o_totalprice, 2) DESC, o.o_orderkey ASC
        LIMIT 20
    """,
    "q19_basket_revenue": """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q1_pricing_summary": Q1_SQL,
    "q_select": "SELECT n_nationkey, n_name FROM nation",
    "q_exclude": "SELECT n_nationkey, n_name FROM nation",
    "q_filter": """
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'
    """,
    "q_derive": """
        SELECT p_partkey,
          CASE WHEN p_retailprice >= 1500 THEN 'premium'
               WHEN p_retailprice >= 1000 THEN 'mid'
               ELSE 'budget' END AS price_tier,
          ROUND(p_retailprice * 0.1, 4) AS margin
        FROM part
    """,
    "q_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_take_sorted": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "q_group_agg": """
        SELECT o_orderpriority,
          COUNT(*) AS n,
          ROUND(SUM(o_totalprice), 2) AS total,
          ROUND(AVG(o_totalprice), 4) AS avg_price,
          MIN(CAST(o_orderdate AS DATE)) AS first_date,
          MAX(CAST(o_orderdate AS DATE)) AS last_date
        FROM orders GROUP BY o_orderpriority
    """,
    "q_recode": """
        SELECT r_regionkey,
          CASE r_name WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
                      WHEN 'ASIA' THEN 'AS' ELSE 'OTHER' END AS r_name
        FROM region
    """,
    "q_apply_where": """
        SELECT CASE WHEN o_orderstatus = 'F' THEN LOWER(o_orderpriority)
                    ELSE o_orderpriority END AS o_orderpriority,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    """,
    "q_impute": """
        WITH nulled AS (
          SELECT CASE WHEN l_quantity > 40 THEN NULL ELSE l_quantity END AS qn
          FROM lineitem
        ), filled AS (
          SELECT COALESCE(qn, AVG(qn) OVER ()) AS qn FROM nulled
        )
        SELECT ROUND(SUM(qn), 2) AS checksum, COUNT(*) - COUNT(qn) AS n_null
        FROM filled
    """,
    "q_join_inner": """
        SELECT o_orderkey, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "q_join_left": """
        SELECT c_nationkey, n_orders IS NOT NULL AS has_orders, COUNT(*) AS n
        FROM customer
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
          ON c_custkey = o_custkey
        GROUP BY 1, 2
    """,
    "q_join_full": """
        SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey, n_supp, n_cust
        FROM (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        FULL OUTER JOIN (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
          USING (nationkey)
    """,
    "q_bloom_semi": """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS sum_qty
        FROM lineitem l
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_orderkey = l.l_orderkey
            AND o.o_orderpriority = '1-URGENT'
            AND o.o_orderstatus = 'F'
        )
        GROUP BY l_returnflag
    """,
    "q_join_semi_anti": """
        SELECT COALESCE(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
               COALESCE(n_with, 0) AS n_with,
               COALESCE(n_without, 0) AS n_without
        FROM (
          SELECT c_nationkey, COUNT(*) AS n_with FROM customer c
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          GROUP BY 1
        ) w
        FULL OUTER JOIN (
          SELECT c_nationkey, COUNT(*) AS n_without FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          GROUP BY 1
        ) wo ON w.c_nationkey = wo.c_nationkey
    """,
    "q5_local_supplier": """
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q_union": """
        SELECT nationkey, kind, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
        ) GROUP BY 1, 2
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o.o_orderkey AND l_quantity > 45
          )
        GROUP BY o_orderpriority
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "q_set_ops": """
        SELECT nationkey, 'both' AS op FROM
          (SELECT DISTINCT c_nationkey AS nationkey FROM customer
           INTERSECT
           SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'cust_only' AS op FROM
          (SELECT DISTINCT c_nationkey AS nationkey FROM customer
           EXCEPT
           SELECT DISTINCT s_nationkey FROM supplier)
    """,
    "q_dates": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
               COUNT(*) AS n,
               ROUND(AVG(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')), 4) AS avg_days,
               COUNT(DISTINCT EXTRACT(MONTH FROM o_orderdate)) AS n_months
        FROM orders GROUP BY 1
    """,
}
