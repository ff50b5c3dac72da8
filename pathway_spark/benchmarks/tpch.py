"""TPC-H queries in the pathway_spark Table API, with DuckDB oracles.

The driver's testdata is TPC-H-shaped but trimmed: no `partsupp`
table, and several text/date columns (l_shipmode, l_commitdate,
l_receiptdate, o_shippriority, c_phone, p_container...) are absent.
This suite carries every query expressible on the available columns —
Q1, Q3, Q6, Q7, Q8, Q10, Q14, Q15, Q17, Q18, Q22 — adapted where a
missing column forces it (each adaptation is noted on the query).
Q5 and Q13 shapes already ship as driver gates (q66/q68).

Money math uses DECIMAL(12,2)/(4,2) casts like the driver gates so
sums are exact and engine-comparable; averages stay double (compare
with float tolerance).

Every query compiles to declarative DataFrame plans: dim joins
broadcast under the session's 64 MB auto-broadcast threshold; the
orders⋈lineitem joins shuffle on the order key only.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

import pathway_spark as pw
from pathway_spark import reducers as R, this


def _t(spark, sf: str, name: str) -> "pw.Table":
    return pw.io.parquet.read(f"{sf}/{name}.parquet", spark=spark)


def _dec_revenue(price_ref, disc_ref):
    price = pw.cast(T.DecimalType(12, 2), price_ref)
    disc = pw.cast(T.DecimalType(4, 2), disc_ref)
    return price * (1 - disc)


def q1_pricing_summary(spark, sf):
    """TPC-H Q1: pricing summary report."""
    li = _t(spark, sf, "lineitem").filter(
        this.l_shipdate <= dt.datetime(1998, 9, 2))
    qty = pw.cast(T.DecimalType(12, 2), this.l_quantity)
    price = pw.cast(T.DecimalType(12, 2), this.l_extendedprice)
    disc = pw.cast(T.DecimalType(4, 2), this.l_discount)
    tax = pw.cast(T.DecimalType(4, 2), this.l_tax)
    return li.groupby(this.l_returnflag, this.l_linestatus).reduce(
        l_returnflag=this.l_returnflag,
        l_linestatus=this.l_linestatus,
        sum_qty=R.sum(qty),
        sum_base_price=R.sum(price),
        sum_disc_price=R.sum(price * (1 - disc)),
        sum_charge=R.sum(price * (1 - disc) * (1 + tax)),
        avg_qty=R.avg(pw.cast(T.DoubleType(), this.l_quantity)),
        avg_price=R.avg(pw.cast(T.DoubleType(), this.l_extendedprice)),
        avg_disc=R.avg(pw.cast(T.DoubleType(), this.l_discount)),
        count_order=R.count(),
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity::DECIMAL(12,2)) AS sum_qty,
       SUM(l_extendedprice::DECIMAL(12,2)) AS sum_base_price,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))) AS sum_disc_price,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))
           * (1 + l_tax::DECIMAL(4,2))) AS sum_charge,
       AVG(l_quantity::DOUBLE) AS avg_qty,
       AVG(l_extendedprice::DOUBLE) AS avg_price,
       AVG(l_discount::DOUBLE) AS avg_disc,
       COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf):
    """TPC-H Q3 (adapted: no o_shippriority column in the corpus)."""
    c = _t(spark, sf, "customer").filter(this.c_mktsegment == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        this.o_orderdate < dt.datetime(1995, 3, 15))
    li = _t(spark, sf, "lineitem").filter(
        this.l_shipdate > dt.datetime(1995, 3, 15))
    co = o.join(c, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.o_orderdate)
    j = li.join(co, pw.left.l_orderkey == pw.right.o_orderkey)
    return j.groupby(pw.right.o_orderkey, pw.right.o_orderdate).reduce(
        o_orderkey=pw.right.o_orderkey,
        o_orderdate=pw.right.o_orderdate,
        revenue=R.sum(_dec_revenue(pw.left.l_extendedprice,
                                   pw.left.l_discount)),
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate
"""


def q6_forecast_revenue(spark, sf):
    """TPC-H Q6: forecast revenue change (global reduce — one row)."""
    li = _t(spark, sf, "lineitem").filter(
        (this.l_shipdate >= dt.datetime(1994, 1, 1))
        & (this.l_shipdate < dt.datetime(1995, 1, 1))
        & (this.l_discount >= 0.05) & (this.l_discount <= 0.07)
        & (this.l_quantity < 24)
    )
    price = pw.cast(T.DecimalType(12, 2), this.l_extendedprice)
    disc = pw.cast(T.DecimalType(4, 2), this.l_discount)
    return li.reduce(revenue=R.sum(price * disc))


Q6_SQL = """
SELECT SUM(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(4,2)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q7_volume_shipping(spark, sf):
    """TPC-H Q7: volume shipping between FRANCE and GERMANY
    (supp_nation, cust_nation, year, revenue)."""
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier").join(
        n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey, supp_nation=this.n_name)
    c = _t(spark, sf, "customer").join(
        n, pw.left.c_nationkey == pw.right.n_nationkey).select(
        this.c_custkey, cust_nation=this.n_name)
    o = _t(spark, sf, "orders").join(
        c, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.cust_nation)
    li = _t(spark, sf, "lineitem").filter(
        (this.l_shipdate >= dt.datetime(1995, 1, 1))
        & (this.l_shipdate <= dt.datetime(1996, 12, 31)))
    ls = li.join(s, pw.left.l_suppkey == pw.right.s_suppkey).select(
        this.l_orderkey, this.l_extendedprice, this.l_discount,
        this.l_shipdate, this.supp_nation)
    j = ls.join(o, pw.left.l_orderkey == pw.right.o_orderkey).filter(
        ((pw.left.supp_nation == "FRANCE") & (pw.right.cust_nation == "GERMANY"))
        | ((pw.left.supp_nation == "GERMANY") & (pw.right.cust_nation == "FRANCE"))
    ).select(this.supp_nation, this.cust_nation,
             l_year=pw.left.l_shipdate.dt.year(),
             volume=_dec_revenue(pw.left.l_extendedprice, pw.left.l_discount))
    return j.groupby(this.supp_nation, this.cust_nation, this.l_year).reduce(
        this.supp_nation, this.cust_nation, this.l_year,
        revenue=R.sum(this.volume))


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
       OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark, sf):
    """TPC-H Q8 (adapted: p_type filter kept, mfgr column absent):
    BRAZIL's share of ECONOMY-type part revenue in AMERICA, by year."""
    r = _t(spark, sf, "region").filter(this.r_name == "AMERICA")
    n = _t(spark, sf, "nation")
    cn = _t(spark, sf, "customer").join(
        n.join(r, pw.left.n_regionkey == pw.right.r_regionkey)
         .select(this.n_nationkey),
        pw.left.c_nationkey == pw.right.n_nationkey).select(this.c_custkey)
    o = _t(spark, sf, "orders").filter(
        (this.o_orderdate >= dt.datetime(1995, 1, 1))
        & (this.o_orderdate <= dt.datetime(1996, 12, 31)))
    oc = o.join(cn, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.o_orderdate)
    p = _t(spark, sf, "part").filter(
        this.p_type.str.startswith("ECONOMY")).select(this.p_partkey)
    li = _t(spark, sf, "lineitem")
    lp = li.join(p, pw.left.l_partkey == pw.right.p_partkey).select(
        this.l_orderkey, this.l_suppkey, this.l_extendedprice,
        this.l_discount)
    s = _t(spark, sf, "supplier").join(
        n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey, nation=this.n_name)
    lps = lp.join(s, pw.left.l_suppkey == pw.right.s_suppkey).select(
        this.l_orderkey, this.l_extendedprice, this.l_discount, this.nation)
    j = lps.join(oc, pw.left.l_orderkey == pw.right.o_orderkey).select(
        o_year=pw.right.o_orderdate.dt.year(),
        volume=_dec_revenue(pw.left.l_extendedprice, pw.left.l_discount),
        nation=pw.left.nation)
    vol = pw.cast(T.DoubleType(), this.volume)
    brazil = pw.if_else(this.nation == "BRAZIL", vol, 0.0)
    per_year = j.groupby(this.o_year).reduce(
        this.o_year,
        brazil_volume=R.sum(brazil),
        total_volume=R.sum(vol))
    return per_year.select(
        this.o_year,
        mkt_share=this.brazil_volume / this.total_volume)


Q8_SQL = """
SELECT o_year,
       SUM(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
         / SUM(volume) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         (l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2)))::DOUBLE AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    AND p_type LIKE 'ECONOMY%'
) AS all_nations
GROUP BY o_year
"""


def q10_returned_items(spark, sf):
    """TPC-H Q10 (adapted: c_address/c_phone/c_comment absent)."""
    o = _t(spark, sf, "orders").filter(
        (this.o_orderdate >= dt.datetime(1993, 10, 1))
        & (this.o_orderdate < dt.datetime(1994, 1, 1)))
    li = _t(spark, sf, "lineitem").filter(this.l_returnflag == "R")
    lo = li.join(o, pw.left.l_orderkey == pw.right.o_orderkey).select(
        this.o_custkey,
        volume=_dec_revenue(pw.left.l_extendedprice, pw.left.l_discount))
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    cn = c.join(n, pw.left.c_nationkey == pw.right.n_nationkey).select(
        this.c_custkey, this.c_name, this.c_acctbal, n_name=this.n_name)
    j = lo.join(cn, pw.left.o_custkey == pw.right.c_custkey)
    return j.groupby(pw.right.c_custkey, pw.right.c_name,
                     pw.right.c_acctbal, pw.right.n_name).reduce(
        pw.right.c_custkey, pw.right.c_name, pw.right.c_acctbal,
        pw.right.n_name,
        revenue=R.sum(pw.left.volume))


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1993-10-01'
  AND o_orderdate < TIMESTAMP '1994-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
"""


def q14_promo_effect(spark, sf):
    """TPC-H Q14: promotion revenue share (one row)."""
    li = _t(spark, sf, "lineitem").filter(
        (this.l_shipdate >= dt.datetime(1995, 9, 1))
        & (this.l_shipdate < dt.datetime(1995, 10, 1)))
    p = _t(spark, sf, "part").select(this.p_partkey, this.p_type)
    j = li.join(p, pw.left.l_partkey == pw.right.p_partkey).select(
        this.p_type,
        volume=pw.cast(T.DoubleType(), _dec_revenue(
            pw.left.l_extendedprice, pw.left.l_discount)))
    promo = pw.if_else(this.p_type.str.startswith("PROMO"),
                       this.volume, 0.0)
    agg = j.reduce(promo=R.sum(promo), total=R.sum(this.volume))
    return agg.select(promo_revenue=100.0 * this.promo / this.total)


Q14_SQL = """
SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN volume ELSE 0 END)
         / SUM(volume) AS promo_revenue
FROM (
  SELECT p_type,
         (l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2)))::DOUBLE AS volume
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND l_shipdate >= TIMESTAMP '1995-09-01'
    AND l_shipdate < TIMESTAMP '1995-10-01'
) t
"""


def q15_top_supplier(spark, sf):
    """TPC-H Q15: supplier(s) with maximum revenue in a quarter."""
    li = _t(spark, sf, "lineitem").filter(
        (this.l_shipdate >= dt.datetime(1996, 1, 1))
        & (this.l_shipdate < dt.datetime(1996, 4, 1)))
    rev = li.groupby(this.l_suppkey).reduce(
        supplier_no=this.l_suppkey,
        total_revenue=R.sum(_dec_revenue(this.l_extendedprice,
                                         this.l_discount)))
    peak = rev.reduce(m=R.max(this.total_revenue))
    top = rev.join(peak, pw.left.total_revenue == pw.right.m).select(
        this.supplier_no, this.total_revenue)
    s = _t(spark, sf, "supplier")
    return top.join(s, pw.left.supplier_no == pw.right.s_suppkey).select(
        this.s_suppkey, this.s_name, this.total_revenue)


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q17_small_quantity(spark, sf):
    """TPC-H Q17 (adapted: no p_container; filter on p_brand only):
    yearly revenue lost if small-quantity orders were not taken."""
    p = _t(spark, sf, "part").filter(this.p_brand == "Brand#23").select(
        this.p_partkey)
    li = _t(spark, sf, "lineitem")
    lp = li.join(p, pw.left.l_partkey == pw.right.p_partkey).select(
        this.l_partkey, this.l_quantity, this.l_extendedprice)
    avg_qty = lp.groupby(this.l_partkey).reduce(
        this.l_partkey,
        threshold=0.2 * R.avg(pw.cast(T.DoubleType(), this.l_quantity)))
    j = lp.join(avg_qty, pw.left.l_partkey == pw.right.l_partkey).filter(
        pw.cast(T.DoubleType(), pw.left.l_quantity) < pw.right.threshold
    ).select(price=pw.left.l_extendedprice)
    agg = j.reduce(total=R.sum(pw.cast(T.DecimalType(12, 2), this.price)))
    return agg.select(avg_yearly=pw.cast(T.DoubleType(), this.total) / 7.0)


Q17_SQL = """
SELECT SUM(l_extendedprice::DECIMAL(12,2))::DOUBLE / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity::DOUBLE < (
    SELECT 0.2 * AVG(l2.l_quantity::DOUBLE)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q18_large_orders(spark, sf):
    """TPC-H Q18: customers with orders totalling > 300 quantity."""
    li = _t(spark, sf, "lineitem")
    big = li.groupby(this.l_orderkey).reduce(
        this.l_orderkey,
        sum_qty=R.sum(pw.cast(T.DecimalType(12, 2), this.l_quantity))
    ).filter(this.sum_qty > 300)
    o = _t(spark, sf, "orders")
    ob = o.join(big, pw.left.o_orderkey == pw.right.l_orderkey).select(
        this.o_orderkey, this.o_custkey, this.o_orderdate,
        this.o_totalprice, this.sum_qty)
    c = _t(spark, sf, "customer")
    return ob.join(c, pw.left.o_custkey == pw.right.c_custkey).select(
        this.c_name, this.c_custkey, this.o_orderkey, this.o_orderdate,
        this.o_totalprice, total_qty=this.sum_qty)


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       t.sum_qty AS total_qty
FROM customer, orders,
     (SELECT l_orderkey, SUM(l_quantity::DECIMAL(12,2)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300) t
WHERE o_orderkey = t.l_orderkey AND c_custkey = o_custkey
"""


def q22_sales_opportunity(spark, sf):
    """TPC-H Q22 (adapted: no c_phone — country group is c_nationkey;
    the anti-join and above-average-balance semantics are intact)."""
    c = _t(spark, sf, "customer")
    avg_bal = c.filter(this.c_acctbal > 0.0).reduce(
        a=R.avg(this.c_acctbal))
    # broadcast the 1-row average via a constant-key join
    ck = c.with_columns(k=0)
    ak = avg_bal.with_columns(k=0)
    rich = ck.join(ak, pw.left.k == pw.right.k).filter(
        pw.left.c_acctbal > pw.right.a).select(
        this.c_custkey, this.c_nationkey, this.c_acctbal)
    has_orders = _t(spark, sf, "orders").groupby(this.o_custkey).reduce(
        this.o_custkey)
    # NOT EXISTS → left join on the distinct order keys, keep null side
    no_orders = rich.join_left(
        has_orders, pw.left.c_custkey == pw.right.o_custkey
    ).filter(pw.right.o_custkey.is_none()).select(
        this.c_custkey, this.c_nationkey, this.c_acctbal)
    return no_orders.groupby(this.c_nationkey).reduce(
        cntrycode=this.c_nationkey,
        numcust=R.count(),
        totacctbal=R.sum(pw.cast(T.DecimalType(12, 2), this.c_acctbal)))


Q22_SQL = """
SELECT c_nationkey AS cntrycode, COUNT(*)::BIGINT AS numcust,
       SUM(c_acctbal::DECIMAL(12,2)) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


QUERIES = {
    "tpch_q1": q1_pricing_summary,
    "tpch_q3": q3_shipping_priority,
    "tpch_q6": q6_forecast_revenue,
    "tpch_q7": q7_volume_shipping,
    "tpch_q8": q8_market_share,
    "tpch_q10": q10_returned_items,
    "tpch_q14": q14_promo_effect,
    "tpch_q15": q15_top_supplier,
    "tpch_q17": q17_small_quantity,
    "tpch_q18": q18_large_orders,
    "tpch_q22": q22_sales_opportunity,
}

ORACLE_SQL = {
    "tpch_q1": Q1_SQL,
    "tpch_q3": Q3_SQL,
    "tpch_q6": Q6_SQL,
    "tpch_q7": Q7_SQL,
    "tpch_q8": Q8_SQL,
    "tpch_q10": Q10_SQL,
    "tpch_q14": Q14_SQL,
    "tpch_q15": Q15_SQL,
    "tpch_q17": Q17_SQL,
    "tpch_q18": Q18_SQL,
    "tpch_q22": Q22_SQL,
}
