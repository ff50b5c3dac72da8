"""Synthesized TPC-H extension tables + the remaining 11 queries.

The driver corpus (`/root/testdata/sf*`) is TPC-H-shaped but lacks
`partsupp` and several columns (l_commitdate, l_receiptdate,
l_shipmode, l_shipinstruct, p_mfgr, p_container, s_address/s_phone/
s_comment, o_comment).  `ensure_ext(sf_dir)` deterministically
synthesizes them FROM the base tables (hash-derived values keyed on
primary keys, TPC-H-spec shapes — e.g. partsupp's 4 suppliers per
part use the spec's stride formula, dbgen `PS_SUPPKEY`), writing
parquet next to the repo (never into the read-only corpus) and
regenerating when the base files change.  Both Spark and the DuckDB
oracle then read the SAME files, so the comparison stays engine-only.

With those tables every remaining TPC-H query becomes expressible;
together with `tpch.py` the suite covers all 22.  Correlated
subqueries (Q2 min-cost, Q17 avg-qty, Q20 half-sum, Q21 exists/
not-exists) decorrelate into groupby+join — the plan Catalyst
produces for the SQL form as well.  Reference parity: the reference
ships TPC-H-style joins in its showcases; this file cites query
numbers from the public TPC-H spec rather than reference files.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

import pathway_spark as pw
from pathway_spark import reducers as R, this

EXT_TABLES = ("partsupp", "lineitem", "part", "supplier", "orders")

_CONTAINERS = [f"{a} {b}" for a in ("SM", "MED", "LG", "JUMBO", "WRAP")
               for b in ("CASE", "BOX", "BAG", "JAR", "PKG", "PACK",
                         "CAN", "DRUM")]
_SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
_INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
             "TAKE BACK RETURN"]


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def ext_dir(sf_dir: str) -> str:
    import hashlib

    # key by basename AND a path hash: two corpora that share a
    # directory name (sf0.1 under different roots) must not alternate
    # over one cache dir
    ap = os.path.abspath(os.path.normpath(sf_dir))
    name = (os.path.basename(ap) or "sf") + "-" + \
        hashlib.sha1(ap.encode()).hexdigest()[:8]
    return os.path.join(_repo_root(), ".tpch_ext", name)


def _src_sig(sf_dir: str) -> dict:
    sig = {}
    for t in ("part", "supplier", "lineitem", "orders"):
        p = f"{sf_dir}/{t}.parquet"
        st = os.stat(p)
        sig[t] = [st.st_size, int(st.st_mtime)]
    return sig


def ensure_ext(sf_dir: str) -> str:
    """Generate (or reuse) the extension tables for one corpus dir.

    All synthesis is single-pass DuckDB SQL over the base parquet —
    at sf0.1 (600k lineitem) it runs in ~1 s and only ever runs when
    the base files change, so tests and bench stay hermetic."""
    out = ext_dir(sf_dir)
    meta = os.path.join(out, "_gen_meta.json")
    sig = _src_sig(sf_dir)
    if os.path.isfile(meta):
        try:
            if json.load(open(meta)) == sig:
                return out
        except Exception:
            pass
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    q = con.execute
    for t in ("part", "supplier", "lineitem", "orders"):
        # <table>.parquet may be a single file (driver testdata) or a
        # directory of part files (the scaled corpora written by
        # scripts/r11_scale.py) — DuckDB needs a glob for the latter
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        q(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    # partsupp: 4 suppliers per part via the dbgen stride formula;
    # availqty/supplycost hash-derived from the composite key
    q(f"""
    COPY (
      WITH s AS (SELECT count(*)::BIGINT AS ns,
                        min(s_suppkey)::BIGINT AS s0 FROM supplier)
      SELECT p.p_partkey AS ps_partkey,
             ((p.p_partkey + i.i * greatest(1, s.ns // 4)) % s.ns) + s.s0
               AS ps_suppkey,
             1 + (hash(p.p_partkey * 7 + i.i) % 9999)::INT AS ps_availqty,
             round(1.0 + (hash(p.p_partkey * 13 + i.i * 31) % 99900)
                   / 100.0, 2)::DOUBLE AS ps_supplycost
      FROM part p, s, (SELECT unnest([0, 1, 2, 3]) AS i) i
      ORDER BY ps_partkey, ps_suppkey
    ) TO '{out}/partsupp.parquet' (FORMAT PARQUET)
    """)

    # lineitem + commit/receipt dates and ship mode/instruct
    q(f"""
    COPY (
      SELECT l.*,
             l_shipdate + INTERVAL (
               (hash(l_orderkey * 3 + l_linenumber) % 61)::INT - 30) DAY
               AS l_commitdate,
             l_shipdate + INTERVAL (
               1 + (hash(l_orderkey * 5 + l_linenumber * 11) % 30)::INT) DAY
               AS l_receiptdate,
             {_SHIPMODES!r}
               [1 + (hash(l_orderkey * 17 + l_linenumber) % 7)::INT]
               AS l_shipmode,
             {_INSTRUCT!r}
               [1 + (hash(l_orderkey * 23 + l_linenumber * 7) % 4)::INT]
               AS l_shipinstruct
      FROM lineitem l
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)

    q(f"""
    COPY (
      SELECT p.*,
             'Manufacturer#' || (1 + (hash(p_partkey * 29) % 5)::INT)
               AS p_mfgr,
             {_CONTAINERS!r}[1 + (hash(p_partkey * 37) % 40)::INT]
               AS p_container
      FROM part p
    ) TO '{out}/part.parquet' (FORMAT PARQUET)
    """)

    q(f"""
    COPY (
      SELECT s.*,
             'address_' || s_suppkey AS s_address,
             (11 + s_nationkey) || '-' ||
               lpad(((hash(s_suppkey * 41) % 900) + 100)::VARCHAR, 3, '0')
               || '-' ||
               lpad(((hash(s_suppkey * 43) % 9000) + 1000)::VARCHAR, 4, '0')
               AS s_phone,
             CASE WHEN hash(s_suppkey * 47) % 10 = 0
                  THEN 'wake Customer slyly final Complaints nag'
                  ELSE 'carefully regular comment ' ||
                       (hash(s_suppkey * 53) % 1000) END AS s_comment
      FROM supplier s
    ) TO '{out}/supplier.parquet' (FORMAT PARQUET)
    """)

    q(f"""
    COPY (
      SELECT o.*,
             CASE WHEN hash(o_orderkey * 59) % 10 = 0
                  THEN 'dogged special foxes among requests detect'
                  ELSE 'blithely ironic comment ' ||
                       (hash(o_orderkey * 61) % 1000) END AS o_comment
      FROM orders o
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.close()
    with open(meta, "w") as f:
        json.dump(sig, f)
    return out


def _t(spark, sf: str, name: str) -> "pw.Table":
    """Read a table, preferring the extension variant when one exists."""
    base = ensure_ext(sf) if name in EXT_TABLES else sf
    return pw.io.parquet.read(f"{base}/{name}.parquet", spark=spark)


def _semi(left: "pw.Table", right: "pw.Table", lkey: str, rkey: str,
          *, anti: bool = False) -> "pw.Table":
    """Column-keyed semi/anti join (EXISTS / NOT EXISTS decorrelation).
    Plans as a Spark left_semi/left_anti hash join on the key only."""
    from pathway_spark.table import Table
    r = right._df.select(F.col(rkey).alias(lkey)).distinct()
    how = "left_anti" if anti else "left_semi"
    return Table(left._df.join(r, on=[lkey], how=how))


def _contains(ref, sub: str):
    """LIKE '%sub%' on a column ref (str.find >= 0)."""
    return ref.str.find(sub) >= 0


def _dec(price_ref, disc_ref):
    price = pw.cast(T.DecimalType(12, 2), price_ref)
    disc = pw.cast(T.DecimalType(4, 2), disc_ref)
    return price * (1 - disc)


# --------------------------------------------------------------- Q2
def q2_min_cost_supplier(spark, sf):
    """TPC-H Q2 (adapted: p_type equality on the corpus's categorical
    types).  The correlated min-cost subquery decorrelates into a
    per-part min over the EUROPE-filtered partsupp, joined back —
    the same plan DuckDB builds for the SQL form."""
    region = _t(spark, sf, "region").filter(this.r_name == "EUROPE")
    nation = _t(spark, sf, "nation").join(
        region, pw.left.n_regionkey == pw.right.r_regionkey).select(
        this.n_nationkey, this.n_name)
    supp = _t(spark, sf, "supplier").join(
        nation, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey, this.s_acctbal, this.s_name, this.s_address,
        this.s_phone, this.s_comment, pw.right.n_name)
    part = _t(spark, sf, "part").filter(
        (this.p_size <= 15) & (this.p_type == "ECONOMY")).select(
        this.p_partkey, this.p_mfgr)
    ps = _t(spark, sf, "partsupp").join(
        supp, pw.left.ps_suppkey == pw.right.s_suppkey).select(
        this.ps_partkey, this.ps_supplycost, this.s_acctbal, this.s_name,
        this.s_address, this.s_phone, this.s_comment, this.n_name)
    ps = ps.join(part, pw.left.ps_partkey == pw.right.p_partkey).select(
        this.ps_partkey, this.ps_supplycost, this.s_acctbal, this.s_name,
        this.s_address, this.s_phone, this.s_comment, this.n_name,
        pw.right.p_mfgr)
    mins = ps.groupby(this.ps_partkey).reduce(
        ps_partkey=this.ps_partkey,
        min_cost=R.min(this.ps_supplycost))
    best = ps.join(mins, (pw.left.ps_partkey == pw.right.ps_partkey)
                   & (pw.left.ps_supplycost == pw.right.min_cost))
    return best.select(
        s_acctbal=pw.left.s_acctbal, s_name=pw.left.s_name,
        n_name=pw.left.n_name, p_partkey=pw.left.ps_partkey,
        p_mfgr=pw.left.p_mfgr, s_address=pw.left.s_address,
        s_phone=pw.left.s_phone, s_comment=pw.left.s_comment)


Q2_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone,
       s_comment
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size <= 15 AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost) FROM partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE')
"""


# --------------------------------------------------------------- Q4
def q4_order_priority(spark, sf):
    """TPC-H Q4: order-priority checking (EXISTS → semi-join)."""
    late = _t(spark, sf, "lineitem").filter(
        this.l_commitdate < this.l_receiptdate)
    o = _t(spark, sf, "orders").filter(
        (this.o_orderdate >= dt.datetime(1996, 7, 1))
        & (this.o_orderdate < dt.datetime(1996, 10, 1)))
    o = _semi(o, late, "o_orderkey", "l_orderkey")
    return o.groupby(this.o_orderpriority).reduce(
        o_orderpriority=this.o_orderpriority,
        order_count=R.count())


Q4_SQL = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------- Q5
def q5_local_supplier_volume(spark, sf):
    """TPC-H Q5: local supplier volume (full form — customer and
    supplier in the SAME nation; the q66 driver gate carries the
    relaxed shape)."""
    region = _t(spark, sf, "region").filter(this.r_name == "ASIA")
    nation = _t(spark, sf, "nation").join(
        region, pw.left.n_regionkey == pw.right.r_regionkey).select(
        this.n_nationkey, this.n_name)
    c = _t(spark, sf, "customer").join(
        nation, pw.left.c_nationkey == pw.right.n_nationkey).select(
        this.c_custkey, this.c_nationkey, this.n_name)
    o = _t(spark, sf, "orders").filter(
        (this.o_orderdate >= dt.datetime(1996, 1, 1))
        & (this.o_orderdate < dt.datetime(1997, 1, 1)))
    co = o.join(c, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.c_nationkey, this.n_name)
    s = _t(spark, sf, "supplier").select(
        this.s_suppkey, this.s_nationkey)
    li = _t(spark, sf, "lineitem").select(
        this.l_orderkey, this.l_suppkey, this.l_extendedprice,
        this.l_discount)
    j = li.join(co, pw.left.l_orderkey == pw.right.o_orderkey).select(
        this.l_suppkey, this.l_extendedprice, this.l_discount,
        this.c_nationkey, this.n_name)
    j = j.join(s, (pw.left.l_suppkey == pw.right.s_suppkey)
               & (pw.left.c_nationkey == pw.right.s_nationkey))
    return j.groupby(this.n_name).reduce(
        n_name=this.n_name,
        revenue=R.sum(_dec(this.l_extendedprice, this.l_discount)))


Q5_SQL = """
SELECT n_name,
       SUM(l_extendedprice::DECIMAL(12,2)
           * (1 - l_discount::DECIMAL(4,2))) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------- Q9
def q9_product_type_profit(spark, sf):
    """TPC-H Q9: product-type profit (p_name like surrogate)."""
    p = _t(spark, sf, "part").filter(
        _contains(this.p_name, "widget")).select(this.p_partkey)
    s = _t(spark, sf, "supplier").select(this.s_suppkey, this.s_nationkey)
    n = _t(spark, sf, "nation").select(this.n_nationkey, this.n_name)
    ps = _t(spark, sf, "partsupp").select(
        this.ps_partkey, this.ps_suppkey, this.ps_supplycost)
    o = _t(spark, sf, "orders").select(this.o_orderkey, this.o_orderdate)
    li = _t(spark, sf, "lineitem").select(
        this.l_orderkey, this.l_partkey, this.l_suppkey, this.l_quantity,
        this.l_extendedprice, this.l_discount)
    j = li.join(p, pw.left.l_partkey == pw.right.p_partkey).select(
        pw.left.l_orderkey, pw.left.l_partkey, pw.left.l_suppkey,
        pw.left.l_quantity, pw.left.l_extendedprice, pw.left.l_discount)
    j = j.join(ps, (pw.left.l_partkey == pw.right.ps_partkey)
               & (pw.left.l_suppkey == pw.right.ps_suppkey)).select(
        pw.left.l_orderkey, pw.left.l_suppkey, pw.left.l_quantity,
        pw.left.l_extendedprice, pw.left.l_discount,
        pw.right.ps_supplycost)
    j = j.join(s, pw.left.l_suppkey == pw.right.s_suppkey).select(
        this.l_orderkey, this.l_quantity, this.l_extendedprice,
        this.l_discount, this.ps_supplycost, pw.right.s_nationkey)
    j = j.join(n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.l_orderkey, this.l_quantity, this.l_extendedprice,
        this.l_discount, this.ps_supplycost, pw.right.n_name)
    j = j.join(o, pw.left.l_orderkey == pw.right.o_orderkey).select(
        this.l_quantity, this.l_extendedprice, this.l_discount,
        this.ps_supplycost, this.n_name, o_year=pw.right.o_orderdate.dt.year())
    price = pw.cast(T.DecimalType(12, 2), this.l_extendedprice)
    disc = pw.cast(T.DecimalType(4, 2), this.l_discount)
    cost = pw.cast(T.DecimalType(12, 2), this.ps_supplycost)
    qty = pw.cast(T.DecimalType(12, 2), this.l_quantity)
    return j.groupby(this.n_name, this.o_year).reduce(
        nation=this.n_name, o_year=this.o_year,
        sum_profit=R.sum(price * (1 - disc) - cost * qty))


Q9_SQL = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate)::INT AS o_year,
       SUM(l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(4,2))
           - ps_supplycost::DECIMAL(12,2) * l_quantity::DECIMAL(12,2))
         AS sum_profit
FROM part, supplier, lineitem, partsupp, orders, nation
WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
  AND ps_partkey = l_partkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# --------------------------------------------------------------- Q11
def q11_important_stock(spark, sf):
    """TPC-H Q11: important stock identification (HAVING over a
    global-scalar threshold → cross-join of the one-row total)."""
    n = _t(spark, sf, "nation").filter(this.n_name == "NATION_3").select(
        this.n_nationkey)
    s = _t(spark, sf, "supplier").join(
        n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey)
    ps = _t(spark, sf, "partsupp").join(
        s, pw.left.ps_suppkey == pw.right.s_suppkey).select(
        this.ps_partkey,
        value=pw.cast(T.DecimalType(12, 2), this.ps_supplycost)
        * pw.cast(T.DecimalType(12, 2), this.ps_availqty))
    per_part = ps.groupby(this.ps_partkey).reduce(
        ps_partkey=this.ps_partkey, part_value=R.sum(this.value))
    total = ps.reduce(total_value=R.sum(this.value))
    joined = per_part.join(total).select(
        ps_partkey=pw.left.ps_partkey, part_value=pw.left.part_value,
        total_value=pw.right.total_value)
    return joined.filter(
        this.part_value > pw.cast(T.DecimalType(24, 6),
                                  this.total_value * 0.001)).select(
        ps_partkey=this.ps_partkey, part_value=this.part_value)


Q11_SQL = """
SELECT ps_partkey,
       SUM(ps_supplycost::DECIMAL(12,2) * ps_availqty::DECIMAL(12,2))
         AS part_value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost::DECIMAL(12,2) * ps_availqty::DECIMAL(12,2)) > (
  SELECT (SUM(ps_supplycost::DECIMAL(12,2) * ps_availqty::DECIMAL(12,2))
          * 0.001)::DECIMAL(24,6)
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_3')
"""


# --------------------------------------------------------------- Q12
def q12_shipping_modes(spark, sf):
    """TPC-H Q12: shipping modes and order priority."""
    li = _t(spark, sf, "lineitem").filter(
        ((this.l_shipmode == "MAIL") | (this.l_shipmode == "SHIP"))
        & (this.l_commitdate < this.l_receiptdate)
        & (this.l_shipdate < this.l_commitdate)
        & (this.l_receiptdate >= dt.datetime(1996, 1, 1))
        & (this.l_receiptdate < dt.datetime(1997, 1, 1))).select(
        this.l_orderkey, this.l_shipmode)
    o = _t(spark, sf, "orders").select(this.o_orderkey, this.o_orderpriority)
    j = li.join(o, pw.left.l_orderkey == pw.right.o_orderkey)
    is_high = pw.if_else(
        (this.o_orderpriority == "1-URGENT")
        | (this.o_orderpriority == "2-HIGH"), 1, 0)
    return j.groupby(this.l_shipmode).reduce(
        l_shipmode=this.l_shipmode,
        high_line_count=R.sum(is_high),
        low_line_count=R.sum(1 - is_high))


Q12_SQL = """
SELECT l_shipmode,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL','SHIP')
  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
  AND l_receiptdate >= TIMESTAMP '1996-01-01'
  AND l_receiptdate < TIMESTAMP '1997-01-01'
GROUP BY l_shipmode
"""


# --------------------------------------------------------------- Q13
def q13_customer_distribution(spark, sf):
    """TPC-H Q13: customer order-count distribution (left join with a
    filtered build side; two-level aggregation)."""
    o = _t(spark, sf, "orders").filter(
        ~(_contains(this.o_comment, "special")
          & (this.o_comment.str.rfind("requests")
             > this.o_comment.str.find("special")))).select(
        this.o_orderkey, this.o_custkey)
    c = _t(spark, sf, "customer").select(this.c_custkey)
    j = c.join_left(o, pw.left.c_custkey == pw.right.o_custkey).select(
        this.c_custkey, pw.right.o_orderkey)
    per_cust = j.groupby(this.c_custkey).reduce(
        c_custkey=this.c_custkey,
        c_count=R.count(this.o_orderkey))
    return per_cust.groupby(this.c_count).reduce(
        c_count=this.c_count, custdist=R.count())


Q13_SQL = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
       AND o_comment NOT LIKE '%special%requests%'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
"""


# --------------------------------------------------------------- Q16
def q16_part_supplier_relation(spark, sf):
    """TPC-H Q16: parts/supplier relationship (NOT EXISTS → anti-join,
    count_distinct suppliers)."""
    bad_supp = _t(spark, sf, "supplier").filter(
        _contains(this.s_comment, "Customer")
        & (this.s_comment.str.rfind("Complaints")
           > this.s_comment.str.find("Customer"))).select(this.s_suppkey)
    p = _t(spark, sf, "part").filter(
        (this.p_brand != "Brand#1") & (this.p_type != "PROMO")
        & ((this.p_size == 1) | (this.p_size == 4) | (this.p_size == 7)
           | (this.p_size == 10) | (this.p_size == 13) | (this.p_size == 16)
           | (this.p_size == 19) | (this.p_size == 22))).select(
        this.p_partkey, this.p_brand, this.p_type, this.p_size)
    ps = _t(spark, sf, "partsupp").select(this.ps_partkey, this.ps_suppkey)
    ps = _semi(ps, bad_supp, "ps_suppkey", "s_suppkey", anti=True)
    j = ps.join(p, pw.left.ps_partkey == pw.right.p_partkey)
    return j.groupby(this.p_brand, this.p_type, this.p_size).reduce(
        p_brand=this.p_brand, p_type=this.p_type, p_size=this.p_size,
        supplier_cnt=R.count_distinct(this.ps_suppkey))


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE s_comment LIKE '%Customer%Complaints%')
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------- Q19
def q19_discounted_revenue(spark, sf):
    """TPC-H Q19: discounted revenue (disjunctive multi-attribute
    predicate — one scan, no join explosion: the part join key is
    shared by all three branches)."""
    li = _t(spark, sf, "lineitem").filter(
        ((this.l_shipmode == "AIR") | (this.l_shipmode == "REG AIR"))
        & (this.l_shipinstruct == "DELIVER IN PERSON")).select(
        this.l_partkey, this.l_quantity, this.l_extendedprice,
        this.l_discount)
    p = _t(spark, sf, "part").select(
        this.p_partkey, this.p_brand, this.p_container, this.p_size)
    j = li.join(p, pw.left.l_partkey == pw.right.p_partkey).select(
        pw.left.l_quantity, pw.left.l_extendedprice, pw.left.l_discount,
        pw.right.p_brand, pw.right.p_container, pw.right.p_size)

    def branch(brand, containers, qlo, qhi, smax):
        cont = None
        for c in containers:
            e = this.p_container == c
            cont = e if cont is None else (cont | e)
        return ((this.p_brand == brand) & cont
                & (this.l_quantity >= qlo) & (this.l_quantity <= qhi)
                & (this.p_size >= 1) & (this.p_size <= smax))

    sm = [f"SM {b}" for b in ("CASE", "BOX", "BAG", "JAR", "PKG",
                              "PACK", "CAN", "DRUM")]
    med = [c.replace("SM", "MED") for c in sm]
    lg = [c.replace("SM", "LG") for c in sm]
    cond = (branch("Brand#1", sm, 1, 30, 15)
            | branch("Brand#13", med, 5, 35, 25)
            | branch("Brand#20", lg, 10, 40, 40))
    return j.filter(cond).reduce(
        revenue=R.sum(_dec(this.l_extendedprice, this.l_discount)))


Q19_SQL = """
SELECT SUM(l_extendedprice::DECIMAL(12,2)
           * (1 - l_discount::DECIMAL(4,2))) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND l_shipmode IN ('AIR','REG AIR')
  AND l_shipinstruct = 'DELIVER IN PERSON'
  AND ((p_brand = 'Brand#1' AND p_container LIKE 'SM %'
        AND l_quantity BETWEEN 1 AND 30 AND p_size BETWEEN 1 AND 15)
    OR (p_brand = 'Brand#13' AND p_container LIKE 'MED %'
        AND l_quantity BETWEEN 5 AND 35 AND p_size BETWEEN 1 AND 25)
    OR (p_brand = 'Brand#20' AND p_container LIKE 'LG %'
        AND l_quantity BETWEEN 10 AND 40 AND p_size BETWEEN 1 AND 40))
"""


# --------------------------------------------------------------- Q20
def q20_potential_promotion(spark, sf):
    """TPC-H Q20: potential part promotion (half-sum correlated
    subquery → per-(part,supp) shipped-quantity aggregate joined to
    partsupp)."""
    shipped = _t(spark, sf, "lineitem").filter(
        (this.l_shipdate >= dt.datetime(1996, 1, 1))
        & (this.l_shipdate < dt.datetime(1997, 1, 1))).groupby(
        this.l_partkey, this.l_suppkey).reduce(
        l_partkey=this.l_partkey, l_suppkey=this.l_suppkey,
        half_qty=R.sum(this.l_quantity) * 0.5)
    p = _t(spark, sf, "part").filter(
        this.p_name.str.startswith("small")).select(this.p_partkey)
    ps = _t(spark, sf, "partsupp").select(
        this.ps_partkey, this.ps_suppkey, this.ps_availqty)
    ps = _semi(ps, p, "ps_partkey", "p_partkey")
    j = ps.join(shipped, (pw.left.ps_partkey == pw.right.l_partkey)
                & (pw.left.ps_suppkey == pw.right.l_suppkey)).filter(
        this.ps_availqty > this.half_qty).select(this.ps_suppkey)
    n = _t(spark, sf, "nation").filter(this.n_name == "NATION_3").select(
        this.n_nationkey)
    s = _t(spark, sf, "supplier").join(
        n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey, this.s_name, this.s_address)
    return _semi(s, j, "s_suppkey", "ps_suppkey").select(
        s_name=this.s_name, s_address=this.s_address)


Q20_SQL = """
SELECT s_name, s_address
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 0.5 * SUM(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
"""


# --------------------------------------------------------------- Q21
def q21_suppliers_waiting(spark, sf):
    """TPC-H Q21: suppliers who kept orders waiting.  The exists /
    not-exists pair decorrelates into one per-order aggregate —
    (#distinct suppliers, #distinct LATE suppliers) — a supplier's
    late line qualifies iff the order has >1 supplier and exactly one
    late supplier (itself).  One shuffle on l_orderkey."""
    li = _t(spark, sf, "lineitem").select(
        this.l_orderkey, this.l_suppkey,
        late=pw.if_else(this.l_receiptdate > this.l_commitdate,
                        this.l_suppkey, pw.cast(T.LongType(), None)))
    o = _t(spark, sf, "orders").filter(
        this.o_orderstatus == "F").select(this.o_orderkey)
    li = _semi(li, o, "l_orderkey", "o_orderkey")
    per_order = li.groupby(this.l_orderkey).reduce(
        l_orderkey=this.l_orderkey,
        n_supp=R.count_distinct(this.l_suppkey),
        n_late=R.count_distinct(this.late))
    one_late = per_order.filter(
        (this.n_supp > 1) & (this.n_late == 1)).select(this.l_orderkey)
    late_lines = _t(spark, sf, "lineitem").filter(
        this.l_receiptdate > this.l_commitdate).select(
        this.l_orderkey, this.l_suppkey)
    late_lines = late_lines.join(
        one_late, pw.left.l_orderkey == pw.right.l_orderkey).select(
        pw.left.l_orderkey, pw.left.l_suppkey)
    # distinct (orderkey, suppkey): several late lines of one supplier
    # on one order count once (the SQL counts l1 rows — keep parity
    # with the oracle below, which also dedups)
    pairs = late_lines.groupby(this.l_orderkey, this.l_suppkey).reduce(
        l_orderkey=this.l_orderkey, l_suppkey=this.l_suppkey)
    n = _t(spark, sf, "nation").filter(this.n_name == "NATION_3").select(
        this.n_nationkey)
    s = _t(spark, sf, "supplier").join(
        n, pw.left.s_nationkey == pw.right.n_nationkey).select(
        this.s_suppkey, this.s_name)
    j = pairs.join(s, pw.left.l_suppkey == pw.right.s_suppkey)
    return j.groupby(this.s_name).reduce(
        s_name=this.s_name, numwait=R.count())


Q21_SQL = """
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1, orders
  WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    AND l1.l_receiptdate > l1.l_commitdate
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_receiptdate > l3.l_commitdate)
) waiting, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY s_name
"""


QUERIES = {
    "tpch_q2": q2_min_cost_supplier,
    "tpch_q4": q4_order_priority,
    "tpch_q5": q5_local_supplier_volume,
    "tpch_q9": q9_product_type_profit,
    "tpch_q11": q11_important_stock,
    "tpch_q12": q12_shipping_modes,
    "tpch_q13": q13_customer_distribution,
    "tpch_q16": q16_part_supplier_relation,
    "tpch_q19": q19_discounted_revenue,
    "tpch_q20": q20_potential_promotion,
    "tpch_q21": q21_suppliers_waiting,
}

ORACLE_SQL = {
    "tpch_q2": Q2_SQL,
    "tpch_q4": Q4_SQL,
    "tpch_q5": Q5_SQL,
    "tpch_q9": Q9_SQL,
    "tpch_q11": Q11_SQL,
    "tpch_q12": Q12_SQL,
    "tpch_q13": Q13_SQL,
    "tpch_q16": Q16_SQL,
    "tpch_q19": Q19_SQL,
    "tpch_q20": Q20_SQL,
    "tpch_q21": Q21_SQL,
}
