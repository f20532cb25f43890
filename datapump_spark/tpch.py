"""TPC-H-shape relational pack, adapted to the driver's star schema.

The driver testdata is a TPC-H *subset* (no partsupp; no shipmode /
commitdate / receiptdate / phone columns), so each query keeps the published
query's *shape* — the join topology, subquery pattern, and aggregate
structure that exercise the optimizer — re-keyed to the columns that exist.
Together with q_pricing_summary (Q1), q_ship_priority (Q3), q_region_volume
(Q5) and q_promo_revenue (Q14) in queries.py, this covers the join/subquery
surface of ALL 22 TPC-H query shapes (Q20's partsupp correlate is re-keyed
to shipped quantities — see q_dominant_suppliers).

Scale notes (100 TB): every dim join below broadcasts (region/nation/
supplier/part are tiny relative to facts at any SF); fact-fact joins
(lineitem⋈orders) shuffle on the shared orderkey so AQE can coalesce; all
correlated subqueries are re-expressed as aggregate-then-join (one shuffle,
no per-row probing); scalar subqueries (Q11/Q15/Q17/Q22 shapes) become
single-row broadcast cross-joins, never driver collects.

Float determinism follows the queries.py policy: money sums go through
DECIMAL(18,6) so partial-aggregation order can't change the double the
driver hashes; ratios round to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dec_sum(col_expr, alias: str):
    """Exact, order-independent double aggregation (queries.py policy)."""
    return F.sum(col_expr.cast("decimal(18,6)")).cast("double").alias(alias)


_DEC_SUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def _sql_dec_sum(expr: str, alias: str) -> str:
    return _DEC_SUM.format(expr=expr) + f" AS {alias}"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


def _loader(sf_dir: str):
    # Local import: queries.py imports this module for the registry, and _t
    # carries the timestamp-drift normalization every query must go through.
    from datapump_spark.queries import _t

    def t(spark: SparkSession, name: str) -> DataFrame:
        return _t(spark, sf_dir, name)

    return t


# --------------------------------------------------------------- Q2 shape
def q_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each LARGE/size-25 part,
    the EUROPE supplier with the lowest account balance among those who
    have shipped it. The reference's correlated MIN(ps_supplycost)
    subquery becomes a row_number over (part, acctbal, suppkey) — one
    window after one distinct, no per-part probing. partsupp does not
    exist in this schema; distinct lineitem (part, supp) pairs stand in
    for it. supplier/nation/region sides all broadcast."""
    t = _loader(sf_dir)
    p = t(spark, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") == 25))
    pairs = t(spark, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = (
        t(spark, "supplier")
        .join(F.broadcast(t(spark, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, "region").where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    j = (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                 F.asc("p_partkey"))
        .limit(100)
    )


_Q2_SQL = """
WITH europe_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM pairs
  JOIN part ON l_partkey = p_partkey
  JOIN europe_supp ON l_suppkey = s_suppkey
  WHERE p_type = 'LARGE' AND p_size = 25)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --------------------------------------------------------------- Q4 shape
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders from 1996-Q3 with
    at least one lineitem shipped >60 days after the order date, counted
    per priority. EXISTS becomes a left-semi join with the inequality in
    the join condition — the semi join short-circuits per order, and only
    orderkeys cross the shuffle."""
    t = _loader(sf_dir)
    o = t(spark, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01"))
    li = t(spark, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL '60' DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- Q6 shape
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate;
    every predicate (shipdate year, discount band, quantity cap) reaches
    the parquet scan as a pushed filter, and the aggregate is a map-side
    partial — the cheapest possible plan shape at any scale."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(_dec_sum(
        F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


_Q6_SQL = f"""
SELECT {_sql_dec_sum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------- Q7 shape
def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between NATION_1 and
    NATION_2 per ship year. Two broadcast copies of nation (supplier side
    and customer side); the nation-pair disjunction is applied after both
    joins so each side's filter stays a broadcast-hash probe."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    o = t(spark, "orders")
    c = t(spark, "customer")
    s = t(spark, "supplier")
    n1 = t(spark, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_dec_sum(_rev(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_sql_dec_sum(_REV_SQL, 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------- Q8 shape
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold into ASIA per order year. The share is a conditional
    aggregate over one joined frame — numerator and denominator in a
    single pass, both decimal-exact before the final rounded division."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem")
    o = t(spark, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    c = t(spark, "customer")
    s = t(spark, "supplier")
    p = t(spark, "part").where(F.col("p_type") == "ECONOMY")
    n1 = t(spark, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, "nation")
    r = t(spark, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev())
                .otherwise(F.lit(0.0)).cast("decimal(18,6)")).cast("double")
    den = F.sum(_rev().cast("decimal(18,6)")).cast("double")
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(
         CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_3'
                       THEN l_extendedprice * (1.0 - l_discount)
                       ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------- Q9 shape
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit per supplier nation per
    order year for parts named like '%gear%'. partsupp's supplycost does
    not exist here, so cost is modeled as 60% of p_retailprice per unit —
    same join topology (lineitem⋈orders⋈supplier⋈part⋈nation), same
    substring part filter, same two-level grouping."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem")
    o = t(spark, "orders")
    s = t(spark, "supplier")
    p = t(spark, "part").where(F.col("p_name").like("%gear%"))
    n = t(spark, "nation")
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dec_sum(profit, "sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_sql_dec_sum(
           'l_extendedprice * (1.0 - l_discount)'
           ' - 0.6 * p_retailprice * l_quantity', 'sum_profit')}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
ORDER BY nation ASC, o_year DESC
"""


# -------------------------------------------------------------- Q10 shape
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns ('R' lines) for 1996-Q4 orders. Grouping carries the
    customer attributes through the aggregate (no re-join for display
    columns); top-20 is TakeOrderedAndProject."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem").where(F.col("l_returnflag") == "R")
    o = t(spark, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    c = t(spark, "customer")
    n = t(spark, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_sql_dec_sum(_REV_SQL, 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# -------------------------------------------------------------- Q11 shape
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose traded
    value through NATION_5's suppliers exceeds 0.1% of that nation's
    total. The scalar HAVING subquery becomes a single-row broadcast
    cross-join of the same aggregate — the per-part frame is computed
    once and the threshold comparison is a map-side filter."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem")
    s = t(spark, "supplier")
    n = t(spark, "nation").where(F.col("n_name") == "NATION_5")
    base = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_part = base.groupBy(F.col("l_partkey").alias("part_key")).agg(
        _dec_sum(F.col("l_extendedprice"), "part_value"))
    total = base.agg(_dec_sum(F.col("l_extendedprice"), "total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("part_key", "part_value")
        .orderBy(F.desc("part_value"), F.asc("part_key"))
    )


_Q11_SQL = f"""
WITH base AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5')
SELECT l_partkey AS part_key,
       {_sql_dec_sum('l_extendedprice', 'part_value')}
FROM base
GROUP BY part_key
HAVING {_DEC_SUM.format(expr='l_extendedprice')} >
       0.001 * (SELECT {_DEC_SUM.format(expr='l_extendedprice')} FROM base)
ORDER BY part_value DESC, part_key ASC
"""


# -------------------------------------------------------------- Q12 shape
def q_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode / order-priority): 1997 lines shipped >90
    days after order date, split into high/low-priority counts. The
    schema has no l_shipmode, so l_returnflag is the grouping stand-in;
    the priority split is the same conditional-count pair."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    o = t(spark, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL '90' DAY"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -------------------------------------------------------------- Q13 shape
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer order
    counts, keeping zero-order customers via the left outer join. The
    order-side filter stands in for Q13's comment NOT LIKE. Two
    aggregations; the second one is tiny (distinct counts ≤ max orders
    per customer)."""
    t = _loader(sf_dir)
    c = t(spark, "customer")
    o = t(spark, "orders").where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -------------------------------------------------------------- Q15 shape
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with maximum 1997-Q1 revenue.
    The revenue view is computed once; MAX over it is a single-row
    broadcast cross-join (not a re-computation, not a collect). Revenue
    doubles come from exact decimal sums on both engines, so the equality
    join on the max cannot straddle a rounding difference."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dec_sum(_rev(), "total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, "supplier")
    return (
        rev.join(F.broadcast(mx),
                 F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_sql_dec_sum(_REV_SQL, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY supplier_no)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# -------------------------------------------------------------- Q16 shape
def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count
    per (brand, type, size) bucket, excluding negative-balance suppliers
    (the complaints NOT IN stand-in) — expressed as a broadcast anti
    join, not a per-row subquery. Shipment pairs from lineitem stand in
    for partsupp."""
    t = _loader(sf_dir)
    pairs = t(spark, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = t(spark, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t(spark, "part").where(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey,
                   "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
                 F.asc("p_size"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# -------------------------------------------------------------- Q17 shape
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue from
    Brand#3 lines below 20% of the part's average quantity. The
    correlated AVG subquery becomes aggregate-then-join on partkey (one
    pass over the filtered lines, reused for both sides). Quantities are
    integral doubles, so avg = exact-sum / count is bit-identical across
    engines and the 0.2× threshold cannot straddle."""
    t = _loader(sf_dir)
    p = t(spark, "part").where(F.col("p_brand") == "Brand#3")
    li = t(spark, "lineitem").join(F.broadcast(p),
                                   F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double") / 7.0, 6).alias("avg_yearly"))
    )


_Q17_SQL = """
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'),
avg_q AS (SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
          FROM brand_lines GROUP BY ak)
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM brand_lines JOIN avg_q ON l_partkey = ak
WHERE l_quantity < 0.2 * avg_qty
"""


# -------------------------------------------------------------- Q18 shape
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 150 units, with their customers. The IN-subquery on a HAVING
    aggregate becomes aggregate-then-inner-join on orderkey; quantity
    sums are integral doubles (exact on both engines)."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    o = t(spark, "orders")
    c = t(spark, "customer")
    return (
        big.join(o, F.col("bk") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"),
                 F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey AS bk, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY bk HAVING sum(l_quantity) > 150) big
JOIN orders   ON bk = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


# -------------------------------------------------------------- Q19 shape
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue over three OR'd
    brand/size/quantity envelopes — the classic disjunctive-predicate
    join. The whole predicate is one boolean column expression, so
    Catalyst can still extract l_partkey = p_partkey as the equi-join
    key and evaluate the disjunction as a post-join filter."""
    t = _loader(sf_dir)
    li = t(spark, "lineitem")
    p = t(spark, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.where(cond).agg(_dec_sum(_rev(), "revenue"))


_Q19_SQL = f"""
SELECT {_sql_dec_sum(_REV_SQL, 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# -------------------------------------------------------------- Q21 shape
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): per supplier, late
    lines (shipped >60 days after order date) on finalized multi-supplier
    orders where that supplier was the ONLY late one. The EXISTS /
    NOT EXISTS pair becomes a left-semi then left-anti join against the
    same order's other-supplier lines — both shuffle only on orderkey."""
    t = _loader(sf_dir)
    fo = t(spark, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate")
    li = t(spark, "lineitem").join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
    late = li.where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL '60' DAY"))
    all_other = li.select(F.col("l_orderkey").alias("ok"),
                          F.col("l_suppkey").alias("sk"))
    late_other = late.select(F.col("l_orderkey").alias("ok"),
                             F.col("l_suppkey").alias("sk"))
    l1 = late.join(
        all_other,
        (F.col("l_orderkey") == F.col("ok")) & (F.col("l_suppkey") != F.col("sk")),
        "left_semi",
    ).join(
        late_other,
        (F.col("l_orderkey") == F.col("ok")) & (F.col("l_suppkey") != F.col("sk")),
        "left_anti",
    )
    s = t(spark, "supplier")
    return (
        l1.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# -------------------------------------------------------------- Q20 shape
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: suppliers who are
    the DOMINANT shipper (>30% of total 1998 quantity) of some red part.
    The original's correlated ``ps_availqty > 0.5 × sum(l_quantity)``
    subquery (partsupp is absent from the driver schema) becomes the
    same nested-IN shape over shipped quantities: per-(part, supplier)
    aggregate, per-part aggregate DERIVED by re-aggregating the first
    (one scan of lineitem total), threshold join, then a semi join into
    supplier. Both aggregates shuffle on partkey only; part is a
    broadcast filter; no per-row correlated probing anywhere."""
    t = _loader(sf_dir)
    red = t(spark, "part").where(F.col("p_name").like("%red%")) \
        .select("p_partkey")
    li = (t(spark, "lineitem")
          .where((F.col("l_shipdate") >= "1998-01-01")
                 & (F.col("l_shipdate") < "1999-01-01"))
          .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey")))
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__sq"))
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("__sq").alias("__pq"))
    dom = (per_ps.join(per_p, "l_partkey")
           .where(F.col("__sq").cast("double")
                  > F.lit(0.3) * F.col("__pq").cast("double"))
           .select("l_suppkey").distinct())
    s = t(spark, "supplier")
    n = t(spark, "nation")
    return (
        s.join(dom, s.s_suppkey == dom.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 0.3 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
    FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l2.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'))
ORDER BY s_name
"""


# -------------------------------------------------------------- Q22 shape
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): per nation, customers whose
    balance beats the positive-balance average but who placed no orders
    from 1999 on. The scalar AVG subquery is a single-row broadcast
    cross-join; the NOT EXISTS is a left-anti join on custkey. The
    threshold is exact-decimal-sum / count on both engines, so the
    boundary set is identical."""
    t = _loader(sf_dir)
    c = t(spark, "customer")
    thr = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("avg_bal"))
    recent = t(spark, "orders").where(
        F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    n = t(spark, "nation")
    return (
        c.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             _dec_sum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("n_name")
    )


_Q22_SQL = f"""
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       {_sql_dec_sum('c_acctbal', 'totacctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                               AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""


TPCH_QUERIES = {
    "q_min_acctbal_supplier": q_min_acctbal_supplier,
    "q_late_order_priority": q_late_order_priority,
    "q_forecast_revenue": q_forecast_revenue,
    "q_nation_trade": q_nation_trade,
    "q_market_share": q_market_share,
    "q_product_profit": q_product_profit,
    "q_returned_items": q_returned_items,
    "q_important_parts": q_important_parts,
    "q_late_priority_lines": q_late_priority_lines,
    "q_customer_distribution": q_customer_distribution,
    "q_top_supplier": q_top_supplier,
    "q_parts_supplier_count": q_parts_supplier_count,
    "q_small_qty_revenue": q_small_qty_revenue,
    "q_big_orders": q_big_orders,
    "q_disjunctive_revenue": q_disjunctive_revenue,
    "q_dominant_suppliers": q_dominant_suppliers,
    "q_waiting_suppliers": q_waiting_suppliers,
    "q_idle_rich_customers": q_idle_rich_customers,
}

TPCH_ORACLES = {
    "q_min_acctbal_supplier": _Q2_SQL,
    "q_late_order_priority": _Q4_SQL,
    "q_forecast_revenue": _Q6_SQL,
    "q_nation_trade": _Q7_SQL,
    "q_market_share": _Q8_SQL,
    "q_product_profit": _Q9_SQL,
    "q_returned_items": _Q10_SQL,
    "q_important_parts": _Q11_SQL,
    "q_late_priority_lines": _Q12_SQL,
    "q_customer_distribution": _Q13_SQL,
    "q_top_supplier": _Q15_SQL,
    "q_parts_supplier_count": _Q16_SQL,
    "q_small_qty_revenue": _Q17_SQL,
    "q_big_orders": _Q18_SQL,
    "q_disjunctive_revenue": _Q19_SQL,
    "q_dominant_suppliers": _Q20_SQL,
    "q_waiting_suppliers": _Q21_SQL,
    "q_idle_rich_customers": _Q22_SQL,
}
