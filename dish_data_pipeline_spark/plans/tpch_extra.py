"""Additional TPC-H-shape queries adapted to the available columns
(the testdata omits partsupp and several lineitem date columns, so
Q7/Q10/Q19/Q22 are adapted rather than verbatim — the JOIN/predicate
shapes are what matter for the engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dish_data_pipeline_spark.plans.common import (
    QueryDef,
    dsum,
    read,
    sql_dsum,
)


# --- Market-basket association rules -------------------------------
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: part pairs with support
    ≥ 3 co-orders, scored by confidence and lift — all exact
    rational arithmetic (BIGINT co-occurrence counts, single IEEE
    divisions), top-30 by (lift, pair) deterministic order. The
    pair fanout is per-basket C(k,2) with k ≤ the order's line
    count — bounded by basket size, never by catalog size (the
    same fanout contract as the co-fulfillment triangle count)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    li = read(spark, sf_dir, "lineitem")
    # consumed four times (pair self-join both sides, per-part support,
    # basket count) — persist so the scan+distinct runs once
    items = tracked_persist(
        li.select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("pa")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= 3)
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("supp")
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    sa = supp.select(F.col("l_partkey").alias("pa"),
                     F.col("supp").alias("supp_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"),
                     F.col("supp").alias("supp_b"))
    scored = (
        pairs.join(F.broadcast(sa), "pa")
        .join(F.broadcast(sb), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "support_ab",
            (F.col("support_ab").cast("double")
             / F.col("supp_a").cast("double")).alias("confidence"),
            (
                (F.col("support_ab") * F.col("n_orders")).cast("double")
                / (F.col("supp_a") * F.col("supp_b")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("pa"), F.asc("pb")
    ).limit(30)


SQL_BASKET_RULES = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS support_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
supp AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp
  FROM items GROUP BY 1),
nn AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
  FROM items)
SELECT pa, pb, support_ab,
       CAST(support_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE)
         AS confidence,
       CAST(support_ab * n_orders AS DOUBLE)
       / CAST(sa.supp * sb.supp AS DOUBLE) AS lift
FROM pairs JOIN supp sa ON sa.l_partkey = pa
JOIN supp sb ON sb.l_partkey = pb CROSS JOIN nn
ORDER BY lift DESC, pa ASC, pb ASC
LIMIT 30
"""


# --- Q7 shape: nation-pair trade volume by year -------------------
def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    n1 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


SQL_NATION_TRADE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""


# --- Q10 shape: returned-item revenue per customer, top 20 --------
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q19 shape: disjunctive OR-of-ANDs join predicates ------------
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DISJUNCTIVE_REVENUE = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
"""


# --- Q22 shape: above-average balances with no orders -------------
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    # Scalar subquery (exact decimal mean) as a broadcast cross join:
    # the 1-row aggregate stays in the lazy plan — no eager job at
    # query-construction time, no driver-side literal re-embedding.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    idle = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_nationkey") % 10).alias("cgroup")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
    )


SQL_IDLE_RICH_CUSTOMERS = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey % 10 AS cgroup,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       {sql_dsum('c_acctbal')} AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


# --- Q13 shape: customer order-count distribution -----------------
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join customers to their
    non-urgent orders, count orders per customer (keeping the
    zero-order customers the inner join would drop), then histogram
    the counts. Double aggregation over one shuffle chain; the
    second groupBy's key cardinality is tiny (max orders per
    customer), so the distribution agg is nearly free."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
"""


# --- Q14 shape: promotion revenue share ---------------------------
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of 1997 revenue from PROMO-type parts.
    One broadcast dim join + conditional aggregate; the percentage is
    one IEEE division of two decimal-exact sums (order-independent,
    so the value hash is partitioning-invariant)."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pt = read(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_pct"),
            dsum(rev).alias("total_revenue"),
        )
    )


SQL_PROMO_REVENUE = f"""
SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
       / {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS promo_pct,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
"""


# --- Q15 shape: top supplier(s) by period revenue -----------------
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers whose 1997-H1 revenue equals the
    maximum (the revenue-view + scalar-max-equality pattern). The
    per-supplier aggregate shuffles once; the scalar max comes back
    via a single-row broadcast cross join, not a driver collect."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    s = read(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["_mx"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


SQL_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-07-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
"""


# --- Q4 shape: EXISTS-gated order priority counts -----------------
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority where EXISTS a
    lineitem of the order shipped after the order date (the testdata
    lacks l_commitdate/l_receiptdate, so "late" is l_shipdate >
    o_orderdate — the correlated-EXISTS decorrelation shape is what
    matters). The EXISTS becomes a LEFT SEMI join whose condition
    references both sides; the equi key (orderkey) keeps it a hash
    semi-join, never a nested loop. Adapted from the reference's
    declared join surface (SURVEY §2.4)."""
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    gated = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return gated.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q12 shape: two-branch conditional aggregate over a join ------
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per group (l_returnflag standing in for the
    absent l_shipmode), count high-priority vs other-priority orders
    among 1997 shipments that left after the order date. The
    join + CASE-sum pair is the 2-branch conditional-agg pattern;
    counts are BIGINT-cast in the oracle (DuckDB SUM(int) is
    HUGEINT)."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_SHIPMODE_PRIORITY = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_returnflag
"""


# --- Q17 shape: correlated scalar average gate --------------------
def q_small_qty_avg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from Brand#23 lineitems whose
    quantity is below half that part's average quantity. The
    correlated scalar subquery decorrelates to a per-part aggregate
    joined back on partkey — both sides of the comparison use the
    dsum/count deterministic mean so the boundary predicate is
    bit-identical across engines. The brand part list and the
    per-part averages are both broadcast (dim-sized), so the big
    lineitem side never shuffles."""
    p = (
        read(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = read(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    avg_q = branded.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        branded.join(F.broadcast(avg_q), branded["l_partkey"] == avg_q["ap_partkey"])
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


SQL_SMALL_QTY_AVG_GATE = f"""
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.5 * ({sql_dsum('l2.l_quantity')} / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


# --- Q21 shape: EXISTS + NOT EXISTS multi-way anti-join -----------
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the SOLE
    returning supplier on a multi-supplier finalized order ("late" is
    l_returnflag = 'R' — the testdata lacks receipt/commit dates; the
    EXISTS / NOT EXISTS pair is the shape under test). EXISTS →
    LEFT SEMI on (same order, different supplier); NOT EXISTS →
    LEFT ANTI on (same order, different supplier, also returned).
    Both carry the orderkey equi-key so they plan as hash joins with
    residual conditions, never BNLJ. Supplier and nation are
    broadcast dims; the nation filter is applied before the
    self-joins so the probe side is small."""
    li = read(spark, sf_dir, "lineitem")
    o = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    n = (
        read(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    s = read(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == o["o_orderkey"], "left_semi")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_okey"), F.col("l_suppkey").alias("l2_skey")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_okey"), F.col("l_suppkey").alias("l3_skey"))
    )
    sole = (
        l1.join(
            l2,
            (l1["l_orderkey"] == l2["l2_okey"]) & (l1["l_suppkey"] != l2["l2_skey"]),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == l3["l3_okey"])
            & (F.col("l_suppkey") != l3["l3_skey"]),
            "left_anti",
        )
    )
    return (
        sole.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


SQL_WAITING_SUPPLIERS = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l1.l_orderkey
              AND o.o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- Q2 shape: min-cost supplier per part -------------------------
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD-type size-15 part, the
    supplier(s) achieving the minimum unit price (the testdata lacks
    partsupp, so unit price is derived from lineitem: exact-decimal
    sum of extendedprice over exact-decimal sum of quantity per
    (part, supplier) — one IEEE division, bit-identical in DuckDB).
    The correlated MIN subquery decorrelates to a per-part window
    min + equality filter: one shuffle on partkey, then broadcast
    dim joins (supplier, nation). Output is top-20 by account
    balance with full tiebreak. Shape cited from the reference's
    declared join surface (SURVEY §2.4); Q2's partsupp min-cost
    semantics re-expressed on the available star schema."""
    from pyspark.sql.window import Window

    p = (
        read(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size").isin(5, 15, 25, 35, 45)))
        .select("p_partkey")
    )
    li = read(spark, sf_dir, "lineitem")
    s = read(spark, sf_dir, "supplier")
    n = read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg((dsum(F.col("l_extendedprice")) / dsum(F.col("l_quantity"))).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        cost.withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .drop("_min_cost")
    )
    return (
        best.join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_acctbal", "s_name", "n_name", F.col("l_partkey").alias("p_partkey"), "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(20)
    )


SQL_MIN_COST_SUPPLIER = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         {sql_dsum('l_extendedprice')} / {sql_dsum('l_quantity')} AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size IN (5, 15, 25, 35, 45)
  GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS _min_cost
  FROM cost)
SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, unit_cost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE unit_cost = _min_cost
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 20
"""


# --- Q11 shape: important parts by value share --------------------
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value (from suppliers in
    the low-key nation group) exceeds a fixed fraction of the global
    total. The HAVING-over-global-scalar decorrelates to a 1-row
    aggregate broadcast back via cross join — the big side
    aggregates once on partkey and is filtered map-side against the
    broadcast scalar; no driver collect. The per-part aggregate is
    tracked_persist'd: it feeds BOTH the output branch and the
    global-total branch, and the scalar branch materializes under a
    separate broadcast job where exchange reuse does not apply —
    without the persist the full lineitem join+aggregate executes
    twice (observed in the executed plan)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    li = read(spark, sf_dir, "lineitem")
    s = (
        read(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 10)
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = tracked_persist(
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(dsum(value).alias("part_value"))
    )
    total = per_part.agg(dsum(F.col("part_value")).alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("_total"))
        .select("l_partkey", "part_value")
    )


SQL_IMPORTANT_PARTS = f"""
WITH per_part AS (
  SELECT l_partkey,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey < 10
  GROUP BY l_partkey)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > 0.001 * (SELECT {sql_dsum('part_value')} FROM per_part)
"""


# --- Q16 shape: supplier counts with NOT-IN exclusion -------------
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per (brand, type,
    size) for parts outside one brand/type family, excluding
    suppliers from a blocklist (negative account balance stands in
    for Q16's complaint-comment NOT IN subquery). The part-supplier
    relation comes from lineitem; the NOT IN becomes a broadcast
    LEFT ANTI join (100-row blocklist). Both dim joins are broadcast
    and applied BEFORE any exchange, and pair-dedup is left to the
    count-distinct aggregate itself — so the only wide exchange is
    the final group-by over the part-family-pruned rows (a separate
    upstream ``distinct()`` would shuffle the FULL lineitem pair set
    first). Top-20 with full tiebreak for a stable driver hash."""
    li = read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_s = (
        read(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad_s), li["l_suppkey"] == bad_s["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
        .limit(20)
    )


SQL_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON ps.l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 20
"""


# --- Q20 shape: nested-IN excess-shipment suppliers ---------------
def q_excess_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in the low-key nation group who
    shipped more than 150 units of 'small *' parts during 1997 (the
    partsupp availqty > half-shipped threshold becomes a shipped-
    quantity threshold — the nested IN (parts) -> agg -> IN
    (suppliers) chain is the shape under test). Chain plans as: part
    prefix filter broadcast into lineitem, one groupBy(suppkey)
    aggregate, threshold filter, then LEFT SEMI into the supplier
    dim — the semi probe side is the 1-row-per-supplier aggregate,
    never the raw lineitem."""
    p = (
        read(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("qty_shipped"))
        .filter(F.col("qty_shipped") > 150.0)
    )
    s = read(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 10)
    return (
        s.join(shipped, s["s_suppkey"] == shipped["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.asc("s_name"))
    )


SQL_EXCESS_SHIP_SUPPLIERS = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_nationkey < 10
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_suppkey
    HAVING {sql_dsum('l_quantity')} > 150.0)
ORDER BY s_name ASC
"""


# --- Pareto skyline: cheapest part at every size frontier ---------
def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of ``part`` on (retail price ↓, size ↑): the
    parts for which no other part is both cheaper-or-equal and
    larger-or-equal with one strict. Runs the distributed two-phase
    prefix-max skyline (:mod:`ops.skyline`) — groupBy-reduced
    candidates, range-partitioned parallel running max, P-row driver
    carry — while the oracle states dominance as a single ordered
    window scan, so the hash compare certifies the distributed
    decomposition against the sequential definition. No float
    arithmetic (comparisons only) — deterministic cross-engine."""
    from dish_data_pipeline_spark.ops.skyline import skyline_2d

    p = read(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return skyline_2d(
        p, "p_retailprice", "p_size", minimize_x=True, maximize_y=True
    )


SQL_PART_SKYLINE = """
WITH pts AS (
  SELECT p_partkey, p_size, p_retailprice FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
xa AS (
  SELECT p_retailprice AS x, MAX(p_size) AS ymax
  FROM pts GROUP BY p_retailprice),
run AS (
  SELECT x, ymax,
         MAX(ymax) OVER (ORDER BY x
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev
  FROM xa),
fx AS (SELECT x, ymax FROM run WHERE prev IS NULL OR ymax > prev)
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM pts p JOIN fx ON p.p_retailprice = fx.x AND p.p_size = fx.ymax
"""


TPCH_EXTRA_QUERIES: dict[str, QueryDef] = {
    "basket_rules": QueryDef(
        q_basket_rules, SQL_BASKET_RULES,
        "market-basket association rules (support/confidence/lift, "
        "basket-bounded pair fanout, exact rational scores)",
        ("join", "agg", "basket")),
    "part_skyline": QueryDef(
        q_part_skyline, SQL_PART_SKYLINE,
        "Pareto skyline (price vs size) via distributed prefix-max",
        ("window", "skyline", "topk")),
    "min_cost_supplier": QueryDef(
        q_min_cost_supplier, SQL_MIN_COST_SUPPLIER,
        "TPC-H Q2-shape per-part min-cost supplier", ("join", "window", "topk")),
    "important_parts": QueryDef(
        q_important_parts, SQL_IMPORTANT_PARTS,
        "TPC-H Q11-shape value share vs global scalar", ("join", "agg")),
    "supplier_part_counts": QueryDef(
        q_supplier_part_counts, SQL_SUPPLIER_PART_COUNTS,
        "TPC-H Q16-shape distinct-supplier counts with NOT IN", ("join", "agg", "topk")),
    "excess_ship_suppliers": QueryDef(
        q_excess_ship_suppliers, SQL_EXCESS_SHIP_SUPPLIERS,
        "TPC-H Q20-shape nested-IN shipment threshold", ("join", "agg")),
    "order_priority_check": QueryDef(
        q_order_priority_check, SQL_ORDER_PRIORITY_CHECK,
        "TPC-H Q4-shape correlated EXISTS via semi-join", ("join", "agg")),
    "shipmode_priority": QueryDef(
        q_shipmode_priority, SQL_SHIPMODE_PRIORITY,
        "TPC-H Q12-shape two-branch conditional aggregate", ("join", "agg")),
    "small_qty_avg_gate": QueryDef(
        q_small_qty_avg_gate, SQL_SMALL_QTY_AVG_GATE,
        "TPC-H Q17-shape correlated scalar avg gate", ("join", "agg")),
    "waiting_suppliers": QueryDef(
        q_waiting_suppliers, SQL_WAITING_SUPPLIERS,
        "TPC-H Q21-shape EXISTS + NOT EXISTS anti-join", ("join", "agg", "topk")),
    "promo_revenue": QueryDef(
        q_promo_revenue, SQL_PROMO_REVENUE,
        "TPC-H Q14-shape promotion revenue share", ("join", "agg")),
    "top_supplier": QueryDef(
        q_top_supplier, SQL_TOP_SUPPLIER,
        "TPC-H Q15-shape max-revenue supplier via scalar subquery", ("join", "agg")),
    "customer_distribution": QueryDef(
        q_customer_distribution, SQL_CUSTOMER_DISTRIBUTION,
        "TPC-H Q13-shape left-join order-count histogram", ("join", "agg")),
    "nation_trade": QueryDef(
        q_nation_trade, SQL_NATION_TRADE,
        "TPC-H Q7-shape nation-pair volume by year", ("join", "agg")),
    "returned_items": QueryDef(
        q_returned_items, SQL_RETURNED_ITEMS,
        "TPC-H Q10-shape returned-item revenue top-20", ("join", "topk")),
    "disjunctive_revenue": QueryDef(
        q_disjunctive_revenue, SQL_DISJUNCTIVE_REVENUE,
        "TPC-H Q19-shape OR-of-ANDs predicates", ("join", "agg")),
    "idle_rich_customers": QueryDef(
        q_idle_rich_customers, SQL_IDLE_RICH_CUSTOMERS,
        "TPC-H Q22-shape scalar subquery + anti-join (no urgent orders)", ("join", "agg")),
}
