"""TPC-H-style multi-join analytics adapted to the fixture schema —
the classic plans every warehouse engine is judged on: selective
fact-dim joins, semi-aggregations, top-k. All oracle-checked.

Broadcast policy: F.broadcast() is a MANDATORY hint (Spark collects
the frame to the driver no matter its size), so it is reserved for
frames with a constant bound — nation/region (25/5 rows), scalar
aggregates, literal probe sets. TPC-H's customer/supplier/part grow
LINEARLY with scale factor (15B customers at the 100 TB design point),
so their joins carry no hint: AQE broadcasts them at runtime while
they fit and falls back to a shuffle join when they don't — the same
rule the fact-derived qualifier sets follow (q52/q63).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from synch_spark.plans.relational import DEC, _t, revenue_expr


# --- Q3-like: shipping priority (top revenue orders in a segment) -------
def q36_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(
        revenue_expr()
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
        .select("l_orderkey", F.col("o_orderdate").cast("date").alias("o_date"), "revenue")
    )


Q36_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 20
"""


# --- Q5-like: local supplier volume -------------------------------------
def q37_local_supplier_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = F.sum(
        revenue_expr()
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)  # local: same nation
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(rev.cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q37_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


# --- Q10-like: returned-item customer ranking ---------------------------
def q38_returned_customers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.sum(
        revenue_expr()
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q38_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# --- Q4-like: order priority with correlated EXISTS ----------------------
def q48_order_priority(spark, sf_dir):
    """Orders (in a date slice) with at least one late-shipping lineitem,
    counted per priority — the TPC-H Q4 shape: a correlated EXISTS
    planned as a left-semi join with a non-equi residual condition; the
    fact table never duplicates rows regardless of lineitem fan-out."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.date_add(orders.o_orderdate, 30)
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q48_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- Q14-like: promo revenue share ---------------------------------------
def q49_promo_revenue(spark, sf_dir):
    """Conditional-aggregate ratio over a fact-dim join (TPC-H Q14):
    promo share of revenue in one shipping year. Part is broadcast; the
    numerator/denominator fold in exact decimals, the final ratio is one
    double division (oracle-portable)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = _t(spark, sf_dir, "part")
    disc = revenue_expr()
    joined = li.join(part, li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(DEC)))
        .alias("_promo"),
        F.sum(disc).alias("_total"),
    )
    return agg.select(
        (
            F.lit(100).cast("double")
            * F.col("_promo").cast("double")
            / F.col("_total").cast("double")
        ).alias("promo_share")
    )


Q49_SQL = """
WITH a AS (
  SELECT
    SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01')
SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_share
FROM a
"""


# --- Q22-like: rich idle customers per nation -----------------------------
def q54_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average (positive) account
    balance and no orders since 2000-01-01, counted per nation. The
    global-average scalar subquery is kept exact by comparing
    ``bal * cnt > total`` instead of dividing (no float-boundary drift
    between engines); the one-row aggregate cross-joins in as a
    broadcast, and the no-recent-orders test is a left-anti join on
    custkey against the date-pruned orders scan."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    nation = _t(spark, sf_dir, "nation")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("_total"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast(DEC) * F.col("_cnt") > F.col("_total")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q54_SQL = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total, COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
CROSS JOIN pos
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name ORDER BY n_name
"""


# --- Q17-like: small-quantity-order revenue -------------------------------
def q55_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from lineitems whose quantity is under 20% of
    the per-part average, for one brand. The correlated scalar subquery
    becomes per-part (sum, cnt) WINDOW aggregates over the branded rows
    — one lineitem scan and one shuffle on p_partkey, instead of the
    aggregate-then-rejoin shape that executes the scan+broadcast-join
    subtree twice (the self-join-recompute trap). ``qty * 5 * cnt <
    sum`` keeps the 0.2*avg comparison exact. The brand filter prunes
    part before the join, so only the brand's lineitems shuffle."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    branded = li.join(part, li.l_partkey == part.p_partkey)
    wp = W.partitionBy("p_partkey")
    small = (
        branded.withColumn("_sq", F.sum(F.col("l_quantity").cast(DEC)).over(wp))
        .withColumn("_cnt", F.count(F.lit(1)).over(wp))
        .filter(F.col("l_quantity").cast(DEC) * 5 * F.col("_cnt") < F.col("_sq"))
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n"),
    )


Q55_SQL = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'),
per_part AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS cnt
  FROM branded GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n
FROM branded JOIN per_part ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq
"""


# --- Q7-like: nation-pair shipping volume ---------------------------------
def q56_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7: revenue shipped between two nations (either direction)
    per year. Two independent nation lookups (supplier side, customer
    side) broadcast; the pair disjunction is a residual filter on the
    already-joined row, never a join-explosion. Year extraction stays
    JVM-side (F.year == EXTRACT(YEAR ...))."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    rev = F.sum(
        revenue_expr()
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("_ck"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(rev.cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q56_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q13-like: customer order-count distribution -------------------------
def q51_custdist(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join so zero-order customers survive,
    per-customer order count, then a second aggregation over the counts.
    The outer join shuffles on custkey once; the distribution agg runs on
    the tiny (count -> custdist) domain, so the second exchange is
    negligible at any scale."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q51_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q18-like: large-volume customers ------------------------------------
def q52_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: orders whose total lineitem quantity exceeds 300.
    The HAVING filter runs on the pre-aggregated per-order sums (partial
    agg map-side), so the join back to orders/customer only sees the
    qualifying keys. NO forced broadcast hint: the qualifier count is a
    roughly fixed FRACTION of orders (~57 rows at SF1 is millions at
    100 TB), so a mandatory F.broadcast() would collect it all to the
    driver at scale — let AQE pick broadcast when the runtime size
    allows and fall back to a shuffle join when it doesn't."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty"))
        .filter(F.col("_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q52_SQL = """
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# --- Q19-like: bracketed disjunctive-predicate revenue --------------------
def q53_bracket_revenue(spark, sf_dir):
    """TPC-H Q19: an OR of three (brand, size-range, quantity-range)
    brackets over a fact-dim equi-join. The equi-join key stays clean
    (Catalyst plans a broadcast hash join on partkey) and the disjunction
    is a residual filter — the shape that proves predicates don't break
    join planning."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.sum(
        revenue_expr()
    )
    return j.filter(b).agg(
        rev.cast("double").alias("revenue"), F.count(F.lit(1)).alias("n")
    )


Q53_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q6-like: forecast revenue change ------------------------------------
def q60_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: a pure scan-side aggregate — every predicate pushes to
    the parquet scan (shipdate range, discount bracket, quantity cap)
    and the single partial+final agg carries one decimal. The query that
    measures raw scan + pushdown efficiency; no joins, no shuffle of
    data rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


Q60_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q15-like: top supplier by period revenue -----------------------------
def q61_top_supplier(spark, sf_dir):
    """TPC-H Q15: per-supplier revenue for one quarter, then the
    supplier(s) achieving the maximum — the scalar-subquery-on-aggregate
    shape. The scalar max is a one-row aggregate broadcast back onto the
    per-supplier totals (the q89 threshold pattern), NOT a partition-less
    window: a global window drags every per-supplier row onto one task,
    which dies at 100 TB supplier cardinality, while the broadcast keeps
    the filter map-side. The per-supplier aggregate is materialized ONCE
    (LAZY localCheckpoint — distributed, |suppliers| rows, computed on
    first action so plan construction stays free) because AQE does not
    prove exchange reuse across the broadcast-subquery boundary here;
    both the scalar max and the equality filter read the checkpointed
    partitions, so lineitem is scanned exactly once. The max is computed
    on the same exact-decimal totals the rows carry, so the equality is
    portable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("_sk")).agg(
        F.sum(
            revenue_expr()
        ).alias("_total")
    ).localCheckpoint(eager=False)
    mx = rev.agg(F.max("_total").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("_total") == F.col("_mx"))
        .join(supp, F.col("_sk") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("_total").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q61_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total = (SELECT MAX(total) FROM rev)
ORDER BY s_suppkey
"""


# --- Q20-like: heavy shippers of a part family ----------------------------
def q63_heavy_part_shippers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers selected by an IN-subquery whose inner
    query joins, filters by LIKE prefix + date slice, aggregates, and
    thresholds (HAVING). Planned as supplier LEFT SEMI JOIN the
    pre-aggregated qualifier set; the LIKE prefix pushes to the part
    scan as a StartsWith filter. The part dim broadcast stays forced
    (dims are genuinely bounded); the QUALIFIER join is not — its
    cardinality is a fraction of suppliers, so AQE decides at runtime
    instead of a mandatory driver collect."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = _t(spark, sf_dir, "supplier")
    qual = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
        .filter(F.col("_q") > 200)
    )
    return (
        supp.join(qual, supp.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q8-like: national market share ---------------------------------------
def q64_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of a region's revenue for a part
    type, per order year — the two-sided nation lookup (customer side
    restricts the region, supplier side names the share nation) with a
    conditional-aggregate ratio. All dimensions broadcast; lineitem is
    scanned once; numerator/denominator fold in exact decimals and the
    ratio is one double division (oracle-portable, the q49 recipe)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    # customer-side nations restricted to the target region
    cnat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
            "left_semi",
        )
        .select(F.col("n_nationkey").alias("_cnk"))
    )
    snat = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    vol = revenue_expr()
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == F.col("_cnk"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), supp.s_nationkey == F.col("_snk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("_nat"),
        F.sum(vol).alias("_tot"),
    )
    return agg.select(
        "o_year",
        (F.col("_nat").cast("double") / F.col("_tot").cast("double")).alias(
            "mkt_share"
        ),
    ).orderBy("o_year")


Q64_SQL = """
WITH base AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA')
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
"""


Q63_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
ORDER BY s_suppkey
"""


# --- Q12-like: shipping-speed vs order priority --------------------------
# TPC-H Q12 (synch/tests run the ClickHouse side of such reports; the
# fixture lacks l_shipmode/commitdate, so "mode" is adapted to a
# ship-lag bucket: FAST < 30 days from order to ship, else SLOW).
# Classic two-fact join + conditional aggregation; Catalyst keeps both
# priority counts in one pass (no second scan per branch).
def q74_shipmode_priority(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(lag < 30, "FAST").otherwise("SLOW").alias("ship_bucket"),
            high.alias("_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


Q74_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) < 30
            THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket ORDER BY ship_bucket
"""


# --- Q21-like: suppliers who kept orders waiting --------------------------
# TPC-H Q21's EXISTS / NOT-EXISTS self-join pair over lineitem, re-shaped
# as ONE grouped pass per order: an order indicts a supplier iff it has
# >1 distinct suppliers and exactly ONE distinct late supplier (late =
# shipped >60 days after the order date; the fixture has no
# commit/receipt dates). That is exactly "another supplier exists AND no
# other late supplier exists". One shuffle on o_orderkey replaces the
# reference plan's two correlated scans of the fact table — the shape
# that matters at 100 TB.
def q75_waiting_suppliers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    late = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60
    # Two-level agg instead of COUNT(DISTINCT ...) pair: the distinct pair
    # would compile to an Expand (row multiplication) over the full fact
    # join; collapsing to (orderkey, suppkey) first keeps map-side partial
    # aggregation and one ordinary shuffle — the cheaper plan at 100 TB.
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_any_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_ns"),
            F.sum(F.col("_any_late").cast("int")).alias("_nl"),
            F.min(F.when(F.col("_any_late"), F.col("l_suppkey"))).alias("_the_supp"),
        )
        .filter((F.col("_ns") > 1) & (F.col("_nl") == 1))
    )
    return (
        per_order.groupBy("_the_supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(supp, F.col("_the_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q75_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS ns,
         COUNT(DISTINCT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                            CAST(l_shipdate AS DATE)) > 60
                             THEN l_suppkey END) AS nl,
         MIN(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) > 60
                  THEN l_suppkey END) AS the_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON the_supp = s_suppkey
WHERE ns > 1 AND nl = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


# --- Q2-like: minimum-cost supplier ---------------------------------------
def q87_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in a
    region offering it at the minimum cost (correlated MIN subquery).
    The fixture has no partsupp, so the observed supply relation is
    derived from lineitem: cost(part, supp) = MIN(l_extendedprice) —
    pure MIN, no arithmetic, so it is bit-exact across engines.

    Plan: one wide groupBy(l_partkey, l_suppkey) over the fact (map-side
    partial MIN, single shuffle), then broadcast joins against the three
    filtered dimensions, and a per-part window MIN to express the
    correlated subquery without a second fact scan. At 100 TB the only
    shuffle is the (part,supp) aggregate, whose cardinality is bounded
    by |partsupp|, not |lineitem|; all dimension joins stay broadcast.
    Ref parity: supplier-choice semantics of synch's source-of-truth
    replication don't exist here — this is the Spark-native analytics
    surface (SURVEY §2.8)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "STANDARD")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    eligible = (
        cost.join(part, cost.l_partkey == part.p_partkey)
        .join(supp, cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left_semi"
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("p_partkey")
    return (
        eligible.withColumn("_mc", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("_mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q87_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2),
eligible AS (
  SELECT p_partkey, s_acctbal, s_name, n_name, cost
  FROM cost
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'STANDARD'
    AND r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, cost
FROM (SELECT *, MIN(cost) OVER (PARTITION BY p_partkey) AS mc FROM eligible) t
WHERE cost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


# --- Q9-like: product-type profit by nation and year ----------------------
def q88_product_profit(spark, sf_dir):
    """TPC-H Q9: profit per supplier-nation per order-year over a
    part-name LIKE slice. No partsupp, so supply cost is proxied as
    0.7 * p_retailprice * l_quantity. Amounts fold in tightly-sized
    decimals (every input has <=2 fractional digits, so the three-way
    product is exact and engine-portable; the final cast to double is
    one deterministic rounding).

    Plan: fact scanned once; part/supplier/nation broadcast; orders is
    the only co-shuffled join. The LIKE on p_name reaches the part scan
    as a pushed Contains filter."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    ) - F.lit(0.7).cast("decimal(2,1)") * F.col("p_retailprice").cast(
        "decimal(10,2)"
    ) * F.col("l_quantity").cast("decimal(4,1)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q88_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(0.7 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Q11-like: important part stock value ---------------------------------
def q89_important_stock(spark, sf_dir):
    """TPC-H Q11: per-part shipped value from one nation's suppliers,
    kept only when above a fraction of that nation's total (HAVING
    against a scalar subquery). The scalar total is a one-row broadcast
    cross-join, so the per-part aggregate shuffles once and the
    threshold filter is applied map-side after the join — no second
    scan, no driver collect. Value folds as DECIMAL(12,2)*DECIMAL(4,1)
    (exact), threshold multiplies the exact total by an exact
    DECIMAL(5,4) fraction — the > comparison is decimal-exact in both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nsupp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    )
    val = F.sum(
        F.col("l_extendedprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,1)")
    )
    base = li.join(F.broadcast(nsupp), li.l_suppkey == nsupp.s_suppkey, "left_semi")
    # per_part feeds BOTH the threshold scalar and the join side; the
    # exchange-reuse rule does not fire across the broadcast boundary
    # (verified in the executed plan: lineitem scanned + aggregated
    # twice), so materialize the part-cardinality aggregate once — the
    # checkpoint rides the threshold job
    per_part = base.groupBy("l_partkey").agg(val.alias("_v")) \
        .localCheckpoint(eager=False)
    total = per_part.agg(
        (F.sum("_v") * F.lit(0.001).cast("decimal(5,4)")).alias("_thr")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_v") > F.col("_thr"))
        .select("l_partkey", F.col("_v").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q89_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             CAST(l_quantity AS DECIMAL(4,1))) AS v
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7')
  GROUP BY l_partkey)
SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
FROM per_part
WHERE v > (SELECT SUM(v) * CAST(0.001 AS DECIMAL(5,4)) FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


# --- Q16-like: supplier relationship count --------------------------------
def q90_supplier_relationship(spark, sf_dir):
    """TPC-H Q16: how many distinct suppliers ship each qualifying
    (brand, type, size) bucket, excluding blacklisted suppliers (the
    reference query's 'Customer Complaints' NOT IN — proxied here as
    negative account balance). The NOT IN compiles to a broadcast
    LEFT ANTI join (keys are non-null on both sides, so anti-join ==
    NOT IN); the distinct count is the only shuffle and its input is
    pre-shrunk to distinct (part,supp) pairs so the Expand feeding
    COUNT(DISTINCT) never sees raw fact rows."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q90_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


TPCH_QUERIES = {
    "q36_shipping_priority": (q36_shipping_priority, Q36_SQL),
    "q37_local_supplier_volume": (q37_local_supplier_volume, Q37_SQL),
    "q38_returned_customers": (q38_returned_customers, Q38_SQL),
    "q48_order_priority": (q48_order_priority, Q48_SQL),
    "q49_promo_revenue": (q49_promo_revenue, Q49_SQL),
    "q51_custdist": (q51_custdist, Q51_SQL),
    "q52_large_volume_customers": (q52_large_volume_customers, Q52_SQL),
    "q53_bracket_revenue": (q53_bracket_revenue, Q53_SQL),
    "q54_idle_rich_customers": (q54_idle_rich_customers, Q54_SQL),
    "q55_small_quantity_revenue": (q55_small_quantity_revenue, Q55_SQL),
    "q56_nation_pair_volume": (q56_nation_pair_volume, Q56_SQL),
    "q60_forecast_revenue": (q60_forecast_revenue, Q60_SQL),
    "q61_top_supplier": (q61_top_supplier, Q61_SQL),
    "q63_heavy_part_shippers": (q63_heavy_part_shippers, Q63_SQL),
    "q64_market_share": (q64_market_share, Q64_SQL),
    "q74_shipmode_priority": (q74_shipmode_priority, Q74_SQL),
    "q75_waiting_suppliers": (q75_waiting_suppliers, Q75_SQL),
    "q87_min_cost_supplier": (q87_min_cost_supplier, Q87_SQL),
    "q88_product_profit": (q88_product_profit, Q88_SQL),
    "q89_important_stock": (q89_important_stock, Q89_SQL),
    "q90_supplier_relationship": (q90_supplier_relationship, Q90_SQL),
}
