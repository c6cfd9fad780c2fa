"""Multi-way-join OLAP queries (TPC-H Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q13/Q14/Q17/Q18/Q19/Q22 shapes).

The reference has NO multi-way joins (SURVEY.md §2.3); these extend the
engine to the canonical OLAP join/agg patterns its star-schema testdata
supports, with the same decimal-exact oracle discipline as the rest of the
registry.

Plan expectations at scale: region/nation (and other small dims) broadcast;
lineitem-orders joins are shuffle joins on the key both sides already
aggregate on; selective predicates sit in scan PushedFilters; top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators import topk
from reddit_data_pipeline_engineering_spark.plans.queries import (
    DEC_PRICE,
    DEC_RATE,
    _dsum,
    query,
)
from reddit_data_pipeline_engineering_spark.sources.tables import load_table

_REVENUE = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))"


def _revenue_col():
    price = F.col("l_extendedprice").cast(f"decimal({DEC_PRICE})")
    disc = F.col("l_discount").cast(f"decimal({DEC_RATE})")
    one = F.lit(1).cast("decimal(5,4)")
    return price * (one - disc)


_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@query(
    "shipping_priority",
    _Q3_ORACLE,
    "TPC-H Q3 shape: 3-way join with selective predicates on every input "
    "(all pushed to scans), revenue aggregation, top-10 unshipped orders",
    tags=("relational", "tpch", "bench"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_revenue_col()).cast("decimal(18,2)").cast("double").alias("revenue")
    )
    return topk.top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate"),
        [F.col("revenue").desc(), F.col("l_orderkey").asc()],
        10,
    )


_Q5_ORACLE = f"""
SELECT n.n_name AS nation_name,
       CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""


@query(
    "local_supplier_volume",
    _Q5_ORACLE,
    "TPC-H Q5 shape: 6-way join (region/nation broadcast; the "
    "customer-supplier same-nation condition rides the supplier join), "
    "per-nation revenue",
    tags=("relational", "tpch", "bench"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(_revenue_col())
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("nation_name").asc())
    )


_Q6_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query(
    "forecast_revenue",
    _Q6_ORACLE,
    "TPC-H Q6 shape: pure scan-filter-aggregate — every predicate in "
    "PushedFilters, zero joins, one partial+final agg (the minimal-IO plan)",
    tags=("relational", "tpch", "bench"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(f"decimal({DEC_PRICE})")
    disc = F.col("l_discount").cast(f"decimal({DEC_RATE})")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(price * disc).cast("decimal(18,2)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@query(
    "lateship_priority",
    _Q12_ORACLE,
    "TPC-H Q12 shape (testdata columns): join with a column-to-column "
    "predicate (shipped after order date) + priority conditional counts "
    "per return flag",
    tags=("relational", "tpch"),
)
def q_lateship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q18_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@query(
    "large_volume_customers",
    _Q18_ORACLE,
    "TPC-H Q18 shape: aggregate-derived semi-join (HAVING subquery -> "
    "left_semi on the pre-aggregated keys) feeding a 3-way join + top-20",
    tags=("relational", "tpch", "bench"),
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(f"decimal({DEC_PRICE})")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    filtered = orders.join(
        big_orders, orders.o_orderkey == big_orders.l_orderkey, "left_semi"
    )
    joined = cust.join(filtered, cust.c_custkey == filtered.o_custkey).join(
        li, filtered.o_orderkey == li.l_orderkey
    )
    agg = joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(
        _dsum(F.col("l_quantity"), DEC_PRICE).alias("total_qty")
    )
    return topk.top_k(
        agg,
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        20,
    )


_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query(
    "order_priority_counts",
    _Q4_ORACLE,
    "TPC-H Q4 shape: correlated EXISTS (late-shipping lineitem) as a "
    "left_semi join with a non-equi residual condition, then a "
    "priority-bucket count. The semi-join keeps only order keys — "
    "lineitem is never widened",
    tags=("relational", "tpch"),
)
def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS revenue,
       n.n_name, c.c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query(
    "returned_item_losses",
    _Q10_ORACLE,
    "TPC-H Q10 shape: returned-lineitem revenue per customer over one "
    "quarter, nation dim broadcast, top-20 by lost revenue "
    "(TakeOrderedAndProject)",
    tags=("relational", "tpch", "bench"),
)
def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        F.sum(_revenue_col()).cast("decimal(18,2)").cast("double").alias("revenue")
    )
    return topk.top_k(
        agg.select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal"),
        [F.col("revenue").desc(), F.col("c_custkey").asc()],
        20,
    )


_Q14_ORACLE = f"""
SELECT
  (100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REVENUE}
                               ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE))
    / CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS promo_pct,
  CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REVENUE}
                      ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
    AS promo_revenue,
  CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@query(
    "promo_revenue",
    _Q14_ORACLE,
    "TPC-H Q14 shape: promo revenue share over one month — conditional "
    "decimal-exact aggregate over a lineitem-part join with the shipdate "
    "filter pushed to the scan",
    tags=("relational", "tpch"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    rev = _revenue_col()
    promo = (
        F.sum(
            F.when(F.col("p_type") == "PROMO", rev).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )
        )
        .cast("decimal(18,2)")
        .cast("double")
    )
    total = F.sum(rev).cast("decimal(18,2)").cast("double")
    agg = joined.agg(
        promo.alias("promo_revenue"), total.alias("total_revenue")
    )
    return agg.select(
        (
            (F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")
        ).alias("promo_pct"),
        "promo_revenue",
        "total_revenue",
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query(
    "customer_order_distribution",
    _Q13_ORACLE,
    "TPC-H Q13 shape: left join with an ON-clause residual filter "
    "(customers with zero matching orders kept as count 0), then a "
    "histogram of per-customer order counts — two stacked aggregations",
    tags=("relational", "tpch"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                / COUNT(l_quantity)) AS qty_cutoff
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_type = 'SMALL'
  AND l.l_quantity < a.qty_cutoff
"""


@query(
    "small_quantity_revenue",
    _Q17_ORACLE,
    "TPC-H Q17 shape: correlated average subquery decorrelated into a "
    "per-part aggregate joined back on the part key (decimal-exact mean "
    "so the < cutoff comparison is engine-identical), one-row revenue",
    tags=("relational", "tpch"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                _dsum(F.col("l_quantity"), DEC_PRICE)
                / F.count("l_quantity")
            )
        ).alias("qty_cutoff")
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
    )
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast(f"decimal({DEC_PRICE})"))
            .cast("decimal(18,2)")
            .cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


_Q19_ORACLE = f"""
SELECT CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query(
    "brand_discount_revenue",
    _Q19_ORACLE,
    "TPC-H Q19 shape: three OR'd brand/size/quantity predicate branches — "
    "Catalyst extracts the common l_quantity bounds into the lineitem "
    "scan and the p_brand/p_size disjunction into the part scan before "
    "the join",
    tags=("relational", "tpch"),
)
def q_brand_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return joined.filter(branch).agg(
        F.sum(_revenue_col())
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS cutoff
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c CROSS JOIN avg_bal a
WHERE c.c_acctbal > a.cutoff
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@query(
    "dormant_rich_customers",
    _Q22_ORACLE,
    "TPC-H Q22 shape: scalar aggregate subquery (broadcast one-row "
    "cutoff) + anti-join against recent orders -> high-balance customers "
    "with no order in the last year (churn candidates), by nation",
    tags=("relational", "tpch"),
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-07-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    cutoff_df = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            _dsum(F.col("c_acctbal"), DEC_PRICE) / F.count(F.lit(1))
        ).alias("cutoff")
    )
    rich = cust.join(F.broadcast(cutoff_df)).filter(
        F.col("c_acctbal") > F.col("cutoff")
    )
    dormant = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), DEC_PRICE).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
