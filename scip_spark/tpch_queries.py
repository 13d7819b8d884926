"""Remaining TPC-H query shapes — outer joins, IN / NOT-IN subqueries,
HAVING with scalar subqueries, anti-join aggregation. Together with
queries.py/sql_queries.py this covers every join/subquery pattern in
the TPC-H suite that the synthetic schema supports.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.queries import DEC6, dsum, register, tbl


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: two-nation join with disjunctive predicate",
)
def q7_volume_shipping(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(dsum(volume, DEC6).cast("double").alias("revenue"))


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join + two-level aggregation",
)
def q13_customer_distribution(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q16_parts_supplier",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'BRAND_1'
      AND p_size IN (1, 5, 9, 13, 17)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape: NOT IN subquery + count distinct",
)
def q16_parts_supplier(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    bad_supp = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
    doc="TPC-H Q18 shape: IN subquery with HAVING",
)
def q18_large_volume_customer(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c_name, 1, 10) AS cntrycode_proxy, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer CROSS JOIN avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS",
)
def q22_global_sales_opportunity(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal").cast("double") / F.count("*")).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 10).alias("cntrycode_proxy"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").cast("double").alias("totacctbal"),
        )
    )


@register(
    "full_outer_join_balance",
    """
    SELECT COALESCE(a.k, b.k) AS nation_key,
           a.n_customers, b.n_suppliers
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) b
      ON a.k = b.k
    """,
    doc="full outer join of two aggregates",
)
def full_outer_join_balance(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    a = cust.groupBy(F.col("c_nationkey").alias("ka")).agg(
        F.count("*").alias("n_customers")
    )
    b = supp.groupBy(F.col("s_nationkey").alias("kb")).agg(
        F.count("*").alias("n_suppliers")
    )
    return a.join(b, a.ka == b.kb, "full_outer").select(
        F.coalesce(F.col("ka"), F.col("kb")).alias("nation_key"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "map_explode_props",
    """
    SELECT event_id, 'k' AS prop_key, json_extract_string(props, '$.k') AS prop_value
    FROM events
    WHERE event_id < 2000 AND json_extract_string(props, '$.k') IS NOT NULL
    """,
    doc="MapType surface: JSON → map → exploded key/value rows (oracle uses "
    "scalar extraction — the synthetic props carry a single key)",
)
def map_explode_props(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id", F.explode(m).alias("prop_key", "prop_value")
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking",
)
def q10_returned_items(spark, sf_dir):
    from scip_spark.queries import DEC6

    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, DEC6).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    """
    SELECT o_orderpriority,
           SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q12 shape: conditional counts by class",
)
def q12_priority_shipping(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = tbl(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q14_promo_effect",
    """
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
                      ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
             AS promo_revenue_pct,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share",
)
def q14_promo_effect(spark, sf_dir):
    from scip_spark.queries import DEC6

    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev.cast(DEC6)).otherwise(
        F.lit(0).cast(DEC6)
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        (
            F.lit(100.0).cast("double")
            * F.sum(promo).cast("double")
            / dsum(rev, DEC6).cast("double")
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n"),
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue_view AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue_view)
    """,
    doc="TPC-H Q15 shape: view + scalar-subquery max (decimal-exact tie)",
)
def q15_top_supplier(spark, sf_dir):
    from scip_spark.queries import DEC6

    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), DEC6).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    supp = tbl(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_avg",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'BRAND_2'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated avg-quantity subquery",
)
def q17_small_quantity_avg(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND_2")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * (dsum("l_quantity").cast("double") / F.count("*"))).alias("limit_q")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == avg_q.pk)
        .filter(F.col("l_quantity") < F.col("limit_q"))
    )
    return j.agg(
        (dsum("l_extendedprice").cast("double") / 7.0).alias("avg_yearly"),
        F.count("*").alias("n"),
    )


@register(
    "q21_waiting_orders",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS on the same relation",
)
def q21_waiting_orders(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    ).alias("l3")
    exists2 = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("ok2")) & (F.col("l1.l_suppkey") != F.col("sk2")),
        "left_semi",
    )
    not3 = exists2.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("ok3"))
        & (F.col("l1.l_suppkey") != F.col("sk3"))
        & (F.col("sd3") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not3.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
