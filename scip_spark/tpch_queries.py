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
