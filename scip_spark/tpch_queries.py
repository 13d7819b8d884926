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
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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


# ---------------------------------------------------------------------------
# Q2/Q8/Q9/Q11/Q19/Q20 shapes. The synthetic schema has no partsupp
# table, so the part-supplier relation is derived from lineitem
# (l_partkey, l_suppkey, l_extendedprice as the "offer"), preserving
# each query's join/subquery structure exactly.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT DISTINCT l_partkey, l_suppkey, l_extendedprice
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, offers, supplier, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size < 20 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (SELECT MIN(o2.l_extendedprice)
                             FROM offers o2
                             WHERE o2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q2 shape: correlated MIN scalar subquery over the "
    "region-restricted part-supplier offers",
)
def q2_min_cost_supplier(spark, sf_dir):
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_size") < 20) & (F.col("p_type") == "STANDARD")
    )
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    offers = (
        tbl(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(euro_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .distinct()
    )
    # correlated MIN subquery → per-part min + equality join (MIN of
    # doubles is order-insensitive, no decimal cast needed)
    min_offer = offers.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = offers.join(F.broadcast(min_offer), "l_partkey").filter(
        F.col("l_extendedprice") == F.col("min_price")
    )
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END
                         AS DECIMAL(24,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — conditional numerator "
    "over a full-volume denominator, 8-way join",
)
def q8_market_share(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = tbl(spark, sf_dir, "customer")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("nk1"))
        .join(F.broadcast(region), F.col("rk1") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("nk2"))
    )
    num = F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(F.lit(0.0))
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (dsum(num, DEC6).cast("double") / dsum(volume, DEC6).cast("double")).alias(
            "mkt_share"
        )
    )


@register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(CAST(amount AS DECIMAL(24,6))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01 AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: LIKE-filtered multi-join profit by nation/year "
    "(supply cost proxied by 1% of retail price — no partsupp table)",
)
def q9_product_type_profit(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders")
    nation = tbl(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(amount, DEC6).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    """
    WITH value_by_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(24,6))) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE part_value * 1000 > (SELECT SUM(part_value) FROM value_by_part)
    """,
    doc="TPC-H Q11 shape: HAVING against a global scalar subquery over "
    "the same aggregation (inventory value from lineitem — no partsupp)",
)
def q11_important_stock(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    )
    value = (F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC6)
    by_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value"))
    )
    # scalar subquery: total over the SAME aggregate, broadcast back.
    # integer-scaled decimal comparison (×1000, not ×0.001) keeps row
    # membership exact — a double epsilon could flip boundary rows
    # between engines
    total = by_part.agg(F.sum("part_value").alias("t"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") * 1000 > F.col("t"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 10 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive brand/size/qty "
    "ranges across the join",
)
def q19_discounted_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(10, 40)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(clause).agg(
        dsum(revenue, DEC6).cast("double").alias("revenue")
    )


@register(
    "q20_potential_promotion",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(CASE WHEN year(l_shipdate) = 1997 THEN l_quantity ELSE 0 END
                      AS DECIMAL(18,2))) AS qty_1997,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped
                        WHERE qty_total >= 60 AND qty_1997 * 4 > qty_total)
    GROUP BY s_name, n_name
    """,
    doc="TPC-H Q20 shape: nested IN subqueries — LIKE-filtered parts "
    "inside an agg-HAVING supplier set",
)
def q20_potential_promotion(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    qty97 = F.when(F.year("l_shipdate") == 1997, F.col("l_quantity")).otherwise(
        F.lit(0.0)
    )
    shipped = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            dsum(qty97).alias("qty_1997"),
            dsum("l_quantity").alias("qty_total"),
        )
    )
    # exact integer-scaled decimal comparison, same reason as q11; the
    # volume floor keeps the IN-set selective (~60/100 suppliers at
    # sf0.01) so a predicate bug can't hide behind an all-pass set
    promo_supp = shipped.filter(
        (F.col("qty_total") >= 60) & (F.col("qty_1997") * 4 > F.col("qty_total"))
    ).select("l_suppkey")
    return (
        supp.join(F.broadcast(promo_supp), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )
