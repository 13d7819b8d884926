"""Queries expressed through the SQL API (spark.sql over temp views) —
exercising the parser/analyzer path rather than the DataFrame builder.
Catalyst produces the same plans either way; registering a few through
SQL proves the engine's second entry point (SURVEY §3.2).
"""

from __future__ import annotations

from scip_spark.queries import register, tbl

_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_SQL, doc="TPC-H Q4 shape: EXISTS subquery + agg (SQL API)")
def q4_order_priority(spark, sf_dir):
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q4_SQL)


_Q6_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_SQL, doc="TPC-H Q6 shape: selective scan-agg (SQL API)")
def q6_forecast_revenue(spark, sf_dir):
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


_CORR_SQL = """
    SELECT c_custkey, c_acctbal,
           (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    WHERE c_custkey < 300
"""


@register(
    "correlated_scalar_subquery",
    _CORR_SQL,
    doc="correlated scalar subquery (decorrelated by Catalyst to a join)",
)
def correlated_scalar_subquery(spark, sf_dir):
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORR_SQL)


# Spark 4 recursive CTE (UNION ALL — acyclic chains terminate by
# construction): order "streaks" — runs of consecutive same-customer
# orders each within 30 days of the previous. Each node has at most one
# successor (its customer's next order), so the recursion is a forest
# walk: rows never multiply, depth = streak position. The oracle runs
# the IDENTICAL recursion in DuckDB (date arithmetic spelled per
# engine: datediff vs date subtraction).
_STREAK_SPARK_SQL = """
    WITH RECURSIVE chain(anchor, node, depth) AS (
      SELECT k, k, 1 FROM (
        SELECT o_orderkey AS k
        FROM (
          SELECT o_orderkey,
                 CAST(o_orderdate AS DATE) AS d,
                 LAG(CAST(o_orderdate AS DATE)) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pd
          FROM orders
        ) WHERE pd IS NULL OR datediff(d, pd) > 30
      )
      UNION ALL
      SELECT ch.anchor, e.dst, ch.depth + 1
      FROM chain ch
      JOIN (
        SELECT src, dst FROM (
          SELECT LAG(o_orderkey) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS src,
                 o_orderkey AS dst,
                 CAST(o_orderdate AS DATE) AS d,
                 LAG(CAST(o_orderdate AS DATE)) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pd
          FROM orders
        ) WHERE pd IS NOT NULL AND datediff(d, pd) <= 30
      ) e ON e.src = ch.node
    )
    SELECT len, CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM (SELECT anchor, CAST(MAX(depth) AS BIGINT) AS len FROM chain GROUP BY anchor)
    GROUP BY len
"""

_STREAK_DUCK_SQL = """
    WITH RECURSIVE base AS (
      SELECT o_orderkey AS k, o_custkey AS c, CAST(o_orderdate AS DATE) AS d,
             LAG(o_orderkey) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pk,
             LAG(CAST(o_orderdate AS DATE)) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pd
      FROM orders
    ),
    edges AS (
      SELECT pk AS src, k AS dst FROM base
      WHERE pd IS NOT NULL AND d - pd <= 30
    ),
    chain(anchor, node, depth) AS (
      SELECT k, k, 1 FROM base WHERE pd IS NULL OR d - pd > 30
      UNION ALL
      SELECT ch.anchor, e.dst, ch.depth + 1
      FROM chain ch JOIN edges e ON e.src = ch.node
    )
    SELECT len, CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM (SELECT anchor, CAST(MAX(depth) AS BIGINT) AS len FROM chain GROUP BY anchor)
    GROUP BY len
"""


@register(
    "recursive_order_streaks",
    _STREAK_DUCK_SQL,
    doc="recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL) walking "
    "consecutive-order chains <= 30 days apart; streak-length "
    "histogram == DuckDB's recursion over the same forest",
)
def recursive_order_streaks(spark, sf_dir):
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_STREAK_SPARK_SQL)


# LATERAL correlated subquery (Spark 4): per-customer top-2 orders by
# (totalprice DESC, orderkey) — the SQL-standard form of topk_per_group;
# Catalyst rewrites the lateral limit into the same window/limit shape.
_LATERAL_SPARK_SQL = """
    SELECT c.c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
"""


@register(
    "lateral_topk_orders",
    _LATERAL_SPARK_SQL,
    doc="LATERAL correlated subquery with per-row ORDER BY + LIMIT "
    "(SQL-standard top-k per group); DuckDB runs the identical text",
)
def lateral_topk_orders(spark, sf_dir):
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SPARK_SQL)
