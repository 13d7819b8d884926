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
