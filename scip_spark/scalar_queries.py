"""Scalar-function surface: math, array, datetime families
(SURVEY §2.6 — the reference has no scalar library beyond regex; the
engine exposes Spark's full built-in surface, oracle-checked).

Only IEEE-exact operations appear in outputs (sqrt/pow-int/abs/floor/
ceil/sign): libm-dependent functions (log, exp, trig) can differ in the
last ulp between the JVM and DuckDB's C runtime, which would break
bit-exact hashing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.queries import register, tbl


@register(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_d,
           sqrt(l_quantity) AS sqrt_q,
           pow(l_discount, 2) AS disc_sq,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_weeks,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(floor(l_extendedprice * 100 / 3.0) AS BIGINT) AS third_cents
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="math scalar surface (IEEE-exact subset)",
)
def math_functions(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.sqrt("l_quantity").alias("sqrt_q"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_weeks"),
        # DuckDB sign() returns TINYINT; Spark signum is DOUBLE — oracle casts
        # to DOUBLE so both engines emit the same dtype (round-1 driver fail).
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        # Exact integer-cents formulation instead of round(x/3.0, 2):
        # double-rounding is the most likely cross-engine ulp divergence, while
        # floor of an IEEE quotient whose true value is k, k+1/3, or k+2/3 is
        # deterministic on any correctly-rounding engine.
        F.floor(F.col("l_extendedprice") * 100 / 3.0).cast("long").alias("third_cents"),
    )


@register(
    "array_functions",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 100)
    SELECT vec_id,
           CAST(len(list_sort(list_distinct(emb))) AS INT) AS n_distinct,
           list_sort(list_distinct(emb))[1] AS smallest,
           CAST(len(list_filter(emb, x -> x > 0)) AS INT) AS n_positive,
           emb[1] AS first_val,
           list_contains(emb, 0.0) AS has_zero
    FROM v
    """,
    doc="array function surface (sort/distinct/filter/contains)",
)
def array_functions(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding").cast("array<double>")
    dis = F.array_sort(F.array_distinct(e))
    return emb.select(
        "vec_id",
        F.size(dis).alias("n_distinct"),
        dis.getItem(0).alias("smallest"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        e.getItem(0).alias("first_val"),
        F.array_contains(e, 0.0).alias("has_zero"),
    )


@register(
    "datetime_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate, '%A') AS dow_name,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders WHERE o_orderkey < 1000
    """,
    doc="datetime scalar surface",
)
def datetime_functions(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(d, "EEEE").alias("dow_name"),
        F.year(d).cast("int").alias("y"),
        F.month(d).cast("int").alias("m"),
        F.dayofmonth(d).cast("int").alias("d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch_start"
        ),
    )
