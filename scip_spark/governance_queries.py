"""Data-governance operators: SCD2 dimension-history construction and
privacy-preserving pseudonymization with k-anonymity suppression.

These are the warehouse-side twins of the reference's export stage
(reference src/scip/main.py:214-243 writes derived, user-facing
tables): a training-data platform additionally needs versioned
dimension history (reproducible "as-of" joins against mutable
metadata) and identifier scrubbing before a corpus leaves the
trust boundary.

Scale notes (100 TB):
- SCD2 is one window pass partitioned by the dimension key — shuffle
  on o_custkey only, lead() within the sorted partition, no joins.
- Pseudonymization is pure per-row column algebra (keyed md5). The
  k-anonymity group counts aggregate map-side first; the count table
  (one row per (event_type, hour) — bounded, tiny) broadcasts back,
  so the event stream itself shuffles zero bytes for the suppression.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.queries import register, tbl

_SCD2_SQL = """
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           COALESCE(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d'), '9999-12-31') AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "scd2_customer_orders",
    _SCD2_SQL,
    doc="SCD2 dimension-history build: each customer's orders become "
    "versioned validity intervals [valid_from, valid_to) with an "
    "is_current flag — one window pass, shuffle on the dimension "
    "key only, open intervals closed by lead()",
)
def scd2_customer_orders(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("version"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_K = 5

_PSEUDO_SQL = f"""
    WITH p AS (
      SELECT md5('pseudo-v1:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             event_type
      FROM events
    ),
    k AS (
      SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM p GROUP BY event_type, hour
    )
    SELECT p.user_pseudo, p.hour, p.event_type, k.grp_n
    FROM p JOIN k USING (event_type, hour)
    WHERE k.grp_n >= {_K}
"""


@register(
    "pseudonymize_events",
    _PSEUDO_SQL,
    doc=f"privacy scrub: keyed-hash pseudonymization of user ids, "
    f"timestamp coarsened to the hour, and k-anonymity suppression "
    f"(rows in (event_type, hour) groups smaller than k={_K} are "
    f"dropped); group counts broadcast back so the event stream "
    f"never shuffles",
)
def pseudonymize_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    p = ev.select(
        F.md5(F.concat(F.lit("pseudo-v1:"), F.col("user_id").cast("string"))).alias(
            "user_pseudo"
        ),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    )
    k = p.groupBy("event_type", "hour").agg(F.count("*").cast("long").alias("grp_n"))
    return (
        p.join(F.broadcast(k.filter(F.col("grp_n") >= _K)), ["event_type", "hour"])
        .select("user_pseudo", "hour", "event_type", "grp_n")
    )
