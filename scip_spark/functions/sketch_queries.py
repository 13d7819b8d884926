"""Oracle-paired queries for the KMV distinct sketch.

KMV is the one sketch family whose estimate is a deterministic
function of the data (given the md5 hash), so DuckDB can reproduce it
bit-exactly from the same constants. HLL/theta register layouts are
engine-specific — those are covered by accuracy-bound pytest tests
(tests/test_scale.py), not oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.functions.sketches import (
    KMV_K,
    _HASH_SPACE,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from scip_spark.queries import register, tbl

# DuckDB fragments generated from the same constants as the Spark side
_H = "CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT)"


def _kmv_sql(k: int = KMV_K) -> str:
    return f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority, {_H} AS h FROM orders
    ),
    sk AS (
      SELECT o_orderpriority, list_slice(list_sort(list(h)), 1, {k}) AS kmv
      FROM hashed GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(len(kmv) AS BIGINT) AS sketch_size,
           CASE WHEN len(kmv) < {k} THEN CAST(len(kmv) AS DOUBLE)
                ELSE {float(k - 1)} / (CAST(kmv[{k}] AS DOUBLE) / {_HASH_SPACE})
           END AS est_distinct
    FROM sk
    """


@register(
    "kmv_distinct_by_priority",
    _kmv_sql(),
    doc="KMV distinct-customer sketch per order priority — "
    "deterministic (md5-based) so the approximation itself is "
    "oracle-verified",
)
def kmv_distinct_by_priority(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    sk = kmv_sketch(orders, "o_orderpriority", "o_custkey")
    return sk.select(
        "o_orderpriority",
        F.size("kmv").cast("long").alias("sketch_size"),
        kmv_estimate("kmv").alias("est_distinct"),
    )


def _kmv_union_sql(k: int = KMV_K) -> str:
    return f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority, {_H} AS h FROM orders
    ),
    sk AS (
      SELECT o_orderpriority, list_slice(list_sort(list(h)), 1, {k}) AS kmv
      FROM hashed GROUP BY o_orderpriority
    ),
    merged AS (
      SELECT list_slice(list_sort(list_distinct(flatten(list(kmv)))), 1, {k}) AS kmv
      FROM sk
    )
    SELECT CAST(len(kmv) AS BIGINT) AS sketch_size,
           CASE WHEN len(kmv) < {k} THEN CAST(len(kmv) AS DOUBLE)
                ELSE {float(k - 1)} / (CAST(kmv[{k}] AS DOUBLE) / {_HASH_SPACE})
           END AS est_distinct
    FROM merged
    """


@register(
    "kmv_union_estimate",
    _kmv_union_sql(),
    doc="KMV sketch mergeability: per-priority sketches folded into one "
    "global sketch (the per-partition → global rollup pattern); the "
    "union estimate is oracle-verified",
)
def kmv_union_estimate(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    sk = kmv_sketch(orders, "o_orderpriority", "o_custkey")
    # fold the (few) per-key sketches with the merge semilattice —
    # collect_list is safe here because the merged relation is one row
    # per key, each capped at K hashes
    merged = sk.agg(
        F.aggregate(
            F.collect_list("kmv"),
            F.array().cast("array<long>"),
            lambda acc, s: kmv_merge(acc, s),
        ).alias("kmv")
    )
    return merged.select(
        F.size("kmv").cast("long").alias("sketch_size"),
        kmv_estimate("kmv").alias("est_distinct"),
    )
