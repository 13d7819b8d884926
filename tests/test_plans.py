"""Physical-plan assertions: the properties that keep these queries
viable at 100 TB — predicate pushdown into the parquet scan, column
pruning, and broadcast joins for dimension tables — must survive
refactors."""

import pytest

import scip_spark.entry_queries  # noqa: F401
from scip_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def formatted_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = formatted_plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    # column pruning: orderkey/partkey/suppkey not read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_q3_broadcast_dims(spark):
    plan = formatted_plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2  # orders + customer built small
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_q5_all_dims_broadcast(spark):
    plan = formatted_plan(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_soft_delete_stats_broadcast(spark):
    # the 1-row stats frame must come in via a broadcast nested loop,
    # never a shuffle
    plan = formatted_plan(spark, "soft_delete_filter")
    assert "BroadcastNestedLoopJoin" in plan


def test_minhash_partial_aggregation(spark):
    # explode→groupBy(min×8): partial aggregation before the exchange
    # means the shuffle carries one row per (doc, seed-minima), not one
    # per shingle
    plan = formatted_plan(spark, "dedup_minhash_signatures")
    assert "partial_min" in plan or "HashAggregate" in plan
    assert "Exchange" in plan


def test_no_cartesian_in_registry(spark):
    """No query may compile to an unbounded cartesian product (the
    brute-force cosine is a bounded broadcast nested loop, allowed)."""
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "CartesianProduct" not in plan, name
