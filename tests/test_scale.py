"""Scale techniques: salted aggregation correctness + bucketed
co-located joins (no shuffle above bucketed scans)."""

import pytest
from pyspark.sql import functions as F

from scip_spark.functions.scale import salted_count

SF = "/root/testdata/sf0.001"


def test_salted_count_equals_plain_groupby(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_returnflag").alias("k"), "l_orderkey", "l_linenumber"
    )
    got = {r._key: r.n for r in salted_count(li, "k").collect()}
    want = {r.k: r.n for r in li.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_salted_plan_has_two_aggregation_stages(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = salted_count(li, "l_returnflag")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # stage1 (key, salt) agg + stage2 (key) agg → two exchanges
    assert plan.count("Exchange") >= 2


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join runs with no Exchange above either bucketed scan."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse files persist; clear them so saveAsTable can't collide
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        # the ONLY exchange is the final groupBy on o_orderpriority —
        # below the SortMergeJoin there are just sorts over bucketed
        # scans, no shuffle
        tree = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
        below_join = tree.split("SortMergeJoin")[1]
        assert "Exchange" not in below_join
        # correctness unchanged
        want = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_approx_count_distinct_accuracy(spark):
    """Sketch aggregates (HLL++) can't oracle-match DuckDB's sketches —
    accuracy is asserted against the exact distinct instead."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.05


def test_partition_pruning(spark, tmp_path):
    """Writing partitioned by a coarse key lets Catalyst prune entire
    directories: the year filter must show up as a PartitionFilter and
    read only that year's files."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    orders.write.partitionBy("order_year").mode("overwrite").parquet(out)

    q = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "order_year" in pf[0]
    want = orders.filter(F.col("order_year") == 1997).count()
    assert q.count() == want
