"""Distributed exact rank / NTILE (functions/ranking.py) vs Spark's own
partition-less window on adversarial distributions: the construction
must be bit-identical to ``row_number()/ntile() OVER (ORDER BY ...)``
while never building a single-partition window over the data."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.functions.ranking import exact_rank_row, with_global_rank, with_ntile


def _make(spark, pairs):
    return spark.createDataFrame(
        [(float(v), int(k)) for v, k in pairs], "v double, k long"
    )


def _cases():
    rng = random.Random(7)
    return {
        # every order value identical: worst-case tie skew — the
        # sub-bucketing by tiebreak is what keeps partitions bounded
        "all_ties": [(1.0, k) for k in range(500)],
        # all unique values
        "unique": [(rng.uniform(-100, 100), k) for k in range(500)],
        # low-cardinality (5 distinct values, 100 rows each)
        "low_card": [(float(k % 5), k) for k in range(500)],
        # fewer rows than tiles
        "tiny": [(3.0, 1), (1.0, 2), (2.0, 3)],
        # single row
        "one": [(9.0, 42)],
        # negative + duplicated values, shuffled keys
        "mixed": [(float(rng.choice([-3, -1, 0, 2, 2, 7])), k) for k in rng.sample(range(1000), 400)],
    }


@pytest.mark.parametrize("case", sorted(_cases()))
def test_global_rank_matches_window(spark, case):
    df = _make(spark, _cases()[case])
    got = with_global_rank(df, "v", "k", out_col="rn", n_buckets=8, total_col="n")
    want = df.withColumn("rn", F.row_number().over(W.orderBy("v", "k")))
    g = {(r["v"], r["k"]): r["rn"] for r in got.collect()}
    w = {(r["v"], r["k"]): r["rn"] for r in want.collect()}
    assert g == w
    n = df.count()
    assert {r["n"] for r in got.collect()} == ({n} if n else set())


@pytest.mark.parametrize("case", sorted(_cases()))
@pytest.mark.parametrize("tiles", [4, 7])
def test_ntile_matches_window(spark, case, tiles):
    df = _make(spark, _cases()[case])
    got = with_ntile(df, tiles, "v", "k", out_col="t", n_buckets=8)
    want = df.withColumn("t", F.ntile(tiles).over(W.orderBy("v", "k")))
    g = {(r["v"], r["k"]): r["t"] for r in got.collect()}
    w = {(r["v"], r["k"]): r["t"] for r in want.collect()}
    assert g == w


def test_exact_median_row(spark):
    df = _make(spark, [(float(v), v) for v in range(1, 102)])  # 1..101
    med = exact_rank_row(df, "v", "k", rank_expr="rn = (n + 1) DIV 2", n_buckets=8)
    rows = med.collect()
    assert len(rows) == 1 and rows[0]["v"] == 51.0


def test_empty_input(spark):
    df = _make(spark, []).filter("v > 0")
    assert with_global_rank(df, "v", "k", out_col="rn").count() == 0
    assert with_ntile(df, 4, "v", "k", out_col="t").count() == 0


def test_no_partitionless_window_in_plan(spark):
    """The construction's own physical plan must not contain a window
    without a partition spec (the thing it exists to avoid)."""
    df = _make(spark, [(float(k % 3), k) for k in range(100)])
    plan = with_ntile(df, 4, "v", "k", out_col="t")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # partition-less specs start the spec with an ordered
            # (ASC/DESC-marked) expression instead of partition columns
            spec = line.split("windowspecdefinition(", 1)[1]
            first_arg = spec.split(",", 1)[0]
            assert " ASC" not in first_arg and " DESC" not in first_arg, line


def test_exact_values_at_fracs_matches_sorted_rank(spark):
    from pyspark.sql import functions as F

    from scip_spark.functions.ranking import exact_values_at_fracs

    df = spark.range(1, 1001).select((F.col("id") * 3).alias("v"))
    got = exact_values_at_fracs(df, "v", [0.01, 0.5, 0.99], max_local=50)
    # value at rank ceil(f*1000) of 3..3000
    assert got == {0.01: 30, 0.5: 1500, 0.99: 2970}


def test_exact_values_at_fracs_duplicates_and_negatives(spark):
    from scip_spark.functions.ranking import exact_values_at_fracs

    rows = [(-5,)] * 100 + [(2,)] * 300 + [(9,)] * 600
    df = spark.createDataFrame(rows, "v long")
    got = exact_values_at_fracs(df, "v", [0.05, 0.1, 0.4, 0.41, 1.0], max_local=10)
    assert got == {0.05: -5, 0.1: -5, 0.4: 2, 0.41: 9, 1.0: 9}

    const = spark.createDataFrame([(7,)] * 500, "v long")
    assert exact_values_at_fracs(const, "v", [0.5], max_local=10)[0.5] == 7


def test_exact_values_at_fracs_random_multisets(spark):
    """Randomized cross-check: the distributed selection must return
    the value at rank ceil(f*n) of the sorted multiset for arbitrary
    duplicated/negative/clustered data (driver-side ground truth).
    Deterministic seed; many shapes in one Spark session for speed."""
    import math

    rng = random.Random(1234)
    from scip_spark.functions.ranking import exact_values_at_fracs

    for trial in range(8):
        n = rng.randint(1, 400)
        style = trial % 4
        if style == 0:
            vals = [rng.randint(-50, 50) for _ in range(n)]
        elif style == 1:
            vals = [rng.choice([7, 7, 7, -2, 1000]) for _ in range(n)]
        elif style == 2:
            vals = [rng.randint(0, 3) * 10**9 for _ in range(n)]
        else:
            vals = [trial] * n
        fracs = sorted({rng.random() for _ in range(3)} | {0.5, 1.0})
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = exact_values_at_fracs(df, "v", fracs, max_local=16, n_ranges=4)
        s = sorted(vals)
        for f in fracs:
            want = s[max(1, math.ceil(f * n)) - 1]
            assert got[f] == want, (trial, f, n, got[f], want)


def test_global_rank_fan_levels_agree(spark):
    """Multi-level offsets (fan>1) must produce the EXACT same ranks as
    the single-level plan and the single-partition row_number oracle,
    on a multiset with heavy ties and near-unique regions."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from scip_spark.functions.ranking import with_global_rank

    rows = [(i, float(v)) for i, v in enumerate(
        [5] * 40 + list(range(100)) + [7] * 25 + [None] * 0 + list(range(50, 90))
    )]
    df = spark.createDataFrame(rows, ["k", "v"])
    want = {
        r.k: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("v", "k"))
        ).collect()
    }
    for fan in (1, 4, 8):
        got = {
            r.k: r.global_rank
            for r in with_global_rank(df, "v", "k", fan=fan).collect()
        }
        assert got == want, f"fan={fan}"
