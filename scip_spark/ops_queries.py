"""Operational data-quality queries: referential-integrity audit,
key-skew profiling, and exact-percentile winsorization.

These are the checks a 100 TB ingest runs before (and while) the
analytical pipeline trusts the data: orphaned foreign keys break
joins silently, a skewed key distribution predicts shuffle stragglers
(the input to the salting decision in functions/scale.py), and
winsorization needs exact global percentiles without a global sort —
reusing the distributed rank machinery of functions/ranking.py.

The reference validates inputs per-record only (@check guards,
reference src/scip/utils/util.py); cross-relation audits are part of
the engine's training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.functions.dedup_queries import CC_FROM_PAIRS
from scip_spark.queries import register, tbl

# (label, child table, child key, parent table, parent key) — every FK
# edge of the synthetic TPC-H-ish schema
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_sql() -> str:
    parts = [
        f"""
        SELECT '{label}' AS relationship,
               CAST((SELECT COUNT(*) FROM {child} c
                     LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {parent}) p
                       ON c.{ck} = p.k
                     WHERE p.k IS NULL) AS BIGINT) AS orphan_rows,
               CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS child_rows
        """
        for (label, child, ck, parent, pk) in _FK_EDGES
    ]
    return " UNION ALL ".join(parts)


@register(
    "fk_integrity_audit",
    _fk_sql(),
    doc="referential-integrity audit across every FK edge of the "
    "schema: orphan counts via left-anti joins (each shuffles only the "
    "key column; small dimension sides broadcast under AQE) — the "
    "pre-flight a pipeline runs before trusting its joins",
)
def fk_integrity_audit(spark, sf_dir):
    out = None
    for label, child, ck, parent, pk in _FK_EDGES:
        c = tbl(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = tbl(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = c.join(p, "k", "left_anti").agg(
            F.count("*").cast("long").alias("orphan_rows")
        )
        total = c.agg(F.count("*").cast("long").alias("child_rows"))
        row = (
            orphans.crossJoin(F.broadcast(total))
            .select(
                F.lit(label).alias("relationship"), "orphan_rows", "child_rows"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_SKEW_KEYS = [
    ("events.user_id", "events", "user_id"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
]


def _skew_sql() -> str:
    parts = [
        f"""
        SELECT '{label}' AS key, CAST(SUM(f) AS BIGINT) AS total_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(f) AS BIGINT) AS max_freq,
               CAST(MAX(f) AS DOUBLE) / SUM(f) AS top_share,
               CAST(SUM(f) AS DOUBLE) / COUNT(*) AS avg_freq
        FROM (SELECT COUNT(*) AS f FROM {table} GROUP BY {col})
        """
        for (label, table, col) in _SKEW_KEYS
    ]
    return " UNION ALL ".join(parts)


@register(
    "key_skew_profile",
    _skew_sql(),
    doc="shuffle-key skew diagnostics: per-key frequency distribution "
    "reduced to max/avg/top-share — the measurement that decides "
    "whether a join key needs salting (functions/scale.py) before the "
    "100 TB run; one partial+final aggregation per key, rows never "
    "shuffle twice",
)
def key_skew_profile(spark, sf_dir):
    out = None
    for label, table, col in _SKEW_KEYS:
        per_key = (
            tbl(spark, sf_dir, table).groupBy(col).agg(F.count("*").alias("f"))
        )
        row = per_key.agg(
            F.lit(label).alias("key"),
            F.sum("f").cast("long").alias("total_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("f").cast("long").alias("max_freq"),
            (F.max("f").cast("double") / F.sum("f")).alias("top_share"),
            (F.sum("f").cast("double") / F.count("*")).alias("avg_freq"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "winsorized_pricing",
    """
    WITH li AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v, l_returnflag
      FROM lineitem
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
      FROM li
    ),
    cuts AS (
      SELECT MIN(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT) THEN v END) AS lo,
             MIN(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END) AS hi
      FROM ranked
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(least(greatest(v, cuts.lo), cuts.hi)) AS BIGINT)
             AS sum_winsorized_cents,
           CAST(SUM(CASE WHEN v < cuts.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN v > cuts.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           CAST(cuts.lo AS BIGINT) AS lo_cut, CAST(cuts.hi AS BIGINT) AS hi_cut
    FROM li, cuts
    GROUP BY l_returnflag, cuts.lo, cuts.hi
    """,
    doc="winsorization at exact global p01/p99: cut values located by "
    "distributed selection (functions/ranking.py exact_values_at_fracs "
    "— O(log) equal-width count passes, O(64) driver state, no global "
    "sort or window), broadcast back, then one clipped aggregation; "
    "the oracle computes the same ranks with DuckDB's single-node "
    "window",
)
def winsorized_pricing(spark, sf_dir):
    from scip_spark.functions.ranking import exact_values_at_fracs

    li = tbl(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        "l_returnflag",
    )
    cut = exact_values_at_fracs(li, "v", [0.01, 0.99])
    clipped = li.withColumn("lo", F.lit(cut[0.01]).cast("long")).withColumn(
        "hi", F.lit(cut[0.99]).cast("long")
    )
    return clipped.groupBy("l_returnflag", "lo", "hi").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.least(F.greatest("v", "lo"), "hi"))
        .cast("long")
        .alias("sum_winsorized_cents"),
        F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_hi"),
    ).select(
        "l_returnflag",
        "n",
        "sum_winsorized_cents",
        "n_clip_lo",
        "n_clip_hi",
        F.col("lo").alias("lo_cut"),
        F.col("hi").alias("hi_cut"),
    )


@register(
    "entity_resolution_customers",
    f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name, substr(c_name, 10, 7) AS blk FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM c a JOIN c b
        ON a.blk = b.blk AND a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    {CC_FROM_PAIRS},
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS csize FROM comp GROUP BY component
    )
    SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY csize
    """,
    doc="entity resolution: blocking (7-digit name prefix bounds every "
    "block at ~100 rows, so the pairwise stage is O(blocks * B^2) with "
    "B fixed - never all-pairs), edit-distance <= 1 match "
    "(levenshtein is integer-deterministic on both engines), and "
    "duplicate-cluster formation via the same iterative "
    "connected-components used for document dedup; output is the "
    "cluster-size histogram an MDM pipeline reports",
)
def entity_resolution_customers(spark, sf_dir):
    from scip_spark.functions.dedup import connected_components

    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 10, 7).alias("blk")
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("na"), "blk"
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("nb"), "blk"
    )
    pairs = (
        a.join(b, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("na", "nb") <= 1)
        )
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count("*").cast("long").alias("csize"))
        .groupBy("csize")
        .agg(F.count("*").cast("long").alias("n_clusters"))
    )


@register(
    "numeric_profile_lineitem",
    """
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x FROM lineitem
    ),
    mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM v)
    SELECT CAST(least(((v.x - mm.lo) * 10) // (mm.hi - mm.lo + 1), 9) AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(v.x) AS BIGINT) AS bucket_min,
           CAST(MAX(v.x) AS BIGINT) AS bucket_max,
           CAST(SUM(v.x) AS DOUBLE) / COUNT(*) AS bucket_mean
    FROM v, mm
    GROUP BY 1
    """,
    doc="numeric distribution profiling: 10-bucket equi-width histogram "
    "of price cents with per-bucket min/max/mean — two passes (one "
    "1-row min/max aggregate broadcast, one bucketed aggregation), "
    "exact integer bucket arithmetic; the profile pass a data-quality "
    "monitor runs per column per day",
)
def numeric_profile_lineitem(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x")
    )
    mm = li.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    # exact integer bucket arithmetic ((x-lo)*10 and the width are
    # longs) — a float divide-then-cast could drift at bucket edges
    b = F.least(
        F.expr("((x - lo) * 10) DIV (hi - lo + 1)"), F.lit(9).cast("long")
    )
    return (
        li.crossJoin(F.broadcast(mm))
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("x").cast("long").alias("bucket_min"),
            F.max("x").cast("long").alias("bucket_max"),
            (F.sum("x").cast("double") / F.count("*")).alias("bucket_mean"),
        )
    )


_PROFILE_COLS = [
    ("c_name", "string"),
    ("c_mktsegment", "string"),
    ("c_acctbal", "numeric"),
    ("c_nationkey", "numeric"),
]


def _col_profile_sql() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        if kind == "string":
            parts.append(f"""
            SELECT '{col}' AS col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   CAST(SUM(length({col})) AS DOUBLE) / COUNT({col}) AS avg_len
            FROM customer
            """)
        else:
            parts.append(f"""
            SELECT '{col}' AS col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   CAST(SUM(CAST(round({col} * 100) AS BIGINT)) AS DOUBLE)
                     / COUNT({col}) / 100 AS avg_len
            FROM customer
            """)
    return " UNION ALL ".join(parts)


@register(
    "column_profile_customer",
    _col_profile_sql(),
    doc="per-column completeness/cardinality profiling (null count, "
    "distinct count, mean length-or-value) over the customer "
    "dimension — one aggregation per column, decimal-exact means; "
    "the schema-drift tripwire that runs before every ingest promotes",
)
def column_profile_customer(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    out = None
    for col, kind in _PROFILE_COLS:
        if kind == "string":
            metric = F.sum(F.length(col)).cast("double") / F.count(col)
        else:
            metric = (
                F.sum(F.round(F.col(col) * 100).cast("long")).cast("double")
                / F.count(col)
                / 100
            )
        row = cust.agg(
            F.lit(col).alias("col"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.count_distinct(col).cast("long").alias("n_distinct"),
            metric.alias("avg_len"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_RS_K = 16  # target range partitions


@register(
    "balanced_range_splits",
    f"""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rnk FROM v
    ),
    bounds AS (
      SELECT u.i AS bi, r.v AS bv
      FROM n, UNNEST(generate_series(1, {_RS_K - 1})) AS u(i)
      JOIN ranked r
        ON r.rnk = CAST(ceil((u.i * n.n) / {_RS_K}.0) AS BIGINT)
    ),
    assigned AS (
      SELECT v.v,
             (SELECT COUNT(*) FROM bounds b WHERE v.v > b.bv) AS bucket
      FROM v
    )
    SELECT a.bucket AS bucket_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(b.bv) AS BIGINT) AS upper_cents
    FROM assigned a
    LEFT JOIN bounds b ON b.bi = a.bucket + 1
    GROUP BY a.bucket ORDER BY a.bucket
    """,
    doc="balanced range-partitioning PLANNER — the exact version of "
    "what Spark's RangePartitioner does by sampling before a global "
    "sort/sorted write: the 15 boundary values at ranks "
    "ceil(i*N/16) come from the O(log range) distributed-selection "
    "ladder (exact_values_at_fracs — equal-width count passes, "
    "O(64) driver state, never a global sort), rows assign to "
    "buckets by value comparison (ties go low), and the report shows "
    "the REALIZED per-bucket counts — the skew a sampled partitioner "
    "can only estimate, exact. i/16 fracs are exact binary "
    "fractions, so the double rank arithmetic is bit-identical "
    "cross-engine. Scale shape: ~4-6 count scans for all cuts + one "
    "map-side-combined bucket count; nothing sorts, nothing "
    "shuffles beyond 16-row partials.",
)
def balanced_range_splits(spark, sf_dir):
    from scip_spark.functions.ranking import exact_values_at_fracs

    li = tbl(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    )
    fracs = [i / _RS_K for i in range(1, _RS_K)]
    cuts = exact_values_at_fracs(li, "v", fracs)
    if not cuts:  # empty input: no cut points, zero-row result
        return li.groupBy(F.col("v").alias("bucket_id")).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.max("v").cast("long").alias("upper_cents"),
        )
    bounds = [cuts[f] for f in fracs]  # non-decreasing
    bucket = sum(
        (F.when(F.col("v") > b, 1).otherwise(0) for b in bounds),
        F.lit(0),
    ).cast("long")
    upper = {i: bounds[i] for i in range(len(bounds))}
    upper_col = F.create_map(
        *[F.lit(x) for kv in upper.items() for x in kv]
    )
    return (
        li.select(bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            "bucket_id",
            "n_rows",
            F.element_at(upper_col, F.col("bucket_id")).cast("long")
            .alias("upper_cents"),
        )
    )


#: floor(log10(1 + 1/d) * 2^20) for d = 1..9 — the Benford first-digit
#: law on the exact 2^20 grid, inlined identically in both engines
_BENFORD_FP = {
    1: 315652, 2: 184645, 3: 131007, 4: 101617, 5: 83027,
    6: 70198, 7: 60808, 8: 53637, 9: 47980,
}


@register(
    "benford_first_digit_audit",
    f"""
    WITH fd AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit
      FROM orders
    ),
    cnt AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM fd GROUP BY digit),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fd),
    p(digit, p_fp) AS (VALUES {', '.join(f'({d}, {v})' for d, v in _BENFORD_FP.items())})
    SELECT p.digit,
           COALESCE(c.n_obs, 0) AS n_obs,
           CAST(t.n * p.p_fp AS BIGINT) AS exp_cnt_fp,
           CAST(COALESCE(c.n_obs, 0) * 1048576 - t.n * p.p_fp AS BIGINT) AS dev_fp
    FROM p LEFT JOIN cnt c ON p.digit = c.digit CROSS JOIN tot t
    """,
    doc="Benford first-digit conformance audit over order amounts — "
    "the forensic data-quality screen (fabricated or truncated numeric "
    "columns break Benford's law long before summary stats move): "
    "observed count per leading digit vs the expected count under "
    "log10(1+1/d), both on the exact 2^20 grid (expected = n·p_fp, "
    "deviation = obs·2^20 − n·p_fp — pure integer cross-"
    "multiplication, no division, exact until n·p_fp passes int64 at "
    "n ≈ 2.9·10^13 rows; widen to DECIMAL beyond that). Scale "
    "shape: one map-side-combined 9-key count + a broadcast total; "
    "absent digits surface as explicit zero rows.",
)
def benford_first_digit_audit(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    fd = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    cnt = fd.groupBy("digit").agg(F.count("*").cast("long").alias("n_obs"))
    tot = fd.agg(F.count("*").cast("long").alias("n"))
    p = spark.createDataFrame(
        sorted(_BENFORD_FP.items()), "digit int, p_fp long"
    )
    return (
        p.join(cnt, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            (F.col("n") * F.col("p_fp")).cast("long").alias("exp_cnt_fp"),
            (
                F.coalesce("n_obs", F.lit(0)) * F.lit(1048576)
                - F.col("n") * F.col("p_fp")
            ).cast("long").alias("dev_fp"),
        )
    )
