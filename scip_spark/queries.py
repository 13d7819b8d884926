"""Relational query registry — one entry per operator of SURVEY.md §2.

Every reference operator (SCIP's dataflow stages) has a relational
analogue expressed over the driver's synthetic tables, paired with an
ANSI-SQL oracle that DuckDB can evaluate on the same parquet files.
The driver compares row count + schema + order-insensitive value hash,
so each pair is written for **bit-exact** equivalence:

- Monetary/qty sums go through ``DECIMAL`` so the result is independent
  of partial-aggregation order (Spark map-side combine vs DuckDB's
  single-node fold would otherwise drift in the last float ulps).
- Averages/stddevs are derived from decimal sums with one final double
  division — the same two doubles on both engines.
- Dates/timestamps are emitted as formatted strings (engine-neutral).
- Every top-k / limit has a total tie-break on a unique key.
- Hash-based operators (fingerprints, MinHash) use ``md5`` — identical
  hex output on both engines.

Each query cites the reference operator it mirrors (SURVEY §2 ids).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

DEC = T.DecimalType(18, 2)  # monetary / qty inputs (2dp data)
DEC6 = T.DecimalType(24, 6)  # per-row double products (deterministic per row)
DEC10 = T.DecimalType(38, 10)  # float components / squares

# Φ⁻¹(0.95): the reference's population filter cuts at norm.ppf(0.05, μ, σ)
# = μ − 1.6448…·σ (reference src/scip/filter/threshold.py:22-27).
PHI_95 = 1.6448536269514722


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with ``ts`` normalized to TIMESTAMP (with local
    TZ semantics, session TZ pinned UTC) regardless of how the file encodes
    it. Seen encodings across driver testdata generations:

    - TIMESTAMP(NANOS): Spark reads it as a long
      (``spark.sql.legacy.parquet.nanosAsLong``). Micro-precision data, so
      ``ts DIV 1000`` → timestamp_micros is lossless. Integer division — a
      double roundtrip would lose precision at 1e18 ns.
    - timestamp[us] without isAdjustedToUTC: Spark reads TIMESTAMP_NTZ,
      which is not castable to BIGINT and breaks unix_micros(). Cast to
      TIMESTAMP; with the session TZ pinned UTC the wall-clock values are
      identical to what DuckDB's oracle sees.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = dict(ev.dtypes)["ts"]
    if ts_dtype == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_dtype == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


#: session-shared persisted relations (engine-level materialized-view
#: reuse): several registered operators derive from the SAME expensive
#: intermediate (the banded embedding candidate join, the document
#: MinHash-LSH pair set, its connected components, the tokenized doc
#: relation). Keyed by (applicationId, sf_dir, kind) so nothing leaks
#: across sessions or scale factors; every stored relation is
#: candidate/label-bounded (id pairs, labels, tokens — never tensors
#: or text), tens of MB at most.
_SHARED_REL: dict = {}


def session_rel(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    """Build-once-per-session persisted relation. Re-persists if
    something external (clearCache) dropped the blocks — values are
    deterministic, so a silent recompute is correct, just slower."""
    from pyspark.storagelevel import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir, kind)
    hit = _SHARED_REL.get(key)
    if hit is not None:
        if hit.storageLevel == StorageLevel.NONE:
            hit.persist(StorageLevel.MEMORY_AND_DISK)
        return hit
    # entries from dead sessions are unreferencable — drop them
    for k in list(_SHARED_REL):
        if k[0] != key[0]:
            _SHARED_REL.pop(k)
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _SHARED_REL[key] = df
    return df


@dataclass
class QuerySpec:
    """A Spark query plus (optionally) its DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    sql: Optional[str],
    doc: str = "",
    share_sql_with: Optional[str] = None,
):
    """Register a query. ``share_sql_with`` resolves the oracle SQL from
    an already-registered entry AT decoration time (for batch/stream
    twins that must stay value-identical) — so any tool that snapshots
    specs at register time sees the real SQL, never a post-hoc splice
    (ADVICE r13)."""
    if share_sql_with is not None:
        if sql is not None:
            raise ValueError(f"{name}: pass sql=None with share_sql_with")
        sql = REGISTRY[share_sql_with].sql

    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def dsum(col, dectype=DEC):
    """Order-independent sum: cast to decimal, sum exactly."""
    return F.sum(F.col(col).cast(dectype) if isinstance(col, str) else col.cast(dectype))


def literal_values_sql(rows: list[dict], casts: dict[str, Optional[str]]) -> str:
    """DuckDB oracle for a fixture-pinned query: a literal VALUES table
    from committed expected rows. ``casts`` maps every column to a SQL
    type (``None`` = string literal) — one quoting/casting policy for
    every fixture oracle (imaging checksum, zarr fixture), so the rules
    cannot drift between copies."""
    cols = list(rows[0].keys())
    missing = [c for c in cols if c not in casts]
    if missing:
        raise ValueError(f"no cast policy for columns: {missing}")
    lits = []
    for r in rows:
        cells = []
        for c in cols:
            v, t = r[c], casts[c]
            if v is None:
                # a NULL fixture cell is a fixture bug, not a value to
                # silently quote as the string 'None'
                raise ValueError(f"fixture row has NULL in column {c!r}")
            if t is None:
                # '' -> '' doubling is SQL-standard escaping (ADVICE
                # r14: an apostrophe in a fixture value must not break
                # the generated oracle)
                escaped = str(v).replace("'", "''")
                cells.append(f"'{escaped}'")
            else:
                cells.append(f"CAST({v} AS {t})")
        lits.append("(" + ", ".join(cells) + ")")
    quoted = ", ".join(f'"{c}"' for c in cols)
    return f"SELECT * FROM (VALUES {', '.join(lits)}) AS t({quoted})"


# ---------------------------------------------------------------------------
# A1/A2-style keyed partial+final aggregation — TPC-H Q1 shape.
# Mirrors the reference's foldby partial/combine aggregation
# (reference src/scip/illumination_correction/jones_2006.py:109-115).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1/A2 keyed partial+final agg (TPC-H Q1 shape)",
)
def q1_pricing_summary(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").cast("double").alias("sum_qty"),
            dsum("l_extendedprice").cast("double").alias("sum_base_price"),
            dsum(disc_price, DEC6).cast("double").alias("sum_disc_price"),
            dsum(charge, DEC6).cast("double").alias("sum_charge"),
            (dsum("l_quantity").cast("double") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice").cast("double") / F.count("*")).alias("avg_price"),
            (dsum("l_discount").cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + agg + deterministic top-k (TPC-H Q3 shape).
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="join + agg + deterministic top-k",
)
def q3_shipping_priority(spark, sf_dir):
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, DEC6).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Star join through region/nation with broadcast dims (TPC-H Q5 shape) —
# the J2/J3 "small aggregated state joined into the big stream" pattern
# (reference src/scip/illumination_correction/jones_2006.py:96-120).
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="multi-way star join, broadcast dims",
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(revenue, DEC6).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# S3: the tiff loader's metadata scan pivots channel→path
# (reference src/scip/loading/tiff.py:126-158). Relational analogue:
# pivot l_linenumber → partkey per order.
# ---------------------------------------------------------------------------
@register(
    "pivot_channels",
    """
    SELECT l_orderkey,
           MIN(CASE WHEN l_linenumber = 1 THEN l_partkey END) AS ln1,
           MIN(CASE WHEN l_linenumber = 2 THEN l_partkey END) AS ln2,
           MIN(CASE WHEN l_linenumber = 3 THEN l_partkey END) AS ln3,
           MIN(CASE WHEN l_linenumber = 4 THEN l_partkey END) AS ln4,
           MIN(CASE WHEN l_linenumber = 5 THEN l_partkey END) AS ln5,
           MIN(CASE WHEN l_linenumber = 6 THEN l_partkey END) AS ln6,
           MIN(CASE WHEN l_linenumber = 7 THEN l_partkey END) AS ln7
    FROM lineitem
    GROUP BY l_orderkey
    HAVING MIN(CASE WHEN l_linenumber = 1 THEN l_partkey END) IS NOT NULL
       AND MIN(CASE WHEN l_linenumber = 2 THEN l_partkey END) IS NOT NULL
    """,
    doc="S3 metadata pivot channel→path + drop-missing-channel",
)
def pivot_channels(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_orderkey")
        .pivot("l_linenumber", list(range(1, 8)))
        .agg(F.min("l_partkey"))
    )
    renamed = piv.select(
        "l_orderkey", *[F.col(str(i)).alias(f"ln{i}") for i in range(1, 8)]
    )
    # the reference drops records whose required channels are missing
    # (tiff.py:151-154) — here channels 1 and 2 are "required"
    return renamed.filter(F.col("ln1").isNotNull() & F.col("ln2").isNotNull())


# ---------------------------------------------------------------------------
# J5: union of sources (reference src/scip/loading/__init__.py:36-44).
# ---------------------------------------------------------------------------
@register(
    "union_sources",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice <= 50000
    """,
    doc="J5 union of per-source scans",
)
def union_sources(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    a = orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000))
    b = orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") <= 50000))
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# A3: global mean/std (reference src/scip/filter/threshold.py:15-19) —
# derived from exact decimal sums so both engines emit identical doubles.
# ---------------------------------------------------------------------------
# 2-decimal monetary values become exact integer cents; all sums are
# then exact integers (DECIMAL(38,0)) and every double op afterwards is
# the same op on the same bits in both engines. High-scale decimal
# casts of x² are NOT engine-portable (rounding of the double→decimal
# conversion differs in the last ulp at some inputs).
_GLOBAL_STATS_SQL = """
    WITH cents AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc FROM lineitem
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sc,
             SUM(CAST(xc * xc AS DECIMAL(38,0))) AS ssc_dec
      FROM cents
    ),
    -- ssc exceeds 2^53: decimal→double conversion of the whole value is
    -- NOT identical across engines. Split into hi/lo < 2^53 (each
    -- converts exactly) and recombine with the same double ops.
    split AS (
      SELECT n, sc,
             CAST(ssc_dec % 10000000000 AS BIGINT) AS ssc_lo,
             CAST((ssc_dec - (ssc_dec % 10000000000)) / 10000000000 AS BIGINT) AS ssc_hi
      FROM sums
    )
    SELECT n,
           sc / n / 100.0 AS mean_price,
           sqrt((ssc_hi * 1e10 + ssc_lo) / n / 10000.0
                - (sc / n / 100.0) * (sc / n / 100.0)) AS std_price
    FROM split
"""


@register("global_stats", _GLOBAL_STATS_SQL, doc="A3 global mean/std via exact integer-cents sums")
def global_stats(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    xc = F.round(F.col("l_extendedprice") * 100).cast("long")
    agg = li.select(xc.alias("xc")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("xc").cast(T.DecimalType(38, 0))).cast("double").alias("sc"),
        F.sum((F.col("xc") * F.col("xc")).cast(T.DecimalType(38, 0))).alias("ssc_dec"),
    )
    ten10 = F.lit(10000000000).cast(T.DecimalType(38, 0))
    lo = (F.col("ssc_dec") % ten10).cast("long")
    hi = ((F.col("ssc_dec") - F.col("ssc_dec") % ten10) / ten10).cast("long")
    split = agg.select("n", "sc", lo.alias("ssc_lo"), hi.alias("ssc_hi"))
    mean = F.col("sc") / F.col("n") / 100.0
    ssc_d = F.col("ssc_hi") * 1e10 + F.col("ssc_lo")
    return split.select(
        "n",
        mean.alias("mean_price"),
        F.sqrt(ssc_d / F.col("n") / 10000.0 - mean * mean).alias("std_price"),
    )


# ---------------------------------------------------------------------------
# A4: distinct-count of groups (reference src/scip/main.py:175).
# ---------------------------------------------------------------------------
@register(
    "distinct_groups",
    """
    SELECT COUNT(DISTINCT o_custkey) AS ngroups, COUNT(*) AS nrecords
    FROM orders
    """,
    doc="A4 ngroups distinct count",
)
def distinct_groups(spark, sf_dir):
    return tbl(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("ngroups"),
        F.count("*").alias("nrecords"),
    )


# ---------------------------------------------------------------------------
# P7: the population filter's SOFT delete — rows survive with nulled
# payload, never df.filter (reference src/scip/filter/threshold.py:22-27,
# features/__init__.py:77-99). filter_sum analogue = l_extendedprice.
# ---------------------------------------------------------------------------
_SOFT_DELETE_SQL = f"""
    WITH sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sc,
             SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS ssc_dec
      FROM lineitem
    ),
    split AS (
      SELECT n, sc,
             CAST(ssc_dec % 10000000000 AS BIGINT) AS ssc_lo,
             CAST((ssc_dec - (ssc_dec % 10000000000)) / 10000000000 AS BIGINT) AS ssc_hi
      FROM sums
    ),
    stats AS (
      SELECT sc / n / 100.0 AS mu,
             sqrt((ssc_hi * 1e10 + ssc_lo) / n / 10000.0
                  - (sc / n / 100.0) * (sc / n / 100.0)) AS sigma
      FROM split
    )
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS filter_sum,
           CASE WHEN l_extendedprice > mu - {PHI_95} * sigma
                THEN l_quantity END AS kept_quantity
    FROM lineitem CROSS JOIN stats
"""


@register("soft_delete_filter", _SOFT_DELETE_SQL, doc="P7 soft-delete population filter")
def soft_delete_filter(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    xc = F.round(x * 100).cast("long")
    agg = li.agg(
        F.count("*").alias("n"),
        F.sum(xc.cast(T.DecimalType(38, 0))).cast("double").alias("sc"),
        F.sum((xc * xc).cast(T.DecimalType(38, 0))).alias("ssc_dec"),
    )
    ten10 = F.lit(10000000000).cast(T.DecimalType(38, 0))
    split = agg.select(
        "n",
        "sc",
        (F.col("ssc_dec") % ten10).cast("long").alias("ssc_lo"),
        ((F.col("ssc_dec") - F.col("ssc_dec") % ten10) / ten10).cast("long").alias("ssc_hi"),
    )
    mu = F.col("sc") / F.col("n") / 100.0
    ssc_d = F.col("ssc_hi") * 1e10 + F.col("ssc_lo")
    stats = split.select(
        mu.alias("mu"),
        F.sqrt(ssc_d / F.col("n") / 10000.0 - mu * mu).alias("sigma"),
    )
    # broadcast 1-row stats into the stream — the reference's
    # delayed-scalar-into-map pattern (threshold.py item→predicate)
    return li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        x.alias("filter_sum"),
        F.when(x > F.col("mu") - PHI_95 * F.col("sigma"), F.col("l_quantity")).alias(
            "kept_quantity"
        ),
    )


# ---------------------------------------------------------------------------
# A2 + F16 + J3: per-group min/max extents broadcast back for min-max
# normalization (reference src/scip/normalization/quantile_normalization.py:25-107).
# min/max are exact, so (x-min)/(max-min) is bit-identical per row.
# ---------------------------------------------------------------------------
@register(
    "group_minmax_normalize",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           (l.l_quantity - e.qmin) / (e.qmax - e.qmin) AS q_norm
    FROM lineitem l
    JOIN (SELECT l_returnflag, MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
          FROM lineitem GROUP BY l_returnflag) e
      ON l.l_returnflag = e.l_returnflag
    """,
    doc="A2/F16/J3 group extents + broadcast minmax normalize",
)
def group_minmax_normalize(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    extents = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("qmin"), F.max("l_quantity").alias("qmax")
    )
    return li.join(F.broadcast(extents), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        ((F.col("l_quantity") - F.col("qmin")) / (F.col("qmax") - F.col("qmin"))).alias(
            "q_norm"
        ),
    )


# ---------------------------------------------------------------------------
# J1: keyed column-concat of branch outputs. The reference concatenates
# per-mask-method feature frames positionally (src/scip/main.py:268); the
# robust relational form is a key join of the derived frames.
# ---------------------------------------------------------------------------
@register(
    "keyed_branch_concat",
    """
    SELECT a.l_returnflag, a.n_items, a.sum_qty, b.min_price, b.max_price
    FROM (SELECT l_returnflag, COUNT(*) AS n_items,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_returnflag) a
    JOIN (SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
                 MAX(l_extendedprice) AS max_price
          FROM lineitem GROUP BY l_returnflag) b
      ON a.l_returnflag = b.l_returnflag
    """,
    doc="J1 keyed concat of two derived branches",
)
def keyed_branch_concat(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"), dsum("l_quantity").cast("double").alias("sum_qty")
    )
    b = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    return a.join(b, "l_returnflag").select(
        "l_returnflag", "n_items", "sum_qty", "min_price", "max_price"
    )


# ---------------------------------------------------------------------------
# J4: 1→N flatMap (reference to_events, src/scip/segmentation/__init__.py:70-119)
# — relational analogue: explode documents into position-stamped tokens.
# ---------------------------------------------------------------------------
@register(
    "explode_tokens",
    """
    SELECT doc_id, pos, tokens[pos] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) d,
         UNNEST(generate_series(1, len(tokens))) AS u(pos)
    WHERE tokens[pos] <> ''
    """,
    doc="J4 flatMap 1→N via posexplode",
)
def explode_tokens(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
        )
        .filter(F.col("token") != "")
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")
    )


# ---------------------------------------------------------------------------
# Scalar function surface: JSON extraction over the events stream
# (regex-at-load-time analogue, SURVEY §2.6).
# ---------------------------------------------------------------------------
@register(
    "json_extract_events",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
    doc="JSON scalar functions over events",
)
def json_extract_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# ---------------------------------------------------------------------------
# Window functions (engine capability beyond the reference, SURVEY §2.5).
# ---------------------------------------------------------------------------
@register(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
    doc="window top-k per group",
)
def topk_per_group(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "running_sum_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    WHERE o_custkey < 200
    """,
    doc="window running sum (decimal-exact)",
)
def running_sum_per_customer(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Date rollup (time-bucketed aggregation; streaming tumbling analogue is
# in scip_spark.streaming).
# ---------------------------------------------------------------------------
@register(
    "monthly_order_rollup",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
    doc="calendar-bucket rollup",
)
def monthly_order_rollup(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").cast("double").alias("total"))
    )


# ---------------------------------------------------------------------------
# Tumbling-window aggregation over the events stream (batch form; the
# streaming form with watermark lives in scip_spark/streaming/windows.py).
# ---------------------------------------------------------------------------
@register(
    "tumbling_window_events",
    """
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling window agg (batch analogue of streaming)",
)
def tumbling_window_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").cast("double").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sessionization over events: gap > 30 min starts a new session.
# ---------------------------------------------------------------------------
@register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="sessionization via lag + cumulative flag",
)
def sessionize_events(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            lag_ts.isNull()
            | (F.col("ts").cast("long") - lag_ts.cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events")
    )


# ---------------------------------------------------------------------------
# P10: exact-k random sample (reference src/scip/main.py:191-196).
# Seeded md5 order instead of rand(): the "random" permutation is a pure
# function of (seed, key), so the same rows come back on rerun, on
# partition retry, and from the DuckDB oracle — and the top-k executes
# as TakeOrderedAndProject (per-partition heaps + driver merge of k
# rows), never a global sort.
# ---------------------------------------------------------------------------
@register(
    "sample_exact_k",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY md5('sample-v1|' || CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT 100
    """,
    doc="P10 exact-k sample: deterministic seeded-hash order + distributed top-k",
)
def sample_exact_k(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    key = F.md5(
        F.concat_ws("|", F.lit("sample-v1"), F.col("o_orderkey").cast("string"))
    )
    return (
        orders.orderBy(key, "o_orderkey")
        .limit(100)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )
