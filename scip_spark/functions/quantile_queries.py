"""Oracle-paired queries for the mergeable bottom-k quantile sketch.

Because the sketch is a deterministic function of the data (md5 row
hashes), DuckDB reproduces the identical sample — the approximation
itself is hash-checked, which no randomized quantile sketch
(KLL/t-digest/GK) permits. See functions/quantiles.py for the design.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scip_spark.functions.quantiles import (
    QS_K,
    qsketch,
    qsketch_merge,
    qsketch_quantile,
    qsketch_values,
)
from scip_spark.queries import register, tbl

# DuckDB fragments built from the same constants as the Spark side
_H_ORD = "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)"
_H_DOC = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"


def _q_el(q: float) -> str:
    return f"vals[CAST(greatest(1, ceil({q} * len(vals))) AS BIGINT)]"


def _prices_sql(k: int = QS_K) -> str:
    return f"""
    WITH base AS (
      SELECT o_orderpriority, {_H_ORD} AS h,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    sk AS (
      SELECT o_orderpriority,
             list_sort(list_transform(
               list_slice(list_sort(list({{'h': h, 'v': v}})), 1, {k}),
               x -> x.v)) AS vals
      FROM (SELECT DISTINCT o_orderpriority, h, v FROM base)
      GROUP BY o_orderpriority
    ),
    est AS (
      SELECT o_orderpriority, CAST(len(vals) AS BIGINT) AS m,
             {_q_el(0.25)} AS est_p25, {_q_el(0.5)} AS est_p50,
             {_q_el(0.75)} AS est_p75, {_q_el(0.95)} AS est_p95
      FROM sk
    )
    SELECT e.o_orderpriority, e.m, e.est_p25, e.est_p50, e.est_p75, e.est_p95,
           CAST(SUM(CASE WHEN b.v <= e.est_p50 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS p50_rank_frac
    FROM est e JOIN base b USING (o_orderpriority)
    GROUP BY e.o_orderpriority, e.m, e.est_p25, e.est_p50, e.est_p75, e.est_p95
    """


@register(
    "quantile_sketch_prices",
    _prices_sql(),
    doc="mergeable bottom-k quantile sketch (k=256 md5-sampled rows per "
    "group) over order prices: p25/p50/p75/p95 estimates are "
    "deterministic, so the approximation itself is oracle-verified; "
    "p50_rank_frac re-ranks the median estimate against the full data "
    "(~0.5 ± 1/sqrt(k)) — the scale path for percentiles that neither "
    "global-sorts nor buffers a group in aggregation state",
)
def quantile_sketch_prices(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        "o_orderpriority", F.col("o_orderkey"), cents.alias("v")
    )
    sk = qsketch(base, "v", "o_orderkey", group="o_orderpriority")
    est = sk.select(
        "o_orderpriority",
        F.size("qsk").cast("long").alias("m"),
        qsketch_values("qsk").alias("vals"),
    ).select(
        "o_orderpriority",
        "m",
        qsketch_quantile("vals", 0.25).alias("est_p25"),
        qsketch_quantile("vals", 0.5).alias("est_p50"),
        qsketch_quantile("vals", 0.75).alias("est_p75"),
        qsketch_quantile("vals", 0.95).alias("est_p95"),
    )
    # rank-check the median estimate against the full relation: the
    # estimate table is one row per group — broadcast, no shuffle of
    # the fact side beyond the final per-group aggregation
    joined = base.join(F.broadcast(est), "o_orderpriority")
    return joined.groupBy(
        "o_orderpriority", "m", "est_p25", "est_p50", "est_p75", "est_p95"
    ).agg(
        (
            F.sum(F.when(F.col("v") <= F.col("est_p50"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("p50_rank_frac")
    )


def _rollup_sql(k: int = QS_K) -> str:
    return f"""
    WITH base AS (
      SELECT lang, {_H_DOC} AS h, n_chars AS v FROM documents
    ),
    sk AS (
      SELECT list_sort(list_transform(
               list_slice(list_sort(list({{'h': h, 'v': v}})), 1, {k}),
               x -> x.v)) AS vals
      FROM (SELECT DISTINCT h, v FROM base)
    )
    SELECT CAST(len(vals) AS BIGINT) AS m,
           {_q_el(0.5)} AS est_p50, {_q_el(0.9)} AS est_p90,
           TRUE AS merged_equals_direct
    FROM sk
    """


@register(
    "quantile_sketch_rollup",
    _rollup_sql(),
    doc="quantile-sketch mergeability: per-language sketches folded "
    "through the bottom-k semilattice must equal the sketch built "
    "directly over the whole corpus (merged_equals_direct is computed, "
    "not assumed, on the Spark side) — the partition → executor → "
    "global rollup a 100 TB percentile job runs",
)
def quantile_sketch_rollup(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    per_lang = qsketch(docs, "n_chars", "doc_id", group="lang")
    empty = F.array().cast(per_lang.schema["qsk"].dataType)
    merged = per_lang.groupBy().agg(
        F.aggregate(
            F.collect_list("qsk"), empty, lambda acc, s: qsketch_merge(acc, s)
        ).alias("mqsk")
    )
    direct = qsketch(docs, "n_chars", "doc_id", group=None)
    both = merged.crossJoin(F.broadcast(direct))
    return both.select(
        F.size("mqsk").cast("long").alias("m"),
        qsketch_quantile(qsketch_values("mqsk"), 0.5).alias("est_p50"),
        qsketch_quantile(qsketch_values("mqsk"), 0.9).alias("est_p90"),
        (F.col("mqsk") == F.col("qsk")).alias("merged_equals_direct"),
    )


def _bins_sql(k: int = QS_K) -> str:
    deciles = [i / 10 for i in range(1, 10)]
    cut_list = ", ".join(_q_el(q) for q in deciles)
    return f"""
    WITH base AS (
      SELECT doc_id, {_H_DOC} AS h, n_chars AS v FROM documents
    ),
    sk AS (
      SELECT list_sort(list_transform(
               list_slice(list_sort(list({{'h': h, 'v': v}})), 1, {k}),
               x -> x.v)) AS vals
      FROM (SELECT DISTINCT h, v FROM base)
    ),
    cuts AS (SELECT [{cut_list}] AS cs FROM sk)
    SELECT len(list_filter(cuts.cs, x -> x <= d.n_chars)) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM documents d, cuts
    GROUP BY 1
    """


@register(
    "quality_quantile_bins",
    _bins_sql(),
    doc="curriculum binning: every document assigned a decile bin by "
    "comparing its length against the 9 sketch-estimated decile cuts "
    "(one tiny broadcast array) — the production pattern for "
    "quality-bucketed sampling at 100 TB where exact per-decile "
    "boundaries would need a global sort; bins and their stats are "
    "oracle-verified because the sketch is deterministic",
)
def quality_quantile_bins(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    sk = qsketch(docs, "n_chars", "doc_id", group=None)
    cuts = sk.select(
        F.array(
            *[
                qsketch_quantile(qsketch_values("qsk"), i / 10)
                for i in range(1, 10)
            ]
        ).alias("cs")
    )
    binned = docs.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        F.size(F.filter(F.col("cs"), lambda x: x <= F.col("n_chars"))).cast("long"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
    )


# ---------------------------------------------------------------------------
# KLL (deterministic-compaction) — invariant-boolean oracle
# ---------------------------------------------------------------------------

_KLL_QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
_KLL_K = 256
#: generous vs the randomized paper constant (~1.65%/k at 99%): the
#: deterministic alternating coin loses the probabilistic proof, so the
#: gate is set at 4/k — tests/test_kll.py pins much tighter empirically
_KLL_EPS = 4.0 / _KLL_K


def _kll_oracle_sql() -> str:
    rows = ", ".join(f"({q}, TRUE)" for q in _KLL_QS)
    return (
        "SELECT CAST(q AS DOUBLE) AS q, within_bound "
        f"FROM (VALUES {rows}) AS t(q, within_bound) ORDER BY q"
    )


@register(
    "kll_quantile_prices",
    _kll_oracle_sql(),
    doc="KLL sketch (functions/kll.py) over l_extendedprice: "
    "O(1/eps)-space quantiles with NO shuffle of the value column "
    "(one sketch per partition, driver fold). Order-dependent "
    "compaction means no SQL engine reproduces the sketch itself, so "
    "the oracle uses the ANN queries' invariant-boolean pattern: the "
    "same job re-ranks each estimate against the EXACT ranks and "
    "emits within_bound booleans the oracle pins to TRUE.",
)
def kll_quantile_prices(spark, sf_dir):
    from scip_spark.functions.kll import kll_build

    li = tbl(spark, sf_dir, "lineitem").select("l_extendedprice")
    sk = kll_build(li, "l_extendedprice", _KLL_K)
    if sk.count == 0:
        # all-null/NaN column: no sketch to check — n=0 satisfies any
        # rank bound vacuously, mirroring the oracle's constant rows
        # (same contract as the grouped variant's sketchless groups)
        return spark.createDataFrame(
            [(float(q), True) for q in _KLL_QS], "q double, within_bound boolean"
        )
    ests = sk.quantiles(_KLL_QS)
    # exact rank interval of every estimate in ONE aggregate pass:
    # the q-quantile target must fall within [count(<v)+1, count(<=v)]
    # up to eps*n slack. n counts exactly what the sketch ingested —
    # non-null, non-NaN doubles — so the bound check stays consistent
    # on columns with nulls/NaNs (kll_build drops both)
    c = F.col("l_extendedprice").cast("double")
    aggs = [F.sum((c.isNotNull() & ~F.isnan(c)).cast("long")).alias("n")]
    for i, v in enumerate(ests):
        aggs.append(F.sum((c < F.lit(v)).cast("long")).alias(f"lt_{i}"))
        aggs.append(F.sum((c <= F.lit(v)).cast("long")).alias(f"le_{i}"))
    row = li.agg(*aggs)
    checks = []
    for i, q in enumerate(_KLL_QS):
        target = F.ceil(F.lit(q) * F.col("n")).cast("long")
        lo, hi = F.col(f"lt_{i}") + F.lit(1), F.col(f"le_{i}")
        err = F.greatest(F.lit(0).cast("long"), lo - target, target - hi)
        checks.append(
            F.struct(
                F.lit(float(q)).alias("q"),
                (err.cast("double") <= F.lit(_KLL_EPS) * F.col("n")).alias(
                    "within_bound"
                ),
            )
        )
    return (
        row.select(F.explode(F.array(*checks)).alias("s"))
        .select("s.q", "s.within_bound")
    )


_KLL_GROUP_QS = [0.25, 0.5, 0.75, 0.95]


def _kll_group_oracle_sql() -> str:
    rows = ", ".join(f"({q})" for q in _KLL_GROUP_QS)
    return (
        "SELECT o_orderpriority, CAST(q AS DOUBLE) AS q, TRUE AS within_bound "
        "FROM (SELECT DISTINCT o_orderpriority FROM orders) "
        f"CROSS JOIN (VALUES {rows}) AS t(q) "
        "ORDER BY o_orderpriority, q"
    )


@register(
    "kll_quantiles_by_priority",
    _kll_group_oracle_sql(),
    doc="grouped KLL: o_totalprice quantiles per order priority — the "
    "'p99 per service' shape at O(1/eps) state per group. Build is "
    "map-side combined (one sketch per (partition, group) via "
    "mapInPandas — values never shuffle; only ~3k-item sketch rows "
    "do), partials merge per group in pid order. Same "
    "invariant-boolean oracle as kll_quantile_prices, checked PER "
    "GROUP via one broadcast-joined aggregate pass.",
)
def kll_quantiles_by_priority(spark, sf_dir):
    from scip_spark.functions.kll import kll_build_by_group

    orders = tbl(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    sks = kll_build_by_group(orders, "o_totalprice", "o_orderpriority", _KLL_K)
    est = spark.createDataFrame(
        [(g, float(q), sks[g].quantile(q)) for g in sorted(sks) for q in _KLL_GROUP_QS],
        "g string, q double, est double",
    )
    # ADVICE r8: a group whose values are all null/NaN produces NO
    # sketch, and an inner join on est would silently drop it while the
    # oracle's DISTINCT o_orderpriority still lists it. Enumerate the
    # (group x q) grid from the data and LEFT-join the estimates, so a
    # sketchless group emits within_bound=TRUE (n=0 satisfies any rank
    # bound vacuously). Not reachable on TPC-H (o_totalprice non-null)
    # but required for reuse on nullable columns.
    grid = (
        orders.select(F.col("o_orderpriority").alias("g"))
        .distinct()
        .select(
            "g",
            F.explode(
                F.array(*[F.lit(float(q)) for q in _KLL_GROUP_QS])
            ).alias("q"),
        )
    )
    full = grid.join(est, ["g", "q"], "left")
    c = F.col("o_totalprice").cast("double")
    agg = (
        orders.join(F.broadcast(full), F.col("o_orderpriority") == F.col("g"))
        .groupBy("g", "q", "est")
        .agg(
            F.sum((c.isNotNull() & ~F.isnan(c)).cast("long")).alias("n"),
            F.sum((c < F.col("est")).cast("long")).alias("lt"),
            F.sum((c <= F.col("est")).cast("long")).alias("le"),
        )
    )
    target = F.ceil(F.col("q") * F.col("n")).cast("long")
    err = F.greatest(
        F.lit(0).cast("long"), F.col("lt") + F.lit(1) - target, target - F.col("le")
    )
    return agg.select(
        F.col("g").alias("o_orderpriority"),
        "q",
        F.coalesce(
            err.cast("double") <= F.lit(_KLL_EPS) * F.col("n"),
            F.lit(True),
        ).alias("within_bound"),
    )
