"""Higher-moment and robust statistics (A5 parity: the reference's
11-stat intensity family includes skew, kurtosis, MAD — here as
relational aggregations with engine-exact formulations).

skew/kurtosis are computed from exact DECIMAL power sums with one
final double expression — NOT the built-in skewness()/kurtosis()
aggregates, whose bias corrections and accumulation order differ
between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from scip_spark.queries import register, tbl

DECP = T.DecimalType(38, 6)


def _power_sums(colname: str):
    x = F.col(colname)
    return [
        F.count("*").alias("n"),
        F.sum(x.cast(T.DecimalType(18, 2))).cast("double").alias("s1"),
        F.sum((x * x).cast(DECP)).cast("double").alias("s2"),
        F.sum((x * x * x).cast(DECP)).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast(DECP)).cast("double").alias("s4"),
    ]


@register(
    "higher_moments_by_flag",
    """
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           m AS mean_qty,
           v AS var_pop,
           ((s3 / n) - 3 * m * (s2 / n) + 2 * (m * m * m)) / (v * sqrt(v)) AS skew_pop,
           ((s4 / n) - 4 * m * (s3 / n) + 6 * (m * m) * (s2 / n) - 3 * (m * m * m * m))
             / (v * v) - 3 AS kurt_pop
    FROM (SELECT *, s1 / n AS m, (s2 / n) - (s1 / n) * (s1 / n) AS v FROM sums)
    """,
    doc="A5 skew/kurtosis from exact power sums (engine-neutral)",
)
def higher_moments_by_flag(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(*_power_sums("l_quantity"))
    n, s1, s2, s3, s4 = (F.col(c) for c in ["n", "s1", "s2", "s3", "s4"])
    m = s1 / n
    var = (s2 / n) - m * m
    skew = ((s3 / n) - 3 * m * (s2 / n) + 2 * (m * m * m)) / (var * F.sqrt(var))
    kurt = (
        (s4 / n) - 4 * m * (s3 / n) + 6 * (m * m) * (s2 / n) - 3 * (m * m * m * m)
    ) / (var * var) - 3
    return sums.select(
        "l_returnflag",
        "n",
        m.alias("mean_qty"),
        var.alias("var_pop"),
        skew.alias("skew_pop"),
        kurt.alias("kurt_pop"),
    )


@register(
    "mad_by_flag",
    """
    WITH med AS (
      SELECT l_returnflag, l_extendedprice AS median_price
      FROM (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem) t
      WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ),
    devs AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - m.median_price) AS dev,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    )
    SELECT l_returnflag, dev AS mad
    FROM (
      SELECT l_returnflag, dev,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY dev, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM devs) t
    WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    """,
    doc="A5 MAD: two-pass discrete median of absolute deviations",
)
def mad_by_flag(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")

    def disc_median(df, value_col, out_name):
        w = W.partitionBy("l_returnflag").orderBy(value_col, "l_orderkey", "l_linenumber")
        wc = W.partitionBy("l_returnflag")
        ranked = df.select(
            "l_returnflag",
            F.col(value_col),
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        return ranked.filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")).select(
            "l_returnflag", F.col(value_col).alias(out_name)
        )

    med = disc_median(li, "l_extendedprice", "median_price")
    devs = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("median_price")).alias("dev"),
        "l_orderkey",
        "l_linenumber",
    )
    return disc_median(devs, "dev", "mad")


@register(
    "approx_percentile_prices",
    """
    SELECT l_returnflag, TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Greenwald-Khanna approximate percentiles (mergeable quantile "
    "summaries — the at-scale alternative to an exact global sort), "
    "verified via the sketch's own rank-error invariant: for each "
    "flag/percentile, count(x < v)/n <= p + eps and count(x <= v)/n >= "
    "p - eps with eps = 2/accuracy; the oracle emits the literal bound",
)
def approx_percentile_prices(spark, sf_dir):
    """Per-flag p50/p90/p99 of l_extendedprice via percentile_approx
    (one pass, bounded memory, mergeable across partitions), then a
    second pass re-joins the 3-row sketch output (broadcast) to verify
    the GK rank guarantee engine-side. The exact `percentile` twin is
    what median_price_by_flag oracle-checks; this entry covers — and
    now hash-checks — the sketch path a 100 TB job would actually run."""
    li = tbl(spark, sf_dir, "lineitem")
    acc = 10_000
    eps = 2.0 / acc
    pcts = (
        li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], acc).alias("pcts"))
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
    )
    x = F.col("l_extendedprice")

    def ok(p: float, vcol: str):
        # after the broadcast join every row carries its flag's sketch
        # value, so the rank check is plain conditional aggregation
        n = F.count("*")
        frac_lt = F.sum(F.when(x < F.col(vcol), 1).otherwise(0)) / n
        frac_le = F.sum(F.when(x <= F.col(vcol), 1).otherwise(0)) / n
        return (frac_lt <= p + eps) & (frac_le >= p - eps)

    return (
        li.join(F.broadcast(pcts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            ok(0.5, "p50").alias("p50_ok"),
            ok(0.9, "p90").alias("p90_ok"),
            ok(0.99, "p99").alias("p99_ok"),
        )
    )


@register(
    "regression_trend_by_priority",
    """
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS x,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           (CAST(sy AS DOUBLE)
            - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM s
    """,
    doc="distributed OLS trend per group: slope/intercept of daily "
    "revenue vs epoch day from five EXACT integer/decimal sums (one "
    "partial+final aggregation — the closed-form normal equations, no "
    "iterative solver), with one final double division per output so "
    "the floats are engine-exact; built-in regr_slope would accumulate "
    "doubles in partial-aggregation order and drift",
)
def regression_trend_by_priority(spark, sf_dir):
    dec38 = T.DecimalType(38, 0)
    orders = tbl(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority",
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("x"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    s = daily.groupBy("o_orderpriority").agg(
        F.count("*").cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_days"),
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


@register(
    "correlation_pricing",
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             CAST(round(l_quantity * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM base GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
    FROM s
    """,
    doc="Pearson correlation from six exact decimal sums (map-side "
    "combinable, order-independent) with IEEE-correctly-rounded sqrt "
    "and one final division — engine-exact where built-in corr()'s "
    "double accumulation is partial-order-dependent; the per-group "
    "feature-correlation profile of a tabular training pipeline",
)
def correlation_pricing(spark, sf_dir):
    dec38 = T.DecimalType(38, 0)
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x").cast(dec38) * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x").cast(dec38) * F.col("x")).cast(dec38).alias("sxx"),
        F.sum(F.col("y").cast(dec38) * F.col("y")).cast(dec38).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (num / (denx * deny)).alias("pearson_r"),
    )
