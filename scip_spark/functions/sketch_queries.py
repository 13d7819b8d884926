"""Oracle-paired queries for the KMV distinct sketch.

KMV is the one sketch family whose estimate is a deterministic
function of the data (given the md5 hash), so DuckDB can reproduce it
bit-exactly from the same constants. HLL/theta register layouts are
engine-specific — those are covered by accuracy-bound pytest tests
(tests/test_scale.py), not oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.functions.sketches import (
    CMS_D,
    CMS_W,
    KMV_K,
    _HASH_SPACE,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from scip_spark.queries import dsum, register, tbl

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


def _kmv_intersection_sql(k: int = KMV_K) -> str:
    return f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority, {_H} AS h FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    sk AS (
      SELECT o_orderpriority, list_slice(list_sort(list(h)), 1, {k}) AS kmv
      FROM hashed GROUP BY o_orderpriority
    ),
    ab AS (
      SELECT (SELECT kmv FROM sk WHERE o_orderpriority = '1-URGENT') AS ka,
             (SELECT kmv FROM sk WHERE o_orderpriority = '2-HIGH') AS kb
    ),
    merged AS (
      SELECT ka, kb,
             list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, {k}) AS ku
      FROM ab
    )
    SELECT CAST(len(list_filter(ku, h -> list_contains(ka, h) AND list_contains(kb, h)))
                AS DOUBLE) / len(ku) AS jaccard_est,
           CASE WHEN len(ku) < {k} THEN CAST(len(ku) AS DOUBLE)
                ELSE {float(k - 1)} / (CAST(ku[{k}] AS DOUBLE) / {_HASH_SPACE})
           END AS union_est,
           CAST(len(list_filter(ku, h -> list_contains(ka, h) AND list_contains(kb, h)))
                AS DOUBLE) / len(ku)
             * CASE WHEN len(ku) < {k} THEN CAST(len(ku) AS DOUBLE)
                    ELSE {float(k - 1)} / (CAST(ku[{k}] AS DOUBLE) / {_HASH_SPACE})
               END AS inter_est
    FROM merged
    """


@register(
    "kmv_intersection_estimate",
    _kmv_intersection_sql(),
    doc="theta-style set operation on KMV sketches: |A∩B| estimated as "
    "J·|A∪B| where J = shared fraction of the union's k-minima — "
    "deterministic, so the approximation itself is oracle-verified",
)
def kmv_intersection_estimate(spark, sf_dir):
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    sk = kmv_sketch(orders, "o_orderpriority", "o_custkey")
    a = sk.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("kmv").alias("ka")
    )
    b = sk.filter(F.col("o_orderpriority") == "2-HIGH").select(F.col("kmv").alias("kb"))
    both = a.crossJoin(F.broadcast(b)).select(
        "ka", "kb", kmv_merge("ka", "kb").alias("ku")
    )
    shared = F.size(
        F.filter(
            F.col("ku"),
            lambda h: F.array_contains(F.col("ka"), h)
            & F.array_contains(F.col("kb"), h),
        )
    )
    j = shared.cast("double") / F.size("ku")
    u = kmv_estimate("ku")
    return both.select(
        j.alias("jaccard_est"), u.alias("union_est"), (j * u).alias("inter_est")
    )


def _kmv_difference_sql(k: int = KMV_K) -> str:
    return f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority, {_H} AS h FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    sk AS (
      SELECT o_orderpriority, list_slice(list_sort(list(h)), 1, {k}) AS kmv
      FROM hashed GROUP BY o_orderpriority
    ),
    ab AS (
      SELECT (SELECT kmv FROM sk WHERE o_orderpriority = '1-URGENT') AS ka,
             (SELECT kmv FROM sk WHERE o_orderpriority = '2-HIGH') AS kb
    ),
    merged AS (
      SELECT ka, kb,
             list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, {k}) AS ku
      FROM ab
    )
    SELECT CAST(len(list_filter(ku, h -> list_contains(ka, h) AND NOT list_contains(kb, h)))
                AS DOUBLE) / len(ku) AS diff_frac,
           CASE WHEN len(ku) < {k} THEN CAST(len(ku) AS DOUBLE)
                ELSE {float(k - 1)} / (CAST(ku[{k}] AS DOUBLE) / {_HASH_SPACE})
           END AS union_est,
           CAST(len(list_filter(ku, h -> list_contains(ka, h) AND NOT list_contains(kb, h)))
                AS DOUBLE) / len(ku)
             * CASE WHEN len(ku) < {k} THEN CAST(len(ku) AS DOUBLE)
                    ELSE {float(k - 1)} / (CAST(ku[{k}] AS DOUBLE) / {_HASH_SPACE})
               END AS diff_est
    FROM merged
    """


@register(
    "kmv_difference_estimate",
    _kmv_difference_sql(),
    doc="theta-style A∖B on KMV sketches: |A∖B| estimated as the "
    "A-only fraction of the union's k-minima times |A∪B| — "
    "deterministic, so the approximation itself is oracle-verified",
)
def kmv_difference_estimate(spark, sf_dir):
    """|A∖B| over o_custkey for priority 1-URGENT minus 2-HIGH — the
    set-difference companion to kmv_intersection_estimate (same
    theta-sketch algebra on the merged k-minima)."""
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    sk = kmv_sketch(orders, "o_orderpriority", "o_custkey")
    a = sk.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("kmv").alias("ka")
    )
    b = sk.filter(F.col("o_orderpriority") == "2-HIGH").select(F.col("kmv").alias("kb"))
    both = a.crossJoin(F.broadcast(b)).select(
        "ka", "kb", kmv_merge("ka", "kb").alias("ku")
    )
    only_a = F.size(
        F.filter(
            F.col("ku"),
            lambda h: F.array_contains(F.col("ka"), h)
            & ~F.array_contains(F.col("kb"), h),
        )
    )
    frac = only_a.cast("double") / F.size("ku")
    u = kmv_estimate("ku")
    return both.select(
        frac.alias("diff_frac"), u.alias("union_est"), (frac * u).alias("diff_est")
    )


@register(
    "hll_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
    doc="HyperLogLog++ distinct counting (approx_count_distinct, "
    "rsd=0.05) verified via the sketch's own error invariant: the "
    "estimate must sit within 3 standard errors of the exact count "
    "(the oracle emits the literal bound alongside the exact count, "
    "which IS hash-checked); the one-pass mergeable sketch is what a "
    "100 TB job runs instead of COUNT(DISTINCT)'s two-phase shuffle",
)
def hll_distinct_users(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    rsd = 0.05
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.lit(3 * rsd) * F.col("n_exact")
            ).alias("approx_ok"),
        )
    )


@register(
    "heavy_hitter_tokens",
    """
    WITH tok AS (
      SELECT u.t AS token
      FROM documents,
           unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS u(t)
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token
    ),
    top5 AS (
      SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 5
    )
    SELECT token, n, TRUE AS in_sketch_topk FROM top5 ORDER BY n DESC, token
    """,
    doc="heavy-hitter detection via the approx_top_k sketch "
    "(space-saving summary, one pass, mergeable): the exact top-5 "
    "tokens and counts are hash-checked, and the sketch's top-10 must "
    "contain every true top-5 item — the frequent-items guarantee a "
    "100 TB profile pass relies on instead of a full groupBy+sort",
)
def heavy_hitter_tokens(spark, sf_dir):
    from scip_spark.functions.text import tokens as tok_col

    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tok_col("text")).alias("token"))
    exact_top5 = (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(5)
    )
    sketch_items = (
        tok.agg(F.expr("approx_top_k(token, 10)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("token"))
    )
    return (
        exact_top5.join(sketch_items, "token", "left_semi")
        .select("token", "n", F.lit(True).alias("in_sketch_topk"))
    )


@register(
    "join_size_estimate",
    """
    WITH oc AS (
      SELECT o_orderkey AS k, COUNT(*) AS co FROM orders GROUP BY 1
    ),
    lc AS (
      SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1
    ),
    joined AS (
      SELECT oc.k, oc.co * lc.cl AS prod,
             CAST(('0x' || substr(md5('joinsz-v1|' || CAST(oc.k AS VARCHAR)), 1, 12))
                  AS BIGINT) % 16 AS bucket
      FROM oc JOIN lc USING (k)
    )
    SELECT CAST(SUM(prod) AS BIGINT) AS exact_size,
           CAST(16 * SUM(CASE WHEN bucket = 0 THEN prod ELSE 0 END) AS BIGINT)
             AS estimated_size,
           abs(CAST(16 * SUM(CASE WHEN bucket = 0 THEN prod ELSE 0 END) AS DOUBLE)
               / SUM(prod) - 1) < 0.2 AS within_20pct
    FROM joined
    """,
    doc="join-cardinality estimation by deterministic 1/16 key sampling "
    "over the per-key count relations (the sketch an optimizer would "
    "consult before picking a join strategy) — exact size, estimate, "
    "and the accuracy invariant in one pass; md5 sampling reproduces "
    "bit-exactly in both engines",
)
def join_size_estimate(spark, sf_dir):
    from scip_spark.functions.corpus import hash_bucket

    oc = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count("*").alias("co"))
    )
    lc = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("cl"))
    )
    joined = oc.join(lc, "k").select(
        (F.col("co") * F.col("cl")).alias("prod"),
        hash_bucket(F.col("k"), "joinsz-v1", 16).alias("bucket"),
    )
    sampled = F.sum(F.when(F.col("bucket") == 0, F.col("prod")).otherwise(0))
    return joined.agg(
        F.sum("prod").cast("long").alias("exact_size"),
        (16 * sampled).cast("long").alias("estimated_size"),
        (
            F.abs((16 * sampled).cast("double") / F.sum("prod") - 1) < 0.2
        ).alias("within_20pct"),
    )


@register(
    "sliding_distinct_users",
    """
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ev),
    x AS (
      SELECT d.day AS end_day, COUNT(DISTINCT e.user_id) AS n_exact
      FROM days d JOIN ev e ON e.day BETWEEN d.day - 6 AND d.day
      GROUP BY 1
    )
    SELECT strftime(end_day, '%Y-%m-%d') AS end_day,
           CAST(n_exact AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM x
    """,
    doc="sliding 7-day distinct users via MERGEABLE HLL day-partials: "
    "one pass over events builds a sketch per day, a calendar-range "
    "window union (rangeBetween on epoch-day — gap-safe) merges 7 "
    "partials per window end. The 100 TB shape: the data is scanned "
    "once; every window reuses the same partials, where exact sliding "
    "COUNT(DISTINCT) would rescan each event into 7 windows. The "
    "estimate must sit within max(5%, 5) of the exact count (lgK=12 "
    "=> 3 sigma ~ 4.9%); the exact side (and the window-end day set) "
    "is hash-checked against the oracle",
)
def sliding_distinct_users(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    # exact sliding distinct: each event covers window-ends day..day+6;
    # explode (bounded 7x) and count distinct per end. Ends beyond the
    # data span are dropped by the inner join below.
    ends = ev.select(
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("end_day"),
        "user_id",
    )
    exact = ends.groupBy("end_day").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    # mergeable path: day partials once, calendar-range window union.
    # The days relation is calendar-bounded (not data-scale), so the
    # single-ordering window is over a tiny relation — same class as
    # order_seasonality's whitelisted per-day window.
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk")
    )
    di = daily.withColumn("d", F.datediff("day", F.lit("1970-01-01").cast("date")))
    w = W.orderBy("d").rangeBetween(-6, 0)
    est = di.withColumn(
        "n_est",
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True)).over(w)),
    ).select(F.col("day").alias("end_day"), "n_est")
    return (
        exact.join(est, "end_day")
        .select(
            F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
            "n_exact",
            (
                F.abs(F.col("n_est") - F.col("n_exact"))
                <= F.greatest(0.05 * F.col("n_exact"), F.lit(5.0))
            ).alias("approx_ok"),
        )
    )


_DYADIC_K, _DYADIC_LMAX = 64, 24


def _dyadic_sql(k: int = _DYADIC_K, lmax: int = _DYADIC_LMAX) -> str:
    return f"""
    WITH leaves AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cell,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    lv AS (
      SELECT l_returnflag, levels.l, leaves.cell >> levels.l AS c
      FROM leaves, (SELECT unnest(range(0, {lmax + 1})) AS l) levels
    ),
    fits AS (
      SELECT l_returnflag, l, COUNT(DISTINCT c) AS n_cells
      FROM lv GROUP BY 1, 2
    ),
    chosen AS (
      -- COALESCE mirrors the Spark-side coarsest-level fallback
      -- (dyadic.py): a group with > k cells even at max_level keeps
      -- its rows at max_level instead of vanishing
      SELECT l_returnflag,
             COALESCE(MIN(l) FILTER (WHERE n_cells <= {k}), {lmax}) AS level
      FROM fits GROUP BY 1
    ),
    sk AS (
      SELECT f.l_returnflag, c.level, f.cell >> c.level AS cell,
             CAST(SUM(f.cnt) AS BIGINT) AS cnt
      FROM leaves f JOIN chosen c USING (l_returnflag)
      GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT *,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY cell) AS cum,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
      FROM sk
    ),
    hit AS (
      SELECT c.l_returnflag, q.q_pct, MIN(c.cell) AS cell
      FROM cum c, (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS q_pct) q
      -- integer form of cum >= ceil(q_pct*n/100): exact, no float div
      WHERE c.cum * 100 >= q.q_pct * c.n
      GROUP BY 1, 2
    )
    SELECT h.l_returnflag, h.q_pct,
           (h.cell << s.level) AS lo_grid,
           ((h.cell + 1) << s.level) - 1 AS hi_grid,
           s.cnt AS rank_slack,
           CAST(s.level AS BIGINT) AS level
    FROM hit h
    JOIN sk s ON s.l_returnflag = h.l_returnflag AND s.cell = h.cell
    """


@register(
    "dyadic_hist_price_quantiles",
    _dyadic_sql(),
    doc="adaptive-resolution dyadic histogram sketch (q-digest class: "
    "deterministic, mergeable semilattice — functions/dyadic.py proof) "
    "over lineitem prices by returnflag; answers p25/p50/p75 as exact "
    "grid-cell bounds with per-answer rank-slack guarantees. The "
    "merge==direct bit-identity and the error-vs-bottom-k comparison "
    "are pinned in tests/test_ranking.py",
)
def dyadic_hist_price_quantiles(spark, sf_dir):
    from scip_spark.functions.dyadic import (
        cents_cell,
        dyadic_quantile_cells,
        dyadic_sketch,
    )

    li = tbl(spark, sf_dir, "lineitem")
    sk = dyadic_sketch(
        li, cents_cell("l_extendedprice"), ["l_returnflag"],
        k=_DYADIC_K, max_level=_DYADIC_LMAX,
    )
    return dyadic_quantile_cells(sk, ["l_returnflag"], [0.25, 0.5, 0.75])


_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


def _cms_sql(d: int = CMS_D, w: int = CMS_W, topn: int = 20) -> str:
    bcols = ", ".join(
        f"CAST(('0x' || substr(md5(t), {1 + 6 * i}, 6)) AS BIGINT) % {w} AS b{i}"
        for i in range(d)
    )
    unions = " UNION ALL ".join(f"SELECT {i} AS i, b{i} AS b FROM hashed" for i in range(d))
    joins = " ".join(
        f"JOIN cms c{i} ON c{i}.i = {i} AND c{i}.b = e.b{i}" for i in range(d)
    )
    least = ", ".join(f"c{i}.cnt" for i in range(d))
    mins = ", ".join(f"min(b{i}) AS b{i}" for i in range(d))
    return f"""
    WITH occ AS (SELECT unnest({_TOKS}) AS t FROM documents),
    hashed AS (SELECT t, {bcols} FROM occ),
    cms AS (SELECT i, b, COUNT(*) AS cnt FROM ({unions}) GROUP BY i, b),
    exact AS (
      SELECT t, COUNT(*) AS exact_cnt, {mins}
      FROM hashed GROUP BY t ORDER BY exact_cnt DESC, t LIMIT {topn}
    )
    SELECT e.t AS token, CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(least({least}) AS BIGINT) AS cms_est
    FROM exact e {joins}
    ORDER BY exact_cnt DESC, token
    """


@register(
    "cms_token_counts",
    _cms_sql(),
    doc="count-min sketch over the token stream (d=4 rows from one "
    "md5's 24-bit chunks, w=8192 counters): per-occurrence pairs "
    "collapse map-side to <= d*w partial counters per task, so the "
    "shuffle is sketch-sized at any corpus size. Integer sums commute "
    "— the sketch is a pure function of the multiset — so the top-20 "
    "tokens' ESTIMATES themselves hash-match DuckDB (a stronger "
    "oracle than any invariant boolean), alongside their exact counts "
    "for the overcount inspection.",
)
def cms_token_counts(spark, sf_dir):
    from scip_spark.functions.sketches import cms_bucket, cms_sketch
    from scip_spark.functions.text import tokens

    occ = (
        tbl(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("t"))
    )
    cms = cms_sketch(occ, "t")
    exact = (
        occ.groupBy("t")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "t")
        .limit(20)
        .select(
            "t", "exact_cnt", *[cms_bucket("t", i).alias(f"b{i}") for i in range(4)]
        )
    )
    e = exact
    for i in range(4):
        ci = cms.filter(F.col("i") == i).select(
            F.col("b").alias(f"bb{i}"), F.col("cnt").alias(f"c{i}")
        )
        e = e.join(F.broadcast(ci), F.col(f"b{i}") == F.col(f"bb{i}"))
    return e.select(
        F.col("t").alias("token"),
        "exact_cnt",
        F.least(*[F.col(f"c{i}") for i in range(4)]).alias("cms_est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter (functions/bloom.py)
# ---------------------------------------------------------------------------

from scip_spark.functions.bloom import BLOOM_K, BLOOM_M  # noqa: E402


def _bloom_sql(k: int = BLOOM_K, m: int = BLOOM_M) -> str:
    idx = ", ".join(f"({i})" for i in range(k))
    pos = (
        f"CAST(('0x' || substr(md5(text), 1 + 6 * i, 6)) AS BIGINT) % {m}"
    )
    return f"""
    WITH train AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
    eval AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    tpos AS (
      SELECT {pos} AS p FROM train, (VALUES {idx}) AS t(i)
    ),
    bloom AS (
      SELECT CAST(p // 32 AS BIGINT) AS word,
             bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
      FROM tpos GROUP BY 1
    ),
    epos AS (
      SELECT doc_id, text, CAST(({pos}) // 32 AS BIGINT) AS word,
             (1::BIGINT << CAST(({pos}) % 32 AS INT)) AS mask
      FROM eval, (VALUES {idx}) AS t(i)
    ),
    probe AS (
      SELECT e.doc_id, e.text,
             bool_and(b.bits IS NOT NULL AND (b.bits & e.mask) = e.mask)
               AS bloom_hit
      FROM epos e LEFT JOIN bloom b ON e.word = b.word
      GROUP BY e.doc_id, e.text
    )
    SELECT p.doc_id, p.bloom_hit,
           COALESCE(p.text IN (SELECT text FROM train), FALSE) AS exact_hit
    FROM probe p
    ORDER BY p.doc_id
    """


@register(
    "bloom_contamination_screen",
    _bloom_sql(),
    doc="mergeable Bloom filter (functions/bloom.py) as a train/eval "
    "contamination screen: the train split's texts build a "
    "m=65536-bit filter (<= 2048 OR-aggregated 32-bit-packed words — the "
    "explode collapses map-side, sketch-sized shuffle at any corpus "
    "size), the eval split probes it via one broadcast join. "
    "Hash-matched oracle: both engines compute identical md5-chunk "
    "bit positions, so the per-doc booleans — including any false "
    "positives — reproduce exactly. No false negatives by "
    "construction (every exact_hit row has bloom_hit; pinned in "
    "tests/test_sketches.py with the merge==direct bit-identity).",
)
def bloom_contamination_screen(spark, sf_dir):
    from scip_spark.functions.bloom import bloom_build, bloom_probe

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)
    bloom = bloom_build(train, "text")
    probed = bloom_probe(ev, "text", bloom)
    exact = (
        ev.join(train.distinct(), "text", "left_semi")
        .select("doc_id", F.lit(True).alias("exact_hit"))
    )
    return (
        probed.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_hit"),
        )
    )


@register(
    "bloom_prefilter_join",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1 ORDER BY 1
    """,
    doc="Bloom join pre-filter — the canonical 100 TB shape: the dim "
    "side's keys (BUILDING-segment customers) build a filter; the "
    "fact scan (orders) drops non-members MAP-SIDE via "
    "bloom_probe_inline (one-row word->bits map crossJoin-broadcast, "
    "closed-form bit checks — zero shuffle of the fact side before "
    "the filter) so only ~segment-share of orders reaches the real "
    "join. The oracle is the PLAIN join: Bloom false positives are "
    "eliminated by the join itself, so the pre-filter is provably "
    "semantics-preserving — the strongest oracle form for a lossy "
    "structure. Plan-asserted map-side in tests/test_sketches.py.",
)
def bloom_prefilter_join(spark, sf_dir):
    from scip_spark.functions.bloom import bloom_build, bloom_probe_inline

    cust = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bloom = bloom_build(cust.select(F.col("c_custkey").alias("key")), "key")
    orders = tbl(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice",
        F.col("o_custkey").alias("key"),
    )
    prefiltered = (
        bloom_probe_inline(orders, "key", bloom)
        .filter(F.col("bloom_hit"))
        .drop("bloom_hit", "key")
    )
    joined = prefiltered.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            # dsum convention (queries.py:90): a double SUM is
            # summation-order-dependent across engines/partitionings;
            # the DECIMAL(18,2) sum is exact and order-free
            (dsum("o_totalprice") * 100).cast("long").alias("revenue_cents"),
        )
    )


def _bloom_auto_sql(k: int = BLOOM_K, target_fpr: float = 1e-3, kmv_k: int = 128) -> str:
    import math

    # the -ln(1 - fpr^{1/k}) constant is inlined as a full-precision
    # literal so the oracle never evaluates pow/log (libm differs in
    # the last ulp across engines); every remaining op in the m
    # selection — division, 4*n, ceil, int-vs-double compare — is
    # bit-identical IEEE in both engines
    c = -math.log(1.0 - target_fpr ** (1.0 / k))
    powers = ", ".join(f"({1 << p})" for p in range(10, 25))
    idx = ", ".join(f"({i})" for i in range(k))
    pos = (
        "CAST(('0x' || substr(md5(text), 1 + 6 * i, 6)) AS BIGINT)"
        " % (SELECT m FROM msel)"
    )
    return f"""
    WITH train AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
    eval AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    hashes AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) AS h
      FROM train WHERE text IS NOT NULL
    ),
    kmins AS (SELECT h FROM hashes ORDER BY h LIMIT {kmv_k}),
    est AS (
      SELECT CASE WHEN COUNT(*) < {kmv_k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(kmv_k - 1)!r} / (MAX(h) / 281474976710656.0)
             END AS n
      FROM kmins
    ),
    msel AS (
      SELECT COALESCE(
        (SELECT MIN(p) FROM (VALUES {powers}) pw(p)
          WHERE CAST(p AS DOUBLE) >= ({k} * ceil(est.n)) / {c!r}),
        16777216) AS m
      FROM est
    ),
    tpos AS (
      SELECT {pos} AS p FROM train, (VALUES {idx}) AS t(i)
    ),
    bloom AS (
      SELECT CAST(p // 32 AS BIGINT) AS word,
             bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
      FROM tpos GROUP BY 1
    ),
    epos AS (
      SELECT doc_id, CAST(({pos}) // 32 AS BIGINT) AS word,
             (1::BIGINT << CAST(({pos}) % 32 AS INT)) AS mask
      FROM eval, (VALUES {idx}) AS t(i)
    )
    SELECT e.doc_id,
           bool_and(b.bits IS NOT NULL AND (b.bits & e.mask) = e.mask)
             AS bloom_hit,
           CAST((SELECT m FROM msel) AS BIGINT) AS m_bits
    FROM epos e LEFT JOIN bloom b ON e.word = b.word
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """


@register(
    "bloom_autosized_screen",
    _bloom_auto_sql(),
    doc="Bloom auto-sizing proven CROSS-ENGINE: both engines derive m "
    "from the same deterministic KMV bottom-128 distinct estimate of "
    "the train split ((k-1)/kth-min-fraction over 48-bit md5 hashes), "
    "pick the same power-of-two via the same comparison ladder "
    "(m >= k*ceil(n)/c with c inlined as a literal — no pow/log on "
    "either side), then hash-match the per-doc screen booleans AND "
    "the chosen m_bits itself. A fixed m saturates at n >> m "
    "(tests/test_sketches.py pins FPR > 0.9 at n=40k vs m=2^10 and "
    "the auto path restoring < 1e-3); this entry is the oracle-paired "
    "witness that the auto path reproduces exactly at any corpus "
    "size. Scale shape: the KMV estimate is a TakeOrdered bottom-k "
    "(bounded driver collect), build/probe identical to "
    "bloom_contamination_screen.",
)
def bloom_autosized_screen(spark, sf_dir):
    from scip_spark.functions.bloom import (
        bloom_auto_m,
        bloom_build,
        bloom_probe,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)
    m = bloom_auto_m(train, "text", kmv_k=128)
    bloom = bloom_build(train, "text", m=m)
    return (
        bloom_probe(ev.select("doc_id", "text"), "text", bloom, m=m)
        .select(
            "doc_id", "bloom_hit", F.lit(m).cast("long").alias("m_bits")
        )
    )


def _bloom_sharded_sql(
    k: int = BLOOM_K,
    target_fpr: float = 1e-3,
    kmv_k: int = 128,
    m_max: int = 1 << 14,
) -> str:
    import math

    # same inlined -ln(1 - fpr^{1/k}) literal as _bloom_auto_sql — no
    # pow/log in either engine; S and m selections are double-division
    # + ceil + compare ladders, IEEE-identical cross-engine
    c = -math.log(1.0 - target_fpr ** (1.0 / k))
    powers = ", ".join(f"({1 << p})" for p in range(10, m_max.bit_length()))
    # shard ladder mirrors bloom_auto_shards exactly: powers 2^0..2^24
    # with a 2^24 terminal fallback (the Python while-loop stops at
    # s == _BLOOM_M_MAX even if the fit condition never holds) — a
    # truncated ladder would silently pick a different S than the
    # engine once the corpus needs S past its top rung
    shard_powers = ", ".join(f"({1 << p})" for p in range(0, 25))
    idx = ", ".join(f"({i})" for i in range(k))
    pos = (
        "CAST(('0x' || substr(md5(text), 1 + 6 * i, 6)) AS BIGINT)"
        " % (SELECT m FROM msel)"
    )
    shard = (
        f"CAST(('0x' || substr(md5(text), {1 + 6 * k}, 6)) AS BIGINT)"
        " % (SELECT s FROM ssel)"
    )
    return f"""
    WITH train AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
    eval AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    hashes AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) AS h
      FROM train WHERE text IS NOT NULL
    ),
    kmins AS (SELECT h FROM hashes ORDER BY h LIMIT {kmv_k}),
    est AS (
      SELECT CASE WHEN COUNT(*) < {kmv_k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(kmv_k - 1)!r} / (MAX(h) / 281474976710656.0)
             END AS n
      FROM kmins
    ),
    ssel AS (
      SELECT COALESCE(
        (SELECT MIN(sp) FROM (VALUES {shard_powers}) sh(sp)
          WHERE ({k} * ceil(est.n / sp)) / {c!r}
                <= CAST({m_max} AS DOUBLE)),
        16777216) AS s
      FROM est
    ),
    msel AS (
      SELECT COALESCE(
        (SELECT MIN(p) FROM (VALUES {powers}) pw(p)
          WHERE CAST(p AS DOUBLE)
                >= ({k} * ceil(est.n / (SELECT s FROM ssel))) / {c!r}),
        {m_max}) AS m
      FROM est
    ),
    tpos AS (
      SELECT {shard} AS shard, {pos} AS p
      FROM train, (VALUES {idx}) AS t(i)
    ),
    bloom AS (
      SELECT shard, CAST(p // 32 AS BIGINT) AS word,
             bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
      FROM tpos GROUP BY 1, 2
    ),
    epos AS (
      SELECT doc_id, {shard} AS shard,
             CAST(({pos}) // 32 AS BIGINT) AS word,
             (1::BIGINT << CAST(({pos}) % 32 AS INT)) AS mask
      FROM eval, (VALUES {idx}) AS t(i)
    )
    SELECT e.doc_id,
           bool_and(b.bits IS NOT NULL AND (b.bits & e.mask) = e.mask)
             AS bloom_hit,
           CAST((SELECT m FROM msel) AS BIGINT) AS m_bits,
           CAST((SELECT s FROM ssel) AS BIGINT) AS n_shards
    FROM epos e LEFT JOIN bloom b ON e.shard = b.shard AND e.word = b.word
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """


@register(
    "bloom_sharded_screen",
    _bloom_sharded_sql(),
    doc="keyspace-SHARDED Bloom screen — the past-the-2^24-clamp "
    "regime (functions/bloom.py:bloom_build_sharded): one filter's m "
    "cannot exceed the 24-bit md5 position-chunk space (~800k keys at "
    "1e-3 FPR), so a 100-TB contamination screen (10^9+ train docs) "
    "hash-partitions the KEYS into S independent filters instead — "
    "route = md5 chunk k mod S, disjoint from the position chunks, so "
    "probes route identically and no-false-negatives holds per shard. "
    "Proven CROSS-ENGINE end to end: both engines derive the KMV "
    "distinct estimate, the shard-count ladder AND the per-shard-m "
    "ladder from the same md5-deterministic arithmetic, then "
    "hash-match the per-doc booleans plus the chosen (m_bits, "
    "n_shards) themselves. This entry lowers m_max to 2^14 so the "
    "shard ladder ENGAGES at test scale (S=8 at sf0.01, 128 at "
    "sf0.1); the production default keeps m_max=2^24, where sharding "
    "starts at ~800k distinct keys — the real-clamp regime is pinned "
    "in tests/test_sketches.py at n=1M with restored FPR and zero "
    "false negatives. Scale shape: identical map-side-collapsing "
    "build as bloom_build with shard prepended to the grouping key; "
    "the filter relation is ≤ S·m/32 rows at any corpus size.",
)
def bloom_sharded_screen(spark, sf_dir):
    from scip_spark.functions.bloom import (
        bloom_build_sharded,
        bloom_probe_sharded,
        bloom_m_of,
        bloom_s_of,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)
    bloom = bloom_build_sharded(
        train, "text", shards="auto", m="auto", m_max=1 << 14, kmv_k=128
    ).localCheckpoint()  # reused by probe + both stamp reads
    m, s = bloom_m_of(bloom), bloom_s_of(bloom)
    return (
        bloom_probe_sharded(ev.select("doc_id", "text"), "text", bloom)
        .select(
            "doc_id",
            "bloom_hit",
            F.lit(m).cast("long").alias("m_bits"),
            F.lit(s).cast("long").alias("n_shards"),
        )
    )


@register(
    "bloom_sharded_screen_streaming",
    _bloom_sharded_sql(),
    doc="bloom_sharded_screen with its S per-shard filters built by "
    "STRUCTURED STREAMING: geometry (S, per-shard m) is derived once "
    "from the same md5-deterministic KMV estimate (in production a "
    "config step — the estimate itself has a driver-checked streaming "
    "twin, kmv_stream_distinct_by_priority), then every micro-batch "
    "contributes stamp-compatible (shard, word, bits, m, s) partials "
    "folded through bloom_merge — the per-(shard, word) OR semilattice "
    "makes the fold bit-identical to the batch build, so this entry "
    "shares the batch oracle SQL verbatim and the driver hash-checks "
    "streamed sharded-filter booleans AND geometry. bloom_merge's "
    "mixed-geometry guard (ADVICE r10) is load-bearing here: a batch "
    "built with drifted m/s fails loudly instead of silently "
    "corrupting the fold.",
)
def bloom_sharded_screen_streaming(spark, sf_dir):
    import shutil

    from scip_spark.functions.bloom import (
        bloom_auto_shards,
        bloom_build_sharded,
        bloom_merge,
        bloom_probe_sharded,
        bloom_required_m,
        _kmv_estimate,
    )
    import math

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)

    # geometry once, from the deterministic KMV estimate (mirrors the
    # batch entry's lowered m_max so the shard ladder engages)
    m_max = 1 << 14
    n_est = _kmv_estimate(train, "text", kmv_k=128)
    s = bloom_auto_shards(n_est, m_max=m_max)
    m = bloom_required_m(math.ceil(n_est / s), m_max=m_max)

    tmp = _split_to_tmp(train, key="text")
    try:
        bloom = _stream_fold(
            spark,
            tmp,
            "text string",
            lambda bdf: bloom_build_sharded(bdf, "text", shards=s, m=m),
            bloom_merge,
            "shard bigint, word bigint, bits bigint, m bigint, s bigint",
            lambda df: [
                (r["shard"], r["word"], r["bits"], r["m"], r["s"])
                for r in df.collect()
            ],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        bloom_probe_sharded(ev.select("doc_id", "text"), "text", bloom)
        .select(
            "doc_id",
            "bloom_hit",
            F.lit(m).cast("long").alias("m_bits"),
            F.lit(s).cast("long").alias("n_shards"),
        )
    )


@register(
    "bloom_screen_streaming",
    _bloom_sql(),
    doc="the contamination screen with its filter built by STRUCTURED "
    "STREAMING: the train split ingests as a 3-file parquet stream "
    "(availableNow), each micro-batch contributes a partial filter, "
    "and the driver folds them through bloom_merge — bitwise OR is an "
    "idempotent semilattice, so the folded filter is BIT-IDENTICAL to "
    "the batch build and the query shares the batch entry's oracle "
    "SQL verbatim. The first registry entry whose STREAMING result is "
    "driver-hash-checked (the pytest twins prove the same property "
    "in-suite; this surfaces it in CORRECTNESS).",
)
def bloom_screen_streaming(spark, sf_dir):
    import shutil

    from scip_spark.functions.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)

    tmp = _split_to_tmp(train, key="text")
    try:
        bloom = _stream_fold(
            spark,
            tmp,
            "text string",
            lambda bdf: bloom_build(bdf, "text"),
            bloom_merge,
            "word bigint, bits bigint",
            lambda df: [(r["word"], r["bits"]) for r in df.collect()],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    probed = bloom_probe(ev, "text", bloom)
    exact = (
        ev.join(train.distinct(), "text", "left_semi")
        .select("doc_id", F.lit(True).alias("exact_hit"))
    )
    return (
        probed.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_hit"),
        )
    )


def _stream_fold(
    spark,
    src_dir: str,
    schema: str,
    build_part,
    merge,
    row_schema: str,
    to_rows,
    fold_every: int = 8,
):
    """availableNow file-stream fold of a semilattice sketch: each
    micro-batch contributes a partial relation (collected — partials
    are sketch-sized by construction) which is APPENDED to a pending
    list; pending partials collapse through ``merge`` only once every
    ``fold_every`` micro-batches (and once at the end), so the driver
    runs O(batches / fold_every) merge jobs over bounded-size stacks
    instead of one per batch — a 100k-file stream costs ~batches/8
    sketch-sized jobs, not a per-batch driver hot loop. Merge order is
    irrelevant by the semilattice property (merge==direct pinned per
    operator), so the result stays bit-identical to the batch build."""
    pending: list[list] = []

    def collapse():
        stacked = spark.createDataFrame(
            [r for part in pending for r in part], row_schema
        )
        pending[:] = [to_rows(merge(stacked))]

    def fold(batch_df, _bid):
        rows = to_rows(build_part(batch_df))
        if rows:
            pending.append(rows)
        if len(pending) >= fold_every:
            collapse()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        # a timed-out fold would silently return a PARTIAL sketch (and
        # the caller's cleanup would delete the source under the
        # still-running query) — fail loudly instead
        q.stop()
        raise RuntimeError("stream fold did not finish within 600s")
    if len(pending) > 1:  # single/zero-part stacks need no merge job
        collapse()
    return spark.createDataFrame(pending[0] if pending else [], row_schema)


def _split_to_tmp(df, parts: int = 3, key: str | None = None):
    """Write df as `parts` parquet files (one per micro-batch)."""
    import tempfile

    from pyspark.sql import functions as F  # noqa: F811

    tmp = tempfile.mkdtemp(prefix="sketch_stream_src_")
    h = F.pmod(F.xxhash64(key or df.columns[0]), F.lit(parts))
    for p in range(parts):
        df.filter(h == p).coalesce(1).write.mode("append").parquet(tmp)
    return tmp


@register(
    "dyadic_stream_price_quantiles",
    _dyadic_sql(),
    doc="dyadic_hist_price_quantiles with the sketch built by "
    "Structured Streaming: per-micro-batch dyadic sketches fold "
    "through dyadic_merge (true semilattice — merged==direct "
    "bit-identity proven in functions/dyadic.py), so the streaming "
    "entry shares the batch query's oracle SQL verbatim and the "
    "driver hash-checks the streaming quantile answers.",
)
def dyadic_stream_price_quantiles(spark, sf_dir):
    import shutil

    from scip_spark.functions.dyadic import (
        cents_cell,
        dyadic_merge,
        dyadic_quantile_cells,
        dyadic_sketch,
    )

    li = tbl(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    tmp = _split_to_tmp(li, key="l_extendedprice")
    try:
        sk = _stream_fold(
            spark,
            tmp,
            "l_returnflag string, l_extendedprice double",
            lambda bdf: dyadic_sketch(
                bdf, cents_cell("l_extendedprice"), ["l_returnflag"],
                k=_DYADIC_K, max_level=_DYADIC_LMAX,
            ),
            lambda parts: dyadic_merge(
                parts, ["l_returnflag"], k=_DYADIC_K, max_level=_DYADIC_LMAX
            ),
            "l_returnflag string, level int, cell bigint, cnt bigint",
            lambda df: [
                (r["l_returnflag"], r["level"], r["cell"], r["cnt"])
                for r in df.collect()
            ],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return dyadic_quantile_cells(sk, ["l_returnflag"], [0.25, 0.5, 0.75])


@register(
    "cms_stream_token_counts",
    _cms_sql(),
    doc="cms_token_counts with the count-min counters built by "
    "Structured Streaming: per-micro-batch sketches fold by plain "
    "integer addition per (row, bucket) — sums commute, so the folded "
    "counters are bit-identical to the batch sketch (the in-suite "
    "streaming twin proves it per micro-batch) and the entry shares "
    "the batch query's oracle SQL. Top-20 exact counts come from the "
    "batch table; only the sketch side streams.",
)
def cms_stream_token_counts(spark, sf_dir):
    import shutil

    from scip_spark.functions.sketches import cms_bucket, cms_sketch
    from scip_spark.functions.text import tokens

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = _split_to_tmp(docs, key="doc_id")
    try:
        cms = _stream_fold(
            spark,
            tmp,
            "doc_id bigint, text string",
            lambda bdf: cms_sketch(
                bdf.select(F.explode(tokens("text")).alias("t")), "t"
            ),
            lambda parts: parts.groupBy("i", "b").agg(
                F.sum("cnt").cast("long").alias("cnt")
            ),
            "i int, b bigint, cnt bigint",
            lambda df: [(r["i"], r["b"], r["cnt"]) for r in df.collect()],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    occ = docs.select(F.explode(tokens("text")).alias("t"))
    exact = (
        occ.groupBy("t")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "t")
        .limit(20)
        .select(
            "t", "exact_cnt", *[cms_bucket("t", i).alias(f"b{i}") for i in range(4)]
        )
    )
    e = exact
    for i in range(4):
        ci = cms.filter(F.col("i") == i).select(
            F.col("b").alias(f"bb{i}"), F.col("cnt").alias(f"c{i}")
        )
        e = e.join(F.broadcast(ci), F.col(f"b{i}") == F.col(f"bb{i}"))
    return e.select(
        F.col("t").alias("token"),
        "exact_cnt",
        F.least(*[F.col(f"c{i}") for i in range(4)]).alias("cms_est"),
    )


@register(
    "kmv_stream_distinct_by_priority",
    _kmv_sql(),
    doc="kmv_distinct_by_priority with the per-priority KMV sketches "
    "built by Structured Streaming: each micro-batch's per-group "
    "k-minima fold through slice(array_sort(array_distinct(flatten)))"
    " — set-union + k-smallest is an idempotent semilattice, so the "
    "folded sketch (and hence the ESTIMATE) is bit-identical to the "
    "batch build and shares its oracle SQL. Fourth streaming entry "
    "the driver hash-checks.",
)
def kmv_stream_distinct_by_priority(spark, sf_dir):
    import shutil

    orders = tbl(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    tmp = _split_to_tmp(orders, key="o_custkey")
    try:
        sk = _stream_fold(
            spark,
            tmp,
            "o_orderpriority string, o_custkey bigint",
            lambda bdf: kmv_sketch(bdf, "o_orderpriority", "o_custkey"),
            lambda parts: parts.groupBy("o_orderpriority").agg(
                F.slice(
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list("kmv")))
                    ),
                    1,
                    KMV_K,
                ).alias("kmv")
            ),
            "o_orderpriority string, kmv array<bigint>",
            lambda df: [(r["o_orderpriority"], r["kmv"]) for r in df.collect()],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return sk.select(
        "o_orderpriority",
        F.size("kmv").cast("long").alias("sketch_size"),
        kmv_estimate("kmv").alias("est_distinct"),
    )
