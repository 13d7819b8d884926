"""Training-corpus construction operators: deterministic splits,
hash sampling, per-group quotas, mixture upsampling, and token-budget
shard packing.

These are the ops a 100 TB pretraining pipeline runs AFTER cleaning and
dedup (functions/text.py, functions/dedup.py): assign every document a
stable train/val/test split, cap over-represented groups, replicate
under-represented sources by their mixture epoch count, and pack the
result into fixed-budget shards for the trainer.

Design rules:
- Every assignment is a PURE FUNCTION of (seed, key) via md5 — no rand()
  anywhere, so reruns, backfills and per-partition retries agree, and
  the DuckDB oracle reproduces results bit-exactly (md5 + substr + the
  same integer arithmetic).
- No driver-side state and no global windows except over per-bucket
  OFFSET tables (P rows, broadcast) — the shard packer does a
  distributed cumulative sum as bucket-local window + tiny offset join,
  never a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.functions.text import tokens

SPLIT_BUCKETS = 10_000


def hash_bucket(col: Column, seed: str, buckets: int = SPLIT_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets): 12 hex chars (48 bits) of
    md5(seed|key) mod buckets. Pure, engine-reproducible (DuckDB:
    CAST('0x'||substr(md5(...),1,12) AS BIGINT) % buckets)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), col.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return h % buckets


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    seed: str = "split-v1",
) -> DataFrame:
    """Stable train/val/test assignment: bucket(seed|key) against the
    cumulative weight boundaries. Adding data later never moves an
    existing document across splits (the property rand() lacks)."""
    bucket = hash_bucket(F.col(key_col), seed)
    cum = 0
    expr = None
    for name, w in weights[:-1]:
        cum += int(round(w * SPLIT_BUCKETS))
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0])
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic fraction sample: keep keys whose bucket falls below
    fraction*buckets. Unlike df.sample(), membership is a function of
    the key — stable across reruns, joinable across tables sampled with
    the same seed (correlated sampling)."""
    return df.filter(
        hash_bucket(F.col(key_col), seed) < int(round(fraction * SPLIT_BUCKETS))
    )


def quota_per_group(
    df: DataFrame,
    group_col: str = "lang",
    cap: int = 100,
    key_col: str = "doc_id",
    seed: str = "quota-v1",
) -> DataFrame:
    """Cap each group at ``cap`` rows, chosen by deterministic hash
    order (an unbiased, stable subset — not "first files scanned").
    The rank filter triggers Catalyst's WindowGroupLimit pushdown
    (plan-asserted in tests): every map task keeps only its local
    top-``cap`` per group BEFORE the exchange, so shuffle volume per
    group is bounded by cap x tasks regardless of group skew."""
    order = hash_bucket(F.col(key_col), seed)
    w = W.partitionBy(group_col).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("qrank", F.row_number().over(w))
        .filter(F.col("qrank") <= cap)
        .drop("qrank")
    )


def stratified_exact_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "strat-v1",
) -> DataFrame:
    """EXACTLY ``k`` rows, stratified proportionally to group sizes via
    Hamilton (largest-remainder) apportionment — the standard way to
    cut a fixed-size eval set that mirrors the corpus mix: every group
    gets ``floor(k·c_g/C)`` seats, and the ``k − Σfloor`` residual
    seats go to the largest remainders ``(k·c_g) mod C`` (ties broken
    by group name). Per-group membership is then the deterministic
    md5-order top-quota, so the sample is rerun-stable and every step
    is integer/md5 arithmetic — bit-reproducible in any engine.

    Plan shape: group counts are one map-side-combined aggregation to a
    G-row relation; the apportionment window runs over those G rows
    (bounded — G = #groups, not data); quotas broadcast back onto the
    per-group hash-order row_number, whose rank filter triggers
    WindowGroupLimit pushdown exactly like :func:`quota_per_group`
    (map-local top-quota before the exchange)."""
    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("c"))
    totals = counts.agg(F.sum("c").cast("long").alias("total"))
    seats = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            F.expr(f"({k}L * c) div total").alias("base"),
            F.expr(f"({k}L * c) % total").alias("rem"),
        )
    )
    # residual seats: rank the G-row relation by remainder (bounded
    # partition-less window — G groups, never data-scale; whitelisted
    # in tests/test_plans.py _BOUNDED_GLOBAL_WINDOWS)
    base_tot = seats.agg(F.sum("base").cast("long").alias("base_tot"))
    wr = W.orderBy(F.col("rem").desc(), F.col(group_col).asc())
    quotas = (
        seats.crossJoin(F.broadcast(base_tot))
        .select(
            group_col,
            (
                F.col("base")
                + (
                    F.row_number().over(wr) <= F.lit(k) - F.col("base_tot")
                ).cast("long")
            ).alias("quota"),
        )
    )
    order = hash_bucket(F.col(key_col), seed)
    w = W.partitionBy(group_col).orderBy(order.asc(), F.col(key_col).asc())
    # the LITERAL k rank filter (quota <= k always) is what triggers
    # the WindowGroupLimit map-local pushdown; the exact per-group
    # quota cut happens against the broadcast G-row relation after
    ranked = df.withColumn("srank", F.row_number().over(w)).filter(
        F.col("srank") <= k
    )
    return (
        ranked.join(F.broadcast(quotas), group_col)
        .filter(F.col("srank") <= F.col("quota"))
        .drop("srank", "quota")
    )


def mixture_upsample(
    df: DataFrame,
    epochs_by_group: dict[str, int],
    group_col: str = "source",
    default_epochs: int = 1,
) -> DataFrame:
    """Mixture construction: replicate each document ``epochs`` times
    per its group's mixture weight (integer epochs, the way pretraining
    mixes sources), with an ``epoch`` column for shard-level shuffling.
    explode(sequence(1, epochs)) is pure map-side — no shuffle, no skew:
    replication happens in the scan partition that owns the row."""
    ep = None
    for g, n in sorted(epochs_by_group.items()):
        cond = F.col(group_col) == g
        ep = F.when(cond, n) if ep is None else ep.when(cond, n)
    ep = ep.otherwise(default_epochs) if ep is not None else F.lit(default_epochs)
    return df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), ep.cast("int")))
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    sqrt_grid: int = 256,
    weight_grid: int = 1 << 30,
) -> DataFrame:
    """Temperature-sampled mixture weights at T=2 (α = 1/T = 0.5 — the
    multilingual-pretraining standard): a source with token mass c gets
    sampling weight ∝ √c, flattening the natural distribution so small
    sources are upsampled and huge ones downsampled.

    α = 0.5 specifically because √ is the one power IEEE requires
    correctly rounded — ``sqrt`` agrees bit-exactly across engines
    where ``pow(x, α)`` does not (last-ulp libm drift), so the whole
    computation stays oracle-hash-matchable. Everything after the √ is
    exact integer arithmetic: per-group ``sqrtfp = floor(√c ·
    sqrt_grid)`` (exact: power-of-two scale), integer-summed totals
    (order-free), and integer division for the outputs —
    ``weight_fp = sqrtfp · weight_grid div Σsqrtfp`` (the normalized
    weight on the 2^30 grid) and ``epochs_x4 = 4 · sqrtfp · C div
    (Σsqrtfp · c)`` (the upsample factor weight/natural-share in
    quarter-epoch granularity, what mixture_upsample consumes).

    Overflow discipline (ADVICE r10): the epochs_x4 NUMERATOR
    ``4·sqrtfp·t_chars`` grows as 1024·C^1.5 and would pass 2^63 near
    C ≈ 2^35.3 chars (~40 GB — far below real corpora), where non-ANSI
    Spark wraps silently while DuckDB raises. Both intermediates
    therefore run on 38-digit exact integer types — DECIMAL(38,0) in
    Spark, HUGEINT in the DuckDB oracle — good to C ≈ 10^23 chars
    (~100 ZB); the QUOTIENTS are bounded (weight_fp ≤ 2^30,
    epochs_x4 ≤ 4·C < 2^63) so the outputs stay exact BIGINTs.

    Plan shape: one partial-agg groupBy (map-side combine, G rows out),
    a 1-row total broadcast onto the G-row relation — no data-scale
    shuffle beyond the count/sum aggregation itself.
    """
    sizes = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("chars"),
    )
    return mixture_weights_from_sizes(sizes, group_col, sqrt_grid, weight_grid)


def mixture_weights_from_sizes(
    sizes: DataFrame,
    group_col: str = "source",
    sqrt_grid: int = 256,
    weight_grid: int = 1 << 30,
) -> DataFrame:
    """:func:`temperature_mixture`'s tail over a pre-aggregated
    ``(group, n_docs, chars)`` relation — shared by the batch op and
    its streaming twin (per-micro-batch count partials fold exactly:
    integer sums are order-free)."""
    sized = sizes.withColumn(
        "sqrtfp",
        F.floor(F.sqrt(F.col("chars").cast("double")) * sqrt_grid).cast("long"),
    )
    totals = sized.agg(
        F.sum("sqrtfp").cast("long").alias("t_sqrt"),
        F.sum("chars").cast("long").alias("t_chars"),
    )
    # intermediates on DECIMAL(38,0): 4·sqrtfp·t_chars ~ 1024·C^1.5
    # overflows int64 at ~40 GB of chars (see docstring); div's long
    # result is exact because the quotients are bounded
    dec = "cast({} as decimal(38,0))"
    return sized.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        "chars",
        F.expr(
            f"{dec.format('sqrtfp')} * {weight_grid} div t_sqrt"
        ).cast("long").alias("weight_fp"),
        F.expr(
            f"{dec.format(4)} * sqrtfp * t_chars"
            f" div ({dec.format('t_sqrt')} * chars)"
        ).cast("long").alias("epochs_x4"),
    )


def pack_shards(
    df: DataFrame,
    budget: int,
    cost_col: str = "n_chars",
    key_col: str = "doc_id",
    seed: str = "pack-v1",
    n_buckets: int = 64,
) -> DataFrame:
    """Pack documents into fixed-budget shards: deterministic global
    order, running cost total, shard = floor(preceding_total / budget).

    The global cumulative sum is distributed, not a single-partition
    window: buckets are RANGES of the order key (monotone, like
    repartitionByRange), so ordering by (bucket, order_key, key) IS the
    global (order_key, key) order and the result is independent of
    ``n_buckets`` (asserted in tests). Each bucket computes its LOCAL
    running sum (window partitioned by bucket); bucket start offsets
    come from a ``n_buckets``-row aggregate — window over P rows,
    broadcast back. At 1000 executors the only wide exchange is the
    bucket repartition; integer arithmetic end to end so the DuckDB
    single-window oracle matches bit-exactly."""
    order_key = hash_bucket(F.col(key_col), seed)
    bucketed = df.withColumn("pack_order", order_key).withColumn(
        # contiguous hash ranges: bucket is monotone in pack_order
        "pack_bucket",
        F.expr(f"pack_order * {int(n_buckets)} div {SPLIT_BUCKETS}"),
    )
    local_w = (
        W.partitionBy("pack_bucket")
        .orderBy(F.col("pack_order").asc(), F.col(key_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bucketed.withColumn(
        "local_cum", F.sum(F.col(cost_col).cast("long")).over(local_w)
    )
    totals = bucketed.groupBy("pack_bucket").agg(
        F.sum(F.col(cost_col).cast("long")).alias("bucket_total")
    )
    # exclusive prefix sum over the tiny per-bucket totals (P rows —
    # this single-partition window is over n_buckets rows, not data)
    offset_w = W.orderBy("pack_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "bucket_offset", F.coalesce(F.sum("bucket_total").over(offset_w), F.lit(0))
    ).select("pack_bucket", "bucket_offset")
    packed = (
        local.join(F.broadcast(offsets), "pack_bucket")
        .withColumn(
            "pack_prior",
            F.col("bucket_offset") + F.col("local_cum") - F.col(cost_col).cast("long"),
        )
        # integer division (`div`), not double `/` — exact at any scale
        .withColumn("shard_id", F.expr(f"pack_prior div {int(budget)}"))
    )
    return packed.drop(
        "pack_bucket", "pack_order", "local_cum", "bucket_offset", "pack_prior"
    )


def weighted_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    seed: str = "wsample-v1",
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT weight-proportional sampling of ``k`` picks (with
    multiplicity) — systematic / stochastic-universal sampling on a
    deterministic hash order, integer arithmetic end to end.

    Why not Efraimidis–Spirakis (keys u^(1/w)): its transcendental key
    is engine-libm-dependent in the last ulp, so a DuckDB oracle can
    disagree about boundary picks. Systematic sampling needs only an
    exclusive prefix sum of integer weights and counting the k grid
    targets t_j = floor((2j+1)·W / 2k), j < k, inside each doc's
    cumulative-weight interval [prior, prior+w): pure BIGINT ops that
    hash-match bit-for-bit. The classic SUS guarantee holds: every
    doc's multiplicity is floor or ceil of its expected share k·w/W
    (pinned in tests), and multiplicities sum to exactly k.

    Scale shape identical to :func:`pack_shards` (whose bucketed
    distributed prefix sum this reuses): the only wide exchange is the
    hash-range bucket repartition; the per-bucket offsets and the
    grand total are tiny broadcasts. ``#targets < x`` has the closed
    form ``(2kx − W − 1) div 2W + 1`` for 2kx > W (else 0) — kept
    non-negative so Spark's truncating ``div`` and the oracle's floor
    division agree. Weights must be positive; callers clamp."""
    order_key = hash_bucket(F.col(key_col), seed)
    bucketed = df.withColumn("ws_order", order_key).withColumn(
        "ws_bucket", F.expr(f"ws_order * {int(n_buckets)} div {SPLIT_BUCKETS}")
    )
    w_long = F.col(weight_col).cast("long")
    local_w = (
        W.partitionBy("ws_bucket")
        .orderBy(F.col("ws_order").asc(), F.col(key_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bucketed.withColumn("ws_cum_local", F.sum(w_long).over(local_w))
    totals = bucketed.groupBy("ws_bucket").agg(
        F.sum(w_long).alias("ws_btotal")
    )
    offset_w = W.orderBy("ws_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "ws_offset", F.coalesce(F.sum("ws_btotal").over(offset_w), F.lit(0))
    ).select("ws_bucket", "ws_offset")
    grand = totals.agg(F.sum("ws_btotal").alias("ws_total"))
    with_cum = (
        local.join(F.broadcast(offsets), "ws_bucket")
        .crossJoin(F.broadcast(grand))
        .withColumn("ws_cum", F.col("ws_offset") + F.col("ws_cum_local"))
        .withColumn("ws_prior", F.col("ws_cum") - w_long)
    )

    def cnt(col_name: str):
        twokx = F.lit(2 * k) * F.col(col_name)
        return F.when(twokx <= F.col("ws_total"), F.lit(0)).otherwise(
            F.least(
                F.lit(k).cast("long"),
                F.expr(f"(2 * {k} * {col_name} - ws_total - 1) div (2 * ws_total)")
                + 1,
            )
        )

    return (
        with_cum.withColumn("multiplicity", cnt("ws_cum") - cnt("ws_prior"))
        .filter(F.col("multiplicity") > 0)
        .drop(
            "ws_bucket", "ws_order", "ws_cum_local", "ws_btotal",
            "ws_offset", "ws_total", "ws_cum", "ws_prior",
        )
    )


def chunk_tokens(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    overlapping fixed-size windows (the training-sequence preparation
    step between cleaning and shard packing).

    Chunk k covers tokens [k*stride, k*stride + window); the last chunk
    is the first one whose window reaches the end of the document, so
    every token is covered and no chunk starts past the end. All
    arithmetic is integer (chunk count = 1 + ceil((n-window)/stride))
    and slicing truncates at the document tail — engine-reproducible.

    Scale: pure per-row array algebra + explode. NO shuffle at any
    size; chunk rows land in the same partitions as their documents.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    t = (
        df.select(id_col, tokens(text_col).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    last = F.expr(
        f"CASE WHEN n <= {window} THEN 0 "
        f"ELSE (n - {window} + {stride} - 1) div {stride} END"
    )
    c = t.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), last)))
    chunk = F.slice("toks", F.col("chunk_id") * stride + 1, window)
    return c.select(
        id_col,
        "chunk_id",
        F.size(chunk).alias("chunk_n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
