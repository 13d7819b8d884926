"""Mergeable Bloom filter — deterministic membership sketch, the
pre-filter-join primitive a 100 TB pipeline reaches for when one side
of a join is huge and the question is only "could this key exist?".

Design (same cross-engine hashing as the CMS sketch, sketches.py):
``k`` bit positions per key from the 24-bit chunks of ONE md5 — both
engines compute the identical positions, so every build/probe query is
hash-matchable against a SQL oracle. The filter itself is the relation
``(word, bits)``: at most ``m/64`` int64 words whose bits are the OR
of all inserted keys' masks.

Why the build scales: the per-key explode into k (word, mask) rows
collapses MAP-SIDE to ≤ m/64 partial words per task (bit_or has a
partial aggregate), so the shuffle carries sketch-sized rows at any
corpus size — the same bounded-shuffle property as the CMS/KMV builds.
Bitwise OR is commutative, associative AND idempotent (a true
semilattice, stronger than CMS's sum: re-inserting a key is a no-op),
so ``merge(parts) == direct`` holds bit-identically for any partition
of the input and any merge tree — pinned in tests/test_sketches.py
along with the no-false-negative guarantee.

Probing broadcasts the ≤ m/64-word relation and checks all k bits per
key with one grouped ``bool_and`` — no shuffle of the probe side
beyond its own k-row expand, which collapses right back.

The reference has no membership structure at all (SURVEY §2.4); this
extends the engine for contamination screening (train-set fingerprints
probed by eval sets) and join pre-filtering.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4        # hash functions: four 24-bit md5 chunks
BLOOM_M = 1 << 16  # filter bits (1024 int64 words)

#: positions are 24-bit md5 chunks, so m may never exceed 2^24 — above
#: that the chunks stop covering the bit space and FPR math breaks.
_BLOOM_M_MAX = 1 << 24


def bloom_required_m(n: int, k: int = BLOOM_K, target_fpr: float = 1e-3) -> int:
    """Smallest power-of-two bit count with predicted FPR
    ``(1 - e^{-k*n/m})^k <= target_fpr`` at ``n`` distinct keys.

    Solving for m: ``m >= k*n / -ln(1 - target_fpr^{1/k})``. Clamped to
    [2^10, 2^24] — the upper bound is the 24-bit position-chunk space;
    beyond ~800k distinct keys per filter at 1e-3, shard the keyspace
    into multiple filters (hash-prefix partitions) instead of growing m.
    """
    if n <= 0:
        return 1 << 10
    need = k * n / -math.log(1.0 - target_fpr ** (1.0 / k))
    # comparison ladder, not ceil(log2(need)): the SQL oracle mirrors
    # this selection, and float log2 could flip the ceil in the last
    # ulp between engines — integer-vs-double compares cannot
    m = 1 << 10
    while m < need and m < _BLOOM_M_MAX:
        m <<= 1
    return m


def bloom_auto_m(
    df: DataFrame,
    key: str,
    k: int = BLOOM_K,
    target_fpr: float = 1e-3,
    kmv_k: int = 1024,
) -> int:
    """Auto-size the filter from a KMV distinct-count estimate of the
    key column (sketches.py hashing): distinct 48-bit hashes →
    TakeOrdered bottom-k (distributed partial top-k per partition, a
    bounded kmv_k-value driver collect — never the keys themselves) →
    ``(k-1)/kth_min_fraction`` → :func:`bloom_required_m`. The estimate
    is md5-deterministic, so auto-sized builds reproduce exactly."""
    from scip_spark.functions.sketches import _HASH_SPACE, kmv_hash

    hashed = (
        df.where(F.col(key).isNotNull())
        .select(kmv_hash(key).alias("h"))
        .distinct()
    )
    mins = [r["h"] for r in hashed.orderBy("h").limit(kmv_k).collect()]
    if len(mins) < kmv_k:
        n = len(mins)  # exact: the whole distinct set fit in the sketch
    else:
        n = (kmv_k - 1) / (mins[-1] / _HASH_SPACE)
    return bloom_required_m(math.ceil(n), k, target_fpr)


def bloom_m_of(bloom: DataFrame, default: int = BLOOM_M) -> int:
    """The bit count an auto-sized filter was built with (stamped as a
    constant ``m`` column by ``bloom_build(..., m="auto")``); filters
    built with an explicit m have no such column and probe with the
    caller-supplied value."""
    if "m" not in bloom.columns:
        return default
    row = bloom.select("m").limit(1).collect()
    return int(row[0]["m"]) if row else default


def bloom_pos(col: Column | str, i: int, m: int = BLOOM_M) -> Column:
    """Bit position of hash ``i``: the i-th 24-bit chunk of md5(key)
    mod ``m`` — reproducible in any engine with md5 + substr."""
    c = F.col(col) if isinstance(col, str) else col
    chunk = F.substring(F.md5(c.cast("string")), 1 + 6 * i, 6)
    return F.conv(chunk, 16, 10).cast("long") % F.lit(m)


def _word_mask() -> list[Column]:
    """(word index, single-bit mask) of the bit-position column ``p``.
    32 bits per int64 word: bit 63 would need the sign bit, and DuckDB
    raises on the signed-overflowing ``1 << 63`` — 32-bit packing keeps
    every mask positive in both engines at the cost of 2× the (still
    tiny, ≤ m/32-row) filter relation. (SQL exprs because pyspark's
    shiftleft only takes a literal shift count.)"""
    return [
        F.expr("shiftright(p, 5)").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").alias("mask"),
    ]


def bloom_build(
    df: DataFrame,
    key: str,
    k: int = BLOOM_K,
    m: int | str = BLOOM_M,
    target_fpr: float = 1e-3,
) -> DataFrame:
    """(word, bits): the filter as ≤ m/32 OR-aggregated int64 words.
    False-positive rate ≈ (1 - e^{-k·n/m})^k; with the defaults and
    n = 4096 distinct keys that is ~1e-3.

    A FIXED m saturates at real cardinalities: once n ≫ m the bits all
    fill and every probe hits (still correct downstream — FPs must be
    re-verified — but the pre-filter stops filtering). Pass
    ``m="auto"`` to size m from a KMV distinct estimate of the key
    column (:func:`bloom_auto_m`); the chosen power-of-two is stamped
    on the relation as a constant ``m`` column so probes can recover it
    (:func:`bloom_m_of` / ``m="auto"`` on the probe side)."""
    auto = m == "auto"
    if auto:
        m = bloom_auto_m(df, key, k, target_fpr)
    pos = df.where(F.col(key).isNotNull()).select(
        F.explode(
            F.array(*[bloom_pos(key, i, m) for i in range(k)])
        ).alias("p")
    )
    built = (
        pos.select(*_word_mask())
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return built.withColumn("m", F.lit(int(m)).cast("long")) if auto else built


def bloom_merge(parts: DataFrame) -> DataFrame:
    """Union of filters (stack part relations with unionByName first):
    bitwise OR per word — bit-identical to building over the unioned
    inputs (idempotent semilattice; see module doc). Auto-sized filters
    carry their ``m`` stamp through (merging filters of DIFFERENT m is
    undefined — positions don't align; all parts must share one m)."""
    if "m" in parts.columns:
        return parts.groupBy("word").agg(
            F.bit_or("bits").alias("bits"), F.max("m").alias("m")
        )
    return parts.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe_inline(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int | str = BLOOM_M,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus ``out_col`` with ZERO shuffle of ``df``: the filter
    collapses to a one-row word→bits map, crossJoin(broadcast)s onto
    every probe row, and membership is a closed-form column expression
    over the k (word, mask) pairs — the join-pre-filter shape, where
    the probe side is the 100 TB relation and must stay map-side
    (bloom_probe's grouped bool_and would shuffle it). The SURVEY §1.5
    scalar-broadcast pattern. ``m="auto"`` reads the stamp an
    auto-sized build left on the filter relation."""
    if m == "auto":
        m = bloom_m_of(bloom)
    bloom = bloom.select("word", "bits")
    packed = bloom.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("_bloom_map")
    )
    probed = df.crossJoin(F.broadcast(packed)).select(
        "*", *[bloom_pos(key, i, m).alias(f"_p{i}") for i in range(k)]
    )
    hit = F.lit(True)
    for i in range(k):
        word = F.expr(f"shiftright(_p{i}, 5)")
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(_p{i} % 32 as int))")
        got = F.coalesce(
            F.element_at(F.col("_bloom_map"), word), F.lit(0).cast("long")
        )
        hit = hit & (got.bitwiseAND(mask) == mask)
    return probed.select(*df.columns, hit.alias(out_col))


def bloom_probe(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int | str = BLOOM_M,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: True iff all k of the key's
    bits are set (guaranteed True for every inserted key — Bloom
    filters have no false negatives). The filter broadcasts (≤ m/32
    rows); the k-row probe expand collapses via one grouped bool_and
    keyed by the probe relation's own columns.

    NOTE: the groupBy collapses fully-duplicate probe ROWS to one
    output row (a set semantic). When input multiplicity must be
    preserved — or the probe side is too big to shuffle at all — use
    :func:`bloom_probe_inline`, which is a pure projection.
    ``m="auto"`` reads the stamp an auto-sized build left."""
    if m == "auto":
        m = bloom_m_of(bloom)
    bloom = bloom.select("word", "bits")
    cols = df.columns
    expanded = df.select(
        *cols,
        F.explode(
            F.array(*[bloom_pos(key, i, m) for i in range(k)])
        ).alias("p"),
    ).select(*cols, *_word_mask())
    joined = expanded.join(F.broadcast(bloom), "word", "left")
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return (
        joined.groupBy(*cols)
        .agg(F.bool_and(hit).alias(out_col))
    )
