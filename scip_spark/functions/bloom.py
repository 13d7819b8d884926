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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4        # hash functions: four 24-bit md5 chunks
BLOOM_M = 1 << 16  # filter bits (1024 int64 words)


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
    df: DataFrame, key: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """(word, bits): the filter as ≤ m/64 OR-aggregated int64 words.
    False-positive rate ≈ (1 - e^{-k·n/m})^k; with the defaults and
    n = 4096 distinct keys that is ~1e-3."""
    pos = df.where(F.col(key).isNotNull()).select(
        F.explode(
            F.array(*[bloom_pos(key, i, m) for i in range(k)])
        ).alias("p")
    )
    return (
        pos.select(*_word_mask())
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(parts: DataFrame) -> DataFrame:
    """Union of filters (stack part relations with unionByName first):
    bitwise OR per word — bit-identical to building over the unioned
    inputs (idempotent semilattice; see module doc)."""
    return parts.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe_inline(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus ``out_col`` with ZERO shuffle of ``df``: the filter
    collapses to a one-row word→bits map, crossJoin(broadcast)s onto
    every probe row, and membership is a closed-form column expression
    over the k (word, mask) pairs — the join-pre-filter shape, where
    the probe side is the 100 TB relation and must stay map-side
    (bloom_probe's grouped bool_and would shuffle it). The SURVEY §1.5
    scalar-broadcast pattern."""
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
    m: int = BLOOM_M,
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
    :func:`bloom_probe_inline`, which is a pure projection."""
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
