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


def _fpr_denom(k: int, target_fpr: float) -> float:
    """``-ln(1 - fpr^{1/k})`` — the constant in the m-sizing formula.
    Inlined as a full-precision literal into the SQL oracles so neither
    engine evaluates pow/log (libm drifts in the last ulp)."""
    return -math.log(1.0 - target_fpr ** (1.0 / k))


def bloom_required_m(
    n: int,
    k: int = BLOOM_K,
    target_fpr: float = 1e-3,
    m_max: int = _BLOOM_M_MAX,
) -> int:
    """Smallest power-of-two bit count with predicted FPR
    ``(1 - e^{-k*n/m})^k <= target_fpr`` at ``n`` distinct keys.

    Solving for m: ``m >= k*n / -ln(1 - target_fpr^{1/k})``. Clamped to
    [2^10, m_max] — m may NEVER exceed 2^24, the 24-bit position-chunk
    space; beyond ~800k distinct keys per filter at 1e-3, shard the
    keyspace into multiple filters (:func:`bloom_build_sharded`)
    instead of growing m.
    """
    if n <= 0:
        return 1 << 10
    m_max = min(m_max, _BLOOM_M_MAX)
    need = k * n / _fpr_denom(k, target_fpr)
    # comparison ladder, not ceil(log2(need)): the SQL oracle mirrors
    # this selection, and float log2 could flip the ceil in the last
    # ulp between engines — integer-vs-double compares cannot
    m = 1 << 10
    while m < need and m < m_max:
        m <<= 1
    return m


def bloom_auto_shards(
    n: float,
    k: int = BLOOM_K,
    target_fpr: float = 1e-3,
    m_max: int = _BLOOM_M_MAX,
) -> int:
    """Smallest power-of-two shard count S such that a filter over
    ``ceil(n / S)`` keys fits in ``m_max`` bits at the target FPR —
    i.e. ``k * ceil(n/S) / -ln(1 - fpr^{1/k}) <= m_max``. Same
    comparison-ladder discipline as :func:`bloom_required_m` so the
    SQL oracle reproduces the choice bit-exactly (double division and
    ceil are IEEE-identical cross-engine)."""
    m_max = min(m_max, _BLOOM_M_MAX)
    denom = _fpr_denom(k, target_fpr)
    s = 1
    while k * math.ceil(n / s) / denom > m_max and s < _BLOOM_M_MAX:
        s <<= 1
    return s


def _kmv_estimate(df: DataFrame, key: str, kmv_k: int = 1024) -> float:
    """KMV distinct-count estimate of the key column (sketches.py
    hashing): distinct 48-bit hashes → TakeOrdered bottom-k
    (distributed partial top-k per partition, a bounded kmv_k-value
    driver collect — never the keys themselves) →
    ``(k-1)/kth_min_fraction``. md5-deterministic: reproduces exactly
    on any partitioning and in the SQL oracle."""
    from scip_spark.functions.sketches import _HASH_SPACE, kmv_hash

    hashed = (
        df.where(F.col(key).isNotNull())
        .select(kmv_hash(key).alias("h"))
        .distinct()
    )
    mins = [r["h"] for r in hashed.orderBy("h").limit(kmv_k).collect()]
    if len(mins) < kmv_k:
        return float(len(mins))  # exact: the whole distinct set fit
    return (kmv_k - 1) / (mins[-1] / _HASH_SPACE)


def bloom_auto_m(
    df: DataFrame,
    key: str,
    k: int = BLOOM_K,
    target_fpr: float = 1e-3,
    kmv_k: int = 1024,
) -> int:
    """Auto-size the filter bits from a KMV distinct estimate
    (:func:`_kmv_estimate`) → :func:`bloom_required_m`. The estimate
    is md5-deterministic, so auto-sized builds reproduce exactly."""
    n = _kmv_estimate(df, key, kmv_k)
    return bloom_required_m(math.ceil(n), k, target_fpr)


def bloom_m_of(bloom: DataFrame, default: int | None = None) -> int:
    """The bit count an auto-sized filter was built with (stamped as a
    constant ``m`` column by ``bloom_build(..., m="auto")``).

    Raises when the relation carries no ``m`` stamp and no explicit
    ``default`` was given: silently probing with a default m against a
    filter built with a different explicit m yields wrong bit positions
    and hence FALSE NEGATIVES — the one failure mode the contamination
    screens must never have. An EMPTY stamped relation returns the
    default (or BLOOM_M): nothing was inserted, so every probe misses
    under any m and no false negative is possible."""
    if "m" not in bloom.columns:
        if default is None:
            raise ValueError(
                "bloom_m_of: filter relation has no 'm' stamp column — "
                "it was built with an explicit m, so probe with that "
                "same m instead of m='auto' (a mismatched m would "
                "produce false negatives)"
            )
        return default
    row = bloom.select("m").limit(1).collect()
    if row:
        return int(row[0]["m"])
    return default if default is not None else BLOOM_M


def bloom_s_of(bloom: DataFrame, default: int | None = None) -> int:
    """Shard count a sharded build stamped as the constant ``s``
    column; same raise-on-missing discipline as :func:`bloom_m_of`
    (probing with the wrong shard count mis-routes keys → false
    negatives)."""
    if "s" not in bloom.columns:
        if default is None:
            raise ValueError(
                "bloom_s_of: filter relation has no 's' stamp column — "
                "not a bloom_build_sharded output"
            )
        return default
    row = bloom.select("s").limit(1).collect()
    if row:
        return int(row[0]["s"])
    return default if default is not None else 1


def _resolve_probe_m(bloom: DataFrame, m: int | str) -> int:
    """Probe-side m resolution with BOTH mismatch directions guarded:
    ``m="auto"`` requires a stamped filter (bloom_m_of raises
    otherwise), and an EXPLICIT m against a stamped filter must equal
    the stamp — a silent mismatch in either direction yields wrong bit
    positions and hence false negatives. The stamp read is a bounded
    1-row collect; explicit-m probes of unstamped filters cost
    nothing."""
    if m == "auto":
        return bloom_m_of(bloom)
    if "m" in bloom.columns:
        stamped = bloom_m_of(bloom, default=int(m))
        if stamped != int(m):
            raise ValueError(
                f"bloom probe: explicit m={int(m)} does not match the "
                f"filter's stamped m={stamped} — probing with a "
                "mismatched m would produce false negatives; pass "
                "m='auto' (or the stamped value)"
            )
    return int(m)


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
    inputs (idempotent semilattice; see module doc). Stamped filters
    carry their ``m`` (and sharded builds their ``s``) through; parts
    built with DIFFERENT m or s are rejected loudly — their bit
    positions don't align, so an OR-fold would be a corrupt filter
    that can produce false negatives. The guard is an eager ≤2-row
    collect over the sketch-sized relation (bounded at any scale)."""
    keys = ["shard", "word"] if "shard" in parts.columns else ["word"]
    stamps = [c for c in ("m", "s") if c in parts.columns]
    for c in stamps:
        got = parts.select(c).distinct().limit(2).collect()
        if len(got) > 1:
            raise ValueError(
                f"bloom_merge: parts were built with different '{c}' "
                f"({sorted(int(r[c]) for r in got)}, …) — bit positions "
                "don't align across such filters and OR-merging them "
                "would produce false negatives; rebuild the parts with "
                "one shared geometry"
            )
    return parts.groupBy(*keys).agg(
        F.bit_or("bits").alias("bits"),
        *[F.max(c).alias(c) for c in stamps],
    )


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
    auto-sized build left on the filter relation; explicit m is
    cross-checked against any stamp (:func:`_resolve_probe_m`)."""
    m = _resolve_probe_m(bloom, m)
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


def bloom_shard(col: Column | str, s: int, k: int = BLOOM_K) -> Column:
    """Shard route of a key: md5 chunk ``k`` (the first chunk NOT used
    for bit positions — chars 25–30 at the default k=4) mod the shard
    count. Independent of the position bits by md5 chunk disjointness,
    so per-shard FPR math is unaffected by the routing.

    md5 is 32 hex chars = five full 6-char chunks (indices 0–4), so
    the routing chunk exists only for ``k <= 4``: at k=5 substring
    returns 2 chars (8-bit routing) and at k>=6 an empty string —
    NULL/degenerate shards that silently break the per-shard
    no-false-negative guarantee. Fail loudly instead."""
    if k > 4:
        raise ValueError(
            f"bloom_shard needs md5 chunk {k} for routing, but md5 has "
            "only five full 6-char chunks (k <= 4); use a second hash "
            "or reduce k"
        )
    return bloom_pos(col, k, s)


def bloom_build_sharded(
    df: DataFrame,
    key: str,
    k: int = BLOOM_K,
    shards: int | str = "auto",
    m: int | str = "auto",
    target_fpr: float = 1e-3,
    m_max: int = _BLOOM_M_MAX,
    kmv_k: int = 1024,
) -> DataFrame:
    """Keyspace-SHARDED Bloom build — the past-the-clamp regime: a
    single filter's m cannot exceed 2^24 (24-bit md5 position chunks),
    which at 1e-3 FPR saturates near ~800k distinct keys. A 100-TB
    contamination screen fingerprints 10^9+ documents, so instead of
    growing m this hash-partitions the KEYS into S independent filters
    (route = md5 chunk k mod S — disjoint from the position chunks) and
    sizes each for ceil(n/S) keys. Probes route by the same hash, so
    the no-false-negative guarantee is preserved per shard.

    ``shards="auto"`` picks the smallest power-of-two S whose per-shard
    filter fits in ``m_max`` bits (:func:`bloom_auto_shards`) from the
    same md5-deterministic KMV estimate the auto-m path uses — both S
    and m reproduce bit-exactly cross-engine (oracle entry
    ``bloom_sharded_screen``). Returns ``(shard, word, bits)`` plus
    constant ``m`` and ``s`` stamp columns; total size ≤ S·m/32 rows.

    Scale shape: identical to :func:`bloom_build` with ``shard``
    prepended to the grouping key — the explode still collapses
    MAP-SIDE (bit_or partial agg), the shuffle carries at most S·m/32
    sketch rows at any corpus size."""
    need_est = shards == "auto" or m == "auto"
    n_est = _kmv_estimate(df, key, kmv_k) if need_est else 0.0
    s = bloom_auto_shards(n_est, k, target_fpr, m_max) if shards == "auto" else int(shards)
    if m == "auto":
        m = bloom_required_m(math.ceil(n_est / s), k, target_fpr, m_max)
    pos = df.where(F.col(key).isNotNull()).select(
        bloom_shard(key, s, k).alias("shard"),
        F.explode(
            F.array(*[bloom_pos(key, i, m) for i in range(k)])
        ).alias("p"),
    )
    return (
        pos.select("shard", *_word_mask())
        .groupBy("shard", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .withColumn("m", F.lit(int(m)).cast("long"))
        .withColumn("s", F.lit(int(s)).cast("long"))
    )


def bloom_probe_sharded(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Grouped probe of a :func:`bloom_build_sharded` filter: route
    each key by the same shard hash, check its k bits in that shard's
    words via one broadcast (shard, word) join + grouped bool_and.
    Geometry (m, s) always comes from the build's stamp columns —
    never caller-supplied, so mismatched-geometry false negatives are
    impossible by construction. Same set-semantic caveat as
    :func:`bloom_probe`; use :func:`bloom_probe_sharded_inline` to
    keep a 100-TB probe side entirely map-side."""
    m, s = bloom_m_of(bloom), bloom_s_of(bloom)
    filt = bloom.select("shard", "word", "bits")
    cols = df.columns
    expanded = df.select(
        *cols,
        bloom_shard(key, s, k).alias("shard"),
        F.explode(
            F.array(*[bloom_pos(key, i, m) for i in range(k)])
        ).alias("p"),
    ).select(*cols, "shard", *_word_mask())
    joined = expanded.join(F.broadcast(filt), ["shard", "word"], "left")
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return joined.groupBy(*cols).agg(F.bool_and(hit).alias(out_col))


def bloom_probe_sharded_inline(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Zero-shuffle sharded probe (the join-pre-filter shape): the
    S·m/32-row filter packs into ONE map keyed by ``shard·2^19 + word``
    (word < 2^24/32 = 2^19, so keys never collide), crossJoin(broadcast)s
    onto the probe rows, and membership is a closed-form projection —
    the probe side never shuffles. Geometry from the stamps, as in
    :func:`bloom_probe_sharded`."""
    m, s = bloom_m_of(bloom), bloom_s_of(bloom)
    packed = bloom.select(
        (F.col("shard") * F.lit(1 << 19) + F.col("word")).alias("sw"),
        "bits",
    ).groupBy().agg(
        F.map_from_arrays(
            F.collect_list("sw"), F.collect_list("bits")
        ).alias("_bloom_map")
    )
    probed = df.crossJoin(F.broadcast(packed)).select(
        "*",
        bloom_shard(key, s, k).alias("_shard"),
        *[bloom_pos(key, i, m).alias(f"_p{i}") for i in range(k)],
    )
    hit = F.lit(True)
    for i in range(k):
        sw = F.col("_shard") * F.lit(1 << 19) + F.expr(f"shiftright(_p{i}, 5)")
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(_p{i} % 32 as int))"
        )
        got = F.coalesce(
            F.element_at(F.col("_bloom_map"), sw), F.lit(0).cast("long")
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
    ``m="auto"`` reads the stamp an auto-sized build left; explicit m
    is cross-checked against any stamp (:func:`_resolve_probe_m`)."""
    m = _resolve_probe_m(bloom, m)
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
