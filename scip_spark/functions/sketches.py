"""Mergeable distinct-count sketches.

Two families:

- **KMV (k-minimum-values)**: keep the k smallest hash values of a
  set; estimate distinct count as ``(k-1) / kth_min_fraction``
  (Bar-Yossef et al. 2002). The sketch is an array column — merging
  two sketches is ``array_sort(array_union(a, b))[:k]``, an ordinary
  expression, so partial sketches roll up through any tree of unions
  (per-partition → per-day → global) without a custom UDAF. Because
  the hash (md5) is deterministic, the estimate is bit-reproducible
  across engines — KMV queries are oracle-paired, which no
  implementation-defined sketch (HLL/theta) can be.
- **HLL++** via Spark's built-in Datasketches integration
  (``hll_sketch_agg`` / ``hll_union`` / ``hll_sketch_estimate``):
  the production path for 100 TB — constant 2^lgK registers per
  group, binary-mergeable. Tested with accuracy bounds (its register
  layout is engine-specific, so no DuckDB oracle).

The reference has no sketches at all (SURVEY §2.4: plain foldby
aggregations); these extend the engine for training-data-pipeline
cardinality work (dedup planning, join-size estimation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMV_K = 64

# first 12 hex chars of md5 → 48-bit integer; IEEE doubles hold 48
# bits exactly, so hash/2^48 is the same double in every engine
_HASH_BITS = 48
_HASH_SPACE = float(2**_HASH_BITS)


def kmv_hash(col: Column | str) -> Column:
    """Deterministic 48-bit uniform hash of a value (md5 prefix)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, key: str, value: str, k: int = KMV_K) -> DataFrame:
    """Per-key KMV sketch: array of the k smallest distinct hashes.

    Physical plan: distinct (key, hash) pairs — a partial+final
    aggregation on tiny rows — then a sort-based window keeps only the
    k smallest hashes per key BEFORE any collect: the window sort is
    spillable, so per-key aggregation state is bounded at k elements
    even for a key with billions of distinct values (a bare
    ``collect_set`` would buffer them all). The window's hash
    partitioning by key is reused by the final groupBy — no extra
    shuffle. Result is bit-identical to slicing the full sorted set.
    """
    from pyspark.sql import Window

    hashed = df.select(F.col(key), kmv_hash(value).alias("h")).distinct()
    w = Window.partitionBy(key).orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy(key).agg(F.array_sort(F.collect_list("h")).alias("kmv"))


def kmv_estimate(sketch: Column | str, k: int = KMV_K) -> Column:
    """(k-1)/fraction-of-space-at-kth-min; exact size when |set| < k."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    kth = F.element_at(s, k).cast("double") / F.lit(_HASH_SPACE)
    return (
        F.when(F.size(s) < k, F.size(s).cast("double"))
        .otherwise(F.lit(float(k - 1)) / kth)
    )


def kmv_merge(a: Column | str, b: Column | str, k: int = KMV_K) -> Column:
    """Union two sketches: merged k-minima of the combined hash sets.
    array_union dedups, so merging a sketch with itself is a no-op —
    the algebra is idempotent/commutative/associative (a proper
    semilattice), which is what makes rollup trees safe."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

CMS_D = 4      # hash rows — four 24-bit chunks of ONE md5 per key
CMS_W = 8192   # counters per row; overcount <= e*N/w w.h.p.


def cms_bucket(col: Column | str, i: int, w: int = CMS_W) -> Column:
    """Row-``i`` counter index: the i-th 24-bit chunk of md5(key) mod
    ``w`` — one md5 per key feeds all CMS_D rows, and the identical
    chunking is reproducible in any engine with md5 + substr."""
    c = F.col(col) if isinstance(col, str) else col
    chunk = F.substring(F.md5(c.cast("string")), 1 + 6 * i, 6)
    return F.conv(chunk, 16, 10).cast("long") % F.lit(w)


def cms_sketch(df: DataFrame, key: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch of the key column's frequency distribution:
    (i, b, cnt) counter rows, at most d×w of them.

    Scale shape: the per-occurrence explode into d (row, bucket) pairs
    collapses MAP-SIDE to ≤ d·w partial counters per task, so the
    shuffle carries sketch-sized rows regardless of corpus size — the
    same bounded-shuffle property as the KMV/HLL builds. Integer sums
    commute, so (unlike KLL) the sketch is a pure function of the
    multiset: merged == direct bit-identically, and a SQL oracle
    reproduces the very counters (sketch_queries.cms_token_counts)."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), cms_bucket(key, i, w).alias("b")
                    )
                    for i in range(d)
                ]
            )
        ).alias("s")
    )
    return pairs.groupBy(F.col("s.i").alias("i"), F.col("s.b").alias("b")).agg(
        F.count("*").cast("long").alias("cnt")
    )
