"""Mergeable quantile sketch — deterministic bottom-k row sample.

The scale problem: exact percentiles need a global sort (or Spark's
exact ``percentile`` UDAF, which buffers every value of a group in
aggregation state — OOM at 100 TB), while ``percentile_approx``'s
Greenwald-Khanna summary is engine-specific, so its output can't be
oracle-verified bit-for-bit.

This module takes the third road, the same one `sketches.py` takes for
distinct counts: a **bottom-k-by-hash row sample**. Keep the k rows
whose md5(rowkey) hash is smallest, storing ``struct(h, v)`` pairs.
Because the hash is a pure function of the row key:

- the sample is a uniform random sample of rows (md5 as the random
  source), so the q-quantile of the sample estimates the q-quantile of
  the data with rank error O(sqrt(q(1-q)/k)) — the classic
  sample-quantile bound (Serfling 1980, ch. 2.3); k=256 gives ~3%
  rank error at the median,
- it is **deterministic and order-independent** — DuckDB reproduces
  the identical sketch from the same parquet, so unlike KLL/t-digest
  (whose compactions are randomized / order-dependent) the
  *approximation itself* is oracle-checkable,
- it is **mergeable**: merge(a, b) = bottom-k of the hash-union — an
  idempotent/commutative/associative semilattice, so per-partition
  sketches roll up through any tree (partition → executor → global)
  exactly like a KLL sketch would, and the merged result is
  bit-identical to the sketch built directly over the union.

KLL (Karnin-Lang-Liberty 2016) achieves O(1/eps) space vs this
sketch's O(1/eps^2); the tradeoff buys determinism and oracle
verifiability, and k=256..4096 structs per group is tiny either way.
When the O(1/eps) space matters more than hash-exact oracle pairing,
:mod:`scip_spark.functions.kll` provides a deterministic-compaction
KLL whose error invariant (not the sketch bits) is oracle-checked.

Construction never uses a partition-less window: rows are pre-bucketed
by ``pmod(h, n_buckets)`` (a pure function — recompute-safe), bottom-k
is taken per bucket with a partitioned window (spillable sort, state
bounded at k per bucket), and the <= n_buckets partial sketches fold
through the merge semilattice in a final tiny aggregate.

The reference computes per-object numpy percentiles single-node
(reference src/scip/features/intensity.py); this is the cluster-safe
replacement for corpus-scale distributions (doc lengths, quality
scores, token counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scip_spark.functions.sketches import kmv_hash

QS_K = 256


def qsketch_merge(a: Column | str, b: Column | str, k: int = QS_K) -> Column:
    """Bottom-k of the union of two sketches (array<struct<h,v>> sorted
    by h). array_union dedups identical (h, v) pairs, making the merge
    idempotent — re-merging an already-included partial is a no-op."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def qsketch(
    df: DataFrame,
    value,
    rowkey,
    group: str | None = None,
    k: int = QS_K,
    n_buckets: int = 32,
) -> DataFrame:
    """Build the sketch: one row per group (or one row total) with a
    ``qsk`` column = array of the k (hash, value) structs with the
    smallest row hashes.

    Physical plan: project (h, v) — the full rows never shuffle — then
    a partitioned window keeps k per (group, pmod(h, n_buckets))
    bucket, and a two-level groupBy folds the <= n_buckets partials
    per group through the merge semilattice. Aggregation state is
    bounded at k structs regardless of group size.
    """
    v = F.col(value) if isinstance(value, str) else value
    cols = [kmv_hash(rowkey).alias("__qs_h"), v.alias("__qs_v")]
    if group is not None:
        cols.insert(0, F.col(group))
    d = df.select(*cols).withColumn("__qs_b", F.pmod("__qs_h", F.lit(n_buckets)))
    part = ([group] if group is not None else []) + ["__qs_b"]
    # order by (h, v), not h alone: the 48-bit hash WILL collide at
    # ~16M rowkeys (birthday bound), and a tie at the k boundary would
    # otherwise keep an arbitrary row per execution — breaking both
    # determinism and merged==direct. (h, v) matches the struct sort
    # order used by the merge and the DuckDB oracle. Exact duplicate
    # (h, v) pairs (hash collision AND equal value) are dropped BEFORE
    # the bottom-k cut: the merge semilattice (array_union) dedups
    # anyway, so pre-dropping keeps the sketch identical whether built
    # directly or via partials, and identical to the list_distinct
    # oracle. Same lag trick as a DISTINCT but reusing the window's
    # exchange+sort — no extra shuffle.
    w = W.partitionBy(*part).orderBy("__qs_h", "__qs_v")
    is_dup = (F.lag("__qs_h").over(w) == F.col("__qs_h")) & (
        F.lag("__qs_v").over(w) == F.col("__qs_v")
    )
    dedup = d.withColumn("__qs_dup", F.coalesce(is_dup, F.lit(False))).filter(
        ~F.col("__qs_dup")
    )
    kept = dedup.withColumn("__qs_rn", F.row_number().over(w)).filter(
        F.col("__qs_rn") <= k
    )
    partials = kept.groupBy(*part).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__qs_h").alias("h"), F.col("__qs_v").alias("v")))
        ).alias("qsk")
    )
    empty = F.array().cast(partials.schema["qsk"].dataType)
    fold = F.aggregate(
        F.collect_list("qsk"), empty, lambda acc, s: qsketch_merge(acc, s, k)
    ).alias("qsk")
    if group is not None:
        return partials.groupBy(group).agg(fold)
    return partials.groupBy().agg(fold)


def qsketch_values(sketch: Column | str) -> Column:
    """Sorted sample values of a sketch (drops the hashes)."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.array_sort(F.transform(s, lambda x: x["v"]))


def qsketch_quantile(vals: Column | str, q: float) -> Column:
    """Discrete q-quantile of the sorted sample: value at rank
    ceil(q*m), floored at 1 — percentile_disc semantics, no
    interpolation, so the estimate is always a real data value and the
    arithmetic is engine-exact."""
    c = F.col(vals) if isinstance(vals, str) else vals
    rank = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.size(c)).cast("int"))
    return F.element_at(c, rank)
