"""P7/P8: the population filter — two-pass stats + SOFT delete.

Reference: src/scip/filter/threshold.py + orchestration
src/scip/main.py:215-228. (a) each record gets ``filter_sum`` = sum of
channel-0 pixels; (b) global mean/std of ``filter_sum``; (c) records
below Φ⁻¹(0.05; μ, σ) lose ``pixels``/``mask`` but the METADATA ROW
SURVIVES — downstream feature extraction emits null features for them.

Spark-first: the filter is inherently two-pass (a population statistic
gates the per-row decision), and Catalyst CANNOT prune columns into
the ``add_filter_sum`` mapInPandas — so pass 1 would recompute every
upstream tensor stage that feeds it, and the filter pass would
recompute them AGAIN. ``population_filter`` therefore persists the
summed relation (spillable MEMORY_AND_DISK) before the stats action,
making the second pass a filter over materialized rows — measured
7.7 s saved per mask branch at 10k images. The scalar threshold is
collected once and folded in as a literal (same IEEE-754 double
arithmetic as the former broadcast-crossJoin column expression, one
fewer join). ``persist=False`` restores recompute-instead-of-store
for memory-constrained clusters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scip_spark.operators import map_events
from scip_spark.queries import PHI_95
from scip_spark.schema import decode_series


def make_filter_sum_batch(channel: int = 0, with_extents: bool = False):
    """Batch kernel behind :func:`add_filter_sum` (factory form for the
    fused multi-branch pipeline — see masking.make_mask_batch)."""

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        sums = [None if a is None else float(a[channel].sum()) for a in pixels]
        pdf = pdf.copy()
        pdf["filter_sum"] = pd.Series(sums, dtype=object).values
        if with_extents:
            masks = decode_series(pdf["mask"], pdf["mask_shape"], dtype=bool)
            mins, maxs = [], []
            for a, m in zip(pixels, masks):
                if a is None:
                    mins.append(None)
                    maxs.append(None)
                    continue
                mn: list[float | None] = []
                mx: list[float | None] = []
                for c in range(a.shape[0]):
                    if m is None:
                        vals = a[c]
                    elif m[c].any():
                        vals = a[c][m[c]]
                    else:  # masked channel selecting nothing: no extent
                        mn.append(None)
                        mx.append(None)
                        continue
                    mn.append(float(vals.min()))
                    mx.append(float(vals.max()))
                mins.append(mn)
                maxs.append(mx)
            pdf["ch_min"] = pd.Series(mins, dtype=object).values
            pdf["ch_max"] = pd.Series(maxs, dtype=object).values
        return pdf

    return batch


def add_filter_sum(
    df: DataFrame, channel: int = 0, with_extents: bool = False
) -> DataFrame:
    """Adds ``filter_sum``; with ``with_extents`` also emits per-record
    per-channel masked min/max (``ch_min``/``ch_max`` array<double>,
    null element = channel whose mask selects nothing, null array =
    record without pixels). The extents are byte-identical to what
    ``normalization.record_extents`` would compute, but piggyback on a
    pass that already has the tensors decoded — so a downstream
    ``group_extents`` becomes a pure-JVM aggregation instead of another
    full decode pass over the persisted tensor relation."""
    batch = make_filter_sum_batch(channel, with_extents)

    if not with_extents:
        return map_events(df, batch)
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("ch_min", T.ArrayType(T.DoubleType()), True),
            T.StructField("ch_max", T.ArrayType(T.DoubleType()), True),
        ]
    )
    return map_events(df, batch, schema)


def population_filter(
    df: DataFrame,
    channel: int = 0,
    persist: bool = True,
    caches=None,
    with_extents: bool = False,
) -> DataFrame:
    """Soft-delete records whose filter_sum falls below the 5th
    percentile of a normal fit. Row count is preserved. Eager: the
    stats pass runs on call (see module docstring for the persist
    rationale).

    The persisted summed relation must outlive this call (the caller's
    terminal action reads it), so it cannot be unpersisted here; pass
    ``caches`` (any object with ``add(df)``, e.g.
    ``plans.pipeline.BuildCaches``) to take ownership and release it
    after the action — otherwise it lives until session end."""
    with_sum = add_filter_sum(df, channel, with_extents=with_extents)
    if persist:
        from pyspark.storagelevel import StorageLevel

        with_sum = with_sum.persist(StorageLevel.MEMORY_AND_DISK)
        if caches is not None:
            caches.add(with_sum)
    row = with_sum.agg(
        F.avg("filter_sum").alias("mu"), F.stddev_pop("filter_sum").alias("sigma")
    ).collect()[0]
    mu, sigma = row["mu"], row["sigma"]
    if mu is None:
        # empty input (or all-null pixels): nothing to soft-delete
        return with_sum
    keep = F.col("filter_sum") > F.lit(mu - PHI_95 * (sigma or 0.0))
    out = (
        with_sum.withColumn("pixels", F.when(keep, F.col("pixels")))
        .withColumn("pixels_shape", F.when(keep, F.col("pixels_shape")))
        .withColumn("mask", F.when(keep, F.col("mask")))
        .withColumn("mask_shape", F.when(keep, F.col("mask_shape")))
    )
    if with_extents:
        # soft-deleted records must contribute nothing to downstream
        # extents (their pixels are nulled; mirror that here)
        out = out.withColumn("ch_min", F.when(keep, F.col("ch_min"))).withColumn(
            "ch_max", F.when(keep, F.col("ch_max"))
        )
    return out
