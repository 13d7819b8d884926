"""P7/P8: the population filter — two-pass stats + SOFT delete.

Reference: src/scip/filter/threshold.py + orchestration
src/scip/main.py:215-228. (a) each record gets ``filter_sum`` = sum of
channel-0 pixels; (b) global mean/std of ``filter_sum``; (c) records
below Φ⁻¹(0.05; μ, σ) lose ``pixels``/``mask`` but the METADATA ROW
SURVIVES — downstream feature extraction emits null features for them.

Spark-first: the stat pass runs on a pruned projection (no tensors in
the shuffle — the reference's ``copy_without(["pixels"])`` trick is
Catalyst column pruning here), and the cheap scalar stats are folded
into a crossJoin(broadcast(stats)) so no second pass over tensors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scip_spark.operators import map_events
from scip_spark.queries import PHI_95
from scip_spark.schema import decode_series


def add_filter_sum(df: DataFrame, channel: int = 0) -> DataFrame:
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        sums = [None if a is None else float(a[channel].sum()) for a in pixels]
        pdf = pdf.copy()
        pdf["filter_sum"] = pd.Series(sums, dtype=object).values
        return pdf

    return map_events(df, batch)


def population_filter(df: DataFrame, channel: int = 0) -> DataFrame:
    """Soft-delete records whose filter_sum falls below the 5th
    percentile of a normal fit. Row count is preserved."""
    with_sum = add_filter_sum(df, channel)
    stats = with_sum.agg(
        F.avg("filter_sum").alias("mu"), F.stddev_pop("filter_sum").alias("sigma")
    )
    joined = with_sum.crossJoin(F.broadcast(stats))
    threshold = F.col("mu") - PHI_95 * F.col("sigma")
    keep = F.col("filter_sum") > threshold
    return (
        joined.withColumn("pixels", F.when(keep, F.col("pixels")))
        .withColumn("pixels_shape", F.when(keep, F.col("pixels_shape")))
        .withColumn("mask", F.when(keep, F.col("mask")))
        .withColumn("mask_shape", F.when(keep, F.col("mask_shape")))
        .drop("mu", "sigma")
    )
