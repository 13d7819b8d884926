"""A1 + F15 + J2: per-group mean image → median-smooth → broadcast divide.

Reference: src/scip/illumination_correction/jones_2006.py (the
CellProfiler retrospective illumination-correction method): foldby sums
pixel tensors per group, ``_finish`` median-filters the mean image and
guards zeros, then every image is divided elementwise by its group's
correction image.

Spark-first: per-group tensor sums via ``applyInPandas`` (groups are
few — plates/scenes — so one task per group is the right physical
plan); the small dict of correction images is a driver-side broadcast
into the divide UDF, mirroring the reference's delayed-dict kwargs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from scip_spark.kernels import imageops as K
from scip_spark.operators import map_events
from scip_spark.schema import decode_series, encode_series


def mean_images(df: DataFrame, key: str = "group", median_size: int = 3) -> dict[str, np.ndarray]:
    """Compute the per-group correction image (mean over records, then
    per-channel median filter, zero-guarded)."""
    sum_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField("sum_flat", T.ArrayType(T.DoubleType())),
            T.StructField("shape", T.ArrayType(T.IntegerType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [a for a in decode_series(pdf["pixels"], pdf["pixels_shape"]) if a is not None]
        if not arrs:
            return pd.DataFrame(columns=[key, "sum_flat", "shape", "n"])
        total = np.zeros_like(arrs[0], dtype=np.float64)
        for a in arrs:
            total += a
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "sum_flat": [total.ravel().tolist()],
                "shape": [list(total.shape)],
                "n": [len(arrs)],
            }
        )

    sums = df.select(key, "pixels", "pixels_shape").groupBy(key).applyInPandas(
        per_group, schema=sum_schema
    )
    out: dict[str, np.ndarray] = {}
    for row in sums.collect():
        mean = (
            np.asarray(row["sum_flat"], dtype=np.float64).reshape(row["shape"]) / row["n"]
        )
        smoothed = np.stack(
            [K.median_filter(mean[c], median_size) for c in range(mean.shape[0])]
        )
        smoothed[smoothed == 0] = 1.0  # zero-guard (reference _finish)
        out[row[key]] = smoothed.astype(np.float32)
    return out


def correct(df: DataFrame, key: str = "group", median_size: int = 3,
            precomputed: dict[str, np.ndarray] | None = None) -> DataFrame:
    """Divide each image by its group's correction image. ``precomputed``
    skips the aggregation job (reference jones_2006.py:122-128 pickle
    reload path)."""
    mu = precomputed if precomputed is not None else mean_images(df, key, median_size)
    bc = df.sparkSession.sparkContext.broadcast(mu)

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        out = []
        for g, a in zip(pdf[key], pixels):
            if a is None or g not in bc.value:
                out.append(a)
            else:
                out.append((a / bc.value[g]).astype(np.float32))
        flat, shape = encode_series(out)
        pdf = pdf.copy()
        pdf["pixels"] = flat.values
        pdf["pixels_shape"] = shape.values
        return pdf

    return map_events(df, batch)
