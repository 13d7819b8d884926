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


def mean_images(df: DataFrame, key: str = "group", median_size: int = 3,
                downscale: int = 1) -> dict[str, np.ndarray]:
    """Compute the per-group correction image (mean over records, then
    per-channel median filter, zero-guarded).

    Scale shape (partial+final, the reference's foldby binop/combine,
    jones_2006.py:109-115): stage 1 is a ``mapInPandas`` partial
    tensor-sum per (group, Arrow batch) — no task ever materializes a
    whole group, so a plate with millions of images cannot OOM a task.
    Stage 2 combines the few partials per group (one small row per
    batch) in ``applyInPandas``. The final dict is driver-side tiny.
    """
    sum_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField("sum_flat", T.ArrayType(T.DoubleType())),
            T.StructField("shape", T.ArrayType(T.IntegerType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def partial_sums(batches):
        for pdf in batches:
            rows = {}
            arrs = decode_series(pdf["pixels"], pdf["pixels_shape"])
            for g, a in zip(pdf[key], arrs):
                if a is None:
                    continue
                if g in rows:
                    rows[g][0] += a
                    rows[g][1] += 1
                else:
                    rows[g] = [a.astype(np.float64), 1]
            if rows:
                yield pd.DataFrame(
                    {
                        key: list(rows),
                        "sum_flat": [v[0].ravel() for v in rows.values()],
                        "shape": [list(v[0].shape) for v in rows.values()],
                        "n": [v[1] for v in rows.values()],
                    }
                )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        total = None
        n = 0
        for flat, shape, cnt in zip(pdf["sum_flat"], pdf["shape"], pdf["n"]):
            a = np.asarray(flat, dtype=np.float64).reshape(list(shape))
            total = a if total is None else total + a
            n += int(cnt)
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "sum_flat": [total.ravel()],
                "shape": [list(total.shape)],
                "n": [n],
            }
        )

    partials = df.select(key, "pixels", "pixels_shape").mapInPandas(
        partial_sums, schema=sum_schema
    )
    sums = partials.groupBy(key).applyInPandas(combine, schema=sum_schema)
    out: dict[str, np.ndarray] = {}
    for row in sums.collect():
        mean = (
            np.asarray(row["sum_flat"], dtype=np.float64).reshape(row["shape"]) / row["n"]
        )
        out[row[key]] = _finish(mean, median_size, downscale)
    return out


def _finish(mean: np.ndarray, median_size: int, downscale: int) -> np.ndarray:
    """Reference _finish (jones_2006.py:38-55): optional block-mean
    downscale → per-channel median filter → zero-guard → upscale back.
    Downscaling keeps the (large, disk-50 in the reference) median
    affordable on big correction images."""
    c, h, w = mean.shape
    img = mean
    if downscale > 1:
        hh, ww = h - h % downscale, w - w % downscale
        img = (
            mean[:, :hh, :ww]
            .reshape(c, hh // downscale, downscale, ww // downscale, downscale)
            .mean(axis=(2, 4))
        )
    smoothed = np.stack([K.median_disk(img[i], median_size) for i in range(c)])
    smoothed = np.where(smoothed == 0, 1.0, smoothed)  # division no-op guard
    if downscale > 1:
        smoothed = np.repeat(np.repeat(smoothed, downscale, axis=1), downscale, axis=2)
        # pad/trim back to the original shape
        sh = smoothed.shape
        outp = np.ones((c, h, w), dtype=np.float64)
        outp[:, : min(h, sh[1]), : min(w, sh[2])] = smoothed[:, :h, :w]
        smoothed = outp
    return smoothed.astype(np.float32)


def correct(df: DataFrame, key: str = "group", median_size: int = 3, downscale: int = 1,
            precomputed: dict[str, np.ndarray] | None = None) -> DataFrame:
    """Divide each image by its group's correction image. ``precomputed``
    skips the aggregation job (reference jones_2006.py:122-128 pickle
    reload path)."""
    mu = precomputed if precomputed is not None else mean_images(df, key, median_size, downscale)
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
