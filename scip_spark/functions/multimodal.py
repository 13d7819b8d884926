"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (100 TB training-data pipeline surface).

Real Spark plumbing — binary columns, schema, Arrow batch shape,
mapInPandas signatures — with the codec step stubbed: the decode
libraries (Pillow/ffmpeg/soundfile) are not installed in this
container, so ``decode=`` accepts an injected callable and the default
raises NotImplementedError. A deterministic fake decoder ships for
tests (`fake_image_decoder`).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_s", T.DoubleType()),
    ]
)


def decoder_stub(payload: bytes) -> np.ndarray:
    """Default media decoder: REAL pure-Python baseline-JPEG decode for
    JPEG payloads (sources/jpegio.py, r15 — the one raster format this
    container can decode from actual bytes); every other format still
    needs Pillow/ffmpeg and fails fast so the injection seam stays
    honest."""
    if payload[:2] == b"\xff\xd8":
        from scip_spark.sources import jpegio

        return jpegio.decode(payload)
    raise NotImplementedError(
        "non-JPEG media decoding requires Pillow/ffmpeg (not installed); "
        "inject decode=... — the Spark plumbing around it is real."
    )


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: bytes → pseudo-image seeded by content
    hash (8×8×3 uint8)."""
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_features(
    df: DataFrame,
    decode: Callable[[bytes], np.ndarray] = decoder_stub,
    resize: tuple[int, int] | None = None,
) -> DataFrame:
    """payload → decoded pixel stats + optional nearest-neighbour
    resize, as an Arrow-batched mapInPandas stage."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("px_mean", T.DoubleType()),
            T.StructField("px_std", T.DoubleType()),
            T.StructField("px_shape", T.ArrayType(T.IntegerType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, shapes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    means.append(None)
                    stds.append(None)
                    shapes.append(None)
                    continue
                img = decode(bytes(payload))
                if resize is not None:
                    ys = np.linspace(0, img.shape[0] - 1, resize[0]).astype(int)
                    xs = np.linspace(0, img.shape[1] - 1, resize[1]).astype(int)
                    img = img[np.ix_(ys, xs)]
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                shapes.append(list(img.shape))
            pdf = pdf.copy()
            pdf["px_mean"] = pd.Series(means, dtype=object).values
            pdf["px_std"] = pd.Series(stds, dtype=object).values
            pdf["px_shape"] = pd.Series(shapes, dtype=object).values
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp
    (decode stubbed; the 1→N explode + schema is the real part)."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.coalesce(F.col("meta_duration_s"), F.lit(0.0)) / every_s)
    ).cast("int")
    return df.withColumn(
        "frame_ts", F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_s))
    )


def audio_windows(
    media: DataFrame,
    window_s: float = 5.0,
    stride_s: float = 5.0,
    duration_col: str = "meta_duration_s",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-duration training windows over audio/video items from
    their DURATION METADATA — the segmentation plan a speech/AV
    pipeline computes before any decode (windows feed the decoder, not
    the other way round). Pure column algebra: a per-row sequence of
    window starts exploded to (id, window_idx, start_s, end_s), end
    clipped to the item duration, zero-duration items dropped. Zero
    shuffle at any corpus size."""
    n_win = F.when(
        F.col(duration_col) > 0,
        F.greatest(
            F.ceil((F.col(duration_col) - window_s) / stride_s).cast("int") + 1,
            F.lit(1),
        ),
    ).otherwise(F.lit(0))
    return (
        media.withColumn("__aw_n", n_win)
        .filter(F.col("__aw_n") > 0)
        .select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), F.col("__aw_n") - 1)).alias(
                "window_idx", "__aw_i"
            ),
            F.col(duration_col),
        )
        .select(
            id_col,
            "window_idx",
            (F.col("window_idx") * stride_s).alias("start_s"),
            F.least(
                F.col("window_idx") * stride_s + window_s, F.col(duration_col)
            ).alias("end_s"),
        )
    )
