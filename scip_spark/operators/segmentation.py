"""J4 + F12-F14: segmentation — one image record → N cell records.

Reference: src/scip/segmentation/__init__.py:70-119 (``to_events``:
crop pixels+mask to each labeled component's bbox, derive per-cell
combined mask/backgrounds/id/group) and the segmentation backends
(cellpose.py — GPU model, watershed_dapi.py). CellPose needs torch,
which isn't in this container: the backend is a stub raising
NotImplementedError, with the Spark-side plumbing (batching, schema,
1→N explode) real and tested via the numpy watershed-lite backend.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from scip_spark.kernels import imageops as K
from scip_spark.operators import map_events
from scip_spark.schema import decode_series


def segment_labels(df: DataFrame, backend: str = "watershed", parent_channel: int = 0) -> DataFrame:
    """Produce integer label masks on the parent channel."""
    if backend == "cellpose":
        raise NotImplementedError(
            "CellPose segmentation requires torch+cellpose (GPU); not "
            "available in this environment. Use backend='watershed'."
        )
    if backend != "watershed":
        raise ValueError(f"unknown backend {backend!r}")

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        masks, shapes = [], []
        for a in pixels:
            if a is None:
                masks.append(None)
                shapes.append(None)
                continue
            ch = a[parent_channel]
            # reference watershed_dapi.py:29-62: Otsu fg → distance
            # transform → peak markers → watershed on -distance. The
            # flood splits touching objects; clearing the 1-px line
            # between distinct labels (watershed_line semantics) keeps
            # them distinct through downstream bool re-labeling.
            t = K.threshold_otsu(ch)
            fg = K.fill_holes(ch > t)
            if not fg.any():
                lab = np.zeros(ch.shape, dtype=np.int32)
            else:
                dist = K.distance_transform(fg)
                markers, n = K.local_maxima_markers(dist, min_distance=3)
                if n == 0:
                    lab, _ = K.label(fg, 2)
                else:
                    lab = K.watershed(-dist, markers, mask=fg)
            sep = lab > 0
            # every 8-adjacent different-label pair has exactly one
            # representation q = p + f over these forward offsets, so
            # clearing the p side breaks all 8-connectivity across the
            # ridge (to_events re-labels with connectivity 2)
            h_, w_ = lab.shape
            for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
                ys = slice(0, h_ - dy)
                xs = slice(-dx, w_) if dx < 0 else slice(0, w_ - dx)
                ys2 = slice(dy, h_)
                xs2 = slice(0, w_ + dx) if dx < 0 else slice(dx, w_)
                la, lb = lab[ys, xs], lab[ys2, xs2]
                ridge = (la > 0) & (lb > 0) & (la != lb)
                sep[ys, xs] &= ~ridge
            full = np.broadcast_to(sep, a.shape).copy()
            masks.append(full.ravel().tolist())
            shapes.append(list(a.shape))
        pdf = pdf.copy()
        pdf["mask"] = pd.Series(masks, dtype=object).values
        pdf["mask_shape"] = pd.Series(shapes, dtype=object).values
        return pdf

    return map_events(df, batch)


def mask_subtract(df: DataFrame, target: int, left: int, right: int) -> DataFrame:
    """F14 channel arithmetic: ``mask[target] = mask[left] & ~mask[right]``
    (reference _substract_mask, src/scip/segmentation/__init__.py:11-13)."""

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        masks = decode_series(pdf["mask"], pdf["mask_shape"], dtype=bool)
        out = []
        for m in masks:
            if m is None:
                out.append(None)
                continue
            m = m.copy()
            m[target] = m[left] & ~m[right]
            out.append(m.ravel().tolist())
        pdf = pdf.copy()
        pdf["mask"] = pd.Series(out, dtype=object).values
        return pdf

    return map_events(df, batch)


def to_events(df: DataFrame, parent_channel: int = 0, group_keys: list[str] | None = None) -> DataFrame:
    """1→N flatMap: one record per labeled component of the parent
    channel, pixels+mask cropped to the component bbox, ``id`` = label,
    ``group`` = join of group_keys (reference segmentation/__init__.py:85-118)."""
    group_keys = group_keys or ["group"]

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        masks = decode_series(pdf["mask"], pdf["mask_shape"], dtype=bool)
        out_rows = []
        for i in range(len(pdf)):
            a, m = pixels[i], masks[i]
            if a is None or m is None:
                continue
            lab, n = K.label(m[parent_channel], 2)
            base = pdf.iloc[i]
            for l0 in range(1, n + 1):
                comp = lab == l0
                box = K.bounding_box(comp)
                minr, minc, maxr, maxc = box
                crop_px = a[:, minr:maxr, minc:maxc]
                crop_m = np.broadcast_to(
                    comp[minr:maxr, minc:maxc], crop_px.shape
                ).copy()
                row = {c: base[c] for c in pdf.columns}
                row["pixels"] = crop_px.ravel().tolist()
                row["pixels_shape"] = list(crop_px.shape)
                row["mask"] = crop_m.ravel().tolist()
                row["mask_shape"] = list(crop_m.shape)
                row["combined_mask"] = comp[minr:maxr, minc:maxc].ravel().tolist()
                row["background"] = [0.0] * crop_px.shape[0]
                row["combined_background"] = [0.0] * crop_px.shape[0]
                row["bbox"] = [int(minr), int(minc), int(maxr), int(maxc)]
                row["regions"] = [int(crop_m[c].any()) for c in range(crop_px.shape[0])]  # reference segmentation/__init__.py:100-102
                row["id"] = int(l0)
                row["group"] = "_".join(str(base[k]) for k in group_keys if k in pdf.columns)
                out_rows.append(row)
        if not out_rows:
            return pd.DataFrame(columns=list(pdf.columns))
        return pd.DataFrame(out_rows, columns=list(pdf.columns))

    return map_events(df, batch)
