"""F17-F22: wide feature extraction → flat feature DataFrame.

Reference: src/scip/features/{intensity,shape,texture,bbox,raw_intensity}.py
and the assembly in features/__init__.py:58-161. Column names are
generated programmatically — ``meta_*`` identifiers + ``feat_<family>_
<prop>_<view>_c<channel>`` — and the full schema is computed BEFORE any
data is read (the reference computes its dask ``meta`` dict up front;
here it becomes the mapInPandas output StructType).

Soft-deleted records (null ``pixels``) produce metadata-only rows with
null features (reference features/__init__.py:77-99).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from scip_spark.kernels import imageops as K
from scip_spark.operators import map_events
from scip_spark.schema import decode_series

META_COLS = ["path", "group", "id", "object_number"]

INTENSITY_PROPS = [
    "mean", "median", "min", "max", "std", "mad", "q25", "q75", "sum", "skew", "kurt",
]
# Reference intensity.py:40-51 — 8 views: {channel, combined} ×
# {raw, bgcorr, edge, bgcorr_edge}.
INTENSITY_VIEWS = [
    "mask",
    "bgcorr",
    "edge",
    "bgcorr_edge",
    "combined",
    "combined_bgcorr",
    "combined_edge",
    "combined_bgcorr_edge",
]
# Reference shape.py:24-84 — the full 59-prop regionprops set, computed
# for the combined mask plus every channel mask (shape.py:108-112).
SHAPE_PROPS = list(K.SHAPE_PROP_NAMES)
GLCM_BASE = ["contrast", "dissimilarity", "homogeneity", "energy", "correlation", "asm"]
# reference texture.py:25-47: per-prop mean AND std over the 4 angles,
# at distances 3 and 5, plus sobel-map stats
TEXTURE_PROPS = [
    f"glcm_{stat}_{p}_d{d}" for d in (3, 5) for p in GLCM_BASE for stat in ("mean", "std")
] + ["sobel_mean", "sobel_std", "sobel_max", "sobel_min"]
# Reference texture.py:29-47: every texture prop is computed on the
# channel-mask view AND the combined-mask view.
TEXTURE_VIEWS = ["", "combined_"]
BBOX_PROPS = ["bbox_minr", "bbox_minc", "bbox_maxr", "bbox_maxc"]


def feature_columns(nchannels: int, families: list[str]) -> list[str]:
    cols: list[str] = []
    if "bbox" in families:
        cols += [f"feat_bbox_{p}" for p in BBOX_PROPS]
    if "intensity" in families:
        cols += [
            f"feat_intensity_{p}_{v}_c{c}"
            for c in range(nchannels)
            for v in INTENSITY_VIEWS
            for p in INTENSITY_PROPS
        ]
    if "raw" in families:
        cols += [f"feat_raw_{p}_c{c}" for c in range(nchannels) for p in INTENSITY_PROPS]
    if "shape" in families:
        cols += [f"feat_shape_{p}_combined" for p in SHAPE_PROPS]
        cols += [f"feat_shape_{p}_c{c}" for c in range(nchannels) for p in SHAPE_PROPS]
    if "texture" in families:
        cols += [
            f"feat_texture_{v}{p}_c{c}"
            for c in range(nchannels)
            for v in TEXTURE_VIEWS
            for p in TEXTURE_PROPS
        ]
    return cols


def feature_schema(nchannels: int, families: list[str]) -> T.StructType:
    fields = [
        T.StructField("path", T.StringType()),
        T.StructField("group", T.StringType()),
        T.StructField("id", T.IntegerType()),
        T.StructField("object_number", T.IntegerType()),
        T.StructField("regions", T.ArrayType(T.IntegerType())),
    ]
    fields += [T.StructField(c, T.DoubleType()) for c in feature_columns(nchannels, families)]
    return T.StructType(fields)


def _stats11_ref(x: np.ndarray) -> list[float]:
    """Reference formulation (plain numpy API calls). Kept as the
    NaN-input path and the bit-exactness oracle for :func:`_stats11`
    (tests/test_features.py pins _stats11 == _stats11_ref on random
    vectors)."""
    if x.size == 0:
        return [0.0] * len(INTENSITY_PROPS)
    x = x.astype(np.float64)
    mu = float(x.mean())
    sd = float(x.std())
    med = float(np.median(x))
    mad = float(np.median(np.abs(x - med)))
    q25, q75 = (float(q) for q in np.quantile(x, [0.25, 0.75]))
    if sd > 0:
        z = (x - mu) / sd
        skew = float((z**3).mean())
        kurt = float((z**4).mean()) - 3.0
    else:
        skew, kurt = 0.0, 0.0
    return [mu, med, float(x.min()), float(x.max()), sd, mad, q25, q75, float(x.sum()), skew, kurt]


def _sorted_median(s: np.ndarray) -> float:
    """np.median of the vector whose SORTED copy is ``s`` — for even n
    numpy takes the mean of the two middles (pairwise add then divide),
    reproduced here as (a+b)/2 on float64 scalars: the identical IEEE
    operations."""
    n = s.shape[0]
    h = n // 2
    if n % 2:
        return float(s[h])
    return float((s[h - 1] + s[h]) / 2.0)


def _sorted_quantile(s: np.ndarray, q: float) -> float:
    """np.quantile(..., method='linear') on a pre-sorted float64 vector,
    replicating numpy 1.26's exact arithmetic (virtual index q*(n-1),
    and _lerp's ``a + t*(b-a)`` with the ``b - (1-t)*(b-a)`` branch for
    t >= 0.5) so the result is bit-identical to the unsorted API call
    — Python float scalar ops are the same IEEE-754 float64 ops."""
    n = s.shape[0]
    vi = q * (n - 1)
    if vi >= n - 1:
        return float(s[n - 1])
    prev = int(vi)
    t = vi - prev
    a = float(s[prev])
    b = float(s[prev + 1])
    diff = b - a
    if t >= 0.5:
        return b - diff * (1.0 - t)
    return a + diff * t


def _stats11(x: np.ndarray) -> list[float]:
    """11 intensity stats from ONE sort + direct ufunc reductions —
    bit-identical to :func:`_stats11_ref` (property-pinned): means are
    the same pairwise ``np.add.reduce``/n numpy's ``.mean``/``.std``
    run, order statistics index the sorted copy, and quantile
    interpolation replicates numpy's ``_lerp``. ~5× less per-call
    overhead on the small masked-pixel vectors this is fed (called
    ~12× per record in the hot feature path)."""
    if x.size == 0:
        return [0.0] * len(INTENSITY_PROPS)
    # ravel first: the reference path's whole-array reductions flatten,
    # and astype makes the copy contiguous, so the pairwise sums below
    # reduce in the same memory order numpy's axis=None reductions use
    x = x.astype(np.float64).ravel()
    n = x.shape[0]
    s = np.sort(x)
    if np.isnan(s[-1]):  # NaNs present: keep numpy's propagation exactly
        return _stats11_ref(x)
    total = float(np.add.reduce(x))
    mu = total / n
    d = x - mu
    sd = float(np.sqrt(np.add.reduce(d * d) / n))
    med = _sorted_median(s)
    mad = _sorted_median(np.sort(np.abs(x - med)))
    q25 = _sorted_quantile(s, 0.25)
    q75 = _sorted_quantile(s, 0.75)
    if sd > 0:
        z = d / sd
        skew = float(np.add.reduce(z**3) / n)
        kurt = float(np.add.reduce(z**4) / n) - 3.0
    else:
        skew, kurt = 0.0, 0.0
    return [mu, med, float(s[0]), float(s[n - 1]), sd, mad, q25, q75, total, skew, kurt]


def _stats11_batch(X: np.ndarray) -> list[list[float]]:
    """:func:`_stats11` for a C-contiguous (N, L) stack of SAME-LENGTH
    vectors, one vectorized pass for all rows. Bit-identical per row:
    numpy's pairwise summation and sort operate independently per
    output element along the contiguous trailing axis, so
    ``np.add.reduce(X, axis=1)[i] == np.add.reduce(X[i])`` and
    ``np.sort(X, axis=1)[i] == np.sort(X[i])`` exactly (verified over
    lengths 3..5000; pinned in tests/test_features.py), and the
    quantile/median interpolation below repeats _sorted_quantile's
    scalar IEEE ops elementwise. Rows containing NaN fall back to
    :func:`_stats11_ref` individually, matching the scalar path."""
    n_rows, n = X.shape
    S = np.sort(X, axis=1)
    out: list[list[float] | None] = [None] * n_rows
    nan_rows = np.isnan(S[:, -1])
    total = np.add.reduce(X, axis=1)
    mu = total / n
    d = X - mu[:, None]
    sd = np.sqrt(np.add.reduce(d * d, axis=1) / n)
    h = n // 2
    if n % 2:
        med = S[:, h].copy()
    else:
        med = (S[:, h - 1] + S[:, h]) / 2.0
    A = np.sort(np.abs(X - med[:, None]), axis=1)
    if n % 2:
        mad = A[:, h].copy()
    else:
        mad = (A[:, h - 1] + A[:, h]) / 2.0

    def qcol(q: float) -> np.ndarray:
        vi = q * (n - 1)
        if vi >= n - 1:
            return S[:, n - 1].copy()
        prev = int(vi)
        t = vi - prev
        a = S[:, prev]
        b = S[:, prev + 1]
        diff = b - a
        if t >= 0.5:
            return b - diff * (1.0 - t)
        return a + diff * t

    q25, q75 = qcol(0.25), qcol(0.75)
    pos = sd > 0
    skew = np.zeros(n_rows)
    kurt = np.zeros(n_rows)
    if pos.any():
        z = d[pos] / sd[pos, None]
        skew[pos] = np.add.reduce(z**3, axis=1) / n
        kurt[pos] = np.add.reduce(z**4, axis=1) / n - 3.0
    for i in range(n_rows):
        if nan_rows[i]:
            out[i] = _stats11_ref(X[i])
        else:
            out[i] = [
                float(mu[i]), float(med[i]), float(S[i, 0]), float(S[i, n - 1]),
                float(sd[i]), float(mad[i]), float(q25[i]), float(q75[i]),
                float(total[i]), float(skew[i]), float(kurt[i]),
            ]
    return out  # type: ignore[return-value]


def _stats11_many(vecs: list[np.ndarray]) -> list[list[float]]:
    """_stats11 for many vectors of mixed lengths: groups by length,
    stacks each group contiguously, runs :func:`_stats11_batch` per
    group — per-vector results bit-identical to per-call _stats11 at a
    fraction of the dispatch count (the intensity family feeds ~13
    same-record vectors whose lengths repeat heavily)."""
    out: list[list[float] | None] = [None] * len(vecs)
    groups: dict[int, list[int]] = {}
    for i, v in enumerate(vecs):
        groups.setdefault(int(v.size), []).append(i)
    for ln, idxs in groups.items():
        if ln == 0:
            for i in idxs:
                out[i] = [0.0] * len(INTENSITY_PROPS)
            continue
        if len(idxs) == 1:
            out[idxs[0]] = _stats11(vecs[idxs[0]])
            continue
        X = np.empty((len(idxs), ln), dtype=np.float64)
        for r, i in enumerate(idxs):
            X[r] = vecs[i].astype(np.float64).ravel()
        for i, row in zip(idxs, _stats11_batch(X)):
            out[i] = row
    return out  # type: ignore[return-value]


#: per-levels constant matrices for the GLCM props (i/j grids, |i-j|,
#: (i-j)², 1/(1+(i-j)²)) — identical values to the per-call meshgrid
#: construction, hoisted out of the hot loop
_GLCM_CONST: dict[int, tuple] = {}


def _glcm_const(levels: int):
    c = _GLCM_CONST.get(levels)
    if c is None:
        i, j = np.meshgrid(np.arange(levels), np.arange(levels), indexing="ij")
        diff = i - j
        # NOTE 1+diff² is hoisted, not its reciprocal: homogeneity must
        # keep the same IEEE division the unhoisted code performed
        c = (i, j, diff, diff**2, np.abs(diff), 1.0 + diff**2)
        _GLCM_CONST[levels] = c
    return c


def _glcm_quantize(ch: np.ndarray, mask: np.ndarray, levels: int = 15):
    """Masked [1..levels] quantization shared by every GLCM distance
    (it does not depend on the co-occurrence offset — computing it
    once per (channel, mask) instead of once per distance is free and
    bit-identical). Returns None when fewer than 2 masked pixels."""
    vals = ch[mask]
    if vals.size < 2:
        return None
    lo, hi = float(vals.min()), float(vals.max())
    span = (hi - lo) or 1.0
    q = np.zeros_like(ch, dtype=np.int32)
    q[mask] = np.minimum(((ch[mask] - lo) / span * levels).astype(np.int32), levels - 1) + 1
    return q


def _glcm_pstack_many(specs: list[tuple], levels: int = 15) -> list[tuple[list, list]]:
    """Per-angle normalized co-occurrence matrices for MANY (quantized
    image, distance) instances: one (ps, idxs) per spec, with ps a
    list of (L, L) float64 P matrices and idxs the surviving angle
    indices (0/45/90/135 deg). Pair counting uses flat-index
    ``bincount`` (exact integer counts — identical to the former
    ``np.add.at`` scatter, ~10× faster); (instance, angle)-offset
    codes let ONE bincount count every instance's every angle (the
    texture family feeds ~12 instances per record), and the
    symmetrize/normalize steps run as one stacked pass — per-slice
    trailing-axes sums keep the per-angle reduction order, and the
    normalize is a per-slice scalar division. ``q`` None (fewer than
    2 masked pixels) → no slices for that spec."""
    side = levels + 1
    blk = side * side
    codes: list[np.ndarray] = []
    meta: list[tuple[int, int]] = []  # (spec index, angle index)
    for si, (q, d) in enumerate(specs):
        if q is None:
            continue
        h, w = q.shape
        for ai, (dy, dx) in enumerate([(0, d), (d, d), (d, 0), (d, -d)]):
            if h - abs(dy) <= 0 or w - abs(dx) <= 0:
                # crop smaller than the co-occurrence offset: no valid
                # pairs at this angle (negative slice extents would
                # otherwise produce shape-mismatched views)
                continue
            y0, y1 = max(0, -dy), min(h, h - dy)
            x0, x1 = max(0, -dx), min(w, w - dx)
            a = q[y0:y1, x0:x1]
            b = q[y0 + dy : y1 + dy, x0 + dx : x1 + dx]
            # zero level = unmasked: pairs with either side 0 land in
            # row or column 0 of the flat histogram, cropped by [1:, 1:]
            codes.append((a * side + b).ravel() + (si * 4 + ai) * blk)
            meta.append((si, ai))
    out: list[tuple[list, list]] = [([], []) for _ in specs]
    if not codes:
        return out
    flat = np.bincount(np.concatenate(codes), minlength=len(specs) * 4 * blk)
    rows = [si * 4 + ai for si, ai in meta]
    g = flat.reshape(len(specs) * 4, side, side)[rows][:, 1:, 1:].astype(np.float64)
    sym = g + g.transpose(0, 2, 1)  # symmetric, per slice
    totals = sym.sum(axis=(1, 2))
    keep = totals > 0
    P = sym[keep] / totals[keep, None, None]
    kp = 0
    for (si, ai), k in zip(meta, keep.tolist()):
        if k:
            out[si][0].append(P[kp])
            out[si][1].append(ai)
            kp += 1
    return out


def _glcm_pstack(q: np.ndarray | None, distance: int, levels: int = 15):
    """Single-instance :func:`_glcm_pstack_many`."""
    return _glcm_pstack_many([(q, distance)], levels)[0]


def _glcm_props_batch(instances: list[tuple[list, list]], levels: int = 15) -> list[list[float]]:
    """6 GLCM props (contrast/dissimilarity/homogeneity/energy/
    correlation/ASM), mean AND std over the 4 angles, for MANY
    :func:`_glcm_pstack` instances in ONE stacked pass (reference
    texture.py:25-132 semantics, numpy re-implementation).

    Every P slice across every instance lands in one (M, L, L) stack:
    the per-slice trailing-axes reductions run the same pairwise order
    as a per-angle 2D ``.sum()`` regardless of M, and the angle-axis
    mean/std reduce sequentially per instance either way (length 4),
    so values are bit-identical to the former per-call loop
    (property-pinned in tests/test_features.py) at ~n_instances× fewer
    numpy dispatches — the hot feature path feeds ~12 instances per
    record (channels × views × distances)."""
    i, j, diff, diff2, absdiff, one_plus_diff2 = _glcm_const(levels)
    all_ps: list[np.ndarray] = []
    inst_ids: list[int] = []
    angle_ids: list[int] = []
    for n, (ps, idxs) in enumerate(instances):
        all_ps.extend(ps)
        inst_ids.extend([n] * len(ps))
        angle_ids.extend(idxs)
    arr = np.zeros((len(instances), 4, 6))
    if all_ps:
        P = np.stack(all_ps)
        tail = (1, 2)
        contrast = (P * diff2).sum(axis=tail)
        dissim = (P * absdiff).sum(axis=tail)
        homog = (P / one_plus_diff2).sum(axis=tail)
        asm = (P**2).sum(axis=tail)
        energy = np.sqrt(asm)
        mu_i = (P * i).sum(axis=tail)
        mu_j = (P * j).sum(axis=tail)
        di = i[None] - mu_i[:, None, None]
        dj = j[None] - mu_j[:, None, None]
        sd_i = np.sqrt((P * di**2).sum(axis=tail))
        sd_j = np.sqrt((P * dj**2).sum(axis=tail))
        cov = (P * di * dj).sum(axis=tail)
        corr = np.where(
            (sd_i > 0) & (sd_j > 0), cov / np.where(sd_i * sd_j == 0, 1.0, sd_i * sd_j), 1.0
        )
        arr[inst_ids, angle_ids] = np.column_stack(
            [contrast, dissim, homog, energy, corr, asm]
        )
    mean = np.add.reduce(arr, axis=1) / 4.0
    dd = arr - mean[:, None, :]
    std = np.sqrt(np.add.reduce(dd * dd, axis=1) / 4.0)
    out = np.empty((len(instances), 12))
    out[:, 0::2] = mean
    out[:, 1::2] = std
    return out.tolist()  # one C-level call; yields builtin floats


def _glcm_features(ch: np.ndarray, mask: np.ndarray, distance: int, levels: int = 15,
                   q: np.ndarray | None = None) -> list[float]:
    """Single-instance GLCM feature row — the batched pipeline above
    with exactly one instance. ``q`` lets the caller share one
    :func:`_glcm_quantize` across distances."""
    if q is None:
        q = _glcm_quantize(ch, mask, levels)
    return _glcm_props_batch([_glcm_pstack(q, distance, levels)], levels)[0]


def _shape_row(mask: np.ndarray) -> list[float]:
    """Component-mean of the 59 regionprops (reference shape.py:115-123:
    ``numpy.mean(props[k])`` over the labeled components), or the fixed
    empty-mask default row (shape.py:149-211)."""
    if not mask.any():
        return list(K.SHAPE_EMPTY_DEFAULTS)
    lab, _ = K.label(mask, 2)
    rows = K.regionprops_full_rows(lab, assume_connected=True)
    # one (59, n_regions) array mean instead of 59 list-of-floats
    # np.mean calls. Layout matters for bit-identity: each prop's
    # values must lie CONTIGUOUS (axis=-1 reduction) so numpy runs the
    # same pairwise summation the 1-D mean ran — an axis-0 reduction
    # over the transposed layout accumulates sequentially and differs
    # in the last ulp once n_regions > 8 (caught by the equality test).
    # rows arrive region-major (n, 59) in SHAPE_PROPS order; the
    # ascontiguousarray transpose restores the prop-contiguous layout.
    arr = np.ascontiguousarray(np.array(rows, dtype=np.float64).T)
    return [float(v) for v in arr.mean(axis=-1)]


def _sobel_stats(sob: np.ndarray, mask: np.ndarray) -> list[float]:
    sv = sob[mask]
    if sv.size:
        return [float(sv.mean()), float(sv.std()), float(sv.max()), float(sv.min())]
    return [0.0] * 4


_ZERO11 = [0.0] * len(INTENSITY_PROPS)

#: zero-view marker in deferred token rows — a dedicated sentinel, NOT
#: None (shape empty-default rows legitimately contain None = null)
_ZERO_VIEW = object()


def _resolve_features(tokens: list, stats: list[list[float]]) -> list:
    """Expand a deferred _record_features token row: floats/None pass
    through, ``_ZERO_VIEW`` splices the 11-zero row, an int handle
    splices the corresponding :func:`_stats11_many` result."""
    vals: list = []
    for e in tokens:
        if e is _ZERO_VIEW:
            vals += _ZERO11
        elif type(e) is int:
            vals += stats[e]
        else:
            vals.append(e)
    return vals


def _record_features(
    a, m, cm, bg, cbg, bbox, families: list[str], nchannels: int,
    jobs: list | None = None,
) -> list:
    """One record's feature row. With ``jobs=None`` (the standalone
    API): resolved floats, exactly as always. With a caller-owned
    ``jobs`` list: a TOKEN row (floats/None literals + int handles into
    ``jobs`` + ``_ZERO_VIEW`` markers) whose _stats11 work is deferred — the caller
    stacks every record of an Arrow batch into ONE
    :func:`_stats11_many` call and expands rows via
    :func:`_resolve_features`. Cross-record grouping is bit-identical
    per vector (which rows share a _stats11_batch stack cannot change
    any row's values — the pinned batch property), so deferral only
    changes dispatch count, never results."""
    defer = jobs is not None
    if jobs is None:
        jobs = []
    out: list = []

    def _job(v: np.ndarray) -> int:
        jobs.append(v)
        return len(jobs) - 1

    if cm is not None:
        cm_any = cm
    elif m is not None:
        cm_any = m.any(axis=0)
    else:
        cm_any = np.ones(a.shape[1:], bool)
    if "bbox" in families:
        out += [float(v) for v in (bbox if bbox is not None else [0, 0, 0, 0])]
    # Per-channel masks are very often bit-identical to the combined
    # mask (a single segmentation broadcast across channels — the
    # reference's own default). Detect that once and reuse the
    # mask-dependent computations (edge erosion, regionprops, GLCM)
    # instead of recomputing them per view: byte-identical results,
    # ~2× fewer mask kernels on the common path.
    def _mask_of(c):
        return m[c] if m is not None else np.ones(a.shape[1:], bool)

    same_as_cm = [
        m is not None and cm_any.shape == m[c].shape and np.array_equal(m[c], cm_any)
        for c in range(nchannels)
    ] if m is not None else [False] * nchannels

    if "intensity" in families:
        # combined-mask edge is channel-independent: compute once; the
        # distinct per-channel masks erode in the SAME batched pass
        # (identical cumsum counting — see erode_footprint_batch)
        _need_edge = [
            c for c in range(nchannels) if not same_as_cm[c] and _mask_of(c).any()
        ]
        _eroded = K.erode_footprint_batch(
            np.stack([cm_any] + [_mask_of(c) for c in _need_edge]), K.disk(6)
        )
        cm_edge = cm_any ^ _eroded[0]
        _edge_of = {
            c: _mask_of(c) ^ _eroded[1 + i] for i, c in enumerate(_need_edge)
        }
        # every channel's/view's vector lands in ONE length-grouped
        # _stats11_many call (same-record vectors share lengths heavily:
        # the 3 channels of one mask view are always equal-length) —
        # per-view values bit-identical to the former per-call _stats11
        # (see _stats11_batch docstring + pin test)
        specs: list[dict[str, object]] = []

        for c in range(nchannels):
            chan = a[c]
            mask_c = _mask_of(c)
            bg_c = float(bg[c]) if bg is not None else 0.0
            cbg_c = float(cbg[c]) if cbg is not None else 0.0
            spec: dict[str, object] = {}
            # views 1-4: channel mask (reference intensity.py:126-145 —
            # empty mask or empty edge default to 0 rows)
            if mask_c.any():
                mp = chan[mask_c]
                spec["mask"] = _job(mp)
                spec["bgcorr"] = _job(mp - bg_c)
                edge = cm_edge if same_as_cm[c] else _edge_of[c]
                if edge.any():
                    ep = chan[edge]
                    spec["edge"] = _job(ep)
                    spec["bgcorr_edge"] = _job(ep - bg_c)
                else:
                    spec["edge"] = spec["bgcorr_edge"] = "zero"
            else:
                spec["mask"] = spec["bgcorr"] = "zero"
                spec["edge"] = spec["bgcorr_edge"] = "zero"
            # views 5-8: combined mask (intensity.py:147-162)
            if same_as_cm[c] and mask_c.any():
                spec["combined"] = spec["mask"]
                spec["combined_bgcorr"] = (
                    spec["bgcorr"]
                    if cbg_c == bg_c
                    else _job(chan[cm_any] - cbg_c)
                )
                spec["combined_edge"] = spec["edge"]
                spec["combined_bgcorr_edge"] = (
                    spec["bgcorr_edge"]
                    if cbg_c == bg_c
                    else (
                        _job(chan[cm_edge] - cbg_c) if cm_edge.any() else "zero"
                    )
                )
            else:
                cp = chan[cm_any]
                spec["combined"] = _job(cp)
                spec["combined_bgcorr"] = _job(cp - cbg_c)
                if cm_edge.any():
                    cep = chan[cm_edge]
                    spec["combined_edge"] = _job(cep)
                    spec["combined_bgcorr_edge"] = _job(cep - cbg_c)
                else:
                    spec["combined_edge"] = "zero"
                    spec["combined_bgcorr_edge"] = "zero"
            specs.append(spec)
        for spec in specs:
            for v in INTENSITY_VIEWS:
                s = spec[v]
                out.append(_ZERO_VIEW if s == "zero" else s)
    if "raw" in families:
        # the full-channel vectors share length H*W: one length group
        for c in range(nchannels):
            out.append(_job(a[c]))
    if "shape" in families:
        # combined row first, then one row per channel (shape.py:143-148)
        shape_cm = _shape_row(cm_any)
        out += shape_cm
        chan_shape_cache: list[tuple[np.ndarray, list[float]]] = []
        for c in range(nchannels):
            mask_c = _mask_of(c)
            if same_as_cm[c]:
                out += shape_cm
                continue
            hit = next(
                (r for mc, r in chan_shape_cache if np.array_equal(mc, mask_c)), None
            )
            if hit is None:
                hit = _shape_row(mask_c)
                chan_shape_cache.append((mask_c, hit))
            out += hit
    if "texture" in families:
        # defer every GLCM instance of the record (channels × views ×
        # distances, ~12) into ONE _glcm_props_batch call; sobel is
        # mask-independent, so compute it once per channel and slice it
        # per view — both bit-identical to the per-view formulation
        t_specs: list[tuple] = []  # (q, distance) — one bincount for all
        t_meta: list[tuple[int, list[float]]] = []  # (pstack base, sobel tail)
        t_emit: list[int] = []  # row order: two per channel, may repeat
        sobs = K.sobel_batch(a[:nchannels])  # all channels, one pass
        for c in range(nchannels):
            chan = a[c]
            mask_c = _mask_of(c)
            sob = sobs[c]
            for vmask in ([mask_c] if same_as_cm[c] else [mask_c, cm_any]):
                qv = _glcm_quantize(chan, vmask)
                base = len(t_specs)
                t_specs.append((qv, 3))
                t_specs.append((qv, 5))
                t_meta.append((base, _sobel_stats(sob, vmask)))
            if same_as_cm[c]:
                t_emit += [len(t_meta) - 1] * 2
            else:
                t_emit += [len(t_meta) - 2, len(t_meta) - 1]
        t_props = _glcm_props_batch(_glcm_pstack_many(t_specs))
        for mi in t_emit:
            base, sob_tail = t_meta[mi]
            out += t_props[base] + t_props[base + 1] + sob_tail
    if defer:
        return out
    return _resolve_features(out, _stats11_many(jobs))


DEFAULT_FAMILIES = ["bbox", "intensity", "raw", "shape", "texture"]


def make_features_batch(nchannels: int, families: list[str] | None = None):
    """Batch kernel behind :func:`extract_features` (factory form for
    the fused multi-branch pipeline — see masking.make_mask_batch)."""
    families = families or DEFAULT_FAMILIES
    feat_cols = feature_columns(nchannels, families)

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pixels = decode_series(pdf["pixels"], pdf["pixels_shape"])
        masks = decode_series(pdf["mask"], pdf["mask_shape"], dtype=bool)
        # per-column Python lists once: Series/iloc access per (event,
        # column) costs ~1 µs of pandas machinery each (same values)
        def col(name):
            return pdf[name].tolist() if name in pdf.columns else [None] * len(pdf)

        paths, groups_, ids_, objnums = col("path"), col("group"), col("id"), col("object_number")
        regions_, cms, bgs, cbgs, bboxes = (
            col("regions"), col("combined_mask"), col("background"),
            col("combined_background"), col("bbox"),
        )
        # cross-RECORD _stats11 batching: every record's intensity/raw
        # vectors accumulate into ONE batch-wide jobs list (token rows
        # come back with handles), so the length-grouped batch kernel
        # sees group sizes of the whole Arrow batch instead of one
        # record — identical values (see _record_features docstring),
        # ~batch-size× fewer _stats11_batch dispatch rounds.
        jobs: list[np.ndarray] = []
        token_rows: list[list | None] = []
        for i in range(len(pdf)):
            a, m = pixels[i], masks[i]
            if a is None:
                token_rows.append(None)
                continue
            cm_flat = cms[i]
            cm = (
                np.asarray(cm_flat, dtype=bool).reshape(a.shape[1:])
                if cm_flat is not None
                else None
            )
            token_rows.append(
                _record_features(
                    a,
                    m,
                    cm,
                    bgs[i],
                    cbgs[i],
                    bboxes[i],
                    families,
                    nchannels,
                    jobs=jobs,
                )
            )
        stats = _stats11_many(jobs)
        # columnar assembly (guide §4.2): the feature block is one
        # (n_records × n_feat_cols) float64 matrix instead of a list of
        # ~650-key per-row dicts — pd.DataFrame(list-of-dicts) infers
        # dtype cell-by-cell and dominated this stage's Python-worker
        # CPU profile. None cells (soft-deleted records, shape
        # empty-default rows) become NaN in the float64 block, which
        # Arrow serializes as NULL exactly like the old object→float64
        # column path did (pinned by the golden checksum tests).
        mat = np.full((len(token_rows), len(feat_cols)), np.nan, dtype=np.float64)
        for i, tokens in enumerate(token_rows):
            if tokens is not None:
                mat[i] = np.asarray(
                    _resolve_features(tokens, stats), dtype=np.float64
                )
        meta_df = pd.DataFrame(
            {
                "path": paths,
                "group": groups_,
                "id": ids_,
                "object_number": objnums,
                "regions": regions_,
            }
        )
        feat_df = pd.DataFrame(mat, columns=feat_cols, copy=False)
        # feature_schema() is exactly these meta fields + feat_cols, in
        # this order, so the concat already matches the declared schema
        return pd.concat([meta_df, feat_df], axis=1)

    return batch


def extract_features(df: DataFrame, nchannels: int, families: list[str] | None = None) -> DataFrame:
    """Event records → flat wide feature frame (one row per record,
    null features for soft-deleted records)."""
    families = families or DEFAULT_FAMILIES
    return map_events(
        df,
        make_features_batch(nchannels, families),
        feature_schema(nchannels, families),
    )
