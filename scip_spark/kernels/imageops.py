"""Pure-numpy image kernels used inside Arrow-batched pandas UDFs.

The reference delegates per-record compute to scikit-image / scipy /
numba (reference setup.cfg:28-42). Those libraries aren't available
here, so the needed subset is implemented from scratch on numpy —
behaviourally equivalent where the tests assert (thresholds, labeling,
morphology, region properties), not a code port.

All functions operate on single 2-D arrays (H×W) or stacks; callers
loop channels inside the UDF batch.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# filtering
# ---------------------------------------------------------------------------


def reflect_pad(img: np.ndarray, top: int, bottom: int, left: int, right: int) -> np.ndarray:
    """2-D reflect padding (numpy's mode='reflect': edge not repeated),
    built from 9 slice assignments. np.pad's generic machinery costs
    ~65 µs/call in Python bookkeeping; this is ~5 µs and bit-identical
    (equality pinned in tests/test_properties.py). Pad widths >= the
    image extent (tiny ragged crops under a large footprint) need
    multi-reflection — that rare case delegates to np.pad."""
    h, w = img.shape
    if top >= h or bottom >= h or left >= w or right >= w:
        return np.pad(img, ((top, bottom), (left, right)), mode="reflect")
    out = np.empty((h + top + bottom, w + left + right), dtype=img.dtype)
    out[top : top + h, left : left + w] = img
    if top:
        out[:top, left : left + w] = img[1 : top + 1][::-1]
    if bottom:
        out[top + h :, left : left + w] = img[h - 1 - bottom : h - 1][::-1]
    if left:
        out[:, :left] = out[:, left + 1 : 2 * left + 1][:, ::-1]
    if right:
        c = left + w
        out[:, c:] = out[:, c - 1 - right : c - 1][:, ::-1]
    return out


def gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(round(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _conv1d_reflect(img: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    r = len(k) // 2
    p = reflect_pad(img, r, r, 0, 0) if axis == 0 else reflect_pad(img, 0, 0, r, r)
    out = np.zeros_like(img, dtype=np.float64)
    for i, kv in enumerate(k):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + img.shape[axis])
        out += kv * p[tuple(sl)]
    return out


def gaussian(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian blur with reflect padding."""
    k = gaussian_kernel1d(sigma)
    return _conv1d_reflect(_conv1d_reflect(img.astype(np.float64), k, 0), k, 1)


def sobel(img: np.ndarray) -> np.ndarray:
    """Gradient magnitude via 3×3 Sobel operators (reflect padding)."""
    a = reflect_pad(img.astype(np.float64), 1, 1, 1, 1)
    gx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    )
    gy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    )
    return np.hypot(gx, gy)


def median_filter(img: np.ndarray, size: int = 3) -> np.ndarray:
    """Median filter via stacked shifted views (small kernels only)."""
    r = size // 2
    p = reflect_pad(img, r, r, r, r)
    stack = [
        p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
        for dy in range(size)
        for dx in range(size)
    ]
    return np.median(np.stack(stack), axis=0)


_GATHER_IDX_CACHE: dict = {}
#: byte budget for cached (h, w, k) intp gather indices. The hot path
#: (per-event mask chains) caches tiny-crop indices — a few KB each —
#: so a small budget keeps every useful entry; a full-frame call
#: (e.g. 2048² disk(5) ≈ 2.7 GB of intp) must NOT pin gigabytes on a
#: long-lived worker, and at that size the index build is cheap
#: relative to the gather+sort it feeds, so skipping the cache there
#: costs ~nothing (ADVICE r8).
_GATHER_IDX_BUDGET_BYTES = 64 << 20
_GATHER_IDX_BYTES = [0]


def footprint_filter(img: np.ndarray, footprint: np.ndarray, func) -> np.ndarray:
    """Grayscale rank/order filter over an arbitrary footprint
    (shifted views with reflect padding, reduced per pixel).

    min/max accumulate across the views (no k×H×W stack allocation);
    the median gathers into one (H, W, k) buffer and SORTS along the
    contiguous last axis, picking the middle element(s). For short
    rows (k ≈ 81) numpy's axis sort is ~3.5× faster than introselect
    ``partition`` (measured at 32² and 128², float32/float64/uint16),
    and the k/2-th order statistic is the same value either way, so
    the output is bit-identical to the partition formulation."""
    fy, fx = footprint.shape
    cy, cx = fy // 2, fx // 2
    p = reflect_pad(img, cy, fy - 1 - cy, cx, fx - 1 - cx)
    h, w = img.shape
    offsets = list(zip(*np.nonzero(footprint)))
    if func is np.min or func is np.max:
        acc = p[offsets[0][0] : offsets[0][0] + h, offsets[0][1] : offsets[0][1] + w].copy()
        op = np.minimum if func is np.min else np.maximum
        for oy, ox in offsets[1:]:
            op(acc, p[oy : oy + h, ox : ox + w], out=acc)
        return acc
    if func is np.median:
        idx = _gather_idx(footprint, offsets, h, w, p.shape[1])
        k = len(offsets)
        buf = p.ravel()[idx]
        buf.sort(axis=-1)
        if k % 2:
            return buf[:, :, k // 2]
        return (buf[:, :, k // 2 - 1] + buf[:, :, k // 2]) / 2.0
    stack = [p[oy : oy + h, ox : ox + w] for oy, ox in offsets]
    return func(np.stack(stack), axis=0)


def _gather_idx(footprint: np.ndarray, offsets: list, h: int, w: int, pw: int) -> np.ndarray:
    """(h, w, k) flat gather index into a padded image of row stride
    ``pw``: ONE fancy-indexing gather instead of k strided slice
    writes — flat index (oy+y)*pw + (ox+x) per (pixel, offset),
    identical element values. Cached per (footprint identity, image
    shape): the hot path calls this with the SAME cached disk on the
    SAME crop sizes per batch; the entry keeps the footprint object
    alive so its id cannot be recycled while cached, and the `is`
    check makes a hit exact."""
    key = (id(footprint), h, w)
    hit = _GATHER_IDX_CACHE.get(key)
    if hit is not None and hit[0] is footprint:
        return hit[1]
    k = len(offsets)
    oy = np.fromiter((o[0] for o in offsets), dtype=np.intp, count=k)
    ox = np.fromiter((o[1] for o in offsets), dtype=np.intp, count=k)
    base = (np.arange(h)[:, None] * pw + np.arange(w)[None, :]).reshape(h, w, 1)
    idx = base + (oy * pw + ox)[None, None, :]
    if idx.nbytes <= _GATHER_IDX_BUDGET_BYTES // 4:  # never cache huge frames
        if _GATHER_IDX_BYTES[0] + idx.nbytes > _GATHER_IDX_BUDGET_BYTES:
            _GATHER_IDX_CACHE.clear()
            _GATHER_IDX_BYTES[0] = 0
        _GATHER_IDX_CACHE[key] = (footprint, idx)
        _GATHER_IDX_BYTES[0] += idx.nbytes
    return idx


def median_disk(img: np.ndarray, radius: int) -> np.ndarray:
    return footprint_filter(img, disk(radius), np.median)


# ---------------------------------------------------------------------------
# batched filtering (N same-shape images in one call)
#
# The mask chains run per EVENT on tiny crops (8-12 px sides), where
# every kernel call is numpy-dispatch-bound. These variants take an
# (N, H, W) stack and run the identical per-slice arithmetic with the
# batch as a leading broadcast axis, so the dispatches amortize over
# the group. Each is bit-identical per slice to its 2-D twin
# (property-pinned in tests/test_properties.py).
# ---------------------------------------------------------------------------


def reflect_pad_batch(
    imgs: np.ndarray, top: int, bottom: int, left: int, right: int
) -> np.ndarray:
    """:func:`reflect_pad` over an (N, H, W) stack — same 9 slice
    assignments with a leading batch axis."""
    n, h, w = imgs.shape
    if top >= h or bottom >= h or left >= w or right >= w:
        return np.pad(imgs, ((0, 0), (top, bottom), (left, right)), mode="reflect")
    out = np.empty((n, h + top + bottom, w + left + right), dtype=imgs.dtype)
    out[:, top : top + h, left : left + w] = imgs
    if top:
        out[:, :top, left : left + w] = imgs[:, 1 : top + 1][:, ::-1]
    if bottom:
        out[:, top + h :, left : left + w] = imgs[:, h - 1 - bottom : h - 1][:, ::-1]
    if left:
        out[:, :, :left] = out[:, :, left + 1 : 2 * left + 1][:, :, ::-1]
    if right:
        c = left + w
        out[:, :, c:] = out[:, :, c - 1 - right : c - 1][:, :, ::-1]
    return out


def _conv1d_reflect_batch(imgs: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    """:func:`_conv1d_reflect` over an (N, H, W) stack; ``axis`` is 1
    (rows) or 2 (columns). Same tap-by-tap accumulation order."""
    r = len(k) // 2
    p = (
        reflect_pad_batch(imgs, r, r, 0, 0)
        if axis == 1
        else reflect_pad_batch(imgs, 0, 0, r, r)
    )
    out = np.zeros_like(imgs, dtype=np.float64)
    for i, kv in enumerate(k):
        sl = [slice(None), slice(None), slice(None)]
        sl[axis] = slice(i, i + imgs.shape[axis])
        out += kv * p[tuple(sl)]
    return out


def gaussian_batch(imgs: np.ndarray, sigma: float) -> np.ndarray:
    """:func:`gaussian` over an (N, H, W) stack."""
    k = gaussian_kernel1d(sigma)
    return _conv1d_reflect_batch(
        _conv1d_reflect_batch(imgs.astype(np.float64), k, 1), k, 2
    )


def sobel_batch(imgs: np.ndarray) -> np.ndarray:
    """:func:`sobel` over an (N, H, W) stack — identical expressions
    with a leading batch axis."""
    a = reflect_pad_batch(imgs.astype(np.float64), 1, 1, 1, 1)
    gx = (
        (a[:, :-2, 2:] + 2 * a[:, 1:-1, 2:] + a[:, 2:, 2:])
        - (a[:, :-2, :-2] + 2 * a[:, 1:-1, :-2] + a[:, 2:, :-2])
    )
    gy = (
        (a[:, 2:, :-2] + 2 * a[:, 2:, 1:-1] + a[:, 2:, 2:])
        - (a[:, :-2, :-2] + 2 * a[:, :-2, 1:-1] + a[:, :-2, 2:])
    )
    return np.hypot(gx, gy)


def median_disk_batch(imgs: np.ndarray, radius: int) -> np.ndarray:
    """:func:`median_disk` over an (N, H, W) stack: one flat gather per
    batch through the same cached (h, w, k) index, sorted along the
    trailing axis — element values and the k//2 order statistic are
    identical per slice. The (n, h, w, k) gather buffer is the memory
    hazard of batching (each slice costs k× its image), so oversized
    groups process in N-chunks under a fixed element budget —
    chunking along the batch axis cannot change any slice's values."""
    n, h, w = imgs.shape
    fp = disk(radius)
    k = int(fp.sum())
    budget = 1 << 26  # ≈512 MB of float64 gather buffer
    per = max(1, budget // max(1, h * w * k))
    if n > per:
        return np.concatenate(
            [median_disk_batch(imgs[i : i + per], radius) for i in range(0, n, per)]
        )
    fy, fx = fp.shape
    cy, cx = fy // 2, fx // 2
    p = reflect_pad_batch(imgs, cy, fy - 1 - cy, cx, fx - 1 - cx)
    offsets = list(zip(*np.nonzero(fp)))
    idx = _gather_idx(fp, offsets, h, w, p.shape[2])
    buf = p.reshape(n, -1)[:, idx]  # (n, h, w, k)
    buf.sort(axis=-1)
    if k % 2:
        return buf[..., k // 2]
    return (buf[..., k // 2 - 1] + buf[..., k // 2]) / 2.0


def median_disk_batch_int(imgs: np.ndarray, radius: int) -> np.ndarray:
    """:func:`median_disk_batch` for integer-VALUED float stacks — the
    otsu chain's SECOND median runs on ``floor(rescaled · max)`` values
    in [0, 513] (reference src/scip/masking/otsu.py:9-61: the input is
    digitized/floored before this median), so the gather buffer can be
    int16: half a float64's memory traffic and ~2× its sort throughput
    at k=81 (measured 1.7–2.2× on 9–32 px crops). Bit-identical by
    construction: every value is an exact small integer, the k//2
    order statistic of ints is the same int, and the even-k midpoint
    ``(a+b)/2.0`` of two ints ≤ 2^14 is exact in float64. Inputs that
    are NOT int16-exact (non-integral, out of range, NaN) fall back to
    the float64 path, so the function is safe as a drop-in anywhere."""
    n, h, w = imgs.shape
    fp = disk(radius)
    k = int(fp.sum())
    budget = 1 << 28  # int16 buffer: 4× the float64 element budget
    per = max(1, budget // max(1, h * w * k))
    if n > per:
        return np.concatenate(
            [
                median_disk_batch_int(imgs[i : i + per], radius)
                for i in range(0, n, per)
            ]
        )
    fy, fx = fp.shape
    cy, cx = fy // 2, fx // 2
    p = reflect_pad_batch(imgs, cy, fy - 1 - cy, cx, fx - 1 - cx)
    with np.errstate(invalid="ignore"):
        ip = p.astype(np.int16)
    if not np.array_equal(ip, p):  # not int16-exact → float64 path
        return median_disk_batch(imgs, radius)
    offsets = list(zip(*np.nonzero(fp)))
    idx = _gather_idx(fp, offsets, h, w, p.shape[2])
    buf = ip.reshape(n, -1)[:, idx]
    buf.sort(axis=-1)
    if k % 2:
        return buf[..., k // 2].astype(np.float64)
    return (buf[..., k // 2 - 1].astype(np.float64) + buf[..., k // 2]) / 2.0


def gray_closing(img: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """Grayscale closing: dilation (max) then erosion (min)."""
    return footprint_filter(footprint_filter(img, footprint, np.max), footprint, np.min)


def white_tophat(img: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """img − opening(img); opening = erosion (min) then dilation (max)."""
    opened = footprint_filter(footprint_filter(img, footprint, np.min), footprint, np.max)
    return img - opened


# ---------------------------------------------------------------------------
# thresholds
# ---------------------------------------------------------------------------


def threshold_otsu(img: np.ndarray, nbins: int = 256) -> float:
    """Otsu's between-class-variance-maximizing threshold."""
    flat = img.ravel()
    lo, hi = float(flat.min()), float(flat.max())
    if lo == hi:
        # constant image: histogram bin centers would fall outside the
        # (degenerate) data range (found by hypothesis)
        return lo
    hist, edges = np.histogram(flat, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    hist = hist.astype(np.float64)
    w0 = np.cumsum(hist)
    w1 = w0[-1] - w0
    m = np.cumsum(hist * centers)
    mu0 = np.divide(m, w0, out=np.zeros_like(m), where=w0 > 0)
    mu1 = np.divide(m[-1] - m, w1, out=np.zeros_like(m), where=w1 > 0)
    var_between = w0 * w1 * (mu0 - mu1) ** 2
    return float(centers[int(np.argmax(var_between))])


def threshold_li(img: np.ndarray, tol: float | None = None, max_iter: int = 64) -> float:
    """Li & Lee minimum-cross-entropy threshold (iterative fixed point)."""
    im = img.astype(np.float64)
    imin, imax = float(im.min()), float(im.max())
    if imax == imin:
        return imin
    im = (im - imin) / (imax - imin)  # stabilize the log terms
    t = float(im.mean())
    tol = tol or 0.5 / (2**16)
    for _ in range(max_iter):
        fg = im[im > t]
        bg = im[im <= t]
        if fg.size == 0 or bg.size == 0:
            break
        mf = fg.mean()
        mb = bg.mean()
        mb = max(mb, 1e-12)
        mf = max(mf, 1e-12)
        t_next = (mf - mb) / (np.log(mf) - np.log(mb)) if mf != mb else t
        if abs(t_next - t) < tol:
            t = t_next
            break
        t = t_next
    return float(t * (imax - imin) + imin)


# ---------------------------------------------------------------------------
# connected components & morphology
# ---------------------------------------------------------------------------


def label(mask: np.ndarray, connectivity: int = 1) -> tuple[np.ndarray, int]:
    """Connected-component labeling: run-based two-pass union-find.

    Pass 1 (vectorized): number the horizontal foreground runs in
    raster order. Pass 2: union runs that touch between adjacent rows
    (directly for 4-connectivity, ±1 column for 8), then resolve the
    run graph with a tiny union-find — the loop is over RUNS (tens),
    not pixels (thousands), unlike the previous min-propagation sweep
    whose iteration count grew with component diameter. Densified ids
    follow first-occurrence raster order (a component's root is its
    smallest run id, and run ids increase in raster order).
    Returns (labels, n). connectivity 1 = 4-neighbour, 2 = 8-neighbour.
    """
    h, w = mask.shape
    if not mask.any():
        return np.zeros((h, w), dtype=np.int32), 0
    # run starts: foreground with background (or row edge) to the left
    starts = mask.copy()
    starts[:, 1:] &= ~mask[:, :-1]
    run_ids = np.cumsum(starts.ravel()).reshape(h, w)
    run_ids = np.where(mask, run_ids, 0).astype(np.int64)
    n_runs = int(run_ids.max())

    # vertical adjacency pairs (run_above, run_below)
    pair_sets = [(mask[:-1, :] & mask[1:, :], run_ids[:-1, :], run_ids[1:, :])]
    if connectivity == 2:
        pair_sets.append(
            (mask[:-1, :-1] & mask[1:, 1:], run_ids[:-1, :-1], run_ids[1:, 1:])
        )
        pair_sets.append(
            (mask[:-1, 1:] & mask[1:, :-1], run_ids[:-1, 1:], run_ids[1:, :-1])
        )
    # dedup touching-run pairs in numpy (one int64 key per pair) — the
    # former Python set built a tuple per touching PIXEL pair; unique
    # edges are what the union-find actually needs. Union-by-min makes
    # the final root the component's MIN run id whatever the edge
    # order, so the labeling is unchanged by the dedup or ordering.
    keys_parts = [
        above[touch] * np.int64(n_runs + 1) + below[touch]
        for touch, above, below in pair_sets
        if touch.any()
    ]
    parent = np.arange(n_runs + 1, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if keys_parts:
        allk = np.concatenate(keys_parts)
        if n_runs <= 2048:
            # boolean-scatter dedup: same sorted unique keys as
            # np.unique without its sort machinery (max key is
            # (n_runs+1)^2, a few MB of bools at the cap; event crops
            # have tens of runs). flatnonzero output is sorted.
            seen = np.zeros((n_runs + 1) * (n_runs + 1), dtype=bool)
            seen[allk] = True
            keys = np.flatnonzero(seen)
        else:
            keys = np.unique(allk)
        for a, b in zip(
            (keys // (n_runs + 1)).tolist(), (keys % (n_runs + 1)).tolist()
        ):
            ra, rb = find(a), find(b)
            if ra != rb:
                # keep the smaller id as root → root = min run id in comp
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        # resolve every run to its root: pointer-jump the whole parent
        # array to fixpoint (2-3 vector passes after path-halving)
        # instead of n_runs Python find() calls — same fully-resolved
        # roots either way
        while True:
            newp = parent[parent]
            if np.array_equal(newp, parent):
                break
            parent = newp

    roots = parent[1:]
    # sorted unique min-run-ids (raster order) via one boolean scatter —
    # equals np.unique(roots)
    seen_r = np.zeros(n_runs + 1, dtype=bool)
    seen_r[roots] = True
    uniq = np.flatnonzero(seen_r)
    remap = np.zeros(n_runs + 1, dtype=np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    run_label = np.concatenate(([0], remap[roots]))
    out = run_label[run_ids].astype(np.int32)
    return out, len(uniq)


def _dilate(mask: np.ndarray, iterations: int = 1, connectivity: int = 1) -> np.ndarray:
    m = mask.copy()
    for _ in range(iterations):
        grown = m.copy()
        grown[1:, :] |= m[:-1, :]
        grown[:-1, :] |= m[1:, :]
        grown[:, 1:] |= m[:, :-1]
        grown[:, :-1] |= m[:, 1:]
        if connectivity == 2:
            grown[1:, 1:] |= m[:-1, :-1]
            grown[1:, :-1] |= m[:-1, 1:]
            grown[:-1, 1:] |= m[1:, :-1]
            grown[:-1, :-1] |= m[1:, 1:]
        m = grown
    return m


def _erode(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    m = mask.copy()
    for _ in range(iterations):
        shrunk = m.copy()
        shrunk[1:, :] &= m[:-1, :]
        shrunk[:-1, :] &= m[1:, :]
        shrunk[:, 1:] &= m[:, :-1]
        shrunk[:, :-1] &= m[:, 1:]
        # border pixels erode (out-of-image = background)
        shrunk[0, :] = False
        shrunk[-1, :] = False
        shrunk[:, 0] = False
        shrunk[:, -1] = False
        m = shrunk
    return m


_DISK_CACHE: dict[int, np.ndarray] = {}


def disk(radius: int) -> np.ndarray:
    """Disk footprint, cached per radius (callers treat footprints as
    read-only; the cached array is marked non-writeable to enforce
    it). Hot: the mask chain asks for disk(5)/disk(6) per channel."""
    d = _DISK_CACHE.get(radius)
    if d is None:
        y, x = np.ogrid[-radius : radius + 1, -radius : radius + 1]
        d = (x * x + y * y) <= radius * radius
        d.setflags(write=False)
        _DISK_CACHE[radius] = d
    return d


def erode_footprint(mask: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """Binary erosion by an arbitrary footprint (out-of-image =
    background).

    Fast path (any footprint whose rows are contiguous runs — every
    disk): a pixel survives iff the footprint-count of True over the
    False-padded mask equals the footprint size; each row's window sum
    is a cumsum difference, so the whole erosion is ~2 vectorized ops
    per footprint ROW instead of 3 per footprint PIXEL (disk(6): 13
    rows vs 113 offsets). Integer counting over booleans — results are
    exactly the shifted-AND formulation's."""
    h, w = mask.shape
    fy, fx = footprint.shape
    cy, cx = fy // 2, fx // 2
    if fy > 2 * h or fx > 2 * w:
        # conservatively large footprint: fall back to the offset loop
        # (it handles the nothing-survives case exactly)
        return _erode_footprint_offsets(mask, footprint)
    rows = []
    contiguous = True
    for oy in range(fy):
        (xs,) = np.nonzero(footprint[oy])
        if xs.size == 0:
            continue
        if xs[-1] - xs[0] + 1 != xs.size:
            contiguous = False
            break
        rows.append((oy, int(xs[0]), int(xs[-1])))
    if not contiguous:
        return _erode_footprint_offsets(mask, footprint)
    p = np.zeros((h + fy - 1, w + fx), dtype=np.int32)
    # horizontal prefix sums of the padded mask, one leading zero column
    np.cumsum(mask, axis=1, out=p[cy : cy + h, cx + 1 : cx + w + 1])
    p[cy : cy + h, cx + w + 1 :] = p[cy : cy + h, cx + w : cx + w + 1]
    total = np.zeros((h, w), dtype=np.int32)
    nnz = 0
    for oy, x0, x1 in rows:
        nnz += x1 - x0 + 1
        band = p[oy : oy + h]
        total += band[:, x1 + 1 : x1 + w + 1] - band[:, x0:x0 + w]
    return total == nnz


def erode_footprint_batch(masks: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """:func:`erode_footprint` over an (N, H, W) bool stack — the same
    cumsum-window counting with a leading batch axis (identical
    integer arithmetic per slice; property-pinned). Non-contiguous
    footprints fall back to the per-mask offset loop."""
    n, h, w = masks.shape
    fy, fx = footprint.shape
    cy, cx = fy // 2, fx // 2
    if fy > 2 * h or fx > 2 * w:
        return np.stack([_erode_footprint_offsets(m, footprint) for m in masks])
    rows = []
    for oy in range(fy):
        (xs,) = np.nonzero(footprint[oy])
        if xs.size == 0:
            continue
        if xs[-1] - xs[0] + 1 != xs.size:
            return np.stack([_erode_footprint_offsets(m, footprint) for m in masks])
        rows.append((oy, int(xs[0]), int(xs[-1])))
    p = np.zeros((n, h + fy - 1, w + fx), dtype=np.int32)
    np.cumsum(masks, axis=2, out=p[:, cy : cy + h, cx + 1 : cx + w + 1])
    p[:, cy : cy + h, cx + w + 1 :] = p[:, cy : cy + h, cx + w : cx + w + 1]
    total = np.zeros((n, h, w), dtype=np.int32)
    nnz = 0
    for oy, x0, x1 in rows:
        nnz += x1 - x0 + 1
        band = p[:, oy : oy + h]
        total += band[:, :, x1 + 1 : x1 + w + 1] - band[:, :, x0 : x0 + w]
    return total == nnz


def _erode_footprint_offsets(mask: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    h, w = mask.shape
    fy, fx = footprint.shape
    cy, cx = fy // 2, fx // 2
    out = np.ones_like(mask)
    for oy, ox in zip(*np.nonzero(footprint)):
        dy, dx = oy - cy, ox - cx
        if abs(dy) >= h or abs(dx) >= w:
            # footprint larger than the image: nothing survives erosion
            return np.zeros_like(mask)
        shifted = np.zeros_like(mask)
        src_y = slice(max(0, dy), h + min(0, dy))
        dst_y = slice(max(0, -dy), h - max(0, dy))
        src_x = slice(max(0, dx), w + min(0, dx))
        dst_x = slice(max(0, -dx), w - max(0, dx))
        shifted[dst_y, dst_x] = mask[src_y, src_x]
        out &= shifted
    return out


def binary_closing(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return _erode(_dilate(mask, iterations), iterations)


def fill_holes(mask: np.ndarray) -> np.ndarray:
    """Fill holes: label the background (4-connectivity); any background
    component not touching the border is a hole."""
    bg = ~mask
    labels, n = label(bg, connectivity=1)
    if n == 0:
        return mask.copy()
    # open components = those touching the border; direct fancy-index
    # marking replaces the concatenate+unique round trip (same set)
    keep_open = np.zeros(n + 1, dtype=bool)
    keep_open[labels[0, :]] = True
    keep_open[labels[-1, :]] = True
    keep_open[labels[:, 0]] = True
    keep_open[labels[:, -1]] = True
    keep_open[0] = False
    return mask | (bg & ~keep_open[labels])


def remove_small_objects(mask: np.ndarray, min_size: int) -> np.ndarray:
    return remove_small_objects_n(mask, min_size)[0]


def remove_small_objects_n(mask: np.ndarray, min_size: int) -> tuple[np.ndarray, int]:
    """(filtered mask, number of surviving components). Dropping
    components can neither merge nor split the survivors, so the count
    of kept labels IS ``label(out, 2)[1]`` — callers that need both
    (the mask tails + region counts) skip a whole relabeling pass
    (equality pinned in tests/test_masking.py)."""
    labels, n = label(mask, connectivity=2)
    if n == 0:
        return mask.copy(), 0
    counts = np.bincount(labels.ravel())
    keep = np.zeros(n + 1, dtype=bool)
    keep[1:] = counts[1:] >= min_size
    return keep[labels], int(keep.sum())


def remove_small_holes(mask: np.ndarray, max_size: int) -> np.ndarray:
    inv = ~mask
    labels, n = label(inv, connectivity=1)
    if n == 0:
        return mask.copy()
    counts = np.bincount(labels.ravel())
    # one lookup-table pass instead of a full-image `labels == l0` scan
    # per hole: fill[l] = (small) & (not border-touching); label 0 is
    # the foreground in the inverted labeling, so fill[0] stays False
    # and `mask | fill[labels]` equals the per-label loop exactly
    fill = counts <= max_size
    fill[0] = False
    border = np.unique(
        np.concatenate([labels[0, :], labels[-1, :], labels[:, 0], labels[:, -1]])
    )
    fill[border] = False
    return mask | fill[labels]


def expand_labels(labels: np.ndarray, distance: int = 1) -> np.ndarray:
    """Grow each label into background by `distance` pixels (no
    overwriting of existing labels; ties resolved by lower label id)."""
    out = labels.copy()
    for _ in range(distance):
        cur = out.copy()
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            shifted = np.zeros_like(cur)
            src_y = slice(max(0, -dy), cur.shape[0] - max(0, dy))
            dst_y = slice(max(0, dy), cur.shape[0] - max(0, -dy))
            src_x = slice(max(0, -dx), cur.shape[1] - max(0, dx))
            dst_x = slice(max(0, dx), cur.shape[1] - max(0, -dx))
            shifted[dst_y, dst_x] = cur[src_y, src_x]
            write = (out == 0) & (shifted > 0)
            out[write] = shifted[write]
            overwrite = (out > 0) & (shifted > 0) & (shifted < out) & (labels == 0)
            out[overwrite] = shifted[overwrite]
    return out


# ---------------------------------------------------------------------------
# region properties
# ---------------------------------------------------------------------------


def watershed(
    elevation: np.ndarray,
    markers: np.ndarray,
    mask: np.ndarray | None = None,
    connectivity: int = 1,
    compactness: float = 0.0,
) -> np.ndarray:
    """Marker-based watershed by priority flood: marker labels grow
    outward in increasing elevation order, so each basin fills from
    its marker and basins meet along elevation ridges — the semantics
    of ``skimage.segmentation.watershed`` (without watershed lines).
    A heap of (priority, insertion-age, y, x) makes the flood order —
    and therefore the result — deterministic. ``mask`` limits the
    flood to foreground. ``compactness`` > 0 selects the compact
    watershed (Neubert & Protzel 2014): the flood priority becomes
    elevation + compactness × distance-from-the-seed-pixel the
    wavefront originated at, which regularizes basin shapes — the
    reference calls ``watershed(image[dim], markers, compactness=1)``
    (src/scip/masking/watershed.py:48). The heap loop is per-pixel
    Python, but the events this engine labels are small crops
    (64²-256²); the cost is the same order as one rank filter pass.
    """
    import heapq
    import math

    h, w = elevation.shape
    out = markers.astype(np.int32).copy()
    allowed = np.ones((h, w), dtype=bool) if mask is None else mask.astype(bool)
    out[~allowed] = 0
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    # Hot-loop representation (bit-identical flood): heap entries are
    # (prio, age, pixel*HW + seed) — the heap never compares past the
    # unique ``age``, so packing (y,x,sy,sx) into one int cannot change
    # pop order. Pixel state lives in flat Python lists (elevation as
    # float64 values via tolist — an EXACT widening for float32/64
    # inputs, the same float() the tuple loop performed) because numpy
    # scalar indexing costs ~100 ns/subscript and dominated the loop.
    hw = h * w
    elev = elevation.astype(np.float64).ravel().tolist()
    lab_l = out.ravel().tolist()
    ok_l = allowed.ravel().tolist()
    heap: list = []
    age = 0
    ys, xs = np.nonzero(out > 0)
    order = np.argsort(elevation[ys, xs], kind="stable")
    seeds = (ys.astype(np.int64) * w + xs)[order].tolist()
    for p in seeds:
        heapq.heappush(heap, (elev[p], age, p * hw + p))
        age += 1
    push = heapq.heappush
    pop = heapq.heappop
    sqrt = math.sqrt
    while heap:
        _, _, packed = pop(heap)
        p, seed = divmod(packed, hw)
        y, x = divmod(p, w)
        lab = lab_l[p]
        for dy, dx in shifts:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w:
                q = ny * w + nx
                if ok_l[q] and lab_l[q] == 0:
                    lab_l[q] = lab
                    prio = elev[q]
                    if compactness > 0:
                        sy, sx = divmod(seed, w)
                        prio += compactness * sqrt(
                            (ny - sy) ** 2 + (nx - sx) ** 2
                        )
                    push(heap, (prio, age, q * hw + seed))
                    age += 1
    return np.asarray(lab_l, dtype=np.int32).reshape(h, w)


def distance_transform(mask: np.ndarray) -> np.ndarray:
    """Chamfer distance to the nearest background pixel (3-4 weights /
    3, ≤ ~6% off Euclidean): two raster sweeps over the padded image —
    pure numpy row-vectorized, no per-pixel Python. Delegates to the
    batch sweep with one element so the trickiest numeric code in this
    file exists exactly once."""
    return distance_transform_batch([mask])[0]


def distance_transform_batch(masks: list[np.ndarray]) -> list[np.ndarray]:
    """:func:`distance_transform` over MANY masks at once: same-shape
    masks stack into one (N, H, W) tensor and the row sweeps run
    batched along the leading axis, so the ~8 numpy dispatches per row
    amortize over the whole group (frames in an Arrow batch share one
    shape). Per-row arithmetic is elementwise in the batch dimension
    and the in-row cummin runs per row either way, so every output is
    bit-identical to the single-mask sweep (pinned in
    tests/test_masking.py)."""
    out: list[np.ndarray] = [None] * len(masks)  # type: ignore[list-item]
    groups: dict[tuple[int, int], list[int]] = {}
    for i, m in enumerate(masks):
        groups.setdefault(m.shape, []).append(i)
    big = 1e9
    a, b = 1.0, 4.0 / 3.0  # orthogonal / diagonal steps (3-4 chamfer)
    for (h, w), idxs in groups.items():
        d = np.where(np.stack([masks[i] for i in idxs]), big, 0.0)
        # out-of-image is NOT background (scipy edt semantics): pad high
        pad = np.pad(d, ((0, 0), (1, 1), (1, 1)), constant_values=big)
        ramp = a * np.arange(w + 2)
        rramp = ramp[::-1]

        def relax_lr(rows: np.ndarray) -> np.ndarray:
            # min_j(row[j] + a*(x-j)) for j<=x == a*x + cummin(row - a*j)
            left = np.minimum.accumulate(rows - ramp, axis=1) + ramp
            right = (
                np.minimum.accumulate((rows - rramp)[:, ::-1], axis=1) + ramp
            )[:, ::-1]
            return np.minimum(left, right)

        for y in range(1, h + 1):
            np.minimum(pad[:, y, 1:-1], pad[:, y - 1, 1:-1] + a, out=pad[:, y, 1:-1])
            np.minimum(pad[:, y, 1:-1], pad[:, y - 1, :-2] + b, out=pad[:, y, 1:-1])
            np.minimum(pad[:, y, 1:-1], pad[:, y - 1, 2:] + b, out=pad[:, y, 1:-1])
            pad[:, y] = relax_lr(pad[:, y])
        for y in range(h, 0, -1):
            np.minimum(pad[:, y, 1:-1], pad[:, y + 1, 1:-1] + a, out=pad[:, y, 1:-1])
            np.minimum(pad[:, y, 1:-1], pad[:, y + 1, :-2] + b, out=pad[:, y, 1:-1])
            np.minimum(pad[:, y, 1:-1], pad[:, y + 1, 2:] + b, out=pad[:, y, 1:-1])
            pad[:, y] = relax_lr(pad[:, y])
        for j, i in enumerate(idxs):
            # own the data: a view would pin the whole (N, H+2, W+2)
            # group pad alive for as long as ANY single result is held
            out[i] = pad[j, 1:-1, 1:-1].copy()
    return out


def local_maxima_markers(
    img: np.ndarray, min_distance: int = 3, threshold: float = 0.0
) -> tuple[np.ndarray, int]:
    """Labeled peak markers: pixels equal to the footprint max of their
    (2·min_distance+1)² neighbourhood and above ``threshold``;
    adjacent/plateau peaks merge into one marker via labeling — the
    reference's peak_local_max → markers step
    (src/scip/segmentation/watershed_dapi.py:29-62)."""
    size = 2 * min_distance + 1
    fp = np.ones((size, size), dtype=bool)
    neighborhood_max = footprint_filter(img, fp, np.max)
    peaks = (img >= neighborhood_max) & (img > threshold)
    return label(peaks, connectivity=2)


def bounding_box(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    """(minr, minc, maxr, maxc) half-open, or None for empty mask."""
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return None
    return int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1


# -- full regionprops set (reference src/scip/features/shape.py:24-104) ------

# Sanitized names for the reference's 59 regionprops columns
# (shape.py:24-84 prop_names; '-' → '_' for Spark column identifiers).
SHAPE_PROP_NAMES = (
    [
        "area",
        "convex_area",
        "eccentricity",
        "equivalent_diameter",
        "euler_number",
        "feret_diameter_max",
        "filled_area",
        "major_axis_length",
        "minor_axis_length",
        "orientation",
        "perimeter",
        "perimeter_crofton",
        "solidity",
        "extent",
    ]
    + [f"inertia_tensor_{p}_{q}" for p in range(2) for q in range(2)]
    + [f"inertia_tensor_eigvals_{k}" for k in range(2)]
    + [f"moments_{p}_{q}" for p in range(4) for q in range(4)]
    + [f"moments_central_{p}_{q}" for p in range(4) for q in range(4)]
    + [f"moments_hu_{k}" for k in range(7)]
)

# Reference shape.py:149-211 — when a channel mask is empty, the first 11
# props (area … perimeter) default to 0 and the rest to null.
SHAPE_EMPTY_DEFAULTS = [0.0] * 11 + [None] * (len(SHAPE_PROP_NAMES) - 11)


def _zpad1(a: np.ndarray) -> np.ndarray:
    """Zero-pad by 1 on each side — ``np.pad(a, 1)`` without the
    generic pad machinery (~70 µs/call of arg normalization, profiled
    at 3 calls per region in the shape-feature path; this is ~3 µs)."""
    h, w = a.shape
    out = np.zeros((h + 2, w + 2), dtype=a.dtype)
    out[1:-1, 1:-1] = a
    return out


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull vertices (Andrew's monotone chain), CCW order.

    ``points`` is (N, 2) float on the HALF-INTEGER grid (every caller
    feeds :func:`_hull_cloud` output). Returns (M, 2) hull vertices.

    Dedup+sort runs on one int64 key per point (doubled coordinates,
    offset +1 so the -0.5 rim stays non-negative): np.unique on a flat
    int vector is ~6× the structured-void-dtype ``axis=0`` unique, the
    key order equals (y, x) lexicographic order because the row stride
    exceeds any column key, and the decode divides by 2 — exact in
    binary — so the point set is bit-identical to the axis-0 path."""
    y2 = (points[:, 0] * 2).astype(np.int64) + 1
    x2 = (points[:, 1] * 2).astype(np.int64) + 1
    stride = np.int64(1) << 32
    keys = np.unique(y2 * stride + x2)
    if len(keys) > 4:
        # hull vertices can only be per-row x-extremes: any other point
        # lies ON the segment between its row's min-x and max-x points,
        # and the chain's cross<=0 pop already excludes collinear points
        # from the output — so dropping them first leaves the vertex
        # sequence bit-identical while the O(n) Python chain loop sees
        # ~2·rows points instead of every border midpoint
        rows_changed = np.empty(len(keys), dtype=bool)
        rows_changed[0] = True
        row = keys >> 32  # == y2: x2 < 2^32 and keys are non-negative
        np.not_equal(row[1:], row[:-1], out=rows_changed[1:])
        keep = rows_changed.copy()
        keep[:-1] |= rows_changed[1:]  # last-in-row = pred of next first
        keep[-1] = True
        keys = keys[keep]
    pts = np.stack(
        [(keys // stride - 1) / 2.0, (keys % stride - 1) / 2.0], axis=1
    )
    if len(pts) <= 2:
        return pts

    # plain-float tuples: numpy scalar indexing inside the chain loop
    # costs ~100 ns per subscript and dominated the whole shape-feature
    # family before this (profiled: 8 ms/region → ~0.5 ms)
    tups = [tuple(p) for p in pts.tolist()]

    def half(seq):
        hull: list[tuple] = []
        for p in seq:
            py, px = p
            while len(hull) >= 2:
                oy, ox = hull[-2]
                ay, ax = hull[-1]
                cross = (ay - oy) * (px - ox) - (ax - ox) * (py - oy)
                if cross <= 0:
                    hull.pop()
                else:
                    break
            hull.append(p)
        return hull

    lower = half(tups)
    upper = half(tups[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def _hull_cloud(m: np.ndarray) -> np.ndarray:
    """Half-pixel-offset point cloud of the mask's BORDER pixels.

    Identical hull to the all-pixels cloud: an interior pixel (all four
    4-neighbours foreground) has each of its edge midpoints equal to
    the midpoint of a segment between two midpoints contributed by
    those foreground neighbours, hence never an extreme point."""
    p = _zpad1(m)
    interior = m & p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:]
    ys, xs = np.nonzero(m & ~interior)
    base = np.empty((len(ys), 2), dtype=np.float64)
    base[:, 0] = ys
    base[:, 1] = xs
    offs = np.array([[0.5, 0.0], [-0.5, 0.0], [0.0, 0.5], [0.0, -0.5]])
    return (base[:, None, :] + offs[None, :, :]).reshape(-1, 2)


def convex_mask(m: np.ndarray, hull: np.ndarray | None = None) -> np.ndarray:
    """Pixels whose centers lie inside the convex hull of the mask's
    half-pixel-offset point cloud (the published convex_hull_image
    approach: each foreground pixel contributes its 4 edge midpoints so
    single-pixel-wide shapes still hull correctly)."""
    if not m.any():
        return np.zeros_like(m)
    if hull is None:
        hull = _convex_hull(_hull_cloud(m))
    if len(hull) <= 2:
        return m.copy()
    h, w = m.shape
    gy, gx = _pixel_grid(h, w)  # read-only, cached per crop shape
    inside = np.ones((h, w), dtype=bool)
    nh = len(hull)
    ctr_y, ctr_x = hull[:, 0].mean(), hull[:, 1].mean()
    for i in range(nh):
        oy, ox = hull[i]
        ay, ax = hull[(i + 1) % nh]
        # orientation-agnostic half-plane test: the hull centroid fixes
        # the interior side of each edge
        cross = (ax - ox) * (gy - oy) - (ay - oy) * (gx - ox)
        ref = (ax - ox) * (ctr_y - oy) - (ay - oy) * (ctr_x - ox)
        if ref < 0:
            inside &= cross <= 1e-9
        else:
            inside &= cross >= -1e-9
    return inside


_PIXEL_GRID_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _pixel_grid(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached ``np.mgrid[0:h, 0:w]`` (the feature path asks for the
    same crop shapes over and over; the allocation costs more than the
    half-plane tests it feeds). Marked non-writeable — callers only
    read it."""
    g = _PIXEL_GRID_CACHE.get((h, w))
    if g is None:
        gy, gx = np.mgrid[0:h, 0:w]
        gy.setflags(write=False)
        gx.setflags(write=False)
        if len(_PIXEL_GRID_CACHE) > 64:  # bound worker memory
            _PIXEL_GRID_CACHE.clear()
        g = (gy, gx)
        _PIXEL_GRID_CACHE[(h, w)] = g
    return g


def _feret_diameter_max(m: np.ndarray, hull: np.ndarray | None = None) -> float:
    """Max pairwise distance over convex-hull vertices of the
    half-offset point cloud (rotating-calipers upper bound is
    unnecessary: hulls here have tens of vertices)."""
    if hull is None:
        hull = _convex_hull(_hull_cloud(m))
    d = hull[:, None, :] - hull[None, :, :]
    return float(np.sqrt((d**2).sum(-1)).max())


def _perimeter_weighted(m: np.ndarray) -> float:
    """Perimeter by the published weighted-border-configuration method
    (border pixel categories weighted 1 / √2 / (1+√2)/2)."""
    er = _erode(m, 1)
    # _erode treats out-of-image as background; the published operator
    # uses border_value=0 too, so this matches.
    border = m & ~er
    bi = border.astype(np.int64)
    p = _zpad1(bi)
    conv = (
        10 * (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:])
        + 2 * (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])
        + 1 * p[1:-1, 1:-1]
    )
    hist = np.bincount(conv[border].ravel(), minlength=50)
    weights = np.zeros(50)
    weights[[5, 7, 15, 17, 25, 27]] = 1.0
    weights[[21, 33]] = np.sqrt(2.0)
    weights[[13, 23]] = (1.0 + np.sqrt(2.0)) / 2.0
    return float(hist @ weights)


def _perimeter_crofton(m: np.ndarray) -> float:
    """Crofton-formula perimeter, 4 directions: histogram the 2×2
    binary configurations of the padded mask, weight by the published
    Crofton coefficients."""
    p = _zpad1(m.astype(np.int64))
    # configuration code of each 2x2 neighbourhood:
    # 1*m[y,x] + 4*m[y,x-1] + 2*m[y-1,x] + 8*m[y-1,x-1]
    cfg = p[1:, 1:] + 4 * p[1:, :-1] + 2 * p[:-1, 1:] + 8 * p[:-1, :-1]
    h = np.bincount(cfg.ravel(), minlength=16)
    sq2 = np.sqrt(2.0)
    coefs = np.array(
        [
            0.0,
            np.pi / 4 * (1 + 1 / sq2),
            np.pi / (4 * sq2),
            np.pi / (2 * sq2),
            0.0,
            np.pi / 4 * (1 + 1 / sq2),
            0.0,
            np.pi / (4 * sq2),
            np.pi / 4,
            np.pi / 2,
            np.pi / (4 * sq2),
            np.pi / (4 * sq2),
            np.pi / 4,
            np.pi / 2,
            0.0,
            0.0,
        ]
    )
    return float(coefs @ h[:16])


def _euler_number(
    m: np.ndarray,
    filled: np.ndarray | None = None,
    n_objects: int | None = None,
) -> float:
    """Objects minus holes (8-connected foreground / 4-connected
    background). For a single component: 1 − number of holes.
    ``filled``/``n_objects`` let a caller that already computed
    fill_holes / knows the component count skip those re-labelings."""
    if filled is None:
        filled = fill_holes(m)
    holes = filled & ~m
    _, n_holes = label(holes, connectivity=1)
    if n_objects is None:
        _, n_objects = label(m, connectivity=2)
    return float(n_objects - n_holes)


def regionprops_full(
    labels: np.ndarray, assume_connected: bool = False
) -> list[dict]:
    """Dict view of :func:`regionprops_full_rows` (name → value per
    region) — the hot feature path uses the rows form directly."""
    return [
        dict(zip(SHAPE_PROP_NAMES, row))
        for row in regionprops_full_rows(labels, assume_connected)
    ]


def regionprops_full_rows(
    labels: np.ndarray, assume_connected: bool = False
) -> list[list[float]]:
    """The reference's 59-prop regionprops set per connected component
    (reference src/scip/features/shape.py:24-104), reimplemented on
    numpy from the published property definitions (raw/central/Hu
    moments, inertia tensor, Crofton perimeter, convex hull, Feret
    diameter). Props are computed on the component's bbox crop with
    bbox-relative coordinates, matching the published convention.

    ``assume_connected=True`` asserts every label id marks ONE
    8-connected component (true whenever ``labels`` came from
    ``label(mask, 2)``, as in the feature path) — the euler number
    then skips its per-region connectivity re-label, using
    n_objects=1 (exactly what the re-label would return).

    Returns one value row per region, ordered as SHAPE_PROP_NAMES —
    the list form skips a per-region dict build + 59 float() casts
    (the caller means over a float64 matrix anyway)."""
    out: list[list[float]] = []
    n = int(labels.max())
    for l0 in range(1, n + 1):
        full = labels == l0
        ys, xs = np.nonzero(full)
        if ys.size == 0:
            continue
        minr, minc = int(ys.min()), int(xs.min())
        maxr, maxc = int(ys.max()) + 1, int(xs.max()) + 1
        m = full[minr:maxr, minc:maxc]
        area = float(m.sum())
        r = (ys - minr).astype(np.float64)
        c = (xs - minc).astype(np.float64)

        # raw spatial moments m[p,q] = Σ r^p c^q  (bbox-local coords).
        # _pows writes the power rows into one preallocated buffer —
        # same values as the previous stack([ones, v, v**2, v**3]) but
        # without 4 temporaries + the stack copy per axis (profiled:
        # np.stack was ~7% of regionprops_full on small crops).
        def _pows(v: np.ndarray) -> np.ndarray:
            out = np.empty((4, v.size))
            out[0] = 1.0
            out[1] = v
            np.multiply(v, v, out=out[2])  # v**2 IS square (bit-equal)
            # v**3 must stay libm pow — (v*v)*v differs in the last ulp
            # on ~a third of inputs (measured), and bit-identity rules
            np.power(v, 3, out=out[3])
            return out

        M = _pows(r) @ _pows(c).T  # (4, 4): M[p, q]
        cr, cc = M[1, 0] / M[0, 0], M[0, 1] / M[0, 0]
        MU = _pows(r - cr) @ _pows(c - cc).T  # central moments

        # normalized central moments → Hu invariants
        mu00 = MU[0, 0]
        eta = np.zeros((4, 4))
        for p in range(4):
            for q in range(4):
                if p + q >= 2:
                    eta[p, q] = MU[p, q] / mu00 ** (1 + (p + q) / 2.0)
        e20, e02, e11 = eta[2, 0], eta[0, 2], eta[1, 1]
        e30, e03, e21, e12 = eta[3, 0], eta[0, 3], eta[2, 1], eta[1, 2]
        hu = [
            e20 + e02,
            (e20 - e02) ** 2 + 4 * e11**2,
            (e30 - 3 * e12) ** 2 + (3 * e21 - e03) ** 2,
            (e30 + e12) ** 2 + (e21 + e03) ** 2,
            (e30 - 3 * e12) * (e30 + e12)
            * ((e30 + e12) ** 2 - 3 * (e21 + e03) ** 2)
            + (3 * e21 - e03) * (e21 + e03)
            * (3 * (e30 + e12) ** 2 - (e21 + e03) ** 2),
            (e20 - e02) * ((e30 + e12) ** 2 - (e21 + e03) ** 2)
            + 4 * e11 * (e30 + e12) * (e21 + e03),
            (3 * e21 - e03) * (e30 + e12)
            * ((e30 + e12) ** 2 - 3 * (e21 + e03) ** 2)
            - (e30 - 3 * e12) * (e21 + e03)
            * (3 * (e30 + e12) ** 2 - (e21 + e03) ** 2),
        ]

        # inertia tensor (normalized central moments of order 2)
        mu20n, mu02n, mu11n = MU[2, 0] / mu00, MU[0, 2] / mu00, MU[1, 1] / mu00
        it = np.array([[mu20n, -mu11n], [-mu11n, mu02n]])
        tr, det = mu20n + mu02n, mu20n * mu02n - mu11n**2
        disc = max(tr * tr / 4 - det, 0.0)
        l1 = tr / 2 + np.sqrt(disc)
        l2 = max(tr / 2 - np.sqrt(disc), 0.0)
        major = 4.0 * np.sqrt(max(l1, 0.0))
        minor = 4.0 * np.sqrt(l2)
        ecc = float(np.sqrt(1 - l2 / l1)) if l1 > 0 else 0.0
        # angle between row axis and major axis, (-π/2, π/2]
        orientation = (
            0.5 * float(np.arctan2(-2.0 * mu11n, mu20n - mu02n))
            if (mu11n != 0 or mu20n != mu02n)
            else 0.0
        )

        hull = _convex_hull(_hull_cloud(m))  # shared: convex_mask + feret
        hull_mask = convex_mask(m, hull=hull)
        convex_area = float(hull_mask.sum())
        filled = fill_holes(m)
        filled_area = float(filled.sum())
        bbox_area = float((maxr - minr) * (maxc - minc))

        vals = (
            [
                area,
                convex_area,
                ecc,
                float(np.sqrt(4.0 * area / np.pi)),
                _euler_number(
                    m, filled=filled, n_objects=1 if assume_connected else None
                ),
                _feret_diameter_max(m, hull=hull),
                filled_area,
                float(major),
                float(minor),
                orientation,
                _perimeter_weighted(m),
                _perimeter_crofton(m),
                area / convex_area if convex_area > 0 else 0.0,
                area / bbox_area,
            ]
            + [float(v) for v in it.ravel()]
            + [float(l1), float(l2)]
            + [float(v) for v in M.ravel()]
            + [float(v) for v in MU.ravel()]
            + [float(v) for v in hu]
        )
        out.append(vals)
    return out


def regionprops_basic(labels: np.ndarray) -> list[dict]:
    """Minimal per-component properties: area, centroid, bbox, extent,
    eccentricity-proxy (major/minor axis from central moments),
    perimeter estimate."""
    props = []
    n = int(labels.max())
    for l0 in range(1, n + 1):
        m = labels == l0
        area = int(m.sum())
        if area == 0:
            continue
        ys, xs = np.nonzero(m)
        cy, cx = float(ys.mean()), float(xs.mean())
        minr, minc, maxr, maxc = int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1
        mu20 = float(((ys - cy) ** 2).mean())
        mu02 = float(((xs - cx) ** 2).mean())
        mu11 = float(((ys - cy) * (xs - cx)).mean())
        tr = mu20 + mu02
        det = mu20 * mu02 - mu11**2
        disc = max(tr * tr / 4 - det, 0.0)
        l1 = tr / 2 + np.sqrt(disc)
        l2 = tr / 2 - np.sqrt(disc)
        major = 4.0 * np.sqrt(max(l1, 0.0))
        minor = 4.0 * np.sqrt(max(l2, 0.0))
        ecc = np.sqrt(1 - (l2 / l1)) if l1 > 0 else 0.0
        # perimeter: count of exposed 4-neighbour edges
        per = int(
            (m & ~np.pad(m, ((1, 0), (0, 0)))[:-1, :]).sum()
            + (m & ~np.pad(m, ((0, 1), (0, 0)))[1:, :]).sum()
            + (m & ~np.pad(m, ((0, 0), (1, 0)))[:, :-1]).sum()
            + (m & ~np.pad(m, ((0, 0), (0, 1)))[:, 1:]).sum()
        )
        props.append(
            {
                "label": l0,
                "area": float(area),
                "centroid_r": cy,
                "centroid_c": cx,
                "bbox_minr": float(minr),
                "bbox_minc": float(minc),
                "bbox_maxr": float(maxr),
                "bbox_maxc": float(maxc),
                "extent": float(area) / ((maxr - minr) * (maxc - minc)),
                "major_axis_length": float(major),
                "minor_axis_length": float(minor),
                "eccentricity": float(ecc),
                "perimeter": float(per),
            }
        )
    return props
