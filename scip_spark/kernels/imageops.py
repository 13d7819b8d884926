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


def gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(round(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _conv1d_reflect(img: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    r = len(k) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    p = np.pad(img, pad, mode="reflect")
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
    a = np.pad(img.astype(np.float64), 1, mode="reflect")
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
    p = np.pad(img, r, mode="reflect")
    stack = [
        p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
        for dy in range(size)
        for dx in range(size)
    ]
    return np.median(np.stack(stack), axis=0)


def footprint_filter(img: np.ndarray, footprint: np.ndarray, func) -> np.ndarray:
    """Grayscale rank/order filter over an arbitrary footprint: stack
    the shifted views for every footprint offset (reflect padding) and
    reduce with ``func`` (np.median / np.min / np.max) along axis 0."""
    fy, fx = footprint.shape
    cy, cx = fy // 2, fx // 2
    p = np.pad(img, ((cy, fy - 1 - cy), (cx, fx - 1 - cx)), mode="reflect")
    h, w = img.shape
    stack = [
        p[oy : oy + h, ox : ox + w] for oy, ox in zip(*np.nonzero(footprint))
    ]
    return func(np.stack(stack), axis=0)


def median_disk(img: np.ndarray, radius: int) -> np.ndarray:
    return footprint_filter(img, disk(radius), np.median)


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
    """Connected-component labeling by vectorized min-index propagation.

    Each foreground pixel starts at its own flat index; iterated
    min-with-neighbours sweeps (numpy whole-array ops, no Python pixel
    loops) converge to the component's minimum index. Densified label
    ids follow first-occurrence raster order, matching the classic
    two-pass algorithm. connectivity 1 = 4-neighbour, 2 = 8-neighbour.
    Returns (labels, n).
    """
    h, w = mask.shape
    if not mask.any():
        return np.zeros((h, w), dtype=np.int32), 0
    idx = np.where(mask, np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w), 0)
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    while True:
        nxt = idx.copy()
        for dy, dx in shifts:
            shifted = np.zeros_like(idx)
            src_y = slice(max(0, -dy), h - max(0, dy))
            dst_y = slice(max(0, dy), h - max(0, -dy))
            src_x = slice(max(0, -dx), w - max(0, dx))
            dst_x = slice(max(0, dx), w - max(0, -dx))
            shifted[dst_y, dst_x] = idx[src_y, src_x]
            np.minimum(
                nxt,
                np.where((shifted > 0) & mask, shifted, np.iinfo(np.int64).max),
                out=nxt,
                where=mask,
            )
        if (nxt == idx).all():
            break
        idx = nxt
    roots = idx[mask]
    uniq = np.unique(roots)  # sorted = first-occurrence raster order
    remap = np.zeros(int(uniq.max()) + 1, dtype=np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    out = np.zeros((h, w), dtype=np.int32)
    out[mask] = remap[roots]
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


def disk(radius: int) -> np.ndarray:
    y, x = np.ogrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y) <= radius * radius


def erode_footprint(mask: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """Binary erosion by an arbitrary footprint: AND of the mask
    shifted by every footprint offset (out-of-image = background)."""
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
    border = np.unique(
        np.concatenate([labels[0, :], labels[-1, :], labels[:, 0], labels[:, -1]])
    )
    keep_open = np.zeros(n + 1, dtype=bool)
    keep_open[border[border > 0]] = True
    return mask | (bg & ~keep_open[labels])


def remove_small_objects(mask: np.ndarray, min_size: int) -> np.ndarray:
    labels, n = label(mask, connectivity=2)
    if n == 0:
        return mask.copy()
    counts = np.bincount(labels.ravel())
    keep = np.zeros(n + 1, dtype=bool)
    keep[1:] = counts[1:] >= min_size
    return keep[labels]


def remove_small_holes(mask: np.ndarray, max_size: int) -> np.ndarray:
    inv = ~mask
    labels, n = label(inv, connectivity=1)
    if n == 0:
        return mask.copy()
    h, w = mask.shape
    counts = np.bincount(labels.ravel())
    border_labels = set(np.unique(np.concatenate([
        labels[0, :], labels[-1, :], labels[:, 0], labels[:, -1]
    ])))
    out = mask.copy()
    for l0 in range(1, n + 1):
        if l0 not in border_labels and counts[l0] <= max_size:
            out[labels == l0] = True
    return out


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


def bounding_box(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    """(minr, minc, maxr, maxc) half-open, or None for empty mask."""
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return None
    return int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1


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
