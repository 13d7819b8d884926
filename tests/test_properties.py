"""Property-based invariants (hypothesis) for the numpy kernels and
the tensor codec — a verification layer the reference's suite lacks
(SURVEY §5: no property-based testing upstream)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from scip_spark.kernels import imageops as K
from scip_spark.schema import decode_tensor, encode_tensor

small_masks = arrays(
    dtype=bool,
    shape=st.tuples(st.integers(2, 12), st.integers(2, 12)),
)

small_shapes = st.lists(st.integers(1, 6), min_size=1, max_size=4)


@settings(max_examples=50, deadline=None)
@given(small_shapes)
def test_codec_roundtrip_any_shape(shape):
    a = np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape)
    flat, s = encode_tensor(a)
    np.testing.assert_array_equal(decode_tensor(flat, s), a)


@settings(max_examples=60, deadline=None)
@given(small_masks)
def test_label_partitions_foreground(mask):
    labels, n = K.label(mask, connectivity=1)
    # background stays 0; foreground fully labeled with 1..n
    assert (labels[~mask] == 0).all()
    assert ((labels > 0) == mask).all()
    found = set(np.unique(labels)) - {0}
    assert found == set(range(1, n + 1))


@settings(max_examples=60, deadline=None)
@given(small_masks)
def test_label_neighbors_share_component(mask):
    labels, _ = K.label(mask, connectivity=1)
    # any two 4-adjacent foreground pixels must carry the same label
    h, w = mask.shape
    same_r = mask[:, :-1] & mask[:, 1:]
    assert (labels[:, :-1][same_r] == labels[:, 1:][same_r]).all()
    same_c = mask[:-1, :] & mask[1:, :]
    assert (labels[:-1, :][same_c] == labels[1:, :][same_c]).all()


def _label_bfs(mask, connectivity):
    """Brute-force flood-fill oracle: labels in first-occurrence raster
    order — the exact contract of K.label."""
    h, w = mask.shape
    out = np.zeros((h, w), dtype=np.int32)
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    n = 0
    for y in range(h):
        for x in range(w):
            if mask[y, x] and out[y, x] == 0:
                n += 1
                stack = [(y, x)]
                out[y, x] = n
                while stack:
                    cy, cx = stack.pop()
                    for dy, dx in shifts:
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and out[ny, nx] == 0:
                            out[ny, nx] = n
                            stack.append((ny, nx))
    return out, n


@settings(max_examples=60, deadline=None)
@given(small_masks, st.sampled_from([1, 2]))
def test_label_equals_flood_fill_oracle(mask, connectivity):
    """Full equality against a flood fill: same components AND the same
    raster-order label ids — catches both under-merging (two labels in
    one component) and over-merging (one label across components),
    which the partition/adjacency invariants alone cannot."""
    got, n_got = K.label(mask, connectivity)
    want, n_want = _label_bfs(mask, connectivity)
    assert n_got == n_want
    np.testing.assert_array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(small_masks)
def test_distance_transform_properties(mask):
    """Chamfer DT: zero exactly on background, ≥1 on foreground, and
    1-Lipschitz across 4-neighbours (distance can't jump more than the
    step cost)."""
    d = K.distance_transform(mask)
    assert (d[~mask] == 0).all()
    if mask.any():
        assert (d[mask] >= 1.0 - 1e-9).all()
    assert (np.abs(np.diff(d, axis=0)) <= 4.0 / 3.0 + 1e-9).all()
    assert (np.abs(np.diff(d, axis=1)) <= 4.0 / 3.0 + 1e-9).all()


@settings(max_examples=30, deadline=None)
@given(small_masks)
def test_watershed_covers_mask_and_respects_markers(mask):
    """Flooding from per-component markers relabels exactly the
    reachable foreground, and marker pixels keep their labels."""
    if not mask.any():
        return
    markers, n = K.label(mask, 1)  # one marker per component
    elev = K.distance_transform(mask)
    ws = K.watershed(-elev, markers, mask=mask)
    np.testing.assert_array_equal(ws, markers)  # full-component markers → identity


@settings(max_examples=40, deadline=None)
@given(small_masks, st.integers(1, 6))
def test_remove_small_objects_threshold(mask, min_size):
    out = K.remove_small_objects(mask, min_size)
    # output is a subset of input, and every surviving component is big enough
    assert (out <= mask).all()
    labels, n = K.label(out, connectivity=2)
    if n:
        counts = np.bincount(labels.ravel())[1:]
        assert (counts >= min_size).all()


@settings(max_examples=40, deadline=None)
@given(small_masks)
def test_fill_holes_superset_and_border_preserving(mask):
    filled = K.fill_holes(mask)
    assert (filled >= mask).all()
    # border background can never be a hole
    border_bg = np.zeros_like(mask)
    border_bg[[0, -1], :] = True
    border_bg[:, [0, -1]] = True
    border_bg &= ~mask
    assert not (filled & border_bg).any()


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        dtype=np.float32,
        shape=st.tuples(st.integers(3, 10), st.integers(3, 10)),
        elements=st.floats(0, 100, width=32),
    )
)
def test_otsu_threshold_within_range(img):
    t = K.threshold_otsu(img)
    assert img.min() <= t <= img.max()


# ---- per-row text kernels (Spark-side, checked via one batched job) ----
# Spark round-trips are slow per example, so these properties generate
# MANY random docs with hypothesis-like structure in one DataFrame and
# verify every row against a plain-Python reference.


def test_run_stats_matches_python_reference(spark):
    """_run_stats(arr) must equal {max count of any element, total
    occurrences in elements appearing >1 time} for arbitrary token
    arrays, including empty and all-identical."""
    import random

    from collections import Counter

    import pandas as pd
    from pyspark.sql import functions as F

    from scip_spark.functions.quality_queries import _run_stats

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, [rng.choice(vocab) for _ in range(rng.randint(0, 40))]) for i in range(300)]
    rows += [(300, []), (301, ["x"] * 25), (302, ["a", "b", "c"])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "arr"]))
    got = {
        r.i: (r.s["mx"], r.s["dup"])
        for r in df.select("i", _run_stats(F.col("arr")).alias("s")).collect()
    }
    for i, arr in rows:
        c = Counter(arr)
        mx = max(c.values()) if c else 0
        dup = sum(v for v in c.values() if v > 1)
        assert got[i] == (mx, dup), (i, arr, got[i], (mx, dup))


def test_chunk_tokens_coverage_properties(spark):
    """For random docs and (window, stride) combos: chunk k starts at
    token k*stride, every token is covered by at least one chunk, all
    chunks except the last have exactly `window` tokens, and no chunk
    is empty."""
    import random

    import pandas as pd

    from scip_spark.functions.corpus import chunk_tokens

    rng = random.Random(29)
    rows = [
        (i, " ".join(f"t{j}" for j in range(rng.randint(0, 120))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for window, stride in [(16, 16), (16, 12), (7, 3), (1, 1)]:
        out = chunk_tokens(docs, window=window, stride=stride).toPandas()
        n_by_doc = {i: len(t.split()) if t else 0 for i, t in rows}
        for doc_id, grp in out.groupby("doc_id"):
            n = n_by_doc[doc_id]
            grp = grp.sort_values("chunk_id").reset_index(drop=True)
            # chunk ids are dense from 0
            assert list(grp.chunk_id) == list(range(len(grp)))
            covered = set()
            for _, row in grp.iterrows():
                toks = row.chunk_text.split()
                assert 1 <= len(toks) <= window
                start = row.chunk_id * stride
                assert toks[0] == f"t{start}"
                covered.update(range(start, start + len(toks)))
            assert covered == set(range(n)), (doc_id, window, stride)
            # all but the last chunk are full
            assert (grp.chunk_n_tokens[:-1] == window).all()
        # docs with zero tokens produce no chunks
        assert set(out.doc_id) == {i for i, t in rows if n_by_doc[i] > 0}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # a corpus: each doc is a token list over a tiny alphabet
        st.lists(st.sampled_from([f"t{i}" for i in range(9)]),
                 min_size=0, max_size=20),
        min_size=1, max_size=8,
    )
)
def test_winnow_fingerprints_match_python_reference(spark, corpus):
    """The staged Spark winnow construction == a direct Python
    implementation of MOSS winnowing (k=5, w=4, md5-48bit, leftmost
    window minimum) on arbitrary corpora — the tiny alphabet forces
    repeated grams and window-minimum ties, pinning the tie-break."""
    import hashlib

    from scip_spark.functions.dedup import (
        winnow_fingerprint_positions,
        winnow_fingerprints,
    )

    k, w = 5, 4

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    want_fp, want_pos = set(), set()
    for sid, toks in enumerate(corpus):
        grams = [h(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
        for j in range(len(grams) - w + 1):
            window = grams[j:j + w]
            m = min(window)
            want_fp.add((sid, m))
            want_pos.add((sid, m, j + 1 + window.index(m)))

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got_fp = {tuple(r) for r in winnow_fingerprints(docs, k=k, w=w).collect()}
    assert got_fp == want_fp
    got_pos = {
        tuple(r) for r in winnow_fingerprint_positions(docs, k=k, w=w).collect()
    }
    assert got_pos == want_pos


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 20), st.integers(1, 20),
    st.integers(0, 25), st.integers(0, 25),
    st.integers(0, 25), st.integers(0, 25),
)
def test_reflect_pad_matches_numpy(h, w, top, bottom, left, right):
    """The slice-assignment reflect_pad must equal np.pad('reflect')
    bit-for-bit wherever np.pad accepts the widths (incl. the
    multi-reflection fallback for pads >= the extent)."""
    import numpy as np

    from scip_spark.kernels import imageops as K

    rng = np.random.default_rng(h * 1000 + w * 100 + top + bottom + left + right)
    img = rng.random((h, w))
    try:
        want = np.pad(img, ((top, bottom), (left, right)), mode="reflect")
    except ValueError:
        return  # np.pad itself rejects (size-1 axis with reflection)
    assert np.array_equal(K.reflect_pad(img, top, bottom, left, right), want)


def test_watershed_packed_heap_matches_tuple_formulation():
    """The packed-heap/flat-list watershed must reproduce the original
    tuple-heap flood bit-for-bit: heap order never compares past the
    unique age, and all priority arithmetic is the same IEEE ops."""
    import heapq

    import numpy as np

    from scip_spark.kernels import imageops as K

    def reference(elevation, markers, mask=None, connectivity=1, compactness=0.0):
        h, w = elevation.shape
        out = markers.astype(np.int32).copy()
        allowed = np.ones((h, w), dtype=bool) if mask is None else mask.astype(bool)
        out[~allowed] = 0
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 2:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        heap, age = [], 0
        ys, xs = np.nonzero(out > 0)
        order = np.argsort(elevation[ys, xs], kind="stable")
        for i in order:
            y, x = int(ys[i]), int(xs[i])
            heapq.heappush(heap, (float(elevation[y, x]), age, y, x, y, x))
            age += 1
        while heap:
            _, _, y, x, sy, sx = heapq.heappop(heap)
            lab = out[y, x]
            for dy, dx in shifts:
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and allowed[ny, nx] and out[ny, nx] == 0:
                    out[ny, nx] = lab
                    prio = float(elevation[ny, nx])
                    if compactness > 0:
                        prio += compactness * float(
                            np.sqrt((ny - sy) ** 2 + (nx - sx) ** 2)
                        )
                    heapq.heappush(heap, (prio, age, ny, nx, sy, sx))
                    age += 1
        return out

    rng = np.random.default_rng(34)
    for t in range(60):
        h = int(rng.integers(4, 30))
        w = int(rng.integers(4, 30))
        elev = rng.random((h, w)).astype(np.float32 if t % 2 else np.float64)
        mask = rng.random((h, w)) > 0.3
        markers = np.zeros((h, w), dtype=np.int32)
        for i in range(int(rng.integers(1, 5))):
            yy, xx = int(rng.integers(0, h)), int(rng.integers(0, w))
            if mask[yy, xx]:
                markers[yy, xx] = i + 1
        comp = [0.0, 1.0, 0.5][t % 3]
        conn = 1 + t % 2
        assert np.array_equal(
            K.watershed(elev, markers, mask, connectivity=conn, compactness=comp),
            reference(elev, markers, mask, connectivity=conn, compactness=comp),
        ), t


@settings(max_examples=25, deadline=None)
@given(st.lists(small_masks, min_size=1, max_size=8))
def test_distance_transform_batch_matches_single(masks):
    """The stacked batch sweep must be bit-identical to the per-mask
    sweep across mixed shapes (the watershed operator batches a whole
    Arrow batch of frames through it)."""
    got = K.distance_transform_batch(masks)
    for m, g in zip(masks, got):
        assert np.array_equal(g, K.distance_transform(m)), m.shape


@settings(max_examples=25, deadline=None)
@given(
    arrays(dtype=np.float64, shape=st.tuples(st.integers(1, 5), st.integers(2, 14), st.integers(2, 14)),
           elements=st.floats(-1e3, 1e3)),
    st.floats(0.4, 3.0),
)
def test_batched_filter_kernels_match_single(stack, sigma):
    """gaussian/sobel/median-disk/reflect-pad batch variants must be
    bit-identical per slice to their 2-D twins (the mask chains batch
    whole Arrow batches of event crops through them)."""
    n = stack.shape[0]
    g = K.gaussian_batch(stack, sigma)
    s = K.sobel_batch(stack)
    m = K.median_disk_batch(stack, 2)
    p = K.reflect_pad_batch(stack, 1, 2, 2, 1)
    for i in range(n):
        assert np.array_equal(g[i], K.gaussian(stack[i], sigma))
        assert np.array_equal(s[i], K.sobel(stack[i]))
        assert np.array_equal(m[i], K.median_disk(stack[i], 2))
        assert np.array_equal(p[i], K.reflect_pad(stack[i], 1, 2, 2, 1))


@settings(max_examples=25, deadline=None)
@given(
    arrays(dtype=bool, shape=st.tuples(st.integers(1, 5), st.integers(1, 24), st.integers(1, 24))),
    st.integers(1, 7),
)
def test_erode_footprint_batch_matches_single(stack, r):
    """The batched cumsum-window erosion must equal the per-mask fast
    path (and therefore the shifted-AND formulation) slice for slice."""
    got = K.erode_footprint_batch(stack, K.disk(r))
    for i in range(stack.shape[0]):
        assert np.array_equal(got[i], K.erode_footprint(stack[i], K.disk(r)))


@given(st.binary(min_size=0, max_size=5000))
@settings(max_examples=200, deadline=None)
def test_tiff_lzw_roundtrip_any_bytes(data):
    """TIFF-LZW encode/decode are exact inverses on ARBITRARY byte
    strings (hypothesis sweeps empty input, long runs, high entropy —
    the width-ladder and KwKwK cases fixed seeds can miss)."""
    from scip_spark.sources.tiffio import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data)) == data


@given(st.binary(min_size=0, max_size=5000))
@settings(max_examples=200, deadline=None)
def test_tiff_packbits_roundtrip_any_bytes(data):
    from scip_spark.sources.tiffio import _packbits_decode, _packbits_encode

    assert _packbits_decode(_packbits_encode(data)) == data
