import numpy as np

from scip_spark.operators.masking import (
    MASK_METHODS,
    apply_mask,
    compute_filters,
    get_mask,
    remove_border_regions,
)
from scip_spark.schema import decode_tensor


def test_compute_filters_pass(full_events_df):
    out = compute_filters(full_events_df, "std", threshold=0.0).toPandas()
    assert len(out) == 10
    assert all(len(f) == 3 and all(f) for f in out.mask_filter)
    assert out.pixels.notna().all()


def test_compute_filters_soft_delete(full_events_df):
    # impossible threshold: every record fails, pixels nulled, rows SURVIVE
    out = compute_filters(full_events_df, "std", threshold=1e9).toPandas()
    assert len(out) == 10
    assert out.pixels.isna().all()
    assert out.path.notna().all()


def test_get_mask_invariants(full_events_df):
    for method in ["otsu", "circle", "sobel"]:
        out = get_mask(full_events_df, method).toPandas()
        assert len(out) == 10, method
        for _, r in out.iterrows():
            m = decode_tensor(r["mask"], r.mask_shape, dtype=bool)
            assert m.shape == (3, 10, 10), method
            assert r.regions is not None and len(r.regions) == 3, method


def test_circle_mask_geometry(full_events_df):
    out = get_mask(full_events_df, "circle").toPandas()
    m = decode_tensor(out.iloc[0]["mask"], out.iloc[0].mask_shape, dtype=bool)
    assert m[0, 5, 5]  # center in
    assert not m[0, 0, 0]  # corner out


def test_apply_mask(full_events_df):
    masked = get_mask(full_events_df, "circle")
    out = apply_mask(masked).toPandas()
    for _, r in out.iterrows():
        cm = np.asarray(r.combined_mask, dtype=bool).reshape(10, 10)
        assert cm.any()
        assert len(r.background) == 3
        assert r.bbox is not None and len(r.bbox) == 4


def test_remove_border_regions(spark, full_events_df):
    # circle mask touches no border → survives
    masked = get_mask(full_events_df, "circle")
    out = remove_border_regions(masked).toPandas()
    assert out["mask"].notna().all()


def test_mask_subtract(full_events_df):
    from scip_spark.operators.segmentation import mask_subtract
    from scip_spark.schema import decode_tensor
    from scip_spark.operators.masking import get_mask
    import numpy as np

    masked = get_mask(full_events_df, "circle")
    out = mask_subtract(masked, target=2, left=0, right=1).toPandas()
    m = decode_tensor(out.iloc[0]["mask"], out.iloc[0].mask_shape, dtype=bool)
    np.testing.assert_array_equal(m[2], m[0] & ~m[1])


def test_mask_filter_gates_channels(spark, full_events_df):
    """A channel whose mask_filter is False gets an all-False mask and
    0 regions (reference li.py:33-47 semantics)."""
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F
    from scip_spark.schema import decode_tensor

    flagged = full_events_df.withColumn(
        "mask_filter", F.array(F.lit(True), F.lit(False), F.lit(True))
    )
    out = get_mask(flagged, "circle").toPandas()
    r = out.iloc[0]
    m = decode_tensor(r["mask"], r.mask_shape, dtype=bool)
    assert m[0].any() and m[2].any()
    assert not m[1].any()
    assert list(r.regions) == [1, 0, 1]


# ---------------------------------------------------------------------------
# P6 normaltest filter (reference filters/normaltest.py:5-10)
# ---------------------------------------------------------------------------


def test_normaltest_matches_scipy_docstring_values():
    """Pin against the value table published in scipy's own docstrings
    (computed by scipy.stats, not by this repo — scipy is absent here).
    """
    from scip_spark.kernels.stats import kurtosistest_z, skewtest_z

    # scipy.stats.skewtest([1,2,3,4,5,6,7,8]) -> statistic=1.0108048609177787
    assert abs(skewtest_z(np.arange(1, 9)) - 1.0108048609177787) < 1e-12
    # scipy.stats.kurtosistest(range(20)) -> statistic=-1.7058104152122062
    assert abs(kurtosistest_z(np.arange(20)) - (-1.7058104152122062)) < 1e-12


def test_normaltest_discriminates_normal_from_uniform():
    from scip_spark.kernels.stats import normaltest_filter, normaltest_pvalue

    rng = np.random.default_rng(7)
    normal = rng.normal(100.0, 5.0, size=4096)
    uniform = rng.uniform(0.0, 1.0, size=4096)
    bimodal = np.concatenate([rng.normal(0, 1, 2048), rng.normal(8, 1, 2048)])
    assert normaltest_pvalue(normal) > 0.05
    assert normaltest_pvalue(uniform) < 1e-6
    # reference semantics: True == NOT normal == keep (interesting signal)
    assert not normaltest_filter(normal)
    assert normaltest_filter(uniform)
    assert normaltest_filter(bimodal)


def test_normaltest_registered_as_qc_filter(full_events_df):
    from scip_spark.functions.registry import resolve

    assert resolve("filter", "normaltest") is not None
    out = compute_filters(full_events_df, "normaltest").toPandas()
    assert "mask_filter" in out.columns
    flags = [f for f in out["mask_filter"] if f is not None]
    assert flags, "expected at least one non-null flag row"
    assert all(isinstance(bool(v), bool) for row in flags for v in row)


def test_batched_mask_fronts_match_plain_chains():
    """The shape-grouped li/otsu filter fronts must produce masks
    bit-identical to the straightforward per-image kernel chains, on
    every dtype/range path (float small-range, digitize>512, uint16,
    constant image)."""
    import numpy as np

    import scip_spark.kernels.imageops as K
    from scip_spark.operators.masking import (
        _li_fronts,
        _li_tail,
        _otsu_fronts,
        _otsu_tail,
    )

    def ref_li(channel, smooth=1.0):
        edges = K.gaussian(K.sobel(K.gaussian(channel, smooth)), 2.0 * smooth)
        m = edges > K.threshold_li(edges)
        m = K.remove_small_holes(m, int(m.shape[0] * m.shape[1] / 4))
        return K.remove_small_objects(m, 20)

    def ref_otsu(channel):
        x = channel
        if x.max() > 512:
            bins = np.histogram_bin_edges(x.ravel(), bins=512)
            x = np.digitize(x, bins=bins).astype(np.float64)
        p = K.median_disk(x, 5)
        p = K.sobel(K.gaussian(x.astype(np.float64) - p, 0.5))
        span = (p.max() - p.min()) or 1.0
        p = np.floor((p - p.min()) / span * x.max())
        p = K.median_disk(p, 5)
        m = p > K.threshold_otsu(p)
        m = K.remove_small_holes(m, int(m.shape[0] * m.shape[1] / 4))
        return K.remove_small_objects(m, 20)

    rng = np.random.default_rng(43)
    imgs = []
    for trial in range(60):
        h, w = rng.integers(2, 24, 2)
        base = rng.random((h, w))
        imgs.append(
            [(base * 255).astype(np.float32),
             (base * 4000).astype(np.float64),
             (base * 1000).astype(np.uint16),
             np.full((h, w), float(rng.integers(0, 600)))][trial % 4]
        )
    fl = [img.astype(np.float64) for img in imgs]
    for img, p in zip(fl, _li_fronts(fl)):
        m, n = _li_tail(p)
        assert np.array_equal(m, ref_li(img))
        assert n == K.label(m, 2)[1]  # piggybacked region count
    for img, p in zip(imgs, _otsu_fronts(imgs)):
        m, n = _otsu_tail(p)
        assert np.array_equal(m, ref_otsu(img))
        assert n == K.label(m, 2)[1]


def test_gather_idx_cache_byte_bounded():
    """ADVICE r8: the gather-index cache is bounded by BYTES, not entry
    count — an oversized (full-frame) index is never cached, and
    accumulating medium entries past the budget triggers eviction."""
    import numpy as np

    from scip_spark.kernels import imageops as io

    io._GATHER_IDX_CACHE.clear()
    io._GATHER_IDX_BYTES[0] = 0
    big = np.ones((11, 11), dtype=bool)  # k=121
    offs = list(zip(*np.nonzero(big)))
    # h*w*k*8 bytes ≈ 2 GB-class would be absurd in a test; shrink the
    # budget instead and use shapes around it
    old = io._GATHER_IDX_BUDGET_BYTES
    try:
        io._GATHER_IDX_BUDGET_BYTES = 1 << 20  # 1 MiB
        # oversized: 200x200x121 intp ≈ 38 MB > budget/4 → not cached
        io._gather_idx(big, offs, 200, 200, 220)
        assert not io._GATHER_IDX_CACHE
        # medium entries accumulate, then evict at the budget
        fps = [np.ones((3, 3), dtype=bool) for _ in range(60)]
        offs3 = list(zip(*np.nonzero(fps[0])))
        for fp in fps:
            io._gather_idx(fp, offs3, 40, 40, 50)  # ~115 KB each
        assert io._GATHER_IDX_BYTES[0] <= io._GATHER_IDX_BUDGET_BYTES
        assert sum(
            v[1].nbytes for v in io._GATHER_IDX_CACHE.values()
        ) <= io._GATHER_IDX_BUDGET_BYTES
        # cache hits still work (same footprint object, same shape)
        fp = fps[-1]
        a = io._gather_idx(fp, offs3, 40, 40, 50)
        b = io._gather_idx(fp, offs3, 40, 40, 50)
        assert a is b
    finally:
        io._GATHER_IDX_BUDGET_BYTES = old
        io._GATHER_IDX_CACHE.clear()
        io._GATHER_IDX_BYTES[0] = 0


def test_median_disk_batch_int_bit_identical_and_fallback():
    """The int16 gather median equals the float64 one on every
    int-valued stack (incl. even-k footprints), and silently falls
    back on non-integral / out-of-range / NaN inputs."""
    import numpy as np

    from scip_spark.kernels import imageops as K

    rng = np.random.default_rng(42)
    for n, h, w, scale in [(7, 9, 11, 513), (5, 12, 8, 2), (3, 32, 32, 513)]:
        X = np.floor(rng.random((n, h, w)) * scale)
        for r in (2, 5):
            np.testing.assert_array_equal(
                K.median_disk_batch_int(X, r), K.median_disk_batch(X, r)
            )
    # non-integral values: must take the float64 fallback and still match
    Xf = rng.random((4, 10, 10)) * 200
    np.testing.assert_array_equal(
        K.median_disk_batch_int(Xf, 5), K.median_disk_batch(Xf, 5)
    )
    # out of int16 range: fallback
    Xb = np.floor(rng.random((2, 9, 9)) * 1e6)
    np.testing.assert_array_equal(
        K.median_disk_batch_int(Xb, 5), K.median_disk_batch(Xb, 5)
    )
    # NaN present: fallback (sort semantics preserved)
    Xn = np.floor(rng.random((2, 9, 9)) * 100)
    Xn[0, 3, 3] = np.nan
    np.testing.assert_array_equal(
        K.median_disk_batch_int(Xn, 5), K.median_disk_batch(Xn, 5)
    )


def test_otsu_front_digitized_path_identical_and_faster_path_used():
    """A >512-valued (digitize-path) channel and a raw-float channel
    produce masks identical to the per-image 2-D chain after the
    digitized group's first median takes the int16 gather path."""
    import numpy as np

    from scip_spark.operators import masking as M

    rng = np.random.default_rng(9)
    # digitize path: uint16-scale values
    big = [rng.random((11, 12)) * 40_000 for _ in range(6)]
    # raw-float path
    small = [rng.random((11, 12)) * 200 for _ in range(6)]
    fronts = M._otsu_fronts(big + small)
    for i, ch in enumerate(big + small):
        single = M._otsu_fronts([ch])[0]
        np.testing.assert_array_equal(fronts[i], single)
        # and against the full mask chain
        np.testing.assert_array_equal(M._mask_otsu(ch), M._otsu_tail(fronts[i])[0])
