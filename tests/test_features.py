"""Feature extraction invariants from the reference's tests:
10 rows, no NaNs for full AND partial masks
(test_feature_extraction.py:6-20), and bit-identical output for
duplicate branches (test_main.py:52)."""

import numpy as np

from scip_spark.operators.features import (
    DEFAULT_FAMILIES,
    extract_features,
    feature_columns,
)


def _feat_frame(df):
    return extract_features(df, nchannels=3).toPandas()


def test_feature_shape_and_no_nans(full_events_df):
    out = _feat_frame(full_events_df)
    feat_cols = feature_columns(3, DEFAULT_FAMILIES)
    assert len(out) == 10
    assert not out[feat_cols].isna().any().any()
    assert not np.isinf(out[feat_cols].to_numpy(dtype=float)).any()


def test_feature_no_nans_partial(partial_events_df):
    out = _feat_frame(partial_events_df)
    feat_cols = feature_columns(3, DEFAULT_FAMILIES)
    assert len(out) == 10
    assert not out[feat_cols].isna().any().any()


def test_known_intensity_values(full_events_df):
    out = _feat_frame(full_events_df).iloc[0]
    # full mask over arange(100): mean 49.5, min 0, max 99, sum 4950
    assert out["feat_intensity_mean_mask_c0"] == 49.5
    assert out["feat_intensity_min_mask_c0"] == 0.0
    assert out["feat_intensity_max_mask_c0"] == 99.0
    assert out["feat_intensity_sum_mask_c0"] == 4950.0
    assert out["feat_raw_mean_c1"] == 49.5


def test_duplicate_branch_determinism(full_events_df):
    """Two identical branches must produce identical feature values —
    the reference's strongest end-to-end oracle (test_main.py:52)."""
    a = _feat_frame(full_events_df).sort_values("object_number").reset_index(drop=True)
    b = _feat_frame(full_events_df).sort_values("object_number").reset_index(drop=True)
    feat_cols = feature_columns(3, DEFAULT_FAMILIES)
    np.testing.assert_array_equal(
        a[feat_cols].to_numpy(dtype=float), b[feat_cols].to_numpy(dtype=float)
    )


def test_soft_deleted_records_yield_null_features(full_events_df):
    from scip_spark.operators.masking import compute_filters

    dropped = compute_filters(full_events_df, "std", threshold=1e9)
    out = extract_features(dropped, nchannels=3).toPandas()
    feat_cols = feature_columns(3, DEFAULT_FAMILIES)
    assert len(out) == 10  # metadata rows survive
    assert out[feat_cols].isna().all().all()
    assert out.path.notna().all()


def test_ragged_tensor_features(spark):
    """Per-record H×W varies (the zarr/to_events reality): the feature
    stage must handle ragged shapes in one batch with no NaNs."""
    import numpy as np

    from scip_spark.schema import EVENT_SCHEMA, events_to_pandas

    rng = np.random.RandomState(3)
    recs = []
    for i, (h, w) in enumerate([(8, 8), (12, 9), (20, 30), (5, 7)]):
        px = (rng.rand(2, h, w) * 50 + 1).astype(np.float32)
        m = np.zeros((2, h, w), dtype=bool)
        m[:, 1 : h - 1, 1 : w - 1] = True
        recs.append(
            {
                "path": f"r{i}",
                "group": "g",
                "object_number": i,
                "pixels": px,
                "mask": m,
                "combined_mask": m[0],
                "background": [0.0, 0.0],
                "bbox": [1, 1, h - 1, w - 1],
                "regions": [1, 1],
            }
        )
    df = spark.createDataFrame(events_to_pandas(recs), schema=EVENT_SCHEMA)
    out = extract_features(df, nchannels=2).toPandas()
    cols = feature_columns(2, DEFAULT_FAMILIES)
    assert len(out) == 4
    assert not out[cols].isna().any().any()
    # area of the eroded interior mask = (h-2)*(w-2)
    a = out.sort_values("object_number").reset_index(drop=True)
    assert a.loc[0, "feat_shape_area_c0"] == 36.0  # (8-2)*(8-2)
    assert a.loc[2, "feat_shape_area_c0"] == 18.0 * 28.0


# --- round 2: full 59-prop shape set (F18), 8 intensity views (F19),
# --- texture combined view (F21)


def test_shape_prop_inventory_matches_reference():
    """59 props per view (reference shape.py:24-84), combined + per
    channel (shape.py:108-112)."""
    from scip_spark.kernels.imageops import SHAPE_PROP_NAMES
    from scip_spark.operators.features import SHAPE_PROPS

    assert len(SHAPE_PROP_NAMES) == 59
    assert SHAPE_PROPS == list(SHAPE_PROP_NAMES)
    cols = feature_columns(3, ["shape"])
    assert len(cols) == 59 * 4  # combined + 3 channels
    assert "feat_shape_moments_hu_6_combined" in cols
    assert "feat_shape_solidity_c2" in cols


def test_regionprops_full_known_values():
    import numpy as np

    from scip_spark.kernels import imageops as K

    # solid 6x6 square
    m = np.zeros((10, 10), bool)
    m[2:8, 2:8] = True
    p = K.regionprops_full(K.label(m, 2)[0])[0]
    assert p["area"] == 36.0
    assert p["convex_area"] == 36.0
    assert p["filled_area"] == 36.0
    assert p["solidity"] == 1.0
    assert p["extent"] == 1.0
    assert p["euler_number"] == 1.0
    assert p["eccentricity"] == 0.0  # symmetric
    assert p["moments_0_0"] == 36.0
    # raw moment m10 = sum of row coords (bbox-local 0..5, 6 each)
    assert p["moments_1_0"] == 6 * (0 + 1 + 2 + 3 + 4 + 5)
    assert p["moments_central_1_0"] == 0.0  # central first moment vanishes
    np.testing.assert_allclose(p["equivalent_diameter"], np.sqrt(4 * 36 / np.pi))
    # inertia tensor of a symmetric square: diagonal, equal eigenvalues
    assert p["inertia_tensor_0_1"] == 0.0
    assert p["inertia_tensor_eigvals_0"] == p["inertia_tensor_eigvals_1"]

    # square with a hole: euler 0, filled_area recovers the hole
    m2 = m.copy()
    m2[4:6, 4:6] = False
    p2 = K.regionprops_full(K.label(m2, 2)[0])[0]
    assert p2["euler_number"] == 0.0
    assert p2["area"] == 32.0
    assert p2["filled_area"] == 36.0

    # L-shape: convex hull strictly larger than the region
    mL = np.zeros((10, 10), bool)
    mL[1:9, 1:3] = True
    mL[7:9, 1:9] = True
    pL = K.regionprops_full(K.label(mL, 2)[0])[0]
    assert pL["convex_area"] > pL["area"]
    assert 0 < pL["solidity"] < 1

    # thin diagonal: eccentricity ~1, feret = hull diagonal
    m3 = np.zeros((20, 20), bool)
    for i in range(15):
        m3[i + 2, i + 2] = True
    p3 = K.regionprops_full(K.label(m3, 2)[0])[0]
    assert p3["eccentricity"] > 0.99
    assert p3["feret_diameter_max"] > 14 * np.sqrt(2)

    # Hu moments are translation-invariant
    mA = np.zeros((16, 16), bool)
    mA[2:7, 3:9] = True
    mB = np.zeros((16, 16), bool)
    mB[9:14, 7:13] = True
    pA = K.regionprops_full(K.label(mA, 2)[0])[0]
    pB = K.regionprops_full(K.label(mB, 2)[0])[0]
    for k in range(7):
        np.testing.assert_allclose(
            pA[f"moments_hu_{k}"], pB[f"moments_hu_{k}"], atol=1e-12
        )


def test_shape_empty_mask_default_row(spark):
    """Reference shape.py:149-211: empty channel mask -> first 11 props
    0, the rest null."""
    import numpy as np

    from scip_spark.kernels.imageops import SHAPE_PROP_NAMES
    from scip_spark.schema import EVENT_SCHEMA, events_to_pandas

    px = np.ones((2, 8, 8), dtype=np.float32)
    m = np.zeros((2, 8, 8), dtype=bool)
    m[0, 2:6, 2:6] = True  # channel 1 mask stays empty
    rec = {
        "path": "r0", "group": "g", "object_number": 0,
        "pixels": px, "mask": m, "combined_mask": m[0],
        "background": [0.0, 0.0], "combined_background": [0.0, 0.0],
        "bbox": [2, 2, 6, 6], "regions": [1, 0],
    }
    df = spark.createDataFrame(events_to_pandas([rec]), schema=EVENT_SCHEMA)
    out = extract_features(df, nchannels=2, families=["shape"]).toPandas().iloc[0]
    zero_props = SHAPE_PROP_NAMES[:11]
    null_props = SHAPE_PROP_NAMES[11:]
    for p in zero_props:
        assert out[f"feat_shape_{p}_c1"] == 0.0, p
    for p in null_props:
        assert np.isnan(out[f"feat_shape_{p}_c1"]), p
    # non-empty channel 0 and combined rows are fully populated
    for p in SHAPE_PROP_NAMES:
        assert not np.isnan(out[f"feat_shape_{p}_c0"]), p
        assert not np.isnan(out[f"feat_shape_{p}_combined"]), p
    assert out["feat_shape_area_c0"] == 16.0
    assert out["feat_shape_area_combined"] == 16.0


def test_intensity_eight_views(full_events_df):
    """Reference intensity.py:40-51: 8 views x 11 props per channel;
    bgcorr shifts the mean by the background, combined views use the
    combined background."""
    from scip_spark.operators.features import INTENSITY_PROPS, INTENSITY_VIEWS

    assert INTENSITY_VIEWS == [
        "mask", "bgcorr", "edge", "bgcorr_edge",
        "combined", "combined_bgcorr", "combined_edge", "combined_bgcorr_edge",
    ]
    cols = feature_columns(3, ["intensity"])
    assert len(cols) == 11 * 8 * 3
    out = _feat_frame(full_events_df).iloc[0]
    # zero background: bgcorr views equal their raw counterparts
    assert out["feat_intensity_mean_bgcorr_c0"] == out["feat_intensity_mean_mask_c0"]
    assert (
        out["feat_intensity_sum_combined_bgcorr_c1"]
        == out["feat_intensity_sum_combined_c1"]
    )
    # full 10x10 mask: disk(6) erosion clears it, so edge == mask view
    assert out["feat_intensity_mean_edge_c0"] == out["feat_intensity_mean_mask_c0"]
    assert len(INTENSITY_PROPS) == 11


def test_intensity_bgcorr_shifts_mean(spark):
    import numpy as np

    from scip_spark.schema import EVENT_SCHEMA, events_to_pandas

    px = np.tile(np.arange(64, dtype=np.float32).reshape(8, 8), (2, 1, 1))
    m = np.ones((2, 8, 8), dtype=bool)
    rec = {
        "path": "r0", "group": "g", "object_number": 0,
        "pixels": px, "mask": m, "combined_mask": m[0],
        "background": [10.0, 3.0], "combined_background": [7.0, 2.0],
        "bbox": [0, 0, 8, 8], "regions": [1, 1],
    }
    df = spark.createDataFrame(events_to_pandas([rec]), schema=EVENT_SCHEMA)
    out = extract_features(df, nchannels=2, families=["intensity"]).toPandas().iloc[0]
    mu = float(np.arange(64).mean())
    assert out["feat_intensity_mean_mask_c0"] == mu
    assert out["feat_intensity_mean_bgcorr_c0"] == mu - 10.0
    assert out["feat_intensity_mean_bgcorr_c1"] == mu - 3.0
    # combined views use combined_background, not the channel background
    assert out["feat_intensity_mean_combined_bgcorr_c0"] == mu - 7.0
    assert out["feat_intensity_mean_combined_bgcorr_c1"] == mu - 2.0


def test_texture_combined_view(spark):
    """Reference texture.py:29-47: every texture prop appears for the
    channel-mask AND combined-mask views; with combined == channel mask
    the two views agree, with a different combined mask they differ."""
    import numpy as np

    from scip_spark.schema import EVENT_SCHEMA, events_to_pandas

    cols = feature_columns(2, ["texture"])
    assert len(cols) == 28 * 2 * 2  # 28 props x 2 views x 2 channels
    assert "feat_texture_combined_glcm_mean_contrast_d3_c0" in cols
    assert "feat_texture_combined_sobel_max_c1" in cols

    rng = np.random.RandomState(7)
    px = (rng.rand(2, 12, 12) * 100).astype(np.float32)
    m = np.zeros((2, 12, 12), dtype=bool)
    m[:, 2:10, 2:10] = True
    cm_same = m[0].copy()
    rec = {
        "path": "r0", "group": "g", "object_number": 0,
        "pixels": px, "mask": m, "combined_mask": cm_same,
        "background": [0.0, 0.0], "combined_background": [0.0, 0.0],
        "bbox": [2, 2, 10, 10], "regions": [1, 1],
    }
    df = spark.createDataFrame(events_to_pandas([rec]), schema=EVENT_SCHEMA)
    out = extract_features(df, nchannels=2, families=["texture"]).toPandas().iloc[0]
    for p in ["glcm_mean_contrast_d3", "glcm_std_energy_d5", "sobel_mean"]:
        assert out[f"feat_texture_{p}_c0"] == out[f"feat_texture_combined_{p}_c0"], p

    cm_diff = np.zeros((12, 12), dtype=bool)
    cm_diff[4:8, 4:8] = True
    rec2 = dict(rec, combined_mask=cm_diff)
    df2 = spark.createDataFrame(events_to_pandas([rec2]), schema=EVENT_SCHEMA)
    out2 = extract_features(df2, nchannels=2, families=["texture"]).toPandas().iloc[0]
    assert (
        out2["feat_texture_glcm_mean_contrast_d3_c0"]
        != out2["feat_texture_combined_glcm_mean_contrast_d3_c0"]
    )


def test_stats11_bitwise_matches_reference_formulation():
    """The sort-based _stats11 must be BIT-identical to the plain-numpy
    _stats11_ref on every input shape/dtype/tie pattern (the fast path
    replicates numpy's pairwise sums and quantile _lerp arithmetic)."""
    import numpy as np

    from scip_spark.operators.features import _stats11, _stats11_ref

    rng = np.random.default_rng(11)
    cases = []
    for trial in range(300):
        n = int(rng.integers(1, 300))
        kind = trial % 6
        if kind == 0:
            cases.append(rng.normal(0, 1, n))
        elif kind == 1:
            cases.append(rng.integers(0, 5, n).astype(np.float32))  # ties
        elif kind == 2:
            cases.append(rng.normal(1e8, 1e-3, n))
        elif kind == 3:
            cases.append(rng.random(n) * 1e-300)
        elif kind == 4:
            cases.append(rng.standard_cauchy(n) * 1e6)
        else:  # 2D input (raw-family channels come in unflattened)
            cases.append(rng.normal(5, 2, (max(1, n // 17), 17)))
    cases.append(np.array([], dtype=np.float64))
    cases.append(np.array([3.25]))
    cases.append(np.array([1.0, np.nan, 3.0]))  # NaN fallback path
    for x in cases:
        a, b = _stats11(x), _stats11_ref(x)
        assert len(a) == len(b)
        for u, v in zip(a, b):
            assert (u == v) or (np.isnan(u) and np.isnan(v)), (x.shape, a, b)


def test_glcm_bitwise_matches_per_angle_reference():
    """The stacked-angle + bincount GLCM must be BIT-identical to the
    straightforward per-angle add.at formulation (the reference
    texture.py semantics)."""
    import numpy as np

    from scip_spark.operators.features import _glcm_features

    def per_angle_ref(ch, mask, distance, levels=15):
        vals = ch[mask]
        if vals.size < 2:
            return [0.0] * 12
        lo, hi = float(vals.min()), float(vals.max())
        span = (hi - lo) or 1.0
        q = np.zeros_like(ch, dtype=np.int32)
        q[mask] = np.minimum(((ch[mask] - lo) / span * levels).astype(np.int32), levels - 1) + 1
        d = distance
        h, w = q.shape
        i, j = np.meshgrid(np.arange(levels), np.arange(levels), indexing="ij")
        diff = i - j
        per_angle = []
        for dy, dx in [(0, d), (d, d), (d, 0), (d, -d)]:
            if h - abs(dy) <= 0 or w - abs(dx) <= 0:
                per_angle.append([0.0] * 6)
                continue
            glcm = np.zeros((levels + 1, levels + 1))
            y0, y1 = max(0, -dy), min(h, h - dy)
            x0, x1 = max(0, -dx), min(w, w - dx)
            a = q[y0:y1, x0:x1]
            b = q[y0 + dy : y1 + dy, x0 + dx : x1 + dx]
            valid = (a > 0) & (b > 0)
            np.add.at(glcm, (a[valid], b[valid]), 1.0)
            glcm = glcm[1:, 1:]
            glcm = glcm + glcm.T
            total = glcm.sum()
            if total == 0:
                per_angle.append([0.0] * 6)
                continue
            p = glcm / total
            contrast = float((p * diff**2).sum())
            dissim = float((p * np.abs(diff)).sum())
            homog = float((p / (1.0 + diff**2)).sum())
            asm = float((p**2).sum())
            energy = float(np.sqrt(asm))
            mu_i = float((p * i).sum())
            mu_j = float((p * j).sum())
            sd_i = float(np.sqrt((p * (i - mu_i) ** 2).sum()))
            sd_j = float(np.sqrt((p * (j - mu_j) ** 2).sum()))
            if sd_i > 0 and sd_j > 0:
                corr = float(((p * (i - mu_i) * (j - mu_j)).sum()) / (sd_i * sd_j))
            else:
                corr = 1.0
            per_angle.append([contrast, dissim, homog, energy, corr, asm])
        arr = np.asarray(per_angle)
        out = []
        for k in range(6):
            out.append(float(arr[:, k].mean()))
            out.append(float(arr[:, k].std()))
        return out

    rng = np.random.default_rng(12)
    for trial in range(200):
        h = int(rng.integers(2, 36))
        w = int(rng.integers(2, 36))
        ch = rng.normal(10, 3, (h, w)) if trial % 2 else rng.integers(0, 4, (h, w)).astype(float)
        mask = rng.random((h, w)) > rng.random() * 0.9
        d = int(rng.integers(1, 9))
        assert _glcm_features(ch, mask, d) == per_angle_ref(ch, mask, d), (h, w, d)


def test_erode_footprint_matches_offset_formulation():
    """The cumsum-window erosion fast path must equal the shifted-AND
    offset loop for disks AND arbitrary (incl. non-contiguous-row)
    footprints."""
    import numpy as np

    from scip_spark.kernels import imageops as K

    rng = np.random.default_rng(13)
    for trial in range(200):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        m = rng.random((h, w)) > rng.random()
        fp = (
            K.disk(int(rng.integers(1, 8)))
            if trial % 2
            else rng.random((int(rng.integers(1, 7)), int(rng.integers(1, 7)))) > 0.4
        )
        assert np.array_equal(
            K.erode_footprint(m, fp), K._erode_footprint_offsets(m, fp)
        ), (h, w, fp.astype(int))


def test_convex_hull_intkey_matches_axis_unique():
    """The int64-keyed dedup inside _convex_hull must reproduce the
    axis-0 np.unique formulation bit-for-bit (the point cloud is on
    the half-integer grid, so doubled-coordinate keys are exact)."""
    import numpy as np

    from scip_spark.kernels import imageops as K

    def reference(pts_raw):
        ref_pts = np.unique(pts_raw, axis=0)
        if len(ref_pts) <= 2:
            return ref_pts
        tups = [tuple(p) for p in ref_pts.tolist()]

        def half(seq):
            hull = []
            for p in seq:
                py, px = p
                while len(hull) >= 2:
                    oy, ox = hull[-2]
                    ay, ax = hull[-1]
                    if (ay - oy) * (px - ox) - (ax - ox) * (py - oy) <= 0:
                        hull.pop()
                    else:
                        break
                hull.append(p)
            return hull

        lower, upper = half(tups), half(tups[::-1])
        return np.asarray(lower[:-1] + upper[:-1])

    rng = np.random.default_rng(31)
    for trial in range(150):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        m = rng.random((h, w)) > rng.random() * 0.8
        if not m.any():
            continue
        pts = K._hull_cloud(m)
        assert np.array_equal(K._convex_hull(pts), reference(pts)), trial


def test_regionprops_assume_connected_identical():
    """assume_connected=True must change nothing but the cost: labels
    from label(mask, 2) mark one 8-connected component per id, so the
    euler path's n_objects is 1 by construction."""
    import numpy as np

    from scip_spark.kernels import imageops as K

    rng = np.random.default_rng(32)
    for trial in range(40):
        m = rng.random((24, 24)) > 0.55
        lab, n = K.label(m, 2)
        if n == 0:
            continue
        assert K.regionprops_full(lab) == K.regionprops_full(
            lab, assume_connected=True
        ), trial


def test_shape_row_vectorized_mean_bit_identical():
    """_shape_row's (59, n_regions) contiguous-axis mean must equal the
    per-prop list np.mean formulation bit-for-bit — including masks
    with > 8 regions, where a wrong (strided) reduction axis silently
    switches numpy from pairwise to sequential summation."""
    import numpy as np

    from scip_spark.kernels import imageops as K
    from scip_spark.operators.features import SHAPE_PROPS, _shape_row

    rng = np.random.default_rng(33)
    checked_many = 0
    for trial in range(120):
        m = rng.random((int(rng.integers(4, 30)), int(rng.integers(4, 30)))) > 0.5
        if not m.any():
            continue
        lab, n = K.label(m, 2)
        checked_many += n > 8
        props = K.regionprops_full(lab, assume_connected=True)
        want = [float(np.mean([pr[p] for pr in props])) for p in SHAPE_PROPS]
        assert _shape_row(m) == want, trial
    assert checked_many >= 5  # the >8-region pairwise regime was exercised


def test_glcm_props_batch_matches_per_instance():
    """_glcm_props_batch over MANY instances must be bit-identical to
    calling the single-instance wrapper per instance (the record-level
    texture batching relies on it)."""
    import numpy as np

    from scip_spark.operators.features import (
        _glcm_features,
        _glcm_props_batch,
        _glcm_pstack,
        _glcm_quantize,
    )

    rng = np.random.default_rng(17)
    insts, singles = [], []
    for trial in range(60):
        h = int(rng.integers(2, 30))
        w = int(rng.integers(2, 30))
        ch = rng.normal(5, 2, (h, w))
        mask = rng.random((h, w)) > rng.random() * 0.95  # incl. near-empty
        d = int(rng.integers(1, 8))
        q = _glcm_quantize(ch, mask)
        insts.append(_glcm_pstack(q, d))
        singles.append(_glcm_features(ch, mask, d, q=q))
    assert _glcm_props_batch(insts) == singles
    assert _glcm_props_batch([]) == []


def test_texture_block_matches_per_view_formulation():
    """The deferred texture block in _record_features (batched GLCM +
    hoisted sobel + view reuse) must equal the straightforward per-view
    row construction on both the shared-mask and distinct-mask paths."""
    import numpy as np

    import scip_spark.kernels.imageops as K
    from scip_spark.operators.features import (
        _glcm_features,
        _glcm_quantize,
        _record_features,
    )

    def texture_row_ref(chan, mask):
        q = _glcm_quantize(chan, mask)
        out = _glcm_features(chan, mask, 3, q=q) + _glcm_features(chan, mask, 5, q=q)
        sob = K.sobel(chan)[mask]
        if sob.size:
            out += [float(sob.mean()), float(sob.std()), float(sob.max()), float(sob.min())]
        else:
            out += [0.0] * 4
        return out

    rng = np.random.default_rng(19)
    for trial in range(40):
        nch = int(rng.integers(1, 4))
        h, w = (int(v) for v in rng.integers(3, 28, 2))
        a = rng.random((nch, h, w)) * 300
        m = rng.random((nch, h, w)) > 0.5
        if trial % 3 == 0:  # shared-mask (same_as_cm) path
            m = np.broadcast_to(m[0], m.shape).copy()
        cm = m.any(axis=0)
        got = _record_features(a, m, cm, None, None, None, ["texture"], nch)
        want = []
        for c in range(nch):
            trow = texture_row_ref(a[c], m[c])
            want += trow
            want += trow if np.array_equal(m[c], cm) else texture_row_ref(a[c], cm)
        assert got == want, trial


def test_stats11_many_bit_identical_to_per_call():
    """Length-grouped batched stats equal per-call _stats11 exactly —
    including NaN rows (ref fallback), empties, single-member groups,
    and 2-D inputs (ravel semantics)."""
    from scip_spark.operators.features import _stats11, _stats11_many

    rng = np.random.default_rng(11)
    vecs = []
    for _ in range(60):
        n = int(rng.integers(0, 40))
        v = rng.random(n) * rng.uniform(0.1, 1e4) - rng.uniform(0, 50)
        vecs.append(v)
    vecs.append(np.array([1.0, np.nan, 3.0]))
    vecs.append(rng.random((7, 9)))  # 2-D: _stats11 ravels
    vecs.append(np.full(12, 5.0))    # sd == 0 branch
    got = _stats11_many(vecs)
    want = [_stats11(v) for v in vecs]
    assert len(got) == len(want)
    for g, w in zip(got, want):  # NaN-positional equality, exact values
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_record_features_deferred_equals_standalone():
    """Cross-record deferral (extract_features' batch path): token rows
    resolved against ONE shared _stats11_many call are element-identical
    to per-record standalone _record_features — across records with
    empty channel masks, shared combined masks (None-valued shape
    defaults must survive the token encoding), and distinct per-channel
    masks."""
    from scip_spark.operators.features import (
        _record_features,
        _resolve_features,
        _stats11_many,
    )

    rng = np.random.default_rng(23)
    fams = ["bbox", "intensity", "raw", "shape", "texture"]
    nch = 2
    records = []
    for t in range(8):
        a = (rng.random((nch, 14, 16)) * 100).astype(np.float32)
        m = np.zeros((nch, 14, 16), dtype=bool)
        m[0, 3:10, 4:12] = True
        if t % 3 == 0:
            m[1] = m[0]          # channel mask == combined (shared path)
        elif t % 3 == 1:
            m[1, 1:6, 2:7] = True  # distinct channel mask
        # t % 3 == 2: channel 1 mask empty (zero views + shape defaults)
        cm = m.any(axis=0)
        bg = rng.random(nch) * 5
        records.append((a, m, cm, bg, bg * 0.5, [3, 4, 10, 12]))

    jobs: list = []
    tokens = [
        _record_features(a, m, cm, bg, cbg, bb, fams, nch, jobs=jobs)
        for a, m, cm, bg, cbg, bb in records
    ]
    stats = _stats11_many(jobs)
    for tok, (a, m, cm, bg, cbg, bb) in zip(tokens, records):
        got = _resolve_features(tok, stats)
        want = _record_features(a, m, cm, bg, cbg, bb, fams, nch)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if w is None:
                assert g is None
            else:
                np.testing.assert_array_equal(g, w)


def test_columnar_batch_assembly_matches_rowwise_dicts():
    """r15 optimization regression pin: make_features_batch assembles
    its output as one float64 feature block + meta columns instead of a
    list of ~700-key per-row dicts. The frames must be equivalent under
    Arrow semantics — same columns in schema order, identical meta
    values, and feature cells equal with {None, NaN} both mapping to
    Arrow NULL (old object->float64 path did exactly that)."""
    import pandas as pd

    from scip_spark.operators.features import (
        feature_schema,
        make_features_batch,
    )
    from scip_spark.schema import events_to_pandas

    rng = np.random.default_rng(7)
    nch = 3
    recs = []
    for t in range(6):
        a = (rng.random((nch, 12, 12)) * 50).astype(np.float32)
        m = np.zeros((nch, 12, 12), dtype=bool)
        m[:, 2:9, 3:10] = True
        if t == 2:
            m[1] = False  # empty channel mask -> None shape cells
        rec = {
            "path": f"/p/{t}.tiff",
            "group": f"g{t % 2}",
            "id": 0,
            "object_number": t,
            "pixels": None if t == 4 else a,  # soft-deleted record
            "mask": None if t == 4 else m,
            "combined_mask": m.any(axis=0) if t != 4 else None,
            "background": list(rng.random(nch)),
            "combined_background": list(rng.random(nch)),
            "bbox": [2, 3, 9, 10],
            "regions": [1] * nch,
        }
        recs.append(rec)
    pdf = events_to_pandas(recs)

    batch = make_features_batch(nch)
    out = batch(pdf)
    schema = feature_schema(nch, DEFAULT_FAMILIES)
    names = [f.name for f in schema.fields]
    assert list(out.columns) == names
    # meta passthrough, row-aligned
    assert out["path"].tolist() == [r["path"] for r in recs]
    assert out["object_number"].tolist() == [r["object_number"] for r in recs]
    feat_cols = feature_columns(nch, DEFAULT_FAMILIES)
    block = out[feat_cols]
    # one float64 block: every feature column numeric, soft-deleted row
    # all-NaN (-> Arrow NULL), live rows finite except deliberate Nones
    assert all(dt == np.float64 for dt in block.dtypes)
    assert block.iloc[4].isna().all()
    assert not block.iloc[0].isna().any()
    # values match the standalone per-record path bit-for-bit
    from scip_spark.operators.features import _record_features

    want = _record_features(
        recs[0]["pixels"],
        recs[0]["mask"],
        recs[0]["combined_mask"],
        np.asarray(recs[0]["background"]),
        np.asarray(recs[0]["combined_background"]),
        recs[0]["bbox"],
        DEFAULT_FAMILIES,
        nch,
    )
    got = block.iloc[0].to_numpy()
    want_arr = np.asarray(
        [np.nan if v is None else v for v in want], dtype=np.float64
    )
    np.testing.assert_array_equal(got, want_arr)
    assert isinstance(out, pd.DataFrame)
