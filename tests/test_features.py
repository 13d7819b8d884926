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
