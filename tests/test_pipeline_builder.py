"""Config-driven pipeline builder + sinks + multimodal plumbing."""

import os

import numpy as np
import pytest

from scip_spark.operators.features import feature_columns
from scip_spark.plans.pipeline import build
from scip_spark.sources.export import (
    export_channel_boundaries,
    export_labeled_masks,
    export_parquet,
    load_correction_images,
    save_correction_images,
)


def test_single_branch_pipeline(full_events_df):
    out = build(
        full_events_df,
        {
            "mask": {"methods": ["circle"]},
            "normalization": {"key": "group"},
            "feature_extraction": {"nchannels": 3, "families": ["bbox", "intensity"]},
        },
    ).toPandas()
    assert len(out) == 10
    cols = feature_columns(3, ["bbox", "intensity"])
    assert not out[cols].isna().any().any()


def test_multi_branch_keyed_join(full_events_df):
    """Multi-mask fan-out joins branch features on the record key —
    the J1 positional concat replacement. Branch columns get the
    method-name prefix (P9)."""
    out = build(
        full_events_df,
        {
            "mask": {"methods": ["circle", "otsu"]},
            "feature_extraction": {"nchannels": 3, "families": ["intensity"]},
        },
    ).toPandas()
    assert len(out) == 10
    assert any(c.startswith("feat_circle_") for c in out.columns)
    assert any(c.startswith("feat_otsu_") for c in out.columns)


def test_build_caches_handle_releases_persisted_relations(spark, full_events_df):
    """build() persists the mask fan-out upstream and (per branch) the
    population filter's summed relation; those must outlive build for
    the caller's action, so a BuildCaches handle takes ownership and
    releases every block afterwards — without it each pipeline build
    leaks cached relations for the session lifetime (ADVICE r6)."""
    from scip_spark.plans.pipeline import BuildCaches

    spark.catalog.clearCache()

    def n_cached_blocks():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # earlier tests' localCheckpoint blocks are NOT in the relation
    # cache (clearCache can't drop them) and are GC'd at arbitrary
    # times — assert relative to this baseline, not absolute zero
    baseline = n_cached_blocks()
    caches = BuildCaches()
    out = build(
        full_events_df,
        {
            "mask": {"methods": ["circle", "otsu"]},
            "filter": {"channel": 0},
            "feature_extraction": {"nchannels": 3, "families": ["intensity"]},
        },
        caches=caches,
    )
    # fused multi-branch plan: ONE persisted relation serves the stats
    # action, the extent aggs and the feature pass (r13 verdict #2 —
    # versus fan-out cache + one summed relation per branch before)
    assert len(caches.frames) == 1
    assert len(out.toPandas()) == 10  # terminal action consumes the caches

    assert n_cached_blocks() >= 1
    caches.unpersist(blocking=True)
    assert n_cached_blocks() <= baseline
    assert caches.frames == []

    # legacy branch-and-join plan (mask.fuse=False): fan-out cache +
    # one summed relation per mask branch
    caches = BuildCaches()
    out = build(
        full_events_df,
        {
            "mask": {"methods": ["circle", "otsu"], "fuse": False},
            "filter": {"channel": 0},
            "feature_extraction": {"nchannels": 3, "families": ["intensity"]},
        },
        caches=caches,
    )
    assert len(caches.frames) == 3
    assert len(out.toPandas()) == 10
    caches.unpersist(blocking=True)


def test_duplicate_mask_methods_collapse(full_events_df):
    """r14 review: duplicate method names must collapse (the legacy
    branches dict did this implicitly; the fused schema would otherwise
    carry duplicate suffixed columns and fail AMBIGUOUS_REFERENCE)."""
    out = build(
        full_events_df,
        {
            "mask": {"methods": ["circle", "circle", "otsu"]},
            "filter": {"channel": 0},
            "feature_extraction": {"nchannels": 3, "families": ["bbox"]},
        },
    ).toPandas()
    assert len(out) == 10
    assert any(c.startswith("feat_circle_") for c in out.columns)
    assert any(c.startswith("feat_otsu_") for c in out.columns)
    assert len(set(out.columns)) == len(out.columns)


def test_fused_equals_legacy_branch_plan(full_events_df):
    """The fused single-pass multi-branch plan (r13 verdict #2) is
    bit-identical to the legacy branch-and-join plan on the full config
    (filter + normalization + all five families): same batch closures,
    same population statistic, same group extents."""
    import numpy as np

    cfg = {
        "mask": {"methods": ["circle", "otsu"]},
        "filter": {"channel": 0},
        "normalization": {"key": "group"},
        "feature_extraction": {"nchannels": 3, "families": None},
    }
    legacy_cfg = dict(cfg)
    legacy_cfg["mask"] = dict(cfg["mask"], fuse=False)
    a = build(full_events_df, cfg).toPandas()
    b = build(full_events_df, legacy_cfg).toPandas()
    a = a.sort_values("object_number").reset_index(drop=True)
    b = b.sort_values("object_number").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    feat = [c for c in a.columns if c.startswith("feat_")]
    np.testing.assert_array_equal(
        a[feat].to_numpy(float), b[feat].to_numpy(float)
    )
    for m in a.regions, b.regions:
        assert m.notna().all()
    assert [list(x) for x in a.regions] == [list(x) for x in b.regions]


def test_duplicate_branch_determinism_via_builder(full_events_df):
    """Two identical mask branches must agree column-for-column (the
    reference's duplicate-branch oracle, test_main.py:52, without
    positional-concat fragility)."""
    from scip_spark.operators.masking import apply_mask, get_mask
    from scip_spark.operators.features import extract_features

    cached = full_events_df.cache()
    a = extract_features(apply_mask(get_mask(cached, "circle")), 3, ["intensity"]).toPandas()
    b = extract_features(apply_mask(get_mask(cached, "circle")), 3, ["intensity"]).toPandas()
    a = a.sort_values("object_number").reset_index(drop=True)
    b = b.sort_values("object_number").reset_index(drop=True)
    cols = feature_columns(3, ["intensity"])
    np.testing.assert_array_equal(a[cols].to_numpy(float), b[cols].to_numpy(float))


def test_sinks(spark, full_events_df, tmp_path):
    from scip_spark.operators.masking import get_mask
    from scip_spark.operators.normalization import group_extents

    # parquet sink roundtrip
    out = str(tmp_path / "pq")
    export_parquet(full_events_df.select("path", "group", "object_number"), out)
    assert spark.read.parquet(out).count() == 10

    # labeled masks
    masked = get_mask(full_events_df, "circle")
    n = export_labeled_masks(masked, str(tmp_path / "masks"), ["group", "object_number"])
    assert n == 10
    arr = np.load(str(tmp_path / "masks" / "one_0.npy"))
    assert arr.shape == (3, 10, 10)

    # channel boundaries csv
    csv = export_channel_boundaries(group_extents(full_events_df), str(tmp_path / "bounds"))
    assert os.path.exists(csv)

    # correction image pickle roundtrip
    mu = {"one": np.ones((3, 4, 4), np.float32)}
    p = save_correction_images(mu, str(tmp_path / "corr"))
    back = load_correction_images(p)
    np.testing.assert_array_equal(back["one"], mu["one"])


def test_multimodal_plumbing(spark):
    import pandas as pd

    from scip_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
        decoder_stub,
        fake_image_decoder,
        frame_sample,
    )

    rows = [
        {
            "media_id": i,
            "kind": "image" if i % 2 else "video",
            "payload": bytes([i]) * 16,
            "mime": "image/png",
            "meta_width": 8,
            "meta_height": 8,
            "meta_duration_s": float(i),
        }
        for i in range(6)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    out = decode_features(df, decode=fake_image_decoder, resize=(4, 4)).toPandas()
    assert len(out) == 6
    assert all(list(s) == [4, 4, 3] for s in out.px_shape)
    # deterministic: same payload -> same stats
    out2 = decode_features(df, decode=fake_image_decoder, resize=(4, 4)).toPandas()
    assert list(out.px_mean) == list(out2.px_mean)

    # stub decoder refuses politely
    with pytest.raises(Exception):
        decode_features(df).toPandas()

    frames = frame_sample(df, every_s=1.0).toPandas()
    # media_id=5 (video, 5s) contributes 5 frames; id=0 → 1 frame
    assert len(frames[frames.media_id == 5]) == 5
    assert len(frames[frames.media_id == 0]) == 1


def test_export_anndata_distributed_fake_factory(full_events_df, tmp_path):
    """S11: the anndata sink writes per-partition INSIDE tasks (no
    driver collect). A fake factory — shipped by value via cloudpickle —
    proves the executor-side path runs end-to-end without the optional
    dependency and that every row is written exactly once."""
    import glob
    import json
    import os

    from scip_spark.operators.features import extract_features
    from scip_spark.sources.export import export_anndata

    out_dir = str(tmp_path / "h5ad")

    def fake_factory():
        class FakeAnnData:
            def __init__(self, X, obs):
                self.X = X
                self.obs = obs

            def write(self, path):
                with open(path, "w") as f:
                    json.dump(
                        {"n_obs": len(self.obs), "n_feat": self.X.shape[1]}, f
                    )

        class FakeModule:
            AnnData = FakeAnnData

        return FakeModule

    feats = extract_features(full_events_df, nchannels=3)
    n = export_anndata(feats, out_dir, anndata_factory=fake_factory)
    assert n == 10
    files = sorted(glob.glob(os.path.join(out_dir, "features.*.h5ad")))
    assert files  # at least one non-empty partition wrote a file
    total = 0
    for fp in files:
        with open(fp) as f:
            payload = json.load(f)
        assert payload["n_feat"] > 0
        total += payload["n_obs"]
    assert total == 10


def test_export_anndata_no_driver_collect():
    """Guard: the sink's code path must not fall back to toPandas on the
    driver (the round-1 implementation did, a driver OOM at scale)."""
    import inspect

    from scip_spark.sources import export

    src = inspect.getsource(export.export_anndata)
    assert "toPandas" not in src
    assert "mapInPandas" in src
