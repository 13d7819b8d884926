"""The reference's best oracle test (test_quantile_normalization.py:24-57):
group extents [0,99] for full masks, [22,77] for border-eroded masks;
normalized pixels land in [0,1]."""

import numpy as np

from scip_spark.operators.normalization import group_extents, quantile_normalization
from scip_spark.schema import decode_tensor


def test_group_extents_full(full_events_df):
    rows = group_extents(full_events_df).collect()
    assert len(rows) == 2 * 3  # 2 groups × 3 channels
    for r in rows:
        assert r.gmin == 0.0 and r.gmax == 99.0


def test_group_extents_partial(partial_events_df):
    rows = group_extents(partial_events_df).collect()
    for r in rows:
        assert r.gmin == 22.0 and r.gmax == 77.0


def test_normalized_range(full_events_df):
    out = quantile_normalization(full_events_df).toPandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        a = decode_tensor(r.pixels, r.pixels_shape)
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert a.max() > 0.5  # actually rescaled, not zeroed


def test_empty_channel_mask_skipped(spark):
    """Reference fold semantics: a masked record whose channel mask is
    empty contributes nothing to that channel's extent (it does NOT
    fall back to unmasked pixels)."""
    import numpy as np

    from scip_spark.schema import EVENT_SCHEMA, events_to_pandas

    tile = np.arange(100, dtype=np.float32).reshape(10, 10)
    m_full = np.ones((1, 10, 10), bool)
    m_empty = np.zeros((1, 10, 10), bool)
    recs = [
        {"path": "a", "group": "g", "object_number": 0,
         "pixels": tile[None] * 0 + 50, "mask": m_full},   # masked vals = 50
        {"path": "b", "group": "g", "object_number": 1,
         "pixels": tile[None], "mask": m_empty},           # empty mask → skipped
    ]
    df = spark.createDataFrame(events_to_pandas(recs), schema=EVENT_SCHEMA)
    rows = group_extents(df).collect()
    assert len(rows) == 1
    assert rows[0].gmin == 50.0 and rows[0].gmax == 50.0  # record b ignored


def test_precomputed_extents_match_decode_path(spark, partial_events_df, full_events_df):
    """group_extents' pure-JVM fast path over ch_min/ch_max (emitted by
    add_filter_sum(with_extents=True)) must reproduce the decode path
    exactly — including empty-mask-channel skips and soft-deleted rows
    contributing nothing."""
    from scip_spark.operators.threshold_filter import (
        add_filter_sum,
        population_filter,
    )

    summed = add_filter_sum(partial_events_df, with_extents=True)
    assert "ch_min" in summed.columns
    fast = {
        (r.group, r.channel): (r.gmin, r.gmax)
        for r in group_extents(summed).collect()
    }
    slow = {
        (r.group, r.channel): (r.gmin, r.gmax)
        for r in group_extents(summed.drop("ch_min", "ch_max")).collect()
    }
    assert fast == slow and len(fast) > 0
    assert all(v == (22.0, 77.0) for v in fast.values())

    # maskless records (mask column null) contribute FULL-pixel extents
    # on both paths
    summed_full = add_filter_sum(full_events_df, with_extents=True)
    fast_full = {
        (r.group, r.channel): (r.gmin, r.gmax)
        for r in group_extents(summed_full).collect()
    }
    slow_full = {
        (r.group, r.channel): (r.gmin, r.gmax)
        for r in group_extents(
            summed_full.drop("ch_min", "ch_max")
        ).collect()
    }
    assert fast_full == slow_full
    assert all(v == (0.0, 99.0) for v in fast_full.values())

    # soft-deleted rows contribute nothing on either path (this fixture
    # has identical filter_sums → σ=0 → the filter drops every record)
    filtered = population_filter(partial_events_df, with_extents=True)
    assert group_extents(filtered).collect() == []
    assert group_extents(filtered.drop("ch_min", "ch_max")).collect() == []

    # end-to-end: normalization over the extent-carrying frame drops the
    # (stale, pre-normalization) extent columns from its output
    normed = quantile_normalization(filtered)
    assert "ch_min" not in normed.columns and "ch_max" not in normed.columns
    out = normed.toPandas()
    for _, r in out.iterrows():
        if r.pixels is None:
            continue
        a = decode_tensor(r.pixels, r.pixels_shape)
        assert a.min() >= 0.0 and a.max() <= 1.0
