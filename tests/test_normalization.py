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
