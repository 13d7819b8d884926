"""Operators must survive empty inputs (a filter can legitimately kill
every record of a partition at scale)."""

from pyspark.sql import functions as F

from scip_spark.operators.features import extract_features
from scip_spark.operators.masking import apply_mask, compute_filters, get_mask
from scip_spark.operators.normalization import group_extents, quantile_normalization
from scip_spark.operators.segmentation import to_events


def test_empty_event_frame_through_stages(spark, full_events_df):
    empty = full_events_df.filter(F.lit(False))
    assert compute_filters(empty, "std").count() == 0
    assert get_mask(empty, "circle").count() == 0
    assert apply_mask(empty).count() == 0
    assert group_extents(empty).count() == 0
    assert quantile_normalization(empty).count() == 0
    assert to_events(empty).count() == 0
    assert extract_features(empty, nchannels=3).count() == 0


def test_all_null_pixels_through_features(spark, full_events_df):
    nulled = full_events_df.withColumn("pixels", F.lit(None).cast("array<float>"))
    out = extract_features(nulled, nchannels=3).toPandas()
    assert len(out) == 10  # metadata rows survive, features null
