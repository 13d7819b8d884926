"""Structured Streaming twins: a bounded file stream must reproduce the
batch windowed aggregation exactly."""

import pytest

from scip_spark.queries import load_events
from scip_spark.streaming.windows import (
    read_event_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events.parquet is TIMESTAMP(NANOS); stage a micros copy for the
    streaming reader (production would configure the source format).
    Multi-file, arbitrary order — exercises multi-batch + watermark."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_events(spark, SF).repartition(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def events_single_file(spark, tmp_path_factory):
    """One file = one batch: no row is ever behind the watermark, so
    streaming output must equal the batch aggregation exactly."""
    d = str(tmp_path_factory.mktemp("events_stream1"))
    load_events(spark, SF).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_tumbling_stream_matches_batch(spark, events_single_file):
    stream = read_event_stream(spark, events_single_file)
    run_to_memory(tumbling_counts(stream), "tumbling_out", mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("select * from tumbling_out").collect()
    }
    from pyspark.sql import functions as F

    batch = (
        load_events(spark, SF)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in batch.collect()
    }
    assert got == want


def test_sliding_and_session_streams_run(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    run_to_memory(sliding_counts(stream), "sliding_out")
    assert spark.sql("select count(*) from sliding_out").collect()[0][0] > 0

    stream2 = read_event_stream(spark, events_dir)
    run_to_memory(session_counts(stream2), "session_out")
    n_sessions = spark.sql("select count(*) from session_out").collect()[0][0]
    assert n_sessions > 0


def test_stateful_user_profiles(spark, events_dir):
    """applyInPandasWithState: final per-user profile must equal the
    batch aggregate regardless of micro-batch slicing (4 files)."""
    from pyspark.sql import functions as F

    from scip_spark.streaming.stateful import user_profiles

    stream = read_event_stream(spark, events_dir)
    run_to_memory(user_profiles(stream), "profiles_out", mode="update")
    # update mode emits one row per user per batch; the LAST row per
    # user is the final state
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM profiles_out) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final}
    batch = (
        load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch}
    assert got == want
