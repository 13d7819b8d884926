"""Structured Streaming surface (beyond the reference — SURVEY §2.7).

Batch operators get streaming twins over the events stream: tumbling /
sliding window aggregation with watermarked late-data handling, and
session windows. The batch analogues (tumbling_window_events,
sessionize_events in scip_spark.queries) share the same column logic,
so correctness of the windowing math is oracle-checked in batch and
the streaming path is exercised with the memory sink in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """Parquet-directory stream (for tests/local runs; production swaps
    in Kafka with the same downstream plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """session_window-based sessionization — the streaming twin of the
    batch lag+cumsum sessionize_events query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append") -> None:
    """Drive a bounded file stream to completion into a memory table.

    ``append`` emits a window only once the watermark passes it — the
    trailing windows of a bounded input are never flushed (correct
    streaming semantics). Use ``complete`` when a test needs every
    window materialized.
    """
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchase_click_join(
    events: DataFrame, events2: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding ``horizon``. Both sides are
    watermarked so the state store can expire old click state — the
    canonical funnel-attribution join."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events2.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""p_user = c_user
                AND click_ts <= purchase_ts
                AND click_ts >= purchase_ts - INTERVAL {horizon}"""
        ),
    )


def dedup_event_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup: drop re-deliveries of the same event_id
    arriving within the watermark horizon. State holds one entry per
    id seen in the horizon and is expired by the watermark — bounded
    memory on an unbounded stream, the streaming twin of the batch
    ``dedup_exact`` operator (at-least-once sources → exactly-once
    downstream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def write_exactly_once_parquet(stream_df: DataFrame, out_dir: str, checkpoint: str) -> None:
    """foreachBatch sink: idempotent per-epoch parquet writes keyed by
    batch id — re-delivered batches overwrite their own directory, so
    restarts cannot duplicate data."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
