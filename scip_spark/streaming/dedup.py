"""Streaming exact deduplication for corpus ingest.

Batch exact dedup (functions/dedup_queries.py `dedup_exact`) groups on
a content hash. The streaming twin keeps the first document per
fingerprint across micro-batches using Spark's dedup state store:

- ``dropDuplicatesWithinWatermark``: state for a fingerprint is
  EVICTED once the watermark passes its event time — bounded state, the
  only viable mode for an unbounded 100 TB/day ingest. Semantics: a
  re-crawled duplicate arriving within the watermark horizon is
  dropped; one arriving later is admitted again (downstream batch
  dedup sweeps those — the standard lambda split).
- ``dropDuplicates`` (no watermark) is exact forever but its state
  grows with distinct fingerprints; acceptable only for bounded
  backfills.

State lives in the configured state store (RocksDB provider for
spill-to-disk at scale; tests run the default HDFS-backed store).

The reference has no streaming surface (SURVEY §2.7 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scip_spark.functions.text import fingerprint


def exact_dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """First-wins exact dedup on the content fingerprint.

    With ``watermark`` set, uses bounded-state
    ``dropDuplicatesWithinWatermark``; with ``watermark=None``, exact
    unbounded-state ``dropDuplicates`` (backfill mode).
    """
    fp = stream.withColumn("fp", fingerprint(F.col(text_col)))
    if watermark is None:
        return fp.dropDuplicates(["fp"])
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
