"""Corpus interchange IO: JSON-Lines in, sharded JSON-Lines out.

JSONL is the de-facto wire format for LLM training corpora (crawl
dumps, filtered corpus releases, eval sets). Two needs beyond plain
``spark.read.json``:

- **Ingest is adversarial**: raw dumps contain truncated lines, bad
  escapes and schema drift. ``read_jsonl_corpus`` reads PERMISSIVE
  with an explicit schema plus a ``_corrupt_record`` rescue column, so
  a 100 TB ingest never dies on one bad line and the bad lines are
  countable/quarantinable instead of silently dropped (DROPMALFORMED)
  or fatal (FAILFAST).
- **Export wants bounded shards**: trainers stream shards of roughly
  equal token budget. ``write_jsonl_shards`` reuses pack_shards'
  distributed prefix sum and writes one JSONL directory per shard id
  via partitionBy — no driver-side file juggling.

Scale notes: schema-explicit JSON parsing is JVM-side (no sampling
pass over 100 TB to infer a schema — inference reads the data TWICE);
the corrupt-record column only materializes for lines that fail to
parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """Permissive JSONL ingest with a rescue column.

    Returns the schema's columns plus ``_corrupt_record`` (NULL for
    clean rows, the raw line for unparseable ones). Callers split with
    ``df.filter("_corrupt_record IS NULL")`` /
    ``df.filter("_corrupt_record IS NOT NULL")`` to route quarantine.
    """
    # StructType.add mutates in place — never .add() onto the caller's
    # (possibly module-global) schema
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_jsonl_corpus_stream(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA, **options
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_corpus`: the same permissive
    schema-explicit parse over a FILE STREAM (``readStream.json``), so a
    continuously-landing crawl directory ingests incrementally with the
    corrupt-record quarantine intact. Extra ``options`` reach the file
    source — pass ``maxFilesPerTrigger=N`` to bound micro-batch size;
    parity with the batch reader is asserted in tests/test_streaming.py."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    reader = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def corrupt_stats(df: DataFrame, probe_col: str = "doc_id") -> DataFrame:
    """(n_rows, n_corrupt, n_with_id) of a permissive JSONL read — the
    ingest health check gating a pipeline run. ``probe_col`` must be a
    real schema column: Spark refuses queries whose only referenced
    file column is the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the probe keeps the
    aggregation legal without caching the whole parse."""
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("_corrupt_record").cast("long").alias("n_corrupt"),
        F.count(probe_col).cast("long").alias("n_with_id"),
    )


def write_jsonl_shards(
    docs: DataFrame,
    output: str,
    budget: int = 1_000_000,
    cost_col: str = "n_chars",
    key_col: str = "doc_id",
) -> int:
    """Pack documents into ~``budget``-cost shards (distributed prefix
    sum, corpus.pack_shards) and write one JSONL directory per shard:
    ``output/shard_id=N/part-*.json``. Returns the shard count."""
    from scip_spark.functions.corpus import pack_shards

    packed = pack_shards(docs, budget=budget, cost_col=cost_col, key_col=key_col)
    packed.write.mode("overwrite").partitionBy("shard_id").json(output)
    # cheap: shard ids are dense integers bounded by total_cost/budget
    return packed.select("shard_id").distinct().count()
