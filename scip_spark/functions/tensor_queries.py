"""Oracle-paired relational analogues of the reference's tensor
aggregations (SURVEY §2.4) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scip_spark.queries import register, tbl

DEC10 = T.DecimalType(38, 10)


@register(
    "mean_tensor_by_group",
    """
    WITH x AS (
      SELECT label, pos, emb[pos] AS v
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(pos)
    )
    SELECT label, CAST(pos AS INT) AS pos,
           list_reduce(list_sort(list(v)), (x, y) -> x + y) / COUNT(*) AS mean_val,
           COUNT(*) AS n
    FROM x GROUP BY label, pos
    """,
    doc="A1 mean-image-per-group: tensor-slot partial+final aggregation. "
    "Sum is a fold over value-sorted doubles — a deterministic summation "
    "order both engines reproduce bit-exactly (decimal casts hit "
    "HALF_UP-vs-HALF_EVEN disagreement at the scale boundary).",
)
def mean_tensor_by_group(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    exploded = emb.select("label", F.posexplode(e).alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).cast("int").alias("pos"), "v"
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list("v")), F.lit(0.0), lambda a, x: a + x
    )
    return exploded.groupBy("label", "pos").agg(
        (fold / F.count("*")).alias("mean_val"),
        F.count("*").alias("n"),
    )


@register(
    "masked_extent_by_group",
    """
    WITH x AS (
      SELECT label, emb[pos] AS v
      FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings) e,
           UNNEST(generate_series(1, len(emb))) AS u(pos)
    )
    SELECT label,
           COALESCE(MIN(CASE WHEN v > 0 THEN v END), MIN(v)) AS masked_min,
           COALESCE(MAX(CASE WHEN v > 0 THEN v END), MAX(v)) AS masked_max,
           COUNT(*) AS n_values
    FROM x GROUP BY label
    """,
    doc="A2 masked min/max extents with unmasked fallback "
    "(reference src/scip/normalization/quantile_normalization.py:25-64)",
)
def masked_extent_by_group(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    x = emb.select("label", F.explode(e).alias("v"))
    masked = F.when(F.col("v") > 0, F.col("v"))
    return x.groupBy("label").agg(
        F.coalesce(F.min(masked), F.min("v")).alias("masked_min"),
        F.coalesce(F.max(masked), F.max("v")).alias("masked_max"),
        F.count("*").alias("n_values"),
    )
