"""Embedding similarity search (ANN) over ``array<float>`` columns.

Baseline: brute-force cosine top-k — a broadcast-joined cross product
with the dot product evaluated as codegen'd array algebra
(``zip_with`` + ``aggregate``), no Python in the loop.

Scale path: sign-random-projection LSH (Charikar hyperplane hashing)
with ±1 hyperplane weights derived deterministically from md5, so
bucket assignment is reproducible across engines and runs. At 100 TB
the bucketed join replaces the N×M cross product: both sides shuffle
on the bucket id only, and AQE handles hot buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8  # LSH bucket bits


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum (bit-reproducible, same as the oracle's
    list_reduce)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: sign of a bit of
    md5('plane|dim'). Reproducible anywhere md5 exists."""
    planes = []
    for j in range(n_planes):
        w = []
        for d in range(dim):
            h = hashlib.md5(f"{j}|{d}".encode()).hexdigest()
            w.append(1.0 if int(h[:4], 16) & 1 else -1.0)
        planes.append(w)
    return planes


def lsh_bucket(emb: Column, n_planes: int = N_PLANES, dim: int = 64) -> Column:
    """Sign-projection bucket id in [0, 2**n_planes)."""
    planes = plane_weights(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for j, w in enumerate(planes):
        warr = F.array(*[F.lit(x) for x in w])
        proj = _fold_sum(F.zip_with(emb, warr, lambda x, y: x * y))
        bucket = bucket + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0)).cast("long")
    return bucket


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (the small
    side); candidates stream — at scale this is one pass over the
    corpus with no shuffle until the per-query top-k aggregation."""
    from pyspark.sql.window import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(emb_col).cast("array<double>").alias("q_emb")
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"), F.col(emb_col).cast("array<double>").alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "sim")
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within the bucket. Recall measured in
    tests against brute_force_topk."""
    from pyspark.sql.window import Window as W

    def with_bucket(df, ident, embout):
        return df.select(
            F.col(id_col).alias(ident),
            F.col(emb_col).cast("array<double>").alias(embout),
            lsh_bucket(F.col(emb_col).cast("array<double>"), dim=dim).alias("bucket"),
        )

    q = with_bucket(queries, "q_id", "q_emb")
    c = with_bucket(candidates, "c_id", "c_emb")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "sim")
    )
