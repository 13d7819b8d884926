#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents table:

  quality floor → exact dedup → MinHash-LSH near-dup clustering →
  keep one representative per cluster → cleaned-corpus parquet +
  per-stage retention report.

Run:  python examples/corpus_pipeline.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_clean"

    from scip_spark.session import get_spark

    spark = get_spark("corpus-pipeline")
    from scip_spark.functions.dedup import connected_components, lsh_candidate_pairs
    from scip_spark.functions.text import fingerprint, lang_id, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality floor + language gate (pure column algebra, one scan)
    scored = docs.select(
        "*",
        F.size(tokens("text")).alias("n_tokens"),
        lang_id("text").alias("pred_lang"),
    )
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("pred_lang") != "unknown"))
    n1 = kept.count()

    # 2. exact dedup: one representative per normalized fingerprint
    exact = (
        kept.withColumn("fp", fingerprint("text"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n2 = exact.count()

    # 3. near-dup clustering: LSH candidate pairs → connected
    #    components → keep the cluster minimum
    pairs = lsh_candidate_pairs(exact)
    clusters = connected_components(pairs)
    drop = clusters.filter(F.col("node_id") != F.col("component")).select(
        F.col("node_id").alias("doc_id")
    )
    final = exact.join(drop, "doc_id", "left_anti")
    n3 = final.count()

    # 4. training-set assembly: stable split assignment + fixed-budget
    #    shard packing (train split only), partitioned output
    from scip_spark.functions.corpus import pack_shards, split_assign

    assigned = split_assign(final)
    packed = pack_shards(
        assigned.filter(F.col("split") == "train"), budget=200_000
    )
    n_shards = packed.agg(F.countDistinct("shard_id")).collect()[0][0]

    holdout = assigned.filter(F.col("split") != "train").withColumn(
        "shard_id", F.lit(-1).cast("long")
    )
    packed.unionByName(holdout).drop("n_tokens").write.mode(
        "overwrite"
    ).partitionBy("split").parquet(out)
    print(
        f"corpus: {n0} raw -> {n1} quality ({n1 / n0:.1%}) -> "
        f"{n2} exact-deduped -> {n3} near-dedup survivors -> "
        f"{n_shards} train shards -> {out}"
    )


if __name__ == "__main__":
    main()
