#!/usr/bin/env python
"""The ANN ladder over the embeddings table — every index family the
engine ships, cheapest-to-build first, with measured recall@5 against
the exact brute-force baseline:

  brute force  →  LSH  →  multi-probe LSH  →  IVF  →  PQ  →
  IVF-PQ (raw codes)  →  IVF-PQ (residual codes)  →  OPQ

Pick by corpus size: brute force streams the corpus once per query
batch (fine while the batch is small); LSH/IVF prune the scan; the PQ
families shrink the scanned BYTES (m byte codes per vector instead of
4*dim floats) — the memory-resident layout billion-vector search needs.

Run:  python examples/ann_search.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from scip_spark.session import get_spark

    spark = get_spark("ann-ladder")
    from scip_spark.functions.similarity import (
        brute_force_topk,
        ivf_centroids,
        ivf_topk,
        ivfpq_residual_topk,
        ivfpq_topk,
        lsh_multiprobe_topk,
        lsh_topk,
        opq_fit,
        opq_rotate,
        pq_fit,
        pq_fit_residual,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 20)
    k = 5

    exact = {
        (r.q_id, r.c_id) for r in brute_force_topk(queries, emb, k=k).collect()
    }

    cents = ivf_centroids(emb, k=8)
    cb = pq_fit(emb, m=8, ksub=64)
    cb_res, anchors = pq_fit_residual(emb, cents, m=8, ksub=64)
    R, cb_opq = opq_fit(emb, m=8, ksub=64)
    rotated = emb.transform(lambda d: opq_rotate(d, R)).select(
        "vec_id", F.col("emb_rot").alias("embedding")
    )

    ladder = [
        ("lsh", lambda: lsh_topk(queries, emb, k=k)),
        ("lsh-multiprobe", lambda: lsh_multiprobe_topk(queries, emb, k=k)),
        ("ivf", lambda: ivf_topk(queries, emb, cents, k=k, nprobe=3)),
        ("pq", lambda: pq_topk(queries, emb, cb, k=k, rerank=100)),
        ("ivf-pq", lambda: ivfpq_topk(queries, emb, cents, cb, k=k)),
        (
            "ivf-pq-residual",
            lambda: ivfpq_residual_topk(queries, emb, cents, cb_res, anchors, k=k),
        ),
        (
            "opq",
            lambda: pq_topk(
                rotated.filter(F.col("vec_id") < 20), rotated, cb_opq, k=k, rerank=100
            ),
        ),
    ]
    print(f"{'index':>16}  recall@{k}   wall(s)")
    for name, fn in ladder:
        t0 = time.time()
        approx = {(r.q_id, r.c_id) for r in fn().collect()}
        dt = time.time() - t0
        recall = len(approx & exact) / len(exact)
        print(f"{name:>16}  {recall:8.2f}  {dt:7.2f}")


if __name__ == "__main__":
    main()
