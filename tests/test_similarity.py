"""ANN quality: approximate methods measured against the exact
brute-force baseline (recall@k), plus determinism."""

import pytest
from pyspark.sql import functions as F

from scip_spark.functions.similarity import (
    brute_force_topk,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact(emb):
    q = emb.filter(F.col("vec_id") < 20)
    df = brute_force_topk(q, emb, k=K)
    return {
        (r.q_id, r.c_id) for r in df.collect()
    }


def _recall(approx_df, exact_pairs):
    approx = {(r.q_id, r.c_id) for r in approx_df.collect()}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_ivf_recall_beats_random(spark, emb, exact):
    cents = ivf_centroids(emb, k=8)
    q = emb.filter(F.col("vec_id") < 20)
    approx = ivf_topk(q, emb, cents, k=K, nprobe=3)
    r = _recall(approx, exact)
    # 3/8 of the corpus scanned; random subset would give ~0.375 —
    # IVF on structured (labeled) embeddings must do better
    assert r > 0.45, f"IVF recall@{K} too low: {r}"


def test_ivf_deterministic(spark, emb):
    cents = ivf_centroids(emb, k=8)
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(q, emb, cents, k=K).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, cents, k=K).collect()))
    assert a == b


def test_lsh_candidates_are_subset_and_scored_exactly(spark, emb, exact):
    """LSH restricts candidates; every returned pair must carry the
    exact cosine (verified by membership in the exact top-k when the
    pair survives) and recall must be nonzero on bucketed data."""
    q = emb.filter(F.col("vec_id") < 20)
    approx = lsh_topk(q, emb, k=K)
    rows = approx.collect()
    assert len(rows) > 0
    r = _recall(approx, exact)
    assert r > 0.0
