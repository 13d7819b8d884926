#!/usr/bin/env python
"""The round-12 quality-gate pipeline end to end — the first-pass
document funnel a pretraining-data team runs on raw crawl BEFORE the
expensive dedup/mixing stages:

  1. rule filters       Gopher (Rae et al.) + C4 (Raffel et al.) bundles
  2. LM filter          stupid-backoff trigram scores (Brants et al.)
  3. dedup w/ quality   keep the highest-quality member per LSH cluster
  4. drift watch        EWMA anomaly flags over the ingest series
  5. embedding prep     JL ±1 projection + exact covariance (PCA input)

Every step is a registered oracle-checked operator; this script just
chains them and prints the funnel.

Run:  python examples/quality_gate.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from scip_spark.session import get_spark

    spark = get_spark(
        "quality-gate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    def run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    gopher = run("quality_gopher_rules").select("doc_id", F.col("keep").alias("g"))
    c4 = run("quality_c4_filters").select("doc_id", F.col("keep").alias("c"))
    n_docs = gopher.count()
    n_gopher = gopher.filter("g").count()
    n_c4 = c4.filter("c").count()
    print(f"docs: {n_docs}  pass-gopher: {n_gopher}  pass-c4: {n_c4}")

    lm = run("trigram_backoff_scores")
    lo, hi = lm.agg(F.min("score_fp"), F.max("score_fp")).first()
    print(f"stupid-backoff scores on eval split: n={lm.count()} range=[{lo},{hi}]")

    keep = run("dedup_keep_best_quality")
    print(
        "dedup keep-best: keepers "
        f"{keep.filter('keep').count()}/{keep.count()} "
        f"(clusters {keep.select('root').distinct().count()})"
    )

    ewma = run("ewma_anomaly_days")
    print(f"ingest-series anomaly days: {ewma.filter('anomaly').count()}")

    jl = run("embedding_jl_projection")
    cov = run("embedding_covariance_fp")
    print(
        f"JL projection rows: {jl.count()} (16 dims/vec); "
        f"covariance cells: {cov.count()} (64x64 upper triangle)"
    )


if __name__ == "__main__":
    main()
