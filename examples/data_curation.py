#!/usr/bin/env python
"""The round-11 curation toolkit end to end — what a pretraining-data
team runs between "raw crawl" and "training mix":

  1. LM-quality scoring       Kneser-Ney bigram surprisal (integer-exact)
  2. domain matching          DSIR-shaped importance weights vs a target
  3. dedup method validation  exact-vs-LSH agreement (recall/precision)
  4. contamination screen     keyspace-SHARDED Bloom (past-clamp regime)
  5. diversity selection      greedy k-center coreset over embeddings

Every step is a registered oracle-checked operator; this script just
chains them and prints a per-stage summary.

Run:  python examples/data_curation.py [SF_DIR]
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
        "data-curation",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    def run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    # 1. quality: docs whose mean KN surprisal lands in the worst decile
    #    are gibberish/OCR-noise candidates
    kn = run("kn_surprisal_scores").cache()
    cut = kn.approxQuantile("mean_kn_surprisal_fp", [0.9], 0.001)[0]
    n_docs = kn.count()
    n_flagged = kn.filter(F.col("mean_kn_surprisal_fp") >= cut).count()
    print(f"[1 quality ] {n_docs} docs, {n_flagged} above the p90 "
          f"KN-surprisal cut ({cut:.0f} on the 2^16 grid)")

    # 2. domain match: top DSIR importance = most target-domain-like
    dsir = run("dsir_importance_weights")
    top = dsir.orderBy(F.col("mean_importance_fp").desc()).limit(5).collect()
    print("[2 domain  ] top-5 target-like docs:",
          [(r["doc_id"], r["mean_importance_fp"]) for r in top])

    # 3. dedup validation: is the LSH candidate set safe to trust?
    ag = run("dedup_method_agreement").collect()[0]
    print(f"[3 dedup   ] true pairs {ag['n_true']}, candidates "
          f"{ag['n_candidates']}, recall {ag['recall_fp'] / 2**20:.4f}, "
          f"precision {ag['precision_fp'] / 2**20:.4f}")

    # 4. contamination: sharded Bloom screen (train fingerprints vs eval)
    scr = run("bloom_sharded_screen")
    hits = scr.filter(F.col("bloom_hit")).count()
    row = scr.limit(1).collect()[0]
    print(f"[4 contam  ] {hits} eval docs flagged; geometry m={row['m_bits']}"
          f" bits x {row['n_shards']} shards")

    # 5. diversity: the 4 most mutually-distant embedding exemplars
    core = run("coreset_kcenter").collect()
    print("[5 coreset ] selection:",
          [(r["sel_order"], r["vec_id"], r["radius_fp"]) for r in core])


if __name__ == "__main__":
    main()
