#!/usr/bin/env python
"""Scale probe for the round-15 changes.

What changed and what could break at scale:

- **Session-shared relations** (queries.session_rel): the scale
  question is the PERSISTED FOOTPRINT — a stored relation that grew
  super-linearly in the corpus would turn the materialized-view reuse
  into a memory hazard. The probe reports rows + cached bytes of the
  shared embedding candidate-pair relation and the document LSH pair
  set at 1x and Nx: both are candidate-bounded (id pairs + a double,
  never embeddings/text), so bytes must track candidate counts, and
  the jittered-replica artifact (copies keep their sign buckets →
  ~N² candidates BY DATA) is the documented exception, not a plan
  property.
- **Graph-ANN entry selection** (lsh_entry_points): one groupBy over
  the corpus + a ≤64-row driver Gonzalez — wall must stay ~flat vs
  the old k sequential whole-corpus passes which scaled with N·k.
- **Exact joins with injected shared tok**: same machinery as the
  audited r12 probes; the injected relation must not change the
  disjoint-vocabulary scaling of the candidate join (reduced factor —
  see scale_probe.py's replica caveats).

Usage: python tools/probe_r15.py [N] [sf_dir]   (default N=10, sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_probe import replicate, replicate_perturbed_docs  # noqa: E402
from scip_spark.session import get_spark  # noqa: E402


def cached_bytes(spark) -> int:
    sc = spark.sparkContext
    return sum(r.memSize() + r.diskSize() for r in
               sc._jsc.sc().getRDDStorageInfo())


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-r15", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    import scip_spark.entry_queries  # noqa: F401
    from pyspark.sql import functions as F
    from scip_spark.functions.similarity import lsh_entry_points
    from scip_spark.functions.similarity_queries import _shared_pairs
    from scip_spark.functions.dedup_queries import (
        _shared_doc_tokens,
        _shared_lsh_pairs,
    )
    from scip_spark.queries import REGISTRY

    big = replicate(spark, sf_dir, n, "/tmp/probe_r15_big")
    pbig = replicate_perturbed_docs(spark, sf_dir, n, "/tmp/probe_r15_pbig")

    # --- shared-relation footprint: rows + cached bytes, 1x vs Nx ----
    for label, d in [("1x", sf_dir), (f"{n}x", big)]:
        b0 = cached_bytes(spark)
        t0 = time.time()
        pr = _shared_pairs(spark, d).count()
        lr = _shared_lsh_pairs(spark, d).count()
        tk = _shared_doc_tokens(spark, d).count()
        dt = time.time() - t0
        mb = (cached_bytes(spark) - b0) / 1e6
        print(f"shared rels @ {label}: emb_pairs={pr} doc_pairs={lr} "
              f"tok={tk} build={dt:.1f}s cached+={mb:.1f}MB")

    # --- entry selection: one groupBy + driver Gonzalez -------------
    for label, d in [("1x", sf_dir), (f"{n}x", big)]:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        t0 = time.time()
        ids = lsh_entry_points(emb)
        print(f"lsh_entry_points @ {label}: {time.time() - t0:.2f}s "
              f"({len(ids)} entries)")

    # --- end-to-end ops on the replicas ------------------------------
    def timed(name, d, passes=2):
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    for name, d1, dn in [
        ("ann_graph_topk", sf_dir, big),
        ("dedup_keep_best_quality", sf_dir, big),
        ("dedup_setsim_join", sf_dir, pbig),
        ("dedup_containment_pairs", sf_dir, pbig),
    ]:
        t1 = timed(name, d1)
        tn = timed(name, dn)
        print(f"{name}: 1x={t1:.2f}s {n}x={tn:.2f}s r{n}={tn / t1:.1f}")


if __name__ == "__main__":
    main()
