#!/usr/bin/env python
"""Scale probe for the round-14 operators.

Expected shapes:
- ann_graph_topk: the graph build is the LSH-banded candidate join
  (same machinery as knn_graph_mutual — the jittered-replica caveat
  applies: copies keep their sign buckets, so 10x data gives ~100x
  candidate-join work BY DATA, not by plan), the degree caps are
  per-node windows, and the SEARCH cost is corpus-size-independent
  (fixed jobs over an (n_queries x beam) state). Probe at the reduced
  embedding factor like the other embedding-pair ops.
- zarr_schema_synthesis / imaging_feature_checksum are fixture/fixed-n
  by construction (sf-invariant) — nothing to probe.
- dedup_substring_spans' r14 fold was probed with full shuffle-byte
  decomposition this round (see SCALE_PROBE.md round-14 section).

Usage: python tools/probe_r14.py [N] [sf_dir]   (default N=10, sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_probe import replicate  # noqa: E402
from scip_spark.session import get_spark  # noqa: E402

OPS = ["ann_graph_topk"]


def time_op(spark, fn, sf_dir: str, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-r14", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    big = replicate(spark, sf_dir, n, "/tmp/probe_r14_big")
    for name in OPS:
        fn = REGISTRY[name].fn
        t1 = time_op(spark, fn, sf_dir)
        tn = time_op(spark, fn, big)
        print(f"{name}: 1x={t1:.2f}s {n}x={tn:.2f}s r{n}={tn / t1:.1f}")


if __name__ == "__main__":
    main()
