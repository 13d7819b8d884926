#!/usr/bin/env python
"""Scale probe for the round-11 operator: keyspace-sharded Bloom.

Reuses the r10 documents replica (verbatim N× texts, re-keyed doc
ids). Expected shape: the build is scan-bound — per-row md5 hashing +
explode collapses MAP-SIDE to ≤ S·m/32 partial words; the KMV auto-
sizer adds one TakeOrdered bottom-k. Distinct texts stay constant
under verbatim replication, so S and m stay fixed while the scanned
rows grow N× — r100 ≈ linear-in-rows on fixed cores, with the filter
relation (and hence the probe broadcast) unchanged. The S-GROWTH
regime (more distinct keys → more shards) is pinned separately in
tests/test_sketches.py at n=1M distinct keys.

Usage: python tools/probe_r11.py [N] [sf_dir]   (default N=100, sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import replicate  # noqa: E402
from scip_spark.session import get_spark  # noqa: E402

OPS = [
    "bloom_sharded_screen",
    "coreset_kcenter",
    "dsir_importance_weights",
    "kn_surprisal_scores",
    "corpus_cluster_safe_split",
    "corpus_drift_chi2",
]


def time_op(spark, fn, sf_dir: str, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[-1]:
        sf_dir = args.pop()
    n = int(args[0]) if args else 100

    spark = get_spark(
        "probe-r11", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    big = f"/tmp/scale_probe_x{n}"
    if not os.path.isdir(f"{big}/documents.parquet"):
        print(f"replicating {n}x ...", file=sys.stderr, flush=True)
        replicate(spark, sf_dir, n, big)

    for name in OPS:
        fn = REGISTRY[name].fn
        t1 = time_op(spark, fn, sf_dir)
        print(f"probe {name} @1x = {t1:.2f}s", file=sys.stderr, flush=True)
        tn = time_op(spark, fn, big)
        print(f"probe {name} @{n}x = {tn:.2f}s", file=sys.stderr, flush=True)
        print(f"| {name} | {t1:.2f} | {tn:.2f} | r{n}={tn / t1:.1f} |", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
