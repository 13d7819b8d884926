#!/usr/bin/env python
"""Scale probe for the round-13 operators / rewrites.

Expected shapes:
- dedup_substring_spans: exhaustive window fingerprints are LINEAR in
  tokens (one row per window); the shared-hash decision is a map-side-
  combined count + one hash join whose output is again the window
  relation, and coverage is a per-doc distinct — no pair emission, so
  verbatim replication (which makes EVERY window corpus-shared) stays
  linear where the pair families would go quadratic. rN ≈ linear.
- quality_repetition_rules (Arrow kernel since r13): one linear
  mapInPandas pass per doc, zero shuffle — rN ≈ linear-in-rows.

Usage: python tools/probe_r13.py [N] [sf_dir]   (default N=100, sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_probe import replicate  # noqa: E402
from scip_spark.session import get_spark  # noqa: E402

OPS = [
    # first batches (recorded in SCALE_PROBE.md round-13 tables):
    # dedup_substring_spans r100=16.2, quality_repetition_rules r100=3.9,
    # dedup_substring_clean r100=5.1, dp_randomized_response r100=1.6
    "decontaminate_train_spans",
    "mmr_diversified_topk",
    "pii_luhn_audit",
    "benford_first_digit_audit",
]
#: verbatim embedding replicas pair every copy with every copy in the
#: LSH candidate join (quadratic OUTPUT by data — the documented
#: exact-join caveat), so the embedding-pair ops probe at a reduced
#: factor like the setsim family
REDUCED_OPS: list = [
    # knn_graph_mutual r10=19.4 / embedding_semantic_keep r10=1.5
    # (recorded; see the embedding-replica caveat in SCALE_PROBE.md)
]
REDUCED_N = 10


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
        "probe-r13", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    for ops, factor in [(OPS, n), (REDUCED_OPS, REDUCED_N)]:
        big = f"/tmp/scale_probe_x{factor}"
        # guard on the NEWEST table: replicas written by older probe
        # tools lack customer.parquet and must be rebuilt
        if not os.path.isdir(f"{big}/customer.parquet"):
            print(f"replicating {factor}x ...", file=sys.stderr, flush=True)
            replicate(spark, sf_dir, factor, big)
        for name in ops:
            fn = REGISTRY[name].fn
            t1 = time_op(spark, fn, sf_dir)
            print(f"probe {name} @1x = {t1:.2f}s", file=sys.stderr, flush=True)
            tn = time_op(spark, fn, big)
            print(f"probe {name} @{factor}x = {tn:.2f}s", file=sys.stderr, flush=True)
            print(
                f"| {name} | {t1:.2f} | {tn:.2f} | r{factor}={tn / t1:.1f} |",
                flush=True,
            )


if __name__ == "__main__":
    raise SystemExit(main())
