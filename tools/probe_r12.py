#!/usr/bin/env python
"""Scale probe for the round-12 operators.

Expected shapes:
- quality_gopher_rules / quality_c4_filters / video_frame_plan: pure
  per-row column algebra, zero shuffle — rN ≈ linear-in-rows.
- ewma_anomaly_days: daily agg map-side-combines to the calendar-
  bounded relation; the fold is O(days) on one row — rN ≈ scan cost.
- session_window_native: one user_id shuffle; replicate() ADDS users
  (per-user history constant), so per-partition session merges stay
  O(history) — rN ≈ linear.
- stream_stream_attribution: state bounded by watermark; replicate
  adds users so per-key state stays constant — rN ≈ linear (plus
  fixed streaming-machinery overhead that DILUTES with N).
- embedding_jl_projection / embedding_covariance_fp: zero shuffle /
  sketch-sized shuffle (≤2080 rows per task partial) — rN ≈ linear.
- dedup_keep_best_quality: verbatim replication gives every doc an
  N-member duplicate cluster — LSH pairs grow ~N² per original doc
  (the documented exact-dedup caveat, see scale_probe.py), so this
  probe runs at a REDUCED factor like the setsim family and measures
  the CC + argmax machinery, not a realistic corpus growth.
- trigram_backoff_scores: model counts map-side-combine; pricing
  joins touch the DISTINCT eval-trigram relation, which is CONSTANT
  under verbatim replication — rN ≈ scan + occurrence-join cost.

Usage: python tools/probe_r12.py [N] [sf_dir]   (default N=100, sf0.1)
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
    "quality_gopher_rules",
    "quality_c4_filters",
    "ewma_anomaly_days",
    "session_window_native",
    "stream_stream_attribution",
    "embedding_jl_projection",
    "embedding_covariance_fp",
    "trigram_backoff_scores",
    "video_frame_plan",
    # second batch (added after the first probe run)
    "corpus_es_sample",
    "corpus_length_batches",
    "quality_score_calibration",
    "ann_jl_topk",
    "quality_blocklist_filter",
    "dedup_rate_by_source",
]
REDUCED_OPS = ["dedup_keep_best_quality"]  # quadratic under verbatim copies
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
        "probe-r12", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    plans = [(OPS, n), (REDUCED_OPS, REDUCED_N)]
    for ops, factor in plans:
        big = f"/tmp/scale_probe_x{factor}"
        if not os.path.isdir(f"{big}/documents.parquet"):
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
