#!/usr/bin/env python
"""Scale probe for the round-10 operators (SQ8 / temperature mix /
stratified eval / auto-sized bloom).

Reuses scale_probe.replicate() for documents (re-keyed doc ids) and
adds an embeddings replica (re-keyed vec ids) so the SQ8 queries probe
at N× corpus size. Expected shapes: everything here is scan-bound —
SQ8's extents agg collapses map-side to 64 keys, the encode is a pure
projection, the approximate pass is a broadcast-queries scan (Q fixed);
temperature mix / stratified eval reduce to G-row relations; the
auto-sized bloom adds one TakeOrdered bottom-k over distinct hashes.

Usage: python tools/probe_r10.py [N] [sf_dir]   (default N=100, sf0.1)
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
    "embedding_sq8_checksum",
    "ann_sq8_topk",
    "corpus_temperature_mix",
    "corpus_stratified_eval",
    "bloom_autosized_screen",
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
        "probe-r10", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    big = f"/tmp/scale_probe_x{n}"
    if not os.path.isdir(f"{big}/documents.parquet"):
        print(f"replicating {n}x ...", file=sys.stderr, flush=True)
        replicate(spark, sf_dir, n, big)
    if not os.path.isdir(f"{big}/embeddings.parquet"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        copies = F.broadcast(spark.range(n).select(F.col("id").alias("rep")))
        (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
                "embedding",
                "label",
            )
            .repartition(32)
            .write.parquet(f"{big}/embeddings.parquet")
        )
    for t in ["region", "nation", "customer", "supplier", "part", "lineitem"]:
        src, dst = f"{sf_dir}/{t}.parquet", f"{big}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    for name in OPS:
        fn = REGISTRY[name].fn
        t1 = time_op(spark, fn, sf_dir)
        print(f"probe {name} @1x = {t1:.2f}s", file=sys.stderr, flush=True)
        tn = time_op(spark, fn, big)
        print(f"probe {name} @{n}x = {tn:.2f}s", file=sys.stderr, flush=True)
        print(f"| {name} | {t1:.2f} | {tn:.2f} | r{n}={tn / t1:.1f} |", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
