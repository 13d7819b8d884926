#!/usr/bin/env python
"""Scale probe for the round-8 sketch operators (KLL / CMS / dyadic).

Reuses scale_probe.replicate() to build an N× replica of sf0.1
(re-keyed entity ids), times each sketch query at 1× and N× (best of
2, noop sink), and prints SCALE_PROBE.md-style rows. Expected shapes:
CMS flat-ish in everything but the scan (the shuffle is ≤ d·w counters
per task regardless of corpus size); KLL and dyadic near-linear in
scan only (KLL partials never shuffle values; dyadic's shuffle is
grid-bounded).

Usage: python tools/sketch_probe.py [N] [sf_dir]   (default N=100, sf0.1)
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
    "kll_quantile_prices",        # orders.o_totalprice
    "kll_quantiles_by_priority",  # grouped variant
    "cms_token_counts",           # documents.text
    "dyadic_hist_price_quantiles",  # lineitem.l_extendedprice
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
        "sketch-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    big = f"/tmp/scale_probe_x{n}"
    if not os.path.isdir(f"{big}/documents.parquet"):
        print(f"replicating {n}x ...", file=sys.stderr, flush=True)
        replicate(spark, sf_dir, n, big)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        src, dst = f"{sf_dir}/{t}.parquet", f"{big}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    for name in OPS:
        fn = REGISTRY[name].fn
        t1 = time_op(spark, fn, sf_dir)
        print(f"probe {name} @1x = {t1:.2f}s", file=sys.stderr, flush=True)
        tn = time_op(spark, fn, big)
        print(f"probe {name} @{n}x = {tn:.2f}s", file=sys.stderr, flush=True)
        print(f"| {name} | {t1:.2f} | {tn:.2f} | r{n}={tn / t1:.1f} |")


if __name__ == "__main__":
    raise SystemExit(main())
