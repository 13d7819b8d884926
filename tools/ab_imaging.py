#!/usr/bin/env python
"""Drift-proof interleaved A/B for imaging_pipeline_e2e.

The shared box drifts ±40% whole-machine between sessions, so
cross-round wall-time comparisons of this query are meaningless
(r9 learned this the hard way). This harness measures two git
revisions ALTERNATELY in one sitting — A,B,A,B,... back-to-back, so
both sides see the same box state — and reports PER-PAIR numbers,
never cross-pair means. Two signals per measurement:

- wall: 2 warm noop-sink runs at the target SF (plan + kernel cost;
  noisy at ±9% even interleaved — the tie-breaker, not the verdict)
- cpu: summed cProfile tottime across all Python UDF sections of one
  profiled run (spark.sql.pyspark.udf.profiler=perf) — worker CPU is
  deterministic modulo scheduling and is the metric that resolved
  r8's kernel A/Bs

Usage:
  python tools/ab_imaging.py REV_A REV_B [pairs] [sf_dir]
  python tools/ab_imaging.py --measure [sf_dir]   (internal, run in a
                                                   worktree checkout)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

DEFAULT_SF = "/root/testdata/sf0.1"


def measure(sf_dir: str) -> None:
    """Run inside a checkout (cwd = repo root of the revision)."""
    sys.path.insert(0, os.getcwd())
    from scip_spark.session import get_spark  # noqa: E402

    spark = get_spark(
        "ab-imaging", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    import scip_spark.entry_queries  # noqa: E402,F401
    from scip_spark.queries import REGISTRY  # noqa: E402

    fn = REGISTRY["imaging_pipeline_e2e"].fn

    def run_once(d: str) -> float:
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run_once("/root/testdata/sf0.001")  # warm codegen/Arrow/JVM
    walls = [round(run_once(sf_dir), 2) for _ in range(2)]

    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    run_once(sf_dir)
    stats = spark._profiler_collector._perf_profile_results
    cpu = round(sum(s.total_tt for s in stats.values()), 2)

    from bench import _calibrate  # noqa: E402  (same file in any rev)

    print(json.dumps({"wall": walls, "cpu": cpu, "calib": _calibrate()}))


def _worktree(rev: str, path: str) -> None:
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", path, rev],
        check=True,
        capture_output=True,
    )


def _measure_in(path: str, sf_dir: str) -> dict:
    env = dict(os.environ, PYTHONPATH=path)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure", sf_dir],
        cwd=path,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {path}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if sys.argv[1:2] == ["--measure"]:
        measure(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SF)
        return
    rev_a, rev_b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else DEFAULT_SF

    wt_a, wt_b = "/tmp/ab_imaging_A", "/tmp/ab_imaging_B"
    for wt, rev in ((wt_a, rev_a), (wt_b, rev_b)):
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], capture_output=True
        )
        _worktree(rev, wt)

    try:
        ratios_w, ratios_c = [], []
        print(f"A={rev_a}  B={rev_b}  sf={sf_dir}  (ratio = B/A; <1 means B wins)")
        for p in range(pairs):
            a = _measure_in(wt_a, sf_dir)
            b = _measure_in(wt_b, sf_dir)
            rw = min(b["wall"]) / min(a["wall"])
            rc = b["cpu"] / a["cpu"]
            ratios_w.append(rw)
            ratios_c.append(rc)
            print(
                f"pair {p}: wall A={a['wall']} B={b['wall']} ratio={rw:.3f} | "
                f"cpu A={a['cpu']} B={b['cpu']} ratio={rc:.3f} | "
                f"calib A={a['calib']} B={b['calib']}",
                flush=True,
            )
        print(
            f"median ratio: wall={statistics.median(ratios_w):.3f} "
            f"cpu={statistics.median(ratios_c):.3f}"
        )
    finally:
        for wt in (wt_a, wt_b):
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt], capture_output=True
            )


if __name__ == "__main__":
    main()
