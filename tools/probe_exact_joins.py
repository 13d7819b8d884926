#!/usr/bin/env python
"""Isolate dedup_setsim_join / dedup_containment_pairs (bench
methodology: noop sink, min-of-N on a warm session with the shared
token relation pre-built) and dump per-stage task counts from the UI
REST API, to locate where the wall time goes.

Usage: python tools/probe_exact_joins.py [sf_dir] [n_passes]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stages_snapshot(port: int = 4040) -> dict[int, dict]:
    try:
        with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications", timeout=5
        ) as r:
            apps = json.load(r)
        app = apps[0]["id"]
        with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications/{app}/stages"
            "?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception as e:  # noqa: BLE001
        print(f"  [stage API unavailable: {e}]")
        return {}
    return {s["stageId"]: s for s in stages}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from scip_spark.session import get_spark

    spark = get_spark(
        "probe-exact-joins",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "count(*)"
    ).collect()

    for name in ("dedup_setsim_join", "dedup_containment_pairs"):
        spec = REGISTRY[name]
        walls = []
        for i in range(n_passes):
            before = stages_snapshot()
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            walls.append(round(dt, 3))
            after = stages_snapshot()
            if i == n_passes - 1:
                new = [
                    s for sid, s in sorted(after.items())
                    if sid not in before
                ]
                new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
                print(f"  stages of final pass (top by executorRunTime):")
                for s in new[:8]:
                    print(
                        f"    stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>4} "
                        f"runTime={s.get('executorRunTime', 0)/1000.0:8.2f}s "
                        f"shufW={s.get('shuffleWriteBytes', 0)>>20}MB "
                        f"shufR={s.get('shuffleReadBytes', 0)>>20}MB "
                        f"out={s.get('outputBytes', 0)>>20}MB "
                        f"name={s['name'][:60]}"
                    )
        print(f"{name}: passes={walls} min={min(walls)}")

    spark.stop()


if __name__ == "__main__":
    main()
