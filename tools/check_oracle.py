#!/usr/bin/env python
"""Run every registered query against the DuckDB oracle and report.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from scip_spark.session import get_spark  # noqa: E402
from scip_spark.oracle import check_query  # noqa: E402
from scip_spark import queries  # noqa: E402  (populates REGISTRY)
import scip_spark.entry_queries  # noqa: E402,F401  (extended registry)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(queries.REGISTRY)
    spark = get_spark("oracle-check", shuffle_partitions=8)
    from scip_spark.session import silence_bounded_window_warning

    silence_bounded_window_warning(spark)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if res.get("rows_only"):
            ok = res["rows_spark"] >= 0
            tag = "ok(rows-only)" if ok else "FAIL"
            print(f"{tag:>14}  {name}: rows={res['rows_spark']} [{dt:.1f}s]")
            if not ok:
                failures.append(name)
        elif res["values_match"]:
            tag = "ok(golden)" if res.get("golden") else "ok"
            print(f"{tag:>14}  {name}: rows={res['rows_spark']} [{dt:.1f}s]")
        else:
            print(f"{'FAIL':>14}  {name}: {res} [{dt:.1f}s]")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
