#!/usr/bin/env python
"""Regenerate the committed golden-value oracles (scip_spark/golden/).

Usage: python tools/regen_golden.py [name ...]

Run ONLY after an intentional semantic change to a pinned query; the
resulting git diff of the golden JSONs is the review artifact. Never
regenerate to silence a red gate — that is the drift the goldens exist
to catch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from scip_spark.session import get_spark  # noqa: E402
from scip_spark.golden import save_golden  # noqa: E402
from scip_spark import queries  # noqa: E402
import scip_spark.entry_queries  # noqa: E402,F401

#: (query, sf_dir) pairs pinned by a golden. sf0.1 is the bench-headline
#: config; sf0.001/sf0.01 are what pytest and the oracle tool run.
PINNED = [
    ("imaging_pipeline_e2e", "/root/testdata/sf0.001"),
    ("imaging_pipeline_e2e", "/root/testdata/sf0.01"),
    ("imaging_pipeline_e2e", "/root/testdata/sf0.1"),
]


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("golden-regen", shuffle_partitions=32)
    for name, sf_dir in PINNED:
        if only and name not in only:
            continue
        pdf = queries.REGISTRY[name].fn(spark, sf_dir).toPandas()
        p = save_golden(name, sf_dir, pdf)
        print(f"wrote {p} ({len(pdf)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
