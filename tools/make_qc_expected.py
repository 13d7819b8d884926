#!/usr/bin/env python
"""Generate the expected rows for `qc_filter_checksum` (P3-P6 driver
coverage) by applying the QC predicates in PURE NUMPY over the
deterministic synthetic corpus — independent of the Spark plumbing the
query itself exercises (compute_filters' mapInPandas, soft-delete
nulling, aggregate folds). Thresholds are chosen to SPLIT the corpus
(std 24 / value_range 140 ≈ 50/50 at n=200), so a predicate drifting in
either direction flips counts. Regenerate ONLY on an intentional
change:

    python tools/make_qc_expected.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from scip_spark.operators.masking import FILTERS  # noqa: E402
from scip_spark.plans.imaging_bench import _synth_batch  # noqa: E402

N = 200
SPECS = [("std", 24.0), ("value_range", 140.0), ("normaltest", 0.05)]
OUT = os.path.join(
    os.path.dirname(__file__), "..", "scip_spark", "fixtures", "qc_expected.json"
)


def main() -> None:
    pdf = _synth_batch(np.arange(N))
    rows = []
    for method, thr in SPECS:
        pred = FILTERS[method]
        agg: dict[str, list[int]] = {}
        for _, r in pdf.iterrows():
            a = np.asarray(r["pixels"], dtype=np.float32).reshape(r["pixels_shape"])
            flags = [bool(pred(a[c], thr)) for c in range(a.shape[0])]
            g = agg.setdefault(r["group"], [0, 0])
            g[0] += int(flags[0])      # main channel kept (soft delete)
            g[1] += sum(map(int, flags))  # per-channel passes
        for group in sorted(agg):
            rows.append(
                {
                    "method": method,
                    "group": group,
                    "n_kept": agg[group][0],
                    "flags_sum": agg[group][1],
                }
            )
    with open(os.path.abspath(OUT), "w") as f:
        json.dump({"rows": rows}, f, indent=1)
        f.write("\n")
    print(f"wrote {len(rows)} expected rows -> {OUT}")


if __name__ == "__main__":
    main()
