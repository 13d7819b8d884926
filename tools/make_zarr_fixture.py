#!/usr/bin/env python
"""Generate the committed zarr fixture for `zarr_schema_synthesis`
(VERDICT r13 #6) plus its expected-row JSON.

Layout mirrors the reference's plate/well directory convention whose
path regex drives loader-schema synthesis (reference
src/scip/loading/zarr.py:73-86):

    scip_spark/fixtures/zarr/plate_P1/A01.zarr   (engine group layout)
    scip_spark/fixtures/zarr/plate_P1/A02.zarr   (engine group layout)
    scip_spark/fixtures/zarr/plate_P2/B03.zarr   (reference layout)
    scip_spark/fixtures/zarr/plate_P2/B07.zarr   (reference layout)

Every store holds ragged per-record arrays; contents are a pure
function of the seed. Expected rows use the order-free integer grid
(per-element floor(x*2^20) summed as int64 — exact in numpy, Spark and
DuckDB alike). Regenerate ONLY on an intentional fixture change:

    python tools/make_zarr_fixture.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, ".")

from scip_spark.sources.zarrio import write_group, write_ragged_array  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "scip_spark", "fixtures", "zarr")

STORES = [
    ("P1", "A01", "group", 3, None),
    ("P1", "A02", "group", 2, None),
    ("P2", "B03", "reference", 3, None),
    ("P2", "B07", "reference", 2, None),
    # r15: zarr's DEFAULT compressor family through the pure-Python
    # blosc/lz4 codecs — committed compressed bytes, driver-verified
    ("P3", "C05", "group", 2, "blosc-lz4"),
    ("P3", "C09", "reference", 2, "lz4"),
]


def main() -> None:
    root = os.path.abspath(FIXDIR)
    shutil.rmtree(root, ignore_errors=True)
    expected = []
    for plate, well, layout, n, compressor in STORES:
        # seed must be stable across processes (hash() is salted):
        # derive it from the name bytes
        seed = int.from_bytes(f"{plate}/{well}".encode(), "little") % (2**32)
        rng = np.random.default_rng(seed)
        cells = []
        for i in range(n):
            c, h, w = 2, int(rng.integers(3, 6)), int(rng.integers(3, 7))
            cells.append((rng.random((c, h, w)) * 50).astype(np.float32))
        store = os.path.join(root, f"plate_{plate}", f"{well}.zarr")
        os.makedirs(os.path.dirname(store), exist_ok=True)
        if layout == "group":
            write_group(store, cells, chunks=None, compressor=compressor)
        else:
            write_ragged_array(store, cells, chunks=(1, 32),
                               compressor=compressor)
        for i, a in enumerate(cells):
            grid = np.floor(a.astype(np.float64) * float(2**20)).astype(np.int64)
            expected.append(
                {
                    "plate": plate,
                    "well": well,
                    "zarr_idx": i,
                    "object_number": i,
                    "c": a.shape[0],
                    "h": a.shape[1],
                    "w": a.shape[2],
                    "px_sum_fp": int(grid.sum()),
                }
            )
    out = os.path.join(root, "..", "zarr_expected.json")
    with open(out, "w") as f:
        json.dump({"rows": expected}, f, indent=1)
        f.write("\n")
    print(f"wrote {len(STORES)} stores, {len(expected)} expected rows -> {root}")


if __name__ == "__main__":
    main()
