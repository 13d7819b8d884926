#!/usr/bin/env python
"""Generate the committed TIFF fixture for `tiff_codec_checksum` plus
its expected-row JSON.

Four records x two channels under the reference's file-per-channel
convention (reference src/scip/loading/tiff.py:126-158), every file a
DIFFERENT codec/layout so the driver-checked entry exercises the whole
r14 codec matrix from real bytes: deflate/packbits/lzw strips, the
horizontal-differencing predictor, multi-strip splits, tiled layout,
both byte orders, u8/u16/f32. Values are a pure function of the seed;
expected checksums use the order-free integer grid (floor(x*2^20)
summed as int64 over the float32-decoded stack — exact in numpy, Spark
and DuckDB). Regenerate ONLY on an intentional fixture change:

    python tools/make_tiff_fixture.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, ".")

from scip_spark.sources.tiffio import read_tiff, write_tiff  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "scip_spark", "fixtures", "tiff")

H, W = 10, 13

#: (rec, channel) -> write_tiff kwargs + dtype
LAYOUTS = {
    ("a", 0): (np.uint8, {}),
    ("a", 1): (np.uint16, {"compression": "deflate", "predictor": 2}),
    ("b", 0): (np.uint8, {"compression": "lzw"}),
    ("b", 1): (np.uint16, {"compression": "lzw", "predictor": 2, "byteorder": ">"}),
    ("c", 0): (np.uint8, {"compression": "packbits", "rows_per_strip": 3}),
    ("c", 1): (np.uint16, {"compression": "deflate", "tile": (16, 16)}),
    ("d", 0): (np.uint8, {"compression": "lzw", "predictor": 2, "tile": (16, 16)}),
    ("d", 1): (np.float32, {"byteorder": ">"}),
    # r15: baseline-JPEG strips (compression 7) through the pure-Python
    # codec — lossy but DETERMINISTIC, so the committed bytes decode to
    # fixed values and the integer-grid checksum is exact (expected
    # rows are computed from the decode-back for every record)
    ("e", 0): (np.uint8, {"compression": "jpeg", "jpeg_quality": 95}),
    ("e", 1): (np.uint8, {"compression": "jpeg", "rows_per_strip": 4}),
}


def main() -> None:
    root = os.path.abspath(FIXDIR)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    expected = []
    for rec in "abcde":
        planes = []
        for ch in (0, 1):
            dt, kw = LAYOUTS[(rec, ch)]
            seed = int.from_bytes(f"{rec}/{ch}".encode(), "little") % (2**32)
            rng = np.random.default_rng(seed)
            a = (rng.random((H, W)) * 200).astype(dt)
            fp = os.path.join(root, f"{rec}_{ch}.tiff")
            write_tiff(fp, a, **kw)
            # expected values come from the DECODE-BACK, so lossy-but-
            # deterministic codecs (JPEG) pin exactly what the engine
            # will compute; identical to `a` for the lossless codecs
            planes.append(read_tiff(fp).astype(np.float32))
        stack = np.stack(planes)
        grid = np.floor(stack.astype(np.float64) * float(2**20)).astype(np.int64)
        expected.append(
            {
                "rec": rec,
                "c": stack.shape[0],
                "h": stack.shape[1],
                "w": stack.shape[2],
                "px_sum_fp": int(grid.sum()),
            }
        )
    out = os.path.join(root, "..", "tiff_expected.json")
    with open(out, "w") as f:
        json.dump({"rows": expected}, f, indent=1)
        f.write("\n")
    print(f"wrote {len(LAYOUTS)} files, {len(expected)} expected rows -> {root}")


if __name__ == "__main__":
    main()
