#!/usr/bin/env python
"""Generate the committed CZI fixture for `czi_schema_synthesis` plus
its expected-row JSON.

One ZISRAW container with three named scenes (the reference's
scene-name regex drives metadata synthesis, src/scip/loading/
czi.py:85-87) holding 2-channel tiles of varying sizes and pixel
types (Gray8/Gray16/Gray32Float), all uncompressed subblocks.
Contents are a pure function of the seed; expected checksums use the
order-free integer grid (per-element floor(x*2^20) summed as int64 —
exact in numpy, Spark and DuckDB alike). Regenerate ONLY on an
intentional fixture change:

    python tools/make_czi_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from scip_spark.sources.zisraw import write_czi  # noqa: E402

FIXDIR = os.path.join(
    os.path.dirname(__file__), "..", "scip_spark", "fixtures", "czi"
)

#: scene name -> (n_tiles, dtype); names carry the well/position
#: pattern the meta regex extracts
SCENES = {
    "well_A1_pos_0": (2, np.uint16),
    "well_A1_pos_1": (1, np.uint8),
    "well_B3_pos_0": (2, np.float32),
}


def main() -> None:
    root = os.path.abspath(FIXDIR)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "acquisition.czi")
    scenes = {}
    expected = []
    for name, (n_tiles, dt) in SCENES.items():
        # full-name hash (review r15: first-4-bytes seeding collided on
        # the shared 'well' prefix, making every scene's tile 0
        # identical — a scene-addressing mixup would have passed)
        import hashlib

        seed = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        tiles = []
        for m in range(n_tiles):
            c, h, w = 2, int(rng.integers(4, 7)), int(rng.integers(5, 9))
            tiles.append((rng.random((c, h, w)) * 120).astype(dt))
        scenes[name] = tiles
        for m, t in enumerate(tiles):
            grid = np.floor(t.astype(np.float64) * float(2**20)).astype(np.int64)
            well, pos = name.split("_")[1], name.split("_")[3]
            expected.append(
                {
                    "scene": name,
                    "tile": m,
                    "well": well,
                    "pos": pos,
                    "c": t.shape[0],
                    "h": t.shape[1],
                    "w": t.shape[2],
                    "px_sum_fp": int(grid.sum()),
                }
            )
    # per-subblock metadata pins the data-offset rule
    # (data = max(256, fixed) + MetadataSize) with real nonzero msize
    write_czi(path, scenes, subblock_xml="<METADATA><Tags/></METADATA>")
    out = os.path.join(root, "..", "czi_expected.json")
    with open(out, "w") as f:
        json.dump({"rows": expected}, f, indent=1)
        f.write("\n")
    print(f"wrote {path} ({os.path.getsize(path)} bytes), "
          f"{len(expected)} expected rows")


if __name__ == "__main__":
    main()
