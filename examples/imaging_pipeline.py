#!/usr/bin/env python
"""End-to-end imaging feature extraction — the reference's primary
workflow (reference src/scip/main.py:63-282) on Spark:

  synthetic acquisition → illumination correction → watershed
  segmentation (1 image → N cells) → otsu+li mask fan-out →
  population filter → per-group quantile normalization → all five
  feature families → wide per-cell feature parquet.

Run:  python examples/imaging_pipeline.py [N_IMAGES] [OUT_DIR]

Swap ``synthetic_images`` for a real acquisition directory via the
``scip_images`` DataSource (``spark.read.format("scip_images")``) or
the tiff/zarr/czi loaders in scip_spark.sources.filescan once the
image codecs (tifffile / aicsimageio) are installed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/imaging_features"

    from scip_spark.session import get_spark

    spark = get_spark("imaging-pipeline")

    from scip_spark.plans.imaging_bench import NCHANNELS, synthetic_images
    from scip_spark.plans.pipeline import build
    from scip_spark.sources.export import export_parquet

    t0 = time.time()
    feats = build(
        synthetic_images(spark, n),
        {
            "illumination_correction": {"key": "group"},
            "segment": {"backend": "watershed", "parent_channel": 0},
            "mask": {"methods": ["otsu", "li"], "main_channel": 0},
            "filter": {"channel": 0},
            "normalization": {"key": "group"},
            "feature_extraction": {
                "nchannels": NCHANNELS,
                "families": ["bbox", "intensity", "raw", "shape", "texture"],
            },
        },
    )
    export_parquet(feats, out)
    written = spark.read.parquet(out)
    n_cells = written.count()
    n_feats = sum(c.startswith("feat_") for c in written.columns)
    dt = time.time() - t0
    print(
        f"{n} images -> {n_cells} cells x {n_feats} features "
        f"in {dt:.1f}s ({n / dt:.0f} img/s) -> {out}"
    )


if __name__ == "__main__":
    main()
