"""End-to-end imaging pipeline as a registered headline query.

The relational/corpus queries dominate the bench headline, but the
reference's ACTUAL workload is the tensor path: load → illumination
correction → segmentation → mask fan-out → population filter →
normalization → feature extraction (reference src/scip/main.py:198-260).
This module gives that path its own perf signal by running the full
config-driven pipeline (scip_spark.plans.pipeline.build) over a
deterministic synthetic image corpus sized by the scale factor.

Scale design: image generation is a zero-shuffle ``spark.range →
mapInPandas`` (each task synthesizes its own id range — no driver-side
data, no scan skew); every tensor stage is an Arrow-batched
``mapInPandas`` over the same partitioning; the only shuffles are the
pipeline's own semantic ones (per-group illumination partial-sums,
group extents, the 2-branch feature join keyed on the record id). At
1000 executors this is embarrassingly parallel in the image dimension.

No SQL oracle: the pipeline is tensor-valued (watershed, GLCM — not
relationally expressible), so this entry takes the driver's rows-only
check; numeric correctness of every stage is pytest-pinned
(tests/test_masking.py, test_features.py, test_pipeline_builder.py,
test_imaging_bench.py).
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scip_spark.queries import register
from scip_spark.schema import EVENT_SCHEMA

#: images per unit scale factor — sf0.1 → 10k images, sf0.01 → 1k.
IMAGES_PER_SF = 100_000
SIDE = 32          # H = W of each synthetic frame
NCHANNELS = 3
NGROUPS = 4        # acquisition groups (illumination / normalization keys)


def _synth_batch(ids: np.ndarray) -> pd.DataFrame:
    """Deterministic per-id frames: dim noisy background + 1–3 bright
    Gaussian blobs (cells), identical for a given id on every executor.

    Mirrors the reference's synthetic fixtures (test/conftest.py) but at
    bench scale: blobs are what watershed/otsu/li actually segment."""
    yy, xx = np.mgrid[0:SIDE, 0:SIDE]
    rows = []
    for i in ids:
        rng = np.random.default_rng(int(i))
        img = rng.normal(10.0, 2.0, size=(SIDE, SIDE)).astype(np.float32)
        nblobs = int(rng.integers(1, 4))
        for _ in range(nblobs):
            cy, cx = rng.uniform(6, SIDE - 6, size=2)
            sigma = rng.uniform(2.0, 3.5)
            amp = rng.uniform(80.0, 150.0)
            img += (amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))).astype(
                np.float32
            )
        np.clip(img, 0.0, None, out=img)
        # 3 channels: same scene under per-channel gain (the shape every
        # multi-channel microscope produces; keeps segmentation on c0)
        px = np.stack([img, img * 0.8 + 1.0, img * 1.2])
        rows.append(
            {
                "path": f"/synthetic/bench_{int(i)}.tiff",
                "group": f"g{int(i) % NGROUPS}",
                "object_number": int(i),
                "id": 0,
                "pixels": px.ravel(),
                "pixels_shape": [NCHANNELS, SIDE, SIDE],
            }
        )
    out = pd.DataFrame(rows)
    return out


def synthetic_images(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic image corpus in EVENT_SCHEMA layout.

    ``spark.range`` gives each task an id slice; the task synthesizes its
    own frames — nothing is generated on (or shipped from) the driver, so
    the source scales with executor count, not driver memory."""
    if partitions is None:
        partitions = max(2, min(64, n // 100))
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _synth_batch(pdf["id"].to_numpy())

    from pyspark.sql import types as T

    keep = {"path", "group", "object_number", "id", "pixels", "pixels_shape"}
    schema = T.StructType([f for f in EVENT_SCHEMA.fields if f.name in keep])
    return base.mapInPandas(gen, schema=schema)


PIPELINE_CONFIG = {
    "illumination_correction": {"key": "group"},
    "segment": {"backend": "watershed", "parent_channel": 0},
    "mask": {"methods": ["otsu", "li"], "main_channel": 0},
    "filter": {"channel": 0},
    "normalization": {"key": "group"},
    "feature_extraction": {"nchannels": NCHANNELS, "families": None},
}


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1).rstrip(".")) if m else 0.001


def _feature_rollup(spark: SparkSession, n: int) -> DataFrame:
    """The full pipeline over ``n`` synthetic images, reduced to one
    deterministic row per acquisition group (shared by the sf-scaled
    bench entry and the fixed-n driver-checkable checksum entry).

    Cache lifetime: the fused plan persists the widest tensor relation
    of the whole bench (pixels + every branch's masks). Because the
    rollup is tiny (one row per group), we run the terminal action HERE,
    release every persisted relation with a blocking unpersist, and hand
    the caller a local re-created DataFrame — so no tensor cache
    outlives this query into the next bench entry. (Round-14 driver
    bench showed the lazily-released cache doubling the wall of the
    query scheduled right after this one.) Reference analogue: SCIP
    releases via explicit compute boundaries, src/scip/main.py:275."""
    from scip_spark.plans.pipeline import BuildCaches, build

    cfg = dict(PIPELINE_CONFIG)
    cfg["feature_extraction"] = {
        "nchannels": NCHANNELS,
        "families": ["bbox", "intensity", "raw", "shape", "texture"],
    }
    caches = BuildCaches()
    feats = build(synthetic_images(spark, n), cfg, caches=caches)

    # roll the wide two-branch feature frame up to one row per group:
    # object counts + grid-quantized feature sums (floor(x·2^20) is exact
    # and summation-order-independent, so the output is deterministic)
    # one probe per feature FAMILY (plus both mask branches for
    # intensity), so the committed golden rollup (scip_spark/golden/)
    # catches semantic drift in any family's kernels — not just the
    # intensity chain
    probe = [
        "feat_otsu_intensity_mean_mask_c0",
        "feat_li_intensity_mean_mask_c0",
        "feat_otsu_shape_area_combined",
        "feat_otsu_shape_eccentricity_combined",
        "feat_otsu_bbox_bbox_maxr",
        "feat_otsu_raw_std_c0",
        "feat_otsu_texture_glcm_mean_contrast_d3_c0",
        "feat_li_texture_combined_sobel_mean_c0",
    ]
    present = [c for c in probe if c in feats.columns]
    missing = [c for c in probe if c not in feats.columns]
    if missing:  # a rename must fail loudly, not shrink golden coverage
        raise ValueError(f"probe columns missing from feature frame: {missing}")
    aggs = [
        F.count("*").alias("n_objects"),
        F.count(F.col(present[0]) if present else F.lit(None)).alias("n_kept"),
    ]
    for c in present:
        aggs.append(
            F.sum(F.floor(F.col(c) * F.lit(float(2**20))).cast("long")).alias(f"sum_{c[5:]}")
        )
    rollup = feats.groupBy("group").agg(*aggs)
    try:
        rows = rollup.collect()  # bounded: one row per acquisition group
        schema = rollup.schema
    finally:
        # release even when the action fails (a mid-bench task failure
        # must not leave the widest tensor relation of the session
        # resident for every subsequent query — review r15 #1)
        caches.unpersist(blocking=True)
    return spark.createDataFrame(rows, schema=schema)


@register(
    "imaging_pipeline_e2e",
    None,  # tensor-valued pipeline — rows-only driver check (see module doc)
    doc="The reference's full main() workload (src/scip/main.py:198-260): "
    "synthetic reader → illumination → watershed segmentation → "
    "otsu+li mask fan-out → population filter → quantile normalization → "
    "all five feature families → per-group rollup.",
)
def imaging_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(100, int(round(_sf_of(sf_dir) * IMAGES_PER_SF)))
    return _feature_rollup(spark, n)


#: fixed corpus size of the checksum entry == the sf0.01 bench size, so
#: the committed golden imaging_pipeline_e2e_sf0.01.json IS the oracle.
CHECKSUM_N = 1000


def _checksum_oracle_sql() -> str:
    """DuckDB oracle for ``imaging_feature_checksum``: a literal VALUES
    table built from the committed golden rollup (scip_spark/golden/
    imaging_pipeline_e2e_sf0.01.json). The query runs at a FIXED
    ``CHECKSUM_N`` independent of sf_dir — ``oracle_sql()`` strings
    carry no scale parameter, so the only sound oracle is a constant —
    and the golden file stays the single source of truth: regenerate it
    and this SQL follows. Every numeric cell is a floor(x·2^20) BIGINT
    (exact, summation-order-free), so the comparison is bit-exact, not
    tolerance-based. This closes the driver's one perpetual no_oracle
    cell (the tensor-valued e2e) with a real rows/schema/hash check of
    the same code path: reference analogue is SCIP's own determinism
    oracle over main() output (test/test_main.py:52)."""
    import json
    from pathlib import Path

    from scip_spark.queries import literal_values_sql

    p = Path(__file__).resolve().parents[1] / "golden" / "imaging_pipeline_e2e_sf0.01.json"
    rows = json.loads(p.read_text())["rows"]
    casts = {c: (None if c == "group" else "BIGINT") for c in rows[0]}
    return literal_values_sql(rows, casts)


@register(
    "imaging_feature_checksum",
    _checksum_oracle_sql(),
    doc="Driver-verifiable scalar companion of imaging_pipeline_e2e: the "
    "identical load → illumination → watershed → otsu+li masks → filter → "
    "normalize → 5-family feature path at a fixed 1000-image corpus, "
    "rolled up to exact floor(x·2^20) BIGINTs and hash-compared against "
    "the committed golden via a literal-VALUES DuckDB oracle.",
)
def imaging_feature_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _feature_rollup(spark, CHECKSUM_N)
