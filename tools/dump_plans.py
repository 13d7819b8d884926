#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to files.

Writes <outdir>/<query>_<tag>.txt for each query — the committed plan
archive the optimization rounds reference (plans/r15/...). Run from a
repo/worktree root so the checkout's own engine code is imported:

  python tools/dump_plans.py <tag> <outdir> <sf_dir> <query> [query...]

(`tag` is e.g. "before"/"after"; a worktree at the old revision with
tag=before and HEAD with tag=after gives the pair, same box/Spark/SF.)
Plans are the pre-execution formatted physical plans (AQE initial
plan), which is what the round's claims are about: Exchange count,
join strategy, PushedFilters/ReadSchema, codegen spans, Python-eval
node types.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from scip_spark.session import get_spark  # noqa: E402
import scip_spark.entry_queries  # noqa: E402,F401
from scip_spark.queries import REGISTRY  # noqa: E402


def _imaging_plan_df(spark, sf_dir):
    """imaging_pipeline_e2e executes eagerly inside its query function
    (collect + blocking cache release, the r15 rfm fix), so the
    returned DataFrame is a local relation. The meaningful plan — the
    fused mapInPandas pipeline + per-group rollup — is the internal
    DataFrame right before the terminal action; rebuild it here without
    running it."""
    from scip_spark.plans import imaging_bench as ib
    from scip_spark.plans.pipeline import BuildCaches, build
    from pyspark.sql import functions as F

    n = max(100, int(round(ib._sf_of(sf_dir) * ib.IMAGES_PER_SF)))
    cfg = dict(ib.PIPELINE_CONFIG)
    cfg["feature_extraction"] = {
        "nchannels": ib.NCHANNELS,
        "families": ["bbox", "intensity", "raw", "shape", "texture"],
    }
    caches = BuildCaches()
    feats = build(ib.synthetic_images(spark, n), cfg, caches=caches)
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
    aggs = [
        F.count("*").alias("n_objects"),
        F.count(F.col(present[0])).alias("n_kept"),
    ]
    for c in present:
        aggs.append(
            F.sum(F.floor(F.col(c) * F.lit(float(2**20))).cast("long")).alias(
                f"sum_{c[5:]}"
            )
        )
    return feats.groupBy("group").agg(*aggs)


def main() -> None:
    tag, outdir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name in ("imaging_pipeline_e2e", "imaging_feature_checksum"):
            df = _imaging_plan_df(spark, sf_dir)
        else:
            df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
