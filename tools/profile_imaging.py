#!/usr/bin/env python
"""Stage-wise wall-time attribution for the imaging pipeline.

Times cumulative plan prefixes of the imaging_pipeline_e2e
construction (synth → illumination → segmentation → per-branch mask →
filter → normalization → features → join) with a noop sink, so the
difference between consecutive rows is the marginal cost of one stage
at the probed image count. Guides optimization: the bench headline is
dominated by this query, so the stage with the largest marginal cost
is the next perf target.

Usage: python tools/profile_imaging.py [n_images] (default 10000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from scip_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

    spark = get_spark(
        "imaging-profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    from pyspark.sql import functions as F

    from scip_spark.operators import masking as M
    from scip_spark.operators.features import extract_features
    from scip_spark.operators.illumination import correct
    from scip_spark.operators.normalization import quantile_normalization
    from scip_spark.operators.segmentation import segment_labels, to_events
    from scip_spark.operators.threshold_filter import population_filter
    from scip_spark.plans.imaging_bench import (
        NCHANNELS,
        synthetic_images,
    )
    from scip_spark.plans.pipeline import BuildCaches
    from scip_spark.schema import ensure_event_columns

    families = ["bbox", "intensity", "raw", "shape", "texture"]

    def run(label, frame_fn):
        spark.catalog.clearCache()
        t0 = time.time()
        caches = BuildCaches()
        frame_fn(caches).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        caches.unpersist()
        print(f"{label:<40} {dt:7.2f}s", flush=True)
        return dt

    def base(caches):
        return ensure_event_columns(synthetic_images(spark, n))

    def illum(caches):
        return correct(base(caches), key="group")

    def seg(caches):
        df = segment_labels(illum(caches), backend="watershed", parent_channel=0)
        return to_events(df, parent_channel=0)

    def fanout(caches):
        return caches.add(seg(caches).cache())

    def masked(caches, method):
        return M.apply_mask(M.get_mask(fanout(caches), method))

    def filtered(caches, method):
        return population_filter(masked(caches, method), channel=0, caches=caches)

    def normalized(caches, method):
        return quantile_normalization(filtered(caches, method), key="group")

    def feats(caches, method):
        return extract_features(normalized(caches, method), NCHANNELS, families)

    # warm codegen/Arrow once at a tiny count
    saved_n = n
    n = 100
    run("(warmup @100)", lambda c: feats(c, "otsu"))
    n = saved_n

    run("synth only", base)
    run("+ illumination", illum)
    run("+ watershed segment + to_events", seg)
    run("+ otsu mask+apply", lambda c: masked(c, "otsu"))
    run("+ li mask+apply", lambda c: masked(c, "li"))
    run("+ population filter (otsu)", lambda c: filtered(c, "otsu"))
    run("+ normalization (otsu)", lambda c: normalized(c, "otsu"))
    run("+ features (otsu branch full)", lambda c: feats(c, "otsu"))

    def both(caches):
        up = fanout(caches)
        outs = []
        for meth in ("otsu", "li"):
            b = population_filter(
                M.apply_mask(M.get_mask(up, meth)), channel=0, caches=caches
            )
            b = quantile_normalization(b, key="group")
            b = extract_features(b, NCHANNELS, families)
            pre = [
                F.col(c).alias(f"feat_{meth}_{c[5:]}")
                if c.startswith("feat_")
                else F.col(c)
                for c in b.columns
            ]
            outs.append(b.select(*pre))
        keys = ["path", "group", "id", "object_number"]
        a, b = outs
        drop = [c for c in b.columns if c in a.columns and c not in keys]
        return a.join(b.drop(*drop), on=keys, how="inner")

    run("full 2-branch + join (legacy)", both)

    def fused(caches):
        from scip_spark.plans.imaging_bench import PIPELINE_CONFIG
        from scip_spark.plans.pipeline import build

        cfg = dict(PIPELINE_CONFIG)
        cfg["feature_extraction"] = {"nchannels": NCHANNELS, "families": families}
        return build(synthetic_images(spark, n), cfg, caches=caches)

    run("full 2-branch FUSED (r14 default)", fused)


if __name__ == "__main__":
    main()
