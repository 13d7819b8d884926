"""CLI — the reference's ``scip OUTPUT CONFIG PATHS...`` console script
(reference src/scip/main.py:292-376) re-expressed for Spark.

Usage::

    python -m scip_spark.cli OUTPUT CONFIG.yml PATH [PATH...]
        [--mode local|cluster] [--partitions N] [--timing out.json]

The YAML config uses the same stage sections as the reference
(projection, masking, filter, normalization, feature_extraction, …);
see plans/pipeline.py for the schema. Paths point at image
directories; the loader is chosen by config ``loading.format``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="scip-spark", description=__doc__)
    p.add_argument("output", help="output directory (parquet feature table)")
    p.add_argument("config", help="pipeline YAML config")
    p.add_argument("paths", nargs="+", help="input data paths")
    p.add_argument("--mode", default="local", choices=["local", "cluster"])
    p.add_argument(
        "--master",
        default=None,
        help="Spark master URI (spark://…, yarn, k8s://…). In cluster "
        "mode without --master the launcher's (spark-submit) master is "
        "used; in local mode defaults to local[$SPARK_GRAFT_CPUS]. "
        "Subsumes the reference's PBS/MPI modes (utils/util.py:79-133)",
    )
    p.add_argument("--partitions", type=int, default=None, help="input repartition count")
    p.add_argument("--timing", default=None, help="write timing JSON here")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    try:
        import yaml
    except ImportError:  # pragma: no cover
        print("pyyaml is required for the CLI", file=sys.stderr)
        return 2

    with open(args.config) as f:
        config = yaml.safe_load(f)

    from scip_spark.session import get_spark
    from scip_spark.functions.registry import resolve
    from scip_spark.plans.pipeline import build
    from scip_spark.sources.export import export_parquet
    from scip_spark.sources.filescan import load_meta_union

    t0 = time.time()
    # --master wins; else cluster mode defers to the launcher's master
    # (spark-submit), local mode falls back to local[$SPARK_GRAFT_CPUS]
    master = args.master or ("launcher" if args.mode == "cluster" else None)
    spark = get_spark("scip-spark-cli", master=master)

    loading = config.get("loading", {})
    fmt = loading.get("format", "multiframe_tiff")
    source = resolve("source", fmt)
    metas = [source(spark, p, **loading.get("kwargs", {})) for p in args.paths]
    df = load_meta_union(metas)
    if args.partitions:
        df = df.repartition(args.partitions)

    attach = loading.get("attach")
    if attach:  # optional injected reader module path for pixel IO
        import importlib

        mod_name, fn_name = attach.rsplit(":", 1)
        reader = getattr(importlib.import_module(mod_name), fn_name)
        from scip_spark.sources.filescan import attach_pixels

        df = attach_pixels(df, loading.get("path_cols", []), reader)

    out = build(df, config.get("pipeline", {}))
    export_parquet(out, args.output)

    runtime = time.time() - t0
    if args.timing:
        with open(args.timing, "w") as f:
            json.dump({"output": args.output, "config": args.config, "runtime": runtime}, f)
    print(f"wrote {args.output} in {runtime:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
