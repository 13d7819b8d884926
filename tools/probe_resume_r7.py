#!/usr/bin/env python
"""One-shot resume for the r7 SCALE_PROBE regen: the full run died
after flushing the setsim row. Re-uses the perturbed 25x replica in
/tmp and appends the two missing sections (containment + imaging) to
SCALE_PROBE.md, matching tools/scale_probe.py's row format for a
single factor=100 header."""
import os
import sys
import time

sys.path.insert(0, ".")

from scip_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    ss = 25
    ss_dir = f"/tmp/scale_probe_setsim_x{ss}"
    assert os.path.isdir(f"{ss_dir}/documents.parquet"), "replica missing"

    spark = get_spark("scale-probe-resume",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    lines = []

    def timed(fn, d):
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    name = "dedup_containment_pairs"
    fn = REGISTRY[name].fn
    print(f"probe {name} @1x ...", file=sys.stderr, flush=True)
    t1 = timed(fn, sf_dir)
    print(f"probe {name} @1x = {t1:.2f}s; @{ss}x ...",
          file=sys.stderr, flush=True)
    tn = timed(fn, ss_dir)
    print(f"probe {name} @{ss}x = {tn:.2f}s", file=sys.stderr, flush=True)
    lines.append(
        f"| {name} (perturbed docs, probed at {ss}×) | {t1:.2f} | "
        f"{tn:.2f} ({ss}×) | r{ss}={tn / max(t1, 1e-9):.1f} |"
    )
    with open("SCALE_PROBE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    lines = []

    img = REGISTRY["imaging_pipeline_e2e"].fn
    base = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    img_dirs = {1: os.path.join(base, "sf0.001"),
                10: os.path.join(base, "sf0.01"),
                100: os.path.join(base, "sf0.1")}
    img(spark, img_dirs[1]).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    it = {}
    for n, d in img_dirs.items():
        print(f"probe imaging @{n}x ...", file=sys.stderr, flush=True)
        it[n] = timed(img, d)
        print(f"probe imaging @{n}x = {it[n]:.2f}s", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    lines.append(
        f"| imaging_pipeline_e2e (image count; 10×={it[10]:.2f}s, "
        f"r10={it[10]/it[1]:.1f}) | {it[1]:.2f} | {it[100]:.2f} (100×) | "
        f"r100={it[100]/it[1]:.1f} |"
    )
    with open("SCALE_PROBE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
