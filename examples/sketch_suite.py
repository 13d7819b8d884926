#!/usr/bin/env python
"""The mergeable-sketch suite over the TPC-H-ish tables — every sketch
family the engine ships, with what each is FOR at 100 TB and the
exactness class it offers:

  Bloom filter     membership / join pre-filter    merge==direct (OR semilattice)
  KMV              distinct count + set algebra    merge==direct (k-minima)
  count-min        frequency / heavy hitters       merge==direct (sums commute)
  dyadic histogram rank/quantile with hard bounds  merge==direct (semilattice proof)
  KLL              quantiles at O(1/eps) space     deterministic, error-invariant
  HLL (built-in)   distinct at 2^lgK registers     engine-specific (accuracy-tested)

All but HLL/KLL are oracle-hash-matched (a SQL engine reproduces the
very sketch); KLL's compaction is order-dependent so its oracle pins
the rank-error invariant instead. Each build's shuffle is sketch-sized
regardless of corpus size — the property that matters on a cluster.

Run:  python examples/sketch_suite.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from scip_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sketch-suite", shuffle_partitions=8)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # --- Bloom: contamination screen + join pre-filter -----------------
    from scip_spark.functions.bloom import (
        bloom_build,
        bloom_probe_inline,
    )

    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    ev = docs.filter(F.col("doc_id") % 10 >= 8)
    bloom = bloom_build(train, "text")
    hits = (
        bloom_probe_inline(ev.select("doc_id", "text"), "text", bloom)
        .filter("bloom_hit")
        .count()
    )
    print(f"bloom: {hits}/{ev.count()} eval docs flagged as possible train dups")

    # --- KMV: distinct customers per priority ---------------------------
    from scip_spark.functions.sketches import kmv_estimate, kmv_sketch

    sk = kmv_sketch(orders, "o_orderpriority", "o_custkey")
    print("kmv distinct-customer estimates per priority:")
    for r in sk.select(
        "o_orderpriority", kmv_estimate("kmv").alias("est")
    ).orderBy("o_orderpriority").collect():
        print(f"  {r['o_orderpriority']}: ~{r['est']:.0f}")

    # --- count-min: token frequencies -----------------------------------
    from scip_spark.functions.sketches import cms_bucket, cms_sketch
    from scip_spark.functions.text import tokens

    occ = docs.select(F.explode(tokens("text")).alias("t"))
    cms = cms_sketch(occ, "t").cache()
    probe = occ.groupBy("t").count().orderBy(F.desc("count")).limit(3)
    for r in probe.collect():
        ests = []
        for i in range(4):
            b = occ.select(cms_bucket(F.lit(r["t"]), i).alias("b")).first()["b"]
            ests.append(
                cms.filter((F.col("i") == i) & (F.col("b") == b)).first()["cnt"]
            )
        print(f"cms: token {r['t']!r} exact={r['count']} est={min(ests)}")

    # --- dyadic: price quantiles with rank-slack bounds ------------------
    from scip_spark.functions.dyadic import (
        cents_cell,
        dyadic_quantile_cells,
        dyadic_sketch,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dsk = dyadic_sketch(li, cents_cell("l_extendedprice"), ["l_returnflag"])
    print("dyadic p50 price cells (grid units = cents), with rank slack:")
    for r in dyadic_quantile_cells(dsk, ["l_returnflag"], [0.5]).collect():
        print(
            f"  {r['l_returnflag']}: [{r['lo_grid']}, {r['hi_grid']}]"
            f" (+-{r['rank_slack']} ranks)"
        )

    # --- KLL: global price quantiles -------------------------------------
    from scip_spark.functions.kll import kll_build

    kll = kll_build(orders, "o_totalprice")
    qs = [0.5, 0.95, 0.99]
    print("kll o_totalprice quantiles:", {q: round(kll.quantile(q), 2) for q in qs})

    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
