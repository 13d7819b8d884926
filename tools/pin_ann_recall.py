"""Measure the exact recall@5 hit totals of the k-means-dependent ANN
family at each testdata SF and print the `_ANN_PINNED` dict to splice
into scip_spark/functions/similarity_queries.py (VERDICT r10 ask #3).

The pipelines are md5-seeded and deterministic, so the hit total is a
fixed integer per (entry, corpus). Run after any intentional algorithm
change:

    python tools/pin_ann_recall.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from scip_spark.session import get_spark  # noqa: E402
import scip_spark.functions.similarity_queries as sq  # noqa: E402
import scip_spark.entry_queries  # noqa: E402,F401
from scip_spark.queries import REGISTRY  # noqa: E402

ENTRIES = [
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_residual_topk",
    "ann_opq_topk",
    "ann_ivfsq8_topk",
    "ann_graph_topk",
]

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    sfs = sys.argv[1:] or DEFAULT_SFS
    spark = get_spark("pin-ann-recall", shuffle_partitions=8)
    sq._ANN_PIN_MEASURE = True  # emit raw hit totals at any corpus size
    pinned: dict[str, dict[int, int]] = {e: {} for e in ENTRIES}
    from pyspark.sql import functions as F

    for sf in sfs:
        # the corpus fingerprint the pin is keyed by (row counts cannot
        # discriminate corpora: sf0.001 and sf0.01 both carry 500 rows)
        n_corpus = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .agg(
                F.sum(
                    F.floor(
                        F.element_at(F.col("embedding"), 1).cast("double")
                        * sq._FP_GRID
                    ).cast("long")
                )
            )
            .collect()[0][0]
        )
        for name in ENTRIES:
            row = REGISTRY[name].fn(spark, sf).collect()[0]
            pinned[name][n_corpus] = int(row["n_hit"])
            print(
                f"{name} @ {sf}: corpus={n_corpus} "
                f"hits={row['n_hit']}/{row['n_exact']} "
                f"recall={row['n_hit'] / row['n_exact']:.3f}"
            )
    print("\n_ANN_PINNED: dict[str, dict[int, int]] = {")
    for name in ENTRIES:
        body = ", ".join(f"{c}: {h}" for c, h in sorted(pinned[name].items()))
        print(f'    "{name}": {{{body}}},')
    print("}")


if __name__ == "__main__":
    main()
