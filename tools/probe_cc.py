"""Interleaved A/B probe for the connected-components convergence check.

Arm A = the r14 loop (separate old-vs-new comparison join per round).
Arm B = the folded variant (change flag computed inside the label-update
projection; convergence read from an aggregate over the already-cached
round result — no second join).

Both arms run against the SAME cached candidate-pair relation in one
session, alternating A,B,A,B,... so box drift hits both arms equally.
Usage: python tools/probe_cc.py [sf_dir] [n_pairs_of_runs]
"""
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def cc_old(pairs: DataFrame, max_iter: int = 20) -> tuple[DataFrame, int]:
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
    )
    prev_cached = None
    rounds = 0
    for it in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.node_id)
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("component").alias("neighbor_min"))
        )
        new_labels = (
            labels.join(prop, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("neighbor_min"), F.col("component"))
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = new_labels
        if (it + 1) % 4 == 0:
            cp = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            prev_cached = None
            new_labels = cp
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
    edges.unpersist()
    return labels, rounds


def cc_new(pairs: DataFrame, max_iter: int = 20) -> tuple[DataFrame, int]:
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
    )
    prev_cached = None
    rounds = 0
    for it in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.node_id)
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("component").alias("neighbor_min"))
        )
        staged = (
            labels.join(prop, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("neighbor_min"), F.col("component"))
                ).alias("component"),
                F.coalesce(
                    F.col("neighbor_min") < F.col("component"), F.lit(False)
                ).alias("chg"),
            )
            .cache()
        )
        changed = staged.agg(F.max("chg")).first()[0]
        new_labels = staged.select("node_id", "component")
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = staged
        if (it + 1) % 4 == 0:
            cp = new_labels.localCheckpoint(eager=True)
            staged.unpersist()
            prev_cached = None
            new_labels = cp
        labels = new_labels
        rounds += 1
        if not changed:
            break
    edges.unpersist()
    return labels, rounds


def cc_selfloop(pairs: DataFrame, max_iter: int = 20) -> tuple[DataFrame, int]:
    """One join per round: self-loop edges make the propagation groupBy
    emit BOTH the neighborhood minimum and the node's own previous label
    (min over the self edge), so the label update and the change flag
    come out of the same aggregation — no second join against the old
    labels at all."""
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    nodes = sym.select(F.col("src").alias("node_id")).distinct()
    edges = sym.unionByName(
        nodes.select(F.col("node_id").alias("src"), F.col("node_id").alias("dst"))
    ).cache()
    labels = nodes.withColumn("component", F.col("node_id"))
    prev_cached = None
    rounds = 0
    for it in range(max_iter):
        staged = (
            edges.join(labels, edges.src == labels.node_id)
            .groupBy(F.col("dst").alias("node_id"))
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("src") == F.col("dst"), F.col("component"))).alias("own"),
            )
            .withColumn("chg", F.col("component") < F.col("own"))
            .drop("own")
            .cache()
        )
        changed = staged.agg(F.max("chg")).first()[0]
        new_labels = staged.drop("chg")
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = staged
        if (it + 1) % 4 == 0:
            cp = new_labels.localCheckpoint(eager=True)
            staged.unpersist()
            prev_cached = None
            new_labels = cp
        labels = new_labels
        rounds += 1
        if not changed:
            break
    edges.unpersist()
    return labels, rounds


def main():
    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_cc")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from scip_spark.functions.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = lsh_candidate_pairs(docs).persist()
    n_pairs = pairs.count()
    print(f"pairs={n_pairs}")

    arms = (("old", cc_old), ("new", cc_new), ("selfloop", cc_selfloop))
    results = {name: [] for name, _ in arms}
    checks = []
    for i in range(n_runs):
        for name, fn in arms:
            spark.sparkContext.setJobDescription(f"cc_{name}_{i}")
            t0 = time.perf_counter()
            lab, rounds = fn(pairs)
            chk = lab.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("node_id", "component").cast("decimal(38,0)")).alias("h"),
            ).first()
            wall = time.perf_counter() - t0
            lab.unpersist()
            results[name].append(wall)
            checks.append((name, i, rounds, chk["n"], chk["h"]))
            print(f"{name} run{i}: {wall:.2f}s rounds={rounds} n={chk['n']} h={chk['h']}")
    hs = {(c[3], c[4]) for c in checks}
    print("IDENTICAL" if len(hs) == 1 else f"MISMATCH: {hs}")
    mo = min(results["old"])
    for name, _ in arms[1:]:
        mn = min(results[name])
        print(f"old min {mo:.2f}s  {name} min {mn:.2f}s  ratio {mn / mo:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
