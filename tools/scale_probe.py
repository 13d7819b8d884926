#!/usr/bin/env python
"""Empirical scale-linearity probe for the headline corpus operators.

Replicates the sf0.1 documents table N× into /tmp (doc_ids re-keyed so
dedup semantics stay realistic), then times the core text/dedup
operators at 1×, and N× and reports per-scale wall time and the
throughput ratio. A map-side operator should scale ~linearly in rows
(ratio ≈ N on fixed cores); a shuffle-heavy one degrades faster.

This is the local stand-in for the 100 TB question: the plans that
stay flat here (zero-shuffle signatures, bounded-bucket LSH) are the
ones whose wall time is scan-bound, which is the property that
survives a 1000-executor scale-out.

Usage: python tools/scale_probe.py [N ...] [sf_dir]  (default N=100, sf0.1)
Multiple N values produce one table column per scale. Writes
SCALE_PROBE.md. NB: small N (<50) mostly measures fixed task overhead
on 32 idle-ish cores — use ≥100 for data-bound signal.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from scip_spark.session import get_spark  # noqa: E402


def replicate(spark, sf_dir: str, n: int, out: str) -> str:
    """N× copies of documents, events and orders with re-keyed entity
    ids. Events/orders scale by ADDING users/customers (per-entity
    history length stays constant) — the realistic growth direction,
    and the one that must NOT blow up a per-user window or a per-group
    aggregation state."""
    if os.path.isdir(out):
        shutil.rmtree(out)
    copies = F.broadcast(spark.range(n).select(F.col("id").alias("rep")))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.parquet(f"{out}/documents.parquet")
    )

    from scip_spark.queries import load_events

    ev = load_events(spark, sf_dir)
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") * n + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") * n + F.col("rep")).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.parquet(f"{out}/events.parquet")
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") * n + F.col("rep")).alias("o_orderkey"),
            (F.col("o_custkey") * n + F.col("rep")).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .repartition(32)
        .write.parquet(f"{out}/orders.parquet")
    )

    # lineitem: more baskets (re-keyed orderkey) over the SAME part
    # catalog — the realistic growth direction for basket mining; pair
    # generation must stay bounded by items-per-basket, not catalog size
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") * n + F.col("rep")).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.parquet(f"{out}/lineitem.parquet")
    )

    # embeddings: re-keyed vec_ids, vectors jittered per-copy by a tiny
    # deterministic offset so IVF/PQ codebook training sees distinct
    # points (identical duplicates would collapse k-means degenerately)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    jitter = (
        F.transform(
            "embedding",
            lambda v, i: v
            + ((F.pmod(F.col("rep") * 2654435761 + i * 40503, F.lit(1000)) - 500)
               / 5e6).cast("float"),
        )
    )
    (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
            jitter.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.parquet(f"{out}/embeddings.parquet")
    )

    # customer: ADDING customers (re-keyed custkey), other columns
    # verbatim — the per-segment/governance ops must stay G-row-bounded
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (
        cust.crossJoin(copies)
        .select(
            (F.col("c_custkey") * n + F.col("rep")).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        )
        .repartition(32)
        .write.parquet(f"{out}/customer.parquet")
    )

    return out


def replicate_perturbed_docs(spark, sf_dir: str, n: int, out: str) -> str:
    """Perturbed documents replica for the EXACT set-similarity joins.

    Verbatim N× copies give every doc an N-duplicate group and
    quadratic OUTPUT (the documented compose-after-exact_dedup caveat);
    even text-tagged copies multiply every posting list by N, growing
    CANDIDATE pairs by N² — replication duplicates the token
    distribution, which no exact join can absorb and no real corpus
    exhibits. The fair growth model is new sub-corpora with their own
    vocabularies (new domains/languages/time periods): suffix every
    token with the replica id, so per-token document frequencies — and
    hence each document's candidate neighborhood — stay constant as N
    grows. The probe then measures whether the join MACHINERY (prefix
    postings, candidate equi-join, verify) shards linearly."""
    if os.path.isdir(out):
        shutil.rmtree(out)
    from pyspark.sql import functions as F

    copies = F.broadcast(spark.range(n).select(F.col("id").alias("rep")))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tagged = F.array_join(
        F.transform(F.split("text", " "), lambda t: F.concat(t, F.lit("_"), F.col("rep"))),
        " ",
    )
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
            tagged.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.parquet(f"{out}/documents.parquet")
    )
    return out


OPS = ["dedup_minhash_signatures", "dedup_simhash", "quality_repetition",
       "text_quality", "corpus_clean", "dedup_lsh_pairs", "corpus_chunk_windows",
       "boilerplate_chunk_scrub", "quantile_sketch_prices",
       # window-analytics family (events/orders also replicated): these
       # were the round-4 "weak" global-window offenders — post-rewrite
       # they must scale like the map-side ops
       "sessionize_events", "funnel_conversion", "rfm_segmentation",
       "running_sum_per_customer", "time_to_conversion",
       "attribution_touchpoints",
       # round-5 additions: map-side/partitioned constructions
       "phrase_search_docs", "interval_overlap_orders",
       "model_quality_scores", "feature_hash_docs", "ab_test_conversion",
       "vocab_novelty_by_batch",
       # round-5 heavyweights (r5 verdict ask #4): basket mining over
       # replicated lineitem and an ANN build+probe over jittered
       # replicated embeddings
       "frequent_item_pairs", "ann_ivfpq_topk"]

#: exact set-similarity joins: probed separately against the
#: perturbed-documents replica (see replicate()), at a REDUCED factor —
#: their verify-join spill is ~1 GB per replication unit (linear, but a
#: large constant), and 100× would exceed this box's free disk. 25×
#: still separates linear from quadratic decisively.
PERTURBED_DOCS_OPS = ["dedup_setsim_join", "dedup_containment_pairs",
                      "winnow_dup_pairs"]
SETSIM_FACTOR = 25


def time_op(spark, fn, sf_dir: str, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[-1]:
        sf_dir = args.pop()
    factors = [int(a) for a in args] or [100]

    spark = get_spark("scale-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.queries import REGISTRY

    dirs = {1: sf_dir}
    for n in factors:
        big_dir = replicate(spark, sf_dir, n, f"/tmp/scale_probe_x{n}")
        # replicated: documents/events/orders; other tables symlink base
        for t in ["region", "nation", "customer", "supplier", "part",
                  "lineitem", "embeddings"]:
            src = f"{sf_dir}/{t}.parquet"
            dst = f"{big_dir}/{t}.parquet"
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        dirs[n] = big_dir

    scales = [1] + factors
    header = " | ".join(f"{n}× (s)" for n in scales)
    ratio_hdr = " | ".join(f"r{n}" for n in factors)
    lines = [
        "# SCALE_PROBE — wall time vs corpus size (fixed local[32])",
        "",
        "documents/events/orders/lineitem sf0.1 replicated N× with",
        "re-keyed entity ids (more users/customers/baskets, constant",
        "per-entity history); embeddings jittered per copy; best-of-2",
        "(single pass for the slow exact joins), noop sink.",
        "rN = time(N×)/time(1×): rN ≈ N means data-bound and",
        "linear — the plan shape that survives a cluster scale-out; a",
        "super-linear rN flags a shuffle/skew that would dominate at",
        "100 TB. rN << N means fixed overhead still dominates at N×.",
        "",
        "The exact set-similarity joins run against a PERTURBED",
        "documents replica (every token suffixed with its replica id —",
        "disjoint sub-vocabularies, the new-domain growth model): on",
        "verbatim copies their OUTPUT is quadratic per duplicate group",
        "by definition, and even tagged copies multiply every posting",
        "list by N (N² candidates) — replication-induced, not a plan",
        "property. See the replicate() docstring.",
        "",
        f"| op | {header} | {ratio_hdr} |",
        "|" + "---|" * (1 + len(scales) + len(factors)),
    ]

    def flush_md() -> None:
        # incremental: a late failure (e.g. a missing imaging dir) must
        # not discard the hours of completed probe rows above it
        with open("SCALE_PROBE.md", "w") as f:
            f.write("\n".join(lines) + "\n")

    def row(name: str, cells: dict, ratios: dict) -> str:
        # pad to the full scale/ratio column count so single-factor
        # sections stay aligned under a multi-factor header
        c = " | ".join(cells.get(n, "—") for n in scales)
        r = " | ".join(ratios.get(n, "—") for n in factors)
        return f"| {name} | {c} | {r} |"

    flush_md()
    for name in OPS:
        fn = REGISTRY[name].fn
        times = {}
        for n in scales:
            print(f"probe {name} @{n}x ...", file=sys.stderr, flush=True)
            times[n] = time_op(spark, fn, dirs[n])
            print(f"probe {name} @{n}x = {times[n]:.2f}s",
                  file=sys.stderr, flush=True)
        lines.append(row(
            name,
            {n: f"{times[n]:.2f}" for n in scales},
            {n: f"{times[n] / max(times[1], 1e-9):.1f}" for n in factors},
        ))
        flush_md()

    # exact set-similarity joins: perturbed replica, reduced factor,
    # single pass (runtime dwarfs the noise band; ~linear means
    # minutes at 25× on fixed cores)
    ss = SETSIM_FACTOR
    ss_dir = replicate_perturbed_docs(
        spark, sf_dir, ss, f"/tmp/scale_probe_setsim_x{ss}"
    )
    for name in PERTURBED_DOCS_OPS:
        fn = REGISTRY[name].fn
        print(f"probe {name} @1x ...", file=sys.stderr, flush=True)
        t1 = time_op(spark, fn, sf_dir, passes=1)
        print(f"probe {name} @{ss}x (perturbed) ...", file=sys.stderr, flush=True)
        tn = time_op(spark, fn, ss_dir, passes=1)
        lines.append(row(
            f"{name} (perturbed docs, probed at {ss}×)",
            {1: f"{t1:.2f}", factors[-1]: f"{tn:.2f} ({ss}×)"},
            {factors[-1]: f"r{ss}={tn / max(t1, 1e-9):.1f}"},
        ))
        flush_md()

    # imaging pipeline: scaled by IMAGE COUNT, not table replication —
    # the sf dirs already encode 100/1k/10k synthetic images (the query
    # derives n from the dir name). Single timed pass: the 100× run is
    # ~100 s, far outside the noise band.
    img = REGISTRY["imaging_pipeline_e2e"].fn
    base = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    img_dirs = {1: os.path.join(base, "sf0.001"),
                10: os.path.join(base, "sf0.01"),
                100: os.path.join(base, "sf0.1")}
    missing = [d for d in img_dirs.values() if not os.path.isdir(d)]
    if missing:
        print(f"skip imaging probe: missing sibling sf dirs {missing}",
              file=sys.stderr, flush=True)
    else:
        # warm the codegen/Arrow paths once: the tensor pipeline's first
        # run pays Janino + Python-worker startup, which at 100 images
        # dwarfs the data cost and produces a bogus r10 < 1
        img(spark, img_dirs[1]).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        it = {}
        for n, d in img_dirs.items():
            t0 = time.time()
            img(spark, d).write.format("noop").mode("overwrite").save()
            it[n] = time.time() - t0
            spark.catalog.clearCache()  # the mask fan-out caches its upstream
        lines.append(row(
            f"imaging_pipeline_e2e (image count; 10×={it[10]:.2f}s, "
            f"r10={it[10]/it[1]:.1f})",
            {1: f"{it[1]:.2f}", factors[-1]: f"{it[100]:.2f} (100×)"},
            {factors[-1]: f"r100={it[100]/it[1]:.1f}"},
        ))
    flush_md()
    print("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
