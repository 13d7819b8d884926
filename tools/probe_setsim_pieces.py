#!/usr/bin/env python
"""Decompose dedup_setsim_join / dedup_containment_pairs cost on a warm
session: tok build, vocab probe, candidate join, mask relation, full
query. Bench methodology (noop sink, min-of-N)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timeit(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:48s} {best:7.3f}s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from scip_spark.session import get_spark

    spark = get_spark(
        "probe-setsim-pieces",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import scip_spark.entry_queries  # noqa: F401
    from scip_spark.functions import dedup
    from scip_spark.functions.dedup_queries import _shared_doc_tokens
    from scip_spark.queries import tbl

    docs = tbl(spark, sf_dir, "documents")
    t0 = time.time()
    tok = _shared_doc_tokens(spark, sf_dir)
    n = tok.count()
    print(f"tok build+materialize: {time.time()-t0:.3f}s rows={n}")
    timeit("tok.count() warm", lambda: tok.count())
    timeit("_small_vocab(tok, cap)", lambda: dedup._small_vocab(tok, 4096))

    vocab = dedup._small_vocab(tok, 4096)
    print(f"vocab size={len(vocab)}")

    # pieces of _setsim_bitmask
    from pyspark.sql.window import Window as W

    threshold, eps = 0.95, 1e-9
    n_words = (len(vocab) + 63) // 64
    vmap = F.broadcast(spark.createDataFrame(vocab, ["token", "df", "bit"]))
    tok2 = tok.join(vmap, "token").select("sid", "token", "df", "bit")
    by_sid = W.partitionBy("sid")
    ranked = tok2.select(
        "sid", "bit",
        F.row_number().over(by_sid.orderBy("df", "token")).alias("rn"),
        F.count("*").over(by_sid).alias("n_tok"),
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n_tok") - F.floor(F.lit(threshold) * F.col("n_tok")) + 1
    )
    a = prefix.select(
        F.col("sid").alias("id_a"), "bit",
        F.col("n_tok").alias("n_a"), F.col("rn").alias("p_a"),
    )
    b = prefix.select(
        F.col("sid").alias("id_b"), "bit",
        F.col("n_tok").alias("n_b"), F.col("rn").alias("p_b"),
    )
    required = F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
    ubound = F.least("p_a", "p_b") + F.least(
        F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
    )
    cand = (
        a.join(b, "bit")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("n_a", "n_b")
            >= F.lit(threshold) * F.greatest("n_a", "n_b") - F.lit(eps)
        )
        .filter(ubound >= required - F.lit(eps))
        .select("id_a", "id_b")
    )
    timeit("prefix relation (noop)", lambda: noop(prefix))
    timeit("cand pre-distinct (noop)", lambda: noop(cand))
    timeit("cand distinct (noop)", lambda: noop(cand.distinct()))
    masks = dedup._mask_relation(tok2.select("sid", "bit"), n_words)
    timeit("mask relation (noop)", lambda: noop(masks))
    timeit(
        "full _setsim_bitmask (noop)",
        lambda: noop(dedup._setsim_bitmask(spark, tok, vocab, threshold, eps)),
    )
    timeit(
        "full setsim_prefix_join incl vocab probe (noop)",
        lambda: noop(dedup.setsim_prefix_join(docs, threshold=0.95, tok=tok)),
    )
    timeit(
        "full containment_join incl vocab probe (noop)",
        lambda: noop(dedup.containment_join(docs, threshold=1.0, tok=tok)),
    )
    spark.stop()


if __name__ == "__main__":
    main()
