"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The classic formulation counts symbol pairs over the CORPUS each merge
— O(n_merges) full scans. The scalable formulation (what every real
trainer does) compresses the corpus to its word-frequency table first:

1. ONE corpus scan builds (word, freq) — vocabulary-sized, orders of
   magnitude smaller than the corpus at 100 TB (Zipf).
2. Each merge iteration runs entirely on that compressed table:
   adjacent symbol pairs weighted by word freq (explode + groupBy),
   the argmax pair collected to the driver (ONE tiny row), and the
   merge applied per word with a vectorized pandas UDF.
3. State on the driver is the merge list (n_merges rows); state on the
   cluster is the word table — both independent of corpus size.

Determinism: the argmax pair breaks ties by (count desc, left, right),
and the per-word merge is the standard left-to-right non-overlapping
scan, so the merge list is a pure function of the word-frequency table.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scip_spark.functions.text import tokens

END = "</w>"  # end-of-word marker, as in the original BPE formulation


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus scan: (word, freq) plus the initial symbol
    sequence (characters + end-of-word marker)."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seq = F.concat(
        F.filter(F.split("w", ""), lambda c: c != ""), F.array(F.lit(END))
    )
    return words.select("w", "freq", seq.alias("seq"))


def _merge_seq_udf(left: str, right: str):
    merged = left + right

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge(seqs: pd.Series) -> pd.Series:
        out = []
        for seq in seqs:
            res = []
            i = 0
            n = len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(seq[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return merge


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge list.

    Per iteration: one groupBy over the word table's adjacent symbol
    pairs (freq-weighted), a 1-row driver collect for the argmax, and a
    map-side re-encode. Each round's table is localCheckpoint'ed:
    persist alone would leave a one-UDF-per-merge logical plan growing
    without bound (30k merges = 30k nested projections), and losing a
    cached block would recompute the whole chain from the corpus scan.
    localCheckpoint truncates the plan; its fault-tolerance trade-off
    (non-recomputable on executor loss) is acceptable for the
    vocabulary-sized table — set a checkpoint dir and swap to
    checkpoint() for cluster-grade fault tolerance (same note as
    dedup.connected_components)."""
    cur = word_freq_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                cur.select(
                    "freq",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("seq"), 1, F.size("seq") - 1),
                            F.slice(F.col("seq"), 2, F.size("seq") - 1),
                            lambda a, b: F.struct(
                                a.alias("left"), b.alias("right")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("n"))
            )
            top = (
                pairs.orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            left, right = top[0]["left"], top[0]["right"]
            merges.append((left, right))
            nxt = cur.withColumn(
                "seq", _merge_seq_udf(left, right)(F.col("seq"))
            ).localCheckpoint()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder (driver-side, for tests/inspection): apply the
    learned merges in order to one word."""
    seq = list(word) + [END]
    for left, right in merges:
        res = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(seq[i])
                i += 1
        seq = res
    return seq
