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


def _merge_seq_udf(batch_merges: list[tuple[str, str]]):
    """One vectorized pandas UDF applying a ROUND of merges in order —
    each merge is the standard left-to-right non-overlapping scan, run
    sequentially per word, so a multi-merge round is byte-identical to
    applying the merges one Spark job at a time."""
    merges = list(batch_merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge(seqs: pd.Series) -> pd.Series:
        out = []
        for seq in seqs:
            cur = list(seq)
            for left, right in merges:
                res = []
                i = 0
                n = len(cur)
                while i < n:
                    if i + 1 < n and cur[i] == left and cur[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(cur[i])
                        i += 1
                cur = res
            out.append(cur)
        return pd.Series(out)

    return merge


def _select_independent(rows, touched_cap: int, max_take: int, known_symbols=()):
    """Greedy prefix of the sequential argmax order that is PROVABLY the
    same sequence sequential training would emit, using only this
    round's counts.

    ``rows`` is the collected top-K candidate list sorted by
    (count desc, left asc, right asc) — the sequential tie-break order.
    Selection invariants:

    - symbols of a selected pair are disjoint from all previously
      selected pairs' symbols, so earlier merges in the round cannot
      create or destroy occurrences of it (a merge (A,B)→AB only
      touches pairs with A on the right edge or B on the left edge);
    - its count strictly exceeds ``cap``, the largest count of any pair
      that DOES touch a selected symbol — including the uncollected
      tail bound — because a merge (A,B) can create new pairs (X,AB) /
      (AB,Y) with counts bounded by count(X,A) / count(B,Y), and a new
      pair with an equal count could win the lexicographic tie-break.

    Self-pair threat: a selected SELF-merge (A,A)→AA creates pairs the
    scan above cannot bound, because their bounding pair is (A,A)
    itself — which, being selected, is consumed by the merge and
    excluded from the scan. Concretely, after the left-to-right pairing
    of a run of n A's into floor(n/2) AA symbols (+ a trailing A when n
    is odd), the new pairs are (AA,AA) — floor(n/2)-1 per run — and
    (AA,A) — 1 per odd run. Both counts are bounded by
    floor(count(A,A)/2): each (AA,AA) occurrence maps injectively to
    the distinct UNMERGED crossing (A,A) occurrence between its two
    halves, and per run floor(n/2)-1 ≤ (n-1)/2 while each odd run
    (n ≥ 3) contributes 1 ≤ (n-1)/2; summing freq-weighted over runs
    and flooring (counts are integers) gives the bound. So each
    selected self-pair folds ``count // 2`` into the threat for every
    LATER candidate (hypothesis-found counterexample without this:
    wf={'a':4,'bbbbbb':3}, batch=2 — merging (b,b) with count 15
    creates (bb,bb) with count 6 > count(a,</w>)=4, so the batch must
    end rather than select (a,</w>); pinned as an @example in
    tests/test_corpus.py::test_bpe_batching_property).

    Under those two rules, after applying the selected prefix the
    sequential argmax is exactly the next selected pair, by induction.
    The threat check scans the WHOLE collected list (not just earlier
    rows): an overlapping pair with an EQUAL count sorts after the
    candidate on the lexicographic tie-break yet still bounds a new
    pair that could win that tie-break.

    Symbol-collision guard: if a selected pair's concatenation
    ``left + right`` is ALREADY a live symbol (``known_symbols`` = the
    exact symbol vocabulary: initial characters plus every merge
    product so far, maintained by the caller), the batch ends at that
    pair. An existing symbol S == left+right means pairs (X, S) touch
    neither ``left`` nor ``right``, so the threat scan never bounds
    them — and after the merge their occurrences combine with the
    freshly created (X, left+right) pairs, so the combined count can
    exceed any later selection's count. The colliding merge itself is
    still provably next (the proof for it only relies on EARLIER
    selections, which are collision-free); everything after it is not,
    so we stop and let the next round re-count. The guard also covers
    two in-batch selections producing the same string via different
    decompositions ((A,BC) and (AB,C) are symbol-disjoint yet both
    yield \"ABC\"), because the caller's vocabulary plus this batch's
    own products are checked together.
    """
    items = [(r["n"], r["left"], r["right"]) for r in rows]
    selected: list[tuple[str, str]] = []
    touched: set[str] = set()
    # bounds the (AA,AA)/(AA,A) pairs created by selected self-merges,
    # whose bounding pair (A,A) is excluded from the scan as selected
    self_threat = 0
    # defensive union: any symbol appearing in a candidate pair is live
    # by construction, even if the caller's vocabulary missed it
    known = set(known_symbols)
    for _n, l, r in items:
        known.add(l)
        known.add(r)
    for n, left, right in items:
        if left in touched or right in touched:
            continue
        if selected:
            # touched_cap ≥ every count outside the collected top-K
            threat = max(touched_cap, self_threat)
            for n2, l2, r2 in items:
                if (l2, r2) != (left, right) and (l2, r2) not in selected and (
                    l2 in touched or r2 in touched
                ):
                    threat = max(threat, n2)
            if n <= threat:
                break  # threat only grows and counts only shrink
        selected.append((left, right))
        touched.update((left, right))
        if left == right:
            self_threat = max(self_threat, n // 2)
        merged = left + right
        if merged in known:
            break  # collision: later threat scans can't bound pairs on it
        known.add(merged)
        if len(selected) >= max_take:
            break
    return selected


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text", batch: int = 8
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge list —
    byte-identical to the sequential Sennrich algorithm for ANY
    ``batch`` (equivalence proof in :func:`_select_independent`;
    pytest-pinned against the sequential reference).

    Per ROUND (not per merge): one groupBy over the word table's
    adjacent symbol pairs (freq-weighted), a top-K driver collect, a
    greedy independent-prefix selection of up to ``batch`` merges whose
    sequential equivalence is provable from this round's counts alone,
    and ONE map-side re-encode applying the whole prefix. Vocab-scale
    training is therefore O(n_merges / batch_effective) Spark jobs; the
    worst case (every argmax overlaps the next) degrades gracefully to
    the exact sequential 1-merge-per-job loop.

    Each round's table is localCheckpoint'ed: persist alone would leave
    a one-UDF-per-round logical plan growing without bound, and losing
    a cached block would recompute the whole chain from the corpus
    scan. localCheckpoint truncates the plan; its fault-tolerance
    trade-off (non-recomputable on executor loss) is acceptable for the
    vocabulary-sized table — set a checkpoint dir and swap to
    checkpoint() for cluster-grade fault tolerance (same note as
    dedup.connected_components)."""
    cur = word_freq_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    # Exact live symbol vocabulary, maintained driver-side for the
    # collision guard in _select_independent: initial characters (one
    # tiny distinct over the vocabulary-sized word table) plus every
    # merge product. Merges only ever ADD symbols, so this never
    # under-approximates; a symbol whose occurrences later vanish only
    # makes the guard conservatively end a batch early.
    known_symbols = {
        r["s"]
        for r in cur.select(F.explode("seq").alias("s")).distinct().collect()
    }
    top_k = max(64, 8 * batch)
    try:
        while len(merges) < n_merges:
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
                .limit(top_k)
                .collect()
            )
            top = [r for r in top if r["n"] >= 2]
            if not top:
                break
            # counts below the collected horizon are ≤ the K-th count;
            # if the list is shorter than K the tail bound is vacuous
            tail_cap = top[-1]["n"] if len(top) == top_k else 0
            room = n_merges - len(merges)
            chosen = _select_independent(
                top, tail_cap, min(batch, room), known_symbols
            )
            merges.extend(chosen)
            known_symbols.update(l + r for l, r in chosen)
            nxt = cur.withColumn(
                "seq", _merge_seq_udf(chosen)(F.col("seq"))
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
