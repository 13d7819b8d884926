"""KLL quantile sketch (Karnin-Lang-Liberty 2016) with deterministic
alternating compaction — the O(1/eps)-space companion to the
order-independent bottom-k sample in :mod:`quantiles`.

Why both exist: ``qsketch`` (quantiles.py) is a pure function of the
row SET, so DuckDB reproduces the identical sketch and the driver can
hash-verify the approximation itself; its price is O(1/eps^2) space.
KLL reaches the same rank error with O(1/eps) items, but every
compaction halves a sorted buffer — the result depends on insertion
order, so no SQL engine can reproduce it bit-for-bit. The oracle
contract is therefore the invariant-boolean pattern the ANN queries
use (similarity_queries.py): Spark computes the estimates, re-ranks
them against the EXACT ranks in the same job, and emits
``within_bound`` booleans the oracle pins to TRUE — if the sketch's
error bound breaks, the driver's hash check goes red.

Determinism: classic KLL flips a random coin per compaction to pick
the odd or even survivors. Here the coin is a per-level alternating
counter — the sketch is a pure function of (insertion sequence, merge
tree), identical across reruns, and consecutive same-level compactions
introduce opposite-signed rank errors that largely cancel (the
"deterministic sweep" variant studied alongside randomized KLL; the
randomized worst-case proof does not transfer, so the tests pin the
empirical bound at 4k-wide safety margins instead of the paper's
constants).

Scale shape (the two-job design of SURVEY §1.5): one ``mapInPandas``
pass builds a ~3k-item sketch per PARTITION — no shuffle of the value
column at all — and the driver folds the per-partition sketches in
partition order (a bounded collect: #partitions × ~3k doubles). At
100 TB that is the same topology as ``treeAggregate`` with a single
level; the merge is cheap enough (concatenate + compact) that a
driver fold over thousands of partitions stays sub-second.

The reference computes per-object numpy percentiles single-node
(reference src/scip/features/intensity.py:52-57); corpus-scale
distributions need a mergeable summary instead.
"""

from __future__ import annotations

import math

import numpy as np

KLL_K = 256
_MIN_CAP = 8
_C = 2.0 / 3.0  # per-level capacity decay (KLL paper's c)


class KLLSketch:
    """Mutable KLL sketch. ``levels[h]`` holds plain floats each
    representing 2**h input values; total represented weight always
    equals ``count`` (odd buffers retain their max instead of losing
    weight)."""

    __slots__ = ("k", "count", "levels", "comps")

    def __init__(self, k: int = KLL_K):
        self.k = int(k)
        self.count = 0
        self.levels: list[list[float]] = [[]]
        self.comps: list[int] = [0]

    # -- capacity ---------------------------------------------------
    def _cap(self, h: int, height: int) -> int:
        return max(_MIN_CAP, int(math.ceil(self.k * _C ** (height - 1 - h))))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _capacity(self) -> int:
        height = len(self.levels)
        return sum(self._cap(h, height) for h in range(height))

    # -- build ------------------------------------------------------
    def update(self, values) -> "KLLSketch":
        """Feed a batch. The batch lands in level 0 before compaction
        (lazy compaction, as in Apache DataSketches) — the sketch is a
        pure function of the batch sequence."""
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return self
        self.levels[0].extend(vals.tolist())
        self.count += int(vals.size)
        self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._capacity():
            height = len(self.levels)
            for h in range(height):
                if len(self.levels[h]) > self._cap(h, height):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int) -> None:
        buf = sorted(self.levels[h])
        keep: list[float] = []
        if len(buf) & 1:
            # odd buffer: the max stays at level h so represented
            # weight is conserved exactly (count == total weight is a
            # tested invariant)
            keep = [buf[-1]]
            buf = buf[:-1]
        off = self.comps[h] & 1
        self.comps[h] += 1
        promoted = buf[off::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append([])
            self.comps.append(0)
        self.levels[h + 1].extend(promoted)

    # -- merge ------------------------------------------------------
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        """Fold ``other`` in (levelwise concatenation + compaction).
        Deterministic given operand order; NOT commutative — callers
        fold partials in a fixed (partition-id) order."""
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.comps.append(0)
        for h, lv in enumerate(other.levels):
            self.levels[h].extend(lv)
            self.comps[h] += other.comps[h]
        self.count += other.count
        self._compress()
        return self

    # -- query ------------------------------------------------------
    def _weighted(self):
        vals: list[float] = []
        wts: list[int] = []
        for h, lv in enumerate(self.levels):
            vals.extend(lv)
            wts.extend([1 << h] * len(lv))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(wts, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose cumulative weight reaches
        ceil(q·count) — percentile_disc semantics; always a real data
        value (compaction only ever drops items, never invents)."""
        if self.count == 0:
            raise ValueError("empty sketch")
        v, w = self._weighted()
        cum = np.cumsum(w)
        target = max(1, int(math.ceil(q * self.count)))
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- (de)serialization for the Spark partial rows ----------------
    def to_row(self) -> dict:
        sizes = [len(lv) for lv in self.levels]
        items: list[float] = []
        for lv in self.levels:
            items.extend(lv)
        return {
            "count": self.count,
            "sizes": sizes,
            "comps": list(self.comps),
            "items": items,
        }

    @classmethod
    def from_row(cls, row: dict, k: int = KLL_K) -> "KLLSketch":
        sk = cls(k)
        sk.count = int(row["count"])
        sk.levels = []
        sk.comps = [int(c) for c in row["comps"]]
        pos = 0
        items = list(row["items"])
        for s in row["sizes"]:
            sk.levels.append([float(x) for x in items[pos : pos + s]])
            pos += s
        return sk


_PARTIAL_SCHEMA = (
    "pid int, count long, sizes array<int>, comps array<int>, items array<double>"
)


def kll_partials(df, value_col: str, k: int = KLL_K):
    """One KLL sketch per input PARTITION via ``mapInPandas`` — the
    value column never shuffles; each task emits one ≤~3k-item row."""
    from pyspark.sql import functions as F
    import pandas as pd

    src = df.select(
        F.col(value_col).cast("double").alias("v"),
        F.spark_partition_id().alias("pid"),
    )

    def gen(batches):
        sk = KLLSketch(k)
        pid = None
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["pid"].iloc[0])
                sk.update(pdf["v"].to_numpy())
        if sk.count:
            yield pd.DataFrame([{"pid": pid, **sk.to_row()}])

    return src.mapInPandas(gen, schema=_PARTIAL_SCHEMA)


def kll_partials_by_group(df, value_col: str, group_col: str, k: int = KLL_K):
    """One KLL sketch per (input partition, group) via ``mapInPandas``
    — the map-side combine: values never shuffle; only ~3k-item
    sketch rows do, keyed by group. Per-partition state is one sketch
    per distinct group seen in that partition."""
    from pyspark.sql import functions as F
    import pandas as pd

    src = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.spark_partition_id().alias("pid"),
    )

    def gen(batches):
        sketches: dict = {}
        pid = None
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            for g, sub in pdf.groupby("g", sort=True):
                sketches.setdefault(g, KLLSketch(k)).update(sub["v"].to_numpy())
        rows = [
            {"g": g, "pid": pid, **sk.to_row()}
            for g, sk in sketches.items()
            if sk.count
        ]
        if rows:
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        gen,
        schema="g string, pid int, count long, sizes array<int>, "
        "comps array<int>, items array<double>",
    )


def kll_build_by_group(
    df, value_col: str, group_col: str, k: int = KLL_K, fanout: int = 0
) -> dict:
    """{group: KLLSketch} — partials merge per group in pid order
    (deterministic merge tree). The collect is bounded at
    #groups × #partitions sketch rows; above ``fanout`` input
    partitions (default: the module fanout) the per-group fold runs in
    executor-side rounds first — ``applyInPandas`` over (group,
    pid-contiguous bucket), merging each bucket in pid order — so the
    driver collects ≤ #groups × fanout rows and performs that many
    merges, never O(#groups × #partitions)."""
    fanout = fanout or _MERGE_FANOUT
    partials = _tree_merge_rounds(
        kll_partials_by_group(df, value_col, group_col, k),
        df.rdd.getNumPartitions(),
        k,
        fanout,
        key_cols=("g",),
    )
    rows = partials.collect()
    out: dict = {}
    for r in sorted(rows, key=lambda r: (r["g"], r["pid"])):
        sk = KLLSketch.from_row(r.asDict(), k)
        if r["g"] in out:
            out[r["g"]].merge(sk)
        else:
            out[r["g"]] = sk
    return out


#: partials per executor-side merge task AND the driver's final fan-in.
#: 256 partials × ~3k items ≈ 6 MB per merge task — comfortably small.
_MERGE_FANOUT = 256


def _tree_merge_rounds(
    partials, n_parts: int, k: int, fanout: int, key_cols: tuple[str, ...] = ()
):
    """Executor-side merge rounds over a partial-sketch relation:
    bucket pid-CONTIGUOUS runs of ``fanout`` partials (per group when
    ``key_cols`` is set), merge each run in pid order inside one
    ``applyInPandas`` task, emit one partial with pid = bucket index.
    Buckets are contiguous ranges, so the global left-to-right merge
    order is preserved across rounds — the tree is a pure function of
    (partition count, fanout), deterministic across reruns. Only
    ~3k-item sketch rows ever shuffle (keyed by bucket); the value
    column was consumed one level below."""
    import pandas as pd
    from pyspark.sql import functions as F

    schema = _PARTIAL_SCHEMA
    for c in reversed(key_cols):
        schema = f"{c} string, " + schema

    def merge_bucket(key, pdf: pd.DataFrame):
        out = None
        for r in pdf.sort_values("pid").to_dict("records"):
            sk = KLLSketch.from_row(r, k)
            out = sk if out is None else out.merge(sk)
        keys = dict(zip(key_cols, key))
        keys["pid"] = int(key[len(key_cols)])
        return pd.DataFrame([{**keys, **out.to_row()}])

    while n_parts > fanout:
        partials = (
            partials.groupBy(
                *key_cols,
                (F.col("pid") / F.lit(fanout)).cast("int").alias("bucket"),
            )
            .applyInPandas(merge_bucket, schema=schema)
        )
        n_parts = math.ceil(n_parts / fanout)
    return partials


def kll_build(
    df, value_col: str, k: int = KLL_K, fanout: int = _MERGE_FANOUT
) -> KLLSketch:
    """Distributed build: per-partition sketches merge in a
    deterministic left-to-right tree. Above ``fanout`` input partitions
    the fold happens in EXECUTOR-side rounds (``_tree_merge_rounds``):
    at 100k partitions the driver performs ceil(100k/256) → 2 rounds of
    distributed merges and then folds ≤256 partials, instead of O(P)
    sequential merges (the r8 verdict's scale-proof shape). At or below
    ``fanout`` partitions (every test/bench config) no round runs and
    the build is the same single pid-ordered driver fold as before.
    The final fold STREAMS through ``toLocalIterator`` over the
    pid-sorted partials, so driver state is one sketch + one in-flight
    row. Shuffles touch only the tiny sketch relation, never the value
    column (plan-asserted in tests/test_kll.py)."""
    partials = kll_partials(df, value_col, k)
    partials = _tree_merge_rounds(partials, df.rdd.getNumPartitions(), k, fanout)
    it = partials.orderBy("pid").toLocalIterator()
    out = KLLSketch(k)
    for r in it:
        out.merge(KLLSketch.from_row(r.asDict(), k))
    return out
