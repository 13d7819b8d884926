"""Adaptive-resolution dyadic histogram sketch — deterministic,
mergeable, oracle-checkable quantile summaries.

The verdict-7 ask was a KLL-class sketch: better error than the
bottom-k row sample (functions/quantiles.py) at equal size, still
mergeable. KLL itself is stream-order-dependent (its compactions
depend on arrival order), so ``merge(parts) == direct`` cannot hold
bit-for-bit and no ANSI-SQL oracle can reproduce it. This module takes
the q-digest road instead (Shrivastava et al. 2004), simplified to a
form whose merge is a true semilattice:

- Values map to integer cells on a FIXED grid (a pure function both
  engines compute exactly — e.g. ``floor(x*100 + 0.5)`` for 2-decimal
  prices, ``floor(x * 2^40)`` for arbitrary doubles).
- A sketch at dyadic level L is the histogram of ``cell >> L``.
- Each group stores the MINIMAL level whose histogram has at most
  ``k`` distinct coarse cells. ``fits(L)`` is monotone in L, and the
  top level fits whenever the cell domain spans < k * 2^max_level grid
  units (with the floor(x*2^40) grid and max_level=24 that is NOT
  always true). A group whose histogram exceeds k cells even at
  max_level falls back to max_level — it keeps its rows (with more
  than k cells) rather than silently vanishing; the rank-slack column
  still bounds its error honestly.

Why ``merge == direct`` bit-for-bit (tests/test_ranking.py pins it):
for any part P of a union U, ``cells(P, L) ⊆ cells(U, L)``, so
wherever U fits, P fits — hence ``level(P) <= level(U)`` and
``L0 = max(level(A), level(B)) <= level(U)``. Coarsening a level-l
sketch to L >= l composes shifts (``(c >> l) >> (L-l) == c >> L``), so
the merged search over ``L >= L0`` finds exactly ``level(U)``, and
counts are plain sums — associative, commutative, idempotent-free
exact integers. No randomness anywhere.

Error: answering quantile q from the sketch returns the cell whose
cumulative count first reaches ``ceil(q*N)``; the rank uncertainty is
that single cell's count and the value uncertainty is one cell width
(``2^level`` grid units). For a distribution spread over the domain
the per-cell count is ~N/k — an O(N/k) rank bound, versus the
bottom-k sample's O(N/sqrt(k)) sampling error at the same k structs
per group (tests/test_ranking.py measures both on the same data).
Degenerate case: a point mass puts everything in one cell at level 0 —
the sketch answers with rank error 0 and the EXACT value, where a
sample is also exact; the bound degrades only when mass concentrates
in a few wide cells, i.e. when level rose because the group genuinely
spans many cells.

Scale shape: one groupBy builds the leaf histogram (bounded by the
GRID, not the data — the relation after it is vocabulary-sized in the
grid sense); level selection explodes that bounded relation by
max_level+1; the final aggregate is k-bounded per group. No windows
over data-sized relations, no driver state beyond the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 64
DEFAULT_MAX_LEVEL = 24


def cents_cell(value: Column | str) -> Column:
    """Exact grid cell for 2-decimal currency doubles:
    ``floor(x*100 + 0.5)`` — multiply/add/floor are the same IEEE ops
    in Spark and DuckDB, and half-up rounding recovers the exact cent
    (the bare cast would truncate 68423.46*100 = 6842345.999… down)."""
    return F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long") if isinstance(
        value, str
    ) else F.floor(value * 100 + F.lit(0.5)).cast("long")


def leaf_histogram(
    df: DataFrame, cell: Column, group_cols: list[str]
) -> DataFrame:
    """(group…, cell, cnt) — the level-0 histogram. One shuffle, keyed
    by (group, cell); map-side partial aggregation collapses the data
    to grid size before it moves."""
    return (
        df.select(*group_cols, cell.alias("cell"))
        .groupBy(*group_cols, "cell")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _chosen_level(
    leaves: DataFrame, group_cols: list[str], k: int, max_level: int,
    floor_level: DataFrame | None = None,
) -> DataFrame:
    """(group…, level): minimal L with <= k distinct ``cell >> L``,
    or max_level when no level fits (coarsest-available fallback —
    without the coalesce, array_min over the empty fit list yields a
    NULL level and the group's rows get NULL cells downstream).

    ``floor_level`` (merge path) restricts the search to L >= the
    per-group floor; levels below it are never examined, which is what
    makes the merged search provably land on the direct answer.

    Counting trick (replaces a max_level× row explode + distinct — an
    r8 bench A/B took the lineitem query 5.5 s → sub-second): over the
    cell-sorted leaves, a leaf OPENS a new level-L bucket iff
    ``cell >> L != prev_cell >> L`` (or it is the group's first leaf),
    so ``n_cells(L)`` is a plain SUM of per-leaf indicators — all
    levels from ONE lag window over the grid-bounded leaf relation,
    with no row multiplication and no count-distinct expand. The
    window partitions by group and its input is bounded by the GRID
    (2^max_level cells worst case), not the data."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(*group_cols).orderBy("cell")
    lagged = leaves.select(
        *group_cols, "cell", F.lag("cell").over(w).alias("prev")
    )
    opens = [
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (
                    F.expr(f"shiftright(cell, {l})")
                    != F.expr(f"shiftright(prev, {l})")
                ),
                1,
            ).otherwise(0)
        ).alias(f"n{l}")
        for l in range(max_level + 1)
    ]
    counts = lagged.groupBy(*group_cols).agg(*opens)
    # minimal fitting level via one array scan over the per-level sums
    n_arr = F.array(*[F.col(f"n{l}") for l in range(max_level + 1)])
    fit_levels = F.filter(
        F.transform(
            n_arr, lambda n, i: F.when(n <= k, i).otherwise(F.lit(None))
        ),
        lambda x: x.isNotNull(),
    )
    fits = counts.select(
        *group_cols,
        F.coalesce(F.array_min(fit_levels), F.lit(max_level)).alias("level"),
    )
    if floor_level is not None:
        fits = (
            counts.join(floor_level, group_cols)
            .select(
                *group_cols,
                F.coalesce(
                    F.array_min(
                        F.filter(
                            F.transform(
                                n_arr,
                                lambda n, i: F.when(
                                    (n <= k) & (i >= F.col("floor_l")), i
                                ).otherwise(F.lit(None)),
                            ),
                            lambda x: x.isNotNull(),
                        )
                    ),
                    F.lit(max_level),
                ).alias("level"),
            )
        )
    return fits


def dyadic_sketch(
    df: DataFrame,
    cell: Column,
    group_cols: list[str],
    k: int = DEFAULT_K,
    max_level: int = DEFAULT_MAX_LEVEL,
) -> DataFrame:
    """(group…, level, cell, cnt): per-group histogram at the minimal
    dyadic level with at most ``k`` cells. ``cell`` is the level-0 grid
    cell expression (must be non-negative: shiftright on negatives
    floors differently across engines)."""
    leaves = leaf_histogram(df, cell, group_cols)
    return _coarsen_to_fit(leaves, group_cols, k, max_level)


def _coarsen_to_fit(
    leaves: DataFrame, group_cols: list[str], k: int, max_level: int,
    floor_level: DataFrame | None = None,
) -> DataFrame:
    level = _chosen_level(leaves, group_cols, k, max_level, floor_level)
    return (
        leaves.join(level, group_cols)
        .groupBy(*group_cols, "level", F.expr("shiftright(cell, level)").alias("cell"))
        .agg(F.sum("cnt").alias("cnt"))
        .select(*group_cols, "level", "cell", "cnt")
    )


def dyadic_merge(
    parts: DataFrame,
    group_cols: list[str],
    k: int = DEFAULT_K,
    max_level: int = DEFAULT_MAX_LEVEL,
) -> DataFrame:
    """Merge a union of sketch relations (any number of parts stacked
    with unionByName) back into one sketch per group — bit-identical
    to :func:`dyadic_sketch` over the union of the parts' inputs (see
    module proof; pinned in tests/test_ranking.py).

    Steps: coarsen every part to the per-group max level L0 (sums of
    exact longs), then re-run the minimal-level search restricted to
    L >= L0."""
    l0 = parts.groupBy(*group_cols).agg(F.max("level").alias("floor_l"))
    at_l0 = (
        parts.join(l0, group_cols)
        .groupBy(
            *group_cols,
            F.col("floor_l"),
            F.expr("shiftright(cell, floor_l - level)").alias("cell"),
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    # re-express as LEVEL-0-like leaves whose cells are already at
    # floor_l: shift the search floor instead of the cells, so the
    # chosen level / final cells come out in absolute terms
    leaves = at_l0.select(
        *group_cols,
        F.expr("shiftleft(cell, floor_l)").alias("cell"),
        "cnt",
    )
    return _coarsen_to_fit(
        leaves, group_cols, k, max_level,
        floor_level=l0,
    )


def dyadic_quantile_cells(
    sketch: DataFrame, group_cols: list[str], qs: list[float],
    q_scale: int = 100,
) -> DataFrame:
    """Per group, for each q: the coarse cell whose cumulative count
    first reaches ceil(q*N), plus its bounds in grid units and the
    rank slack (= that cell's count, the sketch's rank-error bound for
    this answer). The windows partition by group over a <= k-row
    relation — bounded state by construction; the q fan-out is a
    literal-array explode, not a join.

    Each q must lie EXACTLY on the 1/q_scale grid (default: integer
    percents); an off-grid q — e.g. 0.125 or 0.999 with the default
    scale — raises ValueError instead of being silently rounded to the
    nearest percent. q travels as its exact integer numerator
    (``q_pct`` = q*q_scale, a true percent at the default scale), and
    the rank test ``cum >= ceil(q*N)`` is evaluated as the equivalent
    integer inequality ``cum*q_scale >= q_pct*N`` — exact rational
    arithmetic end to end, no float division anywhere. For finer
    grids pass q_scale=10_000 (basis points) etc."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(*group_cols).orderBy("cell")
    cum = sketch.select(
        *group_cols, "level", "cell", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(W.partitionBy(*group_cols)).alias("n"),
    )
    q_units = []
    for q in qs:
        u = int(round(q * q_scale))
        if abs(q * q_scale - u) > 1e-9 * q_scale:
            raise ValueError(
                f"q={q!r} is not on the 1/{q_scale} grid; pass a "
                f"finer q_scale instead of relying on silent rounding"
            )
        q_units.append(u)
    fan = cum.select(
        *group_cols, "level", "cell", "cnt", "cum", "n",
        F.explode(F.array(*[F.lit(u).cast("long") for u in q_units])).alias("q_pct"),
    )
    # min_by on the (unique) cell keeps level/cnt attached, so the hit
    # row needs no join back to the sketch (which would re-execute the
    # whole sketch subtree a second time)
    # exact integer rank test: cum >= ceil(q_pct*n/scale) for integer
    # cum is equivalent to cum*scale >= q_pct*n — no float division, so
    # e.g. q=0.28, n=25 hits rank 7, where float 0.28*25=7.0000000...01
    # would ceil to 8 (that divergence was measured on 27 of the
    # (q<=99%, n<=200) combinations)
    hits = (
        fan.filter(
            F.col("cum") * F.lit(int(q_scale)) >= F.col("q_pct") * F.col("n")
        )
        .groupBy(*group_cols, "q_pct")
        .agg(
            F.min("cell").alias("cell"),
            F.min_by("level", "cell").alias("level"),
            F.min_by("cnt", "cell").alias("cnt"),
        )
    )
    return hits.select(
        *group_cols,
        "q_pct",
        F.expr("shiftleft(cell, level)").alias("lo_grid"),
        (F.expr("shiftleft(cell + 1, level)") - F.lit(1)).alias("hi_grid"),
        F.col("cnt").alias("rank_slack"),
        F.col("level").cast("long").alias("level"),
    )
