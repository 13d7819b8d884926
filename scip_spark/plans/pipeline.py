"""Config-driven pipeline builder — the reference's YAML lifecycle
re-expressed as declarative DataFrame plan construction.

Reference: ``main()`` hard-wires stage order loading → projection →
illumination → segmentation → sampling → masking fan-out → filter →
normalization → features → export, each gated on its config key
(src/scip/main.py:63-282; YAML spec docs/source/usage.rst:12-87).

Here the same config dict drives construction of a Catalyst plan.
Divergence by design (SURVEY §7.0): multi-mask fan-out branches share
one cached upstream and rejoin on the record key — never the
reference's fragile positional concat (main.py:268).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scip_spark.operators import masking as M
from scip_spark.operators import features as FE
from scip_spark.operators.illumination import correct
from scip_spark.operators.normalization import quantile_normalization
from scip_spark.operators.projection import project
from scip_spark.operators.segmentation import segment_labels, to_events
from scip_spark.operators.threshold_filter import population_filter

STAGES = [
    "project",
    "illumination_correction",
    "segment",
    "sample",
    "mask",
    "filter",
    "normalization",
    "feature_extraction",
]


class BuildCaches:
    """Ownership handle for the DataFrames ``build`` persists.

    The fan-out cache and the population filter's summed relation must
    outlive ``build`` (the caller's terminal action consumes them), so
    they cannot be unpersisted inside the builder; without a handle
    each pipeline build leaks one cached relation per mask branch for
    the session lifetime. Pass an instance to ``build`` and call
    :meth:`unpersist` once the terminal action (write/collect) has run.
    """

    def __init__(self) -> None:
        self.frames: list[DataFrame] = []

    def add(self, frame: DataFrame) -> DataFrame:
        self.frames.append(frame)
        return frame

    def unpersist(self, blocking: bool = False) -> None:
        while self.frames:
            try:
                self.frames.pop().unpersist(blocking)
            except Exception:  # noqa: BLE001 — session may be stopped
                pass


def build(
    df: DataFrame, config: dict[str, Any], caches: BuildCaches | None = None
) -> DataFrame | dict[str, DataFrame]:
    """Compose the stage operators per config. Returns one feature
    DataFrame, or a dict of branch frames when multiple mask methods
    are configured without a join key.

    Config keys mirror the reference's YAML sections::

        {"project": {"op": "max"},
         "illumination_correction": {"key": "group"},
         "segment": {"backend": "watershed", "parent_channel": 0},
         "sample": {"n": 100, "seed": 42},
         "mask": {"methods": ["otsu"], "main_channel": 0},
         "filter": {"channel": 0},
         "normalization": {"key": "group"},
         "feature_extraction": {"nchannels": 3, "families": [...]}}
    """
    cfg = {k: v for k, v in config.items() if v is not None}

    from scip_spark.schema import ensure_event_columns

    df = ensure_event_columns(df)

    if "project" in cfg:
        df = project(df, **cfg["project"])
    if "illumination_correction" in cfg:
        df = correct(df, **cfg["illumination_correction"])
    if "segment" in cfg:
        seg = cfg["segment"]
        df = segment_labels(df, **seg)
        df = to_events(df, parent_channel=seg.get("parent_channel", 0))
    if "sample" in cfg:
        n = cfg["sample"]["n"]
        seed = cfg["sample"].get("seed", 42)
        df = df.orderBy(F.rand(seed)).limit(n)

    mask_cfg = cfg.get("mask", {"methods": []})
    methods = mask_cfg.get("methods", [])
    if not methods:
        branches = {"raw": df}
    else:
        df = df.cache()  # J6 fan-out: one upstream, N mask branches
        if caches is not None:
            caches.add(df)
        branches = {
            m: M.apply_mask(M.get_mask(df, m, **mask_cfg.get("kwargs", {})))
            for m in methods
        }

    outs: dict[str, DataFrame] = {}
    for name, branch in branches.items():
        b = branch
        if "filter" in cfg:
            fkw = dict(cfg["filter"])
            # when normalization follows, precompute per-record extents
            # in the filter's (already-decoded) pass: group_extents then
            # needs no second tensor decode over the persisted relation
            fkw.setdefault("with_extents", "normalization" in cfg)
            b = population_filter(b, caches=caches, **fkw)
        if "normalization" in cfg:
            b = quantile_normalization(b, **cfg["normalization"])
        if "feature_extraction" in cfg:
            fe = cfg["feature_extraction"]
            b = FE.extract_features(b, fe["nchannels"], fe.get("families"))
            # P9: branch-name prefixing of feature columns
            if len(branches) > 1:
                b = b.select(
                    *[
                        F.col(c).alias(f"feat_{name}_{c[5:]}") if c.startswith("feat_") else F.col(c)
                        for c in b.columns
                    ]
                )
        outs[name] = b

    if len(outs) == 1:
        return next(iter(outs.values()))

    # J1 replacement: keyed join of branch feature frames
    keys = ["path", "group", "id", "object_number"]
    it = iter(outs.items())
    _, joined = next(it)
    for name, b in it:
        drop = [c for c in b.columns if c in joined.columns and c not in keys]
        joined = joined.join(b.drop(*drop), on=keys, how="inner")
    return joined
