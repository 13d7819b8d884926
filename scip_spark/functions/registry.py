"""Extension registry — the engine's pluggable-operator surface.

The reference's extension mechanism is config-named module dispatch
(``import_module('scip.masking.%s' % method)`` — reference
src/scip/main.py:140,160,167,216). Here the same YAML names resolve
through one typed registry: per-record map kernels (scalar-UDF analog),
grouped aggregators (UDAF analog), 1→N expanders (UDTF analog), and
loader sources (DataSource analog). Users register their own with a
decorator; the pipeline builder resolves by (kind, name).
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[tuple[str, str], Callable[..., Any]] = {}

KINDS = ("map", "agg", "expand", "source", "mask", "filter", "projection", "feature")


def register_op(kind: str, name: str):
    if kind not in KINDS:
        raise ValueError(f"unknown extension kind {kind!r}; expected one of {KINDS}")

    def deco(fn):
        _REGISTRY[(kind, name)] = fn
        return fn

    return deco


def resolve(kind: str, name: str) -> Callable[..., Any]:
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        avail = sorted(n for k, n in _REGISTRY if k == kind)
        raise KeyError(f"no {kind!r} operator named {name!r}; available: {avail}") from None


def registered(kind: str | None = None) -> list[tuple[str, str]]:
    return sorted(k for k in _REGISTRY if kind is None or k[0] == kind)


def _install_builtins() -> None:
    """Wire the built-in operators under their reference config names."""
    from scip_spark.operators import masking as M
    from scip_spark.operators.illumination import correct
    from scip_spark.operators.normalization import quantile_normalization
    from scip_spark.operators.projection import project
    from scip_spark.operators.segmentation import (
        segment_cellpose,
        segment_labels,
        to_events,
    )
    from scip_spark.operators.threshold_filter import population_filter
    from scip_spark.sources import filescan

    for name, fn in M.MASK_METHODS.items():
        _REGISTRY[("mask", name)] = fn
    for name, fn in M.FILTERS.items():
        _REGISTRY[("filter", name)] = fn
    _REGISTRY[("projection", "max")] = lambda df: project(df, "max")
    _REGISTRY[("projection", "mean")] = lambda df: project(df, "mean")
    _REGISTRY[("map", "illumination_correction")] = correct
    _REGISTRY[("map", "quantile_normalization")] = quantile_normalization
    _REGISTRY[("map", "population_filter")] = population_filter
    _REGISTRY[("expand", "to_events")] = to_events
    _REGISTRY[("map", "segment_watershed")] = segment_labels
    _REGISTRY[("map", "segment_cellpose")] = segment_cellpose
    _REGISTRY[("source", "tiff")] = filescan.tiff_meta
    _REGISTRY[("source", "multiframe_tiff")] = filescan.multiframe_tiff_meta
    _REGISTRY[("source", "zarr")] = filescan.zarr_meta
    _REGISTRY[("source", "czi")] = filescan.czi_meta
    _REGISTRY[("source", "czi_pixels")] = filescan.czi_attach_pixels


_install_builtins()
