"""Spec-level zarr v2 store access, no zarr package needed (VERDICT
r12 #4).

A zarr v2 store is just a directory tree: a group is a dir with
``.zgroup``; an array is a dir with a ``.zarray`` JSON (shape, chunks,
dtype, order, compressor, fill_value) plus one raw binary file per
chunk named ``i.j.k`` (C-order chunk grid indices joined by '.').
With ``compressor: null`` a chunk file is exactly the C-order bytes of
that chunk block — which is all the reference's ragged-cell stores use
(reference zarr.py:89-104 reads shapes from attrs, then fetches cells).

`group_member_shapes` + `fetch_member` implement the ragged layout the
engine's S6 path expects: a group whose members "0", "1", … are
per-record arrays (possibly different shapes — ragged), driven through
`zarr_meta` / `zarr_attach_pixels` as REAL bytes. The writer exists so
tests can build stores without the zarr package; production stores
written by zarr itself (compressor null) read identically.
"""

from __future__ import annotations

import itertools
import json
import os

import numpy as np


def write_array(path: str, arr: np.ndarray, chunks: tuple[int, ...] | None = None) -> None:
    """Write ``arr`` as an uncompressed zarr v2 array directory."""
    arr = np.asarray(arr)
    chunks = tuple(chunks) if chunks else arr.shape
    if len(chunks) != arr.ndim:
        raise ValueError(f"chunks rank {len(chunks)} != array rank {arr.ndim}")
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": None,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    grid = [range((s + c - 1) // c) for s, c in zip(arr.shape, chunks)]
    for idx in itertools.product(*grid):
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, arr.shape)
        )
        block = arr[sel]
        # partial edge chunks are stored at FULL chunk shape (zarr v2
        # spec), fill_value-padded
        if block.shape != chunks:
            full = np.full(chunks, meta["fill_value"], dtype=arr.dtype)
            full[tuple(slice(0, b) for b in block.shape)] = block
            block = full
        with open(os.path.join(path, ".".join(map(str, idx))), "wb") as f:
            f.write(np.ascontiguousarray(block).tobytes())


def read_array(path: str) -> np.ndarray:
    """Read an uncompressed zarr v2 array directory back as ndarray."""
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("compressor") is not None or meta.get("filters"):
        raise ValueError(f"compressed zarr store needs the zarr package: {path}")
    if meta.get("order", "C") != "C":
        raise ValueError(f"only C-order stores supported: {path}")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    out = np.full(shape, meta.get("fill_value") or 0, dtype=dtype)
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*grid):
        cf = os.path.join(path, ".".join(map(str, idx)))
        if not os.path.exists(cf):
            continue  # absent chunk = all fill_value
        block = np.frombuffer(open(cf, "rb").read(), dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sel] = block[tuple(slice(0, s.stop - s.start) for s in sel)]
    return out


def write_group(path: str, arrays: list[np.ndarray], chunks=None) -> None:
    """Ragged store: a zarr v2 group with one member array per record
    ("0", "1", …) plus a shapes attribute (what zarr_meta consumes)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump({"shapes": [list(a.shape) for a in arrays]}, f)
    for i, a in enumerate(arrays):
        write_array(os.path.join(path, str(i)), a, chunks=chunks)


def group_member_shapes(path: str) -> list[list[int]]:
    """The per-record shapes of a ragged group store, from .zattrs —
    the driver-side metadata read feeding zarr_meta (S6)."""
    with open(os.path.join(path, ".zattrs")) as f:
        return json.load(f)["shapes"]


def fetch_member(path: str, idx: int) -> np.ndarray:
    """``fetch(path, idx) -> flat ndarray`` with the exact signature
    zarr_attach_pixels expects — reads record ``idx``'s member array
    from real chunk bytes."""
    return read_array(os.path.join(path, str(idx))).ravel()
