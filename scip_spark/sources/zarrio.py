"""Spec-level zarr v2 store access, no zarr package needed (VERDICT
r12 #4).

A zarr v2 store is just a directory tree: a group is a dir with
``.zgroup``; an array is a dir with a ``.zarray`` JSON (shape, chunks,
dtype, order, compressor, fill_value) plus one raw binary file per
chunk named ``i.j.k`` (C-order chunk grid indices joined by '.').
With ``compressor: null`` a chunk file is exactly the C-order bytes of
that chunk block — which is all the reference's ragged-cell stores use
(reference zarr.py:89-104 reads shapes from attrs, then fetches cells).

`group_member_shapes` + `fetch_member` accept BOTH ragged layouts
(ADVICE r13):

- the engine's group layout: a group whose members "0", "1", … are
  per-record arrays plus a ``.zattrs`` key ``shapes`` (plural);
- the REFERENCE's layout (src/scip/loading/zarr.py:52-61,89-104): ONE
  array whose first axis indexes records, with ``.zattrs`` keys
  ``shape`` (singular — list of per-record shapes) and
  ``object_number``; record ``idx`` is ``z[idx]`` reshaped to
  ``attrs["shape"][idx]``.

Both are driven through `zarr_meta` / `zarr_attach_pixels` as REAL
bytes. The writers exist so tests can build stores without the zarr
package; production stores written by zarr itself read identically
when uncompressed, numcodecs-zlib/gzip-compressed (stdlib decode,
r14), or — since r15 — compressed with zarr's DEFAULT compressor
family: Blosc frames with lz4/zlib inner codecs and numcodecs lz4,
decoded by the pure-Python spec codecs in sources/bloscio.py /
lz4block.py. blosclz/snappy/zstd payloads and bit-shuffle remain the
injected-fetch surface (documented fail-fast).
"""

from __future__ import annotations

import functools
import itertools
import json
import os

import numpy as np


def _decode_chunk(raw: bytes, meta: dict, path: str) -> bytes:
    """Chunk bytes → C-order block bytes per the store's compressor.
    ``null`` = raw; numcodecs ``zlib``/``gzip`` decode with stdlib zlib
    (wbits=47 auto-detects both framings); ``blosc`` frames with
    lz4/zlib inner codecs and numcodecs ``lz4`` (int32-LE size prefix +
    one LZ4 block) decode through the pure-Python r15 codecs
    (sources/bloscio.py, lz4block.py — zarr's DEFAULT compressor is
    Blosc(cname='lz4'), so real-world stores stopped needing the zarr
    package); blosclz/snappy/zstd payloads and bit-shuffled frames
    still fail loudly."""
    comp = meta.get("compressor")
    if comp is None:
        return raw
    cid = comp.get("id") if isinstance(comp, dict) else None
    if cid in ("zlib", "gzip"):
        import zlib

        return zlib.decompress(raw, 47)
    if cid == "blosc":
        from scip_spark.sources import bloscio

        return bloscio.decompress(raw)
    if cid == "lz4":
        import struct

        from scip_spark.sources import lz4block

        (dst_size,) = struct.unpack_from("<i", raw, 0)
        return lz4block.decompress(raw[4:], dst_size)
    raise ValueError(
        f"zarr compressor {cid!r} needs the zarr package: {path}"
    )


def _store_json(path: str) -> dict:
    """Parsed .zattrs/.zarray, cached per process KEYED ON MTIME: the
    reference single-array layout fetches every record through the SAME
    store, and an uncached read would re-parse the R-element shapes
    attribute per record — O(R²) metadata work per store (r14 review).
    The mtime key means a rewritten store invalidates naturally in
    EVERY process — including reused executor Python workers the
    driver-side cache_clear() in the writers cannot reach (ADVICE r14
    + review r15 #2); the stat() per call is noise next to the chunk
    reads that follow."""
    st = os.stat(path)
    return _store_json_at(path, st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=256)
def _store_json_at(path: str, mtime_ns: int, size: int) -> dict:
    with open(path) as f:
        return json.load(f)


#: writer-side belt-and-braces (same-process, same-mtime-resolution
#: rewrites): the mtime key is the real invalidation mechanism.
_store_json.cache_clear = _store_json_at.cache_clear  # type: ignore[attr-defined]


def write_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = None,
) -> None:
    """Write ``arr`` as a zarr v2 array directory. ``compressor``:
    ``None`` (raw chunks), ``"zlib"``, ``"blosc-lz4"`` /
    ``"blosc-zlib"`` (Blosc-1 frames, byte-shuffled) or ``"lz4"``
    (numcodecs size-prefixed block)."""
    arr = np.asarray(arr)
    chunks = tuple(chunks) if chunks else arr.shape
    if len(chunks) != arr.ndim:
        raise ValueError(f"chunks rank {len(chunks)} != array rank {arr.ndim}")
    comp_meta = {
        None: None,
        "zlib": {"id": "zlib", "level": 6},
        # numcodecs-style Blosc metadata (zarr's default compressor
        # family); shuffle=1 is byte-shuffle, numcodecs' default
        "blosc-lz4": {"id": "blosc", "cname": "lz4", "clevel": 5,
                      "shuffle": 1, "blocksize": 0},
        "blosc-zlib": {"id": "blosc", "cname": "zlib", "clevel": 5,
                       "shuffle": 1, "blocksize": 0},
        "lz4": {"id": "lz4", "acceleration": 1},
    }
    if compressor not in comp_meta:
        raise ValueError(f"unsupported compressor {compressor!r}")
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": comp_meta[compressor],
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    # a same-process read may have cached this path's old metadata
    # (fixture regeneration, tests reusing a directory) — invalidate
    _store_json.cache_clear()
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
        payload = np.ascontiguousarray(block).tobytes()
        if compressor == "zlib":
            import zlib

            payload = zlib.compress(payload, 6)
        elif compressor in ("blosc-lz4", "blosc-zlib"):
            from scip_spark.sources import bloscio

            payload = bloscio.compress(
                payload, arr.dtype.itemsize,
                cname=compressor.split("-")[1], shuffle=True,
            )
        elif compressor == "lz4":
            import struct

            from scip_spark.sources import lz4block

            payload = struct.pack("<i", len(payload)) + lz4block.compress(
                payload
            )
        with open(os.path.join(path, ".".join(map(str, idx))), "wb") as f:
            f.write(payload)


def read_array(path: str) -> np.ndarray:
    """Read a zarr v2 array directory back as ndarray (raw or
    numcodecs-zlib/gzip chunks)."""
    meta = _store_json(os.path.join(path, ".zarray"))
    if meta.get("filters"):
        raise ValueError(f"zarr filters need the zarr package: {path}")
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
        raw = _decode_chunk(open(cf, "rb").read(), meta, path)
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sel] = block[tuple(slice(0, s.stop - s.start) for s in sel)]
    return out


def write_group(path: str, arrays: list[np.ndarray], chunks=None,
                compressor: str | None = None) -> None:
    """Ragged store: a zarr v2 group with one member array per record
    ("0", "1", …) plus a shapes attribute (what zarr_meta consumes)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump({"shapes": [list(a.shape) for a in arrays]}, f)
    for i, a in enumerate(arrays):
        write_array(os.path.join(path, str(i)), a, chunks=chunks,
                    compressor=compressor)


def write_ragged_array(
    path: str,
    arrays: list[np.ndarray],
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = None,
) -> None:
    """Reference-layout ragged store (src/scip/loading/zarr.py:52-61):
    ONE 2-D array, row ``i`` = record ``i`` flattened (zero-padded to
    the widest record), with ``.zattrs`` ``shape`` (singular, the
    per-record shapes) and ``object_number``."""
    flats = [np.asarray(a).ravel() for a in arrays]
    width = max((f.size for f in flats), default=0)
    mat = np.zeros((len(flats), width), dtype=flats[0].dtype if flats else np.float32)
    for i, f in enumerate(flats):
        mat[i, : f.size] = f
    write_array(path, mat, chunks=chunks, compressor=compressor)  # clears the metadata cache
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump(
            {
                "shape": [list(np.asarray(a).shape) for a in arrays],
                "object_number": list(range(len(arrays))),
            },
            f,
        )
    _store_json.cache_clear()  # .zattrs may also have been cached stale


def group_member_shapes(path: str) -> list[list[int]]:
    """The per-record shapes of a ragged store, from .zattrs — the
    driver-side metadata read feeding zarr_meta (S6). Accepts the
    engine group layout (``shapes``) and the reference single-array
    layout (``shape`` — reference zarr.py:89-104)."""
    attrs = _store_json(os.path.join(path, ".zattrs"))
    if "shapes" in attrs:
        return attrs["shapes"]
    if "shape" in attrs:
        return attrs["shape"]
    raise ValueError(f"no 'shapes'/'shape' attribute in {path}/.zattrs")


def _read_array_row(path: str, idx: int) -> np.ndarray:
    """Row ``idx`` of a C-order array store, reading ONLY the chunk
    files that intersect that row (first-axis chunk pruned)."""
    meta = _store_json(os.path.join(path, ".zarray"))
    if meta.get("filters"):
        raise ValueError(f"zarr filters need the zarr package: {path}")
    if meta.get("order", "C") != "C":  # same guard as read_array — a
        # Fortran-order store would silently decode wrong pixel values
        raise ValueError(f"only C-order stores supported: {path}")
    shape, chunks = tuple(meta["shape"]), tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    out = np.full(shape[1:], meta.get("fill_value") or 0, dtype=dtype)
    c0 = chunks[0]
    i0, off = idx // c0, idx % c0
    grid = [range((s + c - 1) // c) for s, c in zip(shape[1:], chunks[1:])]
    for rest in itertools.product(*grid):
        cf = os.path.join(path, ".".join(map(str, (i0, *rest))))
        if not os.path.exists(cf):
            continue
        raw = _decode_chunk(open(cf, "rb").read(), meta, path)
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(rest, chunks[1:], shape[1:])
        )
        out[sel] = block[off][tuple(slice(0, s.stop - s.start) for s in sel)]
    return out


def fetch_member(path: str, idx: int) -> np.ndarray:
    """``fetch(path, idx) -> flat ndarray`` with the exact signature
    zarr_attach_pixels expects — reads record ``idx`` from real chunk
    bytes under either ragged layout. For the reference single-array
    layout the row is truncated to the record's true element count
    (rows are padded to the widest record), mirroring
    ``z[idx].reshape(attrs['shape'][idx])``."""
    member = os.path.join(path, str(idx))
    if os.path.isdir(member):
        return read_array(member).ravel()
    if os.path.exists(os.path.join(path, ".zarray")):
        row = _read_array_row(path, idx).ravel()
        n = int(np.prod(group_member_shapes(path)[idx]))
        return row[:n]
    raise ValueError(f"{path} is neither a ragged group nor an array store")
