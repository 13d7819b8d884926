"""Minimal pure-Python baseline-TIFF codec (VERDICT r12 #4).

The container has no tifffile/aicsimageio, so until r13 the S4/S5 pixel
paths (reference test/loading/test_tiff.py:6-21 reads actual files)
only ever ran against injected fakes — a byte-order or frame-seek bug
in a real deployment would have passed every test. This module is a
REAL decoder for the uncompressed single-sample subset of TIFF 6.0
(both byte orders, uint8/16/32 + int8/16/32 + float32/64, multi-strip,
multi-frame IFD chains), small enough to audit, used as the default
`reader=` for `attach_pixels` when tifffile is absent. Production
deployments with exotic TIFFs (compression, tiles, RGB) inject
`tifffile.imread` exactly as before.

The encoder exists so tests can round-trip REAL bytes through the
decode path; it writes one strip per frame, which every TIFF reader
(including this one) accepts.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF 6.0 tag ids (the baseline-grayscale subset)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_SAMPLE_FORMAT = 339

#: TIFF field type -> (struct code, byte size); the subset we emit/read
_FIELD_TYPES = {3: ("H", 2), 4: ("I", 4)}  # SHORT, LONG

_SAMPLE_FMT_UINT = 1
_SAMPLE_FMT_INT = 2
_SAMPLE_FMT_FLOAT = 3

_FMT_TO_KIND = {_SAMPLE_FMT_UINT: "u", _SAMPLE_FMT_INT: "i", _SAMPLE_FMT_FLOAT: "f"}
_KIND_TO_FMT = {v: k for k, v in _FMT_TO_KIND.items()}


def _read_ifd(buf: bytes, off: int, en: str) -> tuple[dict[int, list[int]], int]:
    """One IFD at ``off``: {tag: [values...]}, plus next-IFD offset."""
    (n_entries,) = struct.unpack_from(en + "H", buf, off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(en + "HHI", buf, base)
        if ftype not in _FIELD_TYPES:
            continue  # rational/ascii tags are irrelevant to pixel decode
        code, size = _FIELD_TYPES[ftype]
        total = size * count
        if total <= 4:
            vals = list(struct.unpack_from(en + code * count, buf, base + 8))
        else:
            (ptr,) = struct.unpack_from(en + "I", buf, base + 8)
            vals = list(struct.unpack_from(en + code * count, buf, ptr))
        tags[tag] = vals
    (nxt,) = struct.unpack_from(en + "I", buf, off + 2 + 12 * n_entries)
    return tags, nxt


def read_tiff(path: str) -> np.ndarray:
    """Decode an uncompressed single-sample TIFF. Returns a 2-D array
    for single-frame files, a (frames, H, W) stack for multi-frame
    (frame = IFD, the layout multiframe_tiff_meta expects — reference
    tiff.py loads frames as channels)."""
    with open(path, "rb") as f:
        buf = f.read()
    order = buf[:2]
    if order == b"II":
        en = "<"
    elif order == b"MM":
        en = ">"
    else:
        raise ValueError(f"not a TIFF (bad byte-order mark {order!r}): {path}")
    (magic,) = struct.unpack_from(en + "H", buf, 2)
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic {magic}): {path}")
    (ifd_off,) = struct.unpack_from(en + "I", buf, 4)
    frames = []
    while ifd_off:
        tags, ifd_off = _read_ifd(buf, ifd_off, en)
        if tags.get(_COMPRESSION, [1])[0] != 1:
            raise ValueError(f"compressed TIFF needs an injected reader: {path}")
        if tags.get(_SAMPLES_PER_PIXEL, [1])[0] != 1:
            raise ValueError(f"multi-sample TIFF needs an injected reader: {path}")
        width = tags[_IMAGE_WIDTH][0]
        height = tags[_IMAGE_LENGTH][0]
        bits = tags.get(_BITS_PER_SAMPLE, [8])[0]
        fmt = tags.get(_SAMPLE_FORMAT, [_SAMPLE_FMT_UINT])[0]
        kind = _FMT_TO_KIND.get(fmt)
        if kind is None or bits % 8:
            raise ValueError(f"unsupported sample format {fmt}/{bits}: {path}")
        dtype = np.dtype(f"{en}{kind}{bits // 8}")
        offsets = tags[_STRIP_OFFSETS]
        counts = tags.get(_STRIP_BYTE_COUNTS)
        if counts is None:
            # defaulting is only sound for a single full-frame strip; a
            # multi-strip file without byte counts would silently decode
            # from the first strip only (ADVICE r13) — fail loudly
            if len(offsets) > 1:
                raise ValueError(
                    f"multi-strip TIFF missing StripByteCounts: {path}"
                )
            counts = [height * width * dtype.itemsize]
        raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
        frame = np.frombuffer(raw, dtype=dtype, count=height * width)
        frames.append(frame.reshape(height, width))
    if not frames:
        raise ValueError(f"TIFF has no IFDs: {path}")
    return frames[0] if len(frames) == 1 else np.stack(frames)


def write_tiff(path: str, array: np.ndarray, byteorder: str = "<") -> None:
    """Encode a 2-D array (or a (frames, H, W) stack as a multi-frame
    IFD chain) as an uncompressed single-strip-per-frame TIFF."""
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3:
        raise ValueError(f"need 2-D or 3-D (frames,H,W), got {arr.shape}")
    if arr.dtype.kind not in _KIND_TO_FMT:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    en = byteorder
    n_frames, height, width = arr.shape
    dtype = arr.dtype.newbyteorder(en)
    entries = 10  # tags per IFD, fixed below
    ifd_size = 2 + 12 * entries + 4
    header = 8
    strip_size = height * width * dtype.itemsize
    # layout: header | frame strips | IFDs
    strips_off = [header + i * strip_size for i in range(n_frames)]
    ifds_off = [header + n_frames * strip_size + i * ifd_size for i in range(n_frames)]

    def entry(tag: int, ftype: int, count: int, value: int) -> bytes:
        code, size = _FIELD_TYPES[ftype]
        inline = struct.pack(en + code, value)
        return struct.pack(en + "HHI", tag, ftype, count) + inline.ljust(4, b"\0")

    out = [struct.pack(en + "2sHI", b"II" if en == "<" else b"MM", 42, ifds_off[0])]
    for i in range(n_frames):
        out.append(np.ascontiguousarray(arr[i], dtype=dtype).tobytes())
    for i in range(n_frames):
        tags = b"".join(
            [
                entry(_IMAGE_WIDTH, 4, 1, width),
                entry(_IMAGE_LENGTH, 4, 1, height),
                entry(_BITS_PER_SAMPLE, 3, 1, dtype.itemsize * 8),
                entry(_COMPRESSION, 3, 1, 1),
                entry(_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
                entry(_STRIP_OFFSETS, 4, 1, strips_off[i]),
                entry(_SAMPLES_PER_PIXEL, 3, 1, 1),
                entry(_ROWS_PER_STRIP, 4, 1, height),
                entry(_STRIP_BYTE_COUNTS, 4, 1, strip_size),
                entry(_SAMPLE_FORMAT, 3, 1, _KIND_TO_FMT[dtype.kind]),
            ]
        )
        nxt = ifds_off[i + 1] if i + 1 < n_frames else 0
        out.append(struct.pack(en + "H", entries) + tags + struct.pack(en + "I", nxt))
    with open(path, "wb") as f:
        f.write(b"".join(out))
