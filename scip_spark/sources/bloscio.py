"""Pure-Python Blosc-1 frame codec (the container format around zarr's
DEFAULT compressor — numcodecs ``Blosc(cname='lz4', shuffle=SHUFFLE)``).

Spec source: the public c-blosc ``README_HEADER.rst`` + ``blosc.c``
(format version 2). Frame layout::

    byte 0   version (format)          byte 1   versionlz (codec fmt)
    byte 2   flags                     byte 3   typesize
    4..7     nbytes   (int32 LE, uncompressed)
    8..11    blocksize(int32 LE)
    12..15   cbytes   (int32 LE, whole frame incl. header)

flags: bit0 byte-shuffle, bit1 pure-memcpy, bit2 bit-shuffle; bits 5-7
compressor code (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd).

Non-memcpy frames: ``bstarts`` (one int32 LE per block — absolute
offset of the block's data within the frame) follows the header; each
block is ``nsplits`` streams of ``[int32 LE csize][payload]`` where a
``csize`` equal to the stream's uncompressed size marks a stored
(uncompressed) stream. Splitting replicates c-blosc's
FORWARD_COMPAT rule: blosclz/lz4 full blocks with typesize ≤ 16 and
blocksize/typesize ≥ 128 split into ``typesize`` streams; the leftover
(short last) block never splits. Byte-shuffle is per BLOCK: byte ``k``
of every ``typesize``-wide element is grouped together.

Honest compat note (mirrors the r14 codec work's labeling): lz4 and
zlib inner codecs are spec-implemented and pinned by hand-derived
vectors + round-trip matrices; the container has NO c-blosc/numcodecs
binary to cross-validate frames against, so conformance is
spec-derived rather than binary-diffed — blosclz/snappy/zstd and
bit-shuffle fail fast and remain the injected-reader surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from scip_spark.sources import lz4block

_VERSION = 2
_SHUFFLE = 0x1
_MEMCPY = 0x2
_BITSHUFFLE = 0x4
_CODE_LZ4 = 1
_CODE_ZLIB = 3
_CODES = {"lz4": _CODE_LZ4, "zlib": _CODE_ZLIB}
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128


def _nsplits(code: int, typesize: int, blocksize: int, leftover: bool) -> int:
    if leftover:
        return 1
    if (
        code == _CODE_LZ4
        and 1 <= typesize <= _MAX_SPLITS
        and typesize and blocksize // typesize >= _MIN_BUFFERSIZE
        and blocksize % typesize == 0
    ):
        return typesize
    return 1


def _shuffle(block: bytes, typesize: int) -> bytes:
    # c-blosc semantics: shuffle the typesize-divisible prefix, copy
    # the (rare) remainder bytes through untouched
    n = len(block)
    if typesize <= 1 or n < typesize:
        return block
    cut = n - n % typesize
    a = np.frombuffer(block[:cut], dtype=np.uint8).reshape(-1, typesize)
    return a.T.tobytes() + block[cut:]


def _unshuffle(block: bytes, typesize: int) -> bytes:
    n = len(block)
    if typesize <= 1 or n < typesize:
        return block
    cut = n - n % typesize
    a = np.frombuffer(block[:cut], dtype=np.uint8).reshape(typesize, -1)
    return a.T.tobytes() + block[cut:]


def compress(data: bytes, typesize: int, cname: str = "lz4",
             shuffle: bool = True, blocksize: int = 0) -> bytes:
    """Blosc-1 frame for ``data``. ``blocksize=0`` picks 64 KiB (or the
    whole buffer if smaller), rounded down to a typesize multiple."""
    code = _CODES.get(cname)
    if code is None:
        raise ValueError(f"blosc writer supports lz4/zlib, not {cname!r}")
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(nbytes, 65536) or 1
    if typesize > 1:
        blocksize -= blocksize % typesize or 0
        blocksize = max(blocksize, typesize)
    flags = (code << 5) | (_SHUFFLE if shuffle and typesize > 1 else 0)

    blocks = []
    for off in range(0, nbytes, blocksize) or [0]:
        raw = data[off : off + blocksize]
        if flags & _SHUFFLE:
            raw = _shuffle(raw, typesize)
        leftover = len(raw) != blocksize
        ns = _nsplits(code, typesize, blocksize, leftover)
        neblock = len(raw) // ns
        enc = bytearray()
        for s in range(ns):
            piece = raw[s * neblock : (s + 1) * neblock] if ns > 1 else raw
            comp = (
                lz4block.compress(piece)
                if code == _CODE_LZ4
                else zlib.compress(piece, 5)
            )
            if len(comp) >= len(piece):  # stored stream
                enc += struct.pack("<i", len(piece)) + piece
            else:
                enc += struct.pack("<i", len(comp)) + comp
        blocks.append(bytes(enc))

    if nbytes == 0:
        blocks = []
    total_blocks = len(blocks)
    header_len = 16 + 4 * total_blocks
    payload = b"".join(blocks)
    cbytes = header_len + len(payload)
    if cbytes >= nbytes + 16:
        # compression not worth it: pure-memcpy frame
        header = struct.pack(
            "<BBBBiii", _VERSION, 1, (code << 5) | _MEMCPY, max(typesize, 1),
            nbytes, blocksize, nbytes + 16,
        )
        return header + data
    header = struct.pack(
        "<BBBBiii", _VERSION, 1, flags, max(typesize, 1),
        nbytes, blocksize, cbytes,
    )
    bstarts = bytearray()
    off = header_len
    for b in blocks:
        bstarts += struct.pack("<i", off)
        off += len(b)
    return header + bytes(bstarts) + payload


def decompress(frame: bytes) -> bytes:
    if len(frame) < 16:
        raise ValueError("blosc: frame shorter than header")
    version, _versionlz, flags, typesize, nbytes, blocksize, cbytes = struct.unpack(
        "<BBBBiii", frame[:16]
    )
    if cbytes != len(frame):
        raise ValueError(f"blosc: header cbytes {cbytes} != frame {len(frame)}")
    if flags & _BITSHUFFLE:
        raise ValueError("blosc: bit-shuffle needs the blosc package")
    if flags & _MEMCPY:
        if len(frame) - 16 != nbytes:
            raise ValueError("blosc: memcpy frame size mismatch")
        return frame[16:]
    code = flags >> 5
    if code not in (_CODE_LZ4, _CODE_ZLIB):
        raise ValueError(f"blosc: compressor code {code} needs the blosc package")
    if nbytes == 0:
        return b""
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    out = bytearray()
    for j, start in enumerate(bstarts):
        ublock = min(blocksize, nbytes - j * blocksize)
        leftover = ublock != blocksize
        ns = _nsplits(code, typesize, blocksize, leftover)
        neblock = ublock // ns
        pos = start
        raw = bytearray()
        for s in range(ns):
            want = neblock if s < ns - 1 else ublock - neblock * (ns - 1)
            (csize,) = struct.unpack_from("<i", frame, pos)
            pos += 4
            payload = frame[pos : pos + csize]
            pos += csize
            if csize == want:
                raw += payload
            elif code == _CODE_LZ4:
                raw += lz4block.decompress(payload, want)
            else:
                raw += zlib.decompress(payload)
        if len(raw) != ublock:
            raise ValueError("blosc: block decoded to wrong size")
        block = bytes(raw)
        if flags & _SHUFFLE:
            block = _unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc: decoded {len(out)}, expected {nbytes}")
    return bytes(out)
