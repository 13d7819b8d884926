"""Pure-Python LZ4 *block* codec (the format inside blosc/lz4 zarr
chunks and the lz4 "block" API — NOT the framed `.lz4` file format).

Why it exists: the container has no lz4/blosc/numcodecs, so zarr
stores compressed with the ecosystem's DEFAULT compressor (numcodecs
Blosc(cname='lz4')) could until r15 only fail fast or go through an
injected reader. The block format is small and fully specified
(lz4_Block_format.md in the public LZ4 repo), so — same playbook as
the r14 TIFF-LZW work — this is a REAL decoder, pinned to a
hand-derived spec vector, with a greedy spec-conforming compressor so
tests can round-trip real bytes through the decode path.

Format (decoder contract):
- a block is a sequence of *sequences*; each sequence is
  ``[token][literal-length ext*][literals][offset lo hi][match-length ext*]``
- token high nibble = literal count (15 ⇒ extension bytes follow, each
  adding 0-255, terminated by a byte < 255); token low nibble = match
  length − 4 (same 15/extension scheme); matches copy
  ``matchlen`` bytes from ``offset`` (1-65535, little-endian) bytes
  back in the OUTPUT — overlapping copies replicate (offset < len).
- the final sequence is literals-only: token low nibble unused, no
  offset follows.

Scale note: this runs executor-side inside the zarr chunk fetch (one
call per chunk, O(chunk bytes)); nothing here touches Spark.
"""

from __future__ import annotations

_MINMATCH = 4


def decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 block into exactly ``dst_size`` bytes."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        # --- literals ---
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lz4: truncated literals")
        out += src[i : i + lit]
        i += lit
        if i == n:  # last sequence: literals only
            break
        # --- match ---
        if i + 2 > n:
            raise ValueError("lz4: truncated offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: invalid offset {offset} at {len(out)}")
        mlen = (token & 0xF) + _MINMATCH
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        # match copy. Non-overlapping: one slice. Overlapping (offset <
        # mlen) replicates the tail — double the copied region instead
        # of a per-byte Python loop (zarr's zero-padded ragged rows are
        # exactly long RLE matches; review r15 #6)
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            tail = bytes(out[start:])
            reps = -(-mlen // len(tail))  # ceil division
            out += (tail * reps)[:mlen]
    if len(out) != dst_size:
        raise ValueError(f"lz4: decoded {len(out)} bytes, expected {dst_size}")
    return bytes(out)


def compress(src: bytes) -> bytes:
    """Greedy hash-chain LZ4 block encoder (spec-conforming output; not
    ratio-competitive with the reference encoder, which is fine — the
    decoder is the load-bearing half, and any conforming stream
    exercises it). Honors the spec's end conditions: the last 5 bytes
    are always literals and a match never starts within the last 12."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    # spec: last match must start at least 12 bytes before block end
    limit = n - 12
    while i <= limit:
        key = src[i : i + _MINMATCH]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + _MINMATCH] == key:
            # extend the match (stop so the last 5 bytes stay literals)
            mend = n - 5
            mlen = _MINMATCH
            while i + mlen < mend and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            _emit(out, src[anchor:i], i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    _emit(out, src[anchor:], None, 0)  # final literals-only sequence
    return bytes(out)


def _emit(out: bytearray, literals: bytes, offset: int | None, mlen: int) -> None:
    lit = len(literals)
    ml = 0 if offset is None else mlen - _MINMATCH
    token_lit = 15 if lit >= 15 else lit
    token_ml = 15 if ml >= 15 else ml
    out.append((token_lit << 4) | (token_ml if offset is not None else 0))
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += literals
    if offset is None:
        return
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
