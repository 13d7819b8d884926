"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT).

Why: JPEG headed the remaining injected-reader list (TIFF compression
7 strips; multimodal binary image columns). Same playbook as the
r13-r15 TIFF/LZW/blosc work — a REAL spec decoder, small enough to
audit, with an encoder so tests can round-trip real compressed bytes
through the decode path (no PIL/tifffile exists in this container to
generate fixtures).

Coverage: baseline sequential DCT, 8-bit precision, grayscale or
YCbCr color, interleaved scans, 4:4:4 / 4:2:0 / 4:2:2 sampling,
0xFF00 byte stuffing, DRI/RSTn restart intervals, JFIF/APPn/COM
segments skipped. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical modes fail fast — inject a library reader for those.

Validation strategy (JPEG is lossy, so bit-equality with an external
encoder is not the right oracle): (a) DC-only images — blocks that
are constant after level shift — dequantize to EXACT integers, so
flat images must round-trip bit-exactly; (b) smooth gradients must
round-trip within the quantization error bound; (c) stuffed bytes and
restart markers are exercised directly; (d) the entropy layer
(canonical Huffman from Annex-K tables) is pinned by a hand-checked
magnitude-category vector in tests.

Scale note: executor-side, one call per strip/payload, O(pixels).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag order, Annex K quantization + Huffman tables
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU T.81 Annex K.1 — luminance / chrominance quantization tables
QLUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QCHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# DCT-II orthonormal basis: block = C.T @ coeffs @ C reconstructs
_K = np.arange(8)
_C = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.where(
    _K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# --------------------------------------------------------------------------
# Huffman machinery (canonical codes from (bits, values))
# --------------------------------------------------------------------------


def _build_codes(bits, values):
    """symbol -> (code, length), canonical T.81 assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """(maxcode, valptr, mincode) arrays for the T.81 F.16 decode loop,
    plus a flat dict for speed: (length, code) -> symbol."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 destuffing; stops
    AT markers (leaving them for the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def huff(self, lut) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def align(self):
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category ssss, ssss-bit code) — F.1.2.1.1/F.1.4.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array, (H, W) for grayscale or
    (H, W, 3) RGB (JFIF YCbCr -> RGB conversion). Multi-scan baseline
    files (one scan per component) and non-interleaved scans decode
    per T.81 A.2.2. Raises ValueError on any malformed/truncated/
    unsupported stream (the codec family's fail-loudly contract)."""
    try:
        return _decode(data)
    except _MarkerHit as e:
        raise ValueError(
            f"jpeg: unexpected marker 0x{e.marker:04x} inside entropy data"
        ) from e
    except KeyError as e:
        # an abbreviated stream references quant/huffman tables it never
        # defined (they live in an external JPEGTables blob)
        raise ValueError(f"jpeg: stream references undefined table {e}") from e
    except (IndexError, struct.error) as e:
        raise ValueError("jpeg: truncated or corrupt stream") from e


def _decode(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, h, v, tq)
    height = width = 0
    restart_interval = 0
    planes: dict[int, np.ndarray] = {}
    decoded: set[int] = set()
    while True:
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while data[pos] == 0xFF and data[pos + 1] == 0xFF:
            pos += 1
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                qtables[tq] = t.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"jpeg: precision {precision} unsupported")
            height, width = struct.unpack_from(">HH", seg, 1)
            nf = seg[5]
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} (non-baseline) needs an injected reader"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tda >> 4, tda & 0xF))
            pos = _decode_scan(
                data, pos + seglen, comps, scan, qtables, htables,
                height, width, restart_interval, planes,
            )
            decoded.update(cs for cs, _, _ in scan)
            continue
        # APPn/COM/DNL/others: skip
        pos += seglen
    if comps is None or not planes:
        raise ValueError("jpeg: no image scan found")
    missing = [c[0] for c in comps if c[0] not in decoded]
    if missing:
        raise ValueError(f"jpeg: components {missing} never scanned")
    return _assemble(comps, planes, height, width)


def _comp_geometry(comps, height, width):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _decode_scan(data, pos, comps, scan, qtables, htables, height, width,
                 restart_interval, planes):
    """One entropy-coded scan. ``Ns > 1`` decodes MCU-interleaved;
    ``Ns == 1`` decodes the component's data units in raster order per
    T.81 A.2.2 (sampling factors addressed only via the plane size) —
    so grayscale files that declare 2x2 sampling, and per-component
    scans of multi-scan baseline files, both land in the right place.
    Returns the stream position of the next marker."""
    hmax, vmax, mcux, mcuy = _comp_geometry(comps, height, width)
    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    dcsel = {cs: td for cs, td, _ in scan}
    acsel = {cs: ta for cs, _, ta in scan}
    for cid, h, v, _ in comps:
        if cid not in planes:
            planes[cid] = np.zeros(
                (mcuy * v * 8, mcux * h * 8), dtype=np.float64
            )
    pred = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(data, pos)
    state = {"mcu": 0, "rst": 0}

    def maybe_restart():
        if (restart_interval and state["mcu"]
                and state["mcu"] % restart_interval == 0):
            reader.align()
            p = reader.pos
            while data[p] == 0xFF and data[p + 1] == 0xFF:
                p += 1
            if data[p] != 0xFF or not (0xD0 <= data[p + 1] <= 0xD7):
                raise ValueError("jpeg: expected restart marker")
            if data[p + 1] != 0xD0 + state["rst"]:
                raise ValueError("jpeg: restart marker out of sequence")
            state["rst"] = (state["rst"] + 1) % 8
            reader.pos = p + 2
            for k in pred:
                pred[k] = 0
        state["mcu"] += 1

    def one_block(cid, tq, y0, x0):
        q = qtables[tq]
        dlut = htables[(0, dcsel[cid])]
        alut = htables[(1, acsel[cid])]
        coeffs = np.zeros(64, dtype=np.float64)
        t = reader.huff(dlut)
        diff = _extend(reader.read(t), t) if t else 0
        pred[cid] += diff
        coeffs[0] = pred[cid]
        k = 1
        while k < 64:
            rs = reader.huff(alut)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("jpeg: AC run overflow")
            coeffs[k] = _extend(reader.read(s), s)
            k += 1
        block = np.zeros(64, dtype=np.float64)
        block[ZIGZAG] = coeffs
        block = block.reshape(8, 8) * q
        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = _idct2(block) + 128.0

    if len(scan) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, h, v, tq in order:
                    for bv in range(v):
                        for bh in range(h):
                            one_block(
                                cid, tq, (my * v + bv) * 8, (mx * h + bh) * 8
                            )
    else:
        cid, h, v, tq = order[0]
        # non-interleaved: raster over the component's own block grid
        comp_h = (height * v + vmax - 1) // vmax
        comp_w = (width * h + hmax - 1) // hmax
        by = (comp_h + 7) // 8
        bx = (comp_w + 7) // 8
        for yb in range(by):
            for xb in range(bx):
                maybe_restart()
                one_block(cid, tq, yb * 8, xb * 8)
    # past the scan: skip the (≤7) pad bits to the next marker
    p = reader.pos
    while not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _assemble(comps, planes, height, width):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, h, v, _ in comps:
        plane = planes[cid]
        ry, rx = vmax // v, hmax // h
        if ry > 1 or rx > 1:  # upsample by pixel replication
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full interchange stream into (JPEGTables, abbreviated
    stream) per TIFF/EP: tables = SOI + every DQT/DHT segment + EOI;
    the abbreviated stream keeps everything else. The TIFF reader's
    tag-347 splice reverses this exactly."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(stream):
        marker = stream[pos + 1]
        if marker == 0xDA:
            rest += stream[pos:]  # SOS + entropy data + EOI
            return bytes(tables + b"\xff\xd9"), bytes(rest)
        (ln,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + ln]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + ln
    raise ValueError("jpeg: no SOS in stream")


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(w, block, q, dc_codes, ac_codes, pred):
    coeffs = _fdct2(block.astype(np.float64) - 128.0)
    quant = np.rint(coeffs / q).astype(np.int32)
    # zigzag-serialize: element i of the stream is flat index ZIGZAG[i]
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    c, ln = dc_codes[t]
    w.write(c, ln)
    if t:
        w.write(code, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        w.write(c, ln)
        w.write(code, t)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def encode(img: np.ndarray, quality: int = 90, subsample: str = "4:4:4",
           restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF bytes
    (Annex K tables scaled by ``quality``)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("jpeg encoder wants uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"need (H,W) or (H,W,3), got {img.shape}")
    h, w_ = img.shape[:2]
    qy = _scaled_q(QLUMA, quality)
    qc = _scaled_q(QCHROMA, quality)

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "4:4:4":
            sf = (1, 1)
        elif subsample == "4:2:0":
            sf = (2, 2)
        elif subsample == "4:2:2":
            sf = (2, 1)
        else:
            raise ValueError(f"unsupported subsampling {subsample}")
        comps = [(1, sf[0], sf[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [y, _downsample(cb, sf), _downsample(cr, sf)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its MCU-aligned size with edge replication
    padded = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        padded.append(_pad_edge(plane, ph, pw))

    dc_y = _build_codes(*HT_DC_LUMA)
    ac_y = _build_codes(*HT_AC_LUMA)
    dc_c = _build_codes(*HT_DC_CHROMA)
    ac_c = _build_codes(*HT_AC_CHROMA)

    wtr = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    body = bytearray()
    mcu_count = 0
    next_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                body += wtr.out
                body += bytes([0xFF, 0xD0 + next_rst])
                next_rst = (next_rst + 1) % 8
                wtr = _BitWriter()
                pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for (cid, ch, cv, tq), plane in zip(comps, padded):
                q = qy if tq == 0 else qc
                dct_, act_ = (dc_y, ac_y) if tq == 0 else (dc_c, ac_c)
                for bv in range(cv):
                    for bh in range(ch):
                        y0 = (my * cv + bv) * 8
                        x0 = (mx * ch + bh) * 8
                        pred[cid] = _encode_block(
                            wtr, plane[y0 : y0 + 8, x0 : x0 + 8], q,
                            dct_, act_, pred[cid],
                        )
    wtr.flush()
    body += wtr.out

    # ---- headers ----
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, bytes(sof))

    def dht(tc, th, table):
        bits, values = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    out += dht(0, 0, HT_DC_LUMA)
    out += dht(1, 0, HT_AC_LUMA)
    if not gray:
        out += dht(0, 1, HT_DC_CHROMA)
        out += dht(1, 1, HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for cid, ch, cv, tq in comps:
        td_ta = 0x00 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])  # Ss/Se/AhAl (baseline)
    out += seg(0xDA, bytes(sos))
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def _downsample(plane: np.ndarray, sf: tuple[int, int]) -> np.ndarray:
    fh, fv = sf  # luma sampling factors => chroma shrink factors
    if fh == 1 and fv == 1:
        return plane
    h, w_ = plane.shape
    ph, pw = ((h + fv - 1) // fv) * fv, ((w_ + fh - 1) // fh) * fh
    p = _pad_edge(plane, ph, pw)
    return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w_ = plane.shape
    if (h, w_) == (ph, pw):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w_)), mode="edge")
