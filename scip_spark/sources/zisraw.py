"""Pure-Python ZISRAW (CZI) container access — uncompressed subblocks.

Why: CZI was the last source format with NO real-bytes path (reference
src/scip/loading/czi.py:35-46 delegates wholesale to aicsimageio,
absent here), so S8/S9 only ever ran against injected fakes. The
ZISRAW container layout is publicly documented (Zeiss "ZISRAW (CZI)
File Format Design specification"; the libCZI sources mirror it), and
microscopy CZIs are very often stored with UNCOMPRESSED subblocks —
so, same playbook as the zarr/blosc work, this module parses the real
binary container: 32-byte segment headers on 32-byte alignment, the
ZISRAWFILE header, the ZISRAWDIRECTORY subblock directory with its
DV directory entries + dimension entries, the ZISRAWMETADATA XML
(scene names read from the documented
Information/Image/Dimensions/S/Scenes path), and raw Gray8/Gray16/
Gray32Float subblock payloads addressed by (S)cene, (M)osaic-tile and
(C)hannel dimensions.

Honest compat note (as for blosc): there is no libCZI/aicsimageio
binary in this container to diff files against, so conformance is
spec-derived — pinned by a writer/reader pair that follows the same
published layout, byte-level header assertions in tests, and the
committed fixture driving a driver-verified checksum query.
JPEG-XR/zstd-compressed subblocks, pyramids and attachments fail
fast; production deployments with those inject aicsimageio exactly
as before.

Scale note: `scene_inventory` is one driver-side directory read per
file (the reference's meta path is driver-side too, czi.py:65-93);
pixel fetches run executor-side, one seek+read per subblock.
"""

from __future__ import annotations

import struct
import uuid
import xml.etree.ElementTree as ET

import numpy as np

_SEG_HEADER = 32  # char Id[16] + int64 AllocatedSize + int64 UsedSize
_ALIGN = 32

#: DirectoryEntryDV pixel types (spec table) this codec implements
_PIXEL_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32}
_DTYPE_PIXEL = {np.dtype(v).str.lstrip("<>|="): k for k, v in _PIXEL_DTYPES.items()}

_COMP_UNCOMPRESSED = 0


def _pad(n: int, align: int = _ALIGN) -> int:
    return (n + align - 1) // align * align


def _seg_header(seg_id: bytes, used: int) -> bytes:
    alloc = _pad(used)
    return seg_id.ljust(16, b"\0") + struct.pack("<qq", alloc, used)


def _dir_entry(pixel_type: int, file_pos: int, dims: list[tuple[bytes, int, int]]) -> bytes:
    """DirectoryEntryDV: 'DV' schema + fixed 32 bytes + 20 per
    dimension entry (Dimension char[4], Start, Size, StartCoordinate,
    StoredSize)."""
    out = b"DV" + struct.pack(
        "<iqii", pixel_type, file_pos, 0, _COMP_UNCOMPRESSED
    )
    out += bytes(6)  # PyramidType + spare[5]
    out += struct.pack("<i", len(dims))
    for name, start, size in dims:
        out += name.ljust(4, b"\0") + struct.pack("<iifi", start, size, 0.0, size)
    return out


def write_czi(
    path: str,
    scenes: dict[str, list[np.ndarray]],
    subblock_xml: str | None = None,
) -> None:
    """Minimal spec-layout CZI: one uncompressed subblock per
    (scene, tile, channel) plane, dimensions S/M/C/Y/X; scene names in
    the metadata XML under the documented Scenes path. Every tile is a
    C×H×W ndarray (uint8/uint16/float32). ``subblock_xml`` attaches
    per-subblock metadata (as Zen does for acquisition timestamps), so
    readers must honor the data-offset rule data = max(256, fixed) +
    MetadataSize — the fixture pins that path. Byte-deterministic for
    fixed inputs (the file GUID hashes the scene names, not the
    path)."""
    scene_names = list(scenes)
    xml_scenes = "".join(
        f'<Scene Index="{i}" Name="{name}"/>' for i, name in enumerate(scene_names)
    )
    xml = (
        "<ImageDocument><Metadata><Information><Image><Dimensions>"
        f"<S><Scenes>{xml_scenes}</Scenes></S>"
        "</Dimensions></Image></Information></Metadata></ImageDocument>"
    ).encode()

    # ---- lay out segments: header | metadata | subblocks… | directory
    file_header_used = 80
    meta_pos = _pad(_SEG_HEADER + file_header_used)
    meta_used = 256 + len(xml)
    pos = _pad(meta_pos + _SEG_HEADER + meta_used)

    blocks = []  # (segment_offset, dir_entry_bytes, payload)
    dir_entries = []
    for s_idx, name in enumerate(scene_names):
        for m_idx, tile in enumerate(scenes[name]):
            tile = np.asarray(tile)
            if tile.ndim != 3:
                raise ValueError(f"tile must be CxHxW, got {tile.shape}")
            key = tile.dtype.str.lstrip("<>|=")
            if key not in _DTYPE_PIXEL:
                raise ValueError(f"unsupported dtype {tile.dtype}")
            ptype = _DTYPE_PIXEL[key]
            c, h, w = tile.shape
            for ch in range(c):
                plane = np.ascontiguousarray(
                    tile[ch], dtype=np.dtype(tile.dtype).newbyteorder("<")
                )
                data = plane.tobytes()
                dims = [
                    (b"S", s_idx, 1),
                    (b"M", m_idx, 1),
                    (b"C", ch, 1),
                    (b"Y", 0, h),
                    (b"X", 0, w),
                ]
                entry = _dir_entry(ptype, pos, dims)
                sb_meta = (subblock_xml or "").encode()
                fixed = 16 + len(entry)  # Metadata/Attachment/DataSize + entry
                # ZISRAW layout: metadata at max(256, fixed), DATA after it
                meta_off = max(256, fixed)
                data_off = meta_off + len(sb_meta)
                used = data_off + len(data)
                payload = (
                    struct.pack("<iiq", len(sb_meta), 0, len(data))
                    + entry
                    + bytes(meta_off - fixed)
                    + sb_meta
                    + data
                )
                blocks.append((pos, payload))
                dir_entries.append(entry)
                pos = _pad(pos + _SEG_HEADER + used)

    dir_pos = pos
    dir_payload = struct.pack("<i", len(dir_entries)) + bytes(124) + b"".join(
        dir_entries
    )

    with open(path, "wb") as f:
        # ZISRAWFILE header segment
        hdr = struct.pack(
            "<iiii", 1, 0, 0, 0
        ) + uuid.uuid5(
            uuid.NAMESPACE_URL, "scip-spark:" + "|".join(scene_names)
        ).bytes + bytes(16) + struct.pack(
            "<iqqiq", 0, dir_pos, meta_pos, 0, 0
        )
        assert len(hdr) == file_header_used
        f.write(_seg_header(b"ZISRAWFILE", file_header_used) + hdr)
        f.write(bytes(meta_pos - f.tell()))
        # metadata segment: XmlSize, AttachmentSize, spare to 256, XML
        f.write(_seg_header(b"ZISRAWMETADATA", meta_used))
        f.write(struct.pack("<ii", len(xml), 0) + bytes(248) + xml)
        for seg_pos, payload in blocks:
            f.write(bytes(seg_pos - f.tell()))
            f.write(_seg_header(b"ZISRAWSUBBLOCK", len(payload)) + payload)
        f.write(bytes(dir_pos - f.tell()))
        f.write(_seg_header(b"ZISRAWDIRECTORY", len(dir_payload)) + dir_payload)


def _read_seg_header(buf: bytes, off: int) -> tuple[bytes, int, int]:
    seg_id = buf[off : off + 16].rstrip(b"\0")
    alloc, used = struct.unpack_from("<qq", buf, off + 16)
    return seg_id, alloc, used


def _parse_dir_entry(buf: bytes, off: int):
    """-> (pixel_type, file_pos, compression, pyramid_type,
    {dim: (start, size, stored)}, end_off)"""
    if buf[off : off + 2] != b"DV":
        raise ValueError(f"unsupported directory entry schema {buf[off:off+2]!r}")
    ptype, fpos, _fpart, comp = struct.unpack_from("<iqii", buf, off + 2)
    pyramid = buf[off + 22]
    (ndims,) = struct.unpack_from("<i", buf, off + 28)
    dims = {}
    p = off + 32
    for _ in range(ndims):
        name = buf[p : p + 4].rstrip(b"\0").decode()
        start, size, _coord, stored = struct.unpack_from("<iifi", buf, p + 4)
        dims[name] = (start, size, stored)
        p += 20
    return ptype, fpos, comp, pyramid, dims, p


def _read_segment(f, pos: int, expect: bytes) -> bytes:
    """Seek-read ONE segment's payload (bounded by its UsedSize) —
    never the whole file (review r15: fetch_tile previously slurped
    multi-GB containers per call)."""
    f.seek(pos)
    head = f.read(_SEG_HEADER)
    if len(head) < _SEG_HEADER:
        raise ValueError(f"truncated segment header at {pos}")
    seg_id = head[:16].rstrip(b"\0")
    _alloc, used = struct.unpack_from("<qq", head, 16)
    if seg_id != expect:
        raise ValueError(
            f"expected {expect.decode()} segment at {pos}, found "
            f"{seg_id.decode(errors='replace')!r}"
        )
    return f.read(used)


def _file_positions(f) -> tuple[int, int]:
    f.seek(0)
    head = f.read(_SEG_HEADER + 80)
    if head[:16].rstrip(b"\0") != b"ZISRAWFILE":
        raise ValueError("not a CZI file (missing ZISRAWFILE header)")
    dir_pos, meta_pos = struct.unpack_from("<qq", head, _SEG_HEADER + 4 * 4 + 32 + 4)
    return dir_pos, meta_pos


def _directory_from(f):
    dir_pos, _ = _file_positions(f)
    payload = _read_segment(f, dir_pos, b"ZISRAWDIRECTORY")
    (count,) = struct.unpack_from("<i", payload, 0)
    p = 4 + 124
    entries = []
    for _ in range(count):
        ptype, fpos, comp, pyramid, dims, p = _parse_dir_entry(payload, p)
        entries.append((ptype, fpos, comp, pyramid, dims))
    return entries


def _scene_names_from(f) -> dict[int, str]:
    _, meta_pos = _file_positions(f)
    names: dict[int, str] = {}
    if meta_pos:
        payload = _read_segment(f, meta_pos, b"ZISRAWMETADATA")
        (xml_size,) = struct.unpack_from("<i", payload, 0)
        root = ET.fromstring(payload[256 : 256 + xml_size].decode())
        for sc in root.iter("Scene"):
            names[int(sc.get("Index"))] = sc.get("Name")
    return names


def scene_inventory(path: str) -> tuple[list[str], dict[str, int]]:
    """(scene names in S-start order, tiles per scene) — the driver-
    side metadata read feeding czi_meta (S8). Names come from the
    metadata XML's documented Scenes path (Index = the S dimension
    START, which need not begin at 0 — a single-scene export from a
    multi-scene acquisition keeps its original index); a file without
    names falls back to 'S<start>'."""
    with open(path, "rb") as f:
        names = _scene_names_from(f)
        tiles: dict[int, set[int]] = {}
        for _ptype, _fpos, _comp, _pyr, dims in _directory_from(f):
            s = dims.get("S", (0, 1, 1))[0]
            m = dims.get("M", (0, 1, 1))[0]
            tiles.setdefault(s, set()).add(m)
    scene_names = [names.get(s, f"S{s}") for s in sorted(tiles)]
    tiles_per_scene = {
        names.get(s, f"S{s}"): len(ms) for s, ms in tiles.items()
    }
    return scene_names, tiles_per_scene


def fetch_tile(path: str, scene: str | int, tile: int) -> np.ndarray:
    """C×H×W ndarray for one (scene, tile) — channels stacked in C
    order from the matching uncompressed subblocks. ``scene`` may be a
    name (resolved to its ACTUAL S start via the metadata XML) or an S
    start value; ``tile`` is the ordinal into the scene's sorted M
    starts (M need not begin at 0). One bounded seek+read per segment
    — the container is never slurped. This has the exact reader
    signature czi_attach_pixels expects."""
    with open(path, "rb") as f:
        entries = _directory_from(f)
        if isinstance(scene, str):
            names = _scene_names_from(f)
            s_starts = sorted({d.get("S", (0, 1, 1))[0] for *_x, d in entries})
            by_name = {names.get(s, f"S{s}"): s for s in s_starts}
            if scene not in by_name:
                raise ValueError(f"scene {scene!r} not in {sorted(by_name)}")
            s_idx = by_name[scene]
        else:
            s_idx = int(scene)
        in_scene = [
            e for e in entries if e[4].get("S", (0, 1, 1))[0] == s_idx
        ]
        if not in_scene:
            raise ValueError(f"no subblocks for scene {scene!r}: {path}")
        m_starts = sorted({e[4].get("M", (0, 1, 1))[0] for e in in_scene})
        if not 0 <= tile < len(m_starts):
            raise ValueError(
                f"tile {tile} out of range (scene has {len(m_starts)}): {path}"
            )
        m_val = m_starts[tile]
        planes = {}
        for ptype, fpos, comp, pyramid, dims in in_scene:
            if dims.get("M", (0, 1, 1))[0] != m_val:
                continue
            if pyramid != 0:
                raise ValueError(
                    f"pyramidal CZI subblock needs an injected aicsimageio "
                    f"reader: {path}"
                )
            if comp != _COMP_UNCOMPRESSED:
                raise ValueError(
                    f"compressed CZI subblock (compression {comp}) needs an "
                    f"injected aicsimageio reader: {path}"
                )
            dtype = _PIXEL_DTYPES.get(ptype)
            if dtype is None:
                raise ValueError(f"unsupported CZI pixel type {ptype}: {path}")
            for axis in ("Y", "X"):
                st, size, stored = dims[axis]
                if stored != size:
                    raise ValueError(
                        f"subsampled CZI subblock ({axis} stored {stored} != "
                        f"size {size}) needs an injected reader: {path}"
                    )
            extra = {
                k: v for k, v in dims.items() if k not in ("S", "M", "C", "Y", "X")
                and not (v[0] == 0 and v[1] == 1)
            }
            if extra:
                raise ValueError(
                    f"CZI dimensions {sorted(extra)} beyond S/M/C/Y/X need an "
                    f"injected aicsimageio reader: {path}"
                )
            payload = _read_segment(f, fpos, b"ZISRAWSUBBLOCK")
            msize, _asize, dsize = struct.unpack_from("<iiq", payload, 0)
            _pt, _fp, _cmp, _pyr, bdims, entry_end = _parse_dir_entry(payload, 16)
            fixed = entry_end  # Metadata/Attachment/DataSize fields + entry
            # ZISRAW layout: subblock metadata at max(256, fixed), the
            # pixel DATA after it (review r15 #1: adding msize inside
            # the max() silently returned XML bytes as pixels for any
            # Zen file with per-subblock metadata)
            data_off = max(256, fixed) + msize
            data = payload[data_off : data_off + dsize]
            h = bdims["Y"][1]
            w = bdims["X"][1]
            ch = bdims.get("C", (0, 1, 1))[0]
            if ch in planes:
                raise ValueError(
                    f"duplicate subblock for channel {ch} (Z/T stack?) needs "
                    f"an injected aicsimageio reader: {path}"
                )
            planes[ch] = np.frombuffer(
                data, dtype=np.dtype(dtype).newbyteorder("<")
            ).reshape(h, w)
    if not planes:
        raise ValueError(f"no subblocks for scene {scene!r} tile {tile}: {path}")
    return np.stack([planes[c] for c in sorted(planes)])
