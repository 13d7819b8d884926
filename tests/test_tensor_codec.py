import numpy as np

from scip_spark.schema import decode_tensor, encode_tensor


def test_roundtrip():
    a = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    flat, shape = encode_tensor(a)
    assert shape == [3, 4, 5]
    b = decode_tensor(flat, shape)
    np.testing.assert_array_equal(a, b)


def test_none_safe():
    assert decode_tensor(None, None) is None


def test_ragged_roundtrip_through_spark(spark):
    """Ragged H×W per record — the zarr layout the codec mirrors."""
    import pandas as pd

    arrs = [np.random.RandomState(i).rand(2, 4 + i, 5 + i).astype(np.float32) for i in range(3)]
    rows = [{"pixels": a.ravel().tolist(), "pixels_shape": list(a.shape)} for a in arrs]
    df = spark.createDataFrame(pd.DataFrame(rows), schema="pixels array<float>, pixels_shape array<int>")
    back = df.toPandas()
    for a, (_, r) in zip(arrs, back.iterrows()):
        np.testing.assert_allclose(a, decode_tensor(r.pixels, r.pixels_shape), rtol=1e-6)


def test_binary_codec_roundtrip_and_equivalence():
    import numpy as np

    from scip_spark.schema import (
        decode_series_bin,
        decode_tensor,
        decode_tensor_bin,
        encode_series_bin,
        encode_tensor,
        encode_tensor_bin,
    )

    rng = np.random.default_rng(3)
    a = (rng.random((3, 17, 23)) * 100).astype(np.float32)
    buf, shape = encode_tensor_bin(a)
    np.testing.assert_array_equal(decode_tensor_bin(buf, shape), a)
    # binary and list codecs decode to identical tensors
    flat, shape2 = encode_tensor(a)
    np.testing.assert_array_equal(decode_tensor(flat, shape2), decode_tensor_bin(buf, shape))
    import pandas as pd

    bufs, shapes = encode_series_bin([a, None, a[0]])
    back = decode_series_bin(bufs, shapes)
    np.testing.assert_array_equal(back[0], a)
    assert back[1] is None
    np.testing.assert_array_equal(back[2], a[0])


def test_binary_layout_roundtrip_through_spark(spark):
    """array→binary→array through mapInPandas preserves every tensor
    (incl. nulls and ragged shapes) — the at-scale layout can be
    adopted and reverted freely mid-plan."""
    import numpy as np
    import pandas as pd

    from scip_spark.schema import (
        EVENT_SCHEMA,
        decode_tensor,
        events_to_pandas,
        pixels_to_array,
        pixels_to_binary,
    )

    recs = [
        {"path": "a", "group": "g", "pixels": np.arange(12, dtype=np.float32).reshape(1, 3, 4)},
        {"path": "b", "group": "g", "pixels": None},
        {"path": "c", "group": "g", "pixels": np.ones((2, 5, 7), dtype=np.float32)},
    ]
    df = spark.createDataFrame(events_to_pandas(recs), schema=EVENT_SCHEMA)
    binified = pixels_to_binary(df)
    assert dict(binified.dtypes)["pixels_bin"] == "binary"
    back = pixels_to_array(binified).select("path", "pixels", "pixels_shape").toPandas()
    by_path = {r.path: r for r in back.itertuples()}
    np.testing.assert_array_equal(
        decode_tensor(by_path["a"].pixels, by_path["a"].pixels_shape),
        recs[0]["pixels"],
    )
    assert by_path["b"].pixels is None or (
        isinstance(by_path["b"].pixels, float) and pd.isna(by_path["b"].pixels)
    )
    np.testing.assert_array_equal(
        decode_tensor(by_path["c"].pixels, by_path["c"].pixels_shape),
        recs[2]["pixels"],
    )


def test_ndarray_encode_avoids_per_element_objects():
    """Both codecs must avoid per-element Python objects: the array
    codec now keeps ndarray elements (Arrow converts a primitive
    ndarray in one buffer copy), so encoding must beat an explicit
    ``.tolist()`` materialization by a wide margin."""
    import time

    import numpy as np

    from scip_spark.schema import encode_series, encode_series_bin

    rng = np.random.default_rng(0)
    arrays = [rng.random((3, 64, 64)).astype(np.float32) for _ in range(200)]

    t0 = time.time()
    flats, _ = encode_series(arrays)
    t_nd = time.time() - t0
    assert all(isinstance(v, np.ndarray) for v in flats)  # no tolist regression

    t0 = time.time()
    encode_series_bin(arrays)
    t_bin = time.time() - t0

    t0 = time.time()
    [a.ravel().tolist() for a in arrays]
    t_list = time.time() - t0

    assert t_nd * 3 < t_list, (t_nd, t_list)
    assert t_bin * 3 < t_list, (t_bin, t_list)


# ---------------------------------------------------------------------------
# r15: pure-Python LZ4-block + Blosc-1 frame codecs (zarr's DEFAULT
# compressor family). Decode is the load-bearing half: the LZ4 decoder
# is pinned to a hand-derived spec vector, blosc to its documented
# 16-byte header + bstarts + split-stream layout; compressors exist so
# the matrices exercise decode with real compressed bytes.
# ---------------------------------------------------------------------------


class TestLz4Block:
    def test_hand_derived_spec_vector(self):
        """token 0x48 = 4 literals / matchlen 8+4; offset 4 replicates
        'abcd' three more times; final literals-only token 0x50."""
        from scip_spark.sources import lz4block

        vec = (bytes([0x48]) + b"abcd" + bytes([0x04, 0x00])
               + bytes([0x50]) + b"XYZVW")
        assert lz4block.decompress(vec, 21) == b"abcd" * 4 + b"XYZVW"

    def test_overlapping_match_replicates(self):
        from scip_spark.sources import lz4block

        # offset 1, matchlen 15: RLE of a single byte
        vec = bytes([0x1B]) + b"Q" + bytes([0x01, 0x00]) + bytes([0x50]) + b"ABCDE"
        assert lz4block.decompress(vec, 21) == b"Q" * 16 + b"ABCDE"

    def test_roundtrip_sweep(self):
        import random

        from scip_spark.sources import lz4block

        rng = random.Random(7)
        for _ in range(60):
            n = rng.randrange(0, 3000)
            parts = []
            while sum(map(len, parts)) < n:
                if rng.random() < 0.5:
                    parts.append(bytes(rng.randrange(256)
                                       for _ in range(rng.randrange(1, 20))))
                else:
                    parts.append(bytes([rng.randrange(256)]) * rng.randrange(1, 60))
            data = b"".join(parts)[:n]
            assert lz4block.decompress(lz4block.compress(data), n) == data

    def test_truncated_and_bad_offset_fail_loudly(self):
        import pytest

        from scip_spark.sources import lz4block

        with pytest.raises(ValueError, match="truncated"):
            lz4block.decompress(bytes([0x48]) + b"ab", 20)
        # offset beyond what's decoded so far
        with pytest.raises(ValueError, match="invalid offset"):
            lz4block.decompress(
                bytes([0x14]) + b"a" + bytes([0x09, 0x00]) + bytes([0x10]) + b"z", 7
            )


class TestBloscFrame:
    def test_roundtrip_matrix(self):
        import numpy as np

        from scip_spark.sources import bloscio

        rng = np.random.default_rng(3)
        for dtype in ["uint8", "uint16", "int32", "float32", "float64"]:
            for n in [0, 7, 100, 5000]:
                for cname in ["lz4", "zlib"]:
                    for shuffle in [True, False]:
                        arr = (rng.random(n) * 100).astype(dtype)
                        data = arr.tobytes()
                        frame = bloscio.compress(
                            data, arr.dtype.itemsize, cname=cname, shuffle=shuffle
                        )
                        assert bloscio.decompress(frame) == data, (
                            dtype, n, cname, shuffle,
                        )

    def test_split_mode_engages_and_helps(self):
        """A large shuffled float32 buffer must split into typesize
        streams (the c-blosc FORWARD_COMPAT rule) and compress well."""
        import numpy as np

        from scip_spark.sources import bloscio

        data = np.arange(32768, dtype=np.float32).tobytes()
        frame = bloscio.compress(data, 4)
        assert bloscio.decompress(frame) == data
        assert len(frame) < len(data) // 4  # shuffle+split actually bites

    def test_memcpy_frame_for_incompressible(self):
        import os

        from scip_spark.sources import bloscio

        data = os.urandom(4096)
        frame = bloscio.compress(data, 1)
        assert frame[2] & 0x2  # memcpy flag
        assert bloscio.decompress(frame) == data

    def test_unsupported_surfaces_fail_loudly(self):
        import struct

        import pytest

        from scip_spark.sources import bloscio

        zstd_frame = struct.pack("<BBBBiii", 2, 1, 4 << 5, 1, 4, 4, 16)
        with pytest.raises(ValueError, match="needs the blosc package"):
            bloscio.decompress(zstd_frame)
        bitshuf = struct.pack("<BBBBiii", 2, 1, (1 << 5) | 0x4, 1, 4, 4, 16)
        with pytest.raises(ValueError, match="bit-shuffle"):
            bloscio.decompress(bitshuf)
        with pytest.raises(ValueError, match="cbytes"):
            bloscio.decompress(struct.pack("<BBBBiii", 2, 1, 1 << 5, 1, 4, 4, 99))


class TestZarrCompressedStores:
    def test_compressor_matrix_full_and_row_reads(self, tmp_path):
        import numpy as np

        from scip_spark.sources import zarrio

        arr = (np.arange(3 * 50 * 40) % 251).astype("float32").reshape(3, 50, 40)
        for comp in [None, "zlib", "blosc-lz4", "blosc-zlib", "lz4"]:
            store = str(tmp_path / f"s_{comp}.zarr")
            zarrio.write_array(store, arr, chunks=(1, 32, 32), compressor=comp)
            assert np.array_equal(zarrio.read_array(store), arr)
            assert np.array_equal(zarrio._read_array_row(store, 2), arr[2])

    def test_fixture_contains_compressed_stores(self):
        """The committed driver-verified fixture must keep exercising
        the blosc-lz4 and lz4 decode paths (a regeneration that drops
        them would silently shrink codec coverage)."""
        import json
        import os

        import scip_spark

        root = os.path.join(os.path.dirname(scip_spark.__file__), "fixtures")
        meta = json.load(
            open(os.path.join(root, "zarr", "plate_P3", "C05.zarr", "0", ".zarray"))
        )
        assert meta["compressor"]["id"] == "blosc"
        assert meta["compressor"]["cname"] == "lz4"
        meta2 = json.load(
            open(os.path.join(root, "zarr", "plate_P3", "C09.zarr", ".zarray"))
        )
        assert meta2["compressor"]["id"] == "lz4"


class TestMultiSampleTiff:
    def test_roundtrip_matrix_chunky_and_planar(self, tmp_path):
        import numpy as np

        from scip_spark.sources.tiffio import read_tiff, write_tiff

        rng = np.random.default_rng(5)
        i = 0
        for dtype in ["uint8", "uint16", "int16"]:
            for comp in ["none", "deflate", "packbits", "lzw"]:
                for pred in [1, 2]:
                    for planar in [1, 2]:
                        arr = rng.integers(0, 200, size=(13, 17, 3)).astype(dtype)
                        p = str(tmp_path / f"ms{i}.tiff")
                        i += 1
                        write_tiff(p, arr, compression=comp, predictor=pred,
                                   rows_per_strip=5, multisample=True,
                                   planar=planar)
                        back = read_tiff(p)
                        assert back.shape == (13, 17, 3)
                        assert np.array_equal(back.astype(dtype), arr), (
                            dtype, comp, pred, planar,
                        )

    def test_chunky_predictor_differences_per_sample(self, tmp_path):
        """TIFF 6.0 §14: with SamplesPerPixel > 1 the horizontal
        predictor differences each sample against the SAME sample of
        the previous pixel — a naive byte-stream cumsum would smear
        channels into each other."""
        import numpy as np

        from scip_spark.sources.tiffio import read_tiff, write_tiff

        arr = np.zeros((1, 4, 3), dtype=np.uint8)
        arr[0, :, 0] = [10, 20, 30, 40]   # R ramps
        arr[0, :, 1] = [200, 200, 200, 200]  # G constant
        arr[0, :, 2] = [5, 4, 3, 2]       # B descends (wraps under diff)
        p = str(tmp_path / "pred.tiff")
        write_tiff(p, arr, predictor=2, multisample=True)
        assert np.array_equal(read_tiff(p), arr)

    def test_multiframe_multisample_stacks(self, tmp_path):
        import numpy as np

        from scip_spark.sources.tiffio import read_tiff, write_tiff

        rng = np.random.default_rng(9)
        arr = rng.integers(0, 250, size=(4, 9, 11, 3)).astype("uint8")
        p = str(tmp_path / "stack.tiff")
        write_tiff(p, arr, multisample=True, compression="lzw", predictor=2)
        back = read_tiff(p)
        assert back.shape == (4, 9, 11, 3)
        assert np.array_equal(back, arr)

    def test_tiled_multisample_fails_loudly(self, tmp_path):
        import numpy as np
        import pytest

        from scip_spark.sources.tiffio import write_tiff

        arr = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="mutually exclusive"):
            write_tiff(str(tmp_path / "t.tiff"), arr, tile=(4, 4),
                       multisample=True)
