"""Pure-Python baseline JPEG codec (r15). JPEG is lossy, so the gates
are: DC-only content round-trips BIT-EXACTLY (flat blocks dequantize
to exact integers), smooth content stays inside the quantization error
bound, the entropy layer is pinned by hand-checked magnitude-category
vectors, and stuffing/restart/subsampling paths are exercised with
real streams. TIFF compression-7 strips and the multimodal default
decoder ride the same codec."""

from __future__ import annotations

import numpy as np
import pytest

from scip_spark.sources import jpegio as J


class TestEntropyLayer:
    def test_magnitude_categories_hand_checked(self):
        """T.81 F.1.2.1.1: category = bit length of |v|; negative
        values encode as v + 2^t - 1."""
        assert J._magnitude(0) == (0, 0)
        assert J._magnitude(1) == (1, 1)
        assert J._magnitude(-1) == (1, 0)
        assert J._magnitude(3) == (2, 3)
        assert J._magnitude(-3) == (2, 0)
        assert J._magnitude(-2) == (2, 1)
        assert J._magnitude(255) == (8, 255)
        assert J._magnitude(-255) == (8, 0)

    def test_extend_inverts_magnitude(self):
        for v in range(-300, 301):
            t, code = J._magnitude(v)
            assert J._extend(code, t) == v

    def test_canonical_huffman_prefix_free(self):
        codes = J._build_codes(*J.HT_AC_LUMA)
        as_bits = {
            sym: format(c, f"0{ln}b") for sym, (c, ln) in codes.items()
        }
        vals = list(as_bits.values())
        assert len(set(vals)) == len(vals)
        for a in vals:
            for b in vals:
                if a is not b:
                    assert not b.startswith(a) or a == b

    def test_bitwriter_stuffs_ff(self):
        w = J._BitWriter()
        w.write(0xFF, 8)
        w.flush()
        assert bytes(w.out) == b"\xff\x00"


class TestRoundTrip:
    def test_flat_images_bit_exact(self):
        for val in [0, 1, 77, 128, 254, 255]:
            img = np.full((24, 40), val, dtype=np.uint8)
            assert np.array_equal(J.decode(J.encode(img, quality=95)), img)

    def test_flat_rgb_bit_exact(self):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[..., 0] = 200
        img[..., 1] = 100
        img[..., 2] = 50
        out = J.decode(J.encode(img, quality=95))
        assert out.shape == (16, 16, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1

    def test_gradient_within_quant_error(self):
        x = np.linspace(0, 255, 64)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        out = J.decode(J.encode(img, quality=90))
        assert np.abs(out.astype(float) - img).max() <= 4

    def test_odd_sizes_crop_exactly(self):
        img = (np.arange(13 * 17).reshape(13, 17) % 251).astype(np.uint8)
        out = J.decode(J.encode(img, quality=100))
        assert out.shape == (13, 17)
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("ss", ["4:4:4", "4:2:2", "4:2:0"])
    def test_subsampling_modes(self, ss):
        x = np.linspace(0, 255, 50)
        base = np.clip(np.add.outer(x, np.linspace(0, 255, 60)) / 2, 0, 255)
        rgb = np.stack([base, base[::-1], 255.0 - base], axis=-1).astype(
            np.uint8
        )
        out = J.decode(J.encode(rgb, quality=90, subsample=ss))
        assert out.shape == rgb.shape
        tol = 8 if ss != "4:4:4" else 4
        assert np.abs(out.astype(float) - rgb).max() <= tol

    def test_restart_intervals_reset_predictors(self):
        x = np.linspace(0, 255, 64)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        plain = J.decode(J.encode(img, quality=90))
        with_rst = J.decode(J.encode(img, quality=90, restart_interval=2))
        assert np.array_equal(plain, with_rst)

    def test_non_baseline_fails_loudly(self):
        img = np.zeros((8, 8), dtype=np.uint8)
        data = bytearray(J.encode(img))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC2  # rewrite as progressive
        with pytest.raises(ValueError, match="non-baseline"):
            J.decode(bytes(data))

    def test_garbage_fails_loudly(self):
        with pytest.raises(ValueError, match="SOI"):
            J.decode(b"not a jpeg")


class TestTiffJpegStrips:
    def test_flat_gray_exact(self, tmp_path):
        from scip_spark.sources.tiffio import read_tiff, write_tiff

        img = np.full((24, 40), 93, dtype=np.uint8)
        p = str(tmp_path / "j.tiff")
        write_tiff(p, img, compression="jpeg", jpeg_quality=95)
        assert np.array_equal(read_tiff(p), img)

    def test_multistrip_and_rgb(self, tmp_path):
        from scip_spark.sources.tiffio import read_tiff, write_tiff

        x = np.linspace(0, 255, 48)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        p = str(tmp_path / "j.tiff")
        write_tiff(p, img, compression="jpeg", rows_per_strip=16)
        assert np.abs(read_tiff(p).astype(int) - img.astype(int)).max() <= 2
        rgb = np.stack([img, img[::-1], img.T], axis=-1)
        write_tiff(p, rgb, compression="jpeg", multisample=True,
                   rows_per_strip=16)
        back = read_tiff(p)
        assert back.shape == rgb.shape
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 4

    def test_jpegtables_splice(self, tmp_path):
        """Abbreviated TIFF/EP streams: tables live in tag 347; strips
        carry SOI + scan only. Build one by hand from a full stream."""
        import struct

        from scip_spark.sources import tiffio

        img = np.full((8, 8), 120, dtype=np.uint8)
        full = J.encode(img, quality=95)
        # split the full stream: tables (DQT+DHT) vs the rest
        segs = []
        pos = 2
        while pos < len(full):
            marker = full[pos + 1]
            (ln,) = struct.unpack_from(">H", full, pos + 2)
            seg = full[pos : pos + 2 + ln]
            segs.append((marker, seg))
            pos += 2 + ln
            if marker == 0xDA:
                body = full[pos:]
                break
        tables = b"".join(s for m, s in segs if m in (0xDB, 0xC4))
        rest = b"".join(s for m, s in segs if m not in (0xDB, 0xC4))
        jpegtables = b"\xff\xd8" + tables + b"\xff\xd9"
        strip = b"\xff\xd8" + rest + body
        # abbreviated strip alone must fail (no tables)…
        with pytest.raises(Exception):
            J.decode(strip)
        # …but the splice the TIFF reader performs reconstructs it
        spliced = strip[:2] + jpegtables[2:-2] + strip[2:]
        assert np.array_equal(J.decode(spliced), img)

    def test_predictor_with_jpeg_rejected(self, tmp_path):
        from scip_spark.sources.tiffio import write_tiff

        img = np.zeros((8, 8), dtype=np.uint8)
        with pytest.raises(ValueError, match="exclusive"):
            write_tiff(str(tmp_path / "x.tiff"), img, compression="jpeg",
                       predictor=2)


def test_multimodal_default_decoder_decodes_real_jpeg(spark):
    """The multimodal decode stage now decodes REAL JPEG payload bytes
    by default — stats come from actual decoded pixels, not a fake."""
    import pandas as pd

    from scip_spark.functions.multimodal import MEDIA_SCHEMA, decode_features

    img = np.full((16, 16), 55, dtype=np.uint8)
    payload = J.encode(img, quality=95)
    rows = [
        {
            "media_id": 1,
            "kind": "image",
            "payload": payload,
            "mime": "image/jpeg",
            "meta_width": 16,
            "meta_height": 16,
            "meta_duration_s": 0.0,
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    out = decode_features(df).toPandas()
    assert list(out.px_shape[0]) == [16, 16]
    assert out.px_mean[0] == 55.0  # flat JPEG decodes exactly
    assert out.px_std[0] == 0.0
