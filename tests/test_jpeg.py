"""Baseline JPEG codec (operators/jpeg.py): roundtrip error bounds per
process tier, generic MCU walk, restart resync, honest-scope
rejections, untrusted-geometry caps, and the phash dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from ml_hadoop_experiment_spark.operators.jpeg import (
    ANNEX_K_LUMA_QUANT,
    jpeg_bytes,
    jpeg_gray_pixels,
)


class TestGrayscaleRoundtrip:
    def test_flat_quant_single_mcu_error_bound(self):
        worst = 0
        for seed in range(100):
            g = np.random.RandomState(seed).randint(
                0, 256, (8, 8)
            ).astype(np.int64)
            dec = jpeg_gray_pixels(jpeg_bytes(g))
            assert dec is not None and dec.shape == (8, 8)
            worst = max(worst, int(np.abs(dec - g).max()))
        # flat quant: the only loss is DCT-coefficient rounding; the
        # fixture's 16-level margin leans on this staying tiny
        assert worst <= 4, worst

    def test_multi_mcu_non_multiple_of_8(self):
        g = np.random.RandomState(3).randint(0, 256, (20, 13)).astype(
            np.int64
        )
        dec = jpeg_gray_pixels(jpeg_bytes(g))
        assert dec.shape == (20, 13)
        assert np.abs(dec - g).max() <= 4

    def test_restart_markers_resync(self):
        g = np.random.RandomState(5).randint(0, 256, (24, 24)).astype(
            np.int64
        )
        data = jpeg_bytes(g, restart_interval=2)
        # RST markers really present
        assert any(
            bytes([0xFF, 0xD0 + i]) in data for i in range(8)
        )
        dec = jpeg_gray_pixels(data)
        assert np.abs(dec - g).max() <= 4

    def test_annex_k_quant_on_smooth_gradient(self):
        xx, yy = np.meshgrid(np.arange(32), np.arange(32))
        smooth = (60 + xx * 2 + yy * 3).astype(np.int64)
        dec = jpeg_gray_pixels(
            jpeg_bytes(smooth, quant=ANNEX_K_LUMA_QUANT)
        )
        # realistic tables on smooth content: small but nonzero loss
        assert np.abs(dec - smooth).max() <= 12


class TestColor:
    def test_444_gray_matches_rgb_mean(self):
        rgb = np.random.RandomState(11).randint(
            0, 256, (16, 16, 3)
        ).astype(np.int64)
        want = rgb.sum(axis=2) // 3
        dec = jpeg_gray_pixels(jpeg_bytes(rgb))
        # YCbCr forward+inverse rounding: a few gray levels at most
        assert np.abs(dec - want).max() <= 4

    def test_420_subsampling_decodes_at_full_geometry(self):
        rgb = np.random.RandomState(13).randint(
            0, 256, (18, 10, 3)
        ).astype(np.int64)
        dec = jpeg_gray_pixels(jpeg_bytes(rgb, subsampling="420"))
        assert dec.shape == (18, 10)
        # luma carries most of the gray: sanity-bound the loss from
        # box-downsampled + nearest-upsampled chroma
        want = rgb.sum(axis=2) // 3
        assert np.abs(dec - want).mean() < 40

    def test_420_constant_chroma_is_near_exact(self):
        # constant-color image: subsampling loses nothing
        rgb = np.full((16, 16, 3), 0, dtype=np.int64)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 80, 40
        want = rgb.sum(axis=2) // 3
        dec = jpeg_gray_pixels(jpeg_bytes(rgb, subsampling="420"))
        assert np.abs(dec - want).max() <= 4


class TestHonestScope:
    def test_rejects_non_jpeg(self):
        assert jpeg_gray_pixels(b"\x89PNG\r\n\x1a\nxxxx") is None
        assert jpeg_gray_pixels(b"BMxxxx") is None
        assert jpeg_gray_pixels(b"\xff\xd8") is None

    def test_rejects_progressive_sof2(self):
        g = np.zeros((8, 8), dtype=np.int64)
        data = bytearray(jpeg_bytes(g))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC2
        assert jpeg_gray_pixels(bytes(data)) is None

    def test_rejects_truncated_entropy_data(self):
        g = np.random.RandomState(1).randint(0, 256, (8, 8)).astype(
            np.int64
        )
        data = jpeg_bytes(g)
        assert jpeg_gray_pixels(data[: len(data) - 20]) is None

    def test_rejects_oversized_claimed_geometry(self):
        import struct

        g = np.zeros((8, 8), dtype=np.int64)
        data = bytearray(jpeg_bytes(g))
        i = bytes(data).find(b"\xff\xc0")
        # claim 65000x65000 (> the 64 MP cap) without growing the file
        struct.pack_into(">HH", data, i + 5, 65000, 65000)
        assert jpeg_gray_pixels(bytes(data)) is None


class TestPhashDispatch:
    def test_decode_gray_pixels_routes_jpeg(self):
        from ml_hadoop_experiment_spark.operators.phash import (
            decode_gray_pixels,
        )

        g = np.random.RandomState(2).randint(0, 256, (8, 8)).astype(
            np.int64
        )
        dec = decode_gray_pixels(jpeg_bytes(g))
        assert dec is not None and np.abs(dec - g).max() <= 4

    def test_fixture_margin_preserves_every_dhash_bit(self):
        """The image_near_dup_jpeg contract: on 16-level-margin rasters
        the dHash of the DECODED image equals the dHash of the source
        raster for every group — the property the oracle gate rides."""
        import hashlib

        from ml_hadoop_experiment_spark.operators.phash import (
            dhash_bits,
            downscale_gray,
        )

        for grp in range(30):
            for r in range(5):
                gray = np.empty((8, 8), dtype=np.int64)
                for y in range(8):
                    for x in range(8):
                        hh = int(
                            hashlib.md5(
                                f"{grp}_{y * 8 + x}".encode()
                            ).hexdigest()[:2],
                            16,
                        )
                        rank6 = hh % 6
                        if x == y and x > 0 and r == x:
                            rank6 = (rank6 + 3) % 6
                        gray[y, x] = 20 + 16 * (2 * rank6 + (x % 2))
                dec = jpeg_gray_pixels(jpeg_bytes(gray))
                assert dhash_bits(downscale_gray(dec)) == dhash_bits(
                    downscale_gray(gray)
                ), (grp, r)
