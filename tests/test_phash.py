"""BMP decode + dHash: decoder goldens against hand-built BMPs (both
row orders, padding, rejects), integer downscale, hash bit layout, and
the near-dup join's crafted-pair behavior."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def make_bmp(gray: np.ndarray, top_down: bool = False) -> bytes:
    """Reference 24-bit BMP encoder for tests (independent of the
    query's codegen construction): gray (h, w) -> b=g=r payload."""
    h, w = gray.shape
    stride = ((w * 3 + 3) // 4) * 4
    header = b"BM" + struct.pack(
        "<IHHI", 54 + stride * h, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        stride * h, 0, 0, 0, 0,
    )
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            row += bytes([int(gray[y, x])] * 3)
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return header + b"".join(rows)


class TestBmpDecode:
    def test_roundtrip_both_row_orders_and_padding(self):
        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_gray_pixels,
        )

        rng = np.random.RandomState(7)
        # width 9 -> stride 28 (1 pad byte) exercises padding
        gray = rng.randint(0, 256, size=(8, 9)).astype(np.int64)
        for td in (False, True):
            got = bmp_gray_pixels(make_bmp(gray, top_down=td))
            assert got is not None and np.array_equal(got, gray)

    def test_rejects_non_bmp_and_truncated(self):
        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_gray_pixels,
        )

        gray = np.full((8, 8), 50, dtype=np.int64)
        blob = make_bmp(gray)
        assert bmp_gray_pixels(b"\x89PNG" + blob[4:]) is None
        assert bmp_gray_pixels(blob[:100]) is None
        assert bmp_gray_pixels(b"") is None

    def test_gray_is_integer_mean(self):
        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_gray_pixels,
        )

        # distinct b, g, r channels: gray must be (r + g + b) // 3
        payload = bytearray(make_bmp(np.zeros((8, 8), dtype=np.int64)))
        payload[54:57] = bytes([10, 20, 31])  # b, g, r of one pixel
        got = bmp_gray_pixels(bytes(payload))
        assert got[7, 0] == (10 + 20 + 31) // 3  # bottom row -> y=7


class TestDhash:
    def test_bit_layout(self):
        from ml_hadoop_experiment_spark.operators.phash import dhash_bits

        cell = np.zeros((8, 8), dtype=np.int64)
        cell[0, 0] = 9  # only comparison (y=0, x=0) fires -> bit 0
        assert dhash_bits(cell) == 1
        cell2 = np.zeros((8, 8), dtype=np.int64)
        cell2[3, 2] = 9  # bits y*7+x: (3,1)=22 unaffected? (3,2)=23
        # pixel (3,2) brighter than (3,3) -> bit 3*7+2 = 23; and
        # (3,1) vs (3,2): 0 > 9 false
        assert dhash_bits(cell2) == 1 << 23

    def test_downscale_integer_area_mean(self):
        from ml_hadoop_experiment_spark.operators.phash import (
            downscale_gray,
        )

        gray = np.arange(256, dtype=np.int64).reshape(16, 16)
        out = downscale_gray(gray)
        assert out.shape == (8, 8)
        # cell (0,0) = mean of [[0,1],[16,17]] = 34//4 = 8
        assert out[0, 0] == (0 + 1 + 16 + 17) // 4
        tiny = np.zeros((4, 4), dtype=np.int64)
        assert downscale_gray(tiny) is None
        native = np.arange(64, dtype=np.int64).reshape(8, 8)
        assert downscale_gray(native) is native


class TestNearDupPairs:
    def test_crafted_pairs_within_radius(self, spark):
        from ml_hadoop_experiment_spark.operators.phash import (
            dhash_bits,
            image_near_dup_pairs,
        )

        rng = np.random.RandomState(3)
        base = rng.randint(0, 256, size=(8, 8)).astype(np.int64)
        near = base.copy()
        near[2, 2] = (near[2, 2] + 128) % 256  # one pixel: <= 2 dHash bits
        far = rng.randint(0, 256, size=(8, 8)).astype(np.int64)
        rows = [
            (1, bytearray(make_bmp(base))),
            (2, bytearray(make_bmp(near))),
            (3, bytearray(make_bmp(far))),
            (4, None),  # null payload dropped, not crashed
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_near_dup_pairs(
                df, "doc_id", "payload", max_hamming=2
            ).collect()
        }
        ham_12 = bin(dhash_bits(base) ^ dhash_bits(near)).count("1")
        assert 1 <= ham_12 <= 2
        assert pairs == {(1, 2): ham_12}

    def test_undecodable_payloads_dropped(self, spark):
        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_dhash_frame,
        )

        gray = np.full((8, 8), 9, dtype=np.int64)
        rows = [
            (1, bytearray(make_bmp(gray))),
            (2, bytearray(b"not a bmp at all, just bytes" * 3)),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = bmp_dhash_frame(df, "doc_id", "payload").collect()
        assert [r["id"] for r in got] == [1]
        assert got[0]["fp"] == 0  # flat image: no comparison fires


class TestPngDecoder:
    def test_roundtrip_truecolor_and_greyscale(self):
        import numpy as np

        from ml_hadoop_experiment_spark.operators.phash import (
            png_bytes,
            png_gray_pixels,
        )

        rng = np.random.RandomState(7)
        gray = rng.randint(0, 256, (8, 8)).astype(np.int64)
        for tc in (True, False):
            got = png_gray_pixels(png_bytes(gray, truecolor=tc))
            assert got is not None and (got == gray).all()

    def test_all_five_scanline_filters_defilter(self):
        """A hand-built truecolor PNG using one of each filter type
        (None/Sub/Up/Average/Paeth per row) must decode to the source
        raster — the decoder's full filter set, not just the filter-0
        path the engine's own encoder emits."""
        import struct
        import zlib

        import numpy as np

        from ml_hadoop_experiment_spark.operators.phash import (
            png_gray_pixels,
        )

        rng = np.random.RandomState(11)
        h, w, bpp = 5, 4, 3
        px = rng.randint(0, 256, (h, w * bpp)).astype(np.int64)

        def paeth(a, b, c):
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        raw = b""
        prev = np.zeros(w * bpp, dtype=np.int64)
        for y in range(h):
            f = [0, 1, 2, 3, 4][y]
            line = bytearray()
            for x in range(w * bpp):
                a = px[y][x - bpp] if x >= bpp else 0
                b = prev[x]
                c = px[y - 1][x - bpp] if (x >= bpp and y > 0) else 0
                pred = [0, a, b, (a + b) // 2, paeth(a, b, c)][f]
                line.append((px[y][x] - pred) & 0xFF)
            raw += bytes([f]) + bytes(line)
            prev = px[y]

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )
        got = png_gray_pixels(blob)
        want = px.reshape(h, w, 3).sum(axis=2) // 3
        assert got is not None and (got == want).all()

    def test_rejects_and_dispatch(self):
        import numpy as np

        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_bytes,
            bmp_gray_pixels,
            decode_gray_pixels,
            png_bytes,
            png_gray_pixels,
        )

        gray = np.arange(64).reshape(8, 8) % 200
        png = png_bytes(gray)
        bmp = bmp_bytes(gray)
        # dispatch picks the right decoder by magic bytes
        assert (decode_gray_pixels(png) == gray).all()
        assert (decode_gray_pixels(bmp) == gray).all()
        assert decode_gray_pixels(b"GIF89a----------") is None
        # truncation / foreign containers reject cleanly
        assert png_gray_pixels(png[:40]) is None
        assert png_gray_pixels(bmp) is None
        assert bmp_gray_pixels(png) is None

    def test_adversarial_geometry_and_zlib_bomb_reject(self):
        """Untrusted-byte guards (round-12 ADVICE): a crafted IHDR must
        not drive allocation (pixel-count cap fires BEFORE np.zeros) and
        the inflate is bounded by the declared geometry (a zlib bomb
        whose stream exceeds h*(1+stride) rejects without expanding)."""
        import struct
        import zlib

        import numpy as np

        from ml_hadoop_experiment_spark.operators.phash import (
            png_bytes,
            png_gray_pixels,
        )

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        # 1) absurd claimed geometry (2^31-ish pixels), tiny IDAT: must
        # return None without attempting the h x stride allocation
        ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 15, 8, 0, 0, 0, 0)
        bomb_geom = (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
        )
        assert png_gray_pixels(bomb_geom) is None
        # 2) sane geometry, but the compressed stream inflates far past
        # h*(1+stride): bounded decompressobj stops at the cap + rejects
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        bomb_stream = (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * (10 * 1024 * 1024)))
            + chunk(b"IEND", b"")
        )
        assert png_gray_pixels(bomb_stream) is None
        # 3) stream SHORTER than geometry also rejects
        short = (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 7)) + chunk(b"IEND", b"")
        )
        assert png_gray_pixels(short) is None
        # 4) a legitimate image still decodes after the guards
        gray = np.arange(16).reshape(4, 4) % 200
        assert (png_gray_pixels(png_bytes(gray)) == gray).all()

    def test_bmp_png_same_raster_same_fingerprint(self, spark):
        """The SAME raster encoded as BMP and as PNG must produce the
        SAME dHash fingerprint through the dispatching scan — the
        mixed-corpus query's foundation."""
        import numpy as np

        from ml_hadoop_experiment_spark.operators.phash import (
            bmp_bytes,
            image_dhash_frame,
            png_bytes,
        )

        rng = np.random.RandomState(3)
        gray = rng.randint(0, 256, (8, 8)).astype(np.int64)
        df = spark.createDataFrame(
            [(1, bytearray(bmp_bytes(gray))), (2, bytearray(png_bytes(gray)))],
            "id long, payload binary",
        )
        rows = image_dhash_frame(df, "id", "payload").collect()
        fps = {r["id"]: r["fp"] for r in rows}
        assert len(fps) == 2 and fps[1] == fps[2]
