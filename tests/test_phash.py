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
