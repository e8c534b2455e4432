"""Image perceptual-hash near-duplicates: dHash over decoded BMP pixels.

Completes the multimodal tier beyond metadata (``multimodal.py`` parses
container headers) into CONTENT dedup: decode the one uncompressed
container the engine already handles without codec dependencies
(24-bit BITMAPINFOHEADER BMP — a real decoder, pure numpy over the
payload bytes, not a stub), reduce each image to a difference hash
(dHash: bit = left pixel brighter than its right neighbor on a fixed
8x8 grayscale grid; Krawetz's public algorithm), and find pairs within
a Hamming radius with the SAME pigeonhole segment blocking the text
SimHash pipeline uses (``dedup.simhash_pairs_from_fingerprints`` — one
segment-keyed equi-join, never all-pairs, exact recall at the radius).

Determinism contract (what makes this driver-gateable): grayscale is
the integer mean ``(r + g + b) // 3``, downscale is integer-floor area
averaging on integer cell boundaries, and the hash is 56 bits
(8 rows x 7 horizontal comparisons) so fingerprints stay nonnegative
in a BIGINT on both engines. An oracle can therefore replay pixel
values, hash bits, blocks, join, and popcount with integer arithmetic
only (see ``queries.q_image_near_dup``: the blobs are synthesized from
doc_id, Spark hashes what it DECODES from the actual bytes, DuckDB
hashes the generating formula directly — they agree only if
encode∘decode is the identity).

Scale shape: decode+hash is one mapInPandas scan (Arrow-batched, numpy
per image, no per-pixel Python); everything after is the audited
SimHash join machinery on a 1-row-per-image fingerprint frame.

Reference parity: criteo/ml-hadoop-experiment has no multimodal
surface (SURVEY.md §2) — north-star extension for multimodal training
pipelines.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import simhash_pairs_from_fingerprints

#: fixed dHash grid (width x height); 8x8 -> 8 rows of 7 comparisons
DHASH_GRID = 8
#: dHash fingerprint width in bits — keep < 63 so the BIGINT stays
#: nonnegative (simhash_blocks_sql's div/mod blocking requires it)
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)


def bmp_gray_pixels(payload: bytes) -> Optional[np.ndarray]:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP into a
    top-down ``(height, width)`` int array of ``(r + g + b) // 3``
    grays. Returns None for anything else (other containers belong to
    real codec integrations; this decoder is complete for the format
    it claims). Handles bottom-up (positive height) and top-down
    (negative) row order and 4-byte row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        return None
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        return None
    if width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    need = data_offset + stride * h
    if len(payload) < need:
        return None
    rows = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                      offset=data_offset)
        .reshape(h, stride)[:, : width * 3]
        .reshape(h, width, 3)
    )
    if height > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return rows.astype(np.int64).sum(axis=2) // 3


def downscale_gray(gray: np.ndarray, grid: int = DHASH_GRID) -> np.ndarray:
    """Integer-floor area average onto a ``grid x grid`` raster: cell
    (i, j) spans rows [i*h//grid, (i+1)*h//grid) etc., value =
    sum(cell) // count. Pure integer arithmetic — bit-replayable by any
    engine. Images already at the grid size pass through unchanged.
    Images smaller than the grid are rejected (None) rather than
    upsampled — a <8px image has no meaningful perceptual hash."""
    h, w = gray.shape
    if h == grid and w == grid:
        return gray
    if h < grid or w < grid:
        return None
    ys = [i * h // grid for i in range(grid + 1)]
    xs = [j * w // grid for j in range(grid + 1)]
    out = np.empty((grid, grid), dtype=np.int64)
    for i in range(grid):
        for j in range(grid):
            cell = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            out[i, j] = int(cell.sum()) // cell.size
    return out


def dhash_bits(cell: np.ndarray) -> int:
    """56-bit difference hash of an 8x8 gray raster: bit
    ``y * 7 + x`` set iff ``cell[y, x] > cell[y, x + 1]``."""
    grid = cell.shape[0]
    fp = 0
    diff = cell[:, :-1] > cell[:, 1:]
    for y in range(grid):
        for x in range(grid - 1):
            if diff[y, x]:
                fp |= 1 << (y * (grid - 1) + x)
    return fp


def bmp_dhash_frame(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """``(id, fp)`` dHash fingerprints for a binary BMP payload column:
    one Arrow-batched mapInPandas scan (decode + downscale + hash in
    numpy per image, no per-pixel Python). Undecodable payloads are
    dropped — near-dup pairing is defined over decodable images; count
    the drop rate upstream with ``multimodal.extract_image_features``
    if it matters."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                gray = bmp_gray_pixels(bytes(payload))
                if gray is None:
                    continue
                cell = downscale_gray(gray)
                if cell is None:
                    continue
                ids.append(i)
                fps.append(dhash_bits(cell))
            yield pd.DataFrame({"id": ids, "fp": fps})

    out_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        _hash, f"id {out_type}, fp long"
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    max_hamming: int = 2,
) -> DataFrame:
    """Image near-duplicate pairs ``(id_a, id_b, hamming)`` — all pairs
    of decodable BMP payloads whose dHash fingerprints differ in at
    most ``max_hamming`` of the 56 bits, id_a < id_b. Blocking and
    exact verification are ``dedup.simhash_pairs_from_fingerprints``
    (pigeonhole segments over the fingerprint, segment-keyed equi-join,
    ``bit_count(xor)`` verify — exact recall at the radius, never
    all-pairs)."""
    fp = bmp_dhash_frame(df, id_col, payload_col)
    return simhash_pairs_from_fingerprints(
        fp, bits=DHASH_BITS, max_hamming=max_hamming
    )
