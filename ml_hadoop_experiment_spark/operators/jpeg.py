"""Baseline-sequential JPEG codec — stdlib + numpy, no codec deps.

Closes the image content-dedup format gap (round 13): crawled corpora
are overwhelmingly JPEG, and until now ``phash.decode_gray_pixels``
handled BMP + PNG content while ``multimodal.py`` only parsed JPEG SOF
headers. This module implements the baseline DCT process of ITU-T T.81
(public specification; Annex K's example Huffman/quantization tables):

- **Decoder** (:func:`jpeg_gray_pixels`): marker walk (DQT with 8/16-bit
  precision, DHT, SOF0, SOS, DRI; APPn/COM skipped), canonical Huffman
  decode with byte de-stuffing and restart-marker resync, dequantize +
  de-zigzag, 8x8 IDCT as an orthonormal matrix product, generic MCU
  walk over 1- or 3-component scans with arbitrary 1-2x sampling
  factors (4:4:4, 4:2:2, 4:2:0), nearest-neighbor chroma upsample,
  JFIF YCbCr->RGB, and the engine's integer gray ``(r+g+b)//3``.
  Grayscale scans skip the color conversion entirely, so an
  all-ones-quantized grayscale roundtrip's only error is the
  DCT-coefficient rounding (|err| <= ~4 per pixel) — the property the
  oracle-gated fixture leans on. Non-baseline processes (progressive
  SOF2, arithmetic coding, 12-bit) return None, matching the PNG/BMP
  decoders' honest-scope contract.
- **Encoder** (:func:`jpeg_bytes`): the fixture-synthesis half —
  grayscale or YCbCr color at 4:4:4/4:2:0, flat or custom quant
  tables, optional restart interval; writes the Annex K example
  Huffman tables into DHT (the decoder reads tables from the FILE, so
  the roundtrip never assumes them).

Untrusted-byte discipline (the ``phash.png_gray_pixels`` rules): a
claimed geometry is capped at 64 MP before any allocation, segment
lengths are bounds-checked, and the entropy decode touches at most
``blocks x 64`` coefficients. Per-image decode is Python inside the
Arrow-batched ``mapInPandas`` scan — the same cost profile as PNG's
sequential defilter rows, and the point of the query that uses it.

Reference parity: criteo/ml-hadoop-experiment has no multimodal
surface (SURVEY.md §2) — north-star extension.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

#: untrusted-JPEG allocation cap (the _MAX_PNG_PIXELS discipline)
_MAX_JPEG_PIXELS = 64 * 1024 * 1024

# --------------------------------------------------------------------------
# Shared constants: zigzag order and the orthonormal 8x8 DCT basis
# --------------------------------------------------------------------------


def _zigzag_order() -> List[Tuple[int, int]]:
    """(row, col) positions in zigzag scan order: diagonals of
    ascending row+col, even diagonals walked bottom-left -> top-right."""
    order: List[Tuple[int, int]] = []
    for s in range(15):
        diag = [
            (i, s - i)
            for i in range(max(0, s - 7), min(s, 7) + 1)
        ]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return order


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: C[u, x] = 0.5 c(u) cos((2x+1)u pi/16);
    forward = C @ block @ C.T, inverse = C.T @ coef @ C."""
    c = np.empty((8, 8))
    for u in range(8):
        for x in range(8):
            cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_matrix()

# --------------------------------------------------------------------------
# Annex K example Huffman tables (written by the encoder; the decoder
# always reads tables from the file's DHT segments)
# --------------------------------------------------------------------------

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value -> (code, length) under JPEG's canonical assignment
    (codes of ascending length, ascending within a length)."""
    codes: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; restart markers are consumed via resync()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: Optional[int] = None  # pending marker byte

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # RSTn / EOI: stop before it
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> Optional[int]:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> Optional[int]:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def resync(self) -> bool:
        """Consume an expected restart marker and realign."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit: scan forward for it
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            return False
        self.pos += 2
        self.marker = None
        return True


def _decode_huff(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> Optional[int]:
    """Decode one value from a (length, code) -> value map (canonical
    codes are at most 16 bits)."""
    code = 0
    for length in range(1, 17):
        b = reader.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        v = table.get((length, code))
        if v is not None:
            return v
    return None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t magnitude bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_gray_pixels(payload: bytes) -> Optional[np.ndarray]:
    """Decode a baseline-sequential (SOF0) JPEG into a top-down
    ``(height, width)`` int array of grays — the luma plane's integer
    gray for 1-component scans, JFIF YCbCr->RGB then ``(r+g+b)//3``
    for 3-component scans. Returns None for anything the baseline
    process does not cover (progressive, arithmetic, 12-bit, 4-comp
    CMYK) or any malformed/oversized geometry — the
    :func:`~.phash.bmp_gray_pixels` honest-scope contract."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4: pos + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq == 1 else 1)
                if p + n > len(seg) or tq > 3:
                    return None
                if pq == 1:
                    vals = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=p
                    ).astype(np.int64)
                else:
                    vals = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int64)
                q = np.empty((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    q[r, c] = vals[k]
                qtables[tq] = q
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                if tc > 1 or th > 3 or p + 17 + n > len(seg):
                    return None
                vals = list(seg[p + 17: p + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): v
                    for v, (code, length) in codes.items()
                }
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3):
                return None
            if w <= 0 or h <= 0 or w * h > _MAX_JPEG_PIXELS:
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline process
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if frame is None or ns != len(frame[2]):
                return None
            scan_tables = {}
            for i in range(ns):
                cs, tt = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            scan = (scan_tables, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        return None
    h, w, comps = frame
    scan_tables, data_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64)
    reader = _BitReader(payload, data_pos)
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                if not reader.resync():
                    return None
                pred = {c[0]: 0 for c in comps}
            for cid, hs, vs, tq in comps:
                if cid not in scan_tables or tq not in qtables:
                    return None
                td, ta = scan_tables[cid]
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                if dct is None or act is None:
                    return None
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        t = _decode_huff(reader, dct)
                        if t is None or t > 15:
                            return None
                        bits_v = reader.read_bits(t)
                        if bits_v is None:
                            return None
                        pred[cid] += _extend(bits_v, t)
                        coef = np.zeros(64, dtype=np.int64)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            bv = reader.read_bits(s)
                            if bv is None:
                                return None
                            coef[k] = _extend(bv, s)
                            k += 1
                        block = np.zeros((8, 8), dtype=np.float64)
                        for kk, (r, c) in enumerate(ZIGZAG):
                            block[r, c] = coef[kk] * q[r, c]
                        spatial = _C.T @ block @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0: y0 + 8, x0: x0 + 8] = spatial
            mcu_count += 1
    # upsample to full resolution, convert, crop
    out = {}
    for cid, hs, vs, _tq in comps:
        plane = planes[cid]
        ys = (np.arange(h) * vs) // vmax
        xs = (np.arange(w) * hs) // hmax
        out[cid] = plane[np.ix_(ys, xs)]
    vals = [np.clip(np.round(out[c[0]]), 0, 255) for c in comps]
    if len(comps) == 1:
        return vals[0].astype(np.int64)
    y, cb, cr = (out[c[0]] for c in comps)
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(
        np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
        0, 255,
    )
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
    return (
        r.astype(np.int64) + g.astype(np.int64) + b.astype(np.int64)
    ) // 3


# --------------------------------------------------------------------------
# Encoder (fixture synthesis + pytest roundtrips)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: Dict[int, Tuple[int, int]],
    ac_codes: Dict[int, Tuple[int, int]],
) -> int:
    coef2d = np.round((_C @ (block - 128.0) @ _C.T) / q).astype(np.int64)
    coef = np.array([coef2d[r, c] for r, c in ZIGZAG], dtype=np.int64)
    diff = int(coef[0]) - pred

    def cat(v: int) -> int:
        return 0 if v == 0 else int(abs(v)).bit_length()

    t = cat(diff)
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = cat(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(coef[0])


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + bh - 1) // bh * bh
    pw = (w + bw - 1) // bw * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _dqt(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(q[r, c]) for r, c in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _dht(tc: int, th: int, bits: List[int], vals: List[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def jpeg_bytes(
    pixels: np.ndarray,
    quant: Optional[np.ndarray] = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a raster as baseline-sequential JPEG. ``pixels`` is
    ``(h, w)`` int grays (one-component scan) or ``(h, w, 3)`` RGB
    (JFIF YCbCr, ``subsampling`` '444' or '420'). ``quant`` defaults
    to all-ones (the near-lossless fixture table; pass Annex K tables
    for realistic tests). Writes the Annex K example Huffman tables."""
    gray = pixels.ndim == 2
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    q = quant.astype(np.int64)
    h, w = pixels.shape[:2]
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: pixels.astype(np.float64)}
    else:
        sub = {"444": (1, 1), "420": (2, 2)}[subsampling]
        comps = [(1, sub[0], sub[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = {1: y, 2: cb, 3: cr}
        if subsampling == "420":
            for cid in (2, 3):
                p = _pad_to_blocks(planes[cid], 2, 2)
                planes[cid] = (
                    p[0::2, 0::2] + p[1::2, 0::2]
                    + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = {}
    for cid, hs, vs, _tq in comps:
        # pad the component plane to its full MCU-grid extent
        p = planes[cid]
        need_h, need_w = mcuy * vs * 8, mcux * hs * 8
        padded[cid] = np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        )
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, q)
    if not gray:
        out += _dqt(1, q)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += struct.pack(">BBB", cid, (hs << 4) | vs, tq)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if not gray:
        out += _dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _hs, _vs, _tq in comps:
        th = 0 if cid == 1 else 1
        sos += struct.pack(">BB", cid, (th << 4) | th)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_lum = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    writer = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {c[0]: 0 for c in comps}
            for cid, hs, vs, _tq in comps:
                dc = dc_lum if cid == 1 else dc_chr
                ac = ac_lum if cid == 1 else ac_chr
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = padded[cid][y0: y0 + 8, x0: x0 + 8]
                        pred[cid] = _encode_block(
                            writer, block, q, pred[cid], dc, ac
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


#: Annex K example luminance quantization table (for realistic tests)
ANNEX_K_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
