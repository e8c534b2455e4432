"""Vectorized TFRecord batch encoder — numpy, byte-identical to the
per-row codec in ``sources/tfrecords.py``.

The per-row pure-Python encoder measures ~115k rows/s/core and the
per-byte pure-Python CRC32C roughly doubles the cost of small records —
fine for tests, a bottleneck for a 100 TB sink (reference parity target:
the JVM spark-tensorflow-connector datasource, tfrecords.py:239-268).
This module removes both Python loops for the dominant sink shape
(every feature a scalar ``FixedLenFeature``, no nulls in the batch):

- protobuf framing: per-feature entry lengths are computed as numpy
  arrays, record offsets by cumsum, and every constant/length byte is
  scattered with one fancy-indexed store per byte position;
- int64 varints: a 10-step masked shift/mask loop, vectorized over rows;
- float payloads: ``astype('<f4').view(uint8)`` column scatters;
- string payloads: vectorized varint length chains + one memcpy per row
  (content copy only — all framing stays vectorized);
- TFRecord CRC32C: computed in LOCKSTEP across records — for byte
  position j, every record longer than j advances its running CRC with
  one table lookup, so the Python-level loop is O(max record length),
  not O(total bytes).

``encode_framed_batch`` returns the complete wire stream for a batch
(length | masked_crc | data | masked_crc per record), ready to append to
a (gzip) file. Unsupported specs or batches with nulls return None and
the caller falls back to the per-row codec; byte-identity between the
two paths is asserted in tests/test_tfrecords_vec.py.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from ml_hadoop_experiment_spark.schema.feature_spec import (
    FeatureSpecs,
    FixedLenFeature,
)
from ml_hadoop_experiment_spark.sources.tfrecords import _CRC_TABLE

_CRC_TABLE_NP = np.array(_CRC_TABLE, dtype=np.uint32)

_INT_DTYPES = ("int32", "int64")
_FLOAT_DTYPES = ("float32", "float64")
_STR_DTYPES = ("string",)


def vectorized_supported(specs: FeatureSpecs) -> bool:
    """True when every spec is a scalar FixedLenFeature of a supported
    dtype with a name short enough for single-byte length varints."""
    for name, spec in specs.items():
        if not isinstance(spec, FixedLenFeature) or spec.shape:
            return False
        if spec.dtype not in _INT_DTYPES + _FLOAT_DTYPES + _STR_DTYPES:
            return False
        if len(name.encode()) > 100:  # keeps every framing varint 1 byte
            return False
    return True


def _varint_len(v: np.ndarray, max_bytes: int) -> np.ndarray:
    """Per-element varint byte length of an unsigned array."""
    out = np.ones(len(v), dtype=np.int64)
    for k in range(1, max_bytes):
        out += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return out


def _scatter_varint(
    buf: np.ndarray, pos: np.ndarray, val: np.ndarray, vlen: np.ndarray, max_bytes: int
) -> None:
    """Write varint(val[i]) at buf[pos[i]...] for every row, vectorized per
    byte position."""
    v = val.astype(np.uint64)
    for k in range(max_bytes):
        m = vlen > k
        if not m.any():
            break
        byte = (v[m] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (vlen[m] - 1) > k
        buf[pos[m] + k] = (
            byte | np.where(cont, np.uint64(0x80), np.uint64(0))
        ).astype(np.uint8)


def _scatter_const(buf: np.ndarray, pos: np.ndarray, data: bytes) -> np.ndarray:
    """Write the same constant bytes at buf[pos[i]...] for every row;
    returns pos advanced past them."""
    for j, b in enumerate(data):
        buf[pos + j] = b
    return pos + len(data)


def _crc32c_lockstep(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """CRC32C of buf[starts[i] : starts[i]+lens[i]] for every record,
    advanced one byte position at a time across all records."""
    crc = np.full(len(starts), 0xFFFFFFFF, dtype=np.uint32)
    if len(starts) == 0:
        return crc ^ np.uint32(0xFFFFFFFF)
    for j in range(int(lens.max())):
        m = lens > j
        b = buf[starts[m] + j]
        crc[m] = (crc[m] >> np.uint32(8)) ^ _CRC_TABLE_NP[(crc[m] ^ b) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


def _masked(crc: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        rot = (crc >> np.uint32(15)) | (crc << np.uint32(17))
        return rot + np.uint32(0xA282EAD8)


def _key_entry(name: str) -> bytes:
    raw = name.encode()
    return b"\x0a" + bytes([len(raw)]) + raw


def encode_framed_batch(pdf: pd.DataFrame, specs: FeatureSpecs) -> Optional[bytes]:
    """Complete TFRecord wire stream for a batch, or None when the batch
    needs the per-row fallback (nulls present / unsupported specs)."""
    if not vectorized_supported(specs):
        return None
    n = len(pdf)
    if n == 0:
        return b""

    cols: Dict[str, Any] = {}
    for name, spec in specs.items():
        if name not in pdf.columns:
            return None  # absent column: per-row path handles defaults
        s = pdf[name]
        if s.isna().any():
            return None  # null semantics (omit/synthesize) stay per-row
        cols[name] = s

    # --- per-feature entry lengths -------------------------------------
    feat_plan = []  # (name, spec, kind, per-row arrays...)
    entry_lens = []
    for name, spec in specs.items():
        key = _key_entry(name)
        K = len(key)
        if spec.dtype in _INT_DTYPES:
            v = cols[name].to_numpy().astype(np.int64).astype(np.uint64)
            L = _varint_len(v, 10)
            E = K + L + 8
            feat_plan.append((key, "int", v, L))
        elif spec.dtype in _FLOAT_DTYPES:
            fb = cols[name].to_numpy().astype("<f4").view(np.uint8).reshape(n, 4)
            E = np.full(n, K + 12, dtype=np.int64)
            feat_plan.append((key, "float", fb, None))
        else:
            raw = [
                x.encode() if isinstance(x, str) else bytes(x) for x in cols[name]
            ]
            blen = np.fromiter((len(b) for b in raw), dtype=np.int64, count=n)
            vl_b = _varint_len(blen.astype(np.uint64), 5)
            inner = 1 + vl_b + blen
            vl_i = _varint_len(inner.astype(np.uint64), 5)
            feat = 1 + vl_i + inner
            vl_f = _varint_len(feat.astype(np.uint64), 5)
            body = K + 1 + vl_f + feat
            vl_body = _varint_len(body.astype(np.uint64), 5)
            E = 1 + vl_body + body
            feat_plan.append(
                (key, "str", raw, (blen, vl_b, inner, vl_i, feat, vl_f, body, vl_body))
            )
        entry_lens.append(E)

    T = np.sum(entry_lens, axis=0)  # Example.features payload length
    vl_T = _varint_len(T.astype(np.uint64), 5)
    rec_len = 1 + vl_T + T  # serialized Example length
    framed = 8 + 4 + rec_len + 4
    rec_start = np.concatenate(([0], np.cumsum(framed)[:-1]))
    total = int(framed.sum())
    buf = np.zeros(total, dtype=np.uint8)

    # --- header: uint64 LE record length -------------------------------
    lb = rec_len.astype("<u8").view(np.uint8).reshape(n, 8)
    for j in range(8):
        buf[rec_start + j] = lb[:, j]
    data_start = rec_start + 12

    # --- Example framing ------------------------------------------------
    cur = data_start.copy()
    buf[cur] = 0x0A
    cur += 1
    _scatter_varint(buf, cur, T, vl_T, 5)
    cur += vl_T

    for (key, kind, payload, extra), E in zip(feat_plan, entry_lens):
        K = len(key)
        if kind == "int":
            v, L = payload, extra
            buf[cur] = 0x0A
            buf[cur + 1] = (K + L + 6).astype(np.uint8)
            p = _scatter_const(buf, cur + 2, key)
            buf[p] = 0x12
            buf[p + 1] = (L + 4).astype(np.uint8)
            buf[p + 2] = 0x1A
            buf[p + 3] = (L + 2).astype(np.uint8)
            buf[p + 4] = 0x0A
            buf[p + 5] = L.astype(np.uint8)
            _scatter_varint(buf, p + 6, v, L, 10)
        elif kind == "float":
            fb = payload
            buf[cur] = 0x0A
            buf[cur + 1] = K + 10
            p = _scatter_const(buf, cur + 2, key)
            p = _scatter_const(buf, p, b"\x12\x08\x12\x06\x0a\x04")
            for j in range(4):
                buf[p + j] = fb[:, j]
        else:
            raw = payload
            blen, vl_b, inner, vl_i, feat, vl_f, body, vl_body = extra
            buf[cur] = 0x0A
            p = cur + 1
            _scatter_varint(buf, p, body, vl_body, 5)
            p = p + vl_body
            p = _scatter_const(buf, p, key)
            buf[p] = 0x12
            p = p + 1
            _scatter_varint(buf, p, feat, vl_f, 5)
            p = p + vl_f
            buf[p] = 0x0A
            p = p + 1
            _scatter_varint(buf, p, inner, vl_i, 5)
            p = p + vl_i
            buf[p] = 0x0A
            p = p + 1
            _scatter_varint(buf, p, blen, vl_b, 5)
            p = p + vl_b
            for i, b in enumerate(raw):  # content memcpy only
                if b:
                    s = p[i]
                    buf[s : s + len(b)] = np.frombuffer(b, dtype=np.uint8)
        cur = cur + E

    # --- CRCs ------------------------------------------------------------
    hcrc = _masked(_crc32c_lockstep(buf, rec_start, np.full(n, 8, dtype=np.int64)))
    hb = hcrc.astype("<u4").view(np.uint8).reshape(n, 4)
    for j in range(4):
        buf[rec_start + 8 + j] = hb[:, j]
    dcrc = _masked(_crc32c_lockstep(buf, data_start, rec_len))
    db = dcrc.astype("<u4").view(np.uint8).reshape(n, 4)
    tail = data_start + rec_len
    for j in range(4):
        buf[tail + j] = db[:, j]

    return buf.tobytes()


def frame_record(rec: bytes) -> bytes:
    """Single-record TFRecord framing (per-row fallback companion)."""
    from ml_hadoop_experiment_spark.sources.tfrecords import _masked_crc

    header = struct.pack("<Q", len(rec))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + rec
        + struct.pack("<I", _masked_crc(rec))
    )
