"""Audio content fingerprinting → SimHash-blocked near-dup.

The audio twin of ``phash.py``'s image dHash: decode the PCM payload,
split the sample stream into equal time bands, and emit one bit per
adjacent band pair — ``bit k = energy(band k+1) > energy(band k)`` — a
temporal energy-delta fingerprint (the simplified single-band form of
Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR
2002 — public literature; their sign-of-energy-difference bit is exactly
this construction, here over time bands instead of a filterbank, since
no DSP/codec libraries ship in this environment). Integer end-to-end:
band energies are exact int64 sums of squares of 16-bit samples, so the
fingerprint is a pure function of the payload bytes on any engine.

The fingerprint frame feeds ``dedup.simhash_pairs_from_fingerprints``
(pigeonhole segment blocking, exact recall at the declared Hamming
radius) exactly like ``phash.bmp_dhash_frame`` does for images — the
multimodal content tier's shared candidate-join machinery, never
all-pairs.

Decoding is stdlib+numpy only (the ``phash`` PNG-decoder discipline):
a real RIFF chunk walk (``multimodal.parse_wav_meta``'s contract)
locates the ``fmt ``/``data`` chunks, ``np.frombuffer`` reads 16-bit
LE PCM, channels average to mono by integer floor division. Anything
else (other bit depths, compressed codecs, truncated containers)
returns None and the row drops from the fingerprint frame — the
undecodable tier, same as images.

Reference parity: criteo/ml-hadoop-experiment has no multimodal surface
(SURVEY.md §2) — north-star extension for LLM data pipelines.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .dedup import simhash_pairs_from_fingerprints

#: default band count; the fingerprint has ``n_bands - 1`` delta bits —
#: keep < 63 so the BIGINT stays nonnegative (simhash blocking contract)
N_BANDS = 32

#: untrusted-payload cap on decoded samples (the phash._MAX_PNG_PIXELS
#: discipline): a crafted data-chunk size must not drive the allocation
_MAX_WAV_SAMPLES = 64 * 1024 * 1024


def wav_pcm16_samples(payload: bytes) -> Optional[np.ndarray]:
    """Decode a 16-bit PCM RIFF/WAVE payload into a mono int64 sample
    array (channels averaged by integer floor division). Returns None
    for anything else — non-RIFF containers, non-PCM format tags,
    other bit depths, truncated or oversized data chunks."""
    n = len(payload)
    if n < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    channels = bits = fmt_tag = None
    data: Optional[bytes] = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 8][:4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            fmt_tag = int.from_bytes(payload[body:body + 2], "little")
            channels = int.from_bytes(payload[body + 2:body + 4], "little")
            bits = int.from_bytes(payload[body + 14:body + 16], "little")
        elif cid == b"data":
            if size > n - body:
                return None  # truncated container: undecodable tier
            data = payload[body:body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt_tag != 1 or bits != 16 or not channels or data is None:
        return None
    n_frames = len(data) // (2 * channels)
    if n_frames == 0 or n_frames * channels > _MAX_WAV_SAMPLES:
        return None
    samples = (
        np.frombuffer(data, dtype="<i2", count=n_frames * channels)
        .astype(np.int64)
        .reshape(n_frames, channels)
    )
    # integer mono mixdown: exact on both engines (floor division)
    return samples.sum(axis=1) // channels


def band_energy_fingerprint(
    samples: np.ndarray, n_bands: int = N_BANDS
) -> Optional[int]:
    """``n_bands - 1`` energy-delta bits over equal time bands:
    ``bit k = 1 iff E(k+1) > E(k)`` with ``E`` the exact int64 sum of
    squared samples. The stream truncates to a whole number of bands;
    fewer than ``n_bands`` samples is undecodable (None)."""
    n = len(samples) // n_bands
    if n == 0:
        return None
    s = samples[: n * n_bands].reshape(n_bands, n)
    e = (s * s).sum(axis=1)  # int64-exact: |s| < 2^16, n bounded upstream
    fp = 0
    for k in range(n_bands - 1):
        if e[k + 1] > e[k]:
            fp |= 1 << k
    return fp


def wav_fingerprint_frame(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """``(id, fp)`` over WAV payloads — one Arrow-batched mapInPandas
    (vectorized numpy decode per row, no per-sample Python); rows whose
    payload does not decode are dropped (the undecodable tier)."""
    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                samples = wav_pcm16_samples(bytes(payload))
                if samples is None:
                    continue
                fp = band_energy_fingerprint(samples, n_bands)
                if fp is None:
                    continue
                ids.append(rid)
                fps.append(fp)
            yield pd.DataFrame({"id": ids, "fp": fps}).astype(
                {"id": "int64", "fp": "int64"}
            )

    return df.select(id_col, payload_col).mapInPandas(
        _fp, "id long, fp long"
    )


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_bands: int = N_BANDS,
    max_hamming: int = 2,
) -> DataFrame:
    """Audio content near-dup: fingerprint every decodable payload,
    then the shared SimHash pigeonhole candidate join + exact popcount
    verify (``dedup.simhash_pairs_from_fingerprints`` — exact recall at
    ``max_hamming``, segment-keyed equi-join, never all-pairs).
    Returns ``(id_a, id_b, hamming)``."""
    fps = wav_fingerprint_frame(df, id_col, payload_col, n_bands)
    return simhash_pairs_from_fingerprints(
        fps, bits=n_bands - 1, max_hamming=max_hamming
    )


def wav_bytes(
    samples: np.ndarray, rate: int = 16000, channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM RIFF/WAVE encoder (mono-interleaved input as
    ``(n_frames * channels,)`` int array) — the synthesis/test encoder,
    the ``phash.bmp_bytes``/``png_bytes`` analogue."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body
