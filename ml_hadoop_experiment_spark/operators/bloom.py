"""Bloom-prefiltered incremental exact dedup.

``dedup.dedup_against`` (the plain form) left-anti joins the new batch
against the reference corpus's DISTINCT digest set — correct, but the
exchange carries the digest of EVERY corpus row. At 100 TB-corpus /
1 TB-batch steady state that shuffle is the whole cost: the corpus side
is ~100x the side being deduped.

This module replaces the corpus-sized shuffle with a corpus-sized SCAN
plus a KB..MB broadcast, by building the filter over the SMALL side:

1. build: one map-only pass over the batch hashes each row's content
   digest into a per-partition numpy bitmap (vectorized,
   Arrow-batched); partial bitmaps OR-merge JVM-side through a
   ``groupBy(word_index).agg(bit_or(word))`` whose cardinality is
   bounded by the bitmap size (m/64 rows), NOT the row count — the
   only exchange in the build moves the bitmap, never rows;
2. prune: the bitmap broadcasts to executors; each CORPUS partition
   probes it (classic double-hashing Bloom probe, numpy end to end)
   and forwards only digests that might match the batch — a map-only
   pass over the corpus producing ~(true matches + fpp x corpus) rows;
3. verify: the tiny candidate digest set distincts and broadcast
   anti-joins back into the batch. Nothing corpus-sized ever shuffles.

The final result is EXACT (bit-identical to ``dedup_against``): the
Bloom filter has no false negatives, and false positives only add
candidate digests that match no batch row. The filter is deterministic
(fixed hash seeds), so the whole operator is replayable.

A prebuilt CORPUS-side filter (built once per corpus snapshot, reused
across incoming batches) composes in front as an extra batch-pruning
pass — see ``dedup_against_bloom``'s ``bloom`` parameter.

Scale envelope, stated not implied: the broadcast bitmap must fit an
executor. The default cap (``DEFAULT_MAX_BITS`` = 2^28 bits = 32 MiB)
holds ~18.6M batch digests at 1% fpp — and because the filter is sized
to the BATCH, fpp at a fixed cap improves as the batch shrinks, which
is exactly the 100 TB-corpus/small-batch regime. Past the cap the
filter saturates GRACEFULLY — fpp rises, the candidate set grows
toward the corpus digest set, the result stays exact.

Reference parity: extends ``dedup_against`` (the reference engine,
criteo/ml-hadoop-experiment, has no cross-corpus dedup at all — its
scope ends at ML-inference glue); same digest definition
(``dedup.content_digest``), same output contract.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import content_digest

#: bitmap-size cap (bits). 2^28 bits = 32 MiB broadcast — holds ~18.6M
#: items at 1% fpp; beyond it the filter degrades (higher fpp), never
#: breaks (the exact verify join catches every false positive).
DEFAULT_MAX_BITS = 1 << 28

#: odd multiplier deriving the second probe hash from the first
#: (splitmix64 finalizer constant); any fixed odd mixer works because
#: build and probe share this exact code path.
_H2_MULT = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(expected_items: int, fpp: float, max_bits: int = DEFAULT_MAX_BITS):
    """(m_bits, k_hashes) for the standard Bloom sizing formulae,
    m rounded up to a multiple of 64 and clamped to [64, max_bits],
    k clamped to [1, 16]."""
    n = max(1, int(expected_items))
    p = min(max(float(fpp), 1e-12), 0.5)
    m = int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
    m = max(64, min(int(max_bits), m))
    m = (m + 63) // 64 * 64
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _positions(h: np.ndarray, k: int, m: int) -> Iterator[np.ndarray]:
    """k probe positions per hash via double hashing: pos_i =
    (h1 + i*h2) mod m with h2 forced odd. ``h`` is uint64."""
    h1 = h
    h2 = (h * _H2_MULT) | np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.uint64)


class DigestBloom:
    """An immutable Bloom filter over content digests: the numpy bitmap
    plus its sizing. Build once per corpus snapshot with
    :func:`build_digest_bloom`, reuse across incoming batches (the
    steady-state pattern — same lifecycle as the near-dup
    ``CorpusIndex``)."""

    def __init__(self, words: np.ndarray, m: int, k: int, n_items: int):
        self.words = words  # uint64[m/64]
        self.m = int(m)
        self.k = int(k)
        self.n_items = int(n_items)

    def might_contain(self, h: np.ndarray) -> np.ndarray:
        """Vectorized probe: bool[len(h)] for uint64 hashes."""
        out = np.ones(len(h), dtype=bool)
        for pos in _positions(h, self.k, self.m):
            word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            bit = np.uint64(1) << (pos & np.uint64(63))
            out &= (word & bit) != 0
        return out


def _digest_hash(cols: List[str]):
    """int64 xxhash64 of the row's content digest — the JVM-side half
    shared by build and probe (both numpy halves run on its output)."""
    return F.xxhash64(content_digest([F.col(c) for c in cols]))


def build_digest_bloom(
    reference: DataFrame,
    content_cols: List[str],
    expected_items: Optional[int] = None,
    fpp: float = 0.01,
    max_bits: int = DEFAULT_MAX_BITS,
) -> DigestBloom:
    """Build a :class:`DigestBloom` over ``reference``'s content
    digests in one distributed pass (``dedup_against_bloom`` builds
    one over the batch internally; build one over the corpus yourself
    to use as the reusable steady-state prefilter).

    ``expected_items`` sizes the filter; when omitted, one
    ``reference.count()`` job runs first (parquet sources answer it
    from footer metadata). The build's only exchange is the
    (word_index, partial_word) frame — at most m/64 rows per
    partition, map-side combined by ``bit_or`` — so build cost is a
    scan of the input, independent of its row count on the wire.
    """
    if expected_items is None:
        expected_items = reference.count()
    m, k = bloom_params(expected_items, fpp, max_bits)
    n_words = m // 64
    hashed = reference.select(_digest_hash(list(content_cols)).alias("__h"))
    out_schema = T.StructType(
        [T.StructField("idx", T.LongType()), T.StructField("word", T.LongType())]
    )

    def partition_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            h = pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
            for pos in _positions(h, k, m):
                np.bitwise_or.at(
                    words,
                    (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        if not seen:
            return
        nz = np.flatnonzero(words)
        yield pd.DataFrame(
            {"idx": nz.astype(np.int64), "word": words[nz].view(np.int64)}
        )

    merged = (
        hashed.mapInPandas(partition_bitmap, out_schema)
        .groupBy("idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    )
    words = np.zeros(n_words, dtype=np.uint64)
    for r in merged:
        words[int(r["idx"])] = np.int64(r["word"]).astype(np.uint64)
    return DigestBloom(words, m, k, int(expected_items))


def _might_contain_udf(spark, bloom: DigestBloom):
    """Arrow-vectorized membership probe over an int64 hash column,
    closing over a broadcast of the filter's bitmap."""
    bc = spark.sparkContext.broadcast(
        (bloom.words.view(np.int64).tobytes(), bloom.m, bloom.k)
    )

    @F.pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        raw, m, k = bc.value
        flt = DigestBloom(np.frombuffer(raw, dtype=np.uint64), m, k, 0)
        return pd.Series(
            flt.might_contain(h.to_numpy(dtype=np.int64).view(np.uint64))
        )

    return might_contain


def dedup_against_bloom(
    df: DataFrame,
    reference: DataFrame,
    content_cols: List[str],
    ref_content_cols: Optional[List[str]] = None,
    bloom: Optional[DigestBloom] = None,
    fpp: float = 0.01,
    max_bits: int = DEFAULT_MAX_BITS,
) -> DataFrame:
    """Exact cross-corpus dedup without a corpus-sized exchange: drop
    rows of ``df`` whose content digest appears in ``reference`` —
    bit-identical output to ``dedup.dedup_against``.

    The filter is built over the BATCH, not the corpus — that direction
    is what kills the big exchange. ``dedup_against``'s anti-join must
    move the corpus's distinct digest set through a shuffle (it is far
    too big to broadcast); here the corpus is only ever SCANNED: each
    corpus partition probes the broadcast batch filter and forwards
    just the digests that might match the batch. With the filter sized
    to the batch (m/n bits/item is generous because n is the small
    side), the surviving candidate set is ~(true matches + fpp x
    corpus) digests — small enough that its distinct+broadcast
    anti-join back into the batch is a broadcast join, so NOTHING
    corpus-sized ever shuffles. False positives only add candidate
    digests that match no batch row; false negatives don't exist; the
    result is exact.

    A prebuilt corpus ``bloom`` (:func:`build_digest_bloom` over the
    reference, reused across batches — the steady-state pattern) adds a
    FIRST pruning pass on the batch side: rows it proves new skip even
    the candidate join, and the batch filter is then built over the
    smaller "possibly seen" remainder. This amortizes the corpus scan
    cost of filter construction across many batches while keeping the
    corpus-side plan scan-only.

    ``df`` is scanned up to three times (count for sizing, filter
    build, final join) — all map-only over the SMALL side; persist it
    first if its lineage is expensive.
    """
    cols = list(content_cols)
    ref_cols = list(ref_content_cols or cols)
    spark = df.sparkSession

    if bloom is not None:
        probe = _might_contain_udf(spark, bloom)
        marked = df.withColumn("__maybe", probe(_digest_hash(cols)))
        definitely_new = marked.where(~F.col("__maybe")).drop("__maybe")
        survivors = marked.where(F.col("__maybe")).drop("__maybe")
    else:
        definitely_new = None
        survivors = df

    batch_bloom = build_digest_bloom(
        survivors, cols, fpp=fpp, max_bits=max_bits
    )
    ref_probe = _might_contain_udf(spark, batch_bloom)
    candidates = (
        reference.select(
            content_digest([F.col(c) for c in ref_cols]).alias("__digest")
        )
        .where(ref_probe(F.xxhash64(F.col("__digest"))))
        .distinct()
    )
    deduped = (
        survivors.withColumn("__digest", content_digest([F.col(c) for c in cols]))
        .join(candidates, "__digest", "left_anti")
        .drop("__digest")
    )
    if definitely_new is None:
        return deduped
    return definitely_new.unionByName(deduped)


__all__ = [
    "DEFAULT_MAX_BITS",
    "DigestBloom",
    "bloom_params",
    "build_digest_bloom",
    "dedup_against_bloom",
]
