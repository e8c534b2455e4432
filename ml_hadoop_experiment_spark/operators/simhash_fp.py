"""Arrow-vectorized SimHash fingerprint (optimization round 14).

The round-1 fingerprint (:func:`operators.dedup.simhash`) evaluates 32
higher-order-function filter scans per fingerprint — a ~1.5k-node
Catalyst expression tree whose real cost is not the byte compares
(r13's A/Bs already minimized those) but the TREE: re-analyzed on every
downstream transformation, Janino-compiled per plan, duplicated across
join sides below the block frame's persist crossover, and re-compiled
per MICRO-BATCH in streaming. This module evaluates the IDENTICAL
function as ONE vectorized ``pandas_udf`` projection (guide §4.2/§7.3):
tokenization (``split(trim(lower(col)), '\\s+')``) stays in the JVM so
the token contract is Spark's own by construction, and only the token
arrays cross to Python, where hashlib (md5 / sha256) + numpy compute
per-bit votes per batch.

Receipts (isolated 1 warm + min-of-3, sf0.1, local[32], interleaved
with the expression form where the host drifted): simhash 1.30→0.84,
simhash_pairs 5.42→2.22, simhash_incr 4.49→2.31, simhash_index
3.92→2.68, dedup_keep_best 6.33→4.16, streaming_simhash 15.62→2.55
(the expression was re-Janino-compiled per micro-batch).

Bit-identity with the expression form (and therefore with
``dedup.simhash_sql``'s DuckDB twin) is pinned by
``tests/test_simhash_arrow.py``: fixture-corpus equality at bits 16/32,
whitespace/empty/NULL edge cases at bits 16/32/63, single-evaluation
plan shape, plus a 3500-case standalone kernel-vs-reference check at
the swap.

A SEPARATE module from ``operators/dedup.py`` for the same reason
``plans/percentiles.py`` is separate from ``plans/prefix.py``: the
stale-green fingerprint closure (tools/green_state.py) hashes every
transitively imported engine module, and editing the dedup hub would
re-fingerprint its ~45 query importers (the whole MinHash family
included) past the 50-entry driver-window capacity. Only the call
sites that actually changed evaluation strategy import from here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _simhash_block_frame,
    simhash_pairs_from_fingerprints,
)

#: per-bits cache of the Arrow fingerprint UDFs (pandas_udf registration
#: costs a py4j round trip; every call site reuses one function object)
_SIMHASH_ARROW_UDFS: dict = {}


def _simhash_arrow_udf(bits: int):
    """Vectorized SimHash vote kernel: an Arrow ``pandas_udf`` taking the
    TOKEN ARRAY column and returning the ``bits``-bit fingerprint. Per
    batch: md5/sha256 each token once (hashlib — C speed), extract the
    top bit of each digest nibble with two numpy shifts, sum votes per
    bit, pack the sign bits.

    Value contract is IDENTICAL to ``dedup.simhash`` (pinned bit-for-bit
    by tests/test_simhash_arrow.py): nibble b of the hex digest >= '8'
    == bit 7 (even b) / bit 3 (odd b) of digest byte b//2; vote rule
    ``2 * set_count > n`` strict; NULL token array -> 0 (the expression
    form's ``when(...).otherwise(0)`` sum over a NULL-size comparison
    also yields 0)."""
    if bits in _SIMHASH_ARROW_UDFS:
        return _SIMHASH_ARROW_UDFS[bits]
    assert 1 <= bits <= 63, "bigint fingerprint holds at most 63 bits"
    import hashlib

    nbytes = (bits + 1) // 2  # digest bytes that carry the used nibbles
    hasher = hashlib.md5 if bits <= 32 else hashlib.sha256
    digest_len = 16 if bits <= 32 else 32

    @F.pandas_udf("long")
    def _fp(tokens: pd.Series) -> pd.Series:
        shifts = np.arange(bits, dtype=np.uint64)
        out = np.zeros(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue  # fp 0, matching the expression form
            n = len(toks)
            buf = b"".join(hasher(t.encode("utf-8")).digest() for t in toks)
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, digest_len)
            arr = arr[:, :nbytes]
            # even nibble index 2j = high nibble of byte j (>= 8 == top
            # bit); odd nibble 2j+1 = low nibble (its bit 3)
            mat = np.empty((n, 2 * nbytes), dtype=np.uint8)
            mat[:, 0::2] = arr >> 7
            mat[:, 1::2] = (arr >> 3) & 1
            votes = mat[:, :bits].sum(axis=0, dtype=np.int64)
            fp_bits = (votes * 2 > n).astype(np.uint64)
            out[i] = int((fp_bits << shifts).sum())
        return pd.Series(out)

    _SIMHASH_ARROW_UDFS[bits] = _fp
    return _fp


def simhash(col: Column, bits: int = 16) -> Column:
    """``bits``-bit SimHash fingerprint of the whitespace token multiset
    — bit-identical to ``dedup.simhash`` (and to ``dedup.simhash_sql``'s
    DuckDB twin), evaluated as ONE Arrow-vectorized projection instead
    of 32 higher-order-function filter scans. See the module docstring
    for the why and the receipts."""
    tokens = F.split(F.trim(F.lower(col)), r"\s+")
    return _simhash_arrow_udf(bits)(tokens)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int,
    max_hamming: int = 2,
) -> DataFrame:
    """``dedup.simhash_near_dup_pairs`` with the Arrow fingerprint:
    identical result contract (exact recall at the radius via the same
    pigeonhole blocking + ``bit_count(xor)`` verify — the candidate and
    verify stages are literally ``dedup.simhash_pairs_from_fingerprints``,
    unchanged); only the fingerprint column's evaluation strategy
    differs. ``bits`` is explicit here (every declared caller pins it);
    use the dedup original for the auto-width path."""
    fp = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("fp")
    )
    return simhash_pairs_from_fingerprints(fp, bits=bits, max_hamming=max_hamming)


def simhash_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """``dedup.simhash_against`` with the Arrow fingerprint: the same
    new-vs-corpus pigeonhole segment join (``_simhash_block_frame`` on
    both sides, corpus never self-paired, exact recall at the radius),
    only the fingerprint evaluation strategy differs."""
    fp_new = new_df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("fp")
    )
    fp_corp = corpus_df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("fp")
    )
    n = _simhash_block_frame(fp_new, bits, max_hamming).alias("n")
    c = _simhash_block_frame(fp_corp, bits, max_hamming).alias("c")
    cands = (
        n.join(
            c,
            (F.col("n.part") == F.col("c.part"))
            & (F.col("n.block") == F.col("c.block")),
        )
        .select(
            F.col("n.id").alias("id_new"),
            F.col("c.id").alias("id_corpus"),
            F.col("n.fp").alias("fp_a"),
            F.col("c.fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cands.select("id_new", "id_corpus", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


__all__ = ["simhash", "simhash_near_dup_pairs", "simhash_against"]
