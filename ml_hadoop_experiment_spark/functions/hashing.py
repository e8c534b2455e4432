"""Hash expressions: fast native variants and oracle-portable variants.

The reference derives deterministic sampling columns from Spark's Murmur3
``hash()`` scaled to [0,1) (sampling.py:15-23: ``0.5 + hash/2**32``). That is
deterministic *within Spark* but not portable to other engines (DuckDB's
``hash()`` is a different function), so every operator here offers two modes:

- ``spark_unit_hash``      — native Murmur3, JVM codegen, the fast path for
                             production clusters (reference-fidelity semantics).
- ``portable_unit_hash`` / ``portable_string_unit_hash`` — md5 / multiplicative
                             arithmetic that evaluates to bit-identical values
                             in Spark SQL and DuckDB SQL, used by the oracle
                             correctness gate and anywhere cross-engine
                             reproducibility matters.

Both are pure column expressions: whole-stage codegen, no Python boundary.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multiplicative (Knuth) constants. The pre-mod keeps bigint*bigint products
# below 2^63 so the same SQL runs under DuckDB (which errors on overflow)
# and Spark non-ANSI (which would silently wrap).
PORTABLE_HASH_MOD = 1_000_003
_KNUTH = 2_654_435_761
_OFFSET = 961_748_927
_TWO32 = 4_294_967_296


def portable_unit_hash(col: Column, salt: int = 0) -> Column:
    """Deterministic uniform-ish value in [0,1) from a non-negative integer key.

    Identical result in Spark and DuckDB (see ``portable_unit_hash_sql``).
    Used as the oracle-checkable replacement for the reference's
    ``0.5 + murmur3/2^32`` sampling column (sampling.py:15-23).
    """
    h = ((col % PORTABLE_HASH_MOD) * F.lit(_KNUTH) + F.lit(_OFFSET + salt)) % F.lit(_TWO32)
    return (h.cast("double") / F.lit(float(_TWO32))).alias("portable_unit_hash")


def portable_int_hash(col: Column, salt: int = 0) -> Column:
    """The 32-bit integer stage of ``portable_unit_hash`` (before the
    unit-interval division) — use when an exact integer (mod-k fold
    assignment, bucketing) beats a float in [0,1)."""
    return (
        (col % PORTABLE_HASH_MOD) * F.lit(_KNUTH) + F.lit(_OFFSET + salt)
    ) % F.lit(_TWO32)


def portable_int_hash_sql(expr: str, salt: int = 0) -> str:
    """ANSI-SQL text of ``portable_int_hash`` for DuckDB oracles."""
    return f"((({expr} % {PORTABLE_HASH_MOD}) * {_KNUTH} + {_OFFSET + salt}) % {_TWO32})"


def portable_unit_hash_sql(expr: str, salt: int = 0) -> str:
    """ANSI-SQL text of ``portable_unit_hash`` for DuckDB oracles."""
    return (
        f"(CAST((({expr} % {PORTABLE_HASH_MOD}) * {_KNUTH} + {_OFFSET + salt}) "
        f"% {_TWO32} AS DOUBLE) / {_TWO32}.0)"
    )


def portable_token_hash_hex(col: Column, salt: int = 0) -> Column:
    """First 8 hex chars of md5(salt:token) — a 32-bit portable string hash.

    Kept as a hex *string*: lexicographic order on fixed-width hex equals
    numeric order, so MIN() aggregation over these implements MinHash without
    any integer conversion (DuckDB-portable verbatim).
    """
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 8)


def portable_token_hash_hex_sql(expr: str, salt: int = 0) -> str:
    return f"substring(md5('{salt}:' || {expr}), 1, 8)"


#: largest prime below 2^32 — modulus of the MinHash permutation family
MINHASH_PRIME = 4_294_967_291


def portable_token_hash_int(col: Column) -> Column:
    """32-bit non-negative integer hash of a string (md5-prefix based),
    bit-identical in DuckDB via ``portable_token_hash_int_sql``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def portable_token_hash_int_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def minhash_permutation_params(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for the affine MinHash family ``(a_i*h + b_i) mod p``.

    One md5 per token yields ``h``; the k permutations are integer
    arithmetic (codegen'd, no further hashing). a_i < 2^31 keeps a*h below
    2^63, so the same SQL is overflow-safe in DuckDB (errors on overflow)
    and exact in Spark non-ANSI (would silently wrap).
    """
    return [
        (
            ((_KNUTH * (i + 1)) % 2_147_483_647) | 1,
            (_OFFSET * (i + 1)) % MINHASH_PRIME,
        )
        for i in range(num_hashes)
    ]


def minhash_permute(h: Column, a: int, b: int) -> Column:
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_permute_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) * {a} + {b}) % {MINHASH_PRIME}"


def portable_string_unit_hash(col: Column, salt: int = 0) -> Column:
    """Deterministic value in [0,1) from a string, portable to DuckDB.

    Spark: conv(hex,16,10); DuckDB: ('0x'||hex)::BIGINT — both yield the same
    32-bit integer from the md5 prefix.
    """
    h = F.conv(portable_token_hash_hex(col, salt), 16, 10).cast("bigint")
    return h.cast("double") / F.lit(float(_TWO32))


def portable_string_unit_hash_sql(expr: str, salt: int = 0) -> str:
    return (
        f"(CAST(('0x' || {portable_token_hash_hex_sql(expr, salt)}) AS BIGINT) "
        f"/ {_TWO32}.0)"
    )


def spark_unit_hash(*cols: Column, seed: Optional[int] = None) -> Column:
    """Native fast path: Murmur3 of the key columns scaled to [0,1).

    Reference parity: sampling.py:15-23 — ``hash()`` is int32 uniform in
    [-2^31, 2^31-1]; ``0.5 + h/2^32`` maps it onto [0,1). With ``seed=None``
    the value is bit-identical to the reference's ``0.5 + hash(cols)/2^32``;
    a seed mixes one extra literal into the hash to decorrelate reruns. Not
    portable to other engines; use on production clusters where only
    Spark-internal determinism is needed.
    """
    hashed = F.hash(*cols) if seed is None else F.hash(*cols, F.lit(seed))
    return F.lit(0.5) + hashed.cast("double") / F.lit(float(_TWO32))
