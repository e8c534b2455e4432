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


def spark_unit_hash(*cols: Column, seed: int = 42) -> Column:
    """Native fast path: Murmur3 of the key columns scaled to [0,1).

    Reference parity: sampling.py:15-23 — ``hash()`` is int32 uniform in
    [-2^31, 2^31-1]; ``0.5 + h/2^32`` maps it onto [0,1). Not portable to
    other engines; use on production clusters where only Spark-internal
    determinism is needed.
    """
    return F.lit(0.5) + F.hash(*cols, F.lit(seed)).cast("double") / F.lit(float(_TWO32))
