"""Skew mitigation: salted joins for hot keys.

Extension beyond the reference (BASELINE.json north-star). A sort-merge
join shuffles both sides by the join key, so one hot key (a "null-like"
default id, a dominant category, a celebrity user) lands its ENTIRE
volume in one reducer task — the canonical long-tail straggler at 100 TB.
AQE's skew-join splitting handles many cases at runtime, but it cannot
split a skewed AGGREGATION input feeding the join and is unavailable in
stateful streaming; explicit salting is the portable fix.

``salted_join`` implements the standard technique declaratively:

* the BIG side gets a deterministic per-row salt in ``[0, salt)``
  (``xxhash64`` over its columns — any distribution works for
  correctness; a hash spreads a hot key's rows across ``salt`` reducers);
* the SMALL side is replicated once per salt value (``explode`` of a
  ``sequence`` — rows × salt, fine for dimension-sized tables);
* the join key becomes ``(keys..., salt)``, so each hot-key reducer
  handles ~1/salt of the hot key's rows.

Results are IDENTICAL to the unsalted join for inner and left joins
(each big row meets exactly one replica of each matching small row) —
the ``salted_join`` declared query pins that equivalence against a plain
DuckDB join. Not valid for right/full joins: the replicated small side
would multiply unmatched small rows.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: List[str],
    how: str = "inner",
    salt: int = 16,
    salt_expr: Optional[Column] = None,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the big side salted across
    ``salt`` sub-keys — same rows out as the plain join, no single-task
    hot key. ``salt_expr`` overrides the per-row salt (any int expression;
    default ``pmod(xxhash64(*big.columns), salt)``, deterministic).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: replicating "
            "the small side would multiply its unmatched rows in right/full"
        )
    if salt < 2:
        raise ValueError(f"salt must be >= 2 to spread anything, got {salt}")
    if salt_expr is None:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt)
    salted_big = big.withColumn("__salt", salt_expr.cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1)))
    )
    out = salted_big.join(salted_small, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


__all__ = ["salted_join"]
