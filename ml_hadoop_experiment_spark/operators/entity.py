"""Entity resolution: blocked fuzzy matching by edit distance.

Extension beyond the reference (it has no string-similarity ops): the
record-linkage primitive for catalog/master-data dedup — "which records
are probably the same thing spelled slightly differently".

Design for 100 TB:
- NEVER all-pairs: candidates come from an equi-join on caller-chosen
  blocking keys (brand, zip, phonetic code, sorted-neighborhood window),
  so the shuffle is a plain hash join on the block key and the quadratic
  cost is confined to within-block candidate sets. Pick blocks so the
  largest block's candidate count is bounded — same posture as the LSH
  bucket cap in ``operators/dedup.py``.
- the cheap length prefilter (edit distance >= length difference) runs
  BEFORE the levenshtein evaluation, discarding most candidates with a
  codegen-folded comparison; levenshtein itself is a JVM built-in
  (no Python crossing anywhere).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: List[str],
    max_distance: int = 2,
) -> DataFrame:
    """Pairs of records in the same block whose ``text_col`` values are
    within ``max_distance`` Levenshtein edits.

    Output: ``id_a, id_b, distance`` with ``id_a < id_b`` (each pair
    once). Recall contract: a pair is found iff it shares a block — the
    blocking keys define the candidate universe, exactly like LSH bands
    for MinHash. Completeness within a block is exact.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if not block_cols:
        raise ValueError("block_cols is required: all-pairs matching cannot scale")
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"), *block_cols
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"), *block_cols
    )
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        # a length gap beyond max_distance cannot be closed by that many
        # edits — codegen-cheap prefilter before the DP-cost levenshtein
        .where(
            F.abs(F.length("__ta") - F.length("__tb")) <= F.lit(int(max_distance))
        )
        .withColumn("distance", F.levenshtein("__ta", "__tb"))
        .where(F.col("distance") <= F.lit(int(max_distance)))
        .select("id_a", "id_b", "distance")
    )


def blocked_fuzzy_pairs_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    block_exprs: List[str],
    max_distance: int = 2,
) -> str:
    """DuckDB twin of ``blocked_fuzzy_pairs``."""
    on = " AND ".join(f"a.{e} = b.{e}" for e in block_exprs)
    d = int(max_distance)
    return f"""
SELECT a.{id_expr} AS id_a, b.{id_expr} AS id_b,
       CAST(levenshtein(a.{text_expr}, b.{text_expr}) AS BIGINT) AS distance
FROM {relation} a JOIN {relation} b
  ON {on} AND a.{id_expr} < b.{id_expr}
WHERE abs(length(a.{text_expr}) - length(b.{text_expr})) <= {d}
  AND levenshtein(a.{text_expr}, b.{text_expr}) <= {d}
"""
