"""Entity resolution: blocked fuzzy matching by edit distance.

Extension beyond the reference (it has no string-similarity ops): the
record-linkage primitive for catalog/master-data dedup — "which records
are probably the same thing spelled slightly differently".

Design for 100 TB:
- NEVER all-pairs: candidates come from an equi-join on caller-chosen
  blocking keys (brand, zip, phonetic code, sorted-neighborhood window),
  so the quadratic cost is confined to within-block candidate sets.
- VERIFY ONCE PER DISTINCT VALUE PAIR: real catalogs repeat values
  heavily (k records per spelling), and a naive self-join pays the
  Levenshtein DP k² times per value pair. Here the join and the distance
  run on the block's DISTINCT values only, and record-id pairs are
  re-expanded afterward by two equi-joins against the (tiny, filtered)
  matched-value-pair table — the same payloads-never-shuffle posture as
  ``operators/dedup.py``. With duplication factor k this cuts verify
  cost k²×; with all-unique values it costs the same as the naive plan.
- the cheap length prefilter (edit distance >= length difference) runs
  BEFORE the Levenshtein evaluation; the distance itself is a JVM
  built-in (no Python crossing anywhere).
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

    vals = df.select(*block_cols, F.col(text_col).alias("__v")).distinct()
    va = vals.select(*block_cols, F.col("__v").alias("__va"))
    vb = vals.select(*block_cols, F.col("__v").alias("__vb"))
    # unordered distinct-value pairs (va <= vb covers the equal-spelling
    # case, whose id pairs still need expanding)
    vpairs = (
        va.join(vb, block_cols)
        .where(F.col("__va") <= F.col("__vb"))
        .where(
            F.abs(F.length("__va") - F.length("__vb"))
            <= F.lit(int(max_distance))
        )
        .withColumn("distance", F.levenshtein("__va", "__vb"))
        .where(F.col("distance") <= F.lit(int(max_distance)))
    )

    a = df.select(
        *block_cols, F.col(id_col).alias("__ia"), F.col(text_col).alias("__va")
    )
    b = df.select(
        *block_cols, F.col(id_col).alias("__ib"), F.col(text_col).alias("__vb")
    )
    # each unordered id pair surfaces exactly once, with no output-sized
    # distinct: a cross-spelling pair exists in one unordered value pair
    # only (every id has one spelling), and the equal-spelling expansion
    # (which would mirror every pair) keeps only its __ia < __ib half
    return (
        vpairs.join(a, [*block_cols, "__va"])
        .join(b, [*block_cols, "__vb"])
        .where(
            (F.col("__va") < F.col("__vb")) | (F.col("__ia") < F.col("__ib"))
        )
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "distance",
        )
    )


def blocked_fuzzy_pairs_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    block_exprs: List[str],
    max_distance: int = 2,
) -> str:
    """DuckDB twin of ``blocked_fuzzy_pairs`` — deliberately the NAIVE
    within-block self-join: the two-level distinct-value plan must return
    exactly what the direct definition returns, so the oracle states the
    definition and the parity gate proves the optimization lossless."""
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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_cols: List[str],
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs: records within ``window``
    positions of each other in the total order of ``sort_cols`` — the
    classic blocking alternative when no natural block key exists
    (similar spellings sort near each other).

    The rank comes from the TWO-PHASE distributed prefix sum
    (``plans/prefix.py``), not a single-partition ``row_number`` window,
    so the sort scales; neighborhoods become an equi-join on
    ``rank div window`` with the right side probing its own and its
    preceding block (every pair at distance <= window spans at most two
    adjacent blocks), then an exact rank-distance filter. Candidates per
    record are <= 2*window regardless of data size — linear output, no
    quadratic block risk.

    Output: ``id_a, id_b, rank_a, rank_b`` with ``rank_a < rank_b``
    (each unordered pair once; pair it with a verifier such as
    ``F.levenshtein`` downstream). ``id_col`` is appended to the sort as
    the total-order tiebreak.
    """
    from ml_hadoop_experiment_spark.plans.prefix import with_global_rank

    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    ranked = with_global_rank(
        df.select(id_col, *sort_cols), [*sort_cols, id_col], out_col="__r"
    ).select(id_col, "__r")
    w = int(window)
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("__r").alias("rank_a"),
        (F.col("__r") - (F.col("__r") % w)).alias("__blk"),
    )
    # b probes its own block and the one before it: a pair with
    # 0 < rank_b - rank_a <= w either shares a block or spans adjacent ones
    b = ranked.select(
        F.col(id_col).alias("id_b"), F.col("__r").alias("rank_b")
    ).select(
        "id_b",
        "rank_b",
        F.explode(
            F.array(
                F.col("rank_b") - (F.col("rank_b") % w),
                F.col("rank_b") - (F.col("rank_b") % w) - w,
            )
        ).alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .where(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= w)
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
    )
