"""Leakage-safe train/val/test splits: assign by DUPLICATE CLUSTER.

``assign_split`` (operators/sampling.py) hashes a row-level key, which
is correct only when rows are independent. Training corpora are not:
near-duplicate documents are the textbook leakage vector — hash-split
rows and a train doc's near-identical twin lands in eval, inflating
every metric (the reason dedup-before-split is a standard step in
LLM-data pipelines, e.g. the C4/Gopher/GPT-3 dedup discussions in the
public literature). The fix is structural, not statistical: make the
SPLIT UNIT the near-dup cluster, so an entire duplicate neighborhood
lands on one side of every boundary by construction.

``leakage_safe_split`` = connected components over the caller's
near-dup pair frame (any generator: MinHash-LSH, SimHash, exact
jaccard_join — the operator is agnostic) + the portable hash split on
the CLUSTER label. ``split_leakage_audit`` is the observability half:
it counts pairs whose endpoints disagree on split — 0 for the cluster
split by construction, and a concrete leak census for any existing
row-level split you point it at.

Scale shape: the split itself adds ZERO data movement beyond
``dedup_clusters`` (one pure-expression hash over the cluster label);
the audit is two id-keyed joins of the pair frame against the split
frame. Nothing all-pairs, nothing collected.

Reference parity: criteo/ml-hadoop-experiment has no split/leakage
surface (SURVEY.md §2) — north-star extension for curation pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from .dedup import dedup_clusters
from .sampling import assign_split


def _checked_bigint(col: Column, what: str) -> Column:
    """``col`` cast to bigint, with an EXECUTION-TIME assertion that no
    non-null value was lost in the cast. Without this, a string/UUID id
    column would cast to all-NULL join keys, the audit's inner joins
    would drop every pair, and the empty result would read as "no
    leakage" — a false all-clear from a leak detector. ``assert_true``
    rides inside the key expression so column pruning cannot drop it.
    ``try_cast`` normalizes ANSI and legacy modes: under ANSI the plain
    cast would throw its own NumberFormatException mid-stage, under
    legacy it would silently NULL — this way both surface the same
    explicit audit error."""
    cast = col.try_cast("bigint")
    chk = F.assert_true(
        col.isNull() | cast.isNotNull(),
        F.lit(
            f"{what} is not castable to bigint: the leakage audit would"
            " silently join on NULL keys and report zero leaks"
        ),
    )
    # branches must DIFFER or SimplifyConditionals folds the CASE away
    # and the assertion with it; the otherwise-branch is unreachable
    # (assert_true either returns NULL or raises)
    return F.when(chk.isNull(), cast).otherwise(F.lit(None).cast("bigint"))


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    splits: "dict[str, float]",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """``(id, cluster, split)`` for every row of ``df``: cluster =
    connected component over ``pairs`` (singletons are their own
    cluster), split = deterministic portable-hash assignment of the
    CLUSTER label into ``splits`` — so two documents connected by ANY
    chain of near-dup pairs always share a split. Fractions apply to
    clusters, not rows; with duplicate-heavy corpora the row-level
    fractions drift accordingly (that drift IS the leakage being
    prevented — audit it with :func:`split_leakage_audit`)."""
    labeled = dedup_clusters(df, pairs, id_col)
    return assign_split(
        labeled, ["cluster"], splits,
        split_col=split_col, seed=seed, portable=True,
    )


def split_leakage_audit(
    split_df: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    split_col: str = "split",
) -> DataFrame:
    """One row per ordered split pair that LEAKS:
    ``(split_a, split_b, n_pairs)`` — near-dup pairs whose endpoints
    landed in different splits (split_a < split_b). Empty output means
    no near-dup crosses any boundary; for :func:`leakage_safe_split`
    that is guaranteed by construction, for a row-hash split it is the
    leak census that motivates switching. Two id-keyed joins; the
    output is bounded by |splits|^2."""
    s = split_df.select(
        _checked_bigint(F.col(id_col), f"split_df.{id_col}").alias("__id"),
        F.col(split_col).alias("__sp"),
    )
    a = s.select(F.col("__id").alias("id_a"), F.col("__sp").alias("sp_a"))
    b = s.select(F.col("__id").alias("id_b"), F.col("__sp").alias("sp_b"))
    return (
        pairs.select(
            _checked_bigint(F.col("id_a"), "pairs.id_a").alias("id_a"),
            _checked_bigint(F.col("id_b"), "pairs.id_b").alias("id_b"),
        )
        .join(a, "id_a")
        .join(b, "id_b")
        .where(F.col("sp_a") != F.col("sp_b"))
        .select(
            F.least("sp_a", "sp_b").alias("split_a"),
            F.greatest("sp_a", "sp_b").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
