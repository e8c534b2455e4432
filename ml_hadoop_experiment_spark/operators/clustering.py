"""Deterministic, oracle-checkable Lloyd k-means over embedding columns.

The data-adaptive IVF path (``operators/similarity.ivf_index``) trains
MLlib KMeans — the right production tool, but its k-means|| init and
float reduction order make it impossible to verify bit-for-bit against
an independent engine. This module is the complement: a Lloyd iteration
whose EVERY arithmetic step is pinned to a cross-engine-reproducible
form, so the full iterative algorithm — init, assignment, centroid
update, repeat — hash-matches a DuckDB twin (``kmeans_lloyd_sql``).
That turns "iterative algorithm on Spark" from a weakly-checked claim
(rows-only) into an oracle-gated one.

Determinism contract (each piece is individually proven elsewhere in
the engine and reused here):

- **init**: the ``k`` vectors with the smallest ids (a total order —
  no RNG, no data-order dependence);
- **assignment**: argmin over per-centroid squared L2 distances
  computed as a left-to-right double fold
  (``operators/similarity.squared_distance_expr`` — the fold order the
  IVF oracle already matches), ties broken by centroid index;
- **update**: per-dimension sums through ``decimal(27,10)`` so the sum
  is addition-order independent (exact — the
  ``operators/similarity.embedding_centroids`` pattern), then ONE
  double division and a ``round(·, round_digits)`` quantization. The
  quantization is what makes the ITERATION reproducible: both engines
  feed the identical rounded centroid into the next assignment, so
  divergence cannot compound;
- **empty clusters** keep their previous centroid (stated, not
  incidental).

Scale shape (the reason Lloyd fits Spark well): per iteration, ONE
scan of the data with the assignment embedded as a codegen expression
(zero shuffle — centroids ride along as literals), partial-aggregated
per-dim sums whose exchange carries at most ``k x dim`` decimals per
input partition, and a driver collect of exactly ``k`` rows. Nothing
data-sized ever moves; 100 TB of vectors cost ``iters`` scans. The
driver loop is coordination, not computation — the same division of
labor MLlib's own Lloyd uses.

Reference parity: the reference engine (criteo/ml-hadoop-experiment)
has no clustering surface; this is an extension operator for the
training-data-pipeline tier (corpus bucketing, diversity sampling,
IVF list construction with an auditable trainer).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import fastexpr as FX

#: decimal type for order-independent per-dim sums (see
#: operators/similarity.embedding_centroids — same contract: exact on
#: float32 inputs up to ~1e16 rows per group).
_SUM_DECIMAL = "decimal(27,10)"


def kmeans_assign_expr(
    vec_col: "Column | str", centroids: Sequence[Sequence[float]]
) -> Column:
    """Cluster index of ``vec_col`` under literal ``centroids``: argmin
    of the squared-distance fold, ties to the smallest index. Pure
    codegen (array_min over (distance, index) structs) — map-only.

    Built as ONE SQL parse (functions/fastexpr, round-13 optimization):
    the k x dim literal matrix through the Column API cost ~0.6 s of
    py4j round trips PER PLAN BUILD at k=8, dim=16 — pure driver dead
    time re-paid every Lloyd iteration. Bit-identical expression
    (tests/test_fastexpr.py pins old-vs-new equality)."""
    return F.expr(FX.argmin_frag(FX.sql_of(vec_col), centroids))


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    iters: int,
    round_digits: int = 6,
) -> Tuple[DataFrame, List[List[float]]]:
    """Deterministic Lloyd k-means: returns ``(assignments, centroids)``
    where assignments is an ``(id, cluster)`` frame under the FINAL
    centroids and centroids is the ``k x dim`` list after ``iters``
    update steps.

    ``df`` rows must have non-null ``vec_col`` arrays of exactly
    ``dim`` elements and unique ``id_col`` values (the init takes the
    ``k`` smallest). The frame is scanned ``iters + 2`` times (init
    limit, one per iteration, final assignment) — persist upstream if
    it is not a cheap scan.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    init_rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} rows")
    centroids = [[float(x) for x in r[1]] for r in init_rows]

    # one F.expr parse per column instead of 4-5 py4j calls each (the
    # fastexpr rationale; `v`[i] is 0-based GetArrayItem on both forms)
    sums = [
        F.expr(
            f"sum(CAST(`{vec_col}`[{i}] AS {_SUM_DECIMAL}))"
        ).alias(f"__s{i}")
        for i in range(dim)
    ]
    means = [
        F.expr(
            f"round(CAST(`__s{i}` AS DOUBLE) / `n`, {round_digits})"
        ).alias(f"__m{i}")
        for i in range(dim)
    ]
    for _ in range(iters):
        agg = (
            df.withColumn("__c", kmeans_assign_expr(F.col(vec_col), centroids))
            .groupBy("__c")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .select("__c", *means)
        )
        got = {r[0]: [r[i + 1] for i in range(dim)] for r in agg.collect()}
        # empty clusters keep their previous centroid
        centroids = [got.get(j, centroids[j]) for j in range(k)]

    assigned = df.select(
        F.col(id_col).alias("id"),
        kmeans_assign_expr(F.col(vec_col), centroids).alias("cluster"),
    )
    return assigned, centroids


def _sqdist_sql(vec_expr: str, cent_expr: str, dim: int) -> str:
    """DuckDB squared-distance with the SAME left-to-right double fold
    as ``squared_distance_expr`` (list_reduce over a 0.0-prepended
    term list — the ``ivf_fixed_sql`` form)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> (CAST({vec_expr}[i] AS DOUBLE) - {cent_expr}[i]) * "
        f"(CAST({vec_expr}[i] AS DOUBLE) - {cent_expr}[i]))), "
        f"(acc, x) -> acc + x)"
    )


def kmeans_ctes(
    pts_cte: str,
    dim: int,
    k: int,
    iters: int,
    round_digits: int = 6,
    prefix: str = "",
    train_cte: str | None = None,
) -> Tuple[List[str], str]:
    """The unrolled Lloyd CTE chain over an existing ``(id, v)`` CTE
    named ``pts_cte``: returns ``(cte_list, final_centroid_cte)``. CTE
    names are ``{prefix}c0 / a1 / m1 / c1 / ...`` so several chains
    (e.g. one per PQ subspace) can coexist in one statement.
    ``train_cte`` (default ``pts_cte``) is the frame the init and the
    centroid updates read — the sample-training posture: train on a
    subset, the final centroids still quantize everything."""
    train = train_cte or pts_cte
    mean_elems = ", ".join(
        f"round(CAST(sum(CAST(e.v[{i + 1}] AS DECIMAL(27,10))) AS DOUBLE)"
        f" / count(*), {round_digits})"
        for i in range(dim)
    )
    ctes = [
        (
            f"{prefix}c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS c, "
            "list_transform(v, x -> CAST(x AS DOUBLE)) AS v "
            f"FROM (SELECT id, v FROM {train} ORDER BY id LIMIT {k}))"
        ),
    ]
    prev = f"{prefix}c0"
    for it in range(1, iters + 1):
        sq = _sqdist_sql("e.v", "c.v", dim)
        ctes.append(
            f"{prefix}a{it} AS (SELECT id, c FROM ("
            f"SELECT e.id, c.c, row_number() OVER ("
            f"PARTITION BY e.id ORDER BY {sq} ASC, c.c ASC) AS rn "
            f"FROM {train} e, {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            f"{prefix}m{it} AS (SELECT a.c, [{mean_elems}] AS v "
            f"FROM {prefix}a{it} a JOIN {train} e ON e.id = a.id GROUP BY a.c)"
        )
        ctes.append(
            f"{prefix}c{it} AS (SELECT p.c, COALESCE(m.v, p.v) AS v "
            f"FROM {prev} p LEFT JOIN {prefix}m{it} m ON m.c = p.c)"
        )
        prev = f"{prefix}c{it}"
    return ctes, prev


def kmeans_lloyd_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    iters: int,
    round_digits: int = 6,
    out_id: str = "id",
) -> str:
    """DuckDB twin of :func:`kmeans_lloyd` returning ``(id, cluster)``:
    unrolled CTE chain — init from the ``k`` smallest ids, then per
    iteration an assignment CTE (same fold order, same (distance,
    index) tie-break) and a centroid CTE (same decimal(27,10) sums,
    same single division, same rounding), empty clusters coalescing to
    the previous centroid list. The chain itself is
    :func:`kmeans_ctes` (shared with the PQ oracle)."""
    chain, prev = kmeans_ctes("pts", dim, k, iters, round_digits)
    ctes = [
        f"pts AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table})"
    ] + chain
    final_sq = _sqdist_sql("e.v", "c.v", dim)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id AS {out_id}, c AS cluster FROM (
  SELECT e.id, c.c, row_number() OVER (
    PARTITION BY e.id ORDER BY {final_sq} ASC, c.c ASC) AS rn
  FROM pts e, {prev} c
) WHERE rn = 1
"""
    )


__all__ = [
    "kmeans_assign_expr",
    "kmeans_ctes",
    "kmeans_lloyd",
    "kmeans_lloyd_sql",
]
