"""Embedding similarity search over ``array<float>`` columns.

Extensions beyond the reference (BASELINE.json north-star):

- brute-force cosine top-k — the exactness baseline. The dot product is a
  codegen'd fold (functions/vectors.py); ranking uses orderBy+limit which
  Spark executes as TakeOrderedAndProject (per-partition heaps + driver
  merge of k rows — no global sort shuffle).
- random-hyperplane LSH bucketing — the scale path: b sign bits place each
  vector in one of 2^b buckets; near-dup search self-joins within buckets
  only. Hyperplane coefficients derive from the portable hash so bucketing
  is deterministic and oracle-checkable.
- cosine near-dup pairs — LSH candidates verified by exact cosine.

At 100 TB the brute-force scan stays fully parallel (score is map-side;
top-k needs no shuffle); the LSH join shuffles once on (bucket).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.functions import fastexpr as FX
from ml_hadoop_experiment_spark.functions.vectors import cosine_similarity_expr

_KNUTH = 2_654_435_761
_MOD = 1_000_003
_TWO32 = 4_294_967_296


def _plane_coeff(plane: int, dim: int) -> float:
    """Deterministic pseudo-random coefficient in [-0.5, 0.5) for
    (plane, dim), identical in the SQL twin."""
    h = (((plane * 8191 + dim) % _MOD) * _KNUTH + 961_748_927) % _TWO32
    return h / _TWO32 - 0.5


def plane_vectors(num_planes: int, dim: int) -> List[List[float]]:
    return [[_plane_coeff(p, d) for d in range(dim)] for p in range(num_planes)]


def _dot_with_literal(vec: Column, coeffs: Sequence[float]) -> Column:
    """Fold-based dot product with a literal plane; left-to-right double
    accumulation (same order the DuckDB twin folds in)."""
    return F.expr(
        f"aggregate(zip_with({FX.sql_of(vec)}, {FX.double_array(coeffs)}, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
    )


def lsh_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Bucket id in [0, 2^num_planes): bit p = sign of <vec, plane_p>."""
    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        bit = _dot_with_literal(vec, plane_vectors(p + 1, dim)[p]) > 0
        bucket = bucket + F.when(bit, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0))
    return bucket


def lsh_bucket_sql(vec_expr: str, num_planes: int, dim: int) -> str:
    """DuckDB twin of ``lsh_bucket``: same planes, same fold order."""
    terms = []
    for p in range(num_planes):
        coeffs = plane_vectors(p + 1, dim)[p]
        plane = "[" + ", ".join(repr(c) for c in coeffs) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {dim} + 1), "
            f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({plane})[i])), "
            f"(acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Output (id, score) with score rounded to 6 decimals; ordering ties break
    on id so results are total-ordered and reproducible.
    """
    # one SQL parse for the literal query + cosine fold (fastexpr):
    # bit-identical to the replaced cosine_similarity_expr tree
    score = F.round(
        F.expr(FX.cosine_frag(f"`{vec_col}`", FX.double_array(query_vec))), 6
    )
    return (
        df.select(F.col(id_col).alias("id"), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k per query VECTOR SET — the batched serving shape.

    The query frame broadcasts (a query batch is small by construction);
    every (corpus row, query) pair scores map-side with zero shuffle on
    the corpus, then one window per query id keeps k. Output
    (qid, id, score, rk); ties break on id. At 100 TB the corpus-side scan
    dominates and is embarrassingly parallel — cost is corpus × |queries|
    dot products with no corpus movement, vs |queries| separate jobs for
    the single-query operator.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("__qv")
    )
    pairs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__cv")
    ).crossJoin(F.broadcast(q))
    score = F.round(cosine_similarity_expr(F.col("__cv"), F.col("__qv")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        pairs.select("qid", "id", score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def lsh_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket) assignment — the IVF-style partitioning for ANN search."""
    return df.select(
        F.col(id_col).alias("id"),
        lsh_bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.9,
    block_rows: int = 4096,
) -> DataFrame:
    """Embedding near-dups: bucket on LSH sign bits, verify exact cosine.

    The bucket key is a Spark column expression (identical to the DuckDB
    twin); the O(n_bucket^2) verification runs as numpy matmul inside
    ``applyInPandas`` per bucket — BLAS throughput instead of per-pair
    interpreted array folds, which is what survives a 100 TB corpus. One
    shuffle on bucket; the all-pairs blowup is confined to buckets
    (expected n/2^b vectors each); ``block_rows`` caps the score-matrix
    slab at block_rows x n_bucket so worker memory stays bounded even for
    skewed buckets. Output (id_a, id_b, score >= threshold).
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, score double"

    with_bucket = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )

    def _score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        if n < 2:
            return empty
        order = pdf["id"].to_numpy().argsort(kind="stable")
        ids = pdf["id"].to_numpy()[order]
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])[order]
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = np.nan  # zero vectors never match (NULL in SQL)
        mat /= norms[:, None]
        parts = []
        for lo in range(0, n - 1, block_rows):
            hi = min(lo + block_rows, n)
            scores = np.round(mat[lo:hi] @ mat.T, 6)
            rows, cols = np.nonzero(scores >= threshold)
            keep = cols > rows + lo  # id_a < id_b (ids sorted ascending)
            if keep.any():
                parts.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[rows[keep] + lo],
                            "id_b": ids[cols[keep]],
                            "score": scores[rows[keep], cols[keep]],
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True) if parts else empty

    return with_bucket.groupBy("bucket").applyInPandas(_score_bucket, out_schema)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the data-adaptive scale path.
# --------------------------------------------------------------------------


def ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[DataFrame, List[List[float]]]:
    """KMeans inverted-file index: (assigned lists, centroid vectors).

    Data-adaptive complement to the random-hyperplane LSH path: centroids
    follow the embedding distribution, so list sizes stay balanced where
    hyperplane buckets skew. Training runs MLlib KMeans (driver coordinates
    Lloyd iterations; assignment and sufficient statistics are computed on
    executors — nothing but k centroids ever sits on the driver). The
    returned ``assigned`` frame (id, vec, list_id) is the index; persist or
    write it partitioned by ``list_id`` so probes prune at the source.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=num_centroids, seed=seed, maxIter=max_iter).fit(feats)
    assigned = model.transform(feats).select(
        "id", "vec", F.col("prediction").alias("list_id")
    )
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centers


def squared_distance_expr(vec: Column, coeffs: Sequence[float]) -> Column:
    """Squared L2 distance to a literal centroid; left-to-right double fold
    (same order as the DuckDB twin in ``ivf_fixed_sql``). One SQL parse
    (functions/fastexpr) — bit-identical to the Column-API form it
    replaced (tests/test_fastexpr.py)."""
    return F.expr(FX.sqdist_frag(FX.sql_of(vec), coeffs))


def ivf_assign_fixed(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF list assignment against FROZEN centroid literals: argmin over
    the per-centroid squared distances, ties broken by centroid index.

    Pure codegen expression (array_min over (distance, index) structs) —
    map-only, zero shuffle, and identical semantics to the SQL twin's
    cross-join + row_number formulation. At 100 TB the assignment runs
    embedded in the scan; write the result partitioned by ``list_id`` so
    probes prune at the source.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.expr(FX.argmin_frag(f"`{vec_col}`", centroids)).alias("list_id"),
    )


def ivf_probes_fixed(
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    nprobe: int,
) -> List[int]:
    """The ``nprobe`` centroid indices nearest the query — driver math over
    k vectors, but with the SAME left-to-right double fold as the SQL twin
    so probe selection is bit-identical to the oracle."""
    dists = []
    for i, cent in enumerate(centroids):
        acc = 0.0
        for x, c in zip(query_vec, cent):
            acc = acc + (float(x) - float(c)) * (float(x) - float(c))
        dists.append((acc, i))
    dists.sort()
    return [i for _, i in dists[:nprobe]]


def ivf_topk_fixed(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Frozen-centroid IVF top-k: assign lists by expression argmin, probe
    the ``nprobe`` nearest lists, exact cosine within them. Fully
    oracle-checkable (``ivf_fixed_sql`` is the DuckDB twin); the adaptive
    KMeans path (``ivf_index``/``ivf_topk``) is its production complement."""
    probes = ivf_probes_fixed(centroids, query_vec, nprobe)
    assigned = ivf_assign_fixed(df, centroids, id_col=id_col, vec_col=vec_col)
    score = F.round(
        F.expr(FX.cosine_frag("`vec`", FX.double_array(query_vec))), 6
    )
    return (
        assigned.where(F.col("list_id").isin(probes))
        .select("id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_fixed_sql(
    table: str,
    id_col: str,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    dim: int,
    query_id: int,
    k: int,
    nprobe: int,
) -> str:
    """DuckDB twin of ``ivf_topk_fixed``: same centroid literals, same fold
    order, same (distance, index) tie-breaking, same cosine rounding."""
    values = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(x)) for x in cent))
        for i, cent in enumerate(centroids)
    )

    def sqdist(vec_expr: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {dim} + 1), "
            f"i -> (CAST({vec_expr}[i] AS DOUBLE) - v[i]) * "
            f"(CAST({vec_expr}[i] AS DOUBLE) - v[i]))), "
            f"(acc, x) -> acc + x)"
        )

    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> CAST(p.vec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )
    norm_p = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> CAST(p.vec[i] AS DOUBLE) * CAST(p.vec[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x))"
    )
    norm_q = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x))"
    )

    return f"""
WITH cent AS (
  SELECT * FROM (VALUES
    {values}
  ) AS t(c, v)
),
qv AS (
  SELECT {vec_col} AS qvec FROM {table} WHERE {id_col} = {query_id}
),
probes AS (
  SELECT c FROM cent, qv q
  ORDER BY {sqdist('q.qvec')} ASC, c ASC
  LIMIT {nprobe}
),
assigned AS (
  SELECT e.{id_col} AS id, e.{vec_col} AS vec, cent.c,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY {sqdist('e.' + vec_col)} ASC, cent.c ASC
         ) AS rn
  FROM {table} e, cent
)
SELECT p.id AS {id_col}, round({dot} / ({norm_p} * {norm_q}), 6) AS score
FROM assigned p, qv q
WHERE p.rn = 1 AND p.c IN (SELECT c FROM probes)
ORDER BY score DESC, p.id ASC
LIMIT {k}
"""


def ivf_topk(
    assigned: DataFrame,
    centers: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` centroid lists nearest to
    the query, exact cosine within them.

    Centroid ranking is trivial driver math over k vectors; the scan then
    touches only ~nprobe/num_centroids of the corpus (partition pruning
    when the index is written partitioned by list_id). Recall rises with
    ``nprobe``; ``nprobe=len(centers)`` degrades to exact brute force.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    dists = [float(np.linalg.norm(np.asarray(c, dtype=float) - q)) for c in centers]
    probes = [int(i) for i in np.argsort(dists, kind="stable")[:nprobe]]
    score = F.round(
        F.expr(FX.cosine_frag("`vec`", FX.double_array(query_vec))), 6
    )
    return (
        assigned.where(F.col("list_id").isin(probes))
        .select("id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def embedding_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    dim: int,
    round_digits: int = 6,
) -> DataFrame:
    """Per-label centroid of a fixed-width embedding column:
    (label, n, centroid array<double>).

    The scalable plan for vector aggregation: ``dim`` independent
    per-position SUM aggregates over ``vec[i]`` — all map-side combined in
    ONE aggregation pass, no explode (a posexplode formulation shuffles
    ``rows x dim`` rows; this shuffles ``groups x dim`` partial sums).
    Per-position sums go through DECIMAL so the result is addition-order
    independent (exact), then one double division per position — making a
    float aggregation bit-reproducible across engines (the oracle gate's
    requirement) AND across Spark reruns with different partitionings.
    """
    sums = [
        F.sum(F.col(vec_col)[i].cast("decimal(27,10)")).alias(f"__s{i}")
        for i in range(dim)
    ]
    agg = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"), *sums)
    centroid = F.array(
        *[
            F.round(
                F.col(f"__s{i}").cast("double") / F.col("n"), round_digits
            )
            for i in range(dim)
        ]
    )
    return agg.select(label_col, "n", centroid.alias("centroid"))


def embedding_centroids_sql(
    table: str,
    label_expr: str,
    vec_expr: str,
    dim: int,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of ``embedding_centroids`` (1-based list indexing)."""
    elems = ", ".join(
        f"round(CAST(sum(CAST({vec_expr}[{i + 1}] AS DECIMAL(27,10))) AS DOUBLE)"
        f" / count(*), {round_digits})"
        for i in range(dim)
    )
    return (
        f"SELECT {label_expr} AS label, count(*) AS n, [{elems}] AS centroid\n"
        f"FROM {table} GROUP BY 1"
    )
