"""Product quantization (PQ): sub-vector codebooks + asymmetric-distance
top-k — the memory-bound half of the FAISS-style IVF+PQ scale recipe
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public literature).

The engine already has the other pieces of the ANN tier: exact cosine
(`similarity.cosine_topk`), LSH buckets, data-adaptive IVF, int8
symmetric codes (`quantize.quantized_topk` — 4x compression, exact
int64 scoring). PQ is the aggressive end: ``n_subspaces`` codes of
``log2(k)`` bits each (64-dim float32 -> 4 bytes here, 64x), with
query-time scoring a TABLE LOOKUP per subspace instead of a 64-dim
fold — the shape that keeps billion-vector search in memory.

Composition over invention: codebook training is
:func:`~.clustering.kmeans_lloyd` per subspace on SLICED vectors — the
deterministic, oracle-checkable Lloyd this repo already gates
(decimal-exact sums, rounded centroids, smallest-id init, documented
empty-cluster rule) — so the ENTIRE iterative trainer replays in
DuckDB via the shared :func:`~.clustering.kmeans_ctes` chain, and the
driver gate checks codebooks, codes, ADC tables, and the final ranking
in one hash.

Sample training (``train_fraction``): production PQ never trains on
the full corpus — FAISS trains codebooks on ~10^5-10^6 sampled vectors
and encodes everything. The subset is the deterministic portable hash
(`functions/hashing.py`), so the oracle replays the sample too. The
full corpus is touched by exactly ONE scan at encode/search time.

Scale shape: training cost is bounded by the sample (iters scans of a
``dim/n_subspaces``-wide slice per subspace); search is map-only —
codes + ADC lookups fused into the scan, TakeOrderedAndProject for the
top-k, zero shuffle, nothing corpus-sized collected (driver holds
``n_subspaces x k x sub_dim`` centroid floats).

Reference parity: criteo/ml-hadoop-experiment has no ANN surface
(SURVEY.md §2) — north-star extension for embedding pipelines.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_unit_hash, portable_unit_hash_sql
from ..functions import fastexpr as FX
from .clustering import _SUM_DECIMAL, kmeans_ctes


def _check_geometry(dim: int, n_subspaces: int) -> int:
    if n_subspaces < 1 or dim % n_subspaces != 0:
        raise ValueError(
            f"dim={dim} must split evenly into n_subspaces={n_subspaces}"
        )
    return dim // n_subspaces


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_subspaces: int = 4,
    codebook_k: int = 16,
    iters: int = 2,
    train_fraction: float = 1.0,
    seed: int = 0,
    round_digits: int = 6,
) -> List[List[List[float]]]:
    """``n_subspaces`` codebooks (each ``codebook_k x dim/n_subspaces``
    rounded-double centroids) via deterministic Lloyd per sub-slice,
    trained on the portable-hash sample when ``train_fraction < 1``.

    All subspaces train FUSED: one init collect (the ``codebook_k``
    smallest-id vectors seed every subspace — slicing does not change
    ids) and ONE aggregation job per iteration, with the per-subspace
    assignment + slice exploded to ``(subspace, cluster)`` keys. This
    replaces ``n_subspaces`` sequential :func:`~.clustering.kmeans_lloyd`
    chains (``n_subspaces x (iters + 1)`` driver-coordinated jobs) with
    ``iters + 1`` — and is bit-identical to them, because every
    arithmetic step is unchanged: same ``kmeans_assign_expr`` argmin on
    the same slices, per-dimension ``decimal(27,10)`` sums (exact, so
    the grouping route cannot change them), the same single double
    division + rounding, and the same empty-cluster keep-previous rule
    per (subspace, cluster). The fused==sequential equivalence is
    pytest-pinned (tests/test_pq.py) and the DuckDB oracle remains the
    per-subspace :func:`~.clustering.kmeans_ctes` chains."""
    sub_dim = _check_geometry(dim, n_subspaces)
    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(f"train_fraction must be in (0, 1], got {train_fraction}")
    if codebook_k < 1 or iters < 0:
        raise ValueError(
            f"need k >= 1 and iters >= 0, got k={codebook_k} iters={iters}"
        )
    base = df
    if train_fraction < 1.0:
        base = df.where(
            portable_unit_hash(F.col(id_col), salt=seed)
            < F.lit(train_fraction)
        )
    init_rows = (
        base.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(codebook_k)
        .collect()
    )
    if len(init_rows) < codebook_k:
        raise ValueError(
            f"k={codebook_k} but only {len(init_rows)} rows"
        )
    codebooks = [
        [
            [float(x) for x in r[1][s * sub_dim : (s + 1) * sub_dim]]
            for r in init_rows
        ]
        for s in range(n_subspaces)
    ]
    # fastexpr (round-13): the whole explode(array(struct...)) tree and
    # the per-dim decimal sums parse as single SQL strings — the Column
    # API paid ~2 s of py4j round trips per Lloyd iteration here
    # (OPTIMIZATION_r13.md receipts); expressions are bit-identical
    sums = [
        F.expr(f"sum(CAST(`v`[{i}] AS {_SUM_DECIMAL}))").alias(f"__s{i}")
        for i in range(sub_dim)
    ]
    means = [
        F.expr(
            f"round(CAST(`__s{i}` AS DOUBLE) / `n`, {round_digits})"
        ).alias(f"__m{i}")
        for i in range(sub_dim)
    ]
    vec_sql = FX.sql_of(F.col(vec_col))
    for _ in range(iters):
        structs = ", ".join(
            "named_struct('s', {s}, 'c', {c}, 'v', {v})".format(
                s=s,
                c=FX.argmin_frag(
                    FX.slice_frag(vec_sql, s * sub_dim + 1, sub_dim),
                    codebooks[s],
                ),
                v=FX.slice_frag(vec_sql, s * sub_dim + 1, sub_dim),
            )
            for s in range(n_subspaces)
        )
        agg = (
            base.select(F.expr(f"explode(array({structs}))").alias("e"))
            .select("e.s", "e.c", "e.v")
            .groupBy("s", "c")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .select("s", "c", *means)
        )
        got = {
            (r[0], r[1]): [r[i + 2] for i in range(sub_dim)]
            for r in agg.collect()
        }
        # empty (subspace, cluster) cells keep their previous centroid
        codebooks = [
            [
                got.get((s, j), codebooks[s][j])
                for j in range(codebook_k)
            ]
            for s in range(n_subspaces)
        ]
    return codebooks


def pq_code_expr(
    vec_col: Column, codebooks: Sequence[Sequence[Sequence[float]]]
) -> Column:
    """``array<int>`` PQ code of a vector under literal ``codebooks``
    (argmin per sub-slice, ties to the smallest centroid index — the
    ``kmeans_assign_expr`` contract). Pure codegen, map-only."""
    n_subspaces = len(codebooks)
    sub_dim = len(codebooks[0][0])
    vec_sql = FX.sql_of(vec_col)
    return F.expr(
        "array("
        + ", ".join(
            FX.argmin_frag(
                FX.slice_frag(vec_sql, s * sub_dim + 1, sub_dim), codebooks[s]
            )
            for s in range(n_subspaces)
        )
        + ")"
    )


def _adc_table(
    query: Sequence[float],
    codebook: Sequence[Sequence[float]],
    offset: int,
) -> List[float]:
    """Squared distance of the query's sub-slice to each centroid,
    via the SAME left-to-right double fold as
    ``similarity.squared_distance_expr`` / ``clustering._sqdist_sql``
    — Python doubles are IEEE, so the literal table equals what either
    engine computes from identical inputs."""
    out = []
    for cent in codebook:
        acc = 0.0
        for j, c in enumerate(cent):
            dlt = float(query[offset + j]) - float(c)
            acc = acc + dlt * dlt
        out.append(acc)
    return out


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    query_id: int,
    k: int = 10,
    n_subspaces: int = 4,
    codebook_k: int = 16,
    iters: int = 2,
    train_fraction: float = 1.0,
    seed: int = 0,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` approximate neighbors of ``query_id`` by PQ
    asymmetric distance: ``(id, score)``, score = sum over subspaces of
    dist(query sub-slice, centroid of the point's code), ascending,
    ties to the smaller id; the query row itself excluded. One
    map-only scan scores the corpus — the per-point work is
    ``n_subspaces`` argmins + ``n_subspaces`` table lookups, and at
    serving time the codes would be precomputed once
    (:func:`pq_code_expr`) making it lookups only."""
    sub_dim = _check_geometry(dim, n_subspaces)
    codebooks = pq_train(
        df, id_col, vec_col, dim, n_subspaces, codebook_k, iters,
        train_fraction, seed, round_digits,
    )
    qrow = (
        df.where(F.col(id_col) == query_id).select(F.col(vec_col)).collect()
    )
    if len(qrow) != 1:
        raise ValueError(f"query_id {query_id}: expected 1 row, got {len(qrow)}")
    query = [float(x) for x in qrow[0][0]]
    if len(query) != dim:
        raise ValueError(f"query vector has {len(query)} dims, expected {dim}")
    # one SQL parse; "t0 + t1 + ..." is left-associated, the same IEEE
    # addition order as the replaced per-term accumulation loop
    vec_sql = FX.sql_of(F.col(vec_col))
    terms = []
    for s in range(n_subspaces):
        adc = _adc_table(query, codebooks[s], s * sub_dim)
        code = FX.argmin_frag(
            FX.slice_frag(vec_sql, s * sub_dim + 1, sub_dim), codebooks[s]
        )
        terms.append(f"element_at({FX.double_array(adc)}, {code} + 1)")
    score = F.expr(" + ".join(terms))
    return (
        df.where(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("id"),
            F.round(score, round_digits).alias("score"),
        )
        .orderBy(F.col("score").asc(), F.col("id").asc())
        .limit(k)
    )


def pq_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    query_id: int,
    k: int = 10,
    n_subspaces: int = 4,
    codebook_k: int = 16,
    iters: int = 2,
    train_fraction: float = 1.0,
    seed: int = 0,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`pq_topk`: per-subspace
    :func:`~.clustering.kmeans_ctes` chains (same init, folds,
    decimal sums, rounding, empty-cluster rule) over the same
    portable-hash training sample, then assignment + ADC + the same
    (score, id) total order."""
    sub_dim = _check_geometry(dim, n_subspaces)
    from .clustering import _sqdist_sql

    ctes = [f"pts AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table})"]
    if train_fraction < 1.0:
        u = portable_unit_hash_sql("id", salt=seed)
        ctes.append(
            f"train AS (SELECT id, v FROM pts WHERE {u} <"
            f" CAST({train_fraction!r} AS DOUBLE))"
        )
        train_base = "train"
    else:
        train_base = "pts"
    finals = []
    for s in range(n_subspaces):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        ctes.append(
            f"s{s}pts AS (SELECT id, v[{lo}:{hi}] AS v FROM pts)"
        )
        ctes.append(
            f"s{s}train AS (SELECT id, v[{lo}:{hi}] AS v FROM {train_base})"
        )
        chain, final = kmeans_ctes(
            f"s{s}pts", sub_dim, codebook_k, iters, round_digits,
            prefix=f"s{s}", train_cte=f"s{s}train",
        )
        ctes.extend(chain)
        finals.append(final)
        sq = _sqdist_sql("q.v", "c.v", sub_dim)
        ctes.append(
            f"q{s} AS (SELECT v[{lo}:{hi}] AS v FROM pts"
            f" WHERE id = {query_id})"
        )
        ctes.append(
            f"adc{s} AS (SELECT c.c, {sq} AS d FROM {final} c, q{s} q)"
        )
        esq = _sqdist_sql("e.v", "c.v", sub_dim)
        ctes.append(
            f"code{s} AS (SELECT id, c FROM ("
            f"SELECT e.id, c.c, row_number() OVER ("
            f"PARTITION BY e.id ORDER BY {esq} ASC, c.c ASC) AS rn "
            f"FROM s{s}pts e, {final} c) WHERE rn = 1)"
        )
    joins = "".join(
        f" JOIN code{s} ON code{s}.id = code0.id"
        f" JOIN adc{s} ON adc{s}.c = code{s}.c"
        for s in range(1, n_subspaces)
    )
    score = " + ".join(f"adc{s}.d" for s in range(n_subspaces))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT code0.id AS id, round({score}, {round_digits}) AS score
FROM code0 JOIN adc0 ON adc0.c = code0.c{joins}
WHERE code0.id <> {query_id}
ORDER BY score ASC, id ASC
LIMIT {k}
"""
    )
