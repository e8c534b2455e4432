"""Scalar (int8) embedding quantization: the memory-side of ANN at scale.

A 100 TB embedding corpus at float32 x 64 dims is 256 bytes/vector of
pure payload; per-dimension linear quantization to int8 cuts that 4x
and turns similarity scoring into INTEGER arithmetic — which is also
what makes this operator fully oracle-checkable: the quantized dot
product is exact int64 math, immune to float summation-order effects,
so the DuckDB twin matches bit-for-bit with no rounding contract at
all on the search path.

Scheme (the classic per-dim min/max affine code):

- params: per-dimension ``(min_i, max_i)`` from ONE aggregation pass
  (2 x dim scalars — driver-size, like k-means centroids);
- encode: ``q_i = round((x_i - min_i) * (255 / (max_i - min_i))) - 128``
  giving [-128, 127]; a degenerate dimension (max == min) encodes 0;
- decode: ``x̂_i = (q_i + 128) * ((max_i - min_i) / 255) + min_i``.

Cross-engine determinism: min/max are exact float comparisons; the
scale factors are single IEEE double divisions on identical inputs;
``round(·)`` to an integer is half-away-from-zero in both Spark and
DuckDB (the same parity the engine's round(·, 6) contracts rely on —
see operators/similarity.embedding_centroids). Encoding is a pure
codegen expression — map-only, embedded in the scan, zero shuffle.

Reference parity: no counterpart in criteo/ml-hadoop-experiment
(its scope ends at ML-inference glue); extension operator for the
similarity-search tier alongside operators/similarity.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import fastexpr as FX

#: quantization levels for int8 (values land in [-128, 127])
_LEVELS = 255
_ZERO_POINT = 128


def quantization_params(
    df: DataFrame, vec_col: str, dim: int
) -> List[Tuple[float, float]]:
    """Per-dimension ``(min, max)`` over ``vec_col`` — one partial-
    aggregated pass, ``2 x dim`` scalars collected (never row-sized).
    The ``2 x dim`` aggregates ship as ONE ``selectExpr`` call (r13:
    the Column-API loop cost ~4 py4j round trips per aggregate —
    ~0.5 s of driver dead time at dim=64 per call; aggregates in a
    grouping-free select ARE a global aggregation, same plan)."""
    frags = []
    for i in range(dim):
        frags.append(f"min(`{vec_col}`[{i}]) AS __mn{i}")
        frags.append(f"max(`{vec_col}`[{i}]) AS __mx{i}")
    row = df.selectExpr(*frags).collect()[0]
    return [(float(row[2 * i]), float(row[2 * i + 1])) for i in range(dim)]


def quantize_expr(
    vec_col: Column, params: Sequence[Tuple[float, float]]
) -> Column:
    """``array<int>`` int8-range code of ``vec_col`` under literal
    ``params`` — pure codegen, map-only."""
    # one SQL parse (fastexpr): per-dim fragments identical to the
    # replaced Column chain (same literal values, same cast points)
    vec_sql = FX.sql_of(vec_col)
    elems = []
    for i, (mn, mx) in enumerate(params):
        if mx == mn:
            elems.append("0")
            continue
        scaled = (
            f"(CAST({vec_sql}[{i}] AS DOUBLE) - {FX.dlit(mn)}) * "
            f"{FX.dlit(_LEVELS / (mx - mn))}"
        )
        elems.append(
            f"(CAST(round({scaled}, 0) AS INT) - {_ZERO_POINT})"
        )
    return F.expr("array(" + ", ".join(elems) + ")")


def dequantize_expr(
    qvec_col: Column, params: Sequence[Tuple[float, float]]
) -> Column:
    """``array<double>`` reconstruction of a quantized code."""
    vec_sql = FX.sql_of(qvec_col)
    elems = []
    for i, (mn, mx) in enumerate(params):
        if mx == mn:
            elems.append(FX.dlit(float(mn)))
            continue
        elems.append(
            f"(CAST({vec_sql}[{i}] AS DOUBLE) + {_ZERO_POINT}) * "
            f"{FX.dlit((mx - mn) / _LEVELS)} + {FX.dlit(mn)}"
        )
    return F.expr("array(" + ", ".join(elems) + ")")


def symmetric_scale(df: DataFrame, vec_col: str) -> float:
    """Global symmetric quantization scale ``127 / absmax`` over every
    element of ``vec_col`` — one aggregation pass, ONE scalar collected.

    Symmetric (zero-point-free) codes are what the SEARCH path needs:
    with ``q_i = round(x_i * s)`` the integer dot product equals
    ``s^2 * <x, y>`` up to quantization noise, so int64 score order
    approximates true dot-product order. Per-dim AFFINE codes
    (:func:`quantize_expr`) do NOT have this property — their zero
    point shifts every score by data-dependent cross terms — which is
    why storage codes and search codes are separate schemes here, as
    in standard SQ8 practice."""
    mx = df.agg(
        F.max(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
            )
        )
    ).collect()[0][0]
    if mx is None or mx == 0.0:
        raise ValueError("symmetric_scale needs at least one non-zero element")
    return 127.0 / float(mx)


def symmetric_quantize_expr(vec_col: Column, scale: float) -> Column:
    """``array<int>`` symmetric code (range [-127, 127]) under a literal
    global ``scale`` — pure codegen, map-only."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * F.lit(scale), 0).cast("int")
    )


def _int_dot_expr(qvec: Column, code: Sequence[int]) -> Column:
    """Exact int64 dot product against a literal code. The literal
    array parses as ONE F.expr (functions/fastexpr) instead of
    2 x dim py4j calls; the fold keeps the Column API because ``qvec``
    is itself a derived expression (sql_of only round-trips bare
    refs/slices). Same fold, same BIGINT typing as before."""
    return F.aggregate(
        F.zip_with(qvec, F.expr(FX.bigint_array(code)), lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` neighbors of ``query_id``'s vector by EXACT int64 dot
    product over SYMMETRIC int8 codes: ``(id, qdot)``, ties to the
    smaller id, the query row itself excluded. Because the codes are
    zero-point-free, ``qdot ~= scale^2 * <x, q>`` — score order
    approximates true dot-product order (affine codes would not).

    Plan: one scale pass (ONE scalar), the query row's code evaluated
    through the SAME engine expression (never re-rounded in Python —
    keeps encode semantics single-sourced), then a map-only scoring
    scan into TakeOrderedAndProject. Nothing shuffles; the corpus never
    moves. At 100 TB the quantized codes would be written once and
    scanned (4x cheaper than float32); the scale rides along as a
    table property.
    """
    scale = symmetric_scale(df, vec_col)
    qrow = (
        df.where(F.col(id_col) == query_id)
        .select(symmetric_quantize_expr(F.col(vec_col), scale).alias("q"))
        .collect()
    )
    if len(qrow) != 1:
        raise ValueError(f"query_id {query_id}: expected 1 row, got {len(qrow)}")
    code = list(qrow[0]["q"])
    # dim is a contract check (the scale fold is dimension-agnostic): a
    # mismatched embedding width must fail loudly, not score garbage.
    if len(code) != dim:
        raise ValueError(
            f"query vector has {len(code)} dims, expected dim={dim}"
        )
    scored = df.where(F.col(id_col) != query_id).select(
        F.col(id_col).alias("id"),
        _int_dot_expr(
            symmetric_quantize_expr(F.col(vec_col), scale), code
        ).alias("qdot"),
    )
    return scored.orderBy(F.col("qdot").desc(), F.col("id").asc()).limit(k)


def quantization_error(
    df: DataFrame, vec_col: str, dim: int, round_digits: int = 6
) -> DataFrame:
    """One-row reconstruction audit: ``(n, mse)`` where mse is the mean
    over rows of the per-row summed squared reconstruction error.
    Per-row error is a fixed-order double fold rounded to
    ``round_digits`` and summed through decimal — addition-order
    independent, so the corpus mean is cross-engine exact (the
    operators/corpus.py contribution-sum pattern).

    The per-row error is ONE compact higher-order-function fold over
    two literal param ARRAYS instead of ``dim`` inlined per-dimension
    encode∘decode fragments (r13: the inlined tree was ~2k Catalyst
    nodes at dim=64 and every eager DataFrame analysis paid ~3.4 s on
    it — measured in OPTIMIZATION_r13.md; the HOF tree is ~100 nodes).
    Arithmetic is unchanged element-wise: the scale factors become
    single IEEE double divisions computed in-engine on the same
    doubles, which is bit-identical to the Python-side division the
    inlined form embedded (both are one IEEE-754 op on equal inputs —
    the same argument ``quantize_expr``'s docstring makes for the
    DuckDB twin)."""
    params = quantization_params(df, vec_col, dim)
    mns = FX.double_array([mn for mn, _ in params])
    mxs = FX.double_array([mx for _, mx in params])
    # zip_with pads exactly like the replaced zip_with(vec, recon):
    # both pair the vector against a dim-element array
    err = F.expr(
        f"aggregate(zip_with(`{vec_col}`, sequence(0, {dim - 1}), "
        "(x, i) -> CASE WHEN element_at({mxs}, i + 1) = element_at({mns}, i + 1) "
        "THEN (CAST(x AS DOUBLE) - element_at({mns}, i + 1)) "
        "* (CAST(x AS DOUBLE) - element_at({mns}, i + 1)) "
        "ELSE (CAST(x AS DOUBLE) - ("
        "(CAST(CAST(round((CAST(x AS DOUBLE) - element_at({mns}, i + 1)) "
        "* (255.0D / (element_at({mxs}, i + 1) - element_at({mns}, i + 1))), 0) AS INT) "
        "- 128 AS DOUBLE) + 128) "
        "* ((element_at({mxs}, i + 1) - element_at({mns}, i + 1)) / 255.0D) "
        "+ element_at({mns}, i + 1))) "
        "* (CAST(x AS DOUBLE) - ("
        "(CAST(CAST(round((CAST(x AS DOUBLE) - element_at({mns}, i + 1)) "
        "* (255.0D / (element_at({mxs}, i + 1) - element_at({mns}, i + 1))), 0) AS INT) "
        "- 128 AS DOUBLE) + 128) "
        "* ((element_at({mxs}, i + 1) - element_at({mns}, i + 1)) / 255.0D) "
        "+ element_at({mns}, i + 1))) END), "
        "0.0D, (acc, v) -> acc + v)".format(mns=mns, mxs=mxs)
    )
    per_row = F.round(err, round_digits).cast("decimal(28,6)")
    return df.select(per_row.alias("__e")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("__e").cast("double") / F.count(F.lit(1)), round_digits
        ).alias("mse"),
    )


# --- DuckDB twins ---------------------------------------------------------


def _params_ctes(table: str, id_col: str, vec_col: str, dim: int) -> str:
    """CTE computing per-dim min/max lists (1-based) from the table —
    the oracle derives params in-engine; they equal the collected ones
    because float min/max is exact."""
    mns = ", ".join(f"min({vec_col}[{i + 1}])" for i in range(dim))
    mxs = ", ".join(f"max({vec_col}[{i + 1}])" for i in range(dim))
    return f"prm AS (SELECT [{mns}] AS mn, [{mxs}] AS mx FROM {table})"


def _quantize_elem_sql(vec_expr: str, i: int) -> str:
    """1-based element ``i`` of the quantized code (same arithmetic
    order as ``quantize_expr``: subtract, multiply by the folded
    constant 255/(mx-mn), round, int-cast, shift)."""
    mn, mx = f"p.mn[{i}]", f"p.mx[{i}]"
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
        f"CAST(round((CAST({vec_expr}[{i}] AS DOUBLE) - CAST({mn} AS DOUBLE))"
        f" * (255.0 / (CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE)))) AS INT)"
        f" - 128 END"
    )


def quantized_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    query_id: int,
    k: int,
    out_id: str = "id",
) -> str:
    """DuckDB twin of :func:`quantized_topk` — same global symmetric
    scale (max is order-independent, the division is one IEEE op),
    same round-to-int codes, then exact int64 arithmetic end-to-end,
    so no rounding contract is involved on the scoring path."""
    dot = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> CAST(e.q[i] AS BIGINT) * CAST(qq.q[i] AS BIGINT))), "
        f"(acc, x) -> acc + x)"
    )
    return f"""
WITH pts AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}),
scl AS (
  SELECT 127.0 / max(list_max(list_transform(v,
    x -> abs(CAST(x AS DOUBLE))))) AS s
  FROM pts
),
codes AS (
  SELECT e.id,
         list_transform(e.v,
           x -> CAST(round(CAST(x AS DOUBLE) * p.s) AS INT)) AS q
  FROM pts e, scl p
),
qq AS (SELECT q FROM codes WHERE id = {query_id})
SELECT e.id AS {out_id}, {dot} AS qdot
FROM codes e, qq
WHERE e.id <> {query_id}
ORDER BY qdot DESC, e.id ASC
LIMIT {k}
"""


def quantization_error_sql(
    table: str, id_col: str, vec_col: str, dim: int, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`quantization_error` (same per-row fold
    order, same round-then-decimal summation)."""
    q_elems = ", ".join(_quantize_elem_sql("e.v", i + 1) for i in range(dim))
    recon = ", ".join(
        f"CASE WHEN p.mx[{i + 1}] = p.mn[{i + 1}] "
        f"THEN CAST(p.mn[{i + 1}] AS DOUBLE) ELSE "
        f"(CAST(q[{i + 1}] AS DOUBLE) + 128) * "
        f"((CAST(p.mx[{i + 1}] AS DOUBLE) - CAST(p.mn[{i + 1}] AS DOUBLE))"
        f" / 255.0) + CAST(p.mn[{i + 1}] AS DOUBLE) END"
        for i in range(dim)
    )
    err = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> (CAST(v[i] AS DOUBLE) - r[i]) * "
        f"(CAST(v[i] AS DOUBLE) - r[i]))), (acc, x) -> acc + x)"
    )
    return f"""
WITH {_params_ctes(table, id_col, vec_col, dim)},
pts AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}),
codes AS (SELECT e.id, e.v, [{q_elems}] AS q FROM pts e, prm p),
recons AS (SELECT c.id, c.v, [{recon}] AS r FROM codes c, prm p),
errs AS (
  SELECT CAST(round({err}, {round_digits}) AS DECIMAL(28,6)) AS e
  FROM recons
)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(e) AS DOUBLE) / count(*), {round_digits}) AS mse
FROM errs
"""


__all__ = [
    "quantization_params",
    "quantize_expr",
    "dequantize_expr",
    "symmetric_scale",
    "symmetric_quantize_expr",
    "quantized_topk",
    "quantized_topk_sql",
    "quantization_error",
    "quantization_error_sql",
]
