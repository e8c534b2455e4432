"""Literal-heavy Spark expressions built as ONE SQL string, not N calls.

Why this module exists (optimization round 13, guide §1/§5): the ANN and
quantization operators embed k x dim literal matrices (centroids, sign
matrices, ADC tables) into pure-codegen expressions. Built through the
Column API, every ``F.lit`` / ``F.struct`` / HOF lambda is a separate
py4j round trip — measured 0.5-0.65 ms each on this host — so an
8-centroid x 16-dim argmin costs ~600 ms of DRIVER wall clock to
*construct*, re-paid on every plan build (per Lloyd iteration, per
query call). The same expression as one ``F.expr(sql_text)`` parses in
~0.6 ms: a ~1000x reduction in driver-side build cost with a
bit-identical analyzed expression (same functions, same literal values,
same fold order — equivalence pinned by tests/test_fastexpr.py).

This is driver-coordination cost, not executor work: it does not show
up in any stage metric, only as dead gaps between jobs (the event-log
receipts in OPTIMIZATION_r13.md). At 100 TB the same build cost is
paid once per job — small against hours of execution, but in a
query-diverse serving driver (many plans per minute) it is the
difference between coordination and computation.

Every fragment builder returns SQL TEXT; callers wrap the final string
in one ``F.expr``. Semantics contracts (shared with the DuckDB twins):

- double literals render via ``repr(float(x))`` + ``D`` — shortest
  round-trip decimal, parsed by Java ``Double.parseDouble`` back to the
  identical IEEE double (finite values only — asserted);
- folds stay LEFT-TO-RIGHT over a 0.0 initial accumulator, the
  ``squared_distance_expr`` / ``_sqdist_sql`` order both engines pin;
- argmin ties keep the smallest centroid index (``array_min`` over
  ``(d, c)`` structs — the ``kmeans_assign_expr`` contract).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column


def sql_of(col: "Column | str") -> str:
    """SQL fragment for a column reference: a plain string is treated
    as an (already valid) SQL fragment; a Column renders through its
    unresolved expression's ``sql()`` — exact for the simple refs and
    ``slice(...)`` forms the ANN call sites pass. NOT safe for derived
    Columns built from Python operators (``a * b`` renders prefix-style
    ``*(a, b)``, which does not re-parse) — pass those as Columns to a
    Column-API fold instead (see ``quantize._int_dot_expr``)."""
    if isinstance(col, str):
        return col
    # Spark 4 classic Column: toString renders the unresolved tree as
    # parseable SQL for the simple forms used here (bare refs, slice);
    # pinned by tests/test_fastexpr.py::test_sql_of_column_and_slice
    return col._jc.toString()  # type: ignore[attr-defined]


def dlit(x: float) -> str:
    """A double literal: shortest round-trip decimal + ``D`` suffix."""
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {v!r} cannot be rendered")
    return repr(v) + "D"


def double_array(values: Sequence[float]) -> str:
    """``array(<double literals>)``."""
    return "array(" + ", ".join(dlit(v) for v in values) + ")"


def nested_double_array(rows: Sequence[Sequence[float]]) -> str:
    """``array(array(...), ...)`` — a literal matrix."""
    return "array(" + ", ".join(double_array(r) for r in rows) + ")"


def bigint_array(values: Sequence[int]) -> str:
    """``array(<BIGINT literals>)``."""
    return (
        "array(" + ", ".join(f"CAST({int(v)} AS BIGINT)" for v in values) + ")"
    )


def sqdist_frag(vec_sql: str, centroid: Sequence[float]) -> str:
    """Squared L2 distance of ``vec_sql`` to a literal centroid — the
    ``similarity.squared_distance_expr`` fold (zip_with squares, then a
    left-to-right ``aggregate`` sum seeded at 0.0)."""
    return (
        f"aggregate(zip_with({vec_sql}, {double_array(centroid)}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def argmin_frag(vec_sql: str, centroids: Sequence[Sequence[float]]) -> str:
    """Argmin centroid index of ``vec_sql`` under literal ``centroids``,
    ties to the smallest index — the ``clustering.kmeans_assign_expr``
    contract (``array_min`` over ``(d, c)`` structs).

    Emitted as ONE ``zip_with`` over the literal centroid MATRIX (not k
    separate per-centroid folds): Catalyst's eager analysis priced the
    k-fold form at ~0.8 s per analyzed op at k=8 x dim=64 — lambda
    binding is per-HOF, so one outer fold + one inner fold analyzes in
    ~0.1 s (r13 receipts in OPTIMIZATION_r13.md). Values, types, fold
    order and the tie contract are unchanged (pinned value-wise by
    tests/test_fastexpr.py::test_argmin_frag). Lambda variables are
    name-mangled so a caller's column reference can never be captured."""
    k = len(centroids)
    return (
        f"array_min(zip_with({nested_double_array(centroids)}, "
        f"sequence(0, {k - 1}), (__amf_cent, __amf_i) -> named_struct("
        f"'d', aggregate(zip_with({vec_sql}, __amf_cent, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, x) -> acc + x), 'c', __amf_i))).c"
    )


def slice_frag(vec_sql: str, start_1based: int, length: int) -> str:
    """``slice(vec, start, length)`` (1-based, the ``F.slice`` form)."""
    return f"slice({vec_sql}, {start_1based}, {length})"


def dot_frag(a_sql: str, b_sql: str) -> str:
    """Dot product fold — ``functions.vectors.dot_expr`` semantics."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def norm_frag(a_sql: str) -> str:
    """L2 norm fold — ``functions.vectors.norm_expr`` semantics."""
    return (
        f"sqrt(aggregate({a_sql}, 0.0D, "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def cosine_frag(a_sql: str, b_sql: str) -> str:
    """Cosine similarity, NULL on zero norms —
    ``functions.vectors.cosine_similarity_expr`` semantics (CASE with
    no ELSE = the same null-safe contract)."""
    denom = f"({norm_frag(a_sql)} * {norm_frag(b_sql)})"
    return (
        f"CASE WHEN {denom} <> 0.0D THEN ({dot_frag(a_sql, b_sql)}) / "
        f"{denom} END"
    )
