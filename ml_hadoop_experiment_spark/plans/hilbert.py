"""Hilbert-curve data layout: the locality-tighter sibling of Z-order.

`plans/layout.py` clusters writes along the Morton (Z) curve; the
Hilbert curve visits the same quantized grid with strictly better
locality — every consecutive pair of curve positions is a UNIT step on
the grid (Morton jumps across the space at power-of-two seams), so
range predicates map to fewer, tighter curve segments and file-level
min/max pruning discards more files for the same write cost. Both
Delta Lake and Iceberg expose Hilbert alongside Z-order for exactly
this reason (public knowledge; curve construction per Hilbert 1891,
iterative bit formulation as in the classic xy2d quadrant-rotation
algorithm).

Two computation paths, equivalence-pinned in pytest:

- **Lookup path** (:func:`hilbert_value_expr`, the oracle-gated form):
  the xy2d rotation loop is SEQUENTIAL per bit level — unrolling it as
  nested CASE expressions multiplies the expression tree ~3x per
  level, which Catalyst's projection collapse inflates exponentially;
  at useful bit widths that is not a viable codegen expression. But
  the curve over a ``2^bits x 2^bits`` grid is a PURE TABLE — so the
  driver computes it once (:func:`hilbert_lookup`, microseconds at the
  default 6 bits = 4096 cells), and both engines evaluate one literal
  array lookup per row: map-only, zero shuffle, bit-identical by
  construction. This is also the honest 100 TB shape: a broadcast
  lookup beats re-deriving the curve per row.
- **Vectorized path** (:func:`hilbert_value_batch` /
  :func:`with_hilbert_value` at ``bits > max_lookup_bits``): the same
  rotation loop as ``bits`` numpy vector ops over Arrow batches — the
  production form for fine grids where a lookup table would be too
  large to broadcast as a literal.

Reference parity: criteo/ml-hadoop-experiment has no layout surface
(SURVEY.md §2) — north-star extension next to `plans/layout.py`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .layout import ZDim, quantize, quantize_sql

#: largest per-dimension bit width served by the literal lookup table
#: (2^(2*bits) int64 entries: 6 -> 4096 ints, ~32 KiB broadcast).
#: r14: lowered 8 -> 6. A 2^14/2^16-entry literal array is not "one
#: lookup" to the DRIVER: every analysis/optimization pass walks the
#: 16k/65k-child CreateArray before it constant-folds, and a clustered
#: write re-plans it for the range-sampling job, the sort, and the
#: write (measured: the bits=8 clustered-write pytest spent 253 s of
#: driver time at MAX=8 vs 4.4 s on the Arrow rotation path at MAX=6 —
#: the same planning-time pathology functions/fastexpr.py documents).
#: The Arrow path (:func:`hilbert_value_batch`) is bit-identical
#: (equivalence pytest-pinned) and scale-honest for fine grids; the
#: literal table remains the oracle-replayable form at the default 6.
MAX_LOOKUP_BITS = 6


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Curve position of grid cell ``(x, y)`` on the ``2^bits``-wide
    Hilbert curve — the classic iterative quadrant-rotation xy2d, used
    driver-side to build lookup tables and as the test reference. The
    reflection step can drive intermediates negative; Python's
    arbitrary-precision two's-complement ``&`` matches 64-bit engine
    semantics for these magnitudes (pytest pins the curve properties:
    bijection + unit steps)."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) != 0 else 0
        ry = 1 if (y & s) != 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_lookup(bits: int) -> List[int]:
    """The full curve as a row-major table: entry ``x * 2^bits + y`` is
    the curve position of cell (x, y)."""
    if not 1 <= bits <= MAX_LOOKUP_BITS:
        raise ValueError(
            f"lookup path serves 1..{MAX_LOOKUP_BITS} bits, got {bits}"
        )
    n = 1 << bits
    return [hilbert_xy2d(bits, x, y) for x in range(n) for y in range(n)]


def hilbert_value_batch(
    qx: np.ndarray, qy: np.ndarray, bits: int
) -> np.ndarray:
    """Vectorized xy2d over int64 arrays — ``bits`` rounds of numpy
    vector ops, no per-row Python. Matches :func:`hilbert_xy2d`
    element-wise (pytest-pinned). ``2 * bits`` must stay below 63 —
    the curve position is an int64 and the per-level distance term
    reaches ``3 * 4^(bits-1)`` — the same bound `layout.interleave_bits`
    asserts; int64 numpy arithmetic would wrap SILENTLY past it."""
    if bits < 1 or 2 * bits >= 63:
        raise ValueError(
            f"need 1 <= bits and 2 * bits < 63 (int64 positions), got {bits}"
        )
    x = qx.astype("int64").copy()
    y = qy.astype("int64").copy()
    d = np.zeros_like(x)
    s = (1 << bits) >> 1
    while s > 0:
        rx = ((x & s) != 0).astype("int64")
        ry = ((y & s) != 0).astype("int64")
        d += s * s * ((3 * rx) ^ ry)
        refl = (ry == 0) & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d


def hilbert_value_expr(
    dims: Sequence[ZDim], bits: int = 6
) -> Column:
    """Hilbert curve position of two quantized dimensions as ONE
    literal-array lookup — pure codegen, map-only, zero shuffle.
    ``bits <= MAX_LOOKUP_BITS`` (the table is ``2^(2*bits)`` longs);
    use :func:`with_hilbert_value` for finer grids."""
    if len(dims) != 2:
        raise ValueError(f"hilbert layout is 2-D here, got {len(dims)} dims")
    (cx, lox, hix), (cy, loy, hiy) = dims
    qx = quantize(cx, lox, hix, bits)
    qy = quantize(cy, loy, hiy, bits)
    table = hilbert_lookup(bits)
    # literal via the SQL parser, not F.lit(list): py4j converts a
    # 4096-element Python list element-by-element (~2 s PER CALL);
    # parsing the same array literal costs milliseconds
    arr = F.expr("array(" + ",".join(map(str, table)) + ")")
    idx = qx * F.lit(1 << bits) + qy + F.lit(1)  # element_at is 1-based
    return F.element_at(arr, idx.cast("int"))


def hilbert_value_sql(
    dims: Sequence[Tuple[str, float, float]], bits: int = 6
) -> str:
    """DuckDB twin of :func:`hilbert_value_expr`: the same literal
    table, the same quantization, the same 1-based list index."""
    if len(dims) != 2:
        raise ValueError(f"hilbert layout is 2-D here, got {len(dims)} dims")
    (ex, lox, hix), (ey, loy, hiy) = dims
    qx = quantize_sql(ex, lox, hix, bits)
    qy = quantize_sql(ey, loy, hiy, bits)
    table = ", ".join(str(v) for v in hilbert_lookup(bits))
    return f"([{table}])[CAST({qx} * {1 << bits} + {qy} + 1 AS INTEGER)]"


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    dims: Sequence[ZDim],
    bits: int = 6,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered along the Hilbert curve of
    ``dims`` — `layout.write_zordered` with the tighter curve:
    ``repartitionByRange`` on the curve position splits it into
    contiguous segments (one per output file, boundaries from Spark's
    reservoir sampling — no driver materialization), the
    within-partition sort tightens row-group stats, and because every
    consecutive curve step is a unit grid move, each file's bounding
    box over BOTH dimensions is as tight as the segment allows.
    Exactly one shuffle; domain bounds are caller-supplied for the
    same reason as the z-order writer (a production table knows its
    domains; computing them inline would add a scan)."""
    from .layout import write_curve_clustered

    write_curve_clustered(
        with_hilbert_value(df, dims, bits, out_col="__h"), path, "__h",
        num_files,
    )


def with_hilbert_value(
    df: DataFrame,
    dims: Sequence[ZDim],
    bits: int = 6,
    out_col: str = "hilbert",
) -> DataFrame:
    """``df`` plus the Hilbert curve position of ``dims``: the literal
    lookup when the table fits (``bits <= MAX_LOOKUP_BITS``), else the
    Arrow-batched vectorized rotation loop. Feed the column to
    ``repartitionByRange`` + in-partition sort for a Hilbert-clustered
    write, exactly like ``layout.write_zordered`` does with z."""
    if len(dims) != 2:
        raise ValueError(f"hilbert layout is 2-D here, got {len(dims)} dims")
    if bits <= MAX_LOOKUP_BITS:
        return df.withColumn(out_col, hilbert_value_expr(dims, bits))
    if 2 * bits >= 63:
        raise ValueError(
            f"need 2 * bits < 63 (int64 curve positions), got {bits}"
        )
    from pyspark.sql.functions import pandas_udf

    (cx, lox, hix), (cy, loy, hiy) = dims

    @pandas_udf("long")
    def _h(qx: pd.Series, qy: pd.Series) -> pd.Series:
        # quantize() clamps NULL/NaN into edge cells (greatest/least
        # skip nulls — the layout-module contract: a curve position
        # exists for every row), so qx/qy are normally non-null here.
        # The mask is a guard against any upstream that DOES hand this
        # UDF a null: Arrow delivers it as float64 NaN and a blind
        # int64 cast would mint a garbage position — emit NULL instead.
        mask = qx.notna() & qy.notna()
        out = pd.Series(pd.NA, index=qx.index, dtype="Int64")
        if mask.any():
            out[mask] = hilbert_value_batch(
                qx[mask].to_numpy(dtype="int64"),
                qy[mask].to_numpy(dtype="int64"),
                bits,
            )
        return out

    return df.withColumn(
        out_col,
        _h(quantize(cx, lox, hix, bits), quantize(cy, loy, hiy, bits)),
    )
