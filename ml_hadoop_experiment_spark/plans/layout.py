"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping writes.

Extension beyond the reference (BASELINE.json north-star). At 100 TB the
fastest scan is the one that never happens: parquet readers prune row
groups whose column min/max stats exclude the predicate, and engines prune
whole files the same way. Sorting by ONE column gives perfect skipping on
that column and none on the others; interleaving the bits of several
quantized columns (the Z-order / Morton curve — Morales & Orenstein,
"spatial sorting"; the layout Delta Lake's OPTIMIZE ZORDER applies) gives
every interleaved column locality, so predicates on ANY of them prune.

Everything here is pure codegen bit arithmetic — no UDF, no shuffle beyond
the single range partitioning of the clustered write — and evaluates
bit-identically in DuckDB for the oracle gate.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (column expression, domain minimum, domain maximum) for one Z dimension.
ZDim = Tuple[Column, float, float]


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine map of ``col`` from [lo, hi] onto the integer grid
    [0, 2^bits). Out-of-domain values clamp to the edge cells — a z-value
    must exist for every row, and stats-based skipping stays correct
    because clamped rows land in the boundary cells their files declare.

    Integer-exact for integral inputs when (hi - lo) <= 2^53; the double
    multiply before the floor is correctly rounded in both engines.
    """
    cells = (1 << bits) - 1
    # scale by 2^bits (not cells) so interior cells are uniform and the
    # clamp maps x = hi into the top cell despite float rounding
    scaled = (col.cast("double") - F.lit(float(lo))) * F.lit(
        float(1 << bits) / (float(hi) - float(lo))
    )
    q = F.floor(scaled).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit(cells))


def quantize_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    cells = (1 << bits) - 1
    scale = float(1 << bits) / (float(hi) - float(lo))
    return (
        f"least(greatest(CAST(floor((CAST({expr} AS DOUBLE) - {float(lo)!r}) "
        f"* {scale!r}) AS BIGINT), 0), {cells})"
    )


def interleave_bits(qs: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit ``b`` of quantized dim ``d`` lands at output
    position ``b * ndims + d``. A fold of shift/AND/OR terms — one codegen
    expression, no Python. ``ndims * bits`` must stay below 63."""
    ndims = len(qs)
    assert ndims * bits < 63, "z-value exceeds a signed 64-bit integer"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, q in enumerate(qs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * ndims + d
                )
            )
    return z


def interleave_bits_sql(q_exprs: Sequence[str], bits: int) -> str:
    ndims = len(q_exprs)
    terms = [
        f"((({q} >> {b}) & 1) << {b * ndims + d})"
        for b in range(bits)
        for d, q in enumerate(q_exprs)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_value(dims: List[ZDim], bits: int = 16) -> Column:
    """The Z-order key for ``dims``: quantize each to ``bits`` bits, then
    Morton-interleave. Deterministic, portable, pure expression."""
    qs = [quantize(c, lo, hi, bits) for (c, lo, hi) in dims]
    return interleave_bits(qs, bits)


def zorder_value_sql(dims: List[Tuple[str, float, float]], bits: int = 16) -> str:
    qs = [quantize_sql(e, lo, hi, bits) for (e, lo, hi) in dims]
    return interleave_bits_sql(qs, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    dims: List[ZDim],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``dims``.

    ``repartitionByRange`` on the z-value splits the curve into
    contiguous segments (one per output file; range boundaries come from
    Spark's reservoir sampling of the key — the standard total-sort
    machinery, no driver materialization), and the within-partition sort
    tightens row-group stats inside each file. Cost: exactly one shuffle.
    Readers then skip files/row groups whose min/max exclude predicates
    on ANY interleaved dimension (see tests for the measured bound
    tightening vs an unclustered write).

    Domain bounds (lo, hi) are caller-supplied: production tables know
    their domains (or take them from catalog stats); computing them
    inline would add a scan and make the layout data-dependent.
    """
    write_curve_clustered(
        df.withColumn("__z", zorder_value(dims, bits)), path, "__z",
        num_files,
    )


def write_curve_clustered(
    df: DataFrame,
    path: str,
    curve_col: str,
    num_files: int | None = None,
) -> None:
    """Shared clustered-write tail for any space-filling-curve column
    (Z-order here, Hilbert in plans/hilbert.py): range-partition on
    the curve value, sort within partitions for tight row-group
    stats, drop the helper column, write parquet. One copy of the
    one-shuffle write contract."""
    if num_files:
        out = df.repartitionByRange(num_files, curve_col)
    else:
        out = df.repartitionByRange(curve_col)
    out.sortWithinPartitions(curve_col).drop(curve_col).write.mode(
        "overwrite"
    ).parquet(path)


def file_stats(path: str, columns: List[str]) -> "list[dict]":
    """Per-file min/max of ``columns`` from parquet footers (no data read)
    — the exact information a reader's file-pruning consults. Driver-side
    by design: footers are KB-sized metadata."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in columns}
        maxs = {c: None for c in columns}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    if mins[name] is None or s.min < mins[name]:
                        mins[name] = s.min
                    if maxs[name] is None or s.max > maxs[name]:
                        maxs[name] = s.max
        out.append(
            {
                "file": os.path.basename(f),
                "rows": md.num_rows,
                **{f"min_{c}": mins[c] for c in columns},
                **{f"max_{c}": maxs[c] for c in columns},
            }
        )
    return out


def skipping_fraction(
    stats: "list[dict]", column: str, lo: float, hi: float
) -> float:
    """Fraction of files a [lo, hi] predicate on ``column`` can SKIP given
    footer ``stats`` — the scan-avoidance a layout buys."""
    total = len(stats)
    if not total:
        return 0.0
    hit = sum(
        1
        for s in stats
        if s[f"min_{column}"] is not None
        and not (s[f"max_{column}"] < lo or s[f"min_{column}"] > hi)
    )
    return 1.0 - hit / total


__all__ = [
    "ZDim",
    "quantize",
    "quantize_sql",
    "interleave_bits",
    "interleave_bits_sql",
    "zorder_value",
    "zorder_value_sql",
    "write_zordered",
    "file_stats",
    "skipping_fraction",
]
