"""Distribution-drift reports between two data slices: PSI over a
shared fixed-width histogram.

The monitoring question every recurring ingestion asks: did this
batch's value distribution MOVE relative to the reference corpus?
The engine's `chi_square` (operators/stats.py) answers it for
categorical columns; this module covers continuous columns with the
industry-standard Population Stability Index (credit-scoring
literature, public knowledge): bin both slices on the SAME declared
grid (`operators/histogram.fixed_width_bin_expr` — the
engine-portable clamp/floor rule), convert counts to smoothed
fractions, and score ``sum((p_a - p_b) * ln(p_a / p_b))`` per bin.
Rule of thumb (public): < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action.

Laplace smoothing (+1 per bin on BOTH sides, over the full declared
grid including empty bins) keeps ``ln`` finite when a bin is occupied
on one side only — and because the smoothing is part of the declared
estimator, the DuckDB twin replays it exactly: integer counts, then
one fixed double-operation order per bin, one rounding at the end.

Scale shape: two map-side binned counts (each a partial-aggregated
(bin) exchange bounded by ``n_bins``), one ``n_bins``-sized
full-outer join, pure arithmetic after — the corpus is scanned once
per side and nothing data-sized moves.

Reference parity: criteo/ml-hadoop-experiment has no drift surface
(SURVEY.md §2) — north-star extension for ingestion monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .histogram import (
    _geometry,
    finite_filter_sql,
    fixed_width_bin_sql,
    histogram_counts,
)


def psi_from_counts(
    counts_a: DataFrame,
    counts_b: DataFrame,
    n_bins: int,
    round_digits: int = 6,
) -> DataFrame:
    """Finish two ``(bin, cnt)`` histogram-count frames (batch OR a
    drained streaming sketch — any producer sharing the fixed-width
    grid) into per-bin PSI terms ``(bin, n_a, n_b, psi_term)`` with
    add-one smoothing over the full ``n_bins`` grid. The output has
    exactly ``n_bins`` rows — bins empty on BOTH sides still carry a
    (usually tiny, zero when totals match) smoothed term, so the
    headline ``sum(psi_term)`` is invariant to which bins happen to
    be occupied."""
    spark = counts_a.sparkSession
    grid = spark.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    ca = _guard_bins(counts_a, n_bins, "counts_a").withColumnRenamed(
        "cnt", "n_a"
    )
    cb = _guard_bins(counts_b, n_bins, "counts_b").withColumnRenamed(
        "cnt", "n_b"
    )
    # the counts sides are n_bins-bounded — broadcast them so the
    # grid spine never shuffles
    joined = (
        grid.join(F.broadcast(ca), "bin", "left")
        .join(F.broadcast(cb), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tots = joined.agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    # smoothed fraction: (n + 1) / (total + n_bins) — denominators use
    # the FULL grid so empty bins are consistently priced on both sides
    pa = (F.col("n_a").cast("double") + F.lit(1.0)) / (
        F.col("__ta").cast("double") + F.lit(float(n_bins))
    )
    pb = (F.col("n_b").cast("double") + F.lit(1.0)) / (
        F.col("__tb").cast("double") + F.lit(float(n_bins))
    )
    return joined.join(F.broadcast(tots)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), round_digits).alias(
            "psi_term"
        ),
    )


def _guard_bins(counts: DataFrame, n_bins: int, side: str) -> DataFrame:
    """Fail LOUDLY on a bin outside ``[0, n_bins)`` instead of letting
    the grid left-join silently drop it (which would under-count the
    totals and skew every smoothed fraction). A mismatched producer —
    counts built on a different grid — is a caller bug that must
    surface, not a row to discard. ``assert_true`` evaluates NULL when
    the predicate holds, so the ``when(...isNull(), bin)`` wrapper
    keeps the check inside the projected column (an unreferenced check
    column would be pruned by the optimizer)."""
    b = F.col("bin")
    ok = b.isNotNull() & (b >= 0) & (b < n_bins)
    msg = F.concat(
        F.lit(f"psi_from_counts: {side} has bin outside [0, {n_bins}): "),
        b.cast("string"),
    )
    return counts.select(
        F.when(F.assert_true(ok, msg).isNull(), b).alias("bin"), "cnt"
    )


def psi_report(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bin PSI terms between slice A (e.g. the incoming batch) and
    slice B (the reference): ``(bin, n_a, n_b, psi_term)`` for EVERY
    bin of the declared grid, with add-one smoothing. ``sum(psi_term)``
    is the headline PSI; the per-bin frame is returned because the
    actionable answer is WHICH region of the distribution moved.
    NULL/NaN skipped (the histogram family's rule)."""
    _geometry(lo, hi, n_bins)  # validate
    return psi_from_counts(
        histogram_counts(df_a, [], value_col, lo, hi, n_bins),
        histogram_counts(df_b, [], value_col, lo, hi, n_bins),
        n_bins,
        round_digits,
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    round_digits: int = 6,
    max_distinct: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: one row
    ``(n_a, n_b, ks)`` with ``ks = max over observed values of
    |F_a(v) - F_b(v)|`` — the third drift form next to `chi_square`
    (categorical) and :func:`psi_report` (binned): no grid to declare,
    sensitive to ANY distributional difference, at the cost of a
    distinct-value-sized exchange instead of an ``n_bins``-bounded one.

    Shape: per-side value counts (partial-aggregated), a full-outer
    merge on value, ONE window cumsum ordered by value, a max — the
    frames that shuffle are bounded by the distinct-value count, never
    raw rows. Exactness: cumulative counts are integers; each CDF is
    one integer-to-double division and the max runs over
    ``round``-stable doubles, so the DuckDB twin
    (:func:`ks_statistic_sql`) matches bit-for-bit.

    Cleaning: NULL/NaN AND +-Infinity are dropped — stricter than the
    histogram family's NULL/NaN-only rule (where +-Inf clamps into the
    edge bins), matching ``streaming/moments._clean`` instead: an
    infinity is not an observable point on the real line, so letting
    it carry CDF mass would make ``ks`` depend on sentinel values.

    ``max_distinct`` (opt-in, one extra count job): the cumsum window
    is single-partition over the DISTINCT-value frame, so a
    high-cardinality double column collapses to one task holding every
    distinct value. Set a ceiling to fail loudly with a pointer to
    :func:`psi_report`'s bounded grid instead of OOMing an executor."""
    ca = (
        _clean_values(df_a, value_col)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    cb = (
        _clean_values(df_b, value_col)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_b"))
    )
    merged = ca.join(cb, "v", "full").select(
        "v",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    if max_distinct is not None:
        n_distinct = merged.count()
        if n_distinct > max_distinct:
            raise ValueError(
                f"ks_statistic: {n_distinct} distinct values exceeds "
                f"max_distinct={max_distinct}; the ordered cumsum would "
                "collapse to one task holding them all — quantize the "
                "column first, or use psi_report's bounded grid"
            )
    from pyspark.sql import Window

    # single-partition ordered cumsum: correct because the frame is the
    # distinct-VALUE frame, not raw rows; for a column with unbounded
    # distinct cardinality quantize first (or use psi_report's bounded
    # grid) — same caveat applies to the DuckDB twin
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.select(
        F.sum("c_a").over(w).alias("ca"),
        F.sum("c_b").over(w).alias("cb"),
    )
    # totals from the still-distributed merged frame (not the
    # single-partition cum frame); a side with zero rows yields ZERO
    # result rows in both engines (the empty-slice contract) instead
    # of a NULL-vs-NaN divergence from dividing by zero
    tots = merged.agg(
        F.sum("c_a").alias("na"), F.sum("c_b").alias("nb")
    ).where((F.col("na") > 0) & (F.col("nb") > 0))
    return (
        cum.join(F.broadcast(tots))
        .groupBy("na", "nb")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca").cast("double")
                        / F.col("na").cast("double")
                        - F.col("cb").cast("double")
                        / F.col("nb").cast("double")
                    )
                ),
                round_digits,
            ).alias("ks"),
        )
        .select(
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "ks"
        )
    )


def _clean_values(df: DataFrame, value_col: str) -> DataFrame:
    # strict finite (drops +-Inf too) — see ks_statistic's docstring;
    # same rule as streaming/moments._clean
    v = F.col(value_col).cast("double")
    inf = F.lit(float("inf"))
    return df.where(
        v.isNotNull() & ~F.isnan(v) & (v != inf) & (v != -inf)
    ).select(v.alias("v"))


def ks_statistic_sql(
    relation_a: str,
    relation_b: str,
    value_expr: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`ks_statistic` (same merge, same cumsum
    order, same integer-to-double divisions, same rounding, same
    zero-rows-on-empty-slice contract, same strict-finite cleaning —
    ``isfinite`` rejects NULL/NaN/+-Inf in one predicate)."""
    filt = f"isfinite(CAST({value_expr} AS DOUBLE))"
    return f"""
WITH ca AS (
  SELECT CAST({value_expr} AS DOUBLE) AS v, count(*) AS c_a
  FROM {relation_a} WHERE {filt} GROUP BY 1
),
cb AS (
  SELECT CAST({value_expr} AS DOUBLE) AS v, count(*) AS c_b
  FROM {relation_b} WHERE {filt} GROUP BY 1
),
merged AS (
  SELECT coalesce(ca.v, cb.v) AS v,
         coalesce(c_a, 0) AS c_a,
         coalesce(c_b, 0) AS c_b
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
cum AS (
  SELECT sum(c_a) OVER (ORDER BY v) AS ca,
         sum(c_b) OVER (ORDER BY v) AS cb
  FROM merged
),
tots AS (
  SELECT na, nb FROM (
    SELECT sum(c_a) AS na, sum(c_b) AS nb FROM merged
  ) WHERE na > 0 AND nb > 0
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       round(max(abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))),
             {round_digits}) AS ks
FROM cum, tots
GROUP BY na, nb
"""


def psi_report_sql(
    relation_a: str,
    relation_b: str,
    value_expr: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`psi_report` (the SHARED bin/filter
    builders from operators/histogram.py, same full-grid smoothing,
    same double operation order, same rounding)."""
    bin_expr = fixed_width_bin_sql(value_expr, lo, hi, n_bins)
    filt = finite_filter_sql(value_expr)
    nb = float(n_bins)
    return f"""
WITH grid AS (
  SELECT CAST(unnest(range({n_bins})) AS INTEGER) AS bin
),
ca AS (
  SELECT {bin_expr} AS bin, count(*) AS n_a
  FROM {relation_a} WHERE {filt} GROUP BY 1
),
cb AS (
  SELECT {bin_expr} AS bin, count(*) AS n_b
  FROM {relation_b} WHERE {filt} GROUP BY 1
),
joined AS (
  SELECT grid.bin,
         coalesce(n_a, 0) AS n_a,
         coalesce(n_b, 0) AS n_b
  FROM grid
  LEFT JOIN ca ON ca.bin = grid.bin
  LEFT JOIN cb ON cb.bin = grid.bin
),
tots AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM joined)
SELECT bin,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(((CAST(n_a AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + {nb!r})
              - (CAST(n_b AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + {nb!r}))
             * ln(((CAST(n_a AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + {nb!r}))
                  / ((CAST(n_b AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + {nb!r}))),
             {round_digits}) AS psi_term
FROM joined, tots
"""
