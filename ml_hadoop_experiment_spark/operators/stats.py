"""Distributed robust statistics: per-key MAD outlier detection and
decimal-exact per-segment OLS trend fitting.

Extensions beyond the reference (BASELINE.json north-star): data-quality
monitoring ops a training pipeline runs next to curation — "which segments
have anomalous metric values" and "which segments are drifting over time".

Design for 100 TB:
- both operators aggregate BY KEY with map-side partial aggregation; the
  only wide exchanges carry one row per (partition, key);
- the MAD pass joins the tiny per-key median table back with an explicit
  ``broadcast`` (group cardinality = segments, not rows), so the big scan
  never shuffles — the cost is scans, not exchanges;
- the OLS sums are decimal-exact (order-independent), so results are
  bit-stable under any partitioning; the slope/intercept divisions happen
  once per key in double, written identically in the DuckDB twin.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier summary: median, MAD, and outlier count.

    MAD = median(|x - median(x)|), the standard robust spread measure
    (immune to the outliers it hunts, unlike stddev). A row is an outlier
    when ``|x - med| > n_mads * mad``. Exact medians via the sort-based
    ``percentile`` aggregate — bit-identical to DuckDB's ``quantile_cont``
    (the interpolation parity the quantiles query pins).

    Plan: three scans with two key-aggregations and two broadcast joins —
    at 100 TB the per-key tables are KB-sized broadcasts, the value data
    never shuffles. Exact per-key percentile buffers each key's values in
    one task; for billion-row keys swap ``percentile`` for
    ``approx_percentile`` (same shape, mergeable sketch) — the exact form
    is kept here as the oracle-checkable yardstick, mirroring the
    quantiles/quantiles_approx pairing.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), on=key_cols).withColumn(
        "__adev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.expr("percentile(__adev, 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    flagged = df.join(F.broadcast(mad), on=key_cols)
    return (
        flagged.groupBy(*key_cols)
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(v - F.col("med")) > F.lit(float(n_mads)) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def mad_outliers_sql(
    relation: str, key_expr: str, value_expr: str, n_mads: float = 3.0
) -> str:
    """DuckDB twin of ``mad_outliers`` (same grouping, same medians)."""
    return f"""
WITH med AS (
  SELECT {key_expr} AS k, quantile_cont({value_expr}, 0.5) AS med
  FROM {relation} GROUP BY 1
),
mad AS (
  SELECT t.{key_expr} AS k, quantile_cont(abs(CAST(t.{value_expr} AS DOUBLE) - med.med), 0.5) AS mad,
         any_value(med.med) AS med
  FROM {relation} t JOIN med ON t.{key_expr} = med.k
  GROUP BY 1
)
SELECT t.{key_expr} AS {key_expr},
       any_value(mad.med) AS med,
       any_value(mad.mad) AS mad,
       CAST(sum(CASE WHEN abs(CAST(t.{value_expr} AS DOUBLE) - mad.med)
                          > {float(n_mads)!r} * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       count(*) AS n_rows
FROM {relation} t JOIN mad ON t.{key_expr} = mad.k
GROUP BY 1
"""


#: fixed centering epoch for trend x-values: 2024-01-01T00:00:00Z in epoch
#: seconds. Centering keeps the decimal cross-products far from precision
#: limits WITHOUT a data-dependent pass (a computed min would have to be
#: replicated bit-exactly in the oracle).
TREND_EPOCH_S = 1_704_067_200


def group_ols_trend(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key least-squares trend of ``value`` over time: slope (per DAY)
    and intercept (value at the centering epoch), exactly.

    Closed-form simple OLS from five sufficient statistics
    ``n, Σx, Σy, Σxy, Σx²`` — all map-side-combinable, one shuffle total
    (this is what ``regr_slope`` computes, but the built-in accumulates
    doubles whose partition-order dependence breaks bit-reproducibility;
    here the sums are DECIMAL-exact, so the fit is identical under any
    partitioning and matches DuckDB bit-for-bit).

    x = epoch seconds - TREND_EPOCH_S (integer), y = value as
    DECIMAL(20,6). Magnitude budget: |x| < 2^31 for a ±60-year window,
    Σx² < 1e31 at a trillion rows/key — inside DECIMAL(38).
    Degenerate keys (all x equal) yield null slope/intercept.
    """
    # integer div, not double-divide-then-cast: a quotient a hair under the
    # next integer can round UP as a double, flooring to the wrong second
    x = F.expr(f"unix_micros({ts_col}) div 1000000") - F.lit(TREND_EPOCH_S)
    xd = x.cast("decimal(18,0)")
    yd = F.col(value_col).cast("decimal(20,6)")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    n = F.col("n_rows").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    det = n * sxx - sx * sx
    slope_s = (n * sxy - sx * sy) / F.when(det != 0, det)
    return agg.select(
        *key_cols,
        "n_rows",
        (slope_s * F.lit(86400.0)).alias("slope_per_day"),
        ((sy - slope_s * sx) / n).alias("intercept"),
    )


def group_ols_trend_sql(relation: str, key_expr: str, ts_expr: str, value_expr: str) -> str:
    """DuckDB twin of ``group_ols_trend`` — identical decimal sums and the
    same double-arithmetic order for the final divisions."""
    x = f"(CAST(epoch_us({ts_expr}) // 1000000 AS BIGINT) - {TREND_EPOCH_S})"
    return f"""
WITH sums AS (
  SELECT {key_expr} AS k,
         count(*) AS n_rows,
         sum(CAST({x} AS DECIMAL(18,0))) AS sx,
         sum(CAST({value_expr} AS DECIMAL(20,6))) AS sy,
         sum(CAST({x} AS DECIMAL(18,0)) * CAST({value_expr} AS DECIMAL(20,6))) AS sxy,
         sum(CAST({x} AS DECIMAL(18,0)) * CAST({x} AS DECIMAL(18,0))) AS sxx
  FROM {relation} GROUP BY 1
)
SELECT k AS {key_expr}, n_rows,
       ((CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0
                THEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END))
       * 86400.0 AS slope_per_day,
       (CAST(sy AS DOUBLE)
        - ((CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0
                   THEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END))
          * CAST(sx AS DOUBLE))
       / CAST(n_rows AS DOUBLE) AS intercept
FROM sums
"""


__all__ = [
    "mad_outliers",
    "mad_outliers_sql",
    "group_ols_trend",
    "group_ols_trend_sql",
    "TREND_EPOCH_S",
]
