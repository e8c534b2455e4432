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
    approx: bool = False,
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
    one task and is the oracle-checkable yardstick; ``approx=True`` is
    the 100 TB production path — ``approx_percentile`` medians, same
    plan shape, mergeable GK sketch with bounded memory per group. Both
    paths are benched each round (SCALE.md "Exact-yardstick vs approx-
    production pairs").
    """
    pct = "approx_percentile" if approx else "percentile"
    v = F.col(value_col).cast("double")
    med = df.groupBy(*key_cols).agg(
        F.expr(f"{pct}({value_col}, 0.5)").cast("double").alias("med")
    )
    dev = df.join(F.broadcast(med), on=key_cols).withColumn(
        "__adev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.expr(f"{pct}(__adev, 0.5)").cast("double").alias("mad"),
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


def equi_depth_histogram(
    df: DataFrame, value_col: str, num_bins: int
) -> DataFrame:
    """Equi-depth (quantile) histogram: bin boundaries at the exact
    ``i/num_bins`` percentiles, rows assigned by boundary comparisons.

    The feature-binning primitive (quantile bucketing for embeddings /
    monotone feature transforms / drift monitors): unlike equi-WIDTH bins,
    every bin holds ~the same row count regardless of skew. Output:
    (bin, n_rows, lo, hi) per occupied bin.

    Plan: one aggregation produces the boundary ARRAY in a single row,
    broadcast to a map-side comparison (``bin = #{boundaries < v}``), then
    a map-combined group count — two scans, no wide exchange of data rows.
    Exact ``percentile`` is the oracle yardstick; swap
    ``approx_percentile`` in at 100 TB for a one-pass mergeable sketch
    (the quantiles/quantiles_approx pairing; both sides benched — see
    SCALE.md "Exact-yardstick vs approx-production pairs").
    """
    fracs = ", ".join(str(i / num_bins) for i in range(1, num_bins))
    v = F.col(value_col).cast("double")
    bnds = df.agg(
        F.expr(f"percentile({value_col}, array({fracs}))").alias("__bnds")
    )
    binned = df.join(F.broadcast(bnds)).withColumn(
        "bin",
        F.size(F.filter(F.col("__bnds"), lambda b: v > b)).cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    )


def equi_depth_histogram_sql(
    relation: str, value_expr: str, num_bins: int
) -> str:
    """DuckDB twin: quantile_cont boundaries (bit-identical interpolation
    with Spark's percentile) + the same strict-greater bin rule."""
    fracs = ", ".join(str(i / num_bins) for i in range(1, num_bins))
    return f"""
WITH b AS (SELECT quantile_cont({value_expr}, [{fracs}]) AS bnds FROM {relation})
SELECT CAST(len(list_filter(b.bnds, x -> CAST({value_expr} AS DOUBLE) > x)) AS INTEGER) AS bin,
       count(*) AS n_rows,
       min(CAST({value_expr} AS DOUBLE)) AS lo,
       max(CAST({value_expr} AS DOUBLE)) AS hi
FROM {relation}, b
GROUP BY 1
"""


def corr_matrix(
    df: DataFrame, cols: List[str], decimals: str = "decimal(18,2)"
) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in long form
    (col_x, col_y, corr, n_rows), decimal-exact sufficient statistics.

    One map-combined aggregation computes every Σx and Σxy (k + k(k+1)/2
    decimal sums for k columns — one row total); correlations derive from
    the closed form in double with a fixed operation order, so results are
    bit-stable under any partitioning and identical in DuckDB. The built-in
    ``corr`` accumulates doubles partition-order-dependently and cannot
    make that promise.

    ``decimals`` carries two contracts: (1) x*y products must stay under
    DECIMAL(38) in both engines; (2) the SUM's unscaled integer should
    stay below 2^53 so the final decimal->double conversion is a single
    correctly-rounded step on BOTH engines — above that, DuckDB's
    value/10^scale conversion and the JVM's BigDecimal.doubleValue can
    differ in the last ulp. The default (18,2) is exact for 2-dp measures
    and keeps scale-4 product sums inside 2^53 up to ~1e11 magnitude;
    raise the scale for finer-grained inputs and accept ulp-level
    cross-engine drift, or keep sums small by pre-scaling.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    d = [F.col(c).cast(decimals) for c in cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(d[i]).alias(f"s_{i}"))
        for j in range(i, len(cols)):
            aggs.append(F.sum(d[i] * d[j]).alias(f"p_{i}_{j}"))
    sums = df.agg(*aggs)

    def _corr(i: int, j: int):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{i}").cast("double"), F.col(f"s_{j}").cast("double")
        sxy = F.col(f"p_{i}_{j}").cast("double")
        sxx, syy = F.col(f"p_{i}_{i}").cast("double"), F.col(f"p_{j}_{j}").cast("double")
        num = n * sxy - sx * sy
        dx = F.sqrt(n * sxx - sx * sx)
        dy = F.sqrt(n * syy - sy * sy)
        # zero-variance guard: Spark's x/0.0 yields NULL while DuckDB
        # yields inf/NaN — gate both engines on the same CASE so a
        # constant column gives NULL corr everywhere (mirrors the
        # det != 0 guard in group_ols_trend)
        return F.when((dx != 0) & (dy != 0), num / dx / dy)

    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                _corr(i, j).alias("corr"),
                F.col("n").alias("n_rows"),
            )
            for i in range(len(cols))
            for j in range(i + 1, len(cols))
        ]
    )
    return sums.select(F.explode(pairs).alias("__p")).select(
        "__p.col_x", "__p.col_y", "__p.corr", "__p.n_rows"
    )


def corr_matrix_sql(
    relation: str, cols: List[str], decimals: str = "DECIMAL(18,2)"
) -> str:
    """DuckDB twin of ``corr_matrix`` — same decimal sums, same double
    operation order, same long-form output.

    One multiplication operand is widened by a single digit: DuckDB
    executes a (18,s)x(18,s) product in int64 physical storage and
    overflows at runtime, while (19,s)x(18,s) promotes to int128 and
    yields the same (37, 2s) result type Spark derives — identical exact
    values on both sides."""
    import re

    m = re.match(r"DECIMAL\((\d+),(\d+)\)", decimals, re.IGNORECASE)
    assert m, f"decimals must look like DECIMAL(p,s), got {decimals}"
    wide = f"DECIMAL({int(m.group(1)) + 1},{m.group(2)})"
    sums = ["count(*) AS n"]
    for i, c in enumerate(cols):
        sums.append(f"sum(CAST({c} AS {decimals})) AS s_{i}")
        for j in range(i, len(cols)):
            sums.append(
                f"sum(CAST({c} AS {wide}) * CAST({cols[j]} AS {decimals}))"
                f" AS p_{i}_{j}"
            )
    arms = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = (
                f"(CAST(n AS DOUBLE) * CAST(p_{i}_{j} AS DOUBLE)"
                f" - CAST(s_{i} AS DOUBLE) * CAST(s_{j} AS DOUBLE))"
            )
            dx = (
                f"sqrt(CAST(n AS DOUBLE) * CAST(p_{i}_{i} AS DOUBLE)"
                f" - CAST(s_{i} AS DOUBLE) * CAST(s_{i} AS DOUBLE))"
            )
            dy = (
                f"sqrt(CAST(n AS DOUBLE) * CAST(p_{j}_{j} AS DOUBLE)"
                f" - CAST(s_{j} AS DOUBLE) * CAST(s_{j} AS DOUBLE))"
            )
            arms.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y, "
                f"CASE WHEN {dx} <> 0 AND {dy} <> 0 "
                f"THEN {num} / {dx} / {dy} END AS corr, "
                f"n AS n_rows FROM sums"
            )
    arms_sql = "\nUNION ALL\n".join(arms)
    return f"""
WITH sums AS (SELECT {', '.join(sums)} FROM {relation})
{arms_sql}
"""


__all__ = [
    "mad_outliers",
    "mad_outliers_sql",
    "group_ols_trend",
    "group_ols_trend_sql",
    "TREND_EPOCH_S",
    "equi_depth_histogram",
    "equi_depth_histogram_sql",
    "corr_matrix",
    "corr_matrix_sql",
]


def trimmed_stats(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    decimals: str = "decimal(18,2)",
    approx: bool = False,
) -> DataFrame:
    """Per-key trimmed statistics: exact percentile fences at ``lo``/``hi``
    and the mean of only the values inside them — the robust-mean
    monitor that a handful of corrupt readings cannot move.

    Plan (100 TB posture): one key-aggregation for the fences (the per-key
    table is segments-sized, KB), broadcast it back, then one map-combined
    aggregation over the fenced scan — the value data itself never
    shuffles. The trimmed sum accumulates in DECIMAL (order-independent,
    engine-exact); the single mean division happens once per key in
    double. Exact ``percentile`` buffers per-group values and is the
    oracle yardstick; ``approx=True`` swaps in mergeable
    ``approx_percentile`` fences — the 100 TB path, benched alongside
    the exact form each round (SCALE.md "Exact-yardstick vs
    approx-production pairs").

    Output: ``key_cols..., p_lo, p_hi, trimmed_mean, n_kept, n_clipped``.
    """
    pct = "approx_percentile" if approx else "percentile"
    fences = df.groupBy(*key_cols).agg(
        F.expr(f"{pct}({value_col}, {lo!r})").cast("double").alias("p_lo"),
        F.expr(f"{pct}({value_col}, {hi!r})").cast("double").alias("p_hi"),
    )
    v = F.col(value_col)
    inside = (v >= F.col("p_lo")) & (v <= F.col("p_hi"))
    return (
        df.join(F.broadcast(fences), on=key_cols)
        .groupBy(*key_cols)
        .agg(
            F.first("p_lo").alias("p_lo"),
            F.first("p_hi").alias("p_hi"),
            (
                F.sum(F.when(inside, v.cast(decimals))).cast("double")
                / F.sum(F.when(inside, F.lit(1)))
            ).alias("trimmed_mean"),
            F.sum(F.when(inside, F.lit(1)).otherwise(F.lit(0))).alias("n_kept"),
            F.sum(F.when(inside, F.lit(0)).otherwise(F.lit(1))).alias("n_clipped"),
        )
    )


def trimmed_stats_sql(
    relation: str,
    key_expr: str,
    value_expr: str,
    lo: float = 0.05,
    hi: float = 0.95,
    decimals: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB twin of ``trimmed_stats`` (quantile_cont fences, decimal sum)."""
    return f"""
WITH fences AS (
  SELECT {key_expr} AS k,
         quantile_cont({value_expr}, {lo!r}) AS p_lo,
         quantile_cont({value_expr}, {hi!r}) AS p_hi
  FROM {relation} GROUP BY 1
)
SELECT {key_expr} AS k, f.p_lo, f.p_hi,
       CAST(sum(CASE WHEN {value_expr} BETWEEN f.p_lo AND f.p_hi
                     THEN CAST({value_expr} AS {decimals}) END) AS DOUBLE)
         / sum(CASE WHEN {value_expr} BETWEEN f.p_lo AND f.p_hi
               THEN 1 END) AS trimmed_mean,
       CAST(sum(CASE WHEN {value_expr} BETWEEN f.p_lo AND f.p_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN {value_expr} BETWEEN f.p_lo AND f.p_hi
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_clipped
FROM {relation} t JOIN fences f ON {key_expr} = f.k
GROUP BY 1, f.p_lo, f.p_hi
"""


def chi_square_cells(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Chi-square contingency cells for two categorical columns — the
    data-quality association test ("did label distribution shift with
    source?"). Emits one row per (a, b) cell with observed count,
    expected count under independence, and the cell's chi-square
    contribution; the statistic is their sum (left to the consumer: a
    sum of doubles is partition-order-dependent, per-cell rows are not).

    Every arithmetic step (cast → multiply → divide → subtract → square)
    is a single correctly-rounded IEEE operation on exact integer
    inputs, so cells are bit-identical across engines and partitionings.

    Plan: one map-combined count aggregation over the scan, then
    row/column totals derived FROM the cell table (cells-sized, tiny —
    never the scan again), broadcast-joined back. One data shuffle total.
    """
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("observed"))
    row_tot = cells.groupBy(col_a).agg(F.sum("observed").alias("__ra"))
    col_tot = cells.groupBy(col_b).agg(F.sum("observed").alias("__cb"))
    grand = cells.agg(F.sum("observed").alias("__n"))
    expected = (
        F.col("__ra").cast("double") * F.col("__cb").cast("double")
        / F.col("__n").cast("double")
    )
    return (
        cells.join(F.broadcast(row_tot), col_a)
        .join(F.broadcast(col_tot), col_b)
        .crossJoin(F.broadcast(grand))
        .withColumn("expected", expected)
        .withColumn("__d", F.col("observed") - F.col("expected"))
        # explicit d*d, not pow(d, 2): pow's rounding is not pinned down
        # across libm implementations, a plain multiply is
        .withColumn("contribution", F.col("__d") * F.col("__d") / F.col("expected"))
        .select(col_a, col_b, "observed", "expected", "contribution")
    )


def chi_square_cells_sql(relation: str, col_a: str, col_b: str) -> str:
    """DuckDB twin of ``chi_square_cells``."""
    return f"""
WITH cells AS (
  SELECT {col_a}, {col_b}, count(*) AS observed
  FROM {relation} GROUP BY 1, 2
),
rt AS (SELECT {col_a}, sum(observed) AS ra FROM cells GROUP BY 1),
ct AS (SELECT {col_b}, sum(observed) AS cb FROM cells GROUP BY 1),
g AS (SELECT sum(observed) AS n FROM cells),
e AS (
  SELECT c.{col_a}, c.{col_b}, c.observed,
         CAST(rt.ra AS DOUBLE) * CAST(ct.cb AS DOUBLE) / CAST(g.n AS DOUBLE)
           AS expected
  FROM cells c
  JOIN rt ON c.{col_a} = rt.{col_a}
  JOIN ct ON c.{col_b} = ct.{col_b}
  CROSS JOIN g
)
SELECT {col_a}, {col_b}, CAST(observed AS BIGINT) AS observed, expected,
       (observed - expected) * (observed - expected) / expected AS contribution
FROM e
"""


def profile_numeric(
    df: DataFrame, cols: List[str], decimals: str = "decimal(25,6)"
) -> DataFrame:
    """Column-profile summary for numeric columns: one row per column
    with row/null/distinct counts, min, max, and a decimal-exact mean —
    the data-quality snapshot a pipeline runs on every new partition
    of training data before using it.

    ONE scan: all per-column aggregates compute in a single aggregation
    (multiple exact ``count(DISTINCT)``s plan via Expand — rows duplicate
    per distinct column, the deliberate cost of exactness; swap
    ``approx_count_distinct`` at 100 TB where ±2% is fine — both sides
    benched, SCALE.md "Exact-yardstick vs approx-production pairs"),
    then the one-row wide result unpivots driver-free via ``stack``.

    Output: ``column, n_rows, n_nulls, n_distinct, min, max, mean``.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            (
                F.sum(F.col(c).cast(decimals)).cast("double")
                / F.count(F.col(c))
            ).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__dist, {c}__min, {c}__max, {c}__mean"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min, max, mean)"
        )
    )


def profile_numeric_sql(
    relation: str, cols: List[str], decimals: str = "DECIMAL(25,6)"
) -> str:
    """DuckDB twin of ``profile_numeric`` (UNION ALL of per-column rows)."""
    parts = [
        f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min, CAST(max({c}) AS DOUBLE) AS max,
       CAST(sum(CAST({c} AS {decimals})) AS DOUBLE) / count({c}) AS mean
FROM {relation}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


#: the MAD→sigma consistency constant for normal data (1/Phi^-1(3/4))
MAD_SIGMA = 1.4826


def robust_scale(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """Per-row robust z-score: ``(x - median) / (1.4826 * MAD)`` within
    each key — the outlier-immune feature standardization (a handful of
    corrupt readings cannot move the center or the scale, unlike
    mean/stddev scaling).

    The transform counterpart of ``mad_outliers``: same two KB-sized
    per-key stat aggregations broadcast back, then a pure-expression map
    over the scan — the value data never shuffles. Keys with MAD = 0
    (constant majority) yield NULL rather than ±inf. Every arithmetic
    step is one correctly-rounded IEEE op on engine-identical inputs, so
    scores are bit-stable across engines.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), on=key_cols).withColumn(
        "__adev", F.abs(v - F.col("__med"))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.expr("percentile(__adev, 0.5)").alias("__mad"),
        F.first("__med").alias("__med"),
    )
    scaled = df.join(F.broadcast(mad), on=key_cols).withColumn(
        out_col,
        F.when(
            F.col("__mad") > 0,
            (v - F.col("__med")) / (F.lit(MAD_SIGMA) * F.col("__mad")),
        ),
    )
    return scaled.drop("__med", "__mad")


def robust_scale_sql(
    relation: str, key_expr: str, value_expr: str, out_col: str = "robust_z"
) -> str:
    """DuckDB twin of ``robust_scale`` — emits all source columns plus
    ``out_col``."""
    return f"""
WITH med AS (
  SELECT {key_expr} AS k, quantile_cont({value_expr}, 0.5) AS med
  FROM {relation} GROUP BY 1
),
mad AS (
  SELECT t.{key_expr} AS k,
         quantile_cont(abs(CAST(t.{value_expr} AS DOUBLE) - med.med), 0.5)
           AS mad,
         any_value(med.med) AS med
  FROM {relation} t JOIN med ON t.{key_expr} = med.k
  GROUP BY 1
)
SELECT t.*,
       CASE WHEN mad.mad > 0
            THEN (CAST(t.{value_expr} AS DOUBLE) - mad.med)
                 / ({MAD_SIGMA!r} * mad.mad)
       END AS {out_col}
FROM {relation} t JOIN mad ON t.{key_expr} = mad.k
"""


def fill_with_group_median(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    out_col: str = None,
) -> DataFrame:
    """Null imputation with the per-key exact median of the non-null
    values — the standard robust missing-value fill for feature columns
    (mean imputation drags toward outliers; the median does not).

    Same plan family as ``robust_scale``: one KB-sized per-key stat
    aggregation broadcast back, then a pure-expression ``coalesce`` over
    the scan. A key with NO non-null values keeps its nulls (the honest
    outcome; a global-median fallback would silently fabricate scale).
    The fill copies an engine-identical median — no arithmetic, so the
    imputed column is bit-stable across engines. Exact ``percentile`` is
    the oracle yardstick; swap ``approx_percentile`` at 100 TB.
    """
    out_col = out_col or value_col
    med = df.where(F.col(value_col).isNotNull()).groupBy(*key_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    filled = df.join(F.broadcast(med), on=key_cols, how="left").withColumn(
        out_col, F.coalesce(F.col(value_col).cast("double"), F.col("__med"))
    )
    return filled.drop("__med")


def fill_with_group_median_sql(
    relation: str, key_expr: str, value_expr: str, out_col: str = "filled"
) -> str:
    """DuckDB twin of ``fill_with_group_median`` — emits all source
    columns plus ``out_col``."""
    return f"""
WITH med AS (
  SELECT {key_expr} AS k, quantile_cont({value_expr}, 0.5) AS med
  FROM {relation} WHERE {value_expr} IS NOT NULL GROUP BY 1
)
SELECT t.*, coalesce(CAST(t.{value_expr} AS DOUBLE), med.med) AS {out_col}
FROM {relation} t LEFT JOIN med ON t.{key_expr} = med.k
"""


def cdf_normalize(
    df: DataFrame,
    key_cols: List[str],
    value_col: str,
    out_col: str = "cdf",
) -> DataFrame:
    """Per-key empirical-CDF feature transform: each value's
    ``percent_rank`` within its key — rank-normalization to [0, 1],
    immune to any monotone distortion of the raw scale (the transform
    GBDT/quantile models want).

    Plan (no per-key window — survives LOW key cardinality at scale,
    where ``Window.partitionBy(key)`` caps parallelism at the number of
    distinct keys and one task sorts a whole key's rows): the table
    moves exactly ONCE through ``plans/prefix.with_keyed_min_rank`` —
    one range exchange on ``(key..., value)`` at full parallelism, an
    O(num_partitions) boundary-summary collect, driver-side offset
    chaining, and a map-only Arrow pass that assigns every row its
    within-key min-rank and key total. ``(rank-1)/(n-1)`` is then a
    single double division (bit-identical to both engines'
    ``percent_rank``) as a pure expression — no join-back. The previous
    plan (distinct counts → global prefix sum → per-key offset join →
    join back on ``(key..., value)``) moved the table ~2.5× through 9
    exchanges; this one moves it once (SCALE.md "cdf_normalize
    single-exchange re-plan").

    Ties share a rank by construction. Single-value keys yield 0.0
    (rank 1 of 1), matching ``percent_rank``. NULL values count toward
    ``n`` and occupy the lowest ranks (Spark's nulls-first sort order)
    but get a NULL ``out_col`` themselves; the DuckDB oracle twin
    diverges on NULL values (NULLS LAST) exactly as the window form
    did, so the oracle contract stays "non-null value column".

    Float NaN is normalized to NULL up front (NULL ``out_col``, counts
    toward ``n`` like a missing value): ``with_keyed_min_rank``'s Arrow
    pass cannot tell SQL NULL from NaN in a float64 frame (its
    documented no-NaN contract), while Spark's own sort order would put
    NaN LAST — silently mixing the two would corrupt neighboring ranks.
    Treat-as-missing is the explicit, deterministic choice. NOTE this
    means ``value_col`` in the RETURNED frame carries NULL where the
    input had NaN — not an incidental implementation detail but the
    only representable outcome: the Arrow crossing in the rank pass
    renders every float payload column through pandas float64, whose
    sole missing sentinel is NaN, so NaN→NULL on the way back happens
    to ANY float column regardless of up-front normalization (ranking
    on a hidden normalized copy was tried and measured: same output,
    plus a duplicate float column through the range exchange).
    """
    from ..plans.prefix import with_keyed_min_rank

    # Resolve value_col to its ACTUAL schema name the way Spark does
    # (exact match wins, else a unique case-insensitive one): a plain
    # dict(df.dtypes) lookup would silently skip the NaN normalization
    # for a value_col differing only in case (violating
    # with_keyed_min_rank's no-NaN contract), and the rank pass's pandas
    # frame indexes columns case-SENSITIVELY by the schema name.
    fields = df.schema.fields
    matches = [f for f in fields if f.name == value_col] or [
        f for f in fields if f.name.lower() == value_col.lower()
    ]
    dtype = matches[0].dataType.simpleString() if len(matches) == 1 else None
    if len(matches) == 1:
        value_col = matches[0].name
    if dtype in ("float", "double"):
        df = df.withColumn(
            value_col,
            F.when(F.isnan(F.col(value_col)), F.lit(None)).otherwise(
                F.col(value_col)
            ),
        )
    ranked = with_keyed_min_rank(
        df, list(key_cols), value_col, rank_col="__rank", n_col="__n"
    )
    out = ranked.withColumn(
        out_col,
        F.when(F.col(value_col).isNull(), F.lit(None).cast("double"))
        .when(
            F.col("__n") > 1,
            (F.col("__rank") - 1).cast("double")
            / (F.col("__n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0)),
    )
    return out.drop("__rank", "__n")


def cdf_normalize_sql(
    relation: str, key_expr: str, value_expr: str, out_col: str = "cdf"
) -> str:
    """DuckDB twin of ``cdf_normalize``."""
    return f"""
SELECT t.*,
       percent_rank() OVER (PARTITION BY {key_expr} ORDER BY {value_expr} ASC)
         AS {out_col}
FROM {relation} t
"""
