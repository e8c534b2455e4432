"""Statistics, drift, sketch-audit, and layout-audit queries.

Split verbatim from the single-file queries.py (round 11) so the
per-domain modules stay small; QUERIES / ORACLE_SQL in the package
__init__ are the only public surface. Block order within this module
preserves the original file order (two-stage SQL template/finalize
assignments depend on it).
"""

from __future__ import annotations
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ml_hadoop_experiment_spark.functions.hashing import (
    portable_unit_hash_sql,
)
from ml_hadoop_experiment_spark.operators.inference import with_inference_column
from ml_hadoop_experiment_spark.operators.sampling import sample_with_predicate
from ml_hadoop_experiment_spark.operators.vocabulary import vocabulary_dataframe
# --------------------------------------------------------------------------
# A4/A5: bootstrap metric evaluation (scalable Poisson form; the exact
# multinomial port is operators/bootstrap.evaluate_bootstrap, unit-tested).
# --------------------------------------------------------------------------

from ml_hadoop_experiment_spark.operators.bootstrap import (
    poisson_bootstrap_metrics,
    poisson_bootstrap_metrics_sql,
)
# ==========================================================================
# Extension queries (BASELINE.json north-star): text analysis, dedup,
# similarity search, multimodal plumbing.
# ==========================================================================

from ml_hadoop_experiment_spark.functions import text as TX
from ml_hadoop_experiment_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_sql,
    tokens_frame,
)
from ml_hadoop_experiment_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
)
from ml_hadoop_experiment_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_bucket_sql,
    lsh_bucketed,
)
from ml_hadoop_experiment_spark.queries._shared import _t  # noqa: E501




def q_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count est-vs-truth audit
    (operators/hll.hll_audit): o_orderkey cardinality from 256
    one-byte registers whose exchange is bounded by m = 2^8 rows
    regardless of corpus size — the third sketch family next to KMV
    and Count-Min. The oracle replays the ENTIRE estimator (nibble
    decoding, exact-integer harmonic sum, correction branch) in
    DuckDB, so the driver gate checks the estimate bit-for-bit."""
    from ml_hadoop_experiment_spark.operators.hll import hll_audit

    orders = _t(spark, sf_dir, "orders")
    return hll_audit(orders, F.col("o_orderkey"), p=8)


def _sql_hll_audit() -> str:
    from ml_hadoop_experiment_spark.operators.hll import hll_audit_sql

    return hll_audit_sql("orders", "o_orderkey", p=8)


SQL_HLL_AUDIT = _sql_hll_audit()


# --------------------------------------------------------------------------
# Extension: exact interpolated percentiles (sort-based aggregation — absent
# from the reference; Spark `percentile` and DuckDB `quantile_cont` share the
# linear-interpolation-at-(n-1)p definition, so results are bit-comparable).
# At 100 TB the production path is approx_percentile (t-digest, one pass,
# mergeable); this exact form is the oracle gate for it.
# --------------------------------------------------------------------------


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: REVERTED to the builtin `percentile` aggregate. The r13
    # range-exchange helper (plans/percentiles.exact_group_percentiles)
    # won in isolated probes (1.31 s) but regressed ~5x in BOTH of the
    # driver's independent sweeps (9.44 s quiet 8-core / 10.30 s noisy
    # 32-core vs 2.0 s on this builtin in r12) — the r13 verdict's #1
    # item. The builtin's 3 per-group value buffers merge in 3 parallel
    # reducer tasks at this group cardinality; it is also lazy and
    # composable where the helper was an eager driver-materialized
    # collect. feature_hist keeps the helper (independently verified
    # faster there: 3.30 -> 2.13 s in the same driver record).
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production percentile path, hash-gated: ``approx_percentile``
    (Greenwald-Khanna summaries — bounded memory, mergeable partials, one
    pass; the plan that survives 100 TB where exact ``percentile``'s
    per-group value buffering does not) checked to be within 1% relative
    error of the exact interpolated percentile.

    The output is the exact p50/p95 (rounded, bit-comparable to DuckDB's
    ``quantile_cont``) plus within-tolerance booleans: the oracle emits the
    same exact values and TRUE constants, so the driver's hash gate fails
    iff the sketch drifts out of tolerance. The exact aggregate exists here
    only as the yardstick — ``bench.py`` times the approx-only plan
    separately as ``quantiles_approx``."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ep"),
    )
    # the exact values pass through unrounded: Spark `percentile` and DuckDB
    # `quantile_cont` are bit-identical, while round-to-2dp diverges on
    # half-way doubles (observed at sf0.001)
    return agg.select(
        "l_returnflag",
        F.col("ep")[0].alias("p50_exact"),
        F.col("ep")[1].alias("p95_exact"),
        (F.abs(F.col("ap")[0] - F.col("ep")[0]) <= 0.01 * F.abs(F.col("ep")[0]))
        .alias("p50_within_tol"),
        (F.abs(F.col("ap")[1] - F.col("ep")[1]) <= 0.01 * F.abs(F.col("ep")[1]))
        .alias("p95_within_tol"),
    )


SQL_QUANTILES_APPROX = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
       quantile_cont(l_extendedprice, 0.95) AS p95_exact,
       TRUE AS p50_within_tol,
       TRUE AS p95_within_tol
FROM lineitem
GROUP BY l_returnflag
"""


def q_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier summary: exact median, MAD, and the
    count of values beyond 3 MADs — the data-quality monitor that is
    immune to the outliers it hunts. Value data never shuffles: two
    map-combined key aggregations plus broadcast joins of the per-key
    stats tables (KB-sized at any corpus scale)."""
    from ml_hadoop_experiment_spark.operators.stats import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, ["event_type"], "value", n_mads=3.0)


def _sql_outlier_stats() -> str:
    from ml_hadoop_experiment_spark.operators.stats import mad_outliers_sql

    return mad_outliers_sql("events", "event_type", "value", n_mads=3.0)


SQL_OUTLIER_STATS = _sql_outlier_stats()


def q_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (slope per day +
    intercept at the 2024-01-01 centering epoch) from decimal-exact
    sufficient statistics — regr_slope semantics but bit-reproducible
    under any partitioning, one map-combined shuffle."""
    from ml_hadoop_experiment_spark.operators.stats import group_ols_trend

    ev = _t(spark, sf_dir, "events")
    return group_ols_trend(ev, ["event_type"], "ts", "value")


def _sql_segment_trend() -> str:
    from ml_hadoop_experiment_spark.operators.stats import group_ols_trend_sql

    return group_ols_trend_sql("events", "event_type", "ts", "value")


SQL_SEGMENT_TREND = _sql_segment_trend()


#: Z-order dims for the orders layout query: generous fixed domains so the
#: same query is meaningful at every scale factor (out-of-domain clamps).
_ZDIMS = [("o_custkey", 0.0, 150_000.0), ("o_totalprice", 0.0, 600_000.0)]


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: bucket orders by the top byte of
    the 2x16-bit interleaved (o_custkey, o_totalprice) z-value and report
    each bucket's bounding box. Tight per-bucket min/max on BOTH dims is
    exactly what makes z-clustered files prunable on either predicate —
    the data-skipping layout for 100 TB scans (plans/layout.py)."""
    from ml_hadoop_experiment_spark.plans.layout import zorder_value

    orders = _t(spark, sf_dir, "orders")
    z = zorder_value(
        [(F.col(c), lo, hi) for (c, lo, hi) in _ZDIMS], bits=16
    )
    return (
        orders.withColumn("z_bucket", F.shiftright(z, 24))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


def _sql_zorder_stats() -> str:
    from ml_hadoop_experiment_spark.plans.layout import zorder_value_sql

    z = zorder_value_sql(_ZDIMS, bits=16)
    return f"""
SELECT ({z} >> 24) AS z_bucket,
       count(*) AS n_rows,
       min(o_custkey) AS min_custkey,
       max(o_custkey) AS max_custkey,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY 1
"""


SQL_ZORDER_STATS = _sql_zorder_stats()


def q_hilbert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering audit (plans/hilbert.py): bucket orders
    by the top 8 bits of the 2x6-bit Hilbert position of
    (o_custkey, o_totalprice) and report each bucket's bounding box —
    the same audit shape as zorder_stats on the same dims, so the two
    layouts' per-bucket tightness is directly comparable. The curve is
    a driver-built 4096-entry lookup evaluated as one literal-array
    element_at per row (map-only; unrolling the xy2d rotation loop as
    expressions would explode under projection collapse — see the
    module docstring)."""
    from ml_hadoop_experiment_spark.plans.hilbert import hilbert_value_expr

    orders = _t(spark, sf_dir, "orders")
    h = hilbert_value_expr(
        [(F.col(c), lo, hi) for (c, lo, hi) in _ZDIMS], bits=6
    )
    return (
        orders.withColumn("h_bucket", F.shiftright(h, 4))
        .groupBy("h_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


def _sql_hilbert_stats() -> str:
    from ml_hadoop_experiment_spark.plans.hilbert import hilbert_value_sql

    h = hilbert_value_sql(_ZDIMS, bits=6)
    return f"""
SELECT ({h} >> 4) AS h_bucket,
       count(*) AS n_rows,
       min(o_custkey) AS min_custkey,
       max(o_custkey) AS max_custkey,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY 1
"""


SQL_HILBERT_STATS = _sql_hilbert_stats()


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift report (operators/drift.psi_report):
    per-bin PSI terms between purchase-event and view-event value
    distributions on a shared 20-bin [0, 500) grid with add-one
    smoothing — the continuous-column sibling of chi_square for
    ingestion monitoring; sum(psi_term) is the headline index and the
    per-bin frame shows WHICH region of the distribution moved. Two
    map-side binned counts (each exchange bounded by n_bins), one
    tiny full-outer join, pure arithmetic after."""
    from ml_hadoop_experiment_spark.operators.drift import psi_report

    ev = _t(spark, sf_dir, "events")
    return psi_report(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "view"),
        "value", lo=0.0, hi=500.0, n_bins=20,
    )


def _sql_psi_drift() -> str:
    from ml_hadoop_experiment_spark.operators.drift import psi_report_sql

    return psi_report_sql(
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "(SELECT * FROM events WHERE event_type = 'view')",
        "value", lo=0.0, hi=500.0, n_bins=20,
    )


SQL_PSI_DRIFT = _sql_psi_drift()


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift
    (operators/drift.ks_statistic): max CDF gap between purchase and
    view event values — the grid-free exact member of the drift
    family (chi_square categorical, psi_drift binned, this one
    value-exact). The shuffled frames are bounded by the
    distinct-value count, never raw rows."""
    from ml_hadoop_experiment_spark.operators.drift import ks_statistic

    ev = _t(spark, sf_dir, "events")
    return ks_statistic(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "view"),
        "value",
    )


def _sql_ks_drift() -> str:
    from ml_hadoop_experiment_spark.operators.drift import ks_statistic_sql

    return ks_statistic_sql(
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "(SELECT * FROM events WHERE event_type = 'view')",
        "value",
    )


SQL_KS_DRIFT = _sql_ks_drift()


def q_feature_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of l_extendedprice in 10 quantile bins — the
    feature-bucketing primitive (every bin ~equal count regardless of
    skew). Boundary array computed once, inlined as a literal, map-side
    binning; exact percentile as the oracle yardstick, approx_percentile
    as the documented 100 TB path.

    r13: boundaries come from the range-exchange exact-percentile plan
    (``plans/percentiles.exact_group_percentiles`` — bit-identical to
    the builtin ``percentile`` whose single-reducer value buffer cost
    ~2.5 s at 600k near-unique doubles; 3.63 -> 1.11 s isolated) and are
    inlined into the binning projection, replacing the
    ``equi_depth_histogram`` operator's percentile-agg + crossJoin-
    broadcast subtree; bin rule (strict greater) and output identical —
    same oracle SQL, plan diff in plans/r13."""
    from ml_hadoop_experiment_spark.functions.fastexpr import double_array
    from ml_hadoop_experiment_spark.plans.percentiles import (
        exact_group_percentiles,
    )

    li = _t(spark, sf_dir, "lineitem")
    num_bins = 10
    pct, _counts = exact_group_percentiles(
        li, [], "l_extendedprice", [i / num_bins for i in range(1, num_bins)]
    )
    v = F.col("l_extendedprice").cast("double")
    binned = li.withColumn(
        "bin",
        F.size(F.filter(F.expr(double_array(pct[()])), lambda b: v > b))
        .cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    )


def _sql_feature_hist() -> str:
    from ml_hadoop_experiment_spark.operators.stats import (
        equi_depth_histogram_sql,
    )

    return equi_depth_histogram_sql("lineitem", "l_extendedprice", num_bins=10)


SQL_FEATURE_HIST = _sql_feature_hist()


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of four lineitem measures in long
    form, from decimal-exact sufficient statistics in ONE map-combined
    aggregation — bit-stable under any partitioning, unlike the
    double-accumulating corr built-in."""
    from ml_hadoop_experiment_spark.operators.stats import corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return corr_matrix(li, _CORR_COLS)


def _sql_corr_matrix() -> str:
    from ml_hadoop_experiment_spark.operators.stats import corr_matrix_sql

    return corr_matrix_sql("lineitem", _CORR_COLS)


SQL_CORR_MATRIX = _sql_corr_matrix()


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text featurization (HashingVectorizer semantics,
    signed variant): token -> portable-hash bucket in a 256-dim space,
    per-doc signed counts in COO layout. No vocabulary pass, no driver
    state, one map-combined shuffle bounded by num_features per doc."""
    from ml_hadoop_experiment_spark.operators.features import (
        hashed_term_features,
    )

    docs = _t(spark, sf_dir, "documents")
    return hashed_term_features(
        docs, "doc_id", "text", num_features=256, signed=True
    ).select(F.col("id").alias("doc_id"), "bucket", "value")


def _sql_feature_hash() -> str:
    from ml_hadoop_experiment_spark.operators.features import (
        hashed_term_features_sql,
    )

    inner = hashed_term_features_sql(
        "documents", "doc_id", "text", num_features=256, signed=True
    )
    return f"SELECT id AS doc_id, bucket, value FROM ({inner})"


SQL_FEATURE_HASH = _sql_feature_hash()


def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust mean of order totals: exact p05/p95 fences
    (broadcast back, KB-sized) and the decimal-exact mean of only the
    values inside them — the outlier-immune segment monitor."""
    from ml_hadoop_experiment_spark.operators.stats import trimmed_stats

    orders = _t(spark, sf_dir, "orders")
    out = trimmed_stats(orders, ["o_orderpriority"], "o_totalprice")
    return out.select(
        "o_orderpriority", "p_lo", "p_hi", "trimmed_mean", "n_kept", "n_clipped"
    )


def _sql_trimmed_stats() -> str:
    from ml_hadoop_experiment_spark.operators.stats import trimmed_stats_sql

    inner = trimmed_stats_sql("orders", "o_orderpriority", "o_totalprice")
    return (
        "SELECT k AS o_orderpriority, p_lo, p_hi, trimmed_mean, n_kept, "
        f"n_clipped FROM ({inner})"
    )


SQL_TRIMMED_STATS = _sql_trimmed_stats()


def q_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust missing-value fill: error events' values are treated as
    missing and imputed with the user's exact median of the remaining
    values (KB stat broadcast + pure-expression coalesce — the fill is a
    COPY, no arithmetic, so it is engine-exact)."""
    from ml_hadoop_experiment_spark.operators.stats import fill_with_group_median

    ev = _t(spark, sf_dir, "events").withColumn(
        "masked",
        F.when(F.col("event_type") != "error", F.col("value")),
    )
    out = fill_with_group_median(ev, ["user_id"], "masked", out_col="filled")
    return out.select(
        "event_id",
        "user_id",
        F.col("masked").isNull().alias("was_missing"),
        "filled",
    )


def _sql_impute_median() -> str:
    from ml_hadoop_experiment_spark.operators.stats import (
        fill_with_group_median_sql,
    )

    inner = fill_with_group_median_sql("masked_events", "user_id", "masked")
    return f"""
WITH masked_events AS (
  SELECT event_id, user_id,
         CASE WHEN event_type <> 'error' THEN value END AS masked
  FROM events
)
SELECT event_id, user_id, masked IS NULL AS was_missing, filled
FROM ({inner})
"""


SQL_IMPUTE_MEDIAN = _sql_impute_median()


def q_cdf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment empirical-CDF transform: percent_rank of the extended
    price within each return flag — rank normalization to [0,1], the
    monotone-invariant feature scaling. Deliberately keyed on a 3-value
    column: the operator computes percent_rank through the two-phase
    prefix-sum plan (plans/prefix.py), so parallelism does NOT collapse
    to the key cardinality the way a per-key sort window would (SCALE.md
    "cdf_normalize low-cardinality de-serialization"). Ties share a rank
    by construction — output is a pure function of the value multiset."""
    from ml_hadoop_experiment_spark.operators.stats import cdf_normalize

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    # project BEFORE the operator: mapInPandas is a pruning barrier, so
    # the caller-side select is what keeps the single range exchange and
    # the Arrow crossings at 4 columns instead of 16
    return cdf_normalize(li, ["l_returnflag"], "l_extendedprice")


def _sql_cdf_normalize() -> str:
    from ml_hadoop_experiment_spark.operators.stats import cdf_normalize_sql

    inner = cdf_normalize_sql("lineitem", "l_returnflag", "l_extendedprice")
    return (
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, cdf "
        f"FROM ({inner})"
    )


SQL_CDF_NORMALIZE = _sql_cdf_normalize()


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row robust z-scores of event values within each user —
    outlier-immune feature standardization ((x-median)/(1.4826*MAD)).
    Two KB-sized per-key stat broadcasts + a pure-expression map; the
    event data never shuffles."""
    from ml_hadoop_experiment_spark.operators.stats import robust_scale

    ev = _t(spark, sf_dir, "events")
    out = robust_scale(ev, ["user_id"], "value")
    return out.select("event_id", "user_id", "value", "robust_z")


def _sql_robust_scale() -> str:
    from ml_hadoop_experiment_spark.operators.stats import robust_scale_sql

    inner = robust_scale_sql("events", "user_id", "value")
    return f"SELECT event_id, user_id, value, robust_z FROM ({inner})"


SQL_ROBUST_SCALE = _sql_robust_scale()


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells between order priority and status —
    the categorical-association data-quality test. Per-cell observed /
    expected / contribution rows (every arithmetic step one correctly-
    rounded IEEE op on exact integers — bit-identical across engines);
    one data shuffle, totals derived from the tiny cell table."""
    from ml_hadoop_experiment_spark.operators.stats import chi_square_cells

    orders = _t(spark, sf_dir, "orders")
    return chi_square_cells(orders, "o_orderpriority", "o_orderstatus")


def _sql_chi_square() -> str:
    from ml_hadoop_experiment_spark.operators.stats import chi_square_cells_sql

    return chi_square_cells_sql("orders", "o_orderpriority", "o_orderstatus")


SQL_CHI_SQUARE = _sql_chi_square()


def q_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch est-vs-truth audit
    (operators/sketches.cms_topk_audit): token frequencies from a
    depth×width counter table whose exchange is bounded by depth*width
    cells regardless of corpus size. width=8 on the 31-token fixture
    vocabulary forces real collisions, so the gate exercises the
    over-count path (n_cms >= n_exact row-for-row), not a trivially
    collision-free sketch."""
    from ml_hadoop_experiment_spark.operators.cms import cms_topk_audit

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    return cms_topk_audit(toks, "tok", width=8, depth=4, k=30)


def _sql_cms_audit() -> str:
    from ml_hadoop_experiment_spark.operators.cms import cms_topk_audit_sql

    return cms_topk_audit_sql(
        "(SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))"
        " AS tok FROM documents)",
        "tok",
        width=8,
        depth=4,
        k=30,
    )


SQL_CMS_AUDIT = _sql_cms_audit()
