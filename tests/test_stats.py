"""Robust stats operators: MAD outliers + decimal-exact group OLS trend."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.stats import (
    TREND_EPOCH_S,
    group_ols_trend,
    mad_outliers,
)


class TestMadOutliers:
    def test_golden_small(self, spark):
        # key 'a': values 1..5 plus a wild 100 -> med 4.5 of [1,2,3,4,5,100]?
        # use odd count for a crisp median: [1,2,3,4,100] -> med 3, adev
        # [2,1,0,1,97] -> mad 1, outliers = |x-3| > 3 -> {100}
        pdf = pd.DataFrame(
            {"k": ["a"] * 5 + ["b"] * 3, "v": [1, 2, 3, 4, 100, 7, 7, 7]}
        )
        out = (
            mad_outliers(spark.createDataFrame(pdf), ["k"], "v")
            .toPandas()
            .set_index("k")
        )
        assert out.loc["a", "med"] == 3.0
        assert out.loc["a", "mad"] == 1.0
        assert out.loc["a", "n_outliers"] == 1
        # constant key: mad 0 -> nothing beats the strict > threshold
        assert out.loc["b", "mad"] == 0.0
        assert out.loc["b", "n_outliers"] == 0

    def test_outliers_do_not_move_the_fence(self, spark):
        """Robustness: inflating the single outlier by 100x leaves med/mad
        (and therefore the flag set) unchanged — the property stddev-based
        fences lack."""
        base = pd.DataFrame({"k": ["a"] * 101, "v": np.r_[np.arange(100), 5000.0]})
        big = base.copy()
        big.loc[100, "v"] = 500000.0
        a = mad_outliers(spark.createDataFrame(base), ["k"], "v").toPandas()
        b = mad_outliers(spark.createDataFrame(big), ["k"], "v").toPandas()
        assert a.loc[0, "med"] == b.loc[0, "med"]
        assert a.loc[0, "mad"] == b.loc[0, "mad"]
        assert a.loc[0, "n_outliers"] == b.loc[0, "n_outliers"] == 1

    def test_stats_tables_broadcast(self, spark):
        pdf = pd.DataFrame({"k": ["a", "b"] * 50, "v": np.arange(100.0)})
        plan = (
            mad_outliers(spark.createDataFrame(pdf), ["k"], "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan


class TestGroupOlsTrend:
    def _frame(self, spark, slope_per_s, intercept, n=500, noise=0.0, seed=1):
        rng = np.random.default_rng(seed)
        xs = rng.integers(0, 3_000_000, n)
        ts = [
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s)) for s in xs
        ]
        y = intercept + slope_per_s * xs + (
            rng.normal(0, noise, n) if noise else 0.0
        )
        return spark.createDataFrame(
            pd.DataFrame({"k": "a", "ts": ts, "value": y})
        )

    def test_recovers_exact_line(self, spark):
        df = self._frame(spark, slope_per_s=2e-5, intercept=10.0)
        row = group_ols_trend(df, ["k"], "ts", "value").head()
        assert row["slope_per_day"] == pytest.approx(2e-5 * 86400, rel=1e-9)
        assert row["intercept"] == pytest.approx(10.0, rel=1e-9)

    def test_partitioning_invariance(self, spark):
        """Decimal-exact sums: the fit is bit-identical regardless of how
        rows are distributed — the reason not to use double-summing
        regr_slope."""
        df = self._frame(spark, 1e-5, 5.0, noise=3.0)
        a = group_ols_trend(df.coalesce(1), ["k"], "ts", "value").head()
        b = group_ols_trend(df.repartition(32), ["k"], "ts", "value").head()
        assert a["slope_per_day"] == b["slope_per_day"]
        assert a["intercept"] == b["intercept"]

    def test_degenerate_key_yields_null(self, spark):
        one_instant = spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": ["a", "a"],
                    "ts": [dt.datetime(2024, 1, 5)] * 2,
                    "value": [1.0, 2.0],
                }
            )
        )
        row = group_ols_trend(one_instant, ["k"], "ts", "value").head()
        assert row["slope_per_day"] is None and row["intercept"] is None

    def test_single_shuffle_plan(self, spark):
        df = self._frame(spark, 1e-5, 5.0)
        plan = (
            group_ols_trend(df, ["k"], "ts", "value")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1, plan


class TestEquiDepthHistogram:
    def test_bins_near_equal_depth(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import equi_depth_histogram

        rng = np.random.default_rng(2)
        # heavy-tailed: equi-WIDTH bins would put ~everything in bin 0
        pdf = pd.DataFrame({"v": rng.lognormal(0, 2, 10_000)})
        out = equi_depth_histogram(
            spark.createDataFrame(pdf), "v", num_bins=10
        ).toPandas().sort_values("bin", ignore_index=True)
        assert len(out) == 10
        assert out["n_rows"].between(900, 1100).all()
        # bins tile the domain: consecutive lo >= previous hi
        assert (out["lo"].values[1:] >= out["hi"].values[:-1]).all()

    def test_constant_column_single_bin(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import equi_depth_histogram

        pdf = pd.DataFrame({"v": [7.0] * 50})
        out = equi_depth_histogram(
            spark.createDataFrame(pdf), "v", num_bins=4
        ).toPandas()
        assert len(out) == 1 and out.loc[0, "n_rows"] == 50


class TestCorrMatrix:
    def test_known_correlations(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import corr_matrix

        rng = np.random.default_rng(4)
        x = rng.normal(10, 2, 4000)
        pdf = pd.DataFrame({"x": x, "y": 3 * x + 1, "z": -x, "w": rng.normal(0, 1, 4000)})
        out = corr_matrix(
            spark.createDataFrame(pdf), ["x", "y", "z", "w"], decimals="decimal(18,9)"
        ).toPandas()
        got = {(r.col_x, r.col_y): r.corr for r in out.itertuples()}
        assert got[("x", "y")] == pytest.approx(1.0, abs=1e-9)
        assert got[("x", "z")] == pytest.approx(-1.0, abs=1e-9)
        assert abs(got[("x", "w")]) < 0.1
        assert len(out) == 6

    def test_partitioning_invariance(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import corr_matrix

        rng = np.random.default_rng(9)
        pdf = pd.DataFrame({"a": rng.normal(size=3000), "b": rng.normal(size=3000)})
        df = spark.createDataFrame(pdf)
        a = corr_matrix(df.coalesce(1), ["a", "b"], decimals="decimal(18,9)").head()["corr"]
        b = corr_matrix(df.repartition(32), ["a", "b"], decimals="decimal(18,9)").head()["corr"]
        assert a == b

    def test_single_aggregation_plan(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import corr_matrix

        pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [2.0, 1.0]})
        plan = (
            corr_matrix(spark.createDataFrame(pdf), ["a", "b"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1, plan

    def test_constant_column_yields_null_in_both_engines(self, spark):
        """Zero variance: Spark's x/0.0 is NULL, DuckDB's is inf — both
        engines must take the guarded CASE branch and emit NULL."""
        import duckdb

        from ml_hadoop_experiment_spark.operators.stats import (
            corr_matrix,
            corr_matrix_sql,
        )

        pdf = pd.DataFrame({"c": [5.0, 5.0, 5.0, 5.0], "v": [1.0, 2.0, 3.0, 4.0]})
        out = corr_matrix(spark.createDataFrame(pdf), ["c", "v"]).toPandas()
        assert len(out) == 1
        assert out["corr"].isna().all()

        con = duckdb.connect()
        con.register("t", pdf)
        duck = con.execute(corr_matrix_sql("t", ["c", "v"])).df()
        assert duck["corr"].isna().all()
        con.close()


class TestTrimmedStats:
    def test_fences_and_mean(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import trimmed_stats

        # values 1..10 for key "a" plus one gross outlier; fences at
        # p10/p90 clip both tails
        rows = [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = trimmed_stats(df, ["k"], "v", lo=0.10, hi=0.90).collect()[0]
        assert out["n_kept"] + out["n_clipped"] == 11
        assert out["n_clipped"] >= 2  # the outlier and at least the low tail
        # the trimmed mean is immune to the 1000.0 outlier
        assert 2.0 < out["trimmed_mean"] < 9.0
        assert out["p_hi"] < 1000.0

    def test_keys_independent(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import trimmed_stats

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 100.0), ("b", 200.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["k"]: r for r in trimmed_stats(df, ["k"], "v", 0.0, 1.0).collect()}
        assert out["a"]["trimmed_mean"] == 2.0
        assert out["b"]["trimmed_mean"] == 150.0
        assert out["a"]["n_clipped"] == 0 and out["b"]["n_clipped"] == 0


class TestChiSquareCells:
    def test_independence_gives_zero_contribution(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import chi_square_cells

        # perfectly independent 2x2: every contribution is exactly 0
        rows = [("x", "p")] * 4 + [("x", "q")] * 4 + [("y", "p")] * 4 + [("y", "q")] * 4
        df = spark.createDataFrame(rows, "a string, b string")
        out = chi_square_cells(df, "a", "b").collect()
        assert len(out) == 4
        for r in out:
            assert r["observed"] == 4
            assert r["expected"] == 4.0
            assert r["contribution"] == 0.0

    def test_dependent_cells(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import chi_square_cells

        # a==b always: strong association
        rows = [("x", "x")] * 10 + [("y", "y")] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        out = {(r["a"], r["b"]): r for r in chi_square_cells(df, "a", "b").collect()}
        # only observed diagonal cells exist; expected = 5 under independence
        assert out[("x", "x")]["expected"] == 5.0
        assert out[("x", "x")]["contribution"] == 5.0  # (10-5)^2/5


class TestProfileNumeric:
    def test_profile_values(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import profile_numeric

        df = spark.createDataFrame(
            [(1.0, 10), (2.0, 10), (None, 30)], "x double, y long"
        )
        out = {r["column"]: r for r in profile_numeric(df, ["x", "y"]).collect()}
        x = out["x"]
        assert (x["n_rows"], x["n_nulls"], x["n_distinct"]) == (3, 1, 2)
        assert (x["min"], x["max"], x["mean"]) == (1.0, 2.0, 1.5)
        y = out["y"]
        assert (y["n_rows"], y["n_nulls"], y["n_distinct"]) == (3, 0, 2)
        assert y["mean"] == 50.0 / 3


class TestRobustScale:
    def test_scores_and_outlier_immunity(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import MAD_SIGMA, robust_scale

        # 1..9 plus a gross outlier: median 5.5 -> med of 1..9,1000 is 5.5;
        # use odd layout for clean numbers: values 1..9 and 1000
        rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["v"]: r["robust_z"] for r in robust_scale(df, ["k"], "v").collect()}
        # median = 5.5, MAD = median(|x-5.5|) = median(4.5,3.5,...,0.5,994.5) = 2.5
        med, mad = 5.5, 2.5
        assert out[5.0] == (5.0 - med) / (MAD_SIGMA * mad)
        # outlier scores huge but finite; center barely moved by it
        assert out[1000.0] > 100

    def test_zero_mad_yields_null(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import robust_scale

        df = spark.createDataFrame(
            [("k", 3.0), ("k", 3.0), ("k", 3.0)], "k string, v double"
        )
        out = robust_scale(df, ["k"], "v").collect()
        assert all(r["robust_z"] is None for r in out)


class TestFillWithGroupMedian:
    def test_fills_nulls_with_key_median(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import (
            fill_with_group_median,
        )

        rows = [
            ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
            ("empty", None),
        ]
        df = spark.createDataFrame(rows, "k string, v double")
        out = fill_with_group_median(df, ["k"], "v", out_col="f").collect()
        a_vals = sorted(r["f"] for r in out if r["k"] == "a")
        assert a_vals == [1.0, 2.0, 2.0, 3.0]  # null -> median 2.0
        # a key with no observed values keeps its null
        assert [r["f"] for r in out if r["k"] == "empty"] == [None]


class TestCdfNormalize:
    def test_percent_rank_semantics(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import cdf_normalize

        rows = [("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0), ("b", 5.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = cdf_normalize(df, ["k"], "v").collect()
        a = sorted((r["v"], r["cdf"]) for r in out if r["k"] == "a")
        # ranks 1,2,2,4 of n=4 -> (r-1)/(n-1): 0, 1/3, 1/3, 1
        assert a == [(10.0, 0.0), (20.0, 1 / 3), (20.0, 1 / 3), (40.0, 1.0)]
        # single-value key -> 0.0
        assert [r["cdf"] for r in out if r["k"] == "b"] == [0.0]

    def test_nan_normalized_to_null(self, spark):
        """Real NaN in a float value column is treated as missing (NULL
        cdf, counts toward n) — the documented resolution of the Arrow
        crossing's NULL/NaN conflation in plans/prefix."""
        from ml_hadoop_experiment_spark.operators.stats import cdf_normalize

        nan = float("nan")
        rows = [("a", nan), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = cdf_normalize(df, ["k"], "v").collect()
        got = sorted(
            (r["cdf"] for r in out if r["v"] is not None and r["v"] == r["v"])
        )
        # NaN and NULL both occupy the two lowest ranks of n=5:
        # non-null values rank 3,4,5 -> (r-1)/(n-1) = .5, .75, 1.0
        assert got == [0.5, 0.75, 1.0]
        missing = [
            r["cdf"] for r in out if r["v"] is None or r["v"] != r["v"]
        ]
        assert missing == [None, None]
        # the documented value-column mutation: NaN comes back as NULL
        # (the Arrow crossing can't represent NaN-vs-NULL in float64
        # payloads either way — see the cdf_normalize docstring)
        assert sum(1 for r in out if r["v"] is None) == 2
        assert all(r["v"] == r["v"] for r in out if r["v"] is not None)

    def test_value_col_case_insensitive_resolution(self, spark):
        """A value_col differing in case from the schema name still gets
        the NaN normalization (Spark resolves columns case-insensitively
        by default; the dtype lookup must too), and the output keeps the
        schema's original column name."""
        from ml_hadoop_experiment_spark.operators.stats import cdf_normalize

        rows = [("a", float("nan")), ("a", 1.0), ("a", 2.0)]
        df = spark.createDataFrame(rows, "k string, Val double")
        out = cdf_normalize(df, ["k"], "val").collect()
        assert "Val" in out[0].asDict()
        assert sorted(
            r["cdf"] for r in out if r["Val"] is not None
        ) == [0.5, 1.0]
        assert [r["cdf"] for r in out if r["Val"] is None] == [None]


class TestApproxProductionPaths:
    """The approx=True forms of the exact-yardstick operators (SCALE.md
    'Exact-yardstick vs approx-production pairs'): same plan shape and
    schema, sketch-accurate values."""

    def test_mad_outliers_approx_close_to_exact(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import mad_outliers

        rng = np.random.default_rng(11)
        pdf = pd.DataFrame(
            {"k": np.repeat(["a", "b"], 4000), "v": rng.normal(100, 10, 8000)}
        )
        df = spark.createDataFrame(pdf)
        exact = {r["k"]: r for r in mad_outliers(df, ["k"], "v").collect()}
        approx = {r["k"]: r for r in mad_outliers(df, ["k"], "v", approx=True).collect()}
        assert set(exact) == set(approx)
        for k in exact:
            assert approx[k]["med"] == pytest.approx(exact[k]["med"], rel=0.01)
            assert approx[k]["mad"] == pytest.approx(exact[k]["mad"], rel=0.05)
            assert approx[k]["n_rows"] == exact[k]["n_rows"]

    def test_trimmed_stats_approx_close_to_exact(self, spark):
        from ml_hadoop_experiment_spark.operators.stats import trimmed_stats

        rng = np.random.default_rng(12)
        pdf = pd.DataFrame(
            {"k": np.repeat(["a", "b"], 4000), "v": rng.normal(100, 10, 8000)}
        )
        df = spark.createDataFrame(pdf)
        exact = {r["k"]: r for r in trimmed_stats(df, ["k"], "v", decimals="decimal(18,9)").collect()}
        approx = {
            r["k"]: r
            for r in trimmed_stats(df, ["k"], "v", decimals="decimal(18,9)", approx=True).collect()
        }
        for k in exact:
            assert approx[k]["trimmed_mean"] == pytest.approx(
                exact[k]["trimmed_mean"], rel=0.01
            )
            # fences are sketch-approximate; kept counts stay close
            assert abs(approx[k]["n_kept"] - exact[k]["n_kept"]) <= 80
