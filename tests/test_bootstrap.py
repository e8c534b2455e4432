"""Bootstrap evaluation (SURVEY.md §2 A4/A5).

Mirrors the reference's seeded-equivalence strategy
(tests/tensorflow/test_keras_bootstrap_helper.py:78-135): the operator's
resampling must equal a manual numpy resample under the same seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ml_hadoop_experiment_spark.operators.bootstrap import (
    _POISSON1_CDF,
    evaluate_bootstrap,
    poisson_bootstrap_metrics,
    weighted_mae,
    weighted_mse,
)


def _toy_frame(n=50, seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "x": rng.rand(n),
            "label": rng.rand(n) * 10,
            "w": rng.randint(1, 4, size=n).astype(float),
        }
    )


def _predict(pdf: pd.DataFrame) -> np.ndarray:
    return pdf["x"].to_numpy() * 5.0


def test_evaluate_bootstrap_matches_manual_resample():
    df = _toy_frame()
    out = evaluate_bootstrap(
        _predict, df, label_col="label", nb_bootstrap=3, seed=0
    )
    # manual replica, reference-identical draw sequence
    np.random.seed(0)
    n = len(df)
    labels = df["label"].to_numpy()
    preds = _predict(df.drop(columns=["label"]))
    for b in range(3):
        picked, counts = np.unique(np.random.randint(n, size=n), return_counts=True)
        w = np.zeros(n)
        w[picked] = counts
        assert out["mse"][b] == pytest.approx(weighted_mse(labels, preds, w))
        assert out["mae"][b] == pytest.approx(weighted_mae(labels, preds, w))


def test_evaluate_bootstrap_user_weights_multiply():
    df = _toy_frame()
    out_w = evaluate_bootstrap(
        _predict, df, label_col="label", nb_bootstrap=2, weight_col="w", seed=1
    )
    out_unw = evaluate_bootstrap(
        _predict, df, label_col="label", nb_bootstrap=2, seed=1
    )
    # same draws (same seed) but different weighting -> different metrics
    assert out_w["mse"] != out_unw["mse"]
    assert len(out_w["mse"]) == 2


def test_poisson_cdf_is_increasing_and_complete():
    assert all(b > a for a, b in zip(_POISSON1_CDF, _POISSON1_CDF[1:]))
    assert _POISSON1_CDF[-1] > 0.99998


def test_poisson_bootstrap_metrics_spark(spark):
    pdf = _toy_frame(n=200)
    pdf["rk"] = np.arange(200, dtype=np.int64)
    df = spark.createDataFrame(pdf).withColumn("pred", __import__("pyspark").sql.functions.col("x") * 5.0)
    out = poisson_bootstrap_metrics(
        df, key_col="rk", prediction_col="pred", label_col="label", nb_bootstrap=5
    ).toPandas()
    assert len(out) == 5
    assert set(out.columns) == {"bootstrap_id", "n_eff", "mse", "mae"}
    # expected multiplicity sum ~ n (Poisson(1) mean 1); loose bound
    assert (out["n_eff"] > 120).all() and (out["n_eff"] < 280).all()
    # metrics deterministic across runs
    out2 = poisson_bootstrap_metrics(
        df, key_col="rk", prediction_col="pred", label_col="label", nb_bootstrap=5
    ).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("bootstrap_id", ignore_index=True),
        out2.sort_values("bootstrap_id", ignore_index=True),
    )
