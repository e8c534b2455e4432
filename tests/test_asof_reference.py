"""Randomized differential test: asof_join vs pandas.merge_asof.

pandas' merge_asof is the canonical single-node as-of implementation;
the distributed union+window formulation must agree with it row-for-row
on both directions across many random key/time layouts (seeded — one
Spark job per direction, not per case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ml_hadoop_experiment_spark.operators.temporal import asof_join

S = 1_000_000_000  # work in epoch-nanos bigints (unique integers)


@pytest.fixture(scope="module")
def random_sides():
    rng = np.random.RandomState(123)
    n_left, n_right = 400, 300
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_left, dtype=np.int64),
            "k": rng.randint(0, 12, n_left).astype(np.int64),
            "t": rng.choice(np.arange(0, 5000, dtype=np.int64) * S, n_left, replace=False),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 12, n_right).astype(np.int64),
            # unique times per key -> no tie ambiguity between engines
            "t": rng.choice(np.arange(0, 5000, dtype=np.int64) * S, n_right, replace=False),
            "v": np.round(rng.uniform(0, 100, n_right), 3),
        }
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_agrees_with_pandas_merge_asof(spark, random_sides, direction):
    left_pdf, right_pdf = random_sides
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    got = (
        asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            direction=direction,
        )
        .toPandas()
        .set_index("event_id")["v_asof"]
        .sort_index()
    )
    want = (
        pd.merge_asof(
            left_pdf.sort_values("t"),
            right_pdf.sort_values("t"),
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=True,
        )
        .set_index("event_id")["v"]
        .sort_index()
    )
    pd.testing.assert_series_equal(
        got, want, check_names=False, check_dtype=False
    )
    assert got.notna().sum() > 0  # non-trivial scenario
