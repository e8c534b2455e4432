"""Inference-column tests — mirrors the reference's golden style: a
deterministic toy 'model' whose prediction is SQL-expressible (Add/Multiply
models of tests/tensorflow/test_dataframe_prediction_helper.py:30-83, torch
Reducer of tests/pytorch/test_spark_inference.py:182-215) plus the
exactly-once UDF-evaluation regression (reference §5.2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.common.artifacts import SerializableObj
from ml_hadoop_experiment_spark.common.batching import split_in_batches
from ml_hadoop_experiment_spark.operators.inference import (
    with_inference_column,
    with_map_in_pandas_inference,
    with_sklearn_inference_column,
)


class LinearModel:
    """score = a*x + b*y — deterministic, picklable."""

    def __init__(self, a: float, b: float):
        self.a, self.b = a, b

    def predict(self, x: pd.Series, y: pd.Series) -> pd.Series:
        return self.a * x + self.b * y


def _linear_infer(model, batch):
    return model.predict(batch[0], batch[1])


def test_inference_column_golden(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0)], "feature1 double, feature2 double"
    )
    out = with_inference_column(
        df, LinearModel(2.0, 1.0), ["feature1", "feature2"], _linear_infer,
        output_type="double", batch_size=2, output_col="score",
    )
    got = [r["score"] for r in out.orderBy("feature1").collect()]
    assert got == [12.0, 24.0, 36.0]


def test_inference_with_serializable_obj(spark):
    df = spark.createDataFrame([(1.0, 1.0), (4.0, 2.0)], "f1 double, f2 double")
    calls = []

    def load():
        calls.append(1)
        return LinearModel(1.0, -1.0)

    with SerializableObj(spark, load) as artifact:
        out = with_inference_column(
            df, artifact, ["f1", "f2"], _linear_infer, output_type="double"
        )
        got = sorted(r["prediction"] for r in out.collect())
    assert got == [0.0, 2.0]
    assert calls  # loaded at least on the driver


def test_exactly_once_evaluation(spark):
    """Splitting the output column through several projections must not
    re-evaluate the UDF (reference regression: mutable-counter artifact,
    tests/tensorflow/test_dataframe_prediction_helper.py:96-119)."""
    df = spark.createDataFrame([(float(i), 1.0) for i in range(10)], "f1 double, f2 double")

    def infer(model, batch):
        return batch[0] + batch[1]

    out = with_inference_column(
        df, None, ["f1", "f2"], infer, output_type="double", output_col="p"
    )
    # Derive two columns from p: a deterministic UDF would be inlined twice.
    derived = out.select(
        (F.col("p") * 2).alias("a"), (F.col("p") + 1).alias("b")
    )
    plan = derived._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1
    rows = derived.collect()
    assert len(rows) == 10


def test_array_output_and_get_item(spark):
    """Array outputs split via getItem (reference P7, SURVEY §2.2)."""
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "f1 double, f2 double")

    def infer(model, batch):
        return pd.Series([[x + y, x - y] for x, y in zip(batch[0], batch[1])])

    out = with_inference_column(
        df, None, ["f1", "f2"], infer, output_type="array<double>", output_col="p"
    ).select(
        "f1",
        F.col("p").getItem(0).alias("sum"),
        F.col("p").getItem(1).alias("diff"),
    )
    got = {r["f1"]: (r["sum"], r["diff"]) for r in out.collect()}
    assert got == {1.0: (3.0, -1.0), 3.0: (7.0, -1.0)}


def test_sklearn_style_inference(spark):
    """predict_proba contract incl. validation (sklearn/spark_inference.py:37-40)."""

    class FakeLR:
        def predict_proba(self, pdf: pd.DataFrame):
            import numpy as np

            p = 1.0 / (1.0 + np.exp(-(pdf["a"] + pdf["b"])))
            return np.column_stack([1 - p, p])

    df = spark.createDataFrame([(0.0, 0.0), (1.0, 1.0)], "a double, b double")
    out = with_sklearn_inference_column(
        df, FakeLR(), postprocessing_fn=lambda r: pd.Series(r[:, 1]),
        output_type="double",
    )
    got = sorted(r["prediction"] for r in out.collect())
    assert got[0] == pytest.approx(0.5)
    assert got[1] == pytest.approx(0.8807970779778823)

    with pytest.raises(ValueError):
        with_sklearn_inference_column(df, object())
    with pytest.raises(ValueError):
        with_sklearn_inference_column(None, FakeLR())


def test_batch_size_respected(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "f double").repartition(1)
    seen = []

    def infer(model, batch):
        seen.append(len(batch[0]))
        return batch[0]

    out = with_inference_column(df, None, ["f"], infer, output_type="double", batch_size=7)
    assert out.count() == 100
    # executed on workers; sizes observed there — verify locally instead:
    sizes = [len(b[0]) for b in split_in_batches((pd.Series(range(100)),), 7)]
    assert sizes == [7] * 14 + [2]


def test_map_in_pandas_multi_output(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 5.0)], "f1 double, f2 double")

    def infer(model, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": pdf.f1 + pdf.f2, "d": pdf.f1 - pdf.f2})

    out = with_map_in_pandas_inference(df, None, infer, "s double, d double")
    got = sorted((r["s"], r["d"]) for r in out.collect())
    assert got == [(3.0, -1.0), (8.0, -2.0)]


# --- U7: preprocessing + inference (pytorch/spark_inference.py:57-105) ----


def _double_up(x, y):
    return (x * 2.0, y)


def _sum_pre(model, items):
    return pd.Series([a + b for a, b in items])


def test_preprocessing_inference_golden(spark):
    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0)], "f1 double, f2 double"
    )
    out = with_inference_column_and_preprocessing(
        df, None, ["f1", "f2"], _double_up, _sum_pre,
        output_type="double", batch_size=2, num_workers_preprocessing=2,
        output_col="score",
    )
    got = sorted(r["score"] for r in out.collect())
    assert got == [12.0, 24.0, 36.0]


def _flaky_infer(model, items, _state={"n": 0}):
    _state["n"] += 1
    if _state["n"] < 3:
        raise RuntimeError("transient")
    return pd.Series([a + b for a, b in items])


def test_preprocessing_inference_retries_honor_max_retry(spark):
    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    df = spark.createDataFrame([(1.0, 2.0)], "f1 double, f2 double").coalesce(1)
    out = with_inference_column_and_preprocessing(
        df, None, ["f1", "f2"], _double_up, _flaky_infer,
        output_type="double", max_retry=3,
    )
    assert [r["prediction"] for r in out.collect()] == [4.0]


def test_preprocessing_inference_raises_after_retries(spark):
    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    def always_fail(model, items):
        raise RuntimeError("permanent")

    df = spark.createDataFrame([(1.0, 2.0)], "f1 double, f2 double").coalesce(1)
    out = with_inference_column_and_preprocessing(
        df, None, ["f1", "f2"], _double_up, always_fail,
        output_type="double", max_retry=2,
    )
    with pytest.raises(Exception, match="permanent"):
        out.collect()


def test_preprocessing_inference_validates_args(spark):
    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    df = spark.createDataFrame([(1.0, 2.0)], "f1 double, f2 double")
    with pytest.raises(ValueError, match="max_retry"):
        with_inference_column_and_preprocessing(
            df, None, ["f1"], _double_up, _sum_pre, max_retry=0
        )
    with pytest.raises(ValueError, match="preprocessing_pool"):
        with_inference_column_and_preprocessing(
            df, None, ["f1"], _double_up, _sum_pre, preprocessing_pool="fiber"
        )
    with pytest.raises(ValueError, match="num_workers_preprocessing"):
        with_inference_column_and_preprocessing(
            df, None, ["f1"], _double_up, _sum_pre, num_workers_preprocessing=0
        )


def _pid_preproc(x, y):
    # tiny sleep so a single fast pool worker cannot drain the whole queue
    # before its siblings spawn — makes the >=2-distinct-pids check robust
    import os
    import time

    time.sleep(0.005)
    return (float(os.getpid()), x + y)


def _pid_infer(model, items):
    return pd.Series([pid for pid, _ in items])


def test_preprocessing_process_pool_distributes_across_processes(spark):
    """U7 parity with the reference's DataLoader worker *processes*
    (pytorch/spark_inference.py:156-164): pure-Python CPU-bound
    preprocessing must actually fan out across OS processes, not stay
    GIL-bound in one interpreter."""
    import os

    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    rows = [(float(i), float(i)) for i in range(64)]
    df = spark.createDataFrame(rows, "f1 double, f2 double").coalesce(1)
    out = with_inference_column_and_preprocessing(
        df, None, ["f1", "f2"], _pid_preproc, _pid_infer,
        output_type="double", batch_size=64, num_workers_preprocessing=4,
        preprocessing_pool="process", output_col="pid",
    )
    pids = {int(r["pid"]) for r in out.collect()}
    assert os.getpid() not in pids  # ran outside the driver
    assert len(pids) >= 2, f"expected >=2 pool processes, saw {pids}"


def test_preprocessing_process_pool_closure_and_order(spark):
    """Closures must survive the cloudpickle hop to pool workers, and the
    output order must match row order exactly."""
    from ml_hadoop_experiment_spark.operators.inference import (
        with_inference_column_and_preprocessing,
    )

    offset = 100.0  # captured by the closure below

    def scale(x, y):
        return x * 2.0 + y + offset

    def infer(model, items):
        return pd.Series(items)

    df = spark.createDataFrame(
        [(float(i), float(i * 10)) for i in range(10)], "f1 double, f2 double"
    )
    out = with_inference_column_and_preprocessing(
        df, None, ["f1", "f2"], scale, infer,
        output_type="double", batch_size=4, num_workers_preprocessing=2,
        preprocessing_pool="process", output_col="score",
    )
    got = {(r["f1"], r["score"]) for r in out.collect()}
    assert got == {(float(i), i * 2.0 + i * 10 + 100.0) for i in range(10)}
