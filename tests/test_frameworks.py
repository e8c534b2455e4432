"""Framework adapters (SURVEY.md §2 U2-U4, U13-U14) and the TF-free
serialized-Example inference column (U3)."""

from __future__ import annotations

import pandas as pd
import pytest

from ml_hadoop_experiment_spark import frameworks
from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature
from ml_hadoop_experiment_spark.sources.tfrecords import to_example_bytes


SPECS = {
    "f1": FixedLenFeature(shape=[], dtype="float32", default_value=0.0),
    "f2": FixedLenFeature(shape=[], dtype="float32", default_value=0.0),
}


def test_gated_adapters_raise_clear_importerror(spark):
    with pytest.raises(ImportError, match="tensorflow"):
        frameworks.make_serving_input_receiver_fn(SPECS)
    art = frameworks.tf_saved_model.__doc__
    assert "SavedModel" in art  # loader exists as documented


def test_predict_with_examples_roundtrip():
    rows = [{"f1": 1.0, "f2": 10.0}, {"f1": 2.0, "f2": 20.0}]

    def signature(serialized):
        from ml_hadoop_experiment_spark.sources.tfrecords import parse_example_bytes

        decoded = [parse_example_bytes(s, SPECS) for s in serialized]
        return [d["f1"] + d["f2"] for d in decoded]

    out = frameworks.predict_with_examples(
        rows, SPECS, signature, postprocessing_fn=lambda xs: [x * 2 for x in xs]
    )
    assert out == [22.0, 44.0]


class Toy:
    def predict_proba(self, X):
        return [[0.5, 0.5]] * len(X)


def test_sklearn_model_loader_lazy(tmp_path, spark):
    import pickle

    p = tmp_path / "model.pkl"
    p.write_bytes(pickle.dumps(Toy()))
    art = frameworks.sklearn_model(spark, str(p))
    model = art.broadcasted.value.get()
    assert model.predict_proba([1, 2]) == [[0.5, 0.5], [0.5, 0.5]]
    art.destroy()


def test_sklearn_artifact_feeds_inference_column(tmp_path, spark):
    import pickle

    from pyspark.sql import functions as F

    from ml_hadoop_experiment_spark.operators.inference import (
        with_sklearn_inference_column,
    )

    p = tmp_path / "model.pkl"
    p.write_bytes(pickle.dumps(Toy()))
    art = frameworks.sklearn_model(spark, str(p))
    df = spark.createDataFrame([(float(i),) for i in range(5)], "q double")
    out = with_sklearn_inference_column(
        df, art, output_col="pred", output_type="double",
        postprocessing_fn=lambda probs: pd.Series([row[1] for row in probs]),
    )
    assert out.filter(F.col("pred") != 0.5).count() == 0
    assert out.count() == 5


def _sum_features(model, features):
    return features[0].astype(float) + features[1].astype(float)


def test_serialized_example_inference_column(spark):
    from ml_hadoop_experiment_spark.operators.inference import (
        with_serialized_example_inference,
    )

    payloads = [
        (1, bytearray(to_example_bytes({"f1": 1.0, "f2": 10.0}, SPECS))),
        (2, bytearray(to_example_bytes({"f1": 2.0, "f2": 20.0}, SPECS))),
        (3, bytearray(to_example_bytes({"f1": 3.0, "f2": 30.0}, SPECS))),
    ]
    df = spark.createDataFrame(payloads, "id int, example binary")
    out = with_serialized_example_inference(
        df, "example", None, SPECS, _sum_features,
        output_type="double", output_col="score",
    )
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got == {1: 11.0, 2: 22.0, 3: 33.0}
