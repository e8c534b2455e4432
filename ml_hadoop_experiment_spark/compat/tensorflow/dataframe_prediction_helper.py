"""Compat: ``ml_hadoop_experiment.tensorflow.dataframe_prediction_helper``.

Reference tensorflow/dataframe_prediction_helper.py — the vectorized
inference column family. ``with_inference`` is framework-agnostic
(delegates straight to the engine core); model loaders and the serialized-
Example/graph variants need TensorFlow and raise a clear ImportError
without it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Union

import pandas as pd
import pyspark.sql
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import DataType, FloatType

from ml_hadoop_experiment_spark import frameworks as _frameworks
from ml_hadoop_experiment_spark.compat._specs import to_engine_specs
from ml_hadoop_experiment_spark.operators import inference as _inf
from ml_hadoop_experiment_spark.schema.feature_spec import (
    filtered_columns as _filtered_columns,
)

artifact_type = Any
inference_udf = Callable[..., pd.Series]
postprocessing_fn_type = Callable[[Any], Any]

_default_signature = "serving_default"


def _canned_linear_classifier_extract_prediction_fn(
    fetch_tensors: Dict[str, Any],
) -> List[float]:
    """Reference :38-53 — positive-class probabilities from a canned
    LinearClassifier's ``scores`` output."""
    return [float(s[1]) for s in fetch_tensors["scores"]]


def _default_extract_fn(fetch_tensors: Dict[str, Any]) -> pd.Series:
    """Reference :55-73 — column 1 of ``scores`` as a Series."""
    return pd.Series(fetch_tensors["scores"][:, 1])


def with_inference(
    df: DataFrame,
    model: artifact_type,
    inference_fn: inference_udf,
    input_column_names: List[Union[str, Column]],
    output_column_type: DataType,
    output_column_name: str = "prediction",
    batch_size: int = 1,
    num_threads: int = 8,
) -> DataFrame:
    """Reference :189-256 — N input columns -> one typed output column via
    an Arrow-vectorized UDF with micro-batching and broadcast artifacts.
    The obsolete explode(array(udf)) duplicate-eval workaround (SPARK-17728,
    :252-255) is replaced by ``asNondeterministic`` in the engine core."""
    return _inf.with_inference_column(
        df,
        model,
        input_column_names,
        inference_fn,
        output_type=output_column_type,
        batch_size=batch_size,
        output_col=output_column_name,
        num_threads=num_threads,
    )


def estimator_model(
    sparkSession: pyspark.sql.SparkSession, export_model_path: str
) -> Any:
    """Reference :75-82 (requires the tensorflow extra)."""
    return _frameworks.tf_saved_model(sparkSession, export_model_path)


def keras_model(
    sparkSession: pyspark.sql.SparkSession, export_model_path: str
) -> Any:
    """Reference :83-90 (requires the tensorflow extra)."""
    return _frameworks.keras_model(sparkSession, export_model_path)


def graph_model(
    sparkSession: pyspark.sql.SparkSession,
    export_model_path: str,
    feeds: Optional[List[str]],
    fetches: Optional[List[str]],
) -> Any:
    """Frozen-graph Predictor artifact (reference :91-101 —
    ``SerializableObj(spark, Predictor.from_graph, path, feeds, fetches)``).
    Requires the tensorflow extra when the artifact is materialized."""
    from ml_hadoop_experiment_spark.common.artifacts import SerializableObj
    from ml_hadoop_experiment_spark.compat.tensorflow.predictor import Predictor

    return SerializableObj(
        sparkSession, Predictor.from_graph, export_model_path, feeds, fetches
    )


def _default_graph_postprocessing(outputs: Any) -> pd.Series:
    # the reference's default (:109): first column of the 'score' output
    return pd.Series(outputs["score"][:, 0])


def with_graph_inference_column(
    df: DataFrame,
    model: artifact_type,
    output_column_name: str = "prediction",
    output_column_type: DataType = FloatType(),
    postprocessing_fn: postprocessing_fn_type = _default_graph_postprocessing,
) -> DataFrame:
    """Graph-Predictor inference column (reference :104-150).

    Reference-parity call shape: the input columns are DERIVED from the
    Predictor artifact's ``feed_tensors`` (``model.ew.obj.feed_tensors``,
    :126-129) and validated against the frame; ``postprocessing_fn``
    defaults to the reference's score extractor. The worker-side call uses
    the Predictor's dict form (session.run over resolved feed/fetch
    tensors) rather than rebuilding a tf.data pipeline — same batch
    semantics, fewer moving parts.
    """
    feature_names = list(model.ew.obj.feed_tensors.keys())
    for feature_name in feature_names:
        if feature_name not in df.columns:
            raise ValueError(f"{feature_name} not found in columns {df.columns}")

    def _inference_fn(predictor: Any, series: Any) -> pd.Series:
        batch_size = series[0].size
        inputs = {}
        for feature_name, serie in zip(feature_names, series):
            values = serie.to_numpy()
            if values.dtype != object and getattr(values[0], "shape", ()) == ():
                # scalar features feed as (batch, 1), as the reference does
                values = values.reshape(batch_size, 1)
            elif values.dtype == object:
                values = [
                    e.tolist() if hasattr(e, "tolist") else e for e in values
                ]
            inputs[feature_name] = values
        outputs = predictor.predict(inputs)
        return postprocessing_fn(outputs)

    return with_inference(
        df, model, _inference_fn, feature_names, output_column_type, output_column_name
    )


def with_inference_column(
    df: DataFrame,
    tfrecords_col: Union[Column, str],
    model: artifact_type,
    output_column_name: str = "prediction",
    feed_tensor_key: str = "inputs",
    postprocessing_fn: postprocessing_fn_type = _default_extract_fn,
) -> DataFrame:
    """Serialized-Example (Estimator serving-signature) inference column —
    reference :153-186, exact call shape: the raw serialized strings feed
    the model's default serving signature under ``feed_tensor_key``;
    ``postprocessing_fn`` extracts the score column. Requires the
    tensorflow extra on workers (the SavedModel signature runs there); a
    model artifact resolving to a plain callable is accepted as the
    TF-free testing seam (it receives the list of serialized bytes). For
    decode-then-infer without TF, use the engine-native
    ``operators.inference.with_serialized_example_inference``.
    """

    def _inference_fn(resolved: Any, series: Any) -> pd.Series:
        try:
            import tensorflow as tf  # optional extra

            signatures = getattr(resolved, "signatures", None)
            if signatures is not None:
                outputs = signatures[_default_signature](
                    **{feed_tensor_key: tf.constant(series[0])}
                )
                return postprocessing_fn(outputs)
        except ImportError:
            pass
        if callable(resolved):
            return postprocessing_fn(resolved(list(series[0])))
        raise ValueError(
            "model must resolve to a SavedModel with signatures (tensorflow "
            "extra) or to a callable over the serialized batch"
        )

    return with_inference(
        df, model, _inference_fn, [tfrecords_col], FloatType(), output_column_name
    )


def predict_with_tfr(
    features_specs: Dict[str, Any],
    model_path: str,
    postprocessing_fn: postprocessing_fn_type = _canned_linear_classifier_extract_prediction_fn,
    feed_tensor_key: str = "inputs",
) -> Callable[[List[Dict[str, Any]]], Any]:
    """Driver-side estimator predict over encoded Examples — reference
    :259-282, exact call shape: loads the SavedModel eagerly and RETURNS a
    ``predict(inputs)`` callable; each call encodes the input dicts with
    the engine's TF-free Example codec and feeds the serialized protos to
    the default serving signature. Requires the tensorflow extra."""
    import tensorflow as tf  # optional extra

    specs = to_engine_specs(features_specs)
    estimator = tf.saved_model.load(model_path)
    signature = estimator.signatures[_default_signature]

    def _call(serialized: List[bytes]) -> Any:
        return signature(**{feed_tensor_key: tf.constant(serialized)})

    def _predict(inputs: List[Dict[str, Any]]) -> Any:
        return _frameworks.predict_with_examples(
            inputs, specs, _call, postprocessing_fn
        )

    return _predict


def filtered_columns(df: DataFrame, specs: Dict[str, Any]) -> List[Column]:
    """Reference :285-286 — keep only spec-listed columns."""
    return _filtered_columns(df, to_engine_specs(specs))
