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
    sparkSession: pyspark.sql.SparkSession, model_path: str, init_tables: bool = True
) -> Any:
    """Frozen-graph artifact (reference :91-101). Requires the tensorflow
    extra; workers lazily import the GraphDef into a TF1 session."""
    from ml_hadoop_experiment_spark.common.artifacts import SerializableObj

    def _load(path: str, init: bool) -> Any:
        import tensorflow as tf  # optional extra

        graph_def = tf.compat.v1.GraphDef()
        with tf.io.gfile.GFile(path, "rb") as f:
            graph_def.ParseFromString(f.read())
        graph = tf.Graph()
        with graph.as_default():
            tf.import_graph_def(graph_def, name="")
        session = tf.compat.v1.Session(graph=graph)
        if init:
            session.run(tf.compat.v1.tables_initializer())
        return session

    return SerializableObj(sparkSession, _load, model_path, init_tables)


def with_graph_inference_column(
    df: DataFrame,
    model: artifact_type,
    output_column_name: str = "prediction",
    output_column_type: DataType = FloatType(),
    postprocessing_fn: Optional[Callable[[Any], pd.Series]] = None,
    feed_names: Optional[List[str]] = None,
    fetch_name: Optional[str] = None,
) -> DataFrame:
    """Graph-session inference column (reference :104-150).

    The reference derives input columns from the graph's feed tensor names
    (:126-129); pass ``feed_names``/``fetch_name`` explicitly when the graph
    has no canonical signature. Requires the tensorflow extra at execution
    time (the session lives behind the broadcast artifact).
    """
    if feed_names is None or fetch_name is None:
        raise ValueError(
            "feed_names and fetch_name are required (tensor names like "
            "'input_x:0' / 'output:0'); the engine does not guess them"
        )
    input_cols = [n.split(":", 1)[0] for n in feed_names]

    def _infer(session: Any, batch: Any) -> pd.Series:
        feeds = {name: series.to_numpy() for name, series in zip(feed_names, batch)}
        fetched = session.run(fetch_name, feed_dict=feeds)
        result = pd.Series(list(fetched))
        return postprocessing_fn(result) if postprocessing_fn else result

    return _inf.with_inference_column(
        df,
        model,
        input_cols,
        _infer,
        output_type=output_column_type,
        output_col=output_column_name,
    )


def with_inference_column(
    df: DataFrame,
    tfrecords_col: str,
    model: artifact_type,
    features_specs: Dict[str, Any],
    inference_fn: inference_udf,
    output_column_type: DataType = FloatType(),
    output_column_name: str = "prediction",
    batch_size: int = 1024,
) -> DataFrame:
    """Serialized-Example inference column (reference :153-186).

    The reference feeds raw serialized strings to a TF serving signature;
    here the engine decodes them with its TF-free codec against
    ``features_specs`` and hands ``inference_fn`` the decoded batch — plug
    a real signature call into ``inference_fn`` when TF is installed.
    """
    return _inf.with_serialized_example_inference(
        df,
        tfrecords_col,
        model,
        to_engine_specs(features_specs),
        inference_fn,
        output_type=output_column_type,
        output_col=output_column_name,
        batch_size=batch_size,
    )


def predict_with_tfr(
    features_specs: Dict[str, Any],
    model_path: str,
    rows: List[Dict[str, Any]],
    postprocessing_fn: Optional[Callable[[Any], Any]] = None,
    feed_tensor_key: str = "inputs",
) -> Any:
    """Driver-side estimator predict over encoded Examples (reference
    :259-282). Requires the tensorflow extra to load the SavedModel."""
    import tensorflow as tf  # optional extra

    specs = to_engine_specs(features_specs)
    model = tf.saved_model.load(model_path)
    signature = model.signatures["serving_default"]

    def _call(serialized: List[bytes]) -> Any:
        return signature(**{feed_tensor_key: tf.constant(serialized)})

    return _frameworks.predict_with_examples(rows, specs, _call, postprocessing_fn)


def filtered_columns(df: DataFrame, specs: Dict[str, Any]) -> List[Column]:
    """Reference :285-286 — keep only spec-listed columns."""
    return _filtered_columns(df, to_engine_specs(specs))
