"""Optional ML-framework adapters (TensorFlow / PyTorch / scikit-learn).

Parity targets (SURVEY.md §2 U2, U4, U13, U14): the reference ships loader
wrappers returning broadcastable artifacts — ``estimator_model`` /
``keras_model`` / ``graph_model`` (tensorflow/dataframe_prediction_helper.
py:75-101) — plus TF-serving receiver builders
(tensorflow/serving_input_receiver_fn_makers.py:8-123) and a driver-side
estimator predict (dataframe_prediction_helper.py:259-282).

Everything here soft-imports its framework, mirroring the reference's
guarded package inits (tensorflow/__init__.py:1-11, pytorch/__init__.py:
1-11): the engine core never needs TF/torch; these adapters raise a clear
ImportError when the extra is absent. The returned loaders are plain
``(load_fn, args)`` closures for ``SerializableObj`` — pickled as the
recipe, re-executed lazily on each worker (common/artifacts.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

from pyspark.sql import SparkSession

from ml_hadoop_experiment_spark.common.artifacts import SerializableObj


def _require(module: str, extra: str) -> Any:
    try:
        return __import__(module)
    except ImportError as e:
        raise ImportError(
            f"{module} is not installed; this adapter needs the optional "
            f"'{extra}' dependency. The engine core works without it."
        ) from e


# --------------------------------------------------------------------------
# U14 — model-loader artifacts
# --------------------------------------------------------------------------


def tf_saved_model(spark: SparkSession, export_dir: str) -> SerializableObj:
    """SavedModel artifact (reference ``estimator_model``, :75-82):
    workers lazily run ``tf.saved_model.load``."""

    def _load(path: str) -> Any:
        tf = _require("tensorflow", "tensorflow")
        return tf.saved_model.load(path)

    return SerializableObj(spark, _load, export_dir)


def keras_model(spark: SparkSession, model_path: str) -> SerializableObj:
    """Keras artifact (reference ``keras_model``, :85-92)."""

    def _load(path: str) -> Any:
        tf = _require("tensorflow", "tensorflow")
        return tf.keras.models.load_model(path)

    return SerializableObj(spark, _load, model_path)


def torch_model(spark: SparkSession, model_path: str) -> SerializableObj:
    """TorchScript/pickled torch model artifact; loads on CPU, the
    inference fn moves it to the allocated device (common/gpu.py)."""

    def _load(path: str) -> Any:
        torch = _require("torch", "pytorch")
        return torch.load(path, map_location="cpu")

    return SerializableObj(spark, _load, model_path)


def sklearn_model(spark: SparkSession, model_path: str) -> SerializableObj:
    """Pickled sklearn estimator artifact (joblib or pickle file)."""

    def _load(path: str) -> Any:
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    return SerializableObj(spark, _load, model_path)


# --------------------------------------------------------------------------
# U4 — driver-side predict over encoded Examples
# --------------------------------------------------------------------------


def predict_with_examples(
    rows: Iterable[Dict[str, Any]],
    specs: Any,
    signature_fn: Callable[[List[bytes]], Any],
    postprocessing_fn: Optional[Callable[[Any], Any]] = None,
) -> Any:
    """Encode rows to serialized Examples and call a serving signature.

    Reference ``predict_with_tfr`` (dataframe_prediction_helper.py:259-282)
    loads a SavedModel and feeds serialized protos to its signature. The
    engine splits that: encoding uses the TF-free codec; ``signature_fn``
    is any callable over the serialized batch (a TF signature when the
    extra is installed, anything else in tests).
    """
    from ml_hadoop_experiment_spark.sources.tfrecords import to_example_bytes

    serialized = [to_example_bytes(row, specs) for row in rows]
    result = signature_fn(serialized)
    return postprocessing_fn(result) if postprocessing_fn else result


# --------------------------------------------------------------------------
# U13 — serving-receiver builders (TF-serving specific, thin pass-through)
# --------------------------------------------------------------------------


def make_serving_input_receiver_fn(specs: Any) -> Callable[[], Any]:
    """TF-serving receiver from a feature spec (reference
    serving_input_receiver_fn_makers.py:107-123). Requires the tensorflow
    extra; VarLen features are split into shape/indices/values placeholders
    exactly as the reference does (:46-64)."""
    tf = _require("tensorflow", "tensorflow")

    def _receiver_fn() -> Any:
        placeholders: Dict[str, Any] = {}
        features: Dict[str, Any] = {}
        for name, spec in specs.items():
            if hasattr(spec, "shape"):
                ph = tf.compat.v1.placeholder(
                    dtype=spec.dtype, shape=[None, *spec.shape], name=name
                )
                placeholders[name] = ph
                features[name] = ph
            else:
                shape = tf.compat.v1.placeholder(tf.int64, [2], name=f"{name}/shape")
                indices = tf.compat.v1.placeholder(
                    tf.int64, [None, 2], name=f"{name}/indices"
                )
                values = tf.compat.v1.placeholder(
                    spec.dtype, [None], name=f"{name}/values"
                )
                placeholders.update(
                    {
                        f"{name}/shape": shape,
                        f"{name}/indices": indices,
                        f"{name}/values": values,
                    }
                )
                features[name] = tf.sparse.SparseTensor(indices, values, shape)
        return tf.estimator.export.ServingInputReceiver(features, placeholders)

    return _receiver_fn
