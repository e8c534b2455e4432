"""The compat façade: every reference module path importable, reference
signatures working end-to-end on Spark — the "switch one import root"
guarantee. Mirrors the reference's own test scenarios (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_every_reference_module_importable():
    import ml_hadoop_experiment_spark.compat.common.paths  # noqa: F401
    import ml_hadoop_experiment_spark.compat.common.spark_inference  # noqa: F401
    import ml_hadoop_experiment_spark.compat.pytorch.spark_inference  # noqa: F401
    import ml_hadoop_experiment_spark.compat.sklearn.spark_inference  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.dataframe_prediction_helper  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.dataframe_to_tf_helper  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.evaluator_conf_helper  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.events  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.keras_bootstrap_helper  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.numpy_to_sparse_tensors  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.pandas_to_tensors  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.sampling  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.serving_input_receiver_fn_makers  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.tfrecords  # noqa: F401
    import ml_hadoop_experiment_spark.compat.tensorflow.vocabulary  # noqa: F401


def test_paths():
    from ml_hadoop_experiment_spark.compat.common.paths import check_full_hdfs_path

    assert check_full_hdfs_path("hdfs://nn1/user/x")
    assert check_full_hdfs_path("viewfs://cluster/user/x")
    assert not check_full_hdfs_path("hdfs:///no-netloc")
    assert not check_full_hdfs_path("/plain/path")
    assert not check_full_hdfs_path("s3://bucket/x")


def test_common_broadcast_accepts_sparkcontext(spark):
    from ml_hadoop_experiment_spark.compat.common.spark_inference import (
        broadcast,
        from_broadcasted,
    )

    b = broadcast(spark.sparkContext, {"w": 3})
    assert from_broadcasted(b) == {"w": 3}
    b2 = broadcast(spark, [1, 2])
    assert from_broadcasted(b2) == [1, 2]


def test_sampling_reference_exact_hash(spark):
    """compat sampling_hash == 0.5 + murmur3(cols)/2^32, bit-identical to
    the reference expression (sampling.py:15-23)."""
    from ml_hadoop_experiment_spark.compat.tensorflow.sampling import (
        add_deterministic_sampling_col,
        sample_with_predicate,
    )

    df = spark.createDataFrame([(i, "x") for i in range(100)], "k long, t string")
    name, out = add_deterministic_sampling_col(df, ["k"])
    assert name == "sampling_hash"
    expected = df.withColumn(
        "expected", F.lit(0.5) + F.hash("k").cast("double") / F.lit(float(2**32))
    )
    joined = out.join(expected.select("k", "expected"), "k")
    assert joined.filter(F.col("sampling_hash") != F.col("expected")).count() == 0

    sampled = sample_with_predicate(
        df, 1.0, 1.0, 0.0, F.col("k") < 50, columns_for_sample=["k"]
    )
    rows = sampled.collect()
    assert all(r["k"] < 50 for r in rows)
    assert all(r["weight"] == 1.0 for r in rows)


def test_vocabulary_gen_vocab_files(spark, tmp_path):
    from ml_hadoop_experiment_spark.compat.tensorflow.vocabulary import (
        gen_vocab_files,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("", "x")], "c1 string, c2 string"
    )
    # list form over a DataFrame
    files = gen_vocab_files(["c1"], df, str(tmp_path / "v1"))
    assert len(files) == 1
    vals = set((tmp_path / "v1" / "c1.voc").read_text().splitlines())
    assert vals == {"a", "b"}  # empty string skipped

    # dict (merged) form over an RDD of Rows, like the reference API
    files = gen_vocab_files({"merged": ["c1", "c2"]}, df.rdd, str(tmp_path / "v2"))
    vals = set((tmp_path / "v2" / "merged.voc").read_text().splitlines())
    assert vals == {"a", "b", "x", "y"}


def test_tfrecords_roundtrip_and_proto(spark, tmp_path):
    from ml_hadoop_experiment_spark.compat.tensorflow.tfrecords import (
        df_to_tf_record,
        read_parsed_tfr,
        to_tf_proto,
        write_example_rdd,
    )
    from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature

    specs = {
        "a": FixedLenFeature(shape=[], dtype="int64", default_value=0),
        "b": FixedLenFeature(shape=[], dtype="float32", default_value=0.0),
    }
    # proto encode carries SerializeToString (duck-typed Example)
    proto = to_tf_proto({"a": 7, "b": 1.5}, specs)
    assert isinstance(proto.SerializeToString(), bytes)

    # RDD sink: one (path, count) per partition
    protos = spark.sparkContext.parallelize(
        [to_tf_proto({"a": i, "b": float(i)}, specs) for i in range(10)], 2
    )
    written = write_example_rdd(protos, str(tmp_path / "rdd_sink"))
    assert sum(c for _, c in written) == 10

    # DataFrame sink + parsed read roundtrip
    df = spark.createDataFrame([(i, float(i) * 2) for i in range(20)], "a long, b float")
    files = df_to_tf_record(df, specs, str(tmp_path / "df_sink"))
    assert files
    parsed = sorted(read_parsed_tfr(files, specs), key=lambda d: d["a"])
    assert len(parsed) == 20
    assert parsed[3] == {"a": 3, "b": 6.0}


def test_dataframe_to_tf_helper_truth_table(spark):
    """The reference's widening truth table through the compat names
    (tests/tensorflow/test_dataframe_to_tf_helper.py:11-70)."""
    import pyspark.sql.types as T

    from ml_hadoop_experiment_spark.compat.tensorflow.dataframe_to_tf_helper import (
        can_convert_x_to_y,
        get_exact_sparksql_type,
        is_dataframe_compatible_with_feature_specs,
    )
    from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature

    assert get_exact_sparksql_type("int32") == T.IntegerType()
    assert get_exact_sparksql_type("float64") == T.DoubleType()
    assert can_convert_x_to_y(T.IntegerType(), "int64")
    assert not can_convert_x_to_y(T.LongType(), "int32")
    assert can_convert_x_to_y(T.FloatType(), "float64")
    assert not can_convert_x_to_y(T.DoubleType(), "float32")

    # createDataFrame columns are nullable -> specs need defaults (the
    # reference's nullability rule, dataframe_to_tf_helper.py:126-133)
    df = spark.createDataFrame([(1, 2.0)], "x int, y double")
    assert is_dataframe_compatible_with_feature_specs(
        df,
        {
            "x": FixedLenFeature([], "int64", default_value=0),
            "y": FixedLenFeature([], "float64", default_value=0.0),
        },
    )
    # nullable column without a default is rejected
    assert not is_dataframe_compatible_with_feature_specs(
        df, {"x": FixedLenFeature([], "int64")}
    )
    assert not is_dataframe_compatible_with_feature_specs(
        df,
        {
            "x": FixedLenFeature([], "int64", default_value=0),
            "missing": FixedLenFeature([], "int64", default_value=0),
        },
    )


def test_tf_duck_typed_specs():
    """tf.io-style spec objects (structural, no TF import) convert."""
    from ml_hadoop_experiment_spark.compat._specs import to_engine_spec
    from ml_hadoop_experiment_spark.schema.feature_spec import (
        FixedLenFeature,
        VarLenFeature,
    )

    class FakeDType:
        name = "float32"

    class FakeFixed:
        shape = [2]
        dtype = FakeDType()
        default_value = None

    class FakeVarLen:
        dtype = FakeDType()

    assert to_engine_spec(FakeFixed()) == FixedLenFeature((2,), "float32", None)
    assert to_engine_spec(FakeVarLen()) == VarLenFeature("float32")


def test_evaluator_conf_helper():
    from ml_hadoop_experiment_spark.compat.tensorflow.evaluator_conf_helper import (
        Eval_config,
        get_eval_params,
    )

    cfg = get_eval_params(10, 2, 1000000)
    assert isinstance(cfg, Eval_config)
    assert cfg.throttle_secs == 5


def test_numpy_to_sparse_tensors_goldens():
    from ml_hadoop_experiment_spark.compat.tensorflow.numpy_to_sparse_tensors import (
        create_sparse_np_stacked,
    )

    indices, values, shape = create_sparse_np_stacked(
        [[1.0, 2.0], [], [3.0]], "float32"
    )
    assert shape.tolist() == [3, 2]
    assert indices.tolist() == [[0, 0], [0, 1], [2, 0]]
    assert values.tolist() == [1.0, 2.0, 3.0]

    indices, values, shape = create_sparse_np_stacked([[], []], "float32")
    assert indices.shape == (0, 2)
    assert shape.tolist() == [2, 0]


def test_pandas_to_tensors():
    from ml_hadoop_experiment_spark.compat.tensorflow.pandas_to_tensors import (
        generate_create_tensor_fn,
    )
    from ml_hadoop_experiment_spark.schema.feature_spec import (
        FixedLenFeature,
        VarLenFeature,
    )

    fn = generate_create_tensor_fn(
        {
            "d": FixedLenFeature([], "float32", default_value=9.0),
            "v": VarLenFeature("int64"),
        }
    )
    out = fn(pd.DataFrame({"d": [1.0, None], "v": [[1, 2], [3]]}))
    assert out["d"].tolist() == [1.0, 9.0]
    assert out["v/shape"].tolist() == [2, 2]
    assert out["v/values"].tolist() == [1, 2, 3]


def test_bootstrap_seeded_draws_match_reference_scheme():
    from ml_hadoop_experiment_spark.compat.tensorflow.keras_bootstrap_helper import (
        evaluate_bootstrap,
    )

    class Linear:
        def predict(self, X):
            return np.asarray(X, dtype=float) * 2.0

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [2.0, 4.0, 6.5, 8.0]})
    out = evaluate_bootstrap(
        Linear(),
        df,
        nb_bootstrap=5,
        input_transform=lambda d: d["x"].to_numpy(),
        label_transform=lambda d: d["y"].to_numpy(),
        seed=0,
    )
    assert set(out) == {"mse", "mae"}
    assert len(out["mse"]) == 5
    # reproduce the draw sequence manually — must match exactly
    np.random.seed(0)
    picked, counts = np.unique(np.random.randint(4, size=4), return_counts=True)
    w = np.zeros(4)
    w[picked] = counts
    err = df["y"].to_numpy() - df["x"].to_numpy() * 2.0
    expected_mse = float(np.sum(w * err**2) / np.sum(w))
    assert out["mse"][0] == pytest.approx(expected_mse)


def test_bootstrap_metric_routing_never_silently_substitutes():
    """ADVICE round 1: Keras-style metrics must route through the Keras
    eval path (ImportError without TF), never silently fall back to
    builtin mse/mae; unrecognized metrics on a non-Keras model raise."""
    from ml_hadoop_experiment_spark.compat.tensorflow.keras_bootstrap_helper import (
        evaluate_bootstrap,
    )

    df = pd.DataFrame({"x": [1.0, 2.0], "y": [2.0, 4.0]})
    kwargs = dict(
        nb_bootstrap=2,
        input_transform=lambda d: d["x"].to_numpy(),
        label_transform=lambda d: d["y"].to_numpy(),
        seed=0,
    )

    class FakeKerasModel:
        loss = "mse"
        outputs = [object()]

        def predict(self, X, verbose=0):
            return np.asarray(X, dtype=float) * 2.0

    class PlainModel:
        def predict(self, X):
            return np.asarray(X, dtype=float) * 2.0

    class FakeMetricObject:  # looks like a Keras metric, is not a (name, fn) pair
        name = "auc"

    try:
        import tensorflow  # noqa: F401

        has_tf = True
    except ImportError:
        has_tf = False

    if not has_tf:
        # Keras model (compiled loss) must refuse rather than compute mse/mae
        with pytest.raises(ImportError, match="tensorflow"):
            evaluate_bootstrap(FakeKerasModel(), df, **kwargs)
        with pytest.raises(ImportError, match="tensorflow"):
            evaluate_bootstrap(
                FakeKerasModel(), df, metrics=[FakeMetricObject()], **kwargs
            )

    # non-Keras model with unrecognized metrics: explicit error
    with pytest.raises(ValueError, match="never silently substituted"):
        evaluate_bootstrap(PlainModel(), df, metrics=[FakeMetricObject()], **kwargs)

    # explicit callables still run framework-free, for Keras-shaped models too
    out = evaluate_bootstrap(
        FakeKerasModel(),
        df,
        metrics={"mse": lambda y, p, w: float(np.sum(w * (y - p) ** 2) / np.sum(w))},
        **kwargs,
    )
    assert set(out) == {"mse"} and len(out["mse"]) == 2


def test_sklearn_compat_column(spark):
    from ml_hadoop_experiment_spark.compat.sklearn.spark_inference import (
        with_inference_column,
    )

    class Toy:
        def predict_proba(self, X):
            return np.stack([1.0 - X["p"].to_numpy(), X["p"].to_numpy()], axis=1)

    df = spark.createDataFrame([(0.25,), (0.75,)], "p double")
    out = with_inference_column(
        df, Toy(), "prob", postprocessing_fn=lambda r: pd.Series(r[:, 1])
    )
    got = sorted(r["prob"] for r in out.collect())
    assert got == pytest.approx([0.25, 0.75])


def test_pytorch_compat_column_cpu_device(spark):
    """Without torch installed the device resolves to 'cpu' and the UDF
    still runs — the compat shim must not require the framework."""
    from ml_hadoop_experiment_spark.compat.pytorch.spark_inference import (
        with_inference_column,
        with_inference_column_and_preprocessing,
    )

    def infer(artifacts, features, device):
        assert device == "cpu"
        return (features[0] + features[1]).astype(float)

    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    out = with_inference_column(df, None, ["a", "b"], infer, "double", batch_size=8)
    assert sorted(r["prediction"] for r in out.collect()) == [3.0, 7.0]

    def prep(row_values):
        return row_values[0] * 10

    def infer2(artifacts, preprocessed, device):
        assert device == "cpu"
        return pd.Series([float(p + 1) for p in preprocessed])

    out2 = with_inference_column_and_preprocessing(
        df, None, ["a"], prep, infer2, "double", batch_size=8
    )
    assert sorted(r["prediction"] for r in out2.collect()) == [11.0, 31.0]


class _FakeGraphPredictor:
    """TF-free stand-in with the reference Predictor surface:
    feed_tensors keys name the input columns; predict(dict) returns
    fetch outputs."""

    def __init__(self):
        self.feed_tensors = {"a": object(), "b": object()}

    def predict(self, inputs):
        a = np.asarray(inputs["a"], dtype=float).reshape(-1)
        b = np.asarray(inputs["b"], dtype=float).reshape(-1)
        return {"score": np.stack([a + b, a - b], axis=1)}


def test_graph_inference_column_derives_feeds_from_artifact(spark):
    """Reference call shape (dataframe_prediction_helper.py:104-150): no
    feed/fetch args — the input columns come from model.ew.obj.feed_tensors
    and the default postprocessing extracts score[:, 0]."""
    from ml_hadoop_experiment_spark.common.artifacts import SerializableObj
    from ml_hadoop_experiment_spark.compat.tensorflow.dataframe_prediction_helper import (
        with_graph_inference_column,
    )

    model = SerializableObj(spark, _FakeGraphPredictor)
    df = spark.createDataFrame([(1.0, 2.0), (5.0, 3.0)], "a double, b double")
    out = with_graph_inference_column(df, model)
    got = sorted(r["prediction"] for r in out.collect())
    assert got == [3.0, 8.0]

    df_bad = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError, match="not found in columns"):
        with_graph_inference_column(df_bad, model)


def test_serialized_inference_column_reference_signature(spark):
    """Reference positional shape (df, tfrecords_col, model) with default
    postprocessing scores[:, 1]; the TF-free seam feeds the callable the
    raw serialized batch."""
    from ml_hadoop_experiment_spark.compat.tensorflow.dataframe_prediction_helper import (
        with_inference_column,
    )

    def fake_signature(serialized):
        # score class-1 proba = len(bytes) / 100
        return {
            "scores": np.array([[0.0, len(b) / 100.0] for b in serialized])
        }

    df = spark.createDataFrame([(bytearray(b"abc"),), (bytearray(b"abcdef"),)], "tfr binary")
    out = with_inference_column(df, "tfr", fake_signature)
    got = sorted(round(r["prediction"], 4) for r in out.collect())
    assert got == [0.03, 0.06]


def test_predict_with_tfr_returns_callable_or_gates_on_tf():
    from ml_hadoop_experiment_spark.compat.tensorflow.dataframe_prediction_helper import (
        predict_with_tfr,
    )
    from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature

    try:
        import tensorflow  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            predict_with_tfr({"x": FixedLenFeature([], "float32")}, "/nonexistent")
    else:  # pragma: no cover - env with TF
        pass


def test_gated_tf_functions_raise_importerror(spark):
    from ml_hadoop_experiment_spark.compat.tensorflow.serving_input_receiver_fn_makers import (
        featurespec_to_input_placeholders,
    )
    from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature

    with pytest.raises(ImportError):
        featurespec_to_input_placeholders({"x": FixedLenFeature([], "float32")})


def test_constant_and_predictor_modules():
    from ml_hadoop_experiment_spark.compat.tensorflow.constant import (
        WEIGHT_COLUMN_NAME,
    )
    from ml_hadoop_experiment_spark.compat.tensorflow import predictor

    assert WEIGHT_COLUMN_NAME == "weight"
    # module imports without TF; using it raises the gated ImportError
    with pytest.raises(ImportError, match="tensorflow"):
        predictor.import_graph_def("/nonexistent.pb")
    with pytest.raises(ImportError, match="tensorflow"):
        predictor.Predictor.from_graph("/nonexistent.pb", ["x:0"], ["y:0"])


def test_logging_conf_with_file_handler(tmp_path):
    """Reference logging.conf.py twin: INFO file handler with the same
    record format lands on the root logger."""
    import logging

    from ml_hadoop_experiment_spark.compat.tensorflow.logging_conf import (
        with_file_handler,
    )

    path = str(tmp_path / "run.log")
    root = logging.getLogger()
    before = list(root.handlers)
    try:
        with_file_handler(path)
        fh = [h for h in root.handlers if h not in before][0]
        assert fh.level == logging.INFO
        logging.getLogger("compat.test").warning("hello-compat")
        fh.flush()
        line = open(path).read()
        assert ":WARNING:compat.test: hello-compat" in line
    finally:
        for h in list(root.handlers):
            if h not in before:
                root.removeHandler(h)
                h.close()
