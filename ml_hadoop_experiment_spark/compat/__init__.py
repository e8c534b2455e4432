"""Drop-in API compatibility with ``criteo/ml-hadoop-experiment``.

A reference user switches by changing one import root::

    from ml_hadoop_experiment.tensorflow import sampling          # before
    from ml_hadoop_experiment_spark.compat.tensorflow import sampling  # after

Every public module/function/signature of the reference is mirrored here
and delegates to the engine's Spark-first operators. TensorFlow/PyTorch
remain optional: functions that genuinely need the framework raise a clear
ImportError when it is absent; everything else (sampling, vocabulary,
TFRecord I/O via the TF-free codec, spec validation, bootstrap, sizing)
runs without any ML framework installed.

Spec objects are accepted in BOTH forms everywhere: the engine's
``schema.feature_spec`` dataclasses or ``tf.io.FixedLenFeature`` /
``tf.io.VarLenFeature`` (duck-typed on shape/dtype/default_value — no TF
import required to pass them through).
"""

from ml_hadoop_experiment_spark.compat._specs import to_engine_specs  # noqa: F401
