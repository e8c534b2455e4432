"""Compat: ``ml_hadoop_experiment.tensorflow.constant``
(reference tensorflow/constant.py:1)."""

from ml_hadoop_experiment_spark.operators.sampling import (  # noqa: F401
    WEIGHT_COLUMN_NAME,
)
