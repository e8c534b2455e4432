"""Compat: ``ml_hadoop_experiment.tensorflow.pandas_to_tensors``
(reference pandas_to_tensors.py:66-123) — spec-driven pandas batch to
{name: ndarray} with null-default fill and the VarLen
``k/shape, k/indices, k/values`` split."""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np
import pandas as pd

from ml_hadoop_experiment_spark.compat._specs import to_engine_specs
from ml_hadoop_experiment_spark.schema.conversion import make_dense_batch_fn


def generate_create_tensor_fn(
    feature_spec: Dict[str, Any],
) -> Callable[[pd.DataFrame], Dict[str, np.ndarray]]:
    return make_dense_batch_fn(to_engine_specs(feature_spec))
