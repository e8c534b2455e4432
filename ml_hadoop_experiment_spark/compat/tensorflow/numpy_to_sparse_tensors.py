"""Compat: ``ml_hadoop_experiment.tensorflow.numpy_to_sparse_tensors``
(reference numpy_to_sparse_tensors.py:13-57) — ragged lists to COO
(indices Nx2, values, dense_shape), same goldens including the all-empty
fast path."""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

from ml_hadoop_experiment_spark.compat._specs import dtype_name
from ml_hadoop_experiment_spark.schema.conversion import create_sparse_coo


def create_sparse_np_stacked(
    features: Any, dtype: Any
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    indices, values, dense_shape = create_sparse_coo(
        list(features), dtype_name(dtype)
    )
    return indices, values, dense_shape
