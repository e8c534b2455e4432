"""Compat: ``ml_hadoop_experiment.tensorflow.serving_input_receiver_fn_makers``
(reference serving_input_receiver_fn_makers.py:8-123). Requires the
tensorflow extra; VarLen specs split into ``k/shape, k/indices, k/values``
placeholders exactly as the reference does (:46-64)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

from ml_hadoop_experiment_spark import frameworks as _frameworks
from ml_hadoop_experiment_spark.compat._specs import to_engine_specs


def featurespec_to_input_placeholders(specs: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference :8-68 — (features, placeholders) dicts from a spec."""
    import tensorflow as tf  # optional extra

    receiver = _frameworks.make_serving_input_receiver_fn(to_engine_specs(specs))()
    return dict(receiver.features), dict(receiver.receiver_tensors)


def make_raw_serving_input_receiver_fn(specs: Dict[str, Any]) -> Callable[[], Any]:
    """Reference :71-104."""
    return _frameworks.make_serving_input_receiver_fn(to_engine_specs(specs))


def make_default_serving_input_receiver_fn(specs: Dict[str, Any]) -> Callable[[], Any]:
    """Reference :107-123."""
    return _frameworks.make_serving_input_receiver_fn(to_engine_specs(specs))
