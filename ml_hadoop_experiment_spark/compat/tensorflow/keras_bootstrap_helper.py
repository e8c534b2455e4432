"""Compat: ``ml_hadoop_experiment.tensorflow.keras_bootstrap_helper``.

Reference keras_bootstrap_helper.py:14-100 — bootstrap evaluation of a
Keras model via multiplicity sample weights. ``evaluate_bootstrap`` keeps
the reference signature (Keras model + transforms); ``build_eval_only_model``
needs TF. The engine's framework-free core (operators/bootstrap.py) is used
for the resampling math so the draw sequence is reference-identical
(np.unique over randint under the same seed).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np
import pandas as pd


def build_eval_only_model(model: Any, metrics: Optional[List[Any]] = None) -> Any:
    """Reference :14-37 — identity-output Keras model that recomputes
    loss/metrics from cached predictions. Requires the tensorflow extra."""
    import tensorflow as tf  # optional extra

    inputs = [tf.keras.Input(shape=o.shape[1:]) for o in model.outputs]
    outputs = [tf.keras.layers.Lambda(lambda x: x)(i) for i in inputs]
    eval_only = tf.keras.Model(inputs=inputs, outputs=outputs)
    eval_only.compile(loss=model.loss, metrics=metrics, weighted_metrics=[])
    return eval_only


def evaluate_bootstrap(
    model: Any,
    df: pd.DataFrame,
    nb_bootstrap: int,
    input_transform: Callable[[pd.DataFrame], Any],
    label_transform: Callable[[pd.DataFrame], Any],
    metrics: Optional[List[Any]] = None,
    weight_transform: Optional[Callable[[pd.DataFrame], Any]] = None,
    seed: Optional[int] = None,
) -> Dict[str, List[float]]:
    """Reference :40-100 — predict once, evaluate ``nb_bootstrap`` times
    under multiplicity weights drawn exactly like the reference
    (np.unique(np.random.randint(n, size=n), return_counts) under ``seed``).

    Works with any model exposing ``predict`` and metric callables taking
    (labels, predictions, sample_weight); for a compiled Keras model the
    loss/metrics are evaluated through ``build_eval_only_model`` when TF is
    installed, otherwise pass explicit metric callables via ``metrics`` as
    {name: fn} or [(name, fn)].
    """
    n = len(df)
    predictions = np.asarray(model.predict(input_transform(df)))
    labels = np.asarray(label_transform(df))
    if labels.ndim > 1 and labels.shape[0] == 1:
        labels = labels[0]
    weight_columns = None if weight_transform is None else np.asarray(weight_transform(df))
    if weight_columns is not None and weight_columns.ndim > 1 and weight_columns.shape[0] == 1:
        weight_columns = weight_columns[0]

    metric_fns: Dict[str, Callable[[np.ndarray, np.ndarray, np.ndarray], float]]
    if isinstance(metrics, dict):
        metric_fns = dict(metrics)
    elif metrics and all(isinstance(m, (tuple, list)) and len(m) == 2 for m in metrics):
        metric_fns = {name: fn for name, fn in metrics}
    else:
        from ml_hadoop_experiment_spark.operators.bootstrap import BUILTIN_METRICS

        metric_fns = dict(BUILTIN_METRICS)

    if seed is not None:
        np.random.seed(seed)

    out: Dict[str, List[float]] = {name: [] for name in metric_fns}
    preds = predictions.reshape(len(labels), -1).squeeze()
    for _ in range(nb_bootstrap):
        picked, counts = np.unique(np.random.randint(n, size=n), return_counts=True)
        w = np.zeros(n)
        w[picked] = counts
        if weight_columns is not None:
            w = w * weight_columns
        for name, fn in metric_fns.items():
            out[name].append(fn(labels, preds, w))
    return out
