"""Compat: ``ml_hadoop_experiment.tensorflow.keras_bootstrap_helper``.

Reference keras_bootstrap_helper.py:14-100 — bootstrap evaluation of a
Keras model via multiplicity sample weights. ``evaluate_bootstrap`` keeps
the reference signature; metric routing follows the reference contract:

- a Keras model + Keras-style ``metrics`` (metric objects / compile
  strings / None) evaluates through ``build_eval_only_model`` —
  recomputing the model's compiled loss and the passed metrics from
  cached predictions, with the bootstrap multiplicities applied as
  ``weighted_metrics`` sample weights, exactly like the reference loop
  (:71-100). Requires the tensorflow extra; raises ImportError without it
  instead of silently computing something else.
- explicit metric *callables* — ``{name: fn}`` or ``[(name, fn)]`` with
  ``fn(labels, preds, sample_weight)`` — run through the engine's
  framework-free resampling core (operators/bootstrap.py), whose draw
  sequence is reference-identical (np.unique over randint under the same
  seed).
- a non-Keras model (anything without a compiled ``loss``) with
  ``metrics=None`` uses the engine's BUILTIN_METRICS — the documented
  framework-free default.

Anything else raises ValueError rather than substituting builtin metrics
(the round-1 advisor found the silent mse/mae fallback returned wrong
keys/values for reference-style calls with no error).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np
import pandas as pd


def build_eval_only_model(model: Any, metrics: Optional[List[Any]] = None) -> Any:
    """Reference :14-37 — identity-output Keras model that recomputes the
    source model's loss and ``metrics`` from cached predictions. The
    metrics compile as ``weighted_metrics`` so bootstrap multiplicity
    weights apply to them (reference :36). Requires the tensorflow extra."""
    import tensorflow as tf  # optional extra

    names = list(
        getattr(model, "output_names", None)
        or [f"output_{i}" for i in range(len(model.outputs))]
    )
    inputs = []
    outputs = []
    for name, out in zip(names, model.outputs):
        in_layer = tf.keras.Input(
            shape=tuple(out.shape[1:]), name=f"pred_{name}", dtype=out.dtype
        )
        inputs.append(in_layer)
        outputs.append(tf.keras.layers.Lambda(lambda x: x, name=name)(in_layer))
    eval_model = tf.keras.Model(inputs=inputs, outputs=outputs)
    # optimizer is never used — the model is not trainable (reference :35)
    eval_model.compile(optimizer="adam", loss=model.loss, weighted_metrics=metrics)
    return eval_model


def _is_callable_metrics(metrics: Any) -> bool:
    if isinstance(metrics, dict):
        return True
    return bool(metrics) and all(
        isinstance(m, (tuple, list)) and len(m) == 2 and callable(m[1])
        for m in metrics
    )


def _bootstrap_multiplicities(n: int) -> np.ndarray:
    picked, counts = np.unique(np.random.randint(n, size=n), return_counts=True)
    w = np.zeros(n)
    w[picked] = counts
    return w


def _evaluate_with_callables(
    model: Any,
    df: pd.DataFrame,
    nb_bootstrap: int,
    input_transform: Callable[[pd.DataFrame], Any],
    label_transform: Callable[[pd.DataFrame], Any],
    metric_fns: Dict[str, Callable[[np.ndarray, np.ndarray, np.ndarray], float]],
    weight_transform: Optional[Callable[[pd.DataFrame], Any]],
    seed: Optional[int],
) -> Dict[str, List[float]]:
    n = len(df)
    predictions = np.asarray(model.predict(input_transform(df)))
    labels = np.asarray(label_transform(df))
    if labels.ndim > 1 and labels.shape[0] == 1:
        labels = labels[0]
    weight_columns = None if weight_transform is None else np.asarray(weight_transform(df))
    if weight_columns is not None and weight_columns.ndim > 1 and weight_columns.shape[0] == 1:
        weight_columns = weight_columns[0]

    if seed is not None:
        np.random.seed(seed)

    out: Dict[str, List[float]] = {name: [] for name in metric_fns}
    preds = predictions.reshape(len(labels), -1).squeeze()
    for _ in range(nb_bootstrap):
        w = _bootstrap_multiplicities(n)
        if weight_columns is not None:
            w = w * weight_columns
        for name, fn in metric_fns.items():
            out[name].append(fn(labels, preds, w))
    return out


def _evaluate_keras(
    model: Any,
    df: pd.DataFrame,
    nb_bootstrap: int,
    input_transform: Callable[[pd.DataFrame], Any],
    label_transform: Callable[[pd.DataFrame], Any],
    metrics: Optional[List[Any]],
    weight_transform: Optional[Callable[[pd.DataFrame], Any]],
    seed: Optional[int],
) -> Dict[str, List[float]]:
    """The reference evaluation loop (:71-100): predict once, then
    ``eval_only.evaluate`` per bootstrap under multiplicity sample
    weights keyed by output name."""
    eval_only = build_eval_only_model(model, metrics)
    predictions = model.predict(input_transform(df), verbose=0)
    labels = label_transform(df)
    weight_columns = None if weight_transform is None else weight_transform(df)
    n = len(df)
    output_names = list(
        getattr(eval_only, "output_names", None)
        or [f"output_{i}" for i in range(len(eval_only.outputs))]
    )

    if seed is not None:
        np.random.seed(seed)

    results = []
    for _ in range(nb_bootstrap):
        w = _bootstrap_multiplicities(n)
        if weight_columns is None:
            sample_weights = {name: w for name in output_names}
        else:
            sample_weights = {
                name: w * column
                for name, column in zip(output_names, weight_columns)
            }
        results.append(
            eval_only.evaluate(
                predictions, labels, sample_weight=sample_weights, verbose=0
            )
        )
    metrics_names = (
        eval_only.metrics_names
        if weight_transform is not None
        # TF 1.15 prefixes 'weighted_' to weighted metric names (reference :96-99)
        else [s.replace("weighted_", "") for s in eval_only.metrics_names]
    )
    return {
        metric: values
        for metric, values in zip(metrics_names, np.array(results).T.tolist())
    }


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

    Metric routing (see module docstring): Keras models evaluate their
    compiled loss + ``metrics`` through ``build_eval_only_model`` (needs
    the tensorflow extra); explicit callables (``{name: fn}`` /
    ``[(name, fn)]``) run framework-free; unrecognized metrics raise."""
    if _is_callable_metrics(metrics):
        metric_fns = (
            dict(metrics)
            if isinstance(metrics, dict)
            else {name: fn for name, fn in metrics}
        )
        return _evaluate_with_callables(
            model, df, nb_bootstrap, input_transform, label_transform,
            metric_fns, weight_transform, seed,
        )

    is_keras_model = getattr(model, "loss", None) is not None and hasattr(
        model, "outputs"
    )
    if is_keras_model:
        try:
            import tensorflow  # noqa: F401  # optional extra
        except ImportError as e:
            raise ImportError(
                "evaluating a compiled Keras model's loss/metrics requires "
                "the tensorflow extra; without it pass explicit metric "
                "callables as {name: fn} or [(name, fn)]"
            ) from e
        return _evaluate_keras(
            model, df, nb_bootstrap, input_transform, label_transform,
            metrics, weight_transform, seed,
        )

    if metrics is None:
        from ml_hadoop_experiment_spark.operators.bootstrap import BUILTIN_METRICS

        return _evaluate_with_callables(
            model, df, nb_bootstrap, input_transform, label_transform,
            dict(BUILTIN_METRICS), weight_transform, seed,
        )

    raise ValueError(
        "unrecognized metrics for a non-Keras model: pass {name: fn}, "
        "[(name, fn)] callables, or a compiled Keras model for Keras-style "
        "metrics (builtin metrics are never silently substituted)"
    )
