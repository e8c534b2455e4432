"""Compat: ``ml_hadoop_experiment.tensorflow.evaluator_conf_helper``
(reference evaluator_conf_helper.py:5-44 — pure sizing math)."""

from ml_hadoop_experiment_spark.sizing import EvalConfig as Eval_config  # noqa: F401,N812
from ml_hadoop_experiment_spark.sizing import get_eval_params  # noqa: F401

__all__ = ["Eval_config", "get_eval_params"]
