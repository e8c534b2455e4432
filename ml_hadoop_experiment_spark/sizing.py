"""Evaluator sizing math (pure function, no Spark).

Parity target: reference ``tensorflow/evaluator_conf_helper.py:12-44``
(golden-tested there at tests/tensorflow/test_evaluator_conf_helper.py:15-40):
checkpoint cadence equals ``nb_examples_before_eval``; the evaluation batch
is sized so evaluators keep pace with workers, split into ``steps`` chunks
when it exceeds ``max_eval_batch_size``.
"""

from __future__ import annotations

import math
from typing import NamedTuple


class EvalConfig(NamedTuple):
    throttle_secs: int
    save_checkpoints_steps: int
    evaluation_batch_size: int
    steps: int


def get_eval_params(
    nb_workers: int,
    nb_evaluators: int,
    nb_examples_before_eval: int,
    max_eval_batch_size: int = 100_000,
) -> EvalConfig:
    for var, val in {
        "nb_examples_before_eval": nb_examples_before_eval,
        "nb_workers": nb_workers,
        "nb_evaluators": nb_evaluators,
        "max_eval_batch_size": max_eval_batch_size,
    }.items():
        if val <= 0:
            raise ValueError(f"{var} can't be <= 0. Got {val}")

    save_checkpoints_steps = nb_examples_before_eval
    evaluation_batch_size = (save_checkpoints_steps / nb_workers) * nb_evaluators
    steps = 1
    if evaluation_batch_size > max_eval_batch_size:
        steps = math.ceil(evaluation_batch_size / max_eval_batch_size)
        evaluation_batch_size = evaluation_batch_size / steps
    throttle_secs = 5
    return EvalConfig(throttle_secs, save_checkpoints_steps, int(evaluation_batch_size), steps)
