"""Evaluator sizing math (pure function, no Spark).

Parity target: reference ``tensorflow/evaluator_conf_helper.py:12-44``
(golden-tested there at tests/tensorflow/test_evaluator_conf_helper.py:15-40).
Semantics: checkpoints are cut every ``nb_examples_before_eval`` examples;
the evaluation batch is sized so the evaluator pool keeps pace with the
worker pool (evaluation time of a checkpoint ≈ time to produce one), and a
batch above ``max_eval_batch_size`` is split into ``steps`` equal chunks.
The 5-second throttle is the reference's conservative constant.
"""

from __future__ import annotations

from math import ceil
from typing import NamedTuple


class EvalConfig(NamedTuple):
    throttle_secs: int
    save_checkpoints_steps: int
    evaluation_batch_size: int
    steps: int


#: reference constant (evaluator_conf_helper.py:42)
_THROTTLE_SECS = 5


def _require_positive(name: str, value: int) -> None:
    if value <= 0:
        raise ValueError(f"{name} can't be <= 0. Got {value}")


def get_eval_params(
    nb_workers: int,
    nb_evaluators: int,
    nb_examples_before_eval: int,
    max_eval_batch_size: int = 100_000,
) -> EvalConfig:
    _require_positive("nb_examples_before_eval", nb_examples_before_eval)
    _require_positive("nb_workers", nb_workers)
    _require_positive("nb_evaluators", nb_evaluators)
    _require_positive("max_eval_batch_size", max_eval_batch_size)

    checkpoint_every = nb_examples_before_eval
    # pace the evaluator pool against the worker pool
    batch = checkpoint_every / nb_workers * nb_evaluators
    if batch <= max_eval_batch_size:
        return EvalConfig(_THROTTLE_SECS, checkpoint_every, int(batch), 1)
    n_chunks = ceil(batch / max_eval_batch_size)
    return EvalConfig(
        _THROTTLE_SECS, checkpoint_every, int(batch / n_chunks), n_chunks
    )
