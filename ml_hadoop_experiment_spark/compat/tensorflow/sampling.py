"""Compat: ``ml_hadoop_experiment.tensorflow.sampling``.

Reference tensorflow/sampling.py:10-98 — identical signatures and
semantics: unseeded ``rand`` column, Murmur3 ``sampling_hash`` scaled to
[0,1), trivial-ratio folding, single-pass stratified filter with relative
reweighting and null-predicate-as-negative. All delegate to the engine's
``operators/sampling.py`` with the fidelity (non-portable) hash mode.
"""

from __future__ import annotations

from typing import List, Tuple

import pyspark.sql
from pyspark.sql import Column, DataFrame

from ml_hadoop_experiment_spark.operators import sampling as _s


def add_random_sampling_col(df: DataFrame) -> Tuple[str, DataFrame]:
    # reference is unseeded (sampling.py:11) — pass seed=None explicitly
    return _s.add_random_sampling_col(df, seed=None)


def add_deterministic_sampling_col(
    df: DataFrame, columns_for_sample: List[str]
) -> Tuple[str, DataFrame]:
    # Murmur3 mode = bit-identical to reference sampling.py:15-23
    return _s.add_deterministic_sampling_col(df, columns_for_sample, portable=False)


def get_filter_sampling_ratio(column: Column, sampling_ratio: float) -> Column:
    return _s.get_filter_sampling_ratio(column, sampling_ratio)


def sample_with_predicate(
    df: DataFrame,
    global_sampling: float,
    positive_sampling: float,
    negative_sampling: float,
    positive_predicate: pyspark.sql.Column,
    columns_for_sample: List[str] = [],  # noqa: B006 - reference signature
) -> DataFrame:
    return _s.sample_with_predicate(
        df,
        global_sampling,
        positive_sampling,
        negative_sampling,
        positive_predicate,
        columns_for_sample=list(columns_for_sample) or None,
        portable=False,
        seed=None,
    )
