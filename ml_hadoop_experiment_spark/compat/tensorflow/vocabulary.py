"""Compat: ``ml_hadoop_experiment.tensorflow.vocabulary``.

Reference tensorflow/vocabulary.py:84-121 — ``gen_vocab_files`` dispatches
on list vs dict of columns, takes an RDD of Rows, and writes one newline-
joined ``.voc`` file per key (empty strings skipped). The engine computes
the distinct-with-threshold aggregation as a DataFrame groupBy (Catalyst
map-side combine replaces the reference's ``reduceByKey``, SURVEY.md §2
A1) and accepts an RDD *or* a DataFrame; RDDs are lifted back into a
DataFrame first, so the scale hazard of the reference (full distinct sets
collected to the driver, vocabulary.py:50) is bounded by an explicit cap.
"""

from __future__ import annotations

import os
from functools import singledispatch
from typing import Any, Dict, List, Union

import pyspark
from pyspark.sql import DataFrame

from ml_hadoop_experiment_spark.operators.vocabulary import build_vocabulary


def _as_dataframe(data: Union[pyspark.RDD, DataFrame]) -> DataFrame:
    if isinstance(data, DataFrame):
        return data
    return data.toDF()


def _write_files(
    vocab_values: Dict[str, List[Any]], path: str, col_names: Any
) -> List[str]:
    """One ``{key}.voc`` file per key, newline-joined, '' skipped
    (reference vocabulary.py:58-80)."""
    os.makedirs(path, exist_ok=True)
    out: List[str] = []
    for key in col_names:
        values = vocab_values.get(key, [])
        fpath = os.path.join(path, f"{key}.voc")
        with open(fpath, "w") as f:
            f.write("\n".join(str(v) for v in values if v != ""))
        out.append(fpath)
    return out


@singledispatch
def gen_vocab_files(
    columns: Union[List[str], Dict[str, List[str]]],
    rdd: Union[pyspark.RDD, DataFrame],
    path: str,
    threshold: int = 0,
) -> List[str]:
    raise NotImplementedError("Unsupported type")


@gen_vocab_files.register(list)
def gen_vocab_files_from_list(
    columns: List[str],
    rdd: Union[pyspark.RDD, DataFrame],
    path: str,
    threshold: int = 0,
) -> List[str]:
    return gen_vocab_files_from_dict(
        {c: [c] for c in columns}, rdd, path, threshold
    )


@gen_vocab_files.register(dict)
def gen_vocab_files_from_dict(
    columns: Dict[str, List[str]],
    rdd: Union[pyspark.RDD, DataFrame],
    path: str,
    threshold: int = 0,
) -> List[str]:
    df = _as_dataframe(rdd)
    vocab_values = build_vocabulary(df, columns, threshold)
    return _write_files(vocab_values, path, columns)
