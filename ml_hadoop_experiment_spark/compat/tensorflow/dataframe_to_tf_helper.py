"""Compat: ``ml_hadoop_experiment.tensorflow.dataframe_to_tf_helper``.

Reference tensorflow/dataframe_to_tf_helper.py:15-163 — Spark<->TF type
mapping and schema-compat validation. TF-free: dtypes are accepted as
tf.DTypes (duck-typed on ``.name``) or plain strings; specs as tf.io or
engine dataclasses. Semantics identical (same exact map, same lossless-
widening truth table, same rank/nullability rules — asserted by the
reference's own test matrix, tests/tensorflow/test_dataframe_to_tf_helper.py).
"""

from __future__ import annotations

from typing import Any, Dict

import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ml_hadoop_experiment_spark.compat._specs import (
    dtype_name,
    to_engine_spec,
    to_engine_specs,
)
from ml_hadoop_experiment_spark.schema import feature_spec as _fs


def get_exact_sparksql_type(tensorflow_type: Any) -> T.DataType:
    """Reference :15-23."""
    return _fs.exact_spark_type(dtype_name(tensorflow_type))


def can_convert_x_to_y(x: T.DataType, y: Any) -> bool:
    """Reference :26-34 — lossless widening only."""
    return _fs.can_convert(x, dtype_name(y))


def exact_data_type_for_feature_spec(feature_spec: Any) -> T.DataType:
    """Reference :38-41."""
    return _fs.exact_data_type_for_spec(to_engine_spec(feature_spec))


def exact_data_type_for_fixed_feature_spec(feature_spec: Any) -> T.DataType:
    """Reference :43-52."""
    return _fs.exact_data_type_for_spec(to_engine_spec(feature_spec))


def exact_data_type_for_varlen_feature_spec(feature_spec: Any) -> T.DataType:
    """Reference :55-59."""
    return _fs.exact_data_type_for_spec(to_engine_spec(feature_spec))


def exact_structfield_for_feature_spec(name: str, feature_spec: Any) -> T.StructField:
    """Reference :62-66 — nullable iff FixedLen has a default."""
    return _fs.exact_structfield_for_spec(name, to_engine_spec(feature_spec))


def is_datatype_compatible_with_feature_spec(feature_spec: Any, datatype: T.DataType) -> bool:
    """Reference :69-72."""
    return _fs.is_datatype_compatible_with_spec(to_engine_spec(feature_spec), datatype)


def is_datatype_compatible_with_fixed_feature_spec(
    feature_spec: Any, datatype: T.DataType
) -> bool:
    """Reference :74-93 — rank match by ArrayType unwrapping + widening."""
    return _fs.is_datatype_compatible_with_spec(to_engine_spec(feature_spec), datatype)


def is_datatype_compatible_with_varlen_feature_spec(
    feature_spec: Any, datatype: T.DataType
) -> bool:
    """Reference :96-112 — 1-D array or scalar of a widenable type."""
    return _fs.is_datatype_compatible_with_spec(to_engine_spec(feature_spec), datatype)


def is_structfield_compatible_with_feature_spec(
    field: T.StructField, feature_spec: Any
) -> bool:
    """Reference :115-134 — type + nullability (nullable needs default)."""
    return _fs.is_structfield_compatible_with_spec(field, to_engine_spec(feature_spec))


def is_dataframe_compatible_with_feature_spec(
    df: DataFrame, name: str, feature_spec: Any
) -> bool:
    """Reference :137-146 — name presence + field compatibility."""
    matches = [f for f in df.schema.fields if f.name == name]
    if not matches:
        return False
    return _fs.is_structfield_compatible_with_spec(matches[0], to_engine_spec(feature_spec))


def is_dataframe_compatible_with_feature_specs(
    df: DataFrame, specs: Dict[str, Any]
) -> bool:
    """Reference :149-163 — whole-schema conjunction."""
    return _fs.is_dataframe_compatible_with_specs(df, to_engine_specs(specs))
