"""Compat: ``ml_hadoop_experiment.sklearn.spark_inference``
(reference sklearn/spark_inference.py:10-55) — all DataFrame columns feed
``model.predict_proba`` through an Arrow-vectorized UDF."""

from __future__ import annotations

from typing import Any, Callable, Optional

import pandas as pd
import pyspark.sql as sp
from pyspark.sql.types import FloatType

from ml_hadoop_experiment_spark.operators.inference import (
    with_sklearn_inference_column as _engine_sklearn,
)


def with_inference_column(
    df: sp.DataFrame,
    model: Any,
    output_column_name: str = "prediction",
    output_column_type: sp.types.DataType = FloatType(),
    postprocessing_fn: Optional[Callable[[Any], pd.Series]] = None,
) -> sp.DataFrame:
    return _engine_sklearn(
        df,
        model,
        output_col=output_column_name,
        output_type=output_column_type,
        postprocessing_fn=postprocessing_fn,
    )
