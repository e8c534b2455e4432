"""Compat: ``ml_hadoop_experiment.pytorch.spark_inference``.

Reference pytorch/spark_inference.py:57-134 — torch inference columns whose
``inference_fn(artifacts, features, device)`` receives the resolved device
(``cuda:{n}`` from the GPU allocator when CUDA is available, else ``cpu``,
:224-228). The device is resolved lazily inside the Python worker by the
same allocator the engine ships (common/gpu.py — Spark 3 resource API
first, lockfile fallback, with the reference's falsy-device-0 bug fixed);
``torch.no_grad`` wraps the call when torch is installed. The preprocessing
variant honors ``dataloader_max_retry`` (the reference hardcodes 3,
:176-185).
"""

from __future__ import annotations

import uuid
from typing import Any, Callable, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DataType

from ml_hadoop_experiment_spark.operators import inference as _inf

artifact_type = Any
pandas_inference_udf = Callable[[Any, Tuple[pd.Series, ...], str], pd.Series]


def _resolve_device(lock_file: str, allocation_file: str) -> str:
    try:
        import torch

        if torch.cuda.is_available():
            from ml_hadoop_experiment_spark.common.gpu import get_cuda_device

            n = get_cuda_device(
                torch.cuda.device_count(),
                lock_file=lock_file,
                allocation_file=allocation_file,
            )
            return f"cuda:{n}"
    except ImportError:
        pass
    return "cpu"


def _device_aware(fn: Callable[..., Any], lock_file: str, allocation_file: str):
    def _wrapped(artifacts: Any, features: Any) -> Any:
        device = _resolve_device(lock_file, allocation_file)
        try:
            import torch

            with torch.no_grad():
                return fn(artifacts, features, device)
        except ImportError:
            return fn(artifacts, features, device)

    return _wrapped


def with_inference_column(
    df: DataFrame,
    artifacts: artifact_type,
    input_cols: List[str],
    inference_fn: pandas_inference_udf,
    output_type: DataType,
    batch_size: int = 1,
    output_col: str = "prediction",
    num_threads: int = 8,
) -> DataFrame:
    """Reference :108-134."""
    file_id = str(uuid.uuid4())
    return _inf.with_inference_column(
        df,
        artifacts,
        input_cols,
        _device_aware(
            inference_fn, f"/tmp/lockfile_{file_id}", f"/tmp/allocation_cuda_{file_id}"
        ),
        output_type=output_type,
        batch_size=batch_size,
        output_col=output_col,
        num_threads=num_threads,
    )


def with_inference_column_and_preprocessing(
    df: DataFrame,
    artifacts: artifact_type,
    input_cols: List[str],
    preprocessing: Callable[..., Any],
    inference_fn: Callable[..., Any],
    output_type: DataType,
    batch_size: int = 1,
    output_col: str = "prediction",
    num_threads: int = 8,
    num_workers_preprocessing: int = 8,
    dataloader_timeout_secs: int = 60,
    dataloader_max_retry: int = 3,
) -> DataFrame:
    """Reference :57-105 — row-wise preprocessing parallelized in the
    worker (engine: worker-process pool matching the reference's
    ``DataLoader(num_workers=...)`` process semantics, so pure-Python
    CPU-bound transforms actually parallelize; same ordering guarantees),
    then batched inference with retry on RuntimeError."""
    file_id = str(uuid.uuid4())
    lock = f"/tmp/lockfile_{file_id}"
    alloc = f"/tmp/allocation_cuda_{file_id}"

    def _prep(*row_values: Any) -> Any:
        return preprocessing(row_values)

    def _infer(artifacts: Any, preprocessed: List[Any]) -> Any:
        device = _resolve_device(lock, alloc)
        try:
            import torch

            with torch.no_grad():
                return inference_fn(artifacts, preprocessed, device)
        except ImportError:
            return inference_fn(artifacts, preprocessed, device)

    return _inf.with_inference_column_and_preprocessing(
        df,
        artifacts,
        input_cols,
        _prep,
        _infer,
        output_type=output_type,
        batch_size=batch_size,
        output_col=output_col,
        num_threads=num_threads,
        num_workers_preprocessing=num_workers_preprocessing,
        max_retry=dataloader_max_retry,
        preprocessing_pool="process",
    )
