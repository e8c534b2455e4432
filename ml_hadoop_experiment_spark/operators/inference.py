"""Vectorized model-inference column operators.

Parity targets (SURVEY.md §2.8):

- ``with_inference_column`` — the framework-agnostic core of the reference's
  TF ``with_inference`` (tensorflow/dataframe_prediction_helper.py:189-256),
  PyTorch ``with_inference_column`` (pytorch/spark_inference.py:108-134,
  204-241) and sklearn variant (sklearn/spark_inference.py:10-55). One Arrow
  ``pandas_udf`` over N input columns producing one output column of a
  declared type; artifacts arrive via broadcast with lazy worker-side load;
  an inner micro-batch loop bounds model peak memory.

- the reference wraps its UDF as ``explode(array(udf(...)))`` to defeat
  duplicate evaluation (SPARK-17728 workaround, dataframe_prediction_helper.
  py:252-256). On modern Spark the engine instead marks the UDF
  non-deterministic, which prevents Catalyst from duplicating or re-running
  it during plan rewrites — no row-multiplying construct needed.

- worker-state reuse: thread-count pinning happens once per Python worker
  (reference dataframe_prediction_helper.py:220-226); the broadcast wrapper
  loads the model once per worker process (common/spark_inference.py:39-41).

Scale: the UDF is the only Python crossing; everything else stays in
whole-stage codegen. Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and the inner loop by
``batch_size`` — together they cap per-task memory no matter how large the
input partition is, which is what makes this safe on 100 TB inputs.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

from ml_hadoop_experiment_spark.common.artifacts import (
    SerializableObj,
    broadcast,
    from_broadcasted,
)
from ml_hadoop_experiment_spark.common.batching import split_in_batches

#: fn(artifacts, (series, ...)) -> pd.Series | list | np.ndarray
InferenceFn = Callable[[Any, Tuple[pd.Series, ...]], Any]


def _pin_threads(num_threads: Optional[int]) -> None:
    """Best-effort CPU thread pinning for math libs, once per worker.

    Mirrors the reference's per-worker thread setup (TF inter/intra-op at
    dataframe_prediction_helper.py:220-226, torch at spark_inference.py:
    216-219) without importing any framework: the env vars are honored by
    OpenMP/MKL/BLAS and by TF/torch when they initialize lazily.
    """
    if num_threads is None:
        return
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        os.environ.setdefault(var, str(num_threads))


def with_inference_column(
    df: DataFrame,
    artifacts: Any,
    input_cols: Sequence[Union[str, Column]],
    inference_fn: InferenceFn,
    output_type: Union[DataType, str] = "double",
    batch_size: int = 1024,
    output_col: str = "prediction",
    num_threads: Optional[int] = None,
) -> DataFrame:
    """Add one model-output column computed by an Arrow-vectorized UDF.

    ``artifacts`` may be a ``SerializableObj``, a plain pickleable object, or
    a list of either; workers receive the resolved object(s).
    ``inference_fn(artifacts, batch)`` gets a tuple of ``pd.Series`` (one per
    input column, at most ``batch_size`` rows) and returns a Series-like of
    the same length.
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    spark = df.sparkSession
    broadcasted = broadcast(spark, artifacts)

    def _udf(*cols: pd.Series) -> pd.Series:
        _pin_threads(num_threads)
        resolved = from_broadcasted(broadcasted)
        outs: List[pd.Series] = []
        for batch in split_in_batches(cols, batch_size):
            result = inference_fn(resolved, batch)
            if not isinstance(result, pd.Series):
                result = pd.Series(list(result))
            if len(result) != len(batch[0]):
                raise ValueError(
                    f"inference_fn returned {len(result)} rows for a "
                    f"{len(batch[0])}-row batch"
                )
            outs.append(result)
        return pd.concat(outs, ignore_index=True) if outs else pd.Series([], dtype=object)

    udf = F.pandas_udf(_udf, returnType=output_type)
    # Exactly-once evaluation (reference regression tests, SURVEY.md §5.2):
    # non-deterministic UDFs are never collapsed/duplicated by Catalyst.
    udf = udf.asNondeterministic()
    cols = [F.col(c) if isinstance(c, str) else c for c in input_cols]
    return df.withColumn(output_col, udf(*cols))


def with_sklearn_inference_column(
    df: DataFrame,
    model: Any,
    output_col: str = "prediction",
    output_type: Union[DataType, str] = "float",
    postprocessing_fn: Optional[Callable[[Any], pd.Series]] = None,
    batch_size: int = 8192,
) -> DataFrame:
    """sklearn adapter: all DataFrame columns -> ``model.predict_proba``.

    Reference parity: sklearn/spark_inference.py:10-55 (including its
    validation that the model exposes ``predict_proba`` and that the whole
    row, as a pandas DataFrame with original column names, is the model
    input). Without ``postprocessing_fn`` the raw ``predict_proba`` output is
    coerced to a Series, matching the reference's contiguous-array fallback.
    """
    if df is None or not isinstance(df, DataFrame):
        raise ValueError("Missing or invalid dataframe.")
    probe = model
    if isinstance(model, SerializableObj):
        # artifact wrapper: the driver-side eagerly-loaded object backs the
        # validation; workers still resolve lazily via the broadcast
        probe = from_broadcasted(model.broadcasted)
    if probe is None or getattr(probe, "predict_proba", None) is None:
        raise ValueError("Missing or invalid model.")

    columns = list(df.columns)

    def _infer(mdl: Any, batch: Tuple[pd.Series, ...]) -> pd.Series:
        pdf = pd.DataFrame({c: s.reset_index(drop=True) for c, s in zip(columns, batch)})
        result = mdl.predict_proba(pdf)
        if postprocessing_fn is not None:
            result = postprocessing_fn(result)
        if not isinstance(result, pd.Series):
            result = pd.Series(list(result))
        return result

    return with_inference_column(
        df,
        model,
        columns,
        _infer,
        output_type=output_type,
        batch_size=batch_size,
        output_col=output_col,
    )


# --- process-pool plumbing for CPU-bound preprocessing (U7) ---------------
# The mapped callable must be importable by pool workers, so it lives at
# module level; the user's preprocessing fn (often a closure, which stdlib
# pickle — used by multiprocessing — cannot serialize) is shipped as
# cloudpickle bytes and materialized once per pool worker by the
# initializer.

_PROCESS_PREPROC_FN: Optional[Callable[..., Any]] = None


def _init_process_preproc(pickled_fn: bytes) -> None:
    global _PROCESS_PREPROC_FN
    import pickle

    _PROCESS_PREPROC_FN = pickle.loads(pickled_fn)


def _call_process_preproc(row: Tuple[Any, ...]) -> Any:
    assert _PROCESS_PREPROC_FN is not None, "pool initializer did not run"
    return _PROCESS_PREPROC_FN(*row)


def with_inference_column_and_preprocessing(
    df: DataFrame,
    artifacts: Any,
    input_cols: Sequence[Union[str, Column]],
    preprocessing: Callable[..., Any],
    inference_fn: Callable[[Any, List[Any]], Any],
    output_type: Union[DataType, str] = "double",
    batch_size: int = 1024,
    output_col: str = "prediction",
    num_threads: Optional[int] = None,
    num_workers_preprocessing: int = 8,
    max_retry: int = 3,
    preprocessing_pool: str = "thread",
) -> DataFrame:
    """Inference with row-wise preprocessing parallelized inside the worker.

    Parity: the reference's torch ``with_inference_column_and_preprocessing``
    (pytorch/spark_inference.py:57-105, 137-173) runs per-row preprocessing
    through a ``DataLoader(num_workers=...)`` — separate *processes* — and
    retries the batch on RuntimeError. Engine equivalent: a pool maps
    ``preprocessing(*row_values)`` over the Arrow batch (order-preserving),
    then ``inference_fn(artifacts, preprocessed_list)`` scores it.

    ``preprocessing_pool`` picks the pool kind:

    - ``"thread"``: right when preprocessing releases the GIL (numpy, PIL,
      tokenizers, I/O) — zero IPC cost.
    - ``"process"``: matches the reference's DataLoader worker-process
      semantics for pure-Python CPU-bound transforms, which a thread pool
      cannot actually parallelize. The preprocessing fn crosses to pool
      workers via cloudpickle (closures work); inputs/outputs must be
      picklable. One pool serves every micro-batch of the task.

    The retry honors ``max_retry`` — the reference hardcodes ``n_try > 3``
    and ignores its ``dataloader_max_retry`` argument (spark_inference.py:
    176-185); that is a bug, not a behavior to keep.
    """
    from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if max_retry < 1:
        raise ValueError(f"max_retry must be >= 1, got {max_retry}")
    if num_workers_preprocessing < 1:
        raise ValueError(
            f"num_workers_preprocessing must be >= 1, got {num_workers_preprocessing}"
        )
    if preprocessing_pool not in ("thread", "process"):
        raise ValueError(
            f"preprocessing_pool must be 'thread' or 'process', got {preprocessing_pool!r}"
        )
    spark = df.sparkSession
    broadcasted = broadcast(spark, artifacts)
    preproc_blob: Optional[bytes] = None
    if preprocessing_pool == "process":
        import pyspark.cloudpickle as cloudpickle

        preproc_blob = cloudpickle.dumps(preprocessing)

    def _make_pool():
        if preprocessing_pool == "process":
            return ProcessPoolExecutor(
                max_workers=num_workers_preprocessing,
                initializer=_init_process_preproc,
                initargs=(preproc_blob,),
            )
        return ThreadPoolExecutor(max_workers=num_workers_preprocessing)

    def _preprocess(pool, rows: List[Tuple[Any, ...]]) -> List[Any]:
        if preprocessing_pool == "process":
            # chunk to amortize IPC while keeping enough chunks to balance
            chunksize = max(1, len(rows) // (num_workers_preprocessing * 4))
            return list(pool.map(_call_process_preproc, rows, chunksize=chunksize))
        return list(pool.map(lambda r: preprocessing(*r), rows))

    def _udf(*cols: pd.Series) -> pd.Series:
        _pin_threads(num_threads)
        resolved = from_broadcasted(broadcasted)
        outs: List[pd.Series] = []
        with _make_pool() as pool:
            for batch in split_in_batches(cols, batch_size):
                rows = list(zip(*[s.tolist() for s in batch]))
                preprocessed = _preprocess(pool, rows)
                last_err: Optional[Exception] = None
                for _ in range(max_retry):
                    try:
                        result = inference_fn(resolved, preprocessed)
                        last_err = None
                        break
                    except RuntimeError as e:  # transient (OOM, CUDA) — retry
                        last_err = e
                if last_err is not None:
                    raise last_err
                if not isinstance(result, pd.Series):
                    result = pd.Series(list(result))
                if len(result) != len(rows):
                    raise ValueError(
                        f"inference_fn returned {len(result)} rows for a "
                        f"{len(rows)}-row batch"
                    )
                outs.append(result)
        return pd.concat(outs, ignore_index=True) if outs else pd.Series([], dtype=object)

    udf = F.pandas_udf(_udf, returnType=output_type).asNondeterministic()
    cols = [F.col(c) if isinstance(c, str) else c for c in input_cols]
    return df.withColumn(output_col, udf(*cols))


def with_serialized_example_inference(
    df: DataFrame,
    example_col: str,
    artifacts: Any,
    specs: Any,
    inference_fn: InferenceFn,
    output_type: Union[DataType, str] = "float",
    output_col: str = "prediction",
    batch_size: int = 1024,
) -> DataFrame:
    """Inference over a column of serialized ``tf.train.Example`` bytes.

    Parity: the reference's ``with_inference_column`` for serialized
    TFRecords (tensorflow/dataframe_prediction_helper.py:153-186) feeds the
    raw strings to a TF serving signature. The engine decodes them with its
    TF-free protobuf codec (sources/tfrecords.py) against ``specs`` and
    hands the inference fn a pandas DataFrame batch — same dataflow, no TF
    import; a real saved-model signature plugs in as ``inference_fn``.
    """
    from ml_hadoop_experiment_spark.sources.tfrecords import parse_example_bytes

    spark = df.sparkSession
    broadcasted = broadcast(spark, artifacts)

    def _udf(raw: pd.Series) -> pd.Series:
        resolved = from_broadcasted(broadcasted)
        outs: List[pd.Series] = []
        for (batch,) in split_in_batches((raw,), batch_size):
            rows = [parse_example_bytes(bytes(b), specs) for b in batch]
            pdf = pd.DataFrame(rows)
            features = tuple(pdf[name] for name in specs)
            result = inference_fn(resolved, features)
            if not isinstance(result, pd.Series):
                result = pd.Series(list(result))
            outs.append(result)
        return pd.concat(outs, ignore_index=True) if outs else pd.Series([], dtype=object)

    udf = F.pandas_udf(_udf, returnType=output_type).asNondeterministic()
    return df.withColumn(output_col, udf(F.col(example_col)))


def with_map_in_pandas_inference(
    df: DataFrame,
    artifacts: Any,
    inference_fn: Callable[[Any, pd.DataFrame], pd.DataFrame],
    output_schema: Union[str, Any],
    batch_size: int = 1024,
) -> DataFrame:
    """Whole-row inference via ``mapInPandas`` — the UDTF-shaped substrate.

    For models that emit several columns or a different row count (the
    reference has no such operator; this is the engine's generalization noted
    in SURVEY.md §2.8's closing paragraph). ``inference_fn(artifacts, pdf)``
    maps a pandas batch to a pandas batch of ``output_schema``.
    """
    spark = df.sparkSession
    broadcasted = broadcast(spark, artifacts)

    def _map(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        resolved = from_broadcasted(broadcasted)
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                yield inference_fn(resolved, pdf.iloc[start : start + batch_size])

    return df.mapInPandas(_map, schema=output_schema)
