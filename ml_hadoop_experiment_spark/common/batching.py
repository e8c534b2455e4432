"""Micro-batching of Arrow batches inside Python UDF workers.

Parity target: reference ``split_in_batches`` (common/spark_inference.py:130-143).
Arrow hands the UDF up to ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows
at once; models often need a smaller batch to bound peak memory (e.g. GPU).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd


def split_in_batches(
    series: Tuple[pd.Series, ...], batch_size: int
) -> Iterator[Tuple[pd.Series, ...]]:
    """Slice a tuple of equal-length Series into chunks of ``batch_size`` rows.

    pandas ``iloc`` tolerates an overrunning end index, so the last chunk is
    simply shorter (same behavior as the reference).
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    n = len(series[0])
    for start in range(0, n, batch_size):
        yield tuple(s.iloc[start : start + batch_size] for s in series)
