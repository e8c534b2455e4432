"""Compat: ``ml_hadoop_experiment.common.spark_inference``.

Same names, same contracts (reference common/spark_inference.py:25-193),
backed by the engine's artifact/GPU/batching modules. Differences are
bug fixes only: GPU 0 is allocatable (the reference's falsy-device check
at :82 treats it as free), and allocation honors Spark 3 resource
scheduling first.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from ml_hadoop_experiment_spark.common.artifacts import (  # noqa: F401
    SerializableObj,
    from_broadcasted,
)
from ml_hadoop_experiment_spark.common.artifacts import broadcast as _broadcast
from ml_hadoop_experiment_spark.common.batching import (  # noqa: F401
    split_in_batches,
)
from ml_hadoop_experiment_spark.common.gpu import (  # noqa: F401
    get_cuda_device,
)

artifact_type = Any


class _SessionShim:
    """Adapts a bare SparkContext to the engine's SparkSession parameter
    (only ``.sparkContext`` is touched by ``broadcast``)."""

    def __init__(self, sc: Any):
        self.sparkContext = sc


def broadcast(sc_or_spark: Any, artifacts: Any) -> Any:
    """Reference signature takes a SparkContext (``df._sc``,
    common/spark_inference.py:157); the engine takes a SparkSession.
    Accept either."""
    if hasattr(sc_or_spark, "sparkContext"):
        return _broadcast(sc_or_spark, artifacts)
    return _broadcast(_SessionShim(sc_or_spark), artifacts)  # type: ignore[arg-type]

__all__ = [
    "SerializableObj",
    "broadcast",
    "from_broadcasted",
    "split_in_batches",
    "get_cuda_device",
    "artifact_type",
]
