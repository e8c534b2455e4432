from ml_hadoop_experiment_spark.common.artifacts import (
    SerializableObj,
    broadcast,
    from_broadcasted,
)
from ml_hadoop_experiment_spark.common.batching import split_in_batches
from ml_hadoop_experiment_spark.common.gpu import get_cuda_device
from ml_hadoop_experiment_spark.common.session import get_session, session_defaults

__all__ = [
    "get_cuda_device",
    "SerializableObj",
    "broadcast",
    "from_broadcasted",
    "split_in_batches",
    "get_session",
    "session_defaults",
]
