from ml_hadoop_experiment_spark.sources.tfrecords import (
    parse_example_bytes,
    read_tfrecords,
    to_example_bytes,
    write_tfrecords,
)
from ml_hadoop_experiment_spark.sources.events import metrics_long_frame

__all__ = [
    "to_example_bytes",
    "parse_example_bytes",
    "write_tfrecords",
    "read_tfrecords",
    "metrics_long_frame",
]
