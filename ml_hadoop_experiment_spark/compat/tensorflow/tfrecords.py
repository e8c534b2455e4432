"""Compat: ``ml_hadoop_experiment.tensorflow.tfrecords``.

Reference tensorflow/tfrecords.py — Example encode (:184-207), per-
partition record sink (:210-236), shuffled DataFrame sink (:239-268), and
driver-side parsed readers (:52-72). All TF-free here: the engine's pure-
Python protobuf wire codec (sources/tfrecords.py) produces byte-identical
records; ``to_tf_proto`` returns a duck-typed Example carrying
``SerializeToString()`` so downstream code keeps working, and parses into
a real ``tf.train.Example`` when TF happens to be installed.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import pyspark
from pyspark.sql import DataFrame

from ml_hadoop_experiment_spark.compat._specs import to_engine_specs
from ml_hadoop_experiment_spark.sources import tfrecords as _tfr

TF_RECORD_DIR = "tf_records"
COL_CARDINALITIES_DIR = "col_cardinalities"


class _ExampleProxy:
    """Duck-typed stand-in for ``tf.train.Example``: carries the serialized
    bytes; upgrades itself to the real proto iff TF is importable."""

    def __init__(self, data: bytes):
        self._data = data

    def SerializeToString(self) -> bytes:  # noqa: N802 - proto API
        return self._data

    def as_tf_example(self) -> Any:
        import tensorflow as tf  # optional extra

        return tf.train.Example.FromString(self._data)


def to_tf_proto(x: Dict[str, Any], features_specs: Dict[str, Any]) -> _ExampleProxy:
    """Row dict -> Example (reference :184-207), honoring default synthesis
    (:122-132), empty-list-as-null (:141-149) and type enforcement
    (:162-181) via the engine codec."""
    specs = to_engine_specs(features_specs)
    return _ExampleProxy(_tfr.to_example_bytes(x, specs))


def write_example_partition(
    index: int, part: Iterator[Any], export_path: str, compression: str = "gzip"
) -> Iterator[Tuple[str, int]]:
    """Write one ``part-%05d`` file for a partition of serializable records
    (reference :210-223)."""
    path = os.path.join(export_path, f"part-{index:05d}")
    records = (
        r.SerializeToString() if hasattr(r, "SerializeToString") else bytes(r)
        for r in part
    )
    count = _tfr.write_tfrecord_file(path, records, compression or None)
    yield path, count


def write_example_rdd(
    tfrecords: pyspark.RDD, export_path: str, compression: str = "gzip"
) -> List[Tuple[str, int]]:
    """Reference :226-236 — one file per partition, returns [(path, count)]."""
    os.makedirs(export_path, exist_ok=True)
    return tfrecords.mapPartitionsWithIndex(
        lambda i, part: write_example_partition(i, part, export_path, compression)
    ).collect()


def df_to_tf_record(
    df: DataFrame,
    features_specs: Dict[str, Any],
    base_dir: str,
    vocab_columns: Optional[List[str]] = None,
    threshold: int = 0,
) -> List[str]:
    """Reference :239-268 — optional vocab job, spec projection, global
    random shuffle, gzip TFRecord write; returns the part-file paths.

    Engine differences: the shuffle is seeded (reproducible), the vocab
    aggregation is a DataFrame groupBy instead of an RDD reduceByKey, and
    records are written by the TF-free codec instead of the JVM
    spark-tensorflow-connector.
    """
    from ml_hadoop_experiment_spark.compat.tensorflow.vocabulary import (
        gen_vocab_files_from_list,
    )

    specs = to_engine_specs(features_specs)
    if vocab_columns is not None:
        gen_vocab_files_from_list(
            vocab_columns,
            df.select(vocab_columns),
            os.path.join(base_dir, COL_CARDINALITIES_DIR),
            threshold=threshold,
        )
    out_dir = os.path.join(base_dir, TF_RECORD_DIR)
    written = _tfr.write_tfrecords(df, specs, out_dir, compression="gzip")
    return [path for path, _ in written]


def read_parsed_sequence_tfr(
    files: Union[str, List[str]],
    context_features: Dict[str, Any],
    sequence_features: Dict[str, Any],
    compression_type: str = "GZIP",
) -> Iterator[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Driver-side parsed SequenceExample iterator (reference
    tensorflow/tfrecords.py:60-72, minus the tf.data dependency).

    Yields ``(context, sequences)`` pairs like
    ``tf.io.parse_single_sequence_example``: scalar-shaped sequence specs
    yield one value per step ([T]); shaped specs a list per step ([T, k]).

    .. warning:: This iterator pulls EVERY record through the driver —
       kept only for reference fidelity (notebook-scale inspection). For
       anything beyond a few files, use the distributed reader
       :func:`ml_hadoop_experiment_spark.sources.tfrecords.read_tfrecords`,
       which parses files in executors (one task per file group) and
       returns a DataFrame.
    """
    ctx_specs = to_engine_specs(context_features)
    seq_specs = to_engine_specs(sequence_features)
    compression = "gzip" if (compression_type or "").upper() == "GZIP" else None
    if isinstance(files, str):
        files = [files]
    for f in files:
        for record in _tfr.read_tfrecord_file(f, compression):
            yield _tfr.parse_sequence_example_bytes(record, ctx_specs, seq_specs)


def read_parsed_tfr(
    files: Union[str, List[str]],
    features_specs: Dict[str, Any],
    compression_type: str = "GZIP",
) -> Iterator[Dict[str, Any]]:
    """Driver-side parsed-record iterator (reference :52-57, minus the
    tf.data dependency).

    .. warning:: Every record crosses the driver — reference-fidelity
       path only. Big inputs belong on the distributed reader
       :func:`ml_hadoop_experiment_spark.sources.tfrecords.read_tfrecords`
       (executor-side parse, returns a DataFrame; handles directories,
       ``_*`` sidecar skipping, and multi-file parallelism).
    """
    specs = to_engine_specs(features_specs)
    compression = "gzip" if (compression_type or "").upper() == "GZIP" else None
    if isinstance(files, str):
        files = [files]
    for f in files:
        for record in _tfr.read_tfrecord_file(f, compression):
            yield _tfr.parse_example_bytes(record, specs)
