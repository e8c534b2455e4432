"""TF event-file metric extraction to a long-format table — TF-free.

Parity target: reference ``tensorflow/events.py:24-35`` (``get_all_metrics``
-> pandas (step, name, value), dropping events without a ``simple_value``)
and its file predicate ``events.out*`` (events.py:11-12).

Event files are TFRecord-framed serialized ``Event`` protos (public format):
``Event{ double wall_time=1; int64 step=2; Summary summary=5 }``,
``Summary{ repeated Value value=1 }``,
``Value{ string tag=1 (field 7 in newer protos: node_name); float
simple_value=2 }``. Only the (step, tag, simple_value) triple is extracted,
which is all the reference uses.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from ml_hadoop_experiment_spark.sources.tfrecords import (
    _read_varint,
    read_tfrecord_file,
)


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field, wire, payload) for each field in a proto message."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v.to_bytes(8, "little", signed=False)
        elif wire == 1:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_event(data: bytes) -> Tuple[Optional[int], List[Tuple[str, float]]]:
    step: Optional[int] = None
    metrics: List[Tuple[str, float]] = []
    for field, wire, payload in _iter_fields(data):
        if field == 2 and wire == 0:  # step varint
            step = int.from_bytes(payload, "little")
        elif field == 5 and wire == 2:  # summary
            for sfield, swire, svalue in _iter_fields(payload):
                if sfield == 1 and swire == 2:  # Summary.Value
                    tag: Optional[str] = None
                    simple: Optional[float] = None
                    for vfield, vwire, vpayload in _iter_fields(svalue):
                        if vfield == 1 and vwire == 2:
                            tag = vpayload.decode()
                        elif vfield == 2 and vwire == 5:
                            simple = struct.unpack("<f", vpayload)[0]
                    if tag is not None and simple is not None:
                        metrics.append((tag, simple))
    return step, metrics


def first_event_file(model_path: str) -> str:
    """First ``events.out*`` file under ``model_path`` (reference
    events.py:15-21 takes the first match)."""
    candidates = sorted(glob.glob(os.path.join(model_path, "events.out*")))
    if not candidates:
        raise FileNotFoundError(f"no events.out* file under {model_path}")
    return candidates[0]


def iter_events(path: str) -> Iterator[Tuple[Optional[int], List[Tuple[str, float]]]]:
    """(step, [(name, simple_value)]) per event record in one event file."""
    for record in read_tfrecord_file(path, compression=None):
        yield _parse_event(record)


def metrics_long_frame(model_path: str) -> pd.DataFrame:
    """First ``events.out*`` file under ``model_path`` -> long (step, name,
    value) frame; events without simple values contribute no rows."""
    rows = []
    for step, metrics in iter_events(first_event_file(model_path)):
        for name, value in metrics:
            rows.append({"step": step, "name": name, "value": value})
    return pd.DataFrame(rows, columns=["step", "name", "value"])
