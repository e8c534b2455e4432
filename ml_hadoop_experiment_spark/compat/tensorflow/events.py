"""Compat: ``ml_hadoop_experiment.tensorflow.events`` (reference
events.py:11-35) — TF event files parsed without TF by the engine's
record-level reader."""

from __future__ import annotations

import os
import typing

import pandas

from ml_hadoop_experiment_spark.sources import events as _events


def test_is_event_file(filename: str) -> bool:
    """Reference :11-12."""
    return os.path.basename(filename).startswith("events.out")


def gen_events_iterator(model_path: str) -> typing.Iterator:
    """Reference :15-21 — events from the first event file under the path."""
    return _events.iter_events(_events.first_event_file(model_path))


def get_all_metrics(model_path: str) -> pandas.DataFrame:
    """Reference :24-35 — long table (step, name, value), null values dropped."""
    return _events.metrics_long_frame(model_path)
