"""Compat: ``ml_hadoop_experiment.tensorflow.logging.conf`` (reference
tensorflow/logging.conf.py — the module filename contains a dot, so the
reference itself can only load it via importlib; this twin uses an
importable name and provides the same single helper with the same
observable behavior: an INFO file handler on the root logger using the
reference's record format).
"""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s:%(levelname)s:%(name)s: %(message)s"


def with_file_handler(filename: str) -> None:
    """Attach an INFO-level file handler with the reference's record
    format (logging.conf.py:4-10) to the root logger."""
    handler = logging.FileHandler(filename)
    handler.setLevel(logging.INFO)
    handler.setFormatter(logging.Formatter(_FORMAT))
    logging.getLogger().addHandler(handler)
