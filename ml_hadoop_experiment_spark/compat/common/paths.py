"""Compat: ``ml_hadoop_experiment.common.paths`` (reference common/paths.py:4-13)."""

from __future__ import annotations

from urllib import parse


def check_full_hdfs_path(path: str) -> bool:
    """True only for fully-qualified hdfs:// / viewfs:// URIs WITH a
    namenode netloc — the reference's guard before TFRecord/vocab writes
    (tfrecords.py:232-233) rejects scheme-less and host-less paths."""
    parsed = parse.urlparse(path)
    return len(parsed.netloc) > 0 and parsed.scheme in ("hdfs", "viewfs")
