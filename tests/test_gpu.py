"""GPU allocator (SURVEY.md §2 U9) — mock-isolated like the reference's
tests/common/test_spark_inference_common.py:14-79 (no real GPUs needed)."""

from __future__ import annotations

import json
import os

import pytest

from ml_hadoop_experiment_spark.common import gpu


@pytest.fixture(autouse=True)
def clean_env(tmp_path, monkeypatch):
    monkeypatch.delenv(gpu.ENV_CACHE_KEY, raising=False)
    yield


def _alloc(tmp_path, n_gpus, monkeypatch=None):
    return gpu.get_cuda_device(
        n_gpus,
        lock_file=str(tmp_path / "lock"),
        allocation_file=str(tmp_path / "alloc"),
    )


def test_first_allocation_is_device_zero(tmp_path):
    assert _alloc(tmp_path, n_gpus=2) == 0


def test_least_loaded_device_wins(tmp_path, monkeypatch):
    alloc_file = tmp_path / "alloc"
    # device 0 busy with two live pids (our own pid is trivially alive)
    me = os.getpid()
    alloc_file.write_text(json.dumps({"0": [me, me], "1": [me]}))
    monkeypatch.delenv(gpu.ENV_CACHE_KEY, raising=False)
    assert _alloc(tmp_path, n_gpus=2) == 1


def test_device_zero_not_treated_as_unallocated(tmp_path):
    """Regression for the reference's falsy-zero bug
    (common/spark_inference.py:82): an allocation on device 0 must count."""
    alloc_file = tmp_path / "alloc"
    me = os.getpid()
    alloc_file.write_text(json.dumps({"0": [me], "1": []}))
    assert _alloc(tmp_path, n_gpus=2) == 1


def test_dead_pids_are_pruned(tmp_path):
    alloc_file = tmp_path / "alloc"
    # 2**22+12345 is (almost surely) not a live pid
    alloc_file.write_text(json.dumps({"0": [4194304 + 12345], "1": []}))
    assert _alloc(tmp_path, n_gpus=2) == 0
    allocations = json.loads(alloc_file.read_text())
    assert allocations["0"] == [os.getpid()]


def test_env_cache_short_circuits(tmp_path, monkeypatch):
    monkeypatch.setenv(gpu.ENV_CACHE_KEY, "3")
    assert _alloc(tmp_path, n_gpus=1) == 3


def test_corrupt_allocation_file_resets(tmp_path):
    (tmp_path / "alloc").write_text("{not json")
    assert _alloc(tmp_path, n_gpus=2) == 0


def test_spark_resource_api_preferred(tmp_path, monkeypatch):
    class _Res:
        addresses = ["1"]

    class _Ctx:
        @staticmethod
        def resources():
            return {"gpu": _Res()}

    monkeypatch.setattr(gpu, "_spark_assigned_gpu", lambda: 1)
    assert _alloc(tmp_path, n_gpus=4) == 1
    assert os.environ[gpu.ENV_CACHE_KEY] == "1"
