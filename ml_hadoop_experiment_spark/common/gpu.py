"""Per-worker GPU allocation for inference UDFs.

Parity target (SURVEY.md §2 U9): the reference allocates GPUs to Python
workers through a file-locked JSON map {gpu: [pids]} — prune dead pids,
pick the least-loaded device, cache the choice in the ``CUDA_DEVICE`` env
var because Spark reuses Python workers (common/spark_inference.py:56-127).

Engine changes vs the reference:

- Spark 3 resource scheduling is the first choice: when the cluster is
  launched with ``spark.task.resource.gpu.amount``, the task's assigned
  address comes from ``TaskContext.resources()["gpu"]`` — no lockfile
  needed, and the scheduler guarantees exclusivity. The lockfile path is
  the fallback for clusters without resource scheduling (the reference's
  only mode).
- The reference's ``if cuda_device:`` bug (common/spark_inference.py:82)
  treated device 0 as unallocated, double-booking GPU 0; here the check is
  ``is not None``.
- Dead-pid pruning uses ``os.kill(pid, 0)`` as the liveness probe, like the
  reference (:73-78).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

ENV_CACHE_KEY = "CUDA_DEVICE"


class FileLock:
    """fcntl-based exclusive lock (reference Locker, :56-66)."""

    def __init__(self, lock_file: str = "/tmp/mlhe_gpu.lock"):
        self.lock_file = lock_file
        self._fd: Optional[int] = None

    def __enter__(self) -> "FileLock":
        import fcntl

        self._fd = os.open(self.lock_file, os.O_CREAT | os.O_RDWR)
        fcntl.flock(self._fd, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc) -> None:
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


def _allocate_from_file(n_gpus: int, allocation_file: str) -> int:
    """Least-loaded GPU from the JSON allocation map, registering our pid.

    Caller must hold the lock. The map is pruned of dead pids first, so
    crashed workers release their devices.
    """
    allocations: Dict[str, List[int]] = {}
    if os.path.exists(allocation_file):
        try:
            with open(allocation_file) as f:
                allocations = json.load(f)
        except (json.JSONDecodeError, OSError):
            allocations = {}
    pruned: Dict[str, List[int]] = {}
    for gpu in range(n_gpus):
        pids = allocations.get(str(gpu), [])
        pruned[str(gpu)] = [p for p in pids if _pid_alive(p)]
    # least-loaded; ties -> lowest device id (device 0 is a valid choice —
    # the reference's falsy-zero check here was a double-booking bug)
    device = min(range(n_gpus), key=lambda g: (len(pruned[str(g)]), g))
    pruned[str(device)].append(os.getpid())
    with open(allocation_file, "w") as f:
        json.dump(pruned, f)
    return device


def _spark_assigned_gpu() -> Optional[int]:
    """GPU address from Spark 3 resource scheduling, if this process is a
    task with a 'gpu' resource; None otherwise."""
    try:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is None:
            return None
        resources = ctx.resources()
        if "gpu" not in resources or not resources["gpu"].addresses:
            return None
        return int(resources["gpu"].addresses[0])
    except Exception:
        return None


def get_cuda_device(
    n_gpus: int,
    lock_file: str = "/tmp/mlhe_gpu.lock",
    allocation_file: str = "/tmp/mlhe_gpu_allocation",
) -> int:
    """Device index for this worker: env cache -> Spark resources -> lockfile.

    The result is cached in ``CUDA_DEVICE`` because Spark reuses Python
    workers across tasks (reference :116-127); clearing the env var forces
    re-allocation.
    """
    cached = os.environ.get(ENV_CACHE_KEY)
    if cached is not None:
        return int(cached)
    device = _spark_assigned_gpu()
    if device is None:
        with FileLock(lock_file):
            device = _allocate_from_file(n_gpus, allocation_file)
    os.environ[ENV_CACHE_KEY] = str(device)
    return device
