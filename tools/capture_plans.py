#!/usr/bin/env python
"""Capture `.explain("formatted")` for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag      -> output dir plans/<tag>/, files <query>_<suffix>.txt
  suffix   -> $PLAN_SUFFIX (default "before")
  queries  -> default: every declared non-streaming query

Streaming queries execute eagerly inside the callable against a memory
sink; their batch finisher plan is not the streaming plan, so they are
reported as such rather than re-drained here (the plan_report.py rule).
"""

from __future__ import annotations

import os
import sys

from ml_hadoop_experiment_spark.common.cache_registry import release_pinned
from ml_hadoop_experiment_spark.common.session import get_session
from ml_hadoop_experiment_spark.plans.prefix import release_prefix_caches
from ml_hadoop_experiment_spark.queries import QUERIES

# plan shape is scale-independent; sf0.001 keeps the driver-gated
# trainer collects inside plan construction cheap
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SUFFIX = os.environ.get("PLAN_SUFFIX", "before")

STREAMING = {
    "streaming_dedup", "streaming_rollup", "streaming_sessionize",
    "streaming_score", "streaming_interval_join", "streaming_enrich",
    "streaming_distinct", "streaming_heavy_hitters", "streaming_sample",
    "streaming_quantiles", "streaming_moments", "streaming_psi",
    "streaming_simhash",
}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or sorted(QUERIES)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        app_name="capture-plans",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    for name in names:
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        if name in STREAMING:
            with open(path, "w") as f:
                f.write(
                    f"{name}: stateful streaming drain — the executed plan "
                    "is owned by the micro-batch engine (availableNow); "
                    "see the operator module for the per-batch shape.\n"
                )
            continue
        df = QUERIES[name](spark, SF_DIR)
        explained = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as f:
            f.write(explained)
        release_prefix_caches()
        release_pinned()
        print(f"captured {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
