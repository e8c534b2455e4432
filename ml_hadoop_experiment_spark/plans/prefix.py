"""Exact global prefix sums without a single-partition window.

``Window.orderBy(...)`` with no partition key moves EVERY row through one
task — the canonical scalability cliff for running totals, cumulative
token counts, and rank assignment. This module implements the standard
two-phase alternative:

1. range-partition + sort by the order key (one shuffle — the same
   exchange a global sort pays, split across the cluster);
2. per-partition totals (tiny: one row per partition) are collected and
   turned into partition prefix OFFSETS on the driver — KB-sized
   metadata, not data;
3. a map-only pass adds ``offset + within-partition cumsum`` via Arrow
   batches.

The result equals the single-partition window bit-for-bit for integer
values (exact addition), at cluster parallelism. Used by
``operators/packing.py`` for sequence packing; the DuckDB oracle is the
plain ``SUM() OVER (ORDER BY ...)`` window.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: persisted range-partitioned frames awaiting release. Each
#: ``with_global_running_sum`` call pins ONE materialization of its input
#: (the offsets pass and the cumsum pass must observe identical range
#: boundaries — see the persist comment below), and the cache must stay
#: alive until the caller's action has consumed the result. Callers that
#: sweep many queries in one session (bench.py, the oracle-parity suite)
#: call :func:`release_prefix_caches` BETWEEN queries — after the previous
#: result is fully materialized — so cached copies don't accumulate across
#: the sweep. Releasing while a dependent frame is still unmaterialized is
#: unsafe only for re-COMPUTATION (a fresh range exchange re-samples
#: boundaries); the default MEMORY_AND_DISK level spills rather than
#: evicts, so in-flight plans keep the pinned copy.
_CACHED: list = []


def release_prefix_caches() -> int:
    """Unpersist every range-partitioned frame pinned by prior
    ``with_global_running_sum`` calls; returns how many were released.
    Call between queries, after the consuming action has run."""
    n = 0
    while _CACHED:
        df = _CACHED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def with_global_running_sum(
    df: DataFrame,
    order_cols: List[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive prefix sum of ``value_col`` in the
    total order of ``order_cols`` (which must be a total order — add a
    unique id as the last key).

    Values are summed as int64 (exact, associative); floats would make
    the two-phase result differ from a sequential sum in the last ulp.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    ordered = ordered.sortWithinPartitions(*order_cols)
    # persist BEFORE the totals job: the offsets pass and the cumsum pass
    # must observe the SAME range boundaries (a re-executed range exchange
    # re-samples; persisting pins one materialization for both jobs).
    # Lifetime is caller-owned; sweeping callers reclaim storage between
    # queries via release_prefix_caches().
    with_pid = ordered.withColumn("__pid", F.spark_partition_id()).persist()
    _CACHED.append(with_pid)
    # one row per partition; collect is bounded by partition count
    totals = (
        with_pid.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("t"))
        .collect()
    )
    sums = {int(r["__pid"]): int(r["t"]) for r in totals}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    schema = with_pid.drop("__pid").schema.add(out_col, "long")
    cols = [f.name for f in schema.fields]

    def add_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if run is None:
                run = offsets.get(int(pdf["__pid"].iloc[0]), 0) if len(pdf) else 0
            out = pdf.drop(columns=["__pid"])
            out[out_col] = pdf[value_col].astype("int64").cumsum() + run
            run = int(out[out_col].iloc[-1]) if len(out) else run
            yield out[cols]

    return with_pid.mapInPandas(add_cumsum, schema)


def with_global_rank(
    df: DataFrame,
    order_cols: List[str],
    out_col: str = "rank",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Dense 1-based ``row_number`` in the total order of ``order_cols``
    WITHOUT a single-partition window: the prefix sum of ones.

    ``order_cols`` must be a total order (append a unique id); equal-key
    ties would otherwise get arbitrary-but-stable ranks from the range
    partitioner's internal order.
    """
    tagged = df.withColumn("__one", F.lit(1))
    out = with_global_running_sum(
        tagged, order_cols, "__one", out_col=out_col, num_partitions=num_partitions
    )
    return out.drop("__one")


__all__ = [
    "with_global_running_sum",
    "with_global_rank",
    "release_prefix_caches",
]
