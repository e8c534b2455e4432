"""Temporal operators: as-of join, range join, time-bucket rollups.

Extensions beyond the reference (it has no joins at all — SURVEY.md §2.3);
these are the time-series shapes the brief calls out (as-of join, range
join, hypertable rollup) built as compositions of DataFrame ops so Catalyst
keeps planning them:

- ``asof_join`` — each left row picks the most recent right row at or
  before its timestamp (per key). Implemented as union + window
  ``last(ignorenulls)`` rather than a per-key ``merge_asof`` UDF: one
  shuffle on (key), sorted once, no Python crossing, no broadcast
  requirement — works when both sides are 100 TB.
- ``range_join`` — rows joined to intervals containing them. A naive
  inequality join plans as BroadcastNestedLoopJoin (O(n*m) and
  broadcast-bound); bucketizing converts it to an equi-join on
  (key, bucket) + exact containment filter, which shuffles and scales.
- ``time_bucket`` — integer bucket arithmetic for rollups; evaluates
  identically in DuckDB (the fixtures carry epoch-nanos bigints).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NANOS_PER_SECOND = 1_000_000_000


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Hypertable-style bucket id from an epoch-nanos timestamp column."""
    return F.floor(ts / F.lit(width_seconds * NANOS_PER_SECOND)).cast("bigint")


def time_bucket_sql(ts_expr: str, width_seconds: int) -> str:
    """DuckDB twin over a TIMESTAMP column (fixtures store nanos)."""
    return f"CAST(floor(epoch_ns({ts_expr}) / {width_seconds * NANOS_PER_SECOND}.0) AS BIGINT)"


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``.

    The classic two-window composition — ``lag`` to detect gaps, running
    ``sum`` of the new-session flags to number them — both over the same
    (key, time) window, so Catalyst plans ONE shuffle and one sort for the
    whole operator. Session ids start at 0 per key. Epoch-nanos input.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(time_col).asc())
    prev_t = F.lag(F.col(time_col)).over(w)
    gap_ns = int(gap_seconds * NANOS_PER_SECOND)
    new_session = F.when(
        prev_t.isNull() | ((F.col(time_col) - prev_t) > gap_ns), 1
    ).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(F.col(time_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running) - 1)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the most recent right row with
    ``right_time <= left_time`` within the same ``on`` key (backward as-of;
    NULLs when no prior right row exists). Ties on the timestamp include
    the right row (DuckDB ASOF JOIN semantics).

    Plan shape: tag + unionByName + one window over (key, time) using
    ``last(..., ignorenulls=True)`` — a single hash exchange on the key and
    one sort, both streaming-friendly at scale; no broadcast, no UDF.
    """
    on = list(on)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in on and c != right_time]
    )
    out_cols = [f"{c}{suffix}" for c in value_cols]

    l_tagged = left.withColumn("__t", F.col(left_time).cast("long")).withColumn(
        "__is_left", F.lit(1)
    )
    for c, oc in zip(value_cols, out_cols):
        l_tagged = l_tagged.withColumn(oc, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *on,
        F.col(right_time).cast("long").alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(oc) for c, oc in zip(value_cols, out_cols)],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at the same instant -> ties included
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for oc in out_cols:
        filled = filled.withColumn(oc, F.last(oc, ignorenulls=True).over(w))
    return filled.where(F.col("__is_left") == 1).drop("__t", "__is_left")


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_time: str,
    start_col: str,
    end_col: str,
    on: Optional[Sequence[str]] = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join events to the intervals containing them (``start <= t <= end``),
    optionally also matching ``on`` keys.

    Each interval is exploded to the time buckets it covers; events join
    their single bucket (equi-join on key+bucket → ordinary shuffle join,
    AQE-skewable) with the exact containment predicate INSIDE the join
    condition — so ``how="left"`` genuinely preserves unmatched events with
    NULL interval columns instead of silently degrading to inner (an event
    matches a given interval in exactly one bucket, so no duplicates).
    Choose ``bucket_seconds`` near the typical interval length: replication
    factor is ``len/bucket + 1`` per interval while preserving
    single-bucket event lookup. Output keeps all event columns plus the
    interval's columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    width = bucket_seconds * NANOS_PER_SECOND
    # explicit frame aliases: qualified refs stay unambiguous even when the
    # intervals frame derives from the events frame (self-join lineage)
    ev = events.withColumn(
        "__bucket", time_bucket(F.col(event_time), bucket_seconds)
    ).alias("__ev")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / F.lit(width)).cast("bigint"),
                F.floor(F.col(end_col).cast("long") / F.lit(width)).cast("bigint"),
            )
        ),
    ).alias("__iv")
    cond = F.col("__ev.__bucket") == F.col("__iv.__bucket")
    for k in on:
        cond = cond & (F.col(f"__ev.{k}") == F.col(f"__iv.{k}"))
    cond = (
        cond
        & (F.col(f"__ev.{event_time}").cast("long") >= F.col(f"__iv.{start_col}").cast("long"))
        & (F.col(f"__ev.{event_time}").cast("long") <= F.col(f"__iv.{end_col}").cast("long"))
    )
    ev_cols = [F.col(f"__ev.{c}") for c in events.columns]
    iv_cols = [F.col(f"__iv.{c}") for c in intervals.columns if c not in on]
    return ev.join(iv, cond, how).select(*ev_cols, *iv_cols)
