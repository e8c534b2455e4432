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
- ``time_bucket`` — integer bucket arithmetic for rollups.

Time-column types: every operator accepts TIMESTAMP, TIMESTAMP_NTZ, DATE,
or an integral epoch column. Timestamps normalize to epoch-microseconds
BIGINT via ``unix_micros`` (TIMESTAMP_NTZ is cast through TIMESTAMP — the
engine pins the session timezone to UTC so the wall clock IS the instant);
integral columns are interpreted as epoch-nanoseconds (the legacy fixture
convention). When an operator compares two time columns of different
scales, both are promoted to nanoseconds (exact: µs*1000 stays well inside
BIGINT range until year ~2262). All bucket/gap widths are given in seconds
and converted to the column's native scale, so results are identical
whichever wire type the data arrives in.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

NANOS_PER_SECOND = 1_000_000_000
MICROS_PER_SECOND = 1_000_000

_INTEGRAL_TYPES = (ByteType, ShortType, IntegerType, LongType)


def epoch_and_scale(col: Column, dtype: Optional[DataType]) -> Tuple[Column, int]:
    """Normalize a time column to (BIGINT epoch, units-per-second).

    TIMESTAMP / TIMESTAMP_NTZ / DATE → ``unix_micros`` (µs, exact — parquet
    timestamps are µs native); integral (or unknown ``dtype=None``) → the
    column as-is, interpreted as epoch-nanoseconds for backwards
    compatibility with epoch-bigint datasets.
    """
    if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        return F.unix_micros(col.cast("timestamp")), MICROS_PER_SECOND
    if dtype is None or isinstance(dtype, _INTEGRAL_TYPES):
        return col.cast("bigint"), NANOS_PER_SECOND
    raise TypeError(
        f"time column must be a timestamp, date, or integral epoch; got {dtype}"
    )


def _common_scale(
    pairs: Sequence[Tuple[Column, int]]
) -> Tuple[List[Column], int]:
    """Promote (epoch, scale) pairs to one common scale (max = finest)."""
    target = max(s for _, s in pairs)
    return [c * F.lit(target // s) if s != target else c for c, s in pairs], target


def time_bucket(
    ts: Column, width_seconds: int, dtype: Optional[DataType] = None
) -> Column:
    """Hypertable-style integer bucket id from a time column.

    ``dtype`` selects the epoch normalization (pass
    ``df.schema["ts"].dataType``); ``None`` keeps the legacy epoch-nanos
    BIGINT interpretation. Bucket ids are scale-invariant:
    ``floor(epoch_us / (w*1e6)) == floor(epoch_ns / (w*1e9))`` exactly.
    """
    epoch, scale = epoch_and_scale(ts, dtype)
    return F.floor(epoch / F.lit(width_seconds * scale)).cast("bigint")


def time_bucket_sql(ts_expr: str, width_seconds: int) -> str:
    """DuckDB twin over a TIMESTAMP column (µs-native, like parquet)."""
    return (
        f"CAST(floor(epoch_us({ts_expr}) / {width_seconds * MICROS_PER_SECOND}.0)"
        " AS BIGINT)"
    )


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
    whole operator. Session ids start at 0 per key. Accepts timestamp or
    epoch-bigint time columns (see module docstring).
    """
    keys = [F.col(c) for c in key_cols]
    epoch, scale = epoch_and_scale(
        F.col(time_col), df.schema[time_col].dataType
    )
    w = Window.partitionBy(*keys).orderBy(epoch.asc())
    prev_t = F.lag(epoch).over(w)
    gap = int(gap_seconds * scale)
    new_session = F.when(prev_t.isNull() | ((epoch - prev_t) > gap), 1).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(epoch.asc()).rowsBetween(
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the matching right row within the same
    ``on`` key —

    - ``direction="backward"`` (default): the most recent right row with
      ``right_time <= left_time`` (NULLs when no prior right row exists).
      Ties on the timestamp include the right row (DuckDB ASOF JOIN
      semantics).
    - ``direction="forward"``: the earliest right row with
      ``right_time >= left_time`` (ties included symmetrically).

    Plan shape: tag + unionByName + one window over (key, time) using
    ``last``/``first`` with ``ignorenulls=True`` — a single hash exchange
    on the key and one sort, both streaming-friendly at scale; no
    broadcast, no UDF. Forward reuses the same window ordering with a
    following frame, so both directions cost identically. Left and right
    time columns may be timestamp or epoch-bigint in any mix; both sides
    normalize to a common epoch scale before comparing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    on = list(on)
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in on and c != right_time]
    )
    out_cols = [f"{c}{suffix}" for c in value_cols]

    (lt, rt), _ = _common_scale(
        [
            epoch_and_scale(F.col(left_time), left.schema[left_time].dataType),
            epoch_and_scale(F.col(right_time), right.schema[right_time].dataType),
        ]
    )
    l_tagged = left.withColumn("__t", lt).withColumn("__is_left", F.lit(1))
    for c, oc in zip(value_cols, out_cols):
        l_tagged = l_tagged.withColumn(oc, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *on,
        rt.alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(oc) for c, oc in zip(value_cols, out_cols)],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at the same instant -> ties
        # included; take the last right value seen so far
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda oc: F.last(oc, ignorenulls=True)  # noqa: E731
    else:
        # right rows sort after left rows at the same instant -> ties
        # included; take the first right value yet to come
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda oc: F.first(oc, ignorenulls=True)  # noqa: E731
    filled = unioned
    for oc in out_cols:
        filled = filled.withColumn(oc, pick(oc).over(w))
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
    interval's columns. Time columns may be timestamp or epoch-bigint in
    any mix (normalized to a common scale).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    (et, st, en), scale = _common_scale(
        [
            epoch_and_scale(F.col(event_time), events.schema[event_time].dataType),
            epoch_and_scale(F.col(start_col), intervals.schema[start_col].dataType),
            epoch_and_scale(F.col(end_col), intervals.schema[end_col].dataType),
        ]
    )
    width = bucket_seconds * scale
    # explicit frame aliases: qualified refs stay unambiguous even when the
    # intervals frame derives from the events frame (self-join lineage).
    # epoch exprs are materialized as columns BEFORE aliasing so the join
    # condition references plain qualified columns on the correct side.
    ev = (
        events.withColumn("__t_e", et)
        .withColumn("__bucket", F.floor(F.col("__t_e") / F.lit(width)).cast("bigint"))
        .alias("__ev")
    )
    iv = (
        intervals.withColumn("__start_e", st)
        .withColumn("__end_e", en)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start_e") / F.lit(width)).cast("bigint"),
                    F.floor(F.col("__end_e") / F.lit(width)).cast("bigint"),
                )
            ),
        )
        .alias("__iv")
    )
    cond = F.col("__ev.__bucket") == F.col("__iv.__bucket")
    for k in on:
        cond = cond & (F.col(f"__ev.{k}") == F.col(f"__iv.{k}"))
    cond = (
        cond
        & (F.col("__ev.__t_e") >= F.col("__iv.__start_e"))
        & (F.col("__ev.__t_e") <= F.col("__iv.__end_e"))
    )
    ev_cols = [F.col(f"__ev.{c}") for c in events.columns]
    iv_cols = [F.col(f"__iv.{c}") for c in intervals.columns if c not in on]
    return ev.join(iv, cond, how).select(*ev_cols, *iv_cols)


def trailing_aggregates(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimals: str = "decimal(18,2)",
) -> DataFrame:
    """Trailing time-RANGE window per key: count and exact sum of
    ``value_col`` over the last ``window_seconds`` (inclusive of both
    the current instant and the window edge) — the rolling-feature /
    rate-limit / velocity primitive.

    A rows-based frame would be wrong under irregular event spacing; the
    RANGE frame on epoch seconds admits exactly the events inside the
    time window, ties included. One shuffle (the window's hash
    partitioning on the key). The sum accumulates in DECIMAL so the
    result is identical whatever order the frame internally adds in —
    double accumulation would differ between engines at the last ulp.

    Output adds ``epoch_s``, ``trail_cnt``, ``trail_sum`` (double, cast
    from the exact decimal; keep ``decimals`` scaled so frame sums stay
    under 2^53 — see corr_matrix for the conversion-portability rule).
    """
    epoch, scale = epoch_and_scale(F.col(ts_col), df.schema[ts_col].dataType)
    # subtract the remainder before dividing: the quotient is then an exact
    # integer in double, immune to the round-up-then-truncate hazard a
    # direct epoch/scale cast has at nanosecond granularity
    secs = ((epoch - epoch % F.lit(scale)) / F.lit(scale)).cast("long")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__epoch_s").asc())
        .rangeBetween(-int(window_seconds), 0)
    )
    return (
        df.withColumn("__epoch_s", secs)
        .withColumn("trail_cnt", F.count(F.lit(1)).over(w))
        .withColumn(
            "trail_sum",
            F.sum(F.col(value_col).cast(decimals)).over(w).cast("double"),
        )
        .withColumnRenamed("__epoch_s", "epoch_s")
    )


def trailing_aggregates_sql(
    relation: str,
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    window_seconds: int,
    decimals: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB twin of ``trailing_aggregates`` (integer RANGE frame)."""
    return f"""
SELECT *,
       count(*) OVER w AS trail_cnt,
       CAST(sum(CAST({value_expr} AS {decimals})) OVER w AS DOUBLE) AS trail_sum
FROM (
  SELECT *, CAST(epoch_us({ts_expr}) // 1000000 AS BIGINT) AS epoch_s
  FROM {relation}
)
WINDOW w AS (PARTITION BY {key_expr} ORDER BY epoch_s
             RANGE BETWEEN {int(window_seconds)} PRECEDING AND CURRENT ROW)
"""


def gap_fill(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Resample an irregular per-key series onto a regular time grid and
    forward-fill gaps — the feature-store / monitoring "as-of every N
    seconds" primitive.

    Per key: bucket observations to ``floor(epoch_s / step)``, keep the
    LAST observation per bucket (latest timestamp; epoch ties prefer a
    non-NULL value, then the larger value — a deterministic max over an
    (epoch, not-null, value) struct that never compares NULL against
    non-NULL, which the engines order differently), generate the dense
    bucket range min..max from a one-row-per-key span table, left-join
    observations back, and forward-fill ``value`` with
    ``last(..., ignorenulls=True)``.

    Output: ``key_cols..., bucket, value (filled), n_obs, filled`` —
    ``n_obs`` is 0 and ``filled`` true on generated rows.

    Scale posture: the span table is ONE row per key (map-combined agg);
    the grid ``sequence()+explode`` is map-side from that tiny table, so
    the dense grid never shuffles as a whole — the join partitions it by
    (key, bucket) alongside the (equally partitioned) per-bucket
    observations. The forward-fill window is one shuffle on the key.
    The hazard is a key whose span/step is huge (one sensor, ten years,
    1-second grid): ``max_buckets`` drops such keys (count them with a
    prior span query) rather than letting one key explode to billions of
    rows inside a single task.
    """
    epoch, scale = epoch_and_scale(F.col(ts_col), df.schema[ts_col].dataType)
    secs = ((epoch - epoch % F.lit(scale)) / F.lit(scale)).cast("long")
    bucket = F.floor(secs / F.lit(int(step_seconds))).cast("long")

    obs = (
        df.withColumn("__b", bucket)
        .withColumn("__e", secs)
        .groupBy(*key_cols, "__b")
        .agg(
            # the explicit not-null rank field keeps the struct max from
            # ever comparing a NULL value against a non-NULL one on an
            # epoch tie: Spark sorts a NULL struct field smallest while
            # DuckDB sorts it largest, so without the flag the engines
            # could pick different survivors (round-4 advice)
            F.max(
                F.struct(
                    F.col("__e"),
                    F.col(value_col).isNotNull().alias("nn"),
                    F.col(value_col).alias("v"),
                )
            )["v"].alias("__v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    spans = (
        obs.groupBy(*key_cols)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .where((F.col("__hi") - F.col("__lo")) < F.lit(int(max_buckets)))
    )
    grid = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__b"),
    )
    joined = grid.join(obs, [*key_cols, "__b"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("value", F.last("__v", ignorenulls=True).over(w))
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)))
        .withColumn("filled", F.col("__v").isNull())
        .withColumnRenamed("__b", "bucket")
        .drop("__v")
    )


def gap_fill_sql(
    relation: str,
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    step_seconds: int,
) -> str:
    """DuckDB twin of ``gap_fill`` (dense grid via range-unnest, forward
    fill via ``last_value IGNORE NULLS``)."""
    step = int(step_seconds)
    return f"""
WITH obs AS (
  SELECT {key_expr} AS k,
         CAST(epoch_us({ts_expr}) // 1000000 // {step} AS BIGINT) AS bucket,
         max(struct_pack(
           e := CAST(epoch_us({ts_expr}) // 1000000 AS BIGINT),
           nn := ({value_expr} IS NOT NULL),
           v := {value_expr})).v AS obs_v,
         count(*) AS n_obs
  FROM {relation}
  GROUP BY 1, 2
),
spans AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
grid AS (SELECT k, unnest(range(lo, hi + 1)) AS bucket FROM spans)
SELECT g.k, g.bucket,
       last_value(o.obs_v IGNORE NULLS)
         OVER (PARTITION BY g.k ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       coalesce(o.n_obs, 0) AS n_obs,
       o.obs_v IS NULL AS filled
FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.bucket = o.bucket
"""


def time_weighted_avg(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    value_col: str,
    decimals: str = "decimal(18,2)",
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation's value is
    weighted by how long it remained current (until the key's next
    observation) — the correct mean for irregularly sampled state
    (prices, sensor readings, gauge metrics), where the arithmetic mean
    over-weights bursts.

    ``lead`` over (epoch, value) pairs the hold duration; the weighted
    sum accumulates as DECIMAL × integer-seconds (exact, order-free), so
    the result is engine-identical; the single division to double
    happens once per key. The last observation of a key has no
    successor and carries zero weight (standard left-closed TWAP).
    Keys with ONE observation therefore yield NULL.

    One shuffle (the lead window on the key), one map-combined agg.
    Output: ``key_cols..., twap, n_obs, span_s``.
    """
    epoch, scale = epoch_and_scale(F.col(ts_col), df.schema[ts_col].dataType)
    secs = ((epoch - epoch % F.lit(scale)) / F.lit(scale)).cast("long")
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__e").asc(), F.col(value_col).asc()
    )
    held = F.lead("__e").over(w) - F.col("__e")
    return (
        df.withColumn("__e", secs)
        .withColumn("__held", held)
        .groupBy(*key_cols)
        .agg(
            (
                F.sum(F.col(value_col).cast(decimals) * F.col("__held")).cast(
                    "double"
                )
                / F.sum("__held")
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__held").alias("span_s"),
        )
    )


def time_weighted_avg_sql(
    relation: str,
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    decimals: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB twin of ``time_weighted_avg``."""
    return f"""
WITH held AS (
  SELECT {key_expr} AS k, {value_expr} AS v,
         lead(e) OVER (PARTITION BY {key_expr} ORDER BY e, {value_expr}) - e
           AS held
  FROM (
    SELECT *, CAST(epoch_us({ts_expr}) // 1000000 AS BIGINT) AS e
    FROM {relation}
  )
)
SELECT k,
       CAST(sum(CAST(v AS {decimals}) * held) AS DOUBLE) / sum(held) AS twap,
       count(*) AS n_obs,
       sum(held) AS span_s
FROM held GROUP BY k
"""
