"""Stream-stream joins.

Extension beyond the reference (which has no streaming at all): the
event-correlation join — "purchase follows click by the same user within
N minutes" — as a watermarked stream-stream inner join, the canonical
Structured Streaming attribution shape.

Design for scale: both sides are state-store partitioned by the join key;
the watermark bounds how long either side's rows wait for a match, so
state size is (input rate x watermark window), not unbounded. The
time-range predicate lets Spark evict left rows once
``left_ts + upper < watermark`` — without it a stream-stream join would
hold every row forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    upper: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` to streaming ``right`` rows of the same
    ``key_col`` whose timestamp falls in ``[left.ts, left.ts + upper]``
    (bounds inclusive — mirror the oracle's BETWEEN).

    Returns the joined frame with columns prefixed ``l_`` / ``r_``.
    Both inputs must already be streaming DataFrames; watermarks are
    applied here so state eviction is always configured.
    """
    l = left.withWatermark(ts_col, watermark)
    r = right.withWatermark(ts_col, watermark)
    l = l.select([F.col(c).alias(f"l_{c}") for c in l.columns])
    r = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l.join(r, cond, how)


__all__ = ["interval_join"]
