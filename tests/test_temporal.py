"""Temporal operators: as-of join goldens/semantics, bucketized range join
vs naive inequality join, time buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.temporal import (
    NANOS_PER_SECOND,
    asof_join,
    range_join,
    time_bucket,
)

S = NANOS_PER_SECOND


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [(1, 1, 10 * S), (2, 1, 20 * S), (3, 1, 5 * S), (4, 2, 10 * S)],
        "event_id bigint, k bigint, t long",
    )
    right = spark.createDataFrame(
        [(1, 8 * S, 100.0), (1, 15 * S, 200.0), (2, 30 * S, 300.0)],
        "k bigint, t long, v double",
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t")
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    assert got == {
        1: 100.0,  # t=10: most recent right at t=8
        2: 200.0,  # t=20: right at t=15
        3: None,   # t=5: nothing prior
        4: None,   # k=2: right only at t=30 (future)
    }


def test_asof_join_tie_includes_equal_timestamp(spark):
    left = spark.createDataFrame([(1, 1, 10 * S)], "event_id bigint, k bigint, t long")
    right = spark.createDataFrame([(1, 10 * S, 7.0)], "k bigint, t long, v double")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t").collect()
    assert out[0]["v_asof"] == 7.0  # DuckDB ASOF semantics: >= includes ties


def test_asof_join_picks_latest_of_several(spark):
    left = spark.createDataFrame([(1, 1, 100 * S)], "event_id bigint, k bigint, t long")
    right = spark.createDataFrame(
        [(1, t * S, float(t)) for t in (1, 50, 99, 150)], "k bigint, t long, v double"
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t").collect()
    assert out[0]["v_asof"] == 99.0


def test_range_join_matches_naive_inequality_join(spark):
    """Bucketized range join must return exactly the rows of the naive
    (BroadcastNestedLoop) inequality join, for intervals longer and shorter
    than the bucket width and spanning bucket boundaries."""
    events = spark.createDataFrame(
        [(i, 1, i * 600 * S) for i in range(50)], "event_id bigint, k bigint, t long"
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, 0 * S, 1800 * S),          # 3 buckets at width 600
            (11, 1, 2950 * S, 3050 * S),        # spans a boundary, short
            (12, 1, 12000 * S, 12000 * S),      # degenerate point interval
            (13, 2, 0 * S, 30000 * S),          # wrong key: no matches
        ],
        "iv_id bigint, k bigint, lo long, hi long",
    )
    got = range_join(
        events, intervals, "t", "lo", "hi", on=["k"], bucket_seconds=600
    ).select("event_id", "iv_id")
    naive = events.join(
        intervals,
        (events.k == intervals.k) & (events.t >= intervals.lo) & (events.t <= intervals.hi),
    ).select("event_id", "iv_id")
    g = {(r["event_id"], r["iv_id"]) for r in got.collect()}
    n = {(r["event_id"], r["iv_id"]) for r in naive.collect()}
    assert g == n
    assert g  # non-trivial


def test_range_join_left_preserves_unmatched_events(spark):
    """how='left' must keep events outside every interval (and events whose
    bucket matched but containment failed) with NULL interval columns —
    the round-1 advisor found the post-join WHERE silently dropped them."""
    events = spark.createDataFrame(
        [(1, 1, 100 * S), (2, 1, 5000 * S), (3, 2, 100 * S)],
        "event_id bigint, k bigint, t long",
    )
    intervals = spark.createDataFrame(
        # event 2 shares bucket 0..? no: 5000s at width 600 is bucket 8;
        # interval covers buckets 0..1 only. event 3 has no key match.
        [(10, 1, 0 * S, 700 * S)],
        "iv_id bigint, k bigint, lo long, hi long",
    )
    out = range_join(
        events, intervals, "t", "lo", "hi", on=["k"], bucket_seconds=600, how="left"
    )
    got = {r["event_id"]: r["iv_id"] for r in out.collect()}
    assert got == {1: 10, 2: None, 3: None}
    # bucket-matched-but-not-contained: same bucket, containment fails
    iv2 = spark.createDataFrame(
        [(20, 1, 200 * S, 300 * S)], "iv_id bigint, k bigint, lo long, hi long"
    )
    out2 = range_join(
        events, iv2, "t", "lo", "hi", on=["k"], bucket_seconds=600, how="left"
    )
    got2 = {r["event_id"]: r["iv_id"] for r in out2.collect()}
    assert got2 == {1: None, 2: None, 3: None}

    with pytest.raises(ValueError, match="how"):
        range_join(events, intervals, "t", "lo", "hi", how="full")


def test_range_join_plans_shuffle_not_bnlj(spark):
    events = spark.createDataFrame([(1, 1, 0)], "event_id bigint, k bigint, t long")
    intervals = spark.createDataFrame([(1, 1, 0, 10)], "iv_id bigint, k bigint, lo long, hi long")
    plan = range_join(
        events, intervals, "t", "lo", "hi", on=["k"], bucket_seconds=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_time_bucket(spark):
    df = spark.createDataFrame(
        [(0,), (3599 * S,), (3600 * S,), (7201 * S,)], "t long"
    )
    got = [r["b"] for r in df.select(time_bucket(F.col("t"), 3600).alias("b")).collect()]
    assert got == [0, 0, 1, 2]


def test_sessionize_golden(spark):
    from ml_hadoop_experiment_spark.operators.temporal import sessionize

    rows = [
        # user 1: events at 0s, 10s, 2000s (gap), 2010s, 5000s (gap)
        (1, 1, 0 * S), (2, 1, 10 * S), (3, 1, 2000 * S),
        (4, 1, 2010 * S), (5, 1, 5000 * S),
        # user 2: single event
        (6, 2, 100 * S),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, t long")
    out = sessionize(df, ["user_id"], "t", gap_seconds=600)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 0}


def test_sessionize_single_shuffle(spark):
    from ml_hadoop_experiment_spark.operators.temporal import sessionize

    df = spark.createDataFrame([(1, 1, 0)], "event_id bigint, user_id bigint, t long")
    plan = sessionize(df, ["user_id"], "t", 600)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_join_forward_golden(spark):
    left = spark.createDataFrame(
        [(1, 1, 10 * S), (2, 1, 20 * S), (3, 1, 5 * S), (4, 2, 50 * S)],
        "event_id bigint, k bigint, t long",
    )
    right = spark.createDataFrame(
        [(1, 8 * S, 100.0), (1, 15 * S, 200.0), (2, 30 * S, 300.0)],
        "k bigint, t long, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", direction="forward"
    )
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    assert got == {
        1: 200.0,  # t=10: next right at t=15
        2: None,   # t=20: nothing after
        3: 100.0,  # t=5: next right at t=8
        4: None,   # k=2: right only at t=30 < 50? no — 30 < 50, nothing after
    }


def test_asof_join_forward_tie_includes_equal_timestamp(spark):
    left = spark.createDataFrame([(1, 1, 10 * S)], "event_id bigint, k bigint, t long")
    right = spark.createDataFrame([(1, 10 * S, 7.0)], "k bigint, t long, v double")
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", direction="forward"
    ).collect()
    assert out[0]["v_asof"] == 7.0

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_time="t", right_time="t",
                  direction="nearest")


def test_asof_join_timestamp_and_bigint_mixed_scales(spark):
    """One side timestamp, the other epoch-nanos bigint: both normalize to
    a common scale and compare correctly."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, base + dt.timedelta(seconds=10))],
        "event_id bigint, k bigint, t timestamp",
    )
    ns = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * S
    right = spark.createDataFrame(
        [(1, ns + 8 * S, 100.0), (1, ns + 15 * S, 200.0)],
        "k bigint, t long, v double",
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t").collect()
    assert out[0]["v_asof"] == 100.0


class TestTrailingAggregates:
    def test_range_frame_boundaries(self, spark):
        """Events exactly window_seconds old are IN; one second older is
        OUT; ties at the same instant are all in each other's frames."""
        import datetime as dt

        import pandas as pd

        from ml_hadoop_experiment_spark.operators.temporal import (
            trailing_aggregates,
        )

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, "u", t0 - dt.timedelta(seconds=3601), 1.0),  # out of frame of r4
            (2, "u", t0 - dt.timedelta(seconds=3600), 2.0),  # edge: in
            (3, "u", t0, 4.0),                               # tie with 4
            (4, "u", t0, 8.0),
            (5, "v", t0, 16.0),                              # other key
        ]
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
        out = (
            trailing_aggregates(
                spark.createDataFrame(pdf), ["user_id"], "ts", "value", 3600
            )
            .toPandas()
            .set_index("event_id")
        )
        # rows 3/4 (t0): frame = {2,3,4} (1 is 3601s old), ties both included
        assert out.loc[3, "trail_cnt"] == 3 and out.loc[4, "trail_cnt"] == 3
        assert out.loc[3, "trail_sum"] == 2.0 + 4.0 + 8.0
        # row 2's frame = {1, 2}: row 1 is exactly 1s before within 3600
        assert out.loc[2, "trail_cnt"] == 2
        # keys don't leak
        assert out.loc[5, "trail_cnt"] == 1 and out.loc[5, "trail_sum"] == 16.0


class TestGapFill:
    def test_forward_fill_and_flags(self, spark):
        import datetime as dt

        import pandas as pd

        from ml_hadoop_experiment_spark.operators.temporal import gap_fill

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def at(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        rows = [
            # key "u": observations in buckets 0, 0, 3 (step = 60 s)
            ("u", at(0), 1.0),
            ("u", at(0) + dt.timedelta(seconds=30), 2.0),  # later in bucket 0
            ("u", at(3), 9.0),
            # key "v": single observation
            ("v", at(10), 5.0),
        ]
        pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
        out = (
            gap_fill(spark.createDataFrame(pdf), ["k"], "ts", "value", 60)
            .toPandas()
            .set_index(["k", "bucket"])
            .sort_index()
        )
        u = out.loc["u"]
        base = u.index.min()
        # dense grid: buckets base..base+3, gaps forward-filled from the
        # LAST observation of bucket 0 (value 2.0, not 1.0)
        assert list(u.index) == [base, base + 1, base + 2, base + 3]
        assert list(u["value"]) == [2.0, 2.0, 2.0, 9.0]
        assert list(u["n_obs"]) == [2, 0, 0, 1]
        assert list(u["filled"]) == [False, True, True, False]
        # single-observation key: one bucket, nothing generated
        assert len(out.loc["v"]) == 1

    def test_epoch_tie_with_null_prefers_non_null_in_both_engines(self, spark):
        """Two observations in the same second, one NULL: Spark orders a
        NULL struct field smallest, DuckDB largest — the not-null rank
        field must keep the engines agreeing on the non-NULL survivor."""
        import datetime as dt

        import duckdb
        import pandas as pd

        from ml_hadoop_experiment_spark.operators.temporal import (
            gap_fill,
            gap_fill_sql,
        )

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [("u", t0, None), ("u", t0, 7.0)]
        pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
        out = gap_fill(
            spark.createDataFrame(pdf, "k string, ts timestamp, value double"),
            ["k"],
            "ts",
            "value",
            60,
        ).toPandas()
        assert len(out) == 1
        assert out["value"].iloc[0] == 7.0

        con = duckdb.connect()
        con.register("t", pdf)
        duck = con.execute(gap_fill_sql("t", "k", "ts", "value", 60)).df()
        assert duck["value"].iloc[0] == 7.0
        con.close()

    def test_max_buckets_drops_wide_keys(self, spark):
        import datetime as dt

        import pandas as pd

        from ml_hadoop_experiment_spark.operators.temporal import gap_fill

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("wide", t0, 1.0),
            ("wide", t0 + dt.timedelta(hours=100), 2.0),  # span 100 buckets
            ("ok", t0, 3.0),
        ]
        pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
        out = gap_fill(
            spark.createDataFrame(pdf), ["k"], "ts", "value", 3600, max_buckets=10
        ).toPandas()
        assert set(out["k"]) == {"ok"}


class TestTimeWeightedAvg:
    def test_hold_weighting(self, spark):
        import datetime as dt

        import pandas as pd

        from ml_hadoop_experiment_spark.operators.temporal import time_weighted_avg

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # value 10 held 30 s, value 20 held 10 s, last obs carries no
            # weight: twap = (10*30 + 20*10) / 40 = 12.5
            ("u", t0, 10.0),
            ("u", t0 + dt.timedelta(seconds=30), 20.0),
            ("u", t0 + dt.timedelta(seconds=40), 999.0),
            ("single", t0, 7.0),
        ]
        pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
        out = {
            r["k"]: r
            for r in time_weighted_avg(
                spark.createDataFrame(pdf), ["k"], "ts", "value"
            ).collect()
        }
        assert out["u"]["twap"] == 12.5
        assert out["u"]["span_s"] == 40
        assert out["u"]["n_obs"] == 3
        # a single observation has no hold duration: NULL twap by contract
        assert out["single"]["twap"] is None
