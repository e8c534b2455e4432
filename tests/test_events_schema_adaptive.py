"""Declared queries must be schema-adaptive, not fixture-frozen.

Round 2 regression: the driver's events fixture changed wire type from
TIMESTAMP(NANOS)-read-as-bigint to parquet timestamp[us] (TIMESTAMP_NTZ)
and every temporal query broke. These tests write the SAME logical events
table in both encodings and assert every events-backed declared query
returns identical results on each — so the next wire-type change is a
no-op instead of four red correctness rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ml_hadoop_experiment_spark.queries import QUERIES

_N = 400
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _events_pdf() -> pd.DataFrame:
    rng = np.random.RandomState(7)
    # microsecond-resolution instants spread over ~3 days with gaps
    base_us = 1_700_000_000_000_000
    ts_us = base_us + np.sort(rng.randint(0, 3 * 86400 * 1_000_000, size=_N))
    return pd.DataFrame(
        {
            "event_id": np.arange(_N, dtype=np.int64),
            "ts_us": ts_us,
            "user_id": rng.randint(0, 20, size=_N).astype(np.int64),
            "event_type": rng.choice(_EVENT_TYPES, size=_N),
            "value": np.round(rng.uniform(0, 100, size=_N), 3),
            "props": ['{"k": %d}' % k for k in rng.randint(0, 9, size=_N)],
        }
    )


@pytest.fixture(scope="module")
def dual_dirs(tmp_path_factory):
    """(timestamp-encoded dir, bigint-nanos-encoded dir) of one table."""
    pdf = _events_pdf()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    d_ts = tmp_path_factory.mktemp("events_ts")
    t = pdf.copy()
    t["ts"] = pd.to_datetime(t.pop("ts_us"), unit="us")
    pq.write_table(
        pa.Table.from_pandas(t[cols], preserve_index=False),
        str(d_ts / "events.parquet"),
    )

    d_ns = tmp_path_factory.mktemp("events_ns")
    n = pdf.copy()
    n["ts"] = n.pop("ts_us") * 1000  # epoch-nanos bigint (round-1 wire type)
    pq.write_table(
        pa.Table.from_pandas(n[cols], preserve_index=False),
        str(d_ns / "events.parquet"),
    )
    return str(d_ts), str(d_ns)


@pytest.mark.parametrize(
    "name",
    ["events_rollup", "sessionize", "events_asof", "json_props", "user_similarity"],
)
def test_events_queries_identical_across_wire_types(spark, dual_dirs, name):
    d_ts, d_ns = dual_dirs
    a = QUERIES[name](spark, d_ts).toPandas()
    b = QUERIES[name](spark, d_ns).toPandas()
    a = a.sort_values(sorted(a.columns)).reset_index(drop=True)
    b = b.sort_values(sorted(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
