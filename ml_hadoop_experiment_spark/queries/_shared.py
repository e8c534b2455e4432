"""Shared fixtures and session plumbing for every declared query.

Split verbatim from the single-file queries.py (round 11).
"""

from __future__ import annotations
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ml_hadoop_experiment_spark.functions.hashing import (
    portable_unit_hash_sql,
)
from ml_hadoop_experiment_spark.operators.inference import with_inference_column
from ml_hadoop_experiment_spark.operators.sampling import sample_with_predicate
from ml_hadoop_experiment_spark.operators.vocabulary import vocabulary_dataframe
# --------------------------------------------------------------------------
# A4/A5: bootstrap metric evaluation (scalable Poisson form; the exact
# multinomial port is operators/bootstrap.evaluate_bootstrap, unit-tested).
# --------------------------------------------------------------------------

from ml_hadoop_experiment_spark.operators.bootstrap import (
    poisson_bootstrap_metrics,
    poisson_bootstrap_metrics_sql,
)
# ==========================================================================
# Extension queries (BASELINE.json north-star): text analysis, dedup,
# similarity search, multimodal plumbing.
# ==========================================================================

from ml_hadoop_experiment_spark.functions import text as TX
from ml_hadoop_experiment_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_sql,
    tokens_frame,
)
from ml_hadoop_experiment_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
)
from ml_hadoop_experiment_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_bucket_sql,
    lsh_bucketed,
)




# Tables whose declared queries run expensive per-row expressions (md5 per
# token, vector math): worth a small repartition shuffle to escape the
# single-row-group scan bottleneck. The TPC-H-ish tables run light
# expressions/aggregations where the extra shuffle costs more than it saves.
_FAN_OUT_TABLES = {"documents", "embeddings"}


# Runtime-settable engine defaults a driver-provided session may lack.
# UTC pins TIMESTAMP_NTZ↔TIMESTAMP casts to the identity mapping (the
# events fixture is parquet timestamp[us], read as TIMESTAMP_NTZ); Arrow
# keeps results/latency identical to get_session().
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _materialize_ctes(sql: str) -> str:
    """Rewrite every non-recursive CTE head ``name AS (`` to
    ``name AS MATERIALIZED (`` — DuckDB inlines plain CTEs PER
    REFERENCE, so an oracle whose fingerprint/codebook CTE is read by
    several union arms or join sides re-evaluates it each time
    (measured r14: dup_clusters' closure 36.6 -> 1.1 s,
    pq_residual_index 28.6 -> 0.3 s at sf0.001, values identical —
    checked row-for-row for every converted oracle). Recursive heads
    (``name(cols) AS (``) don't match the pattern and stay inlined, as
    DuckDB requires. Results are unchanged by construction — this is
    an evaluation hint, part of the oracle TEXT only."""
    import re

    return re.sub(r"(\b[a-zA-Z_]\w*\s+AS)\s*\(", r"\1 MATERIALIZED (", sql)


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)  # loud on static confs: a silent skip here
            # cost round 2 its bench (stale nanosAsLong masked a fixture
            # schema change) — if the session can't take these, fail now


#: fixture event-type domain (used by pivot/similarity/salted-join
#: queries and their VALUES-based oracle dims)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


#: state-store partition cap for the stateful streaming drains. One state
#: store is instantiated per shuffle partition (per side for a
#: stream-stream join) and AQE cannot resize stateful plans, so the
#: partition count must be sized to the workload BEFORE the first
#: checkpoint — the streaming analog of AQE's batch coalescing. Measured
#: on the sf0.1 drains (local[32], min of 2, 2026-08-14): interval join
#: 5.8 s -> 2.2 s (round 4), rollup 1.08 -> 0.71 s, sessionize
#: 1.22 -> 0.89 s at cap 8 vs the 32-partition session default. A
#: production deployment sets this to its key-cardinality / throughput
#: target instead.
_STREAM_STATE_PARTITIONS = 8


def _drained_state_partitions(spark: SparkSession):
    """Context manager: cap shuffle (= state-store) partitions for a
    stateful streaming drain, restoring the session value after."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(prev), _STREAM_STATE_PARTITIONS)),
        )
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return _cm()


def _normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """One schema adaptation point for the events table's time column.

    The driver has shipped this fixture as TIMESTAMP(NANOS)-read-as-bigint
    (round 1) and as parquet timestamp[us]/TIMESTAMP_NTZ (round 2+); every
    downstream query assumes one canonical type instead of sniffing the
    wire format itself. Output: TIMESTAMP (UTC session tz, so NTZ wall
    clocks map to the same instant). Integer division for the nanos path —
    a double-routed divide loses precision above 2^53 ns (~1970+104 days).
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return df
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    # integral epoch-nanos (legacy fixture convention)
    return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table; fan compute-heavy tables out to parallelism.

    The local fixtures are single-file/single-row-group parquet, which scans
    as ONE task and would serialize every per-row pipeline below (a parquet
    split can't be finer than a row group). ``fan_out`` repartitions only
    when the scan yields fewer partitions than the cluster's parallelism —
    on production multi-row-group data it's a no-op, so no extra shuffle at
    scale. All declared queries are row-value deterministic (portable hash /
    digests / pure expressions), so repartitioning never changes results.

    The events table's ``ts`` is normalized to TIMESTAMP here (see
    ``_normalize_event_time``) — queries never see the wire type.
    """
    _ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_time(df)
    if name in _FAN_OUT_TABLES:
        from ml_hadoop_experiment_spark.plans.optimize import fan_out

        df = fan_out(df)
    return df
