"""Structured Streaming drains (availableNow stateful queries).

Split verbatim from the single-file queries.py (round 11) so the
per-domain modules stay small; QUERIES / ORACLE_SQL in the package
__init__ are the only public surface. Block order within this module
preserves the original file order (two-stage SQL template/finalize
assignments depend on it).
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
from ml_hadoop_experiment_spark.queries._shared import _drained_state_partitions, _ensure_confs, _normalize_event_time, _t  # noqa: E501
from ml_hadoop_experiment_spark.queries.reference import SQL_UDF_LINEAR_SCORE, _LinearScorer  # noqa: E501
from ml_hadoop_experiment_spark.queries.stats import SQL_PSI_DRIFT  # noqa: E501
from ml_hadoop_experiment_spark.queries.dedup import SQL_SIMHASH_INCR  # noqa: E501




def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (applyInPandasWithState) driven to
    completion: the documents table streamed as micro-batches through
    ``streaming.stateful.stateful_dedup`` on ``doc_id``, emitting each key
    exactly once. With unique fixture doc_ids the result set equals
    SELECT doc_id FROM documents — which makes a real streaming operator
    fully oracle-checkable."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.stateful import stateful_dedup

    # schema from a batch read — never hard-coded (the round-2 lesson);
    # the file source needs a directory, so glob-filter to the one table
    wire_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id")
    )
    out = stateful_dedup(stream, ["doc_id"])
    sink = f"streaming_dedup_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink)


SQL_STREAMING_DEDUP = """
SELECT doc_id FROM documents
"""


def q_streaming_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count sketch
    (streaming/sketches.stateful_hll_distinct): distinct users per
    event type with HLL registers as the per-key state (m=256 ints per
    key FOREVER, vs exact-distinct state that grows with cardinality),
    drained availableNow. The emitted (key, register, M) rows are
    max-merged and finished through the SAME estimator expression as
    the batch sketch, so the streaming result equals a batch replay —
    and the DuckDB oracle replays that batch estimator over events,
    making a stateful streaming sketch fully oracle-checkable."""
    import uuid

    from ml_hadoop_experiment_spark.operators.hll import (
        estimate_from_register_rows,
    )
    from ml_hadoop_experiment_spark.streaming.sketches import (
        stateful_hll_distinct,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "user_id")
    )
    out = stateful_hll_distinct(stream, ["event_type"], "user_id", p=8)
    sink = f"streaming_distinct_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    regs = (
        spark.table(sink)
        .groupBy("event_type", "register")
        .agg(F.max("M").alias("M"))
    )
    return estimate_from_register_rows(regs, 8, ["event_type"]).select(
        "event_type", "n_est"
    )


def _sql_streaming_distinct() -> str:
    from ml_hadoop_experiment_spark.operators.hll import (
        hll_keyed_estimate_sql,
    )

    return hll_keyed_estimate_sql(
        "events", "event_type", "user_id", p=8, out_key="event_type"
    )


SQL_STREAMING_DISTINCT = _sql_streaming_distinct()


def q_streaming_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile sketch
    (streaming/quantiles.stateful_histogram): p50/p90/p99 of event
    value per event type with a fixed-width histogram as the per-key
    state (1000 longs per key FOREVER, vs exact quantile state that
    grows with cardinality), drained availableNow. The emitted
    (key, bin, cnt) rows are max-merged (counts only grow) and
    finished through the SAME estimator as the batch sketch
    (operators/histogram.quantiles_from_histogram — lower edge of the
    bin holding rank ceil(q*N)), so the streaming result equals a
    batch replay and the DuckDB oracle replays that batch chain over
    events."""
    import uuid

    from ml_hadoop_experiment_spark.operators.histogram import (
        quantiles_from_histogram,
    )
    from ml_hadoop_experiment_spark.streaming.quantiles import (
        stateful_histogram,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "value")
    )
    out = stateful_histogram(
        stream, ["event_type"], "value", lo=0.0, hi=500.0, n_bins=1000
    )
    sink = f"streaming_quantiles_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    sketch = (
        spark.table(sink)
        .groupBy("event_type", "bin")
        .agg(F.max("cnt").alias("cnt"))
    )
    return quantiles_from_histogram(
        sketch, ["event_type"], lo=0.0, hi=500.0, n_bins=1000,
        qs=(0.5, 0.9, 0.99),
    )


def _sql_streaming_quantiles() -> str:
    from ml_hadoop_experiment_spark.operators.histogram import (
        histogram_quantiles_sql,
    )

    return histogram_quantiles_sql(
        "events", ["event_type"], "value", lo=0.0, hi=500.0,
        n_bins=1000, qs=(0.5, 0.9, 0.99),
    )


SQL_STREAMING_QUANTILES = _sql_streaming_quantiles()


def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters
    (streaming/sketches.stateful_heavy_hitters): per-event-type
    Misra-Gries candidate state folded over the stream (bounded at
    `capacity` counters per key forever), drained availableNow; the
    FINAL summary (max-seq emission per key — MG counters are not
    monotone, so last wins, not max-merge) supplies the candidate set,
    and the batch operator's exact-recount step finishes it: broadcast
    the candidates against the stored events, count exactly, top-5
    users per event type under the (count desc, user asc) total order.
    At gate scale the per-key cardinality (150 at sf0.01, 1500 at
    sf0.1) sits far under capacity=4096, so the MG bound certifies the
    candidate superset and the result equals DuckDB's full exact
    aggregation; the truncation path is pytest-gated
    (tests/test_streaming_sketches.py)."""
    import uuid

    from pyspark.sql import Window

    from ml_hadoop_experiment_spark.streaming.sketches import (
        stateful_heavy_hitters,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "user_id")
    )
    out = stateful_heavy_hitters(
        stream, ["event_type"], "user_id", capacity=4096
    )
    sink = f"streaming_hh_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    sunk = spark.table(sink)
    final = (
        sunk.withColumn(
            "__mx", F.max("seq").over(Window.partitionBy("event_type"))
        )
        .where(F.col("seq") == F.col("__mx"))
        .select(F.col("event_type").alias("__et"), F.col("token"))
    )
    ev = _t(spark, sf_dir, "events")
    counted = (
        ev.join(
            F.broadcast(final),
            (ev["event_type"] == final["__et"])
            & (ev["user_id"].cast("string") == final["token"]),
        )
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_occurrences").desc(), F.col("user_id").asc()
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .select("event_type", "user_id", "n_occurrences")
    )


def q_streaming_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deterministic bounded sample
    (streaming/sampling.stateful_priority_sample): the 8
    smallest-portable-hash users per event type, held as EXACTLY k
    (id, priority) pairs of stream state per key forever. Bottom-k by
    a pure hash of the id makes the sample a function of the ID SET —
    arrival order, batch boundaries, and duplicates cannot change it —
    so the drained result equals the batch twin exactly: DuckDB ranks
    DISTINCT (event_type, user_id) by the same hash integers and takes
    the same 8 (the max-seq emission per key is the whole-stream
    sample, the MG convention)."""
    import uuid

    from pyspark.sql import Window

    from ml_hadoop_experiment_spark.streaming.sampling import (
        stateful_priority_sample,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "user_id")
    )
    out = stateful_priority_sample(
        stream, ["event_type"], "user_id", k=8, salt=7
    )
    sink = f"streaming_sample_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    sunk = spark.table(sink)
    return (
        sunk.withColumn(
            "__mx", F.max("seq").over(Window.partitionBy("event_type"))
        )
        .where(F.col("seq") == F.col("__mx"))
        .select(
            "event_type",
            F.col("id").alias("user_id"),
            "priority",
        )
    )


def _sql_streaming_sample() -> str:
    from ml_hadoop_experiment_spark.functions.hashing import (
        portable_int_hash_sql,
    )

    pri = portable_int_hash_sql("user_id", salt=7)
    return f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
r AS (
  SELECT event_type, user_id, CAST({pri} AS BIGINT) AS priority,
         row_number() OVER (
           PARTITION BY event_type ORDER BY {pri} ASC, user_id ASC
         ) AS rn
  FROM d
)
SELECT event_type, user_id, priority FROM r WHERE rn <= 8
"""


SQL_STREAMING_SAMPLE = _sql_streaming_sample()


SQL_STREAMING_HEAVY_HITTERS = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS n_occurrences
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, n_occurrences,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY n_occurrences DESC, user_id ASC
         ) AS rn
  FROM c
)
SELECT event_type, user_id, n_occurrences FROM r WHERE rn <= 5
"""



def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (streaming/joins.stream_static_enrich):
    the orders table streamed as micro-batches, each batch inner-joined
    to the STATIC customer dimension (broadcast — the stream never
    shuffles, no state store, no watermark). The canonical streaming
    feature-lookup; drained availableNow, the result set equals the
    batch join, making the streaming plan fully oracle-checkable."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.enrich import stream_static_enrich

    wire_schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    out = stream_static_enrich(
        stream, customer, stream["o_custkey"] == customer["c_custkey"]
    ).select("o_orderkey", "c_mktsegment", "o_totalprice")
    sink = f"streaming_enrich_{uuid.uuid4().hex}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


SQL_STREAMING_ENRICH = """
SELECT o_orderkey, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation (Structured Streaming) run
    to completion over the events stream: hourly count + value sum per
    event_type. Because the stream is drained with availableNow and the
    watermark admits all fixture rows, the result equals the batch hourly
    rollup — a real streaming window operator, fully oracle-checked.

    The stream schema is taken from a batch read of the same file — never
    hard-coded (round 2's frozen ``ts bigint`` schema silently coerced the
    fixture's µs timestamps and collapsed every event into two windows) —
    then ``ts`` normalizes to TIMESTAMP exactly like the batch loader.
    Outputs report the window start as an epoch-seconds bigint (portable)."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.inference import (
        windowed_event_aggregates,
    )

    _ensure_confs(spark)
    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _normalize_event_time(
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = windowed_event_aggregates(
        stream, ts_col="ts", key_col="event_type", value_col="value",
        window="1 hour", watermark="1 hour",
    )
    sink = f"streaming_rollup_{uuid.uuid4().hex}"
    # complete mode: a drained finite stream emits every window, including
    # the final ones append mode would hold back waiting for a watermark
    # advance that never comes after the last micro-batch
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink).select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
    )


SQL_STREAMING_ROLLUP = """
SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600 AS window_start_s,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows (F.session_window) drained to completion
    over the events stream: per-user gap-merged sessions with event counts.
    Because the stream drains fully (availableNow) and the watermark admits
    every fixture row, the emitted sessions equal the batch gap
    sessionization — a real stateful streaming operator, fully
    oracle-checked against the lag+running-sum batch formulation (boundary
    semantics verified identical: gap == threshold merges, > splits).
    Outputs epoch-µs session starts (portable; no timestamps)."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.inference import (
        session_window_aggregates,
    )

    _ensure_confs(spark)
    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _normalize_event_time(
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = session_window_aggregates(
        stream, ts_col="ts", key_col="user_id", gap="30 minutes", watermark="1 hour"
    )
    sink = f"streaming_sessionize_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
    )


SQL_STREAMING_SESSIONIZE = """
WITH s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - 1 AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts ASC)) > 1800000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
  )
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


def q_streaming_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming inference: the U1 vectorized-inference column applied to a
    STREAMING DataFrame (same operator, same pandas_udf — Structured
    Streaming runs it per micro-batch) and drained to completion. Result
    equals the batch ``udf_linear_score``, so a real streaming-inference
    path is fully oracle-checked."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.inference import streaming_inference

    _ensure_confs(spark)
    wire_schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    scored = streaming_inference(
        stream,
        _LinearScorer(),
        ["l_extendedprice", "l_discount"],
        lambda m, b: m.predict(b[0], b[1]),
        output_type="double",
        batch_size=4096,
        output_col="score",
    ).select("l_orderkey", "l_linenumber", "score")
    sink = f"streaming_score_{uuid.uuid4().hex}"
    q = (
        scored.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


SQL_STREAMING_SCORE = SQL_UDF_LINEAR_SCORE


def q_streaming_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-stream running moments (streaming/moments.moment_sums):
    count/mean/std of event value per event type as a NATIVE streaming
    aggregation (three integers of state per key, no Python state),
    drained availableNow in complete mode. Fixed-point quantization
    (floor(v*100 + 0.5)) makes the sums exact integers, so the
    streamed result equals the batch replay bit-for-bit under any
    micro-batching — the DuckDB oracle replays the same quantization,
    integer sums, and fixed-order double finisher."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.moments import (
        moment_sums,
        moments_from_sums,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_type", "value")
    )
    sums = moment_sums(stream, ["event_type"], "value", scale=100)
    sink = f"streaming_moments_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            sums.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return moments_from_sums(
        spark.table(sink), ["event_type"], scale=100
    )


def _sql_streaming_moments() -> str:
    from ml_hadoop_experiment_spark.streaming.moments import moments_sql

    return moments_sql("events", ["event_type"], "value", scale=100)


SQL_STREAMING_MOMENTS = _sql_streaming_moments()


def q_streaming_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the purchase-event value stream folds
    into the bounded histogram state (streaming/quantiles.
    stateful_histogram), and the drained sketch is scored against a
    STATIC reference slice (view events, batch-binned on the same
    grid) by the PSI finisher (operators/drift.psi_from_counts) —
    the composition an ingestion pipeline actually runs: sketch the
    live side, hold the reference, alert on sum(psi_term). Identical
    result contract to psi_drift, so the same DuckDB oracle gates it
    (the simhash_index precedent; the stream==batch sketch identity
    is pytest-pinned in test_streaming_quantiles)."""
    import uuid

    from ml_hadoop_experiment_spark.operators.drift import psi_from_counts
    from ml_hadoop_experiment_spark.operators.histogram import (
        histogram_counts,
    )
    from ml_hadoop_experiment_spark.streaming.quantiles import (
        stateful_histogram,
    )

    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("event_type", "value")
    )
    out = stateful_histogram(
        stream, ["event_type"], "value", lo=0.0, hi=500.0, n_bins=20
    )
    sink = f"streaming_psi_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    live = (
        spark.table(sink)
        .groupBy("bin")
        .agg(F.max("cnt").alias("cnt"))
    )
    ref = histogram_counts(
        _t(spark, sf_dir, "events").where(
            F.col("event_type") == "view"
        ),
        [], "value", lo=0.0, hi=500.0, n_bins=20,
    )
    return psi_from_counts(live, ref, n_bins=20)


SQL_STREAMING_PSI = SQL_PSI_DRIFT


def _drained_join_state_partitions(spark: SparkSession, cap: int = 4):
    """Stream-stream-JOIN variant of ``_shared._drained_state_partitions``:
    same restore-after context manager, but the cap sizes per-operator
    STATE-STORE COUNT rather than partitions. A stream-stream join
    instantiates 4 stores per partition (keyToNumValues +
    keyWithIndexToValue, per side) where dedup/aggregation run one, and
    the drain's zero-row watermark-finalization batch pays a commit per
    store: measured 1.8 s of addBatch for 0 rows at cap 8 (32 stores,
    `recentProgress[].durationMs`, local[32] sf0.1). cap=4 holds the
    same ~16-store budget a single-store drain has at 8: the drain fell
    4.55 -> 2.70 s (min of 2 after warm) while single-store drains keep
    the default (streaming_dedup REGRESSES 1.93 -> 2.78 below 8 — its
    per-key Python work wants the parallelism). Production sizes this
    by key cardinality / throughput, not a constant (BASELINE.md
    "Round-14 receipts")."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(int(prev), cap))
        )
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return _cm()


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join, drained availableNow: purchases
    within 30 minutes after a click by the same user. Both sides are
    state-store partitioned on user_id and watermarked so join state is
    bounded by the time window — the canonical streaming correlation
    shape the batch oracle mirrors with a plain interval join."""
    import uuid

    from ml_hadoop_experiment_spark.streaming.joins import interval_join

    _ensure_confs(spark)
    wire_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _normalize_event_time(
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    joined = interval_join(
        clicks, purchases, "user_id", "ts", upper="30 minutes", watermark="1 hour"
    )
    out = joined.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        (
            F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts"))
        ).alias("gap_us"),
        F.col("r_value").alias("purchase_value"),
    )
    sink = f"streaming_ij_{uuid.uuid4().hex}"
    # state stores are per-partition PER JOIN SIDE here — 4 per
    # partition, so the join drain budgets STORES, not partitions
    # (r14: see _drained_join_state_partitions)
    with _drained_join_state_partitions(spark, cap=4):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink)


SQL_STREAMING_INTERVAL_JOIN = """
SELECT c.user_id AS user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
       p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def q_streaming_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming content near-dup (round 12 —
    streaming/content.stream_simhash_against_index): the crawl-batch
    steady state as an actual stream — new documents (doc_id % 10 == 0)
    arrive as micro-batches, are SimHash-fingerprinted in-flight (pure
    codegen expression on the streaming frame), and stream-static join
    the PINNED corpus index (build_simhash_index over the other 90%,
    bits=32, hamming <= 3 — exactly q_simhash_index's corpus side);
    stateful dropDuplicates emits each candidate pair once across all
    batches; drained availableNow. Recall is EXACT at the radius
    (pigeonhole is per-pair, batching-independent), so the drained
    result equals the batch operator's and the oracle IS
    SQL_SIMHASH_INCR — a real streaming content-dedup pipeline,
    hash-gated."""
    import uuid

    from ml_hadoop_experiment_spark.operators.simhash_index import (
        build_simhash_index,
    )
    from ml_hadoop_experiment_spark.streaming.content import (
        stream_simhash_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index = build_simhash_index(
        corpus, "doc_id", "text", bits=32, max_hamming=3
    )
    wire_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(wire_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    out = stream_simhash_against_index(stream, index, "doc_id", "text")
    sink = f"streaming_simhash_{uuid.uuid4().hex}"
    with _drained_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink)


SQL_STREAMING_SIMHASH = SQL_SIMHASH_INCR
