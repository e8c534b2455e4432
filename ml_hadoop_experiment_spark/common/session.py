"""SparkSession construction with scale-oriented defaults.

The engine targets multi-executor clusters reading ~100 TB; tests run on
``local[N]``. All knobs here are plain Spark SQL configs so the same code
works in both modes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession


def session_defaults() -> dict[str, str]:
    """Config defaults applied to every engine session.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting
      (replaces the reference's hand-rolled ``ceil(n/4)`` shuffle-partition
      reduction, vocabulary.py:40-41 of the reference).
    - Arrow on: every Python crossing is a columnar Arrow batch
      (the reference relies on the same mechanism via ``pandas_udf``).
    - maxRecordsPerBatch bounds UDF peak memory (reference exposes the same
      control as ``batch_size``, common/spark_inference.py:130-143).
    """
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        # parquet TIMESTAMP(NANOS) files read as epoch-nanos bigint rather
        # than being rejected (temporal operators accept both; the current
        # fixtures are timestamp[us] and unaffected by this conf)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # generated-class cache sized for a query-DIVERSE workload: the
        # default 100 entries evicts compiled plans as soon as a session
        # runs more than ~30 distinct queries, re-paying Janino compile +
        # C2 JIT (measured 5 s on a 32-bit simhash expression tree —
        # BASELINE.md "Round-12 re-adjudication"). 8192 Janino classes are
        # a few hundred MB of driver metaspace at worst; a long-lived
        # production driver serving many pipelines wants them resident.
        # STATIC conf: only takes effect for the FIRST SparkSession in
        # the JVM — getOrCreate against an already-running session
        # silently ignores it. get_session verifies the live value after
        # getOrCreate and warns when the 100-entry default survived.
        "spark.sql.codegen.cache.maxEntries": "8192",
    }


def get_session(
    app_name: str = "mlhe-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict[str, str]] = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master=None`` keeps whatever the deploy environment provides
    (spark-submit / cluster manager); tests pass ``local[N]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in session_defaults().items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # spark.sql.codegen.cache.maxEntries is a StaticSQLConf: the builder
    # value binds only when THIS call created the first session in the
    # JVM. If we attached to a pre-existing session that still runs the
    # 100-entry default, say so — query-diverse sweeps will thrash the
    # codegen cache (BASELINE.md "Round-12 re-adjudication").
    want = session_defaults().get("spark.sql.codegen.cache.maxEntries")
    if want is not None:
        try:
            live = spark.conf.get("spark.sql.codegen.cache.maxEntries")
        except Exception:
            live = None
        if live is not None and live != want:
            import warnings

            warnings.warn(
                "spark.sql.codegen.cache.maxEntries is "
                f"{live} (wanted {want}): static conf ignored by "
                "getOrCreate on a pre-existing session; query-diverse "
                "workloads will re-pay codegen compiles on cache "
                "eviction",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
