#!/usr/bin/env python
"""Rebuild the 10× scale-up fixtures SCALE.md's "Measured scale-up"
section uses (they live in /tmp and evaporate between sessions; this
pins the recipe so ratios are reproducible).

- documents: each sf0.1 doc plus 9 near-identical copies (a
  copy-specific token appended), doc_id remapped to id*10+k — the
  DUP-HEAVY worst case for pair-generation operators (every doc sits
  in a 10-wide duplicate cluster).
- events: sf0.1 events replicated 10× with event_id remapped and ts
  jittered by k seconds (keeps per-user ordering realistic).
- embeddings: sf0.1 embeddings replicated 10× with vec_id remapped
  (copies share the vector — the ANN worst case for duplicate
  neighborhoods).

Usage: PYTHONPATH=. python tools/make_scale10.py [out_dir]
(default /tmp/scale10). Then point any runner at it:
``QUERIES[name](spark, "/tmp/scale10")`` — only the three tables above
are written; queries touching other tables need the sf0.1 originals
copied/symlinked alongside.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.common import get_session

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    os.makedirs(out, exist_ok=True)
    spark = get_session(
        app_name="make-scale10",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    k10 = spark.range(10).withColumnRenamed("id", "k")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").join(k10)
    docs.select(
        (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
        F.when(F.col("k") == 0, F.col("text"))
        .otherwise(
            F.concat(F.col("text"), F.lit(" copytoken"), F.col("k").cast("string"))
        )
        .alias("text"),
        "lang",
        "source",
        # recompute over the rewritten text: cloned rows are ~11 chars
        # longer, and a stale n_chars would skew length-gated paths
        F.length(
            F.when(F.col("k") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"), F.lit(" copytoken"), F.col("k").cast("string")
                )
            )
        ).cast("bigint").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").join(k10)
    ev.select(
        (F.col("event_id") * 10 + F.col("k")).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("k").cast("double"))).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").join(k10)
    emb.select(
        (F.col("vec_id") * 10 + F.col("k")).alias("vec_id"),
        "embedding",
        "label",
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in ("documents", "events", "embeddings"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}/{t}.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
