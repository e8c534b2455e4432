"""Pipeline diagnostics: join-skew reports, snapshot diffs, data-quality audits.

Three operators a 100 TB pipeline runs BEFORE and AFTER the heavy jobs:

- :func:`skew_report` — per-key frequency skew for a prospective
  join/groupBy key, with a recommended salting factor per hot key. At
  scale, key skew is the dominant shuffle failure mode (one reducer
  gets the hot key's rows); this is the measurement that decides
  between a plain shuffle join, ``salted_join`` (operators/joins.py),
  and AQE's skew-join split. The plan is one partial-aggregated
  exchange bounded by the DISTINCT key count (never the row count) and
  a TakeOrderedAndProject top-N — no full sort, nothing row-sized on
  the wire.
- :func:`snapshot_diff` — keyed delta between two table snapshots
  (added / removed / changed), the "what did this crawl change"
  primitive behind incremental processing. Output is DELTA-sized;
  unchanged rows (the overwhelming majority at steady state) are
  dropped before anything wide is carried. One exchange over
  (key, value-digest) projections — the payloads never shuffle.
- :func:`dq_audit` — N predicate rules evaluated in ONE scan, returning
  (rule, violations, checked) per rule. All rule evaluation is
  map-side JVM codegen; the only exchange is the single-row partial-agg
  combine, so audit cost is one read of the table regardless of rule
  count.

Reference parity: the reference engine (criteo/ml-hadoop-experiment)
has no diagnostics surface — its scope ends at ML-inference glue
(`common/spark_inference.py`, sampling, vocab); these are extension
operators for the training-data-pipeline tier, same family as
operators/dedup.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import content_digest


def skew_report(
    df: DataFrame,
    key_cols: List[str],
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` heaviest keys of ``df`` under ``key_cols``, with
    the skew statistics that size a mitigation:

    - ``cnt``: the key's row count;
    - ``share``: ``cnt / total_rows`` (double);
    - ``skew_factor``: ``cnt / mean_rows_per_key`` (double) — 1.0 is a
      perfectly uniform key, 100.0 means one reducer would carry 100x
      its fair share;
    - ``salt_factor``: ``ceil(skew_factor)`` as a bigint — the salt
      count that brings this key's per-reducer share back to the mean
      (feed it to ``salted_join``'s ``salt`` parameter).

    Plan shape: ``groupBy(keys).count()`` partial-aggregates map-side,
    so the one real exchange carries at most one row per distinct key
    per input partition; the grand totals reduce the SAME exchange
    output (Spark's ReusedExchange — verified in tests, so the input
    is scanned once) into a one-row broadcast; the top-N is
    TakeOrderedAndProject (no global sort). Ties order by the key
    ascending — a total order, so row ``top_n`` is deterministic.

    Cross-engine note: ``share`` and ``skew_factor`` are each ONE
    IEEE division on exact integer inputs (``salt_factor`` stays in
    integer arithmetic end-to-end), so DuckDB twins match bit-exactly.
    """
    keys = [F.col(k) for k in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *[F.col(k) for k in key_cols],
            F.col("cnt"),
            (F.col("cnt") / F.col("__total")).alias("share"),
            (F.col("cnt") * F.col("__n_keys") / F.col("__total")).alias(
                "skew_factor"
            ),
            # ceil(cnt * n_keys / total) in exact bigint arithmetic
            # (`div` is Spark's integer division, DuckDB's `//`)
            F.expr("(cnt * __n_keys + __total - 1) div __total")
            .cast("long")
            .alias("salt_factor"),
        )
    )
    order = [F.col("cnt").desc()] + [F.col(k).asc() for k in key_cols]
    return ranked.orderBy(*order).limit(top_n)


def skew_report_sql(
    table: str, key_cols: List[str], top_n: int = 20
) -> str:
    """DuckDB twin of :func:`skew_report` (same names, same arithmetic
    shape: single divisions on exact integers, integer ceil)."""
    keys = ", ".join(key_cols)
    order_keys = ", ".join(f"{k} ASC" for k in key_cols)
    return f"""
WITH counts AS (
  SELECT {keys}, CAST(count(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY {keys}
), totals AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM counts
)
SELECT {keys}, cnt,
       cnt / CAST(total AS DOUBLE) AS share,
       cnt * n_keys / CAST(total AS DOUBLE) AS skew_factor,
       CAST((cnt * n_keys + total - 1) // total AS BIGINT) AS salt_factor
FROM counts, totals
ORDER BY cnt DESC, {order_keys}
LIMIT {top_n}
"""


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: List[str],
    value_cols: List[str],
) -> DataFrame:
    """Keyed delta between two snapshots: one row per key that was
    ``added`` (in ``new`` only), ``removed`` (in ``old`` only), or
    ``changed`` (present in both with differing ``value_cols``
    content). Keys present in both with identical content produce NO
    row — at steady state that is almost every key, so the output is
    delta-sized. Keys must be unique within each snapshot (the usual
    snapshot contract); null-safe on values via the digest's null
    sentinel.

    Plan shape: each side projects to (key, 128-bit content digest) —
    map-only, narrow — then a side-tagged union partial-aggregates into
    ONE exchange keyed on ``key_cols`` whose rows carry two digests and
    two presence flags, never the payload columns. Compare/classify is
    codegen on the agg output. At a 100 TB snapshot pair this moves
    2 x (key + 16 bytes) per row through one shuffle — the minimum any
    exact diff can move — and nothing else.
    """
    digest = content_digest([F.col(c) for c in value_cols]).alias("__digest")
    tagged = old.select(
        *key_cols, digest, F.lit(0).alias("__side")
    ).unionByName(new.select(*key_cols, digest, F.lit(1).alias("__side")))
    merged = tagged.groupBy(*key_cols).agg(
        F.max(F.when(F.col("__side") == 0, F.col("__digest"))).alias("__old"),
        F.max(F.when(F.col("__side") == 1, F.col("__digest"))).alias("__new"),
    )
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(F.col("__old") != F.col("__new"), F.lit("changed"))
    )
    return (
        merged.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def snapshot_diff_sql(
    old_table: str,
    new_table: str,
    key_cols: List[str],
    value_cols: List[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff`. Compares the raw
    null-sentineled content instead of the md5 (same equivalence
    relation; the digest is collision-free at fixture scale and
    injective on the sentineled string by construction)."""
    keys = ", ".join(key_cols)
    content = " || ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0) || 'null')" for c in value_cols
    )
    join_on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    key_out = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in key_cols)
    return f"""
WITH o AS (SELECT {keys}, {content} AS c FROM {old_table}),
     n AS (SELECT {keys}, {content} AS c FROM {new_table})
SELECT {key_out},
       CASE WHEN o.c IS NULL THEN 'added'
            WHEN n.c IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM o FULL OUTER JOIN n ON {join_on}
WHERE o.c IS NULL OR n.c IS NULL OR o.c <> n.c
"""


def dq_audit(
    df: DataFrame,
    rules: Sequence[Tuple[str, Column]],
) -> DataFrame:
    """Evaluate data-quality ``rules`` — ``(name, violation_predicate)``
    pairs where the predicate is TRUE on a violating row — in ONE scan
    of ``df``. Returns one row per rule: ``rule`` (string),
    ``violations`` (bigint — rows where the predicate is TRUE; NULL
    predicate results count as non-violations, the SQL three-valued
    convention), ``checked`` (bigint — total rows).

    Plan shape: every rule becomes a ``sum(CASE WHEN ...)`` column in a
    single aggregate, so rule evaluation is map-side whole-stage
    codegen and the only exchange is the one-row partial-agg combine;
    the per-rule unpivot (``stack``) runs on that single row. Audit
    cost is one read of the table, independent of rule count.
    """
    if not rules:
        raise ValueError("dq_audit needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = [
        F.coalesce(
            F.sum(
                F.when(pred.cast("boolean"), F.lit(1)).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    one = df.agg(*aggs, F.count(F.lit(1)).alias("__checked"))
    stack_args = ", ".join(
        f"'{n}', __v{i}" for i, (n, _) in enumerate(rules)
    )
    return one.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, violations)"
        ),
        F.col("__checked").alias("checked"),
    ).select(
        F.col("rule"),
        F.col("violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
    )


def dq_audit_sql(
    table: str, rules: Sequence[Tuple[str, str]]
) -> str:
    """DuckDB twin of :func:`dq_audit`: ``rules`` as (name,
    SQL-predicate) pairs, one-scan form via FILTER aggregates, UNION
    ALL unpivot."""
    parts = [
        f"SELECT '{n}' AS rule, "
        f"CAST(count(*) FILTER (WHERE {p}) AS BIGINT) AS violations, "
        f"CAST(count(*) AS BIGINT) AS checked FROM {table}"
        for n, p in rules
    ]
    return "\nUNION ALL\n".join(parts)


__all__ = [
    "skew_report",
    "skew_report_sql",
    "snapshot_diff",
    "snapshot_diff_sql",
    "dq_audit",
    "dq_audit_sql",
]
