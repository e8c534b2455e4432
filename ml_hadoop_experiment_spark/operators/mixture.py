"""Temperature-scaled data-mix planning over corpus sources.

The engine already SAMPLES a declared mix (`sampling.mixture_sample`)
and CAPS a stream at a token budget (`curation.token_budget_select`).
This module computes the mix itself — the planning step a data-mix
curator runs first: given per-source token inventories and a global
token budget, allocate the budget across sources by
temperature-scaled shares ``p_i^alpha / sum_j p_j^alpha`` (the
exponential-smoothing recipe the multilingual-LM literature uses to
keep long-tail sources from vanishing: alpha=1 is proportional,
alpha->0 is uniform — public knowledge, e.g. the mBERT/XLM-R
smoothed-sampling descriptions). The output is per source: the
inventory, the smoothed share, the token allocation, the sampling
fraction a downstream `mixture_sample` needs, and the epoch count
(allocation / inventory — >1 means the source repeats, the
oversampling signal a curator watches).

Cross-engine exactness: token inventories are integer sums; the
smoothed shares need ``pow`` — every double step (pow, the share
division, the allocation multiply) is written in ONE fixed order and
rounded once at the end, so Spark and DuckDB produce identical
doubles from identical integer inputs.

Scale shape: ONE partial-aggregated count per source over the corpus
(the only data-sized work), then a single-row total broadcast-joined
back onto the sources frame — the frame that moves is
``n_sources``-sized. At 100 TB this is one scan + k-row arithmetic.

Reference parity: criteo/ml-hadoop-experiment has no curation surface
(SURVEY.md §2) — north-star extension for training-data mixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _share_expr(tokens: Column, total_pow: Column, alpha: float) -> Column:
    """``tokens^alpha / total_pow`` with the fixed operation order the
    SQL twin mirrors."""
    return F.pow(tokens.cast("double"), F.lit(float(alpha))) / total_pow


def mixture_plan(
    df: DataFrame,
    source_col: str,
    weight_col: str | Column,
    budget: int,
    alpha: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """Per-source mix plan ``(source, n_tokens, raw_share,
    alpha_share, alloc_tokens, sample_fraction, epochs)``:

    - ``n_tokens``: the source's inventory (integer sum of
      ``weight_col`` — token counts, byte counts, any additive weight);
    - ``raw_share`` / ``alpha_share``: proportional vs
      temperature-scaled share of the corpus (``alpha`` in (0, 1]);
    - ``alloc_tokens``: ``alpha_share * budget`` — what the mix grants
      this source;
    - ``sample_fraction``: ``min(1, alloc/n)`` — feed to a downsampler
      when the grant is below inventory;
    - ``epochs``: ``alloc/n`` — >1 flags oversampling (the source
      repeats to fill its grant).

    One aggregation over the corpus; everything after is arithmetic on
    the ``n_sources``-row frame. NULL sources group like any other key;
    NULL weights count 0; sources with ZERO inventory are dropped from
    the plan (there is nothing to sample, and double division by zero
    is one of the few places Spark and DuckDB disagree).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("long")
    per_source = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.coalesce(F.sum(w), F.lit(0)).alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
    )
    # __tot is an exact integer sum; __tot_pow is a DOUBLE sum, which
    # a plain F.sum would accumulate in partition order (flaky last
    # ulps vs the sequential DuckDB oracle) — fold the per-source pow
    # terms left-to-right over a deterministically sorted list instead
    # (sort key: source with NULL->'' then n_tokens; the oracle sorts
    # identically)
    sorted_terms = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.coalesce(F.col("source"), F.lit("")).alias("k"),
                    F.col("n_tokens").alias("n"),
                )
            )
        ),
        lambda x: F.pow(x["n"].cast("double"), F.lit(float(alpha))),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("__tot"),
        F.aggregate(
            sorted_terms, F.lit(0.0), lambda acc, x: acc + x
        ).alias("__tot_pow"),
    )
    n = F.col("n_tokens").cast("double")
    alpha_share = _share_expr(F.col("n_tokens"), F.col("__tot_pow"), alpha)
    alloc = alpha_share * F.lit(float(budget))
    return per_source.join(F.broadcast(totals)).select(
        "source",
        "n_tokens",
        F.round(n / F.col("__tot").cast("double"), round_digits).alias(
            "raw_share"
        ),
        F.round(alpha_share, round_digits).alias("alpha_share"),
        F.round(alloc, round_digits).alias("alloc_tokens"),
        F.round(F.least(F.lit(1.0), alloc / n), round_digits).alias(
            "sample_fraction"
        ),
        F.round(alloc / n, round_digits).alias("epochs"),
    )


def mixture_plan_sql(
    relation: str,
    source_expr: str,
    weight_expr: str,
    budget: int,
    alpha: float = 0.3,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`mixture_plan` — same integer inventories,
    same pow/divide/multiply order, same single rounding."""
    a = float(alpha)
    r = round_digits
    return f"""
WITH per_source AS (
  SELECT source, n_tokens FROM (
    SELECT {source_expr} AS source,
           coalesce(sum(CAST({weight_expr} AS BIGINT)), 0) AS n_tokens
    FROM {relation}
    GROUP BY 1
  ) WHERE n_tokens > 0
),
totals AS (
  -- tot_pow: same left-to-right fold over the same source-sorted
  -- order as the Spark side (never a parallel float sum)
  SELECT sum(n_tokens) AS tot,
         list_reduce(
           list_prepend(
             CAST(0.0 AS DOUBLE),
             list(pow(CAST(n_tokens AS DOUBLE), {a!r})
                  ORDER BY coalesce(source, ''), n_tokens)),
           (acc, x) -> acc + x) AS tot_pow
  FROM per_source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), {r}) AS raw_share,
       round(pow(CAST(n_tokens AS DOUBLE), {a!r}) / tot_pow, {r}) AS alpha_share,
       round(pow(CAST(n_tokens AS DOUBLE), {a!r}) / tot_pow
             * CAST({float(budget)!r} AS DOUBLE), {r}) AS alloc_tokens,
       round(least(1.0, pow(CAST(n_tokens AS DOUBLE), {a!r}) / tot_pow
             * CAST({float(budget)!r} AS DOUBLE)
             / CAST(n_tokens AS DOUBLE)), {r}) AS sample_fraction,
       round(pow(CAST(n_tokens AS DOUBLE), {a!r}) / tot_pow
             * CAST({float(budget)!r} AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), {r}) AS epochs
FROM per_source, totals
"""
