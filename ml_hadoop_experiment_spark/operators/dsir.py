"""DSIR-style data selection: importance weights from bag-of-words LMs.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS — public literature): given a small TARGET corpus
(the distribution you want more of) and a large RAW corpus, estimate
cheap bag-of-features language models on both sides and weight every
raw document by its log-likelihood RATIO
``log p_target(doc) - log p_raw(doc)``; documents that look like the
target score high, generic raw text scores ~0, anti-target text scores
negative. Selection is then top-k by weight (deterministic form) or
Gumbel-top-k resampling (the paper's sampled form — compose with
``operators/sampling.weighted_priority_sample`` for that posture).

This implementation uses whitespace-unigram features with add-one
smoothing over the UNION vocabulary (the PSI discipline: both sides
priced on the same denominator structure, every token finite on both
sides), and the engine's round-then-decimal-sum contract for the
log-space sum (the ``unigram_xent`` precedent): each distinct
(doc, token)'s ``ln p_t - ln p_r`` rounds to ``round_digits`` BEFORE
the ``decimal(28,6)`` term-frequency multiply, so the per-doc sum is
exact and addition-order independent — the only float steps are two
``ln`` on identical IEEE inputs and the final division.

Scale shape: tokens explode map-side on both corpora; the only
exchanges are vocabulary-bounded token-count aggregations, a
token-keyed join of the raw tf frame against the (token, c_raw,
c_target) stats (AQE broadcasts when small), and one per-doc combine.
Totals/vocab-size travel as a 1-row broadcast. Raw text never
shuffles; nothing is driver-collected.

Reference parity: criteo/ml-hadoop-experiment has no curation surface
(SURVEY.md §2) — north-star extension for LLM data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokenization shared with the corpus-statistics family
_SPLIT = r"\s+"
_SPLIT_SQL = "\\s+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), _SPLIT)
        ).alias("tok"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """``(id, n_tokens, logratio)`` for every raw document:
    ``logratio = sum_t tf(t) * (ln p_target(t) - ln p_raw(t))`` under
    add-one-smoothed unigram LMs over the union vocabulary —
    positive = target-like. Rank by ``logratio / n_tokens`` to remove
    the length bias when documents vary widely in size."""
    rt = _tokens(raw, id_col, text_col)
    tt = _tokens(target, id_col, text_col)
    c_raw = rt.groupBy("tok").agg(F.count(F.lit(1)).alias("c_raw"))
    c_tgt = tt.groupBy("tok").agg(F.count(F.lit(1)).alias("c_tgt"))
    stats = c_raw.join(c_tgt, "tok", "full").select(
        "tok",
        F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
    )
    tots = stats.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    )

    def _lp(cnt: Column, tot: Column) -> Column:
        return F.log(
            (cnt.cast("double") + F.lit(1.0))
            / (tot.cast("double") + F.col("v").cast("double"))
        )

    tf = rt.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    term = F.round(
        _lp(F.col("c_tgt"), F.col("t_tgt"))
        - _lp(F.col("c_raw"), F.col("t_raw")),
        round_digits,
    ).cast("decimal(28,6)") * F.col("tf").cast("decimal(28,6)")
    per_doc = (
        tf.join(stats, "tok")
        .crossJoin(F.broadcast(tots))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(term).alias("__lr"),
        )
    )
    return per_doc.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("__lr").cast("double"), round_digits).alias(
            "logratio"
        ),
    )


def dsir_weights_sql(
    raw_relation: str,
    target_relation: str,
    id_expr: str,
    text_expr: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`dsir_weights` — same tokenization, same
    union-vocabulary add-one smoothing, same round-then-decimal-sum
    contract, same final rounding."""
    d = round_digits

    def toks(rel):
        return (
            f"SELECT {id_expr} AS id, unnest(regexp_split_to_array("
            f"trim(lower({text_expr})), '{_SPLIT_SQL}')) AS tok"
            f" FROM {rel}"
        )

    return f"""
WITH rt AS ({toks(raw_relation)}),
tt AS ({toks(target_relation)}),
c_raw AS (SELECT tok, count(*) AS c_raw FROM rt GROUP BY tok),
c_tgt AS (SELECT tok, count(*) AS c_tgt FROM tt GROUP BY tok),
stats AS (
  SELECT coalesce(c_raw.tok, c_tgt.tok) AS tok,
         coalesce(c_raw, 0) AS c_raw,
         coalesce(c_tgt, 0) AS c_tgt
  FROM c_raw FULL OUTER JOIN c_tgt ON c_raw.tok = c_tgt.tok
),
tots AS (
  SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt, count(*) AS v
  FROM stats
),
tf AS (SELECT id, tok, count(*) AS tf FROM rt GROUP BY id, tok)
SELECT id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(CAST(sum(
         CAST(round(
           ln((CAST(c_tgt AS DOUBLE) + 1.0)
              / (CAST(t_tgt AS DOUBLE) + CAST(v AS DOUBLE)))
           - ln((CAST(c_raw AS DOUBLE) + 1.0)
                / (CAST(t_raw AS DOUBLE) + CAST(v AS DOUBLE))),
           {d}) AS DECIMAL(28,6)) * CAST(tf AS DECIMAL(28,6))
       ) AS DOUBLE), {d}) AS logratio
FROM tf JOIN stats USING (tok), tots
GROUP BY id
"""


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    round_digits: int = 6,
    salt: int = 0,
) -> DataFrame:
    """The paper's actual selection artifact — the RESAMPLED corpus:
    ``k`` raw documents drawn without replacement with probability
    increasing in the importance weight
    ``w = exp(logratio / n_tokens)`` (the length-normalized ratio,
    Xie et al. 2023 §3's importance resampling posture), via
    deterministic priority sampling
    (:func:`~.sampling.weighted_priority_sample` — the Gumbel-top-k
    trick with the portable unit hash as the noise source, so the
    sampled set replays bit-identically in the oracle). Returns
    ``(id, n_tokens, logratio, score, priority_key, est_weight)``;
    ``SUM(est_weight)`` estimates the population weight mass.

    Determinism: ``score`` rounds the per-token ratio to
    ``round_digits`` BEFORE ``exp``, and the weight rounds AFTER, so
    the only cross-engine float risk is a round-boundary straddle of
    two correctly-rounded-to-1-ulp ``exp`` calls. Documents whose
    weight rounds to zero (extremely anti-target, below
    ``0.5e-round_digits``) drop out of the draw — zero inclusion
    probability, documented and replayed.

    Scale: :func:`dsir_weights`'s exchanges are vocabulary-bounded;
    the draw itself is a TakeOrderedAndProject (per-partition top-k
    heaps, ``(k+1) x partitions`` rows move, no global sort).
    """
    from ml_hadoop_experiment_spark.operators.sampling import (
        weighted_priority_sample,
    )

    w = dsir_weights(raw, target, id_col, text_col, round_digits)
    score = F.round(
        F.col("logratio") / F.col("n_tokens").cast("double"),
        round_digits,
    )
    weighted = w.withColumn("score", score).withColumn(
        "__w", F.round(F.exp(F.col("score")), round_digits)
    )
    out = weighted_priority_sample(
        weighted, F.col("id"), "__w", k, salt=salt
    )
    return out.select(
        "id", "n_tokens", "logratio", "score", "priority_key",
        "est_weight",
    )


def dsir_resample_sql(
    raw_relation: str,
    target_relation: str,
    id_expr: str,
    text_expr: str,
    k: int,
    round_digits: int = 6,
    salt: int = 0,
) -> str:
    """DuckDB twin of :func:`dsir_resample` — the weights twin composed
    through the priority-sampling twin, same rounding fences."""
    from ml_hadoop_experiment_spark.operators.sampling import (
        weighted_priority_sample_sql,
    )

    d = round_digits
    inner = dsir_weights_sql(
        raw_relation, target_relation, id_expr, text_expr, d
    )
    weighted = (
        f"(SELECT id, n_tokens, logratio,"
        f" round(logratio / CAST(n_tokens AS DOUBLE), {d}) AS score,"
        f" round(exp(round(logratio / CAST(n_tokens AS DOUBLE), {d})),"
        f" {d}) AS __w"
        f" FROM ({inner}))"
    )
    sample = weighted_priority_sample_sql(
        weighted, "id", "__w", "id, n_tokens, logratio, score", k,
        salt=salt,
    )
    return (
        f"SELECT id, n_tokens, logratio, score, priority_key,"
        f" est_weight FROM ({sample})"
    )
