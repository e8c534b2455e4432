"""Per-document n-gram novelty against a reference corpus.

The quality/contamination scorer between two existing families:
``decontaminate`` (operators/curation.py) asks "does this doc CONTAIN a
known eval n-gram" (a yes/no kill rule); ``rare_token_ratio`` /
``unigram_xent`` (operators/corpus.py) score a doc against the corpus's
OWN distribution. Novelty asks the cross-corpus question a data-mix
curator actually has: what fraction of this candidate document's
content is NEW relative to the corpus we already train on? Low novelty
= redundant acquisition (near-paraphrase of held data — skip or
downweight); ~1.0 novelty on a trusted-domain doc = fresh signal worth
keeping. The same score run against an EVAL corpus is a leakage
screen: high shared fraction = contamination candidate for the exact
verifiers (``jaccard_join``, ``overlap_pairs``).

Shape: ``novelty(d) = |shingles(d) \\ R| / |shingles(d)|`` over DISTINCT
``shingle_size``-grams, R = the reference corpus's distinct shingle
set. Tokenization is :func:`~.dedup.tokens_frame` — the SAME shingles
(short-doc whole-text rule included) as the MinHash/exact-join
pipelines, so a novelty threshold and a Jaccard threshold speak the
same vocabulary.

Scale: two map-side explodes + distincts, one token-keyed LEFT join of
the target's (id, shingle) frame against the reference shingle set,
one per-doc agg. Nothing all-pairs; the reference set moves once,
keyed by shingle (AQE broadcasts it when small). At 100 TB the
reference side is the big term — the Bloom prefilter pattern
(operators/bloom.py: fixed-size bitmap built corpus-side, broadcast,
probe map-side) drops the join for the ~all-novel majority; kept exact
here because the DISTINCT-shingle exchange is already the bounded
frame.

Cross-engine exactness: the score is an integer/integer division
(novel count / distinct-shingle count) rounded once — no float
accumulation anywhere.

Reference parity: criteo/ml-hadoop-experiment has no corpus-statistics
surface (SURVEY.md §2) — north-star extension for data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_frame


def ngram_novelty(
    target_df: DataFrame,
    reference_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """``(id, n_shingles, novelty)`` for every target document with at
    least one shingle: the fraction of its DISTINCT shingles absent
    from the reference corpus's distinct shingle set. 1.0 = entirely
    new content, 0.0 = every shingle already held. Ids may collide
    across the two inputs (sides are joined by shingle, never pooled
    by id)."""
    t = tokens_frame(target_df, id_col, text_col, shingle_size)
    ref = (
        tokens_frame(reference_df, id_col, text_col, shingle_size)
        .select("token")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    novel = F.sum(
        F.when(F.col("__seen").isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        t.join(ref, "token", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), round_digits
            ).alias("novelty"),
        )
    )


def _shingle_cte(relation: str, id_expr: str, text_expr: str, k: int) -> str:
    """DuckDB distinct (id, shingle) CTE body matching
    ``tokens_frame`` (word k-grams, short-doc whole-text rule, no
    lowercasing — novelty shares the dedup pipelines' tokenization,
    unlike the lowercased corpus-statistics family)."""
    grams = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return f"""
  SELECT DISTINCT id, sh AS token FROM (
    SELECT id,
           unnest(list_transform(
             range(1, greatest(len(t) - {k - 1}, 0) + 1),
             i -> {grams})) AS sh
    FROM (SELECT {id_expr} AS id,
                 regexp_split_to_array(trim({text_expr}), '\\s+') AS t
          FROM {relation})
    WHERE len(t) >= {k}
    UNION ALL
    SELECT id, array_to_string(t, ' ') AS sh
    FROM (SELECT {id_expr} AS id,
                 regexp_split_to_array(trim({text_expr}), '\\s+') AS t
          FROM {relation})
    WHERE len(t) < {k}
  )"""


def ngram_novelty_sql(
    target_relation: str,
    reference_relation: str,
    id_expr: str,
    text_expr: str,
    shingle_size: int = 3,
    round_digits: int = 6,
    out_id: str = "id",
) -> str:
    """DuckDB twin of :func:`ngram_novelty` (same tokenization, same
    integer ratio, same rounding)."""
    k = shingle_size
    return f"""
WITH toks AS (
{_shingle_cte(target_relation, id_expr, text_expr, k)}
),
ref AS (
  SELECT DISTINCT token FROM (
{_shingle_cte(reference_relation, id_expr, text_expr, k)}
  )
)
SELECT toks.id AS {out_id},
       count(*) AS n_shingles,
       round(CAST(sum(CASE WHEN ref.token IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), {round_digits}) AS novelty
FROM toks LEFT JOIN ref ON ref.token = toks.token
GROUP BY toks.id
"""
