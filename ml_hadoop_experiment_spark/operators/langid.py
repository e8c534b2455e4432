"""Trained character-n-gram language identification.

The classic Cavnar-Trenkle (1994, "N-Gram-Based Text Categorization")
recipe, re-expressed as two DataFrame stages with integer-exact
scoring — the language-ID screen every multilingual data-mix pipeline
runs before routing documents to per-language dedup / quality stages.
This is the TRAINED complement of ``functions/text.lang_id`` (the
zero-setup fixed-stopword heuristic): that one needs no labels and
covers only its built-in stopword lists; this one learns its profiles
from any labeled corpus (new languages, domain-specific registers,
even non-language routing labels) at the cost of a training pass:

1. **Train** (:func:`train_language_profiles`): from a LABELED corpus,
   count character trigrams of ``lower(text)`` per language, rank them
   per language (count desc, trigram asc — a total order, so ranking
   is deterministic), keep the top ``profile_size``, and weight each
   kept trigram ``profile_size - rank + 1`` (most frequent = heaviest).
   The profile frame is tiny: ``n_languages x profile_size`` rows.
2. **Score** (:func:`language_id`): explode each document's trigrams
   (with multiplicity), broadcast-join the profile, sum weights per
   (doc, language), and pick the argmax language — ties broken by the
   lexicographically smallest language code, documents with zero
   profile hits labeled ``unknown``. The score is a sum of integers:
   cross-engine exactness by construction, no float anywhere.

Rank-weight scoring replaces Cavnar-Trenkle's out-of-place distance
(which needs a per-DOCUMENT rank — a per-doc window over the token
stream) with the per-PROFILE rank only; the per-doc side stays a plain
partial-aggregated sum, the shape that scales.

Scale: training shuffles the (lang, trigram) count frame — bounded by
the distinct-trigram vocabulary, not the corpus — and windows within
each language over that bounded frame. Scoring is a map-side explode,
a broadcast join against the ``n_languages x profile_size`` profile,
one (id, lang) partial-aggregated sum, and one per-id min(struct)
combine; the only frames that move are vocabulary-sized or
``n_docs x n_languages``-sized. At 100 TB nothing here is all-pairs
and no driver collect exists in either stage.

Reference parity: criteo/ml-hadoop-experiment has no text-analysis
surface (SURVEY.md §2) — north-star extension for data curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_trigrams(col: Column) -> Column:
    """``array<string>`` of the character trigrams of ``lower(col)``,
    one per position (multiplicity preserved); empty for NULL or
    shorter-than-3 text. ``sequence(1, len-2)`` is guarded by the
    length test because Spark's ``sequence(1, 0)`` DESCENDS ([1, 0])
    instead of returning an empty array."""
    s = F.lower(col)
    return F.when(
        F.length(s) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - 2),
            lambda i: s.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _trigram_rows(df: DataFrame, keep: list[str], text_col: str) -> DataFrame:
    """(keep..., tri) — one row per trigram OCCURRENCE."""
    return df.select(
        *keep, F.explode(char_trigrams(F.col(text_col))).alias("tri")
    )


def train_language_profiles(
    df: DataFrame,
    lang_col: str,
    text_col: str,
    profile_size: int = 200,
) -> DataFrame:
    """``(lang, tri, weight)`` language profiles from a labeled corpus:
    per language the ``profile_size`` most frequent character trigrams,
    weighted ``profile_size - rank + 1`` (rank 1 = most frequent =
    weight ``profile_size``). Ties in frequency are broken by trigram
    ascending, so the profile is a pure function of the corpus."""
    counts = (
        _trigram_rows(df, [lang_col], text_col)
        .groupBy(F.col(lang_col).alias("lang"), "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("tri").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= profile_size)
        .select(
            "lang",
            "tri",
            (F.lit(profile_size) - F.col("rnk") + 1)
            .cast("long")
            .alias("weight"),
        )
    )


def language_id(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: DataFrame,
    unknown: str = "und",
) -> DataFrame:
    """``(id, lang_pred, score)`` for EVERY row of ``df``: the language
    whose profile trigrams cover the document with the highest total
    weight (each trigram occurrence contributes that language's weight
    for it). Ties -> lexicographically smallest language code;
    documents with zero profile hits (NULL/short text, or fully
    out-of-profile content) -> ``unknown`` with score 0."""
    tris = _trigram_rows(df, [id_col], text_col)
    scores = (
        tris.join(F.broadcast(profiles), "tri")
        .groupBy(id_col, "lang")
        .agg(F.sum("weight").alias("score"))
    )
    # argmax via min(struct(-score, lang)): largest score, then
    # smallest language code — one combine, no second window shuffle
    best = scores.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("lang"))).alias(
            "b"
        )
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("b.lang"), F.lit(unknown)).alias("lang_pred"),
            F.coalesce(-F.col("b.ns"), F.lit(0)).cast("long").alias("score"),
        )
    )


def _trigram_cte(relation: str, key_expr: str, text_expr: str) -> str:
    """DuckDB (key, tri) occurrence rows matching
    :func:`char_trigrams` (lower, 1-based substring, multiplicity)."""
    return f"""
  SELECT key, unnest(list_transform(
           range(1, greatest(length(s) - 2, 0) + 1),
           i -> substring(s, i, 3))) AS tri
  FROM (SELECT {key_expr} AS key, lower({text_expr}) AS s
        FROM {relation})
  WHERE length(s) >= 3"""


def language_id_sql(
    train_relation: str,
    score_relation: str,
    id_col: str,
    lang_col: str,
    text_expr: str,
    profile_size: int = 200,
    unknown: str = "und",
    out_id: str = "doc_id",
) -> str:
    """DuckDB twin of ``train_language_profiles`` + :func:`language_id`
    run resubstitution-style: train on ``train_relation``'s labels,
    score ``score_relation``, attach the true label. Same trigrams,
    same rank tie-break, same integer weights, same argmax order.

    ``id_col`` / ``lang_col`` must be BARE column names (they are
    interpolated qualified as ``d.{id_col}`` in the final SELECT/JOIN,
    where an arbitrary expression would generate invalid SQL — the
    ``_col`` naming declares that contract); ``text_expr`` may be any
    scalar expression (used only inside the trigram CTE's subquery)."""
    k = profile_size
    unknown = unknown.replace("'", "''")  # SQL string-literal escape
    return f"""
WITH tri_train AS ({_trigram_cte(train_relation, lang_col, text_expr)}
),
counts AS (
  SELECT key AS lang, tri, count(*) AS cnt FROM tri_train GROUP BY 1, 2
),
profile AS (
  SELECT lang, tri, CAST({k} - rnk + 1 AS BIGINT) AS weight FROM (
    SELECT lang, tri,
           row_number() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, tri ASC) AS rnk
    FROM counts)
  WHERE rnk <= {k}
),
tri_score AS ({_trigram_cte(score_relation, id_col, text_expr)}
),
scores AS (
  SELECT t.key AS id, p.lang, sum(p.weight) AS score
  FROM tri_score t JOIN profile p USING (tri)
  GROUP BY 1, 2
),
best AS (
  SELECT id, lang, score FROM (
    SELECT id, lang, score,
           row_number() OVER (PARTITION BY id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM scores)
  WHERE rn = 1
)
SELECT d.{id_col} AS {out_id},
       d.{lang_col} AS lang_true,
       coalesce(b.lang, '{unknown}') AS lang_pred,
       CAST(coalesce(b.score, 0) AS BIGINT) AS score
FROM {score_relation} d
LEFT JOIN best b ON b.id = d.{id_col}
"""
