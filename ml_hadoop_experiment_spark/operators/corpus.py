"""Corpus-statistics operators: TF-IDF term scoring.

Extension beyond the reference (it has no corpus-level text statistics;
its vocabulary op, tensorflow/vocabulary.py, counts raw values only).
TF-IDF is the workhorse for keyword extraction / relevance features in
training-data pipelines; here it is a pure relational composition so
Catalyst plans every stage:

  explode → per-(doc, token) count (tf) → per-token doc frequency (df)
  → broadcast scalar doc count → score → per-doc top-k window.

Every aggregation is map-side combined; the only broadcast is one row
(the corpus size). At 100 TB the tf frame is the big intermediate — it is
consumed twice (df aggregation + the scoring join), so callers with an
expensive upstream should persist it (``cache_tf=True``) exactly like the
MinHash pipeline's auto-persist; the default keeps toy-scale plans
stage-light.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    cache_tf: Optional[bool] = None,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, token, tfidf, rk).

    Smooth-idf formula (sklearn's default): ``tf * (ln((N+1)/(df+1)) + 1)``
    — never negative, never divides by zero. Whitespace tokenization after
    lowercasing; ties in score break on token text so the output is
    total-order deterministic. ``tfidf`` is rounded to 6 decimals for
    cross-engine comparison; the rank is computed on the unrounded score.

    ``cache_tf``: the tf frame is consumed twice (df aggregation + scoring
    join); the default ``None`` auto-persists it (MEMORY_AND_DISK) when
    Catalyst estimates the input above the MinHash pipeline's
    ``AUTO_PERSIST_BYTES`` threshold — same policy, same rationale: small
    inputs skip the materialization stage, 100 TB inputs tokenize once.
    As with ``minhash_dedup_pairs``, the persisted frame stays registered
    until the caller drops it (``spark.catalog.clearCache()`` or garbage
    collection of the returned plan): repeated invocations in one session
    (bench loops, notebooks) accumulate cached partitions until then, so
    loop callers should clear between iterations.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    if cache_tf is None:
        from ml_hadoop_experiment_spark.operators.dedup import (
            AUTO_PERSIST_BYTES,
            _estimated_input_bytes,
        )

        cache_tf = _estimated_input_bytes(df) > AUTO_PERSIST_BYTES
    if cache_tf:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)))
        + F.lit(1.0)
    )
    w = Window.partitionBy("id").orderBy(F.col("__score").desc(), F.col("token").asc())
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__score", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("id", "token", F.round(F.col("__score"), 6).alias("tfidf"), "rk")
    )


def tfidf_topk_sql(
    table: str, id_expr: str, text_expr: str, k: int = 3, out_id: str = "id"
) -> str:
    """DuckDB twin of ``tfidf_topk_terms`` (same formula, same tie order);
    ``out_id`` names the id column in the output."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS token
  FROM {table}
),
termfreq AS (SELECT id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df_t FROM termfreq GROUP BY 1),
n AS (SELECT count(DISTINCT {id_expr}) AS n_docs FROM {table})
SELECT id AS {out_id}, token, round(score, 6) AS tfidf, rk FROM (
  SELECT termfreq.id, termfreq.token,
         termfreq.tf * (ln((n.n_docs + 1.0) / (dfreq.df_t + 1.0)) + 1.0) AS score,
         row_number() OVER (
           PARTITION BY termfreq.id
           ORDER BY termfreq.tf * (ln((n.n_docs + 1.0) / (dfreq.df_t + 1.0)) + 1.0) DESC,
                    termfreq.token ASC
         ) AS rk
  FROM termfreq JOIN dfreq USING (token), n
) WHERE rk <= {k}
"""


def bm25_topk_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Sparck-Jones with Lucene's +1 idf smoothing) — the
    classic retrieval scorer, used in training-data pipelines to mine
    positives / hard negatives for a topic.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N−df+0.5)/(df+0.5))``.

    Plan (100 TB posture): tokenize map-side → one (doc, token) count
    shuffle; the query-term table broadcasts, so document frequencies and
    scoring touch ONLY rows whose token is in the query — the corpus text
    never shuffles and nothing query-independent leaves the tf stage
    except the per-doc length aggregate (map-combined). Per-term
    contributions are rounded to 6 dp and summed as DECIMAL so the
    per-doc score is independent of partition order (float addition is
    not associative; rounded-then-exact-sum is); the final top-k is a
    TakeOrderedAndProject with an id tiebreak.

    Output: ``id, bm25, n_hit_terms`` — the k best documents.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    if isinstance(query_terms, DataFrame):
        # a one-string-column frame (e.g. the distinct tokens of a seed
        # document) — stays distributed, no driver collect
        qterms = query_terms.select(
            F.col(query_terms.columns[0]).alias("token")
        ).distinct()
    elif query_terms:
        qterms = spark.createDataFrame(
            [(t,) for t in sorted(set(query_terms))], "token string"
        )
    else:
        raise ValueError("query_terms must be a non-empty list or a DataFrame")
    tf_q = tf.join(F.broadcast(qterms), "token")
    dfreq = tf_q.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tf_norm, 6).cast("decimal(28,6)")
    scored = (
        tf_q.join(dfreq, "token")
        .join(dl, "id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("id")
        .agg(
            F.sum(contrib).cast("double").alias("bm25"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("id").asc()).limit(k)


def bm25_topk_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    query_terms,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    out_id: str = "id",
) -> str:
    """DuckDB twin of ``bm25_topk_docs``: same formula, same 6-dp
    round-before-exact-sum, same id tiebreak. ``query_terms`` is a list
    of literal terms OR a SQL fragment selecting a one-column ``token``
    relation (the distributed-seed form the declared query uses)."""
    if isinstance(query_terms, str):
        qterms_cte = f"qterms AS ({query_terms})"
    else:
        terms = ", ".join(
            "('" + t.replace("'", "''") + "')" for t in sorted(set(query_terms))
        )
        qterms_cte = f"qterms(token) AS (VALUES {terms})"
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id,
         unnest(regexp_split_to_array(lower(trim({text_expr})), '\\s+')) AS token
  FROM {table}
),
termfreq AS (SELECT id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM termfreq GROUP BY 1),
corpus AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
{qterms_cte},
tfq AS (SELECT termfreq.* FROM termfreq JOIN qterms USING (token)),
dfreq AS (SELECT token, count(*) AS df_t FROM tfq GROUP BY 1)
SELECT id AS {out_id},
       CAST(sum(CAST(round(
         ln(1.0 + (corpus.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5))
         * (tfq.tf * {k1 + 1.0!r})
           / (tfq.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / corpus.avgdl)),
         6) AS DECIMAL(28,6))) AS DOUBLE) AS bm25,
       count(*) AS n_hit_terms
FROM tfq JOIN dfreq USING (token) JOIN dl USING (id), corpus
GROUP BY id
ORDER BY bm25 DESC, id ASC
LIMIT {k}
"""


def rare_token_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_count: int = 2,
    out_col: str = "rare_ratio",
) -> DataFrame:
    """Per-document fraction of tokens whose CORPUS frequency is at most
    ``max_count`` — the exact-arithmetic cousin of perplexity filtering:
    gibberish, OCR noise, and boilerplate-with-IDs score high because
    they are built from tokens the rest of the corpus never repeats.
    (A log-space unigram cross-entropy would hit cross-engine float-sum
    divergence; the rare-token ratio keeps the same discriminative
    signal in integers and one final correctly-rounded division.)

    Plan: explode tokens once; corpus token counts are a map-combined
    agg on the exploded stream (shuffle carries distinct tokens, not
    text); the count table joins back to the exploded stream keyed on
    token (AQE broadcasts it when small, skew-join handles the head
    tokens otherwise) and a per-doc agg produces the ratio. The raw
    document text is never shuffled.

    Determinism: counts and per-doc tallies are exact integers; the
    ratio is ONE double division of exact integers — bit-identical in
    any engine, any partitioning.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__tok"),
    )
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    joined = toks.join(counts, on="__tok")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("__cnt") <= F.lit(int(max_count)), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_rare"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
            out_col
        ),
    )


def rare_token_ratio_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    max_count: int = 2,
    out_col: str = "rare_ratio",
) -> str:
    """DuckDB twin of ``rare_token_ratio``."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id, unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+')) AS tok
  FROM {relation}
),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1)
SELECT t.id AS {id_expr},
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN c.c <= {int(max_count)} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(sum(CASE WHEN c.c <= {int(max_count)} THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS {out_col}
FROM toks t JOIN cnt c ON t.tok = c.tok
GROUP BY 1
"""


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    top_k: int = 200,
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies — the statistic one
    BPE/WordPiece tokenizer-training iteration is built on (count every
    adjacent character pair inside every word, weighted by how often
    the word occurs; the most frequent pair is the next merge).

    Plan exploits the classic trainer optimization — aggregate over
    DISTINCT words, not word occurrences: the corpus stream collapses
    to a (word, count) table first (map-combined; the shuffle carries
    distinct words, never text), and the character-bigram explode +
    weighted sum then run over vocabulary-sized data. At 100 TB the
    distinct-word table is millions of rows where the raw token stream
    is trillions — the pair aggregation's cost is corpus-size-
    independent after the first shuffle. Top-k orders by
    (count desc, pair asc) — a total order, so the k-th row is engine-
    deterministic — via TakeOrderedAndProject (no global sort).

    Output: (pair string2, pair_count long), the ``top_k`` most
    frequent. Words shorter than 2 characters contribute nothing
    (nothing to merge). Pure codegen expressions end to end — no
    Python in the pipeline.
    """
    words = df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__w")
    ).where(F.length("__w") >= 2)
    wc = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    pairs = wc.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"
            )
        ).alias("pair"),
        F.col("__c"),
    )
    out = (
        pairs.groupBy("pair")
        .agg(F.sum("__c").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(int(top_k))
    )
    return out


def bpe_pair_counts_sql(relation: str, text_expr: str, top_k: int = 200) -> str:
    """DuckDB twin of ``bpe_pair_counts`` (same tie-break total order)."""
    return f"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+')) AS w
  FROM {relation}
),
wc AS (
  SELECT w, count(*) AS c FROM words WHERE len(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT unnest(list_transform(
           range(1, len(w)), i -> substring(w, i, 2))) AS pair,
         c
  FROM wc
)
SELECT pair, CAST(sum(c) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT {int(top_k)}
"""


def unigram_xent(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document unigram cross-entropy under the corpus's own token
    distribution: ``(id, n_tokens, xent)`` with
    ``xent = -avg_t ln(count(t) / T)`` over the doc's token instances
    (T = total corpus token instances). The log-space cousin of
    :func:`rare_token_ratio` — CCNet-style LM quality filtering:
    boilerplate scores low, gibberish/OCR noise scores high.

    An earlier round rejected this operator as cross-engine-unverifiable
    ("log-space hits float-sum divergence" — rare_token_ratio's
    docstring). The round-then-decimal-sum contract retires that: each
    DISTINCT (doc, token)'s ``ln(c/T)`` is rounded to ``round_digits``
    and multiplied by its integer term frequency in ``decimal(28,6)``,
    so the per-doc sum is exact and addition-order independent; the
    only float steps left are one ln on identical IEEE inputs and one
    final correctly-rounded division — the same parity the green
    TF-IDF/BM25 scores already rely on.

    Plan: explode tokens once; corpus counts are a map-combined agg on
    the exploded stream; tf is a per-(doc, token) agg; the count table
    joins back keyed on token (AQE broadcasts when small) and one
    per-doc agg finishes. Raw text never shuffles. The corpus includes
    the scored doc itself — the usual corpus-level-filter convention.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "__tok"
        ),
    )
    tf = toks.groupBy("id", "__tok").agg(F.count(F.lit(1)).alias("__tf"))
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    contrib = F.round(
        F.log(F.col("__cnt").cast("double") / F.col("__total")), round_digits
    ).cast("decimal(28,6)") * F.col("__tf").cast("decimal(28,6)")
    per_doc = (
        tf.join(counts, on="__tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("__tf").alias("n_tokens"),
            F.sum(contrib).alias("__lp"),
        )
    )
    return per_doc.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            -(F.col("__lp").cast("double")) / F.col("n_tokens"), round_digits
        ).alias("xent"),
    )


def unigram_xent_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    round_digits: int = 6,
    out_id: str = "id",
) -> str:
    """DuckDB twin of :func:`unigram_xent` (same rounding points, same
    decimal summation, same final division)."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id,
         unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+')) AS tok
  FROM {relation}
),
tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT count(*) AS t FROM toks)
SELECT tf.id AS {out_id},
       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       round(-CAST(sum(
           CAST(round(ln(CAST(cnt.c AS DOUBLE) / tot.t), {round_digits})
                AS DECIMAL(28,6))
           * CAST(tf.tf AS DECIMAL(28,6))
         ) AS DOUBLE) / sum(tf.tf), {round_digits}) AS xent
FROM tf JOIN cnt ON tf.tok = cnt.tok, tot
GROUP BY tf.id
"""


def pmi_bigrams(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    ``(w1, w2, n_pair, pmi)`` with
    ``pmi = ln(p(w1,w2) / (p(w1)*p(w2)))``, p over the corpus's bigram
    and unigram instance distributions respectively. The standard
    collocation detector (Church & Hanks 1990): multi-word entities and
    idioms score high, chance co-occurrences of frequent words score
    ~0/negative — a tokenizer-vocab and corpus-QA primitive.

    Cross-engine determinism: the PMI argument is assembled from the
    four integer counts in one fixed expression shape —
    ``(cast(c_xy) * t_u * t_u) / (cast(t_b) * c_x * c_y)`` — so both
    engines execute the identical sequence of IEEE double ops on
    identical integers; one ln + one round ends it. ``min_count``
    (standard PMI practice — PMI of a hapax pair is pure noise) doubles
    as the scale guard: it filters the bigram tally BEFORE the unigram
    joins, so the joined frame is the collocation candidates, not the
    corpus. Ordering ``(pmi DESC, w1, w2)`` is total, making LIMIT
    deterministic (TakeOrderedAndProject — no global sort materializes).

    Plan: one explode for unigrams, one zip-slice explode for bigrams
    (both map-side from the same scan; raw text never shuffles), three
    map-combined aggs, two keyed joins on the filtered tally, broadcast
    scalar totals.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(toks.alias("__t"))
    uni = base.select(F.explode("__t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    utot = uni.agg(F.count(F.lit(1)).alias("__tu"))
    n = F.size("__t")
    m = n - F.lit(1)
    pairs = F.arrays_zip(F.slice("__t", 1, m), F.slice("__t", 2, m))
    big = (
        base.where(n >= 2)
        .select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.0").alias("w1"), F.col("__p.1").alias("w2"))
    )
    btot = big.agg(F.count(F.lit(1)).alias("__tb"))
    bcnt = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__cxy"))
        .where(F.col("__cxy") >= min_count)
    )
    ratio = (
        F.col("__cxy").cast("double") * F.col("__tu") * F.col("__tu")
    ) / (F.col("__tb").cast("double") * F.col("__cx") * F.col("__cy"))
    return (
        bcnt.join(
            ucnt.select(F.col("w").alias("w1"), F.col("__c").alias("__cx")),
            "w1",
        )
        .join(
            ucnt.select(F.col("w").alias("w2"), F.col("__c").alias("__cy")),
            "w2",
        )
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.col("__cxy").cast("long").alias("n_pair"),
            F.round(F.log(ratio), round_digits).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def pmi_bigrams_sql(
    relation: str,
    text_expr: str,
    min_count: int = 5,
    top_k: int = 100,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`pmi_bigrams`: identical tokenization,
    identical count-ratio expression shape, same total ordering."""
    return f"""
WITH base AS (
  SELECT regexp_split_to_array(trim(lower({text_expr})), '\\s+') AS t
  FROM {relation}
),
uni AS (SELECT unnest(t) AS w FROM base),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
utot AS (SELECT count(*) AS tu FROM uni),
big AS (
  SELECT unnest(list_transform(
           range(1, len(t)),
           i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
  FROM base WHERE len(t) >= 2
),
bpairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM big),
btot AS (SELECT count(*) AS tb FROM bpairs),
bcnt AS (
  SELECT w1, w2, count(*) AS cxy FROM bpairs GROUP BY w1, w2
  HAVING count(*) >= {min_count}
)
SELECT b.w1, b.w2, CAST(b.cxy AS BIGINT) AS n_pair,
       round(ln((CAST(b.cxy AS DOUBLE) * utot.tu * utot.tu)
                / (CAST(btot.tb AS DOUBLE) * cx.c * cy.c)),
             {round_digits}) AS pmi
FROM bcnt b
JOIN ucnt cx ON cx.w = b.w1
JOIN ucnt cy ON cy.w = b.w2, utot, btot
ORDER BY pmi DESC, b.w1, b.w2
LIMIT {top_k}
"""


def bigram_xent(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.8,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under an interpolated corpus bigram
    LM: ``(id, n_bigrams, xent)`` with
    ``xent = -avg ln(lam * c(w1,w2)/c1(w1) + (1-lam) * cu(w2)/T)``
    over the doc's bigram instances — the stronger CCNet-style quality
    scorer (:func:`unigram_xent` cannot see scrambled word order;
    this one scores it high-entropy). ``c1`` counts w1 as a bigram
    LEFT context (so the conditional sums to 1 over the vocab) and the
    unigram interpolation term handles unseen continuations without
    add-k vocabulary-size coupling.

    Cross-engine exactness: same round-then-decimal-sum contract as
    :func:`unigram_xent` — each DISTINCT (doc, bigram)'s ln(p) is
    rounded then multiplied by its integer term frequency in
    decimal(28,6); p itself is one fixed-shape double expression over
    four integer counts, so both engines execute identical IEEE ops.

    Plan: one zip-slice bigram explode (map-side), two map-combined
    count aggs over the exploded streams (bigram vocab, unigram vocab)
    plus a per-doc tf agg. The LM itself is assembled entirely on the
    BIGRAM-VOCAB frame: left-context counts come from re-aggregating
    the bigram tally (``c1(w1) = sum_w2 cb(w1,w2)`` — exact, and saves
    a third shuffle of the instance stream), the unigram join and the
    broadcast total attach there too, and ln(p) is rounded into its
    decimal contribution per distinct bigram BEFORE any doc-sized frame
    appears. The per-doc tf frame — the only corpus-sized shuffle input
    — then joins ONCE on (w1, w2) (AQE broadcasts the enriched vocab
    when it is small) and one per-doc agg finishes; the round-8 shape
    re-shuffled tf three times on three different keys. Raw text never
    shuffles; docs with <2 tokens drop (no bigrams — callers route them
    to the unigram scorer).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__t"))
    n = F.size("__t")
    m = n - F.lit(1)
    pairs = F.arrays_zip(F.slice("__t", 1, m), F.slice("__t", 2, m))
    big = (
        base.where(n >= 2)
        .select("id", F.explode(pairs).alias("__p"))
        .select(
            "id", F.col("__p.0").alias("w1"), F.col("__p.1").alias("w2")
        )
    )
    uni = base.select(F.explode("__t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("__cu"))
    utot = uni.agg(F.count(F.lit(1)).alias("__T"))
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cb"))
    lcnt = bcnt.groupBy("w1").agg(F.sum("__cb").alias("__c1"))
    tf = big.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("__tf"))
    p = (
        F.lit(float(lam))
        * (F.col("__cb").cast("double") / F.col("__c1"))
        + F.lit(1.0 - float(lam))
        * (F.col("__cu").cast("double") / F.col("__T"))
    )
    lm = (
        bcnt.join(lcnt, "w1")
        .join(ucnt.select(F.col("w").alias("w2"), "__cu"), "w2")
        .crossJoin(F.broadcast(utot))
        .select(
            "w1",
            "w2",
            F.round(F.log(p), round_digits)
            .cast("decimal(28,6)")
            .alias("__lnp"),
        )
    )
    per_doc = (
        tf.join(lm, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("__tf").alias("n_bigrams"),
            F.sum(
                F.col("__lnp") * F.col("__tf").cast("decimal(28,6)")
            ).alias("__lp"),
        )
    )
    return per_doc.select(
        "id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(
            -(F.col("__lp").cast("double")) / F.col("n_bigrams"),
            round_digits,
        ).alias("xent"),
    )


def bigram_xent_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    lam: float = 0.8,
    round_digits: int = 6,
    out_id: str = "id",
) -> str:
    """DuckDB twin of :func:`bigram_xent` (same counts, same fixed
    interpolation expression, same decimal summation)."""
    return f"""
WITH base AS (
  SELECT {id_expr} AS id,
         regexp_split_to_array(trim(lower({text_expr})), '\\s+') AS t
  FROM {relation}
),
uni AS (SELECT unnest(t) AS w FROM base),
ucnt AS (SELECT w, count(*) AS cu FROM uni GROUP BY w),
utot AS (SELECT count(*) AS T FROM uni),
big AS (
  SELECT id, p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT id, unnest(list_transform(
             range(1, len(t)),
             i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
    FROM base WHERE len(t) >= 2
  )
),
bcnt AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
lcnt AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
tf AS (SELECT id, w1, w2, count(*) AS tf FROM big GROUP BY id, w1, w2)
SELECT tf.id AS {out_id},
       CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
       round(-CAST(sum(
           CAST(round(ln({float(lam)!r} * (CAST(bcnt.cb AS DOUBLE) / lcnt.c1)
                         + {1.0 - float(lam)!r} * (CAST(ucnt.cu AS DOUBLE) / utot.T)),
                      {round_digits}) AS DECIMAL(28,6))
           * CAST(tf.tf AS DECIMAL(28,6))
         ) AS DOUBLE) / sum(tf.tf), {round_digits}) AS xent
FROM tf
JOIN bcnt ON bcnt.w1 = tf.w1 AND bcnt.w2 = tf.w2
JOIN lcnt ON lcnt.w1 = tf.w1
JOIN ucnt ON ucnt.w = tf.w2, utot
GROUP BY tf.id
"""


def oov_rate(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer vocabulary-coverage audit: one row
    ``(vocab_size, n_vocab, n_instances, n_oov, oov_rate)`` — the
    fraction of token INSTANCES not covered by the top-``vocab_size``
    tokens (by corpus frequency, ties broken by token text). The
    go/no-go check before freezing a vocabulary (A1's
    ``vocabulary_dataframe`` builds it, ``tokens_to_ids`` applies it):
    the OOV rate is what the vocab size buys, and a corpus change shows
    up here before it shows up as UNK-flooded training data.

    Determinism: the vocabulary is a total order (count DESC, token
    ASC), coverage is pure integer arithmetic, and the single float is
    the final rate division + round. ``n_vocab = min(vocab_size,
    distinct tokens)`` rides along so an undersized corpus is visible
    rather than silently reading as 0.0 OOV.

    Plan: one explode + map-combined token counts; the rank window
    runs on the COUNTS frame — vocabulary-sized by construction, the
    same bounded-frame argument as ``vocabulary_dataframe`` — and one
    single-row combine ends it. The corpus-sized stream never shuffles
    anything but (token, partial count) pairs. Same lowercased
    whitespace tokenization as the rest of the corpus-statistics
    family (unigram_xent, bpe_pairs).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "__tok"
        )
    )
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    ranked = counts.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.desc("__c"), F.asc("__tok"))
        ),
    )
    in_vocab = F.col("__rk") <= vocab_size
    return ranked.agg(
        F.lit(vocab_size).cast("long").alias("vocab_size"),
        F.sum(in_vocab.cast("long")).alias("n_vocab"),
        F.sum("__c").alias("n_instances"),
        F.sum(F.when(~in_vocab, F.col("__c")).otherwise(F.lit(0))).alias(
            "n_oov"
        ),
        F.round(
            F.sum(
                F.when(~in_vocab, F.col("__c")).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("__c"),
            round_digits,
        ).alias("oov_rate"),
    )


def oov_rate_sql(
    relation: str,
    text_expr: str,
    vocab_size: int,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`oov_rate` (same tokenization, same total
    vocabulary order, same integer coverage arithmetic and final
    round)."""
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+')) AS tok
  FROM {relation}
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rk FROM counts
)
SELECT CAST({vocab_size} AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN rk <= {vocab_size} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_vocab,
       CAST(sum(c) AS BIGINT) AS n_instances,
       CAST(sum(CASE WHEN rk > {vocab_size} THEN c ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(CAST(sum(CASE WHEN rk > {vocab_size} THEN c ELSE 0 END)
                  AS DOUBLE) / sum(c), {round_digits}) AS oov_rate
FROM ranked
"""
