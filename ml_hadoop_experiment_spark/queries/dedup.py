"""Deduplication, similarity-join, and decontamination queries.

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
from ml_hadoop_experiment_spark.queries._shared import _t  # noqa: E501
from ml_hadoop_experiment_spark.queries.ann import _PAIR_DOT_NORMED, _ROW_NORM  # noqa: E501




def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of lineitem on the orderkey digest: one surviving row
    (lowest linenumber) per key — the content-hash window pattern."""
    li = _t(spark, sf_dir, "lineitem")
    out = dedup_exact(li, ["l_orderkey"], "l_linenumber")
    return out.select("l_orderkey", "l_linenumber")


SQL_DEDUP_EXACT = """
SELECT l_orderkey, l_linenumber FROM (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (
           PARTITION BY md5(CAST(l_orderkey AS VARCHAR))
           ORDER BY l_linenumber
         ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def _url_fixture(d):
    """Synthetic crawl-URL column (pure codegen, replayed verbatim by
    the oracle — construction is shared by design, the two
    CANONICALIZERS are not): groups of 3 docs share one canonical URL
    behind different cosmetic junk. Variant 0 differs only in host
    case; variant 1 piles on uppercase scheme, ``www.``, the default
    port, a trailing slash, an utm param, shuffled param order, and a
    fragment; variant 2 injects a per-doc gclid click id. Every 17th
    doc is a non-URL line instead (the passthrough tier)."""
    g = (d / 3).cast("long")
    gs = g.cast("string")
    hs = (g % 5).cast("string")
    v0 = F.concat(
        F.lit("http://Example"), hs, F.lit(".COM/item/"), gs,
        F.lit("?a=1&b=2"),
    )
    v1 = F.concat(
        F.lit("HTTP://WWW.example"), hs, F.lit(".com:80/item/"), gs,
        F.lit("/?b=2&utm_source=feed&a=1#frag"),
    )
    v2 = F.concat(
        F.lit("http://example"), hs, F.lit(".com/item/"), gs,
        F.lit("?gclid=g"), d.cast("string"), F.lit("&a=1&b=2"),
    )
    return (
        F.when(d % 17 == 5, F.concat(F.lit("doc "), d.cast("string"),
                                     F.lit(" has no scheme")))
        .when(d % 3 == 0, v0)
        .when(d % 3 == 1, v1)
        .otherwise(v2)
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (operators/urldedup.dedup_by_url) — the crawl
    pipeline's standard first pass: canonicalize the synthesized crawl
    URLs (functions/url.canonicalize_url: case, www., default port,
    fragment, tracking params, param order, trailing slash) and keep
    the lowest doc_id per canonical URL via the dedup_exact digest
    window. The oracle rebuilds the SAME fixture URLs and replays the
    frozen canonicalization spec in DuckDB string/list functions — the
    gate passes only if the two independent canonicalizers agree
    bit-for-bit on every URL."""
    from ml_hadoop_experiment_spark.operators.urldedup import (
        dedup_by_url,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _url_fixture(F.col("doc_id")).alias("url")
    )
    return dedup_by_url(docs, "doc_id", "url").select(
        "doc_id", "canonical_url"
    )


def _sql_url_dedup() -> str:
    from ml_hadoop_experiment_spark.functions.url import (
        canonicalize_url_sql,
    )

    fixture = """
CASE WHEN doc_id % 17 = 5
     THEN 'doc ' || CAST(doc_id AS VARCHAR) || ' has no scheme'
     WHEN doc_id % 3 = 0
     THEN 'http://Example' || CAST((doc_id // 3) % 5 AS VARCHAR)
          || '.COM/item/' || CAST(doc_id // 3 AS VARCHAR) || '?a=1&b=2'
     WHEN doc_id % 3 = 1
     THEN 'HTTP://WWW.example' || CAST((doc_id // 3) % 5 AS VARCHAR)
          || '.com:80/item/' || CAST(doc_id // 3 AS VARCHAR)
          || '/?b=2&utm_source=feed&a=1#frag'
     ELSE 'http://example' || CAST((doc_id // 3) % 5 AS VARCHAR)
          || '.com/item/' || CAST(doc_id // 3 AS VARCHAR)
          || '?gclid=g' || CAST(doc_id AS VARCHAR) || '&a=1&b=2'
END"""
    return f"""
WITH urls AS (
  SELECT doc_id, {fixture} AS url FROM documents
),
canon AS (
  SELECT doc_id, {canonicalize_url_sql("url")} AS canonical_url
  FROM urls
)
SELECT doc_id, canonical_url FROM (
  SELECT doc_id, canonical_url,
         row_number() OVER (
           PARTITION BY md5(coalesce(canonical_url, chr(0) || 'null'))
           ORDER BY doc_id
         ) AS rn
  FROM canon
) WHERE rn = 1
"""


SQL_URL_DEDUP = _sql_url_dedup()


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = tokens_frame(docs, "doc_id", "text", shingle_size=1)
    return minhash_signatures(toks, num_hashes=4).withColumnRenamed("id", "doc_id")


def _minhash_sql_aggs(k: int, h_expr: str = "h") -> str:
    from ml_hadoop_experiment_spark.functions.hashing import (
        minhash_permutation_params,
        minhash_permute_sql,
    )

    return ",\n       ".join(
        f"min({minhash_permute_sql(h_expr, a, b)}) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_permutation_params(k))
    )


SQL_MINHASH_SIGNATURES = f"""
SELECT doc_id,
       {_minhash_sql_aggs(4)}
FROM (
  SELECT doc_id, CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) AS h
  FROM (
    SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents
  )
)
GROUP BY doc_id
"""


def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: 3-shingles, 8 hashes, 4x2 bands,
    Jaccard >= 0.3 verification. The default LSH bucket cap (1024 ids) is
    active — the scale guard against O(width²) degenerate buckets — and
    the oracle mirrors it with the same QUALIFY window filter."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_size=3, num_hashes=8, bands=4,
        rows_per_band=2, threshold=0.3,
    )


SQL_NEAR_DUP_PAIRS = f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
toks AS (
  SELECT DISTINCT doc_id AS id, sh AS token FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
    FROM base
    WHERE len(t) >= 3
    UNION ALL
    -- short docs emit the whole normalized text as one shingle
    SELECT doc_id, array_to_string(t, ' ') AS sh
    FROM base
    WHERE len(t) < 3
  )
),
sigs AS (
  SELECT id, {_minhash_sql_aggs(8)}
  FROM (SELECT id, CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) AS h
        FROM toks)
  GROUP BY id
),
bandframe AS (
  SELECT band, band_key, id FROM (
    SELECT 0 AS band, mh_0 || '|' || mh_1 AS band_key, id FROM sigs
    UNION ALL SELECT 1, mh_2 || '|' || mh_3, id FROM sigs
    UNION ALL SELECT 2, mh_4 || '|' || mh_5, id FROM sigs
    UNION ALL SELECT 3, mh_6 || '|' || mh_7, id FROM sigs
  )
  -- mirror of the operator's default max_bucket_ids=1024 width cap
  QUALIFY count(*) OVER (PARTITION BY band, band_key) <= 1024
),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bandframe a JOIN bandframe b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n_tokens FROM toks GROUP BY id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cands c
  JOIN toks ta ON ta.id = c.id_a
  JOIN toks tb ON tb.id = c.id_b AND tb.token = ta.token
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.n_inter AS DOUBLE) / (sa.n_tokens + sb.n_tokens - i.n_inter), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE round(CAST(i.n_inter AS DOUBLE) / (sa.n_tokens + sb.n_tokens - i.n_inter), 6)
      >= 0.3
"""


def q_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment detection: same MinHash-LSH candidate pipeline as
    near_dup_pairs, verified with the OVERLAP COEFFICIENT
    |A∩B|/min(|A|,|B|) >= 0.5 (jaccard rides along) — catches the
    short-doc-quoted-inside-long-doc asymmetric duplication symmetric
    Jaccard under-scores. Recall caveat (LSH recalls by Jaccard)
    documented on operators/dedup.overlap_pairs."""
    from ml_hadoop_experiment_spark.operators.dedup import minhash_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_overlap_pairs(
        docs, "doc_id", "text", shingle_size=3, num_hashes=8, bands=4,
        rows_per_band=2, threshold=0.5,
    )


# same CTE chain as SQL_NEAR_DUP_PAIRS; only the verifier differs
SQL_OVERLAP_PAIRS = SQL_NEAR_DUP_PAIRS.rsplit("SELECT i.id_a", 1)[0] + """
SELECT i.id_a, i.id_b,
       round(CAST(i.n_inter AS DOUBLE) / least(sa.n_tokens, sb.n_tokens), 6)
         AS overlap,
       round(CAST(i.n_inter AS DOUBLE) / (sa.n_tokens + sb.n_tokens - i.n_inter), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE round(CAST(i.n_inter AS DOUBLE) / least(sa.n_tokens, sb.n_tokens), 6)
      >= 0.5
"""


def q_near_dup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: the "new batch" (doc_id % 10 == 0) filtered
    against the existing corpus (the other 90%) by MinHash-LSH band join
    — new-vs-corpus only, the corpus is never self-paired, so the cost
    scales with the batch. Same 3-shingle / 8-hash / 4x2-band / exact-
    Jaccard-verify construction as near_dup_pairs, corpus-side bucket
    cap active."""
    from ml_hadoop_experiment_spark.operators.dedup import near_dup_against

    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return near_dup_against(
        new, corpus, "doc_id", "text", shingle_size=3, num_hashes=8,
        bands=4, rows_per_band=2, threshold=0.3,
    )


SQL_NEAR_DUP_INCR = f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
toks AS (
  SELECT DISTINCT doc_id AS id, sh AS token FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
    FROM base
    WHERE len(t) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(t, ' ') AS sh
    FROM base
    WHERE len(t) < 3
  )
),
toks_new AS (SELECT * FROM toks WHERE id % 10 = 0),
toks_corp AS (SELECT * FROM toks WHERE id % 10 != 0),
sigs_new AS (
  SELECT id, {_minhash_sql_aggs(8)}
  FROM (SELECT id, CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) AS h
        FROM toks_new)
  GROUP BY id
),
sigs_corp AS (
  SELECT id, {_minhash_sql_aggs(8)}
  FROM (SELECT id, CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) AS h
        FROM toks_corp)
  GROUP BY id
),
bands_new AS (
  SELECT band, band_key, id FROM (
    SELECT 0 AS band, mh_0 || '|' || mh_1 AS band_key, id FROM sigs_new
    UNION ALL SELECT 1, mh_2 || '|' || mh_3, id FROM sigs_new
    UNION ALL SELECT 2, mh_4 || '|' || mh_5, id FROM sigs_new
    UNION ALL SELECT 3, mh_6 || '|' || mh_7, id FROM sigs_new
  )
),
bands_corp AS (
  SELECT band, band_key, id FROM (
    SELECT 0 AS band, mh_0 || '|' || mh_1 AS band_key, id FROM sigs_corp
    UNION ALL SELECT 1, mh_2 || '|' || mh_3, id FROM sigs_corp
    UNION ALL SELECT 2, mh_4 || '|' || mh_5, id FROM sigs_corp
    UNION ALL SELECT 3, mh_6 || '|' || mh_7, id FROM sigs_corp
  )
  -- mirror of the operator's corpus-side max_bucket_ids=1024 width cap
  QUALIFY count(*) OVER (PARTITION BY band, band_key) <= 1024
),
cands AS (
  SELECT DISTINCT n.id AS id_new, c.id AS id_corpus
  FROM bands_new n JOIN bands_corp c
    ON n.band = c.band AND n.band_key = c.band_key
),
sizes_new AS (SELECT id, count(*) AS n_new FROM toks_new GROUP BY id),
sizes_corp AS (SELECT id, count(*) AS n_corp FROM toks_corp GROUP BY id),
inter AS (
  SELECT c.id_new, c.id_corpus, count(*) AS n_inter
  FROM cands c
  JOIN toks_new ta ON ta.id = c.id_new
  JOIN toks_corp tb ON tb.id = c.id_corpus AND tb.token = ta.token
  GROUP BY c.id_new, c.id_corpus
)
SELECT i.id_new, i.id_corpus,
       round(CAST(i.n_inter AS DOUBLE) / (sa.n_new + sb.n_corp - i.n_inter), 6)
         AS jaccard
FROM inter i
JOIN sizes_new sa ON sa.id = i.id_new
JOIN sizes_corp sb ON sb.id = i.id_corpus
WHERE round(CAST(i.n_inter AS DOUBLE) / (sa.n_new + sb.n_corp - i.n_inter), 6)
      >= 0.3
"""


def q_near_dup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state incremental near-dup: the same new-vs-corpus filter
    as ``near_dup_incr`` but through a prebuilt ``build_corpus_index``
    (persisted corpus token + LSH band frames — the pure-functions-of-
    corpus a production pipeline computes once and reuses per crawl
    batch). Result contract is identical, so the oracle is the same
    SQL; what differs is WHERE the corpus work happens (index build,
    amortized across batches) — see SCALE.md "near_dup_incr
    steady-state index A/B"."""
    from ml_hadoop_experiment_spark.operators.dedup import (
        build_corpus_index,
        near_dup_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index = build_corpus_index(
        corpus, "doc_id", "text", shingle_size=3, num_hashes=8,
        bands=4, rows_per_band=2,
    )
    return near_dup_against_index(new, index, "doc_id", "text", threshold=0.3)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: Arrow-vectorized fingerprint (operators/simhash_fp) — one
    # ArrowEvalPython projection instead of 32 HOF filter scans;
    # bit-identical (tests/test_simhash_arrow.py), same oracle SQL
    from ml_hadoop_experiment_spark.operators.simhash_fp import simhash as simhash_fp

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_fp(F.col("text"), bits=16).alias("simhash16"))


SQL_SIMHASH = f"""
SELECT doc_id, {simhash_sql('text', 16)} AS simhash16
FROM documents
"""


def q_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus-merge audit
    (operators/setsketch.kmv_overlap): pairwise vocabulary overlap
    between every two document SOURCES, estimated from 64-minima KMV
    sketches over word 3-gram sets (~1.4k distinct grams per source at
    sf0.01, so the estimator arm — not the small-set fallback — is
    what the gate hashes), with the exact Jaccard yardstick alongside
    (est-vs-truth, the cms_audit/hll_audit convention). Exchange shape
    at scale: each source contributes exactly k hash rows to the
    pairwise stage; the exact columns are the audit-run extra. The
    portable string hash makes the sketch CONTENT deterministic, so
    estimate and truth both replay in DuckDB."""
    from ml_hadoop_experiment_spark.operators.setsketch import kmv_overlap

    docs = _t(spark, sf_dir, "documents")
    from ml_hadoop_experiment_spark.operators.bpe import WORD_SPLIT_SPARK

    grams = docs.select(
        "source",
        F.split(F.trim(F.lower(F.col("text"))), WORD_SPLIT_SPARK).alias(
            "__ws"
        ),
    ).select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(__ws) < 3 THEN cast(array() as array<string>)"
                " ELSE transform(sequence(1, size(__ws) - 2),"
                " i -> concat_ws(' ', __ws[i - 1], __ws[i], __ws[i + 1]))"
                " END"
            )
        ).alias("gram"),
    )
    return kmv_overlap(
        grams, "source", "gram", k=64, hash_mode="string"
    )


def _sql_kmv_source_overlap() -> str:
    from ml_hadoop_experiment_spark.operators.setsketch import (
        kmv_overlap_sql,
    )

    from ml_hadoop_experiment_spark.operators.bpe import WORD_SPLIT_SQL

    grams = (
        "(SELECT source, unnest(list_transform(range(1, len(__ws) - 1),"
        " i -> __ws[i] || ' ' || __ws[i + 1] || ' ' || __ws[i + 2]))"
        " AS gram FROM (SELECT source, regexp_split_to_array(trim(lower("
        f"text)), '{WORD_SPLIT_SQL}') AS __ws FROM documents))"
    )
    return kmv_overlap_sql(grams, "source", "gram", k=64, hash_mode="string")


SQL_KMV_SOURCE_OVERLAP = _sql_kmv_source_overlap()


def q_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate audit view: (digest, n_copies) for every content group
    with more than one row — the triage report run before committing to a
    dedup pass. Same content basis as ``dedup_exact`` (l_orderkey), so
    this reports exactly the groups that pass would collapse. One
    map-combined digest aggregation. (The documents fixture has no exact
    text duplicates — a 0-row result — so the audit runs where duplicates
    exist.)"""
    from ml_hadoop_experiment_spark.operators.dedup import duplicate_stats

    li = _t(spark, sf_dir, "lineitem")
    return duplicate_stats(li, ["l_orderkey"]).withColumnRenamed(
        "count", "n_copies"
    )


SQL_DUP_STATS = """
SELECT md5(CAST(l_orderkey AS VARCHAR)) AS digest, count(*) AS n_copies
FROM lineitem
GROUP BY 1
HAVING count(*) > 1
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pairs within hamming distance 3 of a 32-bit
    fingerprint. Candidates come from pigeonhole blocking on max_hamming+1
    = 4 disjoint 8-bit segments (every true pair shares at least one exact
    segment), exact popcount verifies — never all-pairs, exact recall.
    32 bits (vs the earlier 16) gives each block 256 values, so candidate
    buckets stay discriminating: measured 2.1x fewer candidate pairs and
    >2x faster at sf0.1 with identical recall semantics."""
    from ml_hadoop_experiment_spark.operators.simhash_fp import (
        simhash_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3
    )


def _sql_simhash_pairs() -> str:
    from ml_hadoop_experiment_spark.operators.dedup import simhash_blocks_sql, simhash_sql

    fp = simhash_sql("text", 32)
    blocks = simhash_blocks_sql(32, 3)
    return f"""
WITH fps AS MATERIALIZED (SELECT doc_id AS id, {fp} AS fp FROM documents),
blocks AS MATERIALIZED (
  {blocks}
),
cands AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
  FROM blocks a JOIN blocks b
    ON a.part = b.part AND a.block = b.block AND a.id < b.id
)
SELECT id_a, id_b, bit_count(xor(fp_a, fp_b)) AS hamming
FROM cands WHERE bit_count(xor(fp_a, fp_b)) <= 3
"""


SQL_SIMHASH_PAIRS = _sql_simhash_pairs()


def q_simhash_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dup: the new batch (doc_id % 10 == 0)
    fingerprint-matched against the existing corpus within hamming <= 3
    of a 32-bit SimHash — new-vs-corpus only, corpus never self-paired,
    recall EXACT at the declared radius (pigeonhole segments), unlike
    the Jaccard-recalled near_dup_incr."""
    from ml_hadoop_experiment_spark.operators.simhash_fp import simhash_against

    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return simhash_against(new, corpus, "doc_id", "text", bits=32, max_hamming=3)


def _sql_simhash_incr() -> str:
    from ml_hadoop_experiment_spark.operators.dedup import (
        simhash_blocks_sql,
        simhash_sql,
    )

    fp = simhash_sql("text", 32)
    blocks = simhash_blocks_sql(32, 3)
    return f"""
WITH fps AS MATERIALIZED (SELECT doc_id AS id, {fp} AS fp FROM documents),
blocks AS MATERIALIZED (
  {blocks}
),
cands AS MATERIALIZED (
  SELECT DISTINCT n.id AS id_new, c.id AS id_corpus, n.fp AS fp_a, c.fp AS fp_b
  FROM blocks n JOIN blocks c
    ON n.part = c.part AND n.block = c.block
   AND n.id % 10 = 0 AND c.id % 10 != 0
)
SELECT id_new, id_corpus, bit_count(xor(fp_a, fp_b)) AS hamming
FROM cands WHERE bit_count(xor(fp_a, fp_b)) <= 3
"""


SQL_SIMHASH_INCR = _sql_simhash_incr()


def q_simhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state incremental SimHash near-dup: the same
    new-vs-corpus filter as ``simhash_incr`` but through a prebuilt
    ``build_simhash_index`` (pinned corpus fingerprint + pigeonhole
    block rows — the pure-function-of-corpus frame a production
    pipeline computes once per corpus rotation and reuses per crawl
    batch). Result contract is identical, so the oracle is the same
    SQL; what differs is WHERE the corpus work happens (index build,
    amortized: 6.0 s build + ~1.7 s/batch vs ~7.8 s/batch per-call at
    sf0.1 — see SCALE.md "simhash_incr steady-state index A/B")."""
    from ml_hadoop_experiment_spark.operators.simhash_index import (
        build_simhash_index,
        simhash_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index = build_simhash_index(
        corpus, "doc_id", "text", bits=32, max_hamming=3
    )
    return simhash_against_index(new, index, "doc_id", "text")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup retention: simhash clusters (hamming <= 3,
    32-bit) + keep the highest-quality_score doc per cluster (ties by
    ascending id) — the keep-the-BEST-copy curation decision, vs
    dup_clusters' label-only view. Returns (doc_id, cluster, q) of the
    kept rows."""
    from ml_hadoop_experiment_spark.functions.text import quality_score
    from ml_hadoop_experiment_spark.operators.dedup import keep_best_per_cluster
    from ml_hadoop_experiment_spark.operators.simhash_fp import (
        simhash_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, "doc_id", "text", bits=32, max_hamming=3)
    scored = docs.withColumn("q", quality_score(F.col("text")))
    kept = keep_best_per_cluster(scored, pairs, "doc_id", "q")
    return kept.select("doc_id", "cluster", "q")


def _sql_dedup_keep_best() -> str:
    from ml_hadoop_experiment_spark.functions.text import quality_score_sql

    q = quality_score_sql("text")
    closure = SQL_DUP_CLUSTERS.rstrip()
    return f"""
WITH clusters AS (
{closure}
)
SELECT doc_id, cluster, q FROM (
  SELECT d.doc_id, c.cluster, {q} AS q,
         row_number() OVER (
           PARTITION BY c.cluster ORDER BY {q} DESC, d.doc_id ASC
         ) AS rn
  FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
) WHERE rn = 1
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the simhash near-dup
    pairs (hamming <= 3), every document labeled with its cluster = the
    smallest doc_id reachable through near-dup edges. Recursive
    contraction with per-partition union-find (O(log) levels, one level
    for partition-sized graphs — operators/dedup.connected_components);
    the oracle computes the identical closure with a DuckDB recursive
    CTE — two independent transitive-closure algorithms."""
    from ml_hadoop_experiment_spark.operators.dedup import dedup_clusters
    from ml_hadoop_experiment_spark.operators.simhash_fp import (
        simhash_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, "doc_id", "text", bits=32, max_hamming=3)
    out = dedup_clusters(docs, pairs, "doc_id")
    return out.withColumnRenamed("id", "doc_id")


def _sql_dup_clusters() -> str:
    from ml_hadoop_experiment_spark.operators.dedup import (
        simhash_blocks_sql,
        simhash_sql,
    )

    fp = simhash_sql("text", 32)
    blocks = simhash_blocks_sql(32, 3)
    return f"""
WITH RECURSIVE
fps AS MATERIALIZED (SELECT doc_id AS id, {fp} AS fp FROM documents),
blocks AS MATERIALIZED (
  {blocks}
),
cands AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
  FROM blocks a JOIN blocks b
    ON a.part = b.part AND a.block = b.block AND a.id < b.id
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM cands WHERE bit_count(xor(fp_a, fp_b)) <= 3
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, min(comp) AS cluster
FROM reach
GROUP BY id
"""


SQL_DUP_CLUSTERS = _sql_dup_clusters()

# defined above next to q_dedup_keep_best; built here because it embeds
# the SQL_DUP_CLUSTERS closure text
SQL_DEDUP_KEEP_BEST = _sql_dedup_keep_best()


def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split
    (operators/group_split.leakage_safe_split): split unit = the
    near-dup CLUSTER (connected components over simhash pairs,
    hamming <= 3 of a 32-bit fingerprint), so a train doc's
    near-identical twin can never land in test — the structural fix
    for the standard eval-inflation leak. Returns
    (doc_id, cluster, split); the oracle replays the recursive-CTE
    closure plus the identical portable-hash CASE on the cluster
    label."""
    from ml_hadoop_experiment_spark.operators.group_split import (
        leakage_safe_split,
    )
    from ml_hadoop_experiment_spark.operators.simhash_fp import (
        simhash_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3
    )
    out = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "test": 0.2}, seed=7
    )
    return out.withColumnRenamed("id", "doc_id")


def _sql_group_split() -> str:
    from ml_hadoop_experiment_spark.operators.sampling import assign_split_sql

    case = assign_split_sql("cluster", {"train": 0.8, "test": 0.2}, seed=7)
    closure = SQL_DUP_CLUSTERS.rstrip()
    return f"""
WITH clusters AS (
{closure}
)
SELECT doc_id, cluster, {case} AS split FROM clusters
"""


SQL_GROUP_SPLIT = _sql_group_split()


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leak census that motivates q_group_split
    (operators/group_split.split_leakage_audit): count near-dup pairs
    whose endpoints land in different splits under a ROW-hash split —
    the standard-but-leaky baseline. Nonzero n_pairs here is exactly
    the eval contamination the cluster-level split eliminates by
    construction (its audit is empty; pytest-gated since empty frames
    make weak oracle gates)."""
    from ml_hadoop_experiment_spark.operators.group_split import (
        split_leakage_audit,
    )
    from ml_hadoop_experiment_spark.operators.simhash_fp import (
        simhash_near_dup_pairs,
    )
    from ml_hadoop_experiment_spark.operators.sampling import assign_split

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3
    )
    row_split = assign_split(
        docs.select(F.col("doc_id").alias("id")),
        ["id"],
        {"train": 0.8, "test": 0.2},
        seed=7,
        portable=True,
    )
    return split_leakage_audit(row_split, pairs, "id", "split")


def _sql_split_leakage() -> str:
    from ml_hadoop_experiment_spark.operators.sampling import assign_split_sql

    case = assign_split_sql("doc_id", {"train": 0.8, "test": 0.2}, seed=7)
    pairs = SQL_SIMHASH_PAIRS.rstrip()
    return f"""
WITH pairs AS (
{pairs}
),
s AS (SELECT doc_id AS id, {case} AS sp FROM documents)
SELECT least(sa.sp, sb.sp) AS split_a,
       greatest(sa.sp, sb.sp) AS split_b,
       count(*) AS n_pairs
FROM pairs
JOIN s sa ON sa.id = pairs.id_a
JOIN s sb ON sb.id = pairs.id_b
WHERE sa.sp <> sb.sp
GROUP BY 1, 2
"""


SQL_SPLIT_LEAKAGE = _sql_split_leakage()


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup: keep documents whose text does NOT already
    appear in the 'existing corpus' (stand-in: doc_id < 100) — the
    incremental new-crawl-vs-training-set shape. Digest-keyed left-anti
    join; payloads never shuffle."""
    from ml_hadoop_experiment_spark.operators.dedup import dedup_against

    docs = _t(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") < 100)
    out = dedup_against(docs.where(F.col("doc_id") >= 100), existing, ["text"])
    return out.select("doc_id")


SQL_DEDUP_INCREMENTAL = """
SELECT doc_id FROM documents
WHERE doc_id >= 100
  AND coalesce(text, chr(0) || 'null') NOT IN (
    SELECT coalesce(text, chr(0) || 'null') FROM documents WHERE doc_id < 100
  )
"""


def q_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup — same semantics as
    `dedup_incremental` (exact cross-corpus anti-join) but the filter
    is built over the SMALL batch (doc_id < 300) and the LARGE corpus
    is only scanned: each corpus partition probes the broadcast filter
    and forwards just the digests possibly matching the batch, and
    that tiny candidate set broadcast-anti-joins back
    (operators/bloom.py) — no corpus-sized exchange anywhere.
    ``max_bits`` is forced tiny so the filter saturates and the
    false-positive path (candidates that match no batch row) executes
    at test scale — the output is exact either way, which is the
    operator's whole contract."""
    from ml_hadoop_experiment_spark.operators.bloom import dedup_against_bloom

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 300)
    out = dedup_against_bloom(
        docs.where(F.col("doc_id") < 300), corpus, ["text"], max_bits=4096
    )
    return out.select("doc_id")


SQL_DEDUP_BLOOM = """
SELECT doc_id FROM documents
WHERE doc_id < 300
  AND coalesce(text, chr(0) || 'null') NOT IN (
    SELECT coalesce(text, chr(0) || 'null') FROM documents WHERE doc_id >= 300
  )
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level cross-document dedup (operators/lines.py — the
    CCNet/RefinedWeb boilerplate cut): drop every line whose
    normalized form appears in more than 3 distinct documents,
    returning the cleaned corpus (doc_id, clean_text,
    n_removed_lines). The fixture documents are single-line, so the
    query synthesizes 3-line pages in pure codegen (replayed by the
    oracle): a doc-unique body line, a global copyright footer (every
    doc — always cut), and a promo line shared by the doc_id %% 7
    bucket (~1/7 of docs — cut at max_docs=3). One distinct-line
    aggregation + a boilerplate-proportional position join; the corpus
    payload never shuffles (the decontaminate_spans pattern)."""
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_lines,
    )

    docs = _t(spark, sf_dir, "documents")
    page = F.concat_ws(
        "\n",
        F.concat(F.col("text"), F.lit(" #"), F.col("doc_id")),
        F.lit("(c) Example Corp - All Rights Reserved"),
        F.concat(F.lit("promo code "), (F.col("doc_id") % 7)),
    )
    pages = docs.select("doc_id", page.alias("text"))
    return drop_repeated_lines(
        pages, "doc_id", "text", max_docs=3
    )


def _sql_line_dedup() -> str:
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_lines_sql,
    )

    # concat_ws (NOT ||-chains): both engines SKIP a NULL component,
    # so a NULL-text row builds the same 2-line page on both sides
    # instead of Spark emitting a page while the oracle nullifies it
    page = (
        "concat_ws(chr(10), text || ' #' || CAST(doc_id AS VARCHAR), "
        "'(c) Example Corp - All Rights Reserved', "
        "'promo code ' || CAST(doc_id % 7 AS VARCHAR))"
    )
    return drop_repeated_lines_sql(
        f"(SELECT doc_id, {page} AS text FROM documents)",
        "doc_id",
        "text",
        max_docs=3,
        out_id="doc_id",
    )


SQL_LINE_DEDUP = _sql_line_dedup()


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-BLOCK cross-document dedup (operators/lines.
    drop_repeated_paragraphs — the CCNet recipe one granularity up
    from q_line_dedup): drop every blank-line-delimited block whose
    whitespace-collapsed normalized form repeats across documents,
    returning (doc_id, clean_text, n_removed_paragraphs). The fixture
    synthesizes 3-paragraph pages in pure codegen (replayed by the
    oracle): a subscribe banner shared per SOURCE (~50 docs each —
    always cut), a doc-unique body, and a copyright footer shared per
    LANG whose spelling alternates between an indented UPPERCASE and a
    plain lowercase variant by doc parity — cut only because the match
    key collapses case and whitespace. The second separator is a
    whitespace-bearing blank line (newline-space-newline), pinning the
    \\n\\s*\\n split."""
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_paragraphs,
    )

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("Subscribe to "), F.col("source"), F.lit(" newsletter"),
        F.lit("\n\n"),
        F.substring(F.col("text"), 1, 150),
        F.lit("\n \n"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("  COPYRIGHT "))
        .otherwise(F.lit("copyright ")),
        F.col("lang"), F.lit(" team"),
    )
    pages = docs.select("doc_id", page.alias("text"))
    return drop_repeated_paragraphs(pages, "doc_id", "text", max_docs=1)


def _sql_paragraph_dedup() -> str:
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_paragraphs_sql,
    )

    page = (
        "'Subscribe to ' || source || ' newsletter'"
        " || chr(10) || chr(10)"
        " || substr(text, 1, 150)"
        " || chr(10) || ' ' || chr(10)"
        " || CASE WHEN doc_id % 2 = 0 THEN '  COPYRIGHT '"
        "         ELSE 'copyright ' END"
        " || lang || ' team'"
    )
    return drop_repeated_paragraphs_sql(
        f"(SELECT doc_id, {page} AS text FROM documents)",
        "doc_id",
        "text",
        max_docs=1,
        out_id="doc_id",
    )


SQL_PARAGRAPH_DEDUP = _sql_paragraph_dedup()


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination ACTION (operators/curation.decontaminate_spans):
    the CLEANED corpus itself — every maximal token span sharing a word
    5-gram with the benchmark split (doc_id % 10 == 0, the
    q_decontaminate stand-in) is CUT from the text, not just reported:
    (doc_id, clean_text, n_removed_tokens). Span-cut beats doc-drop
    (q_decontaminate's shape) because the surrounding clean text keeps
    its training signal (Lee et al. 2022). Broadcast benchmark grams,
    hits-only shuffle, per-DOC merge window, pure codegen index filter
    over the token array — the corpus payload never shuffles; integer
    and string output only, so the gate hash is exact."""
    from ml_hadoop_experiment_spark.operators.curation import (
        decontaminate_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return decontaminate_spans(
        corpus, bench, "doc_id", "text", ngram_size=5, hash_grams=True
    )


def _sql_decontaminate_spans() -> str:
    from ml_hadoop_experiment_spark.operators.curation import (
        decontaminate_spans_sql,
    )

    return decontaminate_spans_sql(
        "(SELECT * FROM documents WHERE doc_id % 10 <> 0)",
        "(SELECT * FROM documents WHERE doc_id % 10 = 0)",
        "doc_id",
        "text",
        ngram_size=5,
        hash_grams=True,
        out_id="doc_id",
    )


SQL_DECONTAMINATE_SPANS = _sql_decontaminate_spans()


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C recipe): flag corpus
    documents sharing any word 5-gram with the held-out benchmark split.

    Benchmark = doc_id % 10 == 0 (the stand-in for a tiny eval set),
    corpus = the rest. The benchmark's distinct hashed grams are
    broadcast; the corpus never shuffles — the only exchange carries
    matching (id, gram) pairs, proportional to contamination, not corpus
    size. See operators/curation.py for the 100 TB plan shape."""
    from ml_hadoop_experiment_spark.operators.curation import contamination_report

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return contamination_report(
        corpus, bench, "doc_id", "text", ngram_size=5, hash_grams=True
    ).select(F.col("id").alias("doc_id"), "n_hit_grams")


def _sql_decontaminate() -> str:
    from ml_hadoop_experiment_spark.operators.curation import contamination_grams_sql

    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
cbase AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM corpus),
bbase AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM bench),
-- DISTINCT over (id, HASHED gram), not gram text: the Spark side counts
-- countDistinct(hashed gram), so two distinct text grams that collide in
-- 32 bits must count ONCE in both engines (round-4 advice).
cg AS (SELECT DISTINCT id, gram FROM ({contamination_grams_sql('cbase', 5)})),
bg AS (SELECT DISTINCT gram FROM ({contamination_grams_sql('bbase', 5)}))
SELECT cg.id AS doc_id, count(*) AS n_hit_grams
FROM cg JOIN bg ON cg.gram = bg.gram
GROUP BY cg.id
"""


SQL_DECONTAMINATE = _sql_decontaminate()


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after text canonicalization (lowercase, punctuation
    strip, whitespace collapse) — catches reformatted copies byte-exact
    digests miss. Same single-shuffle plan as dedup_exact."""
    from ml_hadoop_experiment_spark.operators.curation import dedup_normalized

    docs = _t(spark, sf_dir, "documents")
    return dedup_normalized(docs, "doc_id", "text").select(
        "doc_id", "lang", "source"
    )


def _sql_dedup_normalized() -> str:
    from ml_hadoop_experiment_spark.operators.curation import normalize_text_sql

    return f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY md5({normalize_text_sql('text')})
           ORDER BY doc_id
         ) AS rn
  FROM documents
) WHERE rn = 1
"""


SQL_DEDUP_NORMALIZED = _sql_dedup_normalized()


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding near-dup pairs (LSH sign-bit
    buckets + exact cosine >= 0.3) feed connected components, labeling
    every vector with its semantic cluster = smallest reachable vec_id.
    Keeping min(vec_id)==vec_id rows then dedups by MEANING rather than
    by bytes — the embedding-space counterpart of dup_clusters, sharing
    the same contraction union-find engine and oracle-checked against a
    DuckDB recursive-CTE closure over an independently computed pair
    set."""
    from ml_hadoop_experiment_spark.operators.dedup import dedup_clusters
    from ml_hadoop_experiment_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_near_dup_pairs(
        emb, id_col="vec_id", vec_col="embedding", num_planes=4, dim=64,
        threshold=0.3,
    )
    out = dedup_clusters(emb, pairs, "vec_id")
    return out.withColumnRenamed("id", "vec_id")


def _sql_semantic_dedup() -> str:
    return f"""
WITH RECURSIVE
buckets AS MATERIALIZED (
  SELECT vec_id,
         {lsh_bucket_sql('embedding', 4, 64)} AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / {_ROW_NORM}) AS vnorm
  FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({_PAIR_DOT_NORMED}, 6) >= 0.3
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS vec_id, min(comp) AS cluster
FROM reach
GROUP BY id
"""


SQL_SEMANTIC_DEDUP = _sql_semantic_dedup()


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: part names within 2 Levenshtein edits inside
    the same brand block — record linkage without all-pairs. Equi-join
    on the block key, codegen length prefilter before the DP-cost
    levenshtein, JVM built-in end to end."""
    from ml_hadoop_experiment_spark.operators.entity import blocked_fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand"], max_distance=2
    )


def _sql_fuzzy_match() -> str:
    from ml_hadoop_experiment_spark.operators.entity import blocked_fuzzy_pairs_sql

    return blocked_fuzzy_pairs_sql(
        "part", "p_partkey", "p_name", ["p_brand"], max_distance=2
    )


SQL_FUZZY_MATCH = _sql_fuzzy_match()


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution: part names ranked in one
    global order (two-phase prefix sum, no single-partition window),
    candidates = within 5 positions, verified at Levenshtein <= 2 — the
    blocking strategy for tables with NO natural block key. Candidate
    count is linear (<= 2w per record) by construction."""
    from ml_hadoop_experiment_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    part = _t(spark, sf_dir, "part")
    pairs = sorted_neighborhood_pairs(part, "p_partkey", ["p_name"], window=5)
    names = part.select("p_partkey", "p_name")
    return (
        pairs.join(
            names.select(
                F.col("p_partkey").alias("id_a"), F.col("p_name").alias("__na")
            ),
            "id_a",
        )
        .join(
            names.select(
                F.col("p_partkey").alias("id_b"), F.col("p_name").alias("__nb")
            ),
            "id_b",
        )
        .withColumn("distance", F.levenshtein("__na", "__nb"))
        .where(F.col("distance") <= 2)
        .select("id_a", "id_b", "rank_a", "rank_b", "distance")
    )


SQL_SNM_PAIRS = """
WITH r AS (
  SELECT p_partkey, p_name,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.rk AS rank_a, b.rk AS rank_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 5
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication: hashed word 8-grams appearing in >= 2
    distinct documents — boilerplate/template spans that doc-level
    MinHash misses. Map-side shingling; the only shuffle carries
    (int-hash, partial-count) pairs."""
    from ml_hadoop_experiment_spark.operators.curation import repeated_ngrams

    docs = _t(spark, sf_dir, "documents")
    return repeated_ngrams(docs, "doc_id", "text", ngram_size=8, min_docs=2)


def _sql_repeated_ngrams() -> str:
    from ml_hadoop_experiment_spark.operators.curation import (
        contamination_grams_sql,
    )

    grams = contamination_grams_sql("base", ngram_size=8, hash_grams=True)
    return f"""
WITH base AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
grams AS ({grams})
SELECT gram, count(*) AS n_docs
FROM grams GROUP BY 1 HAVING count(*) >= 2
"""


SQL_REPEATED_NGRAMS = _sql_repeated_ngrams()


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated spans: overlapping cross-doc repeated 8-grams
    merged into their maximal token ranges per document (the span you
    would actually cut in exact-substring dedup, cf. Lee et al. 2022).
    Positional grams map-side; one hashed-gram count exchange; span
    merge under a per-DOC window (task size bounded by document
    length). Integer-only output, bit-identical cross-engine."""
    from ml_hadoop_experiment_spark.operators.curation import repeated_spans

    docs = _t(spark, sf_dir, "documents")
    return repeated_spans(docs, "doc_id", "text", ngram_size=8, min_docs=2)


def _sql_repeated_spans() -> str:
    from ml_hadoop_experiment_spark.operators.curation import (
        repeated_spans_sql,
    )

    return repeated_spans_sql("documents", "doc_id", "text",
                              ngram_size=8, min_docs=2)


SQL_REPEATED_SPANS = _sql_repeated_spans()


def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity self-join via prefix filtering
    (operators/setsim.jaccard_join): complete — every pair >= 0.4, not
    an LSH-recalled subset — with candidate cost bounded by the
    rarest-first prefix index. The oracle is the brute-force all-pairs
    token join, so parity IS the completeness proof."""
    from ml_hadoop_experiment_spark.operators.setsim import jaccard_join

    docs = _t(spark, sf_dir, "documents")
    return jaccard_join(docs, "doc_id", "text", threshold=0.4, shingle_size=3)


# brute-force twin: no prefix filter — DuckDB joins the full inverted
# index; identical tokenization (3-shingles, short-doc whole-text rule)
# and identical rounding, so any pair the prefix filter missed fails the
# row-count gate immediately. One parameterized builder serves both
# SQL_JACCARD_JOIN and SQL_TOPK_SIMILAR_PAIRS so the two floors can
# never drift apart through a silent string-replace no-op.
def _sql_jaccard_pairs(threshold: float) -> str:
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
toks AS (
  SELECT DISTINCT doc_id AS id, sh AS token FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
    FROM base WHERE len(t) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(t, ' ') AS sh FROM base WHERE len(t) < 3
  )
),
sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM toks a JOIN toks b ON a.token = b.token AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) >= {threshold}
"""


SQL_JACCARD_JOIN = _sql_jaccard_pairs(0.4)


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-leakage matrix
    (operators/curation.source_overlap): shared content fingerprints
    (first-8-token prefix digests — the fixture has no byte-exact
    cross-source dups, so the exact-digest mode would gate on an empty
    frame) per unordered source pair — the pre-merge audit for
    double-counting and train/eval leakage between corpora."""
    from ml_hadoop_experiment_spark.operators.curation import source_overlap

    docs = _t(spark, sf_dir, "documents")
    return source_overlap(
        docs, ["text"], "source", fingerprint_tokens=8
    ).select(
        F.col("group_a").alias("source_a"),
        F.col("group_b").alias("source_b"),
        "n_shared",
    )


# twin of the fingerprint_tokens=8 key: md5 over the space-joined first
# 8 tokens of the normalized text (DuckDB's arr[1:8] slice = Spark's
# slice(arr, 1, 8): up to 8 elements, whole array when shorter)
SQL_SOURCE_OVERLAP = r"""
WITH d AS (
  SELECT DISTINCT md5(array_to_string(
           regexp_split_to_array(trim(lower(text)), '\s+')[1:8], ' ')) AS dig,
         source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
FROM d a JOIN d b ON a.dig = b.dig AND a.source < b.source
GROUP BY 1, 2
"""


def q_topk_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 50 most similar document pairs above a 0.3 Jaccard floor
    (operators/setsim.topk_similar_pairs) — dedup QA's worst-offenders
    view; exact because every pair >= the floor is enumerated by the
    complete prefix-filtered join, then TakeOrderedAndProject cuts k
    under a total (jaccard DESC, id_a, id_b) order."""
    from ml_hadoop_experiment_spark.operators.setsim import topk_similar_pairs

    docs = _t(spark, sf_dir, "documents")
    # probe_floor opts in to the eager adaptive-floor probe (the measured
    # 2-2.5x win, SCALE.md round 9); the operator's default stays lazy.
    return topk_similar_pairs(
        docs, "doc_id", "text", k=50, floor=0.3, probe_floor=0.7
    )


# brute force + the same total order; DuckDB's ORDER BY ... LIMIT
SQL_TOPK_SIMILAR_PAIRS = (
    _sql_jaccard_pairs(0.3) + "ORDER BY jaccard DESC, id_a, id_b LIMIT 50"
)


def q_decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination at ARBITRARY length (round 12 —
    operators/curation.decontaminate_exact, the Lee et al. 2022
    any-length->=-threshold contract): every maximal corpus substring
    appearing CONTIGUOUSLY in one benchmark document (doc_id % 10 == 0
    split) with length >= 8 tokens is cut — unlike q_decontaminate_spans'
    fixed 5-gram coverage, a patchwork of seed grams from different
    benchmark places is NOT cut, and the cut always extends to the full
    shared extent. Gram-anchored seeding (4-gram hash join against the
    broadcast benchmark) keeps the shuffle hits-proportional; the
    bidirectional first-mismatch extension is a pure codegen array fold
    that re-verifies tokens exactly (hashed-seed collisions
    self-destruct). Same output contract as decontaminate_spans:
    (doc_id, clean_text, n_removed_tokens)."""
    from ml_hadoop_experiment_spark.operators.curation import (
        decontaminate_exact,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return decontaminate_exact(
        corpus, bench, "doc_id", "text",
        min_len=8, seed_gram=4, hash_grams=True,
    )


def _sql_decontaminate_exact() -> str:
    from ml_hadoop_experiment_spark.operators.curation import (
        decontaminate_exact_sql,
    )

    return decontaminate_exact_sql(
        "(SELECT * FROM documents WHERE doc_id % 10 <> 0)",
        "(SELECT * FROM documents WHERE doc_id % 10 = 0)",
        "doc_id",
        "text",
        min_len=8,
        seed_gram=4,
        hash_grams=True,
        out_id="doc_id",
    )


SQL_DECONTAMINATE_EXACT = _sql_decontaminate_exact()


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring SELF-dedup (round 12 —
    operators/curation.dedup_exact_substrings, the Lee et al. 2022
    paper's primary form): every maximal substring of >= 8 tokens that
    also appears in an EARLIER document is cut from the later one
    (deterministic keep-first), returning the cleaned corpus
    (doc_id, clean_text, n_removed_tokens). The gram-keyed self-join is
    the one corpus-sized shuffle (the distributed stand-in for the
    paper's suffix array); hot grams are excluded from seeding by the
    deterministic max_posting_width=64 windowed cap (the max_bucket_ids
    discipline, replayed by the oracle — recall caveat documented on
    the operator); extension, merge, and cut are the
    decontaminate_exact machinery."""
    from ml_hadoop_experiment_spark.operators.curation import (
        dedup_exact_substrings,
    )

    docs = _t(spark, sf_dir, "documents")
    return dedup_exact_substrings(
        docs, "doc_id", "text",
        min_len=8, seed_gram=4, hash_grams=True, max_posting_width=64,
    )


def _sql_dedup_substrings() -> str:
    from ml_hadoop_experiment_spark.operators.curation import (
        dedup_exact_substrings_sql,
    )

    return dedup_exact_substrings_sql(
        "documents", "doc_id", "text",
        min_len=8, seed_gram=4, hash_grams=True, max_posting_width=64,
        out_id="doc_id",
    )


SQL_DEDUP_SUBSTRINGS = _sql_dedup_substrings()


def _domain_fixture(d):
    """Synthetic crawl-URL column for the domain rollup (pure codegen,
    replayed verbatim by the oracle — the fixture is shared by design,
    the two HOST/DOMAIN extractors are not): six URL shapes cycling
    five sites, exercising subdomains, ``www.``, an explicit port, a
    ``user:pw@`` userinfo, two multi-part public suffixes (``co.uk``,
    ``gov.uk``), an IPv4 literal, and (every 13th doc) a non-URL
    passthrough line."""
    h = (d % 5).cast("string")
    p = (d % 7).cast("string")
    v0 = F.concat(F.lit("https://news.site"), h, F.lit(".co.uk/p/"), p)
    v1 = F.concat(F.lit("https://www.site"), h, F.lit(".com/p/"), p)
    v2 = F.concat(
        F.lit("http://cdn"), (d % 3).cast("string"),
        F.lit(".site"), h, F.lit(".com:8080/a/"), p,
    )
    v3 = F.concat(F.lit("https://user:pw@blog.site"), h, F.lit(".org/p/"), p)
    v4 = F.concat(F.lit("http://site"), h, F.lit(".gov.uk/p/"), p)
    v5 = F.concat(F.lit("http://10.0."), h, F.lit(".25/x/"), p)
    return (
        F.when(d % 13 == 3, F.concat(F.lit("bookmark "), d.cast("string")))
        .when(d % 6 == 0, v0)
        .when(d % 6 == 1, v1)
        .when(d % 6 == 2, v2)
        .when(d % 6 == 3, v3)
        .when(d % 6 == 4, v4)
        .otherwise(v5)
    )


_DOMAIN_FIXTURE_SQL = """
CASE WHEN doc_id % 13 = 3
     THEN 'bookmark ' || CAST(doc_id AS VARCHAR)
     WHEN doc_id % 6 = 0
     THEN 'https://news.site' || CAST(doc_id % 5 AS VARCHAR)
          || '.co.uk/p/' || CAST(doc_id % 7 AS VARCHAR)
     WHEN doc_id % 6 = 1
     THEN 'https://www.site' || CAST(doc_id % 5 AS VARCHAR)
          || '.com/p/' || CAST(doc_id % 7 AS VARCHAR)
     WHEN doc_id % 6 = 2
     THEN 'http://cdn' || CAST(doc_id % 3 AS VARCHAR)
          || '.site' || CAST(doc_id % 5 AS VARCHAR)
          || '.com:8080/a/' || CAST(doc_id % 7 AS VARCHAR)
     WHEN doc_id % 6 = 3
     THEN 'https://user:pw@blog.site' || CAST(doc_id % 5 AS VARCHAR)
          || '.org/p/' || CAST(doc_id % 7 AS VARCHAR)
     WHEN doc_id % 6 = 4
     THEN 'http://site' || CAST(doc_id % 5 AS VARCHAR)
          || '.gov.uk/p/' || CAST(doc_id % 7 AS VARCHAR)
     ELSE 'http://10.0.' || CAST(doc_id % 5 AS VARCHAR)
          || '.25/x/' || CAST(doc_id % 7 AS VARCHAR)
END"""


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level crawl rollup (functions/url.url_host +
    registered_domain): extract the host (userinfo/port stripped) and
    the registrable domain (last two labels, or three over the frozen
    multi-part-suffix subset of the Public Suffix List; IPv4 literals
    pass through) from the synthesized crawl URLs, then aggregate per
    domain — the standard first census of a crawl (per-domain doc
    counts drive blocklists, quotas, and CCNet-style per-domain
    processing). Non-URL rows group under the NULL domain with zero
    distinct hosts. Pure codegen extraction; the single shuffle is the
    KB-sized domain aggregation."""
    from ml_hadoop_experiment_spark.functions.url import (
        registered_domain,
        url_host,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _domain_fixture(F.col("doc_id")).alias("url")
    )
    hosts = docs.select(
        "doc_id", "url", url_host(F.col("url")).alias("host")
    ).withColumn("domain", registered_domain(F.col("host")))
    return hosts.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("url").alias("n_urls"),
    )


def _sql_domain_stats() -> str:
    from ml_hadoop_experiment_spark.functions.url import (
        registered_domain_sql,
        url_host_sql,
    )

    return f"""
WITH urls AS (
  SELECT doc_id, {_DOMAIN_FIXTURE_SQL} AS url FROM documents
),
hosts AS (
  SELECT doc_id, url, {url_host_sql("url")} AS host FROM urls
),
doms AS (
  SELECT doc_id, url, host, {registered_domain_sql("host")} AS domain
  FROM hosts
)
SELECT domain, count(*) AS n_docs,
       count(DISTINCT host) AS n_hosts,
       count(DISTINCT url) AS n_urls
FROM doms GROUP BY domain
"""


SQL_DOMAIN_STATS = _sql_domain_stats()


def q_boilerplate_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOMAIN boilerplate removal (operators/lines.
    drop_repeated_lines with group_col — the CCNet posture: repetition
    is evidence WITHIN a shard/domain, not across the whole crawl).
    The fixture synthesizes 3-line pages grouped by source: a
    doc-unique body; a per-source banner (25+ docs per source — always
    cut); and a cross-source "notice" line keyed by doc_id %% 89 whose
    GLOBAL frequency exceeds max_docs=3 but whose within-source
    frequency mostly does not — the line the grouped and ungrouped
    operators disagree on, pinning the group scoping. Same scale shape
    as line_dedup; the census key just gains the group column."""
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_lines,
    )

    docs = _t(spark, sf_dir, "documents")
    page = F.concat_ws(
        "\n",
        F.concat(F.col("text"), F.lit(" #"), F.col("doc_id")),
        F.concat(F.lit("Subscribe to "), F.col("source"), F.lit(" updates")),
        F.concat(F.lit("notice "), (F.col("doc_id") % 89)),
    )
    pages = docs.select("doc_id", "source", page.alias("text"))
    return drop_repeated_lines(
        pages, "doc_id", "text", max_docs=3, group_col="source"
    )


def _sql_boilerplate_grouped() -> str:
    from ml_hadoop_experiment_spark.operators.lines import (
        drop_repeated_lines_sql,
    )

    page = (
        "concat_ws(chr(10), text || ' #' || CAST(doc_id AS VARCHAR), "
        "'Subscribe to ' || source || ' updates', "
        "'notice ' || CAST(doc_id % 89 AS VARCHAR))"
    )
    return drop_repeated_lines_sql(
        f"(SELECT doc_id, source, {page} AS text FROM documents)",
        "doc_id",
        "text",
        max_docs=3,
        out_id="doc_id",
        group_expr="source",
    )


SQL_BOILERPLATE_GROUPED = _sql_boilerplate_grouped()
