"""Sequence packing and document chunking for LLM training data.

Extensions beyond the reference (BASELINE.json north-star). Two ops every
pretraining data pipeline runs right before the TFRecord/array sink:

- **Chunking** — split each document's token stream into fixed-size
  windows with overlap (the context-length splitter for both pretraining
  and RAG indexing). Pure relational: compute chunk starts with
  ``sequence``, explode, slice — whole-stage codegen, zero Python, no
  shuffle.

- **Concat-packing** — assign documents to fixed token-budget bins by
  concatenation order (the GPT-style "concatenate the corpus, cut every
  ``budget`` tokens" scheme; bins are full by construction and a document
  may straddle two bins, exactly like the real thing). Built on the
  exact two-phase global prefix sum (``plans/prefix.py``), so the
  assignment is a total-order cumsum WITHOUT a single-partition window —
  the naive ``SUM() OVER (ORDER BY ...)`` form is the 100 TB cliff this
  module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.plans.prefix import with_global_running_sum


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) fixed-size whitespace-token
    windows with ``overlap`` tokens of context carried between chunks.

    Chunk starts are ``0, stride, 2*stride, ...`` with ``stride =
    chunk_tokens - overlap``; the last chunk may be short. Empty docs
    yield one empty chunk (chunk_id 0) so every input id survives —
    auditable row accounting.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int")
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("__t"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            "id",
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("__t"), F.col("__start") + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size(F.col("__t")) - F.col("__start")
            ).alias("n_tokens"),
        )
    )


def chunk_documents_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> str:
    """DuckDB twin of ``chunk_documents`` (1-based list slicing)."""
    stride = chunk_tokens - overlap
    return f"""
WITH base AS (
  SELECT {id_expr} AS id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS t
  FROM {relation}
),
chunks AS (
  SELECT id, t,
         unnest(range(0, greatest(1, CAST(ceil(CAST(len(t) - {overlap} AS DOUBLE)
                                               / {stride}) AS BIGINT)))) AS chunk_id
  FROM base
)
SELECT id, CAST(chunk_id AS INTEGER) AS chunk_id,
       array_to_string(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(least({chunk_tokens}, len(t) - chunk_id * {stride}) AS INTEGER) AS n_tokens
FROM chunks
"""


def concat_pack(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a token-budget bin by concatenation order.

    Documents are laid out in ``id`` order; ``bin = exclusive_cumsum div
    budget`` and ``bin_offset`` is the document's start position within
    its bin. A document whose tokens straddle a budget boundary belongs
    to the bin it starts in (``spans_boundary`` flags it — the consumer
    decides to split or to mask across the seam, as pretraining loaders
    do).

    The cumsum is the exact two-phase global prefix sum — one range
    exchange + a map-only pass; nothing ever funnels through a single
    task. Output: (id, n_tokens, bin, bin_offset, spans_boundary).
    """
    summed = with_global_running_sum(
        df.select(F.col(id_col).alias("id"), F.col(n_tokens_col).alias("n_tokens")),
        ["id"],
        "n_tokens",
        out_col="__cum",
        num_partitions=num_partitions,
    )
    excl = (F.col("__cum") - F.col("n_tokens")).alias("__excl")
    return summed.select(
        "id",
        "n_tokens",
        F.expr(f"(__cum - n_tokens) div {budget}").alias("bin"),
        F.expr(f"(__cum - n_tokens) % {budget}").alias("bin_offset"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.expr(f"(__cum - n_tokens) div {budget}")
                != F.expr(f"(__cum - 1) div {budget}")
            )
        ).alias("spans_boundary"),
    )


def concat_pack_sql(
    relation: str, id_expr: str, n_tokens_expr: str, budget: int
) -> str:
    """DuckDB twin: plain window cumsum (single-node oracle form of the
    two-phase distributed prefix sum)."""
    return f"""
WITH c AS (
  SELECT {id_expr} AS id, {n_tokens_expr} AS n_tokens,
         sum({n_tokens_expr}) OVER (ORDER BY {id_expr}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM {relation}
)
SELECT id, n_tokens,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS bin,
       CAST((cum - n_tokens) % {budget} AS BIGINT) AS bin_offset,
       (n_tokens > 0 AND ((cum - n_tokens) // {budget}) <> ((cum - 1) // {budget}))
         AS spans_boundary
FROM c
"""


__all__ = [
    "chunk_documents",
    "chunk_documents_sql",
    "concat_pack",
    "concat_pack_sql",
]
