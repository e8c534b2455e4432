"""Line-level cross-document dedup — the CCNet/RefinedWeb boilerplate cut.

Web-scale curation pipelines dedup at LINE granularity before (and
besides) document granularity: navigation bars, cookie banners, and
copyright footers repeat verbatim across millions of pages whose
bodies differ, so doc-level MinHash never pairs them and span-level
decontamination has no benchmark to match against. The published
recipes (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"; Penedo et al. 2023, "The
RefinedWeb Dataset for Falcon LLM" — public literature) drop every
line whose normalized form appears in more than a handful of
documents; this module is that operator as a cleaned-corpus producer.

Semantics:

- lines split on ``\\n``; the MATCH key is the trimmed (and by default
  lower-cased) line, so indentation/case variants of the same
  boilerplate dedup together while the ORIGINAL line text is what gets
  kept or cut;
- blank lines (empty after trim) never count and never drop — removal
  decisions must hinge on content, and the all-docs-share-the-empty-
  line degeneracy would otherwise strip every blank separator;
- a line is dropped from ALL documents once its normalized form
  appears in more than ``max_docs`` DISTINCT documents (the CCNet
  posture: the boilerplate is noise everywhere, not original in one
  place).

Plan shape (the ``decontaminate_spans`` pattern): lines explode
map-side; ONE aggregation keyed by the normalized line (bounded by the
distinct-line vocabulary, partial-aggregated) finds the repeated set;
positions of repeated lines join back line-keyed — an exchange
proportional to BOILERPLATE VOLUME, not corpus size — collapse to one
bounded drop-list per affected document, broadcast back, and a pure
codegen index filter cuts the lines. The corpus payload never
shuffles. For corpora where most lines repeat (un-deduped crawls) the
drop-list frame grows toward corpus size — run doc-level dedup first,
which is the published pipeline order anyway.

Reference parity: criteo/ml-hadoop-experiment has no curation surface
(SURVEY.md §2) — north-star extension for LLM data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(line: Column, normalize: bool) -> Column:
    n = F.trim(line)
    return F.lower(n) if normalize else n


def repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int = 1,
    normalize: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """``(line, n_docs)`` — every normalized non-blank line appearing
    in more than ``max_docs`` distinct documents, with its document
    frequency: the boilerplate census (what :func:`drop_repeated_lines`
    cuts). One map-side explode + one partial-aggregated distinct-count
    keyed by the normalized line.

    With ``group_col`` (the CCNet posture: boilerplate is counted
    WITHIN a shard/domain, because a cookie banner that floods one
    domain is not evidence against the same sentence on another), the
    census keys on ``(group, line)`` and the output carries the group:
    ``(group_col, line, n_docs)``. Same plan shape — the group column
    rides the exploded slim rows; the aggregation stays bounded by the
    per-group distinct-line vocabulary."""
    cols = [
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__l"),
    ]
    keys = ["line"]
    if group_col is not None:
        cols.insert(0, F.col(group_col).alias("__grp"))
        keys = ["__grp", "line"]
    lines = df.select(*cols).select(
        *([F.col("__grp")] if group_col is not None else []),
        "id",
        _norm(F.col("__l"), normalize).alias("line"),
    )
    out = (
        lines.where(F.col("line") != "")
        .groupBy(*keys)
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") > max_docs)
    )
    if group_col is not None:
        out = out.withColumnRenamed("__grp", group_col)
    return out


def drop_repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int = 1,
    normalize: bool = True,
    out_text_col: str = "clean_text",
    group_col: str | None = None,
) -> DataFrame:
    """The cleaned corpus: ``(id_col, out_text_col, n_removed_lines)``
    with every cross-document repeated line cut and the survivors
    rejoined with ``\\n`` in document order. Clean documents pass
    through with ``n_removed_lines = 0``; NULL text stays NULL.

    The drop decisions come back as one bounded position list per
    AFFECTED document (broadcast), and the cut itself is a pure
    codegen two-arg ``filter`` over the split array — the corpus
    payload never shuffles.

    With ``group_col``, repetition is counted and cut WITHIN each group
    (per-domain boilerplate — see :func:`repeated_lines`): the drop
    join keys on ``(group, line)``, so a line that floods one domain
    survives untouched everywhere else.
    """
    rep = repeated_lines(df, id_col, text_col, max_docs, normalize, group_col)
    cols = [
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "__l"),
    ]
    if group_col is not None:
        cols.insert(0, F.col(group_col).alias("__grp"))
    lines = df.select(*cols).select(
        *([F.col("__grp")] if group_col is not None else []),
        "id",
        "pos",
        _norm(F.col("__l"), normalize).alias("line"),
    )
    if group_col is not None:
        rep_keys = rep.select(
            F.col(group_col).alias("__grp"), "line"
        )
        join_on = ["__grp", "line"]
    else:
        rep_keys = rep.select("line")
        join_on = ["line"]
    drops = (
        lines.where(F.col("line") != "")
        .join(rep_keys, join_on)
        .groupBy("id")
        .agg(F.collect_list("pos").alias("__drops"))
        .withColumnRenamed("id", "__did")
    )
    joined = df.join(
        F.broadcast(drops), df[id_col] == F.col("__did"), "left"
    )
    dp = F.coalesce(F.col("__drops"), F.expr("cast(array() as array<int>)"))
    split = F.split(F.col(text_col), "\n")
    kept = F.filter(split, lambda line, i: ~F.array_contains(dp, i))
    clean = F.when(
        F.col(text_col).isNotNull(), F.array_join(kept, "\n")
    )
    removed = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(split) - F.size(kept)
    )
    return joined.select(
        F.col(id_col),
        clean.alias(out_text_col),
        removed.cast("long").alias("n_removed_lines"),
    )


# --------------------------------------------------------------------------
# Paragraph-block dedup (round 13): the CCNet recipe one granularity up.
# Lines catch single-line boilerplate; real page furniture (cookie
# banners, footers, nav blocks) spans SEVERAL lines that repeat as a
# unit — the published paragraph variant dedups on blank-line-delimited
# blocks. Frozen spec: paragraphs split on the regex \n\s*\n (a blank
# line, possibly whitespace-bearing, possibly several), the match key is
# the whitespace-COLLAPSED trimmed (and by default lowercased) block —
# indentation and internal line-wrapping variants of the same banner
# dedup together — and survivors rejoin with a canonical "\n\n" (the
# original separator run is not preserved; documented).
# --------------------------------------------------------------------------

_PARA_SPLIT = r"\n\s*\n"


def _pnorm(par: Column, normalize: bool) -> Column:
    if not normalize:
        return F.trim(par)
    return F.lower(F.trim(F.regexp_replace(par, r"\s+", " ")))


def repeated_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """``(paragraph, n_docs)`` — every normalized non-blank paragraph
    block appearing in more than ``max_docs`` distinct documents: the
    multi-line boilerplate census (:func:`repeated_lines` one
    granularity up). Same plan shape: map-side explode + one
    partial-aggregated distinct-count keyed by the normalized block."""
    paras = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), _PARA_SPLIT)).alias("__p"),
    ).select("id", _pnorm(F.col("__p"), normalize).alias("paragraph"))
    return (
        paras.where(F.col("paragraph") != "")
        .groupBy("paragraph")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") > max_docs)
    )


def drop_repeated_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int = 1,
    normalize: bool = True,
    out_text_col: str = "clean_text",
) -> DataFrame:
    """The cleaned corpus at PARAGRAPH granularity: ``(id_col,
    out_text_col, n_removed_paragraphs)`` with every cross-document
    repeated block cut and the survivors rejoined with ``\\n\\n``.
    Clean documents pass through with ``n_removed_paragraphs = 0``;
    NULL text stays NULL. Same scale shape as
    :func:`drop_repeated_lines`: drop decisions come back as one
    bounded position list per AFFECTED document (broadcast), the cut is
    a pure codegen index filter, and the corpus payload never
    shuffles."""
    rep = repeated_paragraphs(df, id_col, text_col, max_docs, normalize)
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), _PARA_SPLIT)).alias(
            "pos", "__p"
        ),
    ).select("id", "pos", _pnorm(F.col("__p"), normalize).alias("paragraph"))
    drops = (
        paras.where(F.col("paragraph") != "")
        .join(rep.select("paragraph"), "paragraph")
        .groupBy("id")
        .agg(F.collect_list("pos").alias("__drops"))
        .withColumnRenamed("id", "__did")
    )
    joined = df.join(
        F.broadcast(drops), df[id_col] == F.col("__did"), "left"
    )
    dp = F.coalesce(F.col("__drops"), F.expr("cast(array() as array<int>)"))
    split = F.split(F.col(text_col), _PARA_SPLIT)
    kept = F.filter(split, lambda par, i: ~F.array_contains(dp, i))
    clean = F.when(
        F.col(text_col).isNotNull(), F.array_join(kept, "\n\n")
    )
    removed = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(split) - F.size(kept)
    )
    return joined.select(
        F.col(id_col),
        clean.alias(out_text_col),
        removed.cast("long").alias("n_removed_paragraphs"),
    )


def _pnorm_sql(expr: str, normalize: bool) -> str:
    if not normalize:
        return f"trim({expr})"
    return f"lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g')))"


def drop_repeated_paragraphs_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    max_docs: int = 1,
    normalize: bool = True,
    out_id: str = "id",
    out_text_col: str = "clean_text",
) -> str:
    """DuckDB twin of :func:`drop_repeated_paragraphs` — same regex
    split, same whitespace-collapsed key (DuckDB ``regexp_replace``
    needs the explicit ``'g'`` flag where Spark replaces globally by
    default), same blank exemption and index filter (1-based lambda,
    0-based positions), same ``\\n\\n`` rejoin with the empty-list
    NULL coalesce."""
    sep = "chr(10) || chr(10)"
    split = f"regexp_split_to_array(c.txt, '{_PARA_SPLIT}')"
    keep = (
        f"list_filter({split}, (x, i) -> "
        "NOT list_contains(coalesce(d.drops, CAST([] AS BIGINT[])), "
        "i - 1))"
    )
    return f"""
WITH corpus_base AS (
  SELECT {id_expr} AS id, {text_expr} AS txt FROM {relation}
),
paras AS (
  SELECT id, i - 1 AS pos,
         {_pnorm_sql(
             f"regexp_split_to_array(txt, '{_PARA_SPLIT}')[i]", normalize
         )} AS paragraph
  FROM corpus_base,
       unnest(range(1, len(regexp_split_to_array(txt, '{_PARA_SPLIT}'))
                       + 1)) AS r(i)
),
rep AS (
  SELECT paragraph FROM (
    SELECT paragraph, count(DISTINCT id) AS n_docs
    FROM paras WHERE paragraph <> '' GROUP BY paragraph
  ) WHERE n_docs > {int(max_docs)}
),
drops AS (
  SELECT id, list(pos) AS drops
  FROM paras JOIN rep USING (paragraph)
  WHERE paragraph <> ''
  GROUP BY id
)
SELECT c.id AS {out_id},
       CASE WHEN c.txt IS NOT NULL
            THEN coalesce(array_to_string({keep}, {sep}), '')
       END AS {out_text_col},
       CAST(CASE WHEN c.txt IS NULL THEN 0
                 ELSE len(regexp_split_to_array(c.txt, '{_PARA_SPLIT}'))
                      - len({keep})
            END AS BIGINT) AS n_removed_paragraphs
FROM corpus_base c LEFT JOIN drops d ON c.id = d.id
"""


def _norm_sql(expr: str, normalize: bool) -> str:
    return f"lower(trim({expr}))" if normalize else f"trim({expr})"


def drop_repeated_lines_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    max_docs: int = 1,
    normalize: bool = True,
    out_id: str = "id",
    out_text_col: str = "clean_text",
    group_expr: str | None = None,
) -> str:
    """DuckDB twin of :func:`drop_repeated_lines` — same split, same
    normalization key, same blank-line exemption, same index filter
    (DuckDB lambda indexes are 1-based; the drop positions are 0-based,
    hence ``i - 1``; ``array_to_string([])`` is NULL in DuckDB where
    Spark's ``array_join([])`` is ``''``, so the fully-cut document
    coalesces to the empty string). ``group_expr`` mirrors
    ``group_col``: the census and the drop join key on
    ``(grp, line)``."""
    nl = "chr(10)"
    key = _norm_sql("l", normalize)
    keep = (
        "list_filter(string_split(c.txt, " + nl + "), (x, i) -> "
        "NOT list_contains(coalesce(d.drops, CAST([] AS BIGINT[])), "
        "i - 1))"
    )
    grp_sel = f"{group_expr} AS grp, " if group_expr is not None else ""
    grp_fwd = "grp, " if group_expr is not None else ""
    join_keys = "(grp, line)" if group_expr is not None else "(line)"
    return f"""
WITH corpus_base AS (
  SELECT {grp_sel}{id_expr} AS id, {text_expr} AS txt FROM {relation}
),
lines AS (
  SELECT {grp_fwd}id, i - 1 AS pos,
         {_norm_sql(f"string_split(txt, {nl})[i]", normalize)} AS line
  FROM corpus_base,
       unnest(range(1, len(string_split(txt, {nl})) + 1)) AS r(i)
),
rep AS (
  SELECT {grp_fwd}line FROM (
    SELECT {grp_fwd}line, count(DISTINCT id) AS n_docs
    FROM lines WHERE line <> '' GROUP BY {grp_fwd}line
  ) WHERE n_docs > {int(max_docs)}
),
drops AS (
  SELECT id, list(pos) AS drops
  FROM lines JOIN rep USING {join_keys}
  WHERE line <> ''
  GROUP BY id
)
SELECT c.id AS {out_id},
       CASE WHEN c.txt IS NOT NULL
            THEN coalesce(array_to_string({keep}, {nl}), '')
       END AS {out_text_col},
       CAST(CASE WHEN c.txt IS NULL THEN 0
                 ELSE len(string_split(c.txt, {nl})) - len({keep})
            END AS BIGINT) AS n_removed_lines
FROM corpus_base c LEFT JOIN drops d ON c.id = d.id
"""
