"""Gopher-style quality-rule audit for document corpora.

``functions/text.quality_score`` blends signals into one scalar; real
curation pipelines ALSO need the rule-by-rule view (Gopher / Falcon-
RefinedWeb / C4 publish their filters as individual predicates with
per-rule removal rates — public literature): which rule fires how
often, so thresholds can be tuned and a corpus change shows up as a
per-rule delta, not an opaque score drift.

Every rule here is an INTEGER comparison — ratios are cross-multiplied
(``10 * n_symbols > n_chars`` instead of ``n_symbols / n_chars >
0.1``), so the per-doc flags involve zero floating arithmetic and the
cross-engine contract is exact by construction; the only float in the
module is the final ``n_fail / n_docs`` rate, one division + one round.

Scale shape: the flags are pure map expressions fused into the scan
(regex counts + compares, whole-stage codegen); the report is ONE
partial-aggregated combine to a single row, unpivoted driver-side-free
via ``stack`` — nothing shuffles but one row of counters. At 100 TB
this is a single pass, the cheapest possible audit shape.

Reference parity: criteo/ml-hadoop-experiment has no text-quality
surface (SURVEY.md §2) — north-star extension for curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    stopword_count,
    stopword_count_sql,
    token_count,
    token_count_sql,
    word_chars,
    word_chars_sql,
)

#: thresholds, named so the Spark flags and the SQL twin can never
#: disagree on a constant
MIN_WORDS = 5
MAX_WORDS = 10_000
MIN_MEAN_WORD_LEN = 3  # word_chars < 3 * n_words
MAX_MEAN_WORD_LEN = 10  # word_chars > 10 * n_words
SYMBOL_RATIO_DENOM = 10  # symbols/chars > 1/10
DIGIT_RATIO_DENOM = 5  # digits/chars > 1/5
MIN_STOPWORDS = 2


def _counts(col: Column) -> dict[str, Column]:
    return {
        "n_words": token_count(col),
        "n_chars": F.length(col),
        "word_chars": word_chars(col),
        "n_digits": F.length(F.regexp_replace(col, "[^0-9]", "")),
        # whitespace spelled explicitly: Java's \s includes \x0B, RE2's
        # (DuckDB oracle) does not — one shared character set or the two
        # engines disagree on text containing a vertical tab
        "n_symbols": F.length(
            F.regexp_replace(col, r"[A-Za-z0-9 \t\n\x0B\f\r]", "")
        ),
        "n_stop": stopword_count(col),
    }


def quality_rule_flags(col: Column) -> dict[str, Column]:
    """Ordered {rule_name: fail_flag} booleans for one text column —
    all integer compares over regex counts (see module docstring).
    NULL text fails every rule (a null doc is not a keepable doc)."""
    c = _counts(col)
    flags = {
        "too_few_words": c["n_words"] < MIN_WORDS,
        "too_many_words": c["n_words"] > MAX_WORDS,
        "mean_word_len_out": (
            (c["word_chars"] < MIN_MEAN_WORD_LEN * c["n_words"])
            | (c["word_chars"] > MAX_MEAN_WORD_LEN * c["n_words"])
        ),
        "high_symbol_ratio": SYMBOL_RATIO_DENOM * c["n_symbols"] > c["n_chars"],
        "high_digit_ratio": DIGIT_RATIO_DENOM * c["n_digits"] > c["n_chars"],
        "low_stopword_signal": c["n_stop"] < MIN_STOPWORDS,
    }
    return {
        name: F.coalesce(flag, F.lit(True)) for name, flag in flags.items()
    }


def apply_quality_rules(
    df: DataFrame, text_col: str, keep_col: str = "rules_pass"
) -> DataFrame:
    """``df`` plus one boolean column per rule (``rule_<name>``, True =
    FAILED) and ``keep_col`` (True = passed every rule) — the row-level
    form a filter step consumes. Pure map, fuses into the scan."""
    flags = quality_rule_flags(F.col(text_col))
    out = df
    fail_any = F.lit(False)
    for name, flag in flags.items():
        out = out.withColumn(f"rule_{name}", flag)
        fail_any = fail_any | flag
    return out.withColumn(keep_col, ~fail_any)


def quality_rules_report(
    df: DataFrame, text_col: str, round_digits: int = 6
) -> DataFrame:
    """Per-rule removal-rate report ``(rule, n_fail, frac_fail)`` plus
    an ``any_rule`` row (docs failing at least one) — the
    threshold-tuning view. One map-side scan, one single-row combine,
    ``stack`` unpivot; ``frac_fail`` is the module's only float."""
    flags = quality_rule_flags(F.col(text_col))
    aggs = [
        F.sum(flag.cast("long")).alias(name) for name, flag in flags.items()
    ]
    fail_any = None
    for flag in flags.values():
        fail_any = flag if fail_any is None else (fail_any | flag)
    aggs.append(F.sum(fail_any.cast("long")).alias("any_rule"))
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs)
    names = list(flags) + ["any_rule"]
    stack_args = ", ".join(f"'{n}', {n}" for n in names)
    return row.select(
        F.expr(f"stack({len(names)}, {stack_args}) as (rule, n_fail)"),
        F.col("__n"),
    ).select(
        "rule",
        "n_fail",
        F.round(
            F.col("n_fail").cast("double") / F.col("__n"), round_digits
        ).alias("frac_fail"),
    )


def _flags_sql(expr: str) -> dict[str, str]:
    nw = token_count_sql(expr)
    wc = word_chars_sql(expr)
    nd = f"length(regexp_replace({expr}, '[^0-9]', '', 'g'))"
    # same explicit whitespace set as quality_rule_flags (Java \s vs RE2 \s)
    ns = (
        f"length(regexp_replace({expr},"
        " '[A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g'))"
    )
    st = stopword_count_sql(expr)
    flags = {
        "too_few_words": f"{nw} < {MIN_WORDS}",
        "too_many_words": f"{nw} > {MAX_WORDS}",
        "mean_word_len_out": (
            f"({wc} < {MIN_MEAN_WORD_LEN} * {nw}"
            f" OR {wc} > {MAX_MEAN_WORD_LEN} * {nw})"
        ),
        "high_symbol_ratio": f"{SYMBOL_RATIO_DENOM} * {ns} > length({expr})",
        "high_digit_ratio": f"{DIGIT_RATIO_DENOM} * {nd} > length({expr})",
        "low_stopword_signal": f"{st} < {MIN_STOPWORDS}",
    }
    return {
        name: f"coalesce({pred}, TRUE)" for name, pred in flags.items()
    }


def quality_rules_report_sql(
    relation: str, text_expr: str, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`quality_rules_report` (same integer
    predicates, same single division and rounding, same row set)."""
    flags = _flags_sql(text_expr)
    names = list(flags)
    flag_cols = ",\n         ".join(
        f"CAST({pred} AS INT) AS {name}" for name, pred in flags.items()
    )
    any_expr = " OR ".join(f"{name} = 1" for name in names)
    sums = ", ".join(f"sum({name}) AS {name}" for name in names)
    # CAST: DuckDB's sum(INT) is HUGEINT, which pandas renders as float
    # and the driver's dtype gate rejects against Spark's BIGINT
    rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST({name} AS BIGINT) AS n_fail,"
        f" round(CAST({name} AS DOUBLE) / n, {round_digits}) AS frac_fail"
        f" FROM agg"
        for name in names + ["any_rule"]
    )
    return f"""
WITH flags0 AS (
  SELECT {flag_cols}
  FROM {relation}
),
flags AS (
  SELECT flags0.*, CAST(({any_expr}) AS INT) AS any_rule FROM flags0
),
agg AS (
  SELECT {sums}, sum(any_rule) AS any_rule, count(*) AS n FROM flags
)
{rows}
"""
