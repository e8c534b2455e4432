"""BPE-style regex pretokenization counts.

`functions/text.token_count` counts WHITESPACE tokens — the unit the
quality rules and packing operators price in. Subword tokenizers
don't see whitespace tokens: their input is the PRETOKEN stream a
GPT-2-style regex produces (contractions split off, letter runs,
digit runs, punctuation runs — public knowledge from the GPT-2 BPE
description), and budgeting/fertility questions ("how many BPE units
will this doc cost per word?") need that count, not the whitespace
one.

The pattern here is the lookahead-free core of the GPT-2 pretokenizer:
``'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s']+``
(contraction suffixes, letter runs, digit runs, symbol runs;
whitespace separates and is not emitted). Faithful GPT-2 uses
lookaheads and unicode categories, which RE2 — the DuckDB oracle's
regex engine — does not support; this core keeps the two engines on
ONE pattern with identical semantics, and the simplification is part
of the declared contract. ASCII classes are spelled explicitly for
the same reason (Java vs RE2 ``\\w``/``\\s`` differences — the
`operators/rules.py` precedent).

Everything is a pure JVM-side expression (``regexp_extract_all`` +
``size``): map-only, zero shuffle, fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the shared lookahead-free pretokenizer pattern (one copy; both
#: engines compile it verbatim)
PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"


def pretokens(col: Column) -> Column:
    """``array<string>`` of BPE-style pretokens of ``col`` (NULL text
    -> NULL, matching regexp_extract_all)."""
    return F.regexp_extract_all(col, F.lit(PRETOKEN_PATTERN), F.lit(0))


def pretoken_count(col: Column) -> Column:
    """Number of pretokens; 0 for NULL/empty text (coalesced so the
    count is usable in arithmetic without null-propagation
    surprises)."""
    return F.coalesce(F.size(pretokens(col)), F.lit(0)).cast("long")


def pretoken_count_sql(expr: str) -> str:
    """DuckDB twin of :func:`pretoken_count` (same pattern verbatim —
    it is lookahead-free and class-explicit precisely so RE2 and Java
    agree)."""
    # DuckDB single-quoted literals take backslashes verbatim; only
    # the pattern's own quotes need SQL doubling
    pat = PRETOKEN_PATTERN.replace("'", "''")
    return (
        f"CAST(coalesce(len(regexp_extract_all({expr},"
        f" '{pat}')), 0) AS BIGINT)"
    )
