"""Text-analysis column expressions for training-data pipelines.

Extensions beyond the reference (BASELINE.json north-star): language id,
quality scoring, token counting, document fingerprinting. All are pure
Spark SQL expressions — whole-stage codegen, no Python boundary — and each
has a DuckDB-identical SQL twin for the oracle gate.

Design for 100 TB: every function is a per-row map over the text column;
no shuffle, no UDF. regexp/token work happens inside codegen. The only
cross-engine hazards are regex dialects (kept to class escapes both engines
share) and hash functions (md5-based, portable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- token counting -------------------------------------------------------


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def token_count_sql(expr: str) -> str:
    return f"len(regexp_split_to_array(trim({expr}), '\\s+'))"


#: GPT-2-style pre-tokenizer approximation: letter runs are one token,
#: digits tokenize individually (BPE splits numbers), every other
#: non-space character stands alone. Counting these matches estimates the
#: subword token count without a merges table — a deterministic, portable
#: upper bound used for sequence-length budgeting.
_BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count estimate (regex pre-tokenization, no merges)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_ISH_PATTERN), F.lit(0)))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{_BPE_ISH_PATTERN}'))"


def word_chars(col: Column) -> Column:
    """Count of alphabetic characters."""
    return F.length(F.regexp_replace(col, "[^A-Za-z]", ""))


def word_chars_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))


def punct_count_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^.,;:!?]', '', 'g'))"


# --- quality score --------------------------------------------------------

#: tiny built-in stopword sets per language for heuristic scoring
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "you", "that", "it"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "en"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "im", "ein"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una", "es"),
}


def stopword_count(col: Column, lang: str = "en") -> Column:
    """Count of stopword tokens (exact token match after lowercasing)."""
    words = STOPWORDS[lang]
    tokens = F.split(F.lower(col), r"\s+")
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def stopword_count_sql(expr: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(lower({expr}), '\\s+'), "
        f"t -> t IN ({words})))"
    )


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: blend of word-char ratio, stopword ratio
    and a length factor. Deterministic arithmetic, portable."""
    n_chars = F.length(col)
    n_tokens = token_count(col)
    wc_ratio = word_chars(col).cast("double") / F.greatest(n_chars, F.lit(1))
    sw_ratio = stopword_count(col).cast("double") / F.greatest(n_tokens, F.lit(1))
    length_factor = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        wc_ratio * 0.5 + F.least(sw_ratio * F.lit(2.0), F.lit(1.0)) * 0.3
        + length_factor * 0.2,
        6,
    )


def quality_score_sql(expr: str) -> str:
    wc = word_chars_sql(expr)
    tc = token_count_sql(expr)
    sw = stopword_count_sql(expr)
    return (
        f"round(({wc} * 1.0 / greatest(length({expr}), 1)) * 0.5 "
        f"+ least(({sw} * 1.0 / greatest({tc}, 1)) * 2.0, 1.0) * 0.3 "
        f"+ least(length({expr}) / 500.0, 1.0) * 0.2, 6)"
    )


# --- language id ----------------------------------------------------------


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_count(col, lang) for lang in STOPWORDS}


def lang_id(col: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no
    language scores above zero. Ties break by language-code order
    (deterministic, and identical in the SQL twin)."""
    scores = lang_scores(col)
    langs = sorted(STOPWORDS)  # deterministic tie order
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best


def lang_id_sql(expr: str) -> str:
    langs = sorted(STOPWORDS)
    sql = "'und'"
    score_sql = "0"
    for lang in langs:
        s = stopword_count_sql(expr, lang)
        sql = f"CASE WHEN {s} > {score_sql} THEN '{lang}' ELSE {sql} END"
        score_sql = f"CASE WHEN {s} > {score_sql} THEN {s} ELSE {score_sql} END"
    return sql


# --- repetition signals (Gopher-style quality rules) ----------------------


def distinct_token_ratio(col: Column) -> Column:
    """|distinct tokens| / |tokens| in [0,1] — low values flag the
    mass-repetition documents the Gopher quality rules drop. Pure
    expression (array_distinct), zero shuffle."""
    tokens = F.split(F.trim(F.lower(col)), r"\s+")
    return F.round(
        F.size(F.array_distinct(tokens)).cast("double")
        / F.greatest(F.size(tokens), F.lit(1)),
        6,
    )


def distinct_token_ratio_sql(expr: str) -> str:
    toks = f"regexp_split_to_array(trim(lower({expr})), '\\s+')"
    return (
        f"round(len(list_distinct({toks})) * 1.0 / greatest(len({toks}), 1), 6)"
    )


# --- fingerprinting -------------------------------------------------------


def token_hash_expr(token: Column, salt: int = 0) -> Column:
    """Portable 32-bit integer hash of a token (md5-prefix based)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), token)), 1, 8), 16, 10
    ).cast("bigint")


def token_hash_sql(token_expr: str, salt: int = 0) -> str:
    return f"CAST(('0x' || substring(md5('{salt}:' || {token_expr}), 1, 8)) AS BIGINT)"


def doc_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens, mod 2^31-1.

    h = fold(tokens, 0, (acc, t) -> (acc * 31 + hash32(t)) % 2147483647).
    Pure expression (transform + aggregate); DuckDB twin uses
    list_reduce(list_transform(...)). Detects exact token-sequence dups
    without shuffling full text."""
    tokens = F.split(F.trim(col), r"\s+")
    hashed = F.transform(tokens, lambda t: token_hash_expr(t))
    return F.aggregate(
        hashed,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % F.lit(2147483647),
    )


def doc_fingerprint_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_split_to_array(trim({expr}), '\\s+'), "
        f"t -> {token_hash_sql('t')})), "
        f"(acc, h) -> (acc * 31 + h) % 2147483647)"
    )


# --------------------------------------------------------------------------
# PII redaction (curation-pipeline scrubbing pass)
# --------------------------------------------------------------------------

#: (tag, pattern) in application order — earlier rules run first so e.g.
#: SSNs are tagged before the phone rule could claim their digits. The
#: patterns stay inside the Java-regex ∩ RE2 common subset (no lookaround,
#: no backrefs) so the Spark column and the DuckDB oracle use the SAME
#: strings; the oracle gate then certifies both engines replace the same
#: spans. Conservative by design: false negatives over mangled text.
PII_RULES = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("IPV4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("CARD", r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b"),
    ("PHONE", r"\+?[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}[ -]?[0-9]{0,4}\b"),
]


def redact_pii(col: Column, tags: bool = True) -> Column:
    """Replace email / SSN / IPv4 / card-number / phone spans with
    ``[TAG]`` markers (or ``[PII]`` when ``tags=False``).

    A chain of ``regexp_replace`` expressions — pure codegen, zero Python,
    fuses into the scan like every other text function here. Rules apply
    in ``PII_RULES`` order on the running result, mirroring
    ``redact_pii_sql`` exactly.
    """
    out = col
    for tag, pattern in PII_RULES:
        out = F.regexp_replace(out, pattern, f"[{tag}]" if tags else "[PII]")
    return out


def redact_pii_sql(expr: str, tags: bool = True) -> str:
    """DuckDB twin of ``redact_pii`` (same patterns, same order, 'g' flag)."""
    out = expr
    for tag, pattern in PII_RULES:
        repl = f"[{tag}]" if tags else "[PII]"
        sql_pattern = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pattern}', '{repl}', 'g')"
    return out
