"""Compression-based text quality signals (Arrow-batched Python path).

The one quality heuristic in this repo that genuinely cannot be a
Catalyst expression: ``compression_ratio`` runs zlib-deflate over each
document and reports bytes-out / bytes-in. Highly repetitive
boilerplate (nav bars, templated spam, repeated paragraphs) compresses
far below normal prose; high-entropy noise (OCR garbage, binary
spills, random strings) approaches or exceeds 1.0 — so both tails of
the ratio distribution are removal candidates. This is the
Gopher/RefinedWeb-class "compression filter" (public literature), the
complement of the statistical signals in ``functions/text.py``
(stopword/punct ratios) and ``operators/corpus.py`` (rare-token ratio,
unigram cross-entropy), which stay JVM-side.

Engine shape: a scalar Pandas UDF — Arrow-batched column transfer,
zlib's C deflate per value, never row-at-a-time Python
(``BatchEvalPython``); asserted in tests. Deterministic for a fixed
zlib version and level (single-shot ``zlib.compress`` has no
concurrency or chunking nondeterminism). There is no cross-engine
oracle (DuckDB exposes no deflate), so this operator is golden-tested
rather than oracle-gated — the documented exception class, kept OUT of
the declared query set so the every-query-has-an-oracle invariant
stands.

Reference parity: no counterpart in criteo/ml-hadoop-experiment;
north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def compression_ratio(
    df: DataFrame,
    text_col: str,
    out_col: str = "compression_ratio",
    level: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Adds ``out_col`` = ``round(len(deflate(utf8(text), level)) /
    len(utf8(text)), 6)`` per row.

    NULL text → NULL ratio; empty text → NULL as well (a 0-byte input
    has no meaningful ratio and dividing by its length is undefined) —
    both documented rather than coerced, so filters must decide the
    missing-text policy explicitly. Ratios can exceed 1.0 for very
    short or incompressible inputs (deflate framing overhead); that is
    the signal working, not an error.
    """
    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be in [0, 9], got {level}")

    @pandas_udf("double")
    def _ratio(texts):
        import zlib

        import pandas as pd

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), round_digits)

        return pd.Series([one(t) for t in texts], dtype="float64")

    return df.withColumn(out_col, _ratio(F.col(text_col)))
