"""URL-level dedup — the crawl pipeline's standard first pass.

Lives in its own module (not ``dedup.py``) deliberately — the
``bpe.py`` precedent: ``dedup.py`` is the import hub for the
MinHash/SimHash/token families, and adding an operator there would
re-fingerprint ~20 verified queries' import closures. This module
composes :mod:`..functions.url`'s canonicalizer with
:func:`~.dedup.dedup_exact`'s digest machinery without touching
either.

Reference parity: criteo/ml-hadoop-experiment has no URL surface
(SURVEY.md §2) — north-star extension for crawl curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact


def dedup_by_url(
    df: DataFrame,
    id_col: str,
    url_col: str,
    out_col: str = "canonical_url",
) -> DataFrame:
    """URL-level dedup — the crawl pipeline's standard FIRST pass
    (CCNet / RefinedWeb order: URL dedup before any content is fetched
    or compared): canonicalize ``url_col``
    (:func:`~..functions.url.canonicalize_url` — scheme/host case,
    ``www.``, default ports, fragments, tracking params, param order,
    trailing slashes) and keep one representative row (lowest
    ``id_col``) per canonical URL, via the :func:`dedup_exact` digest
    machinery. The surviving rows carry the canonical form in
    ``out_col``.

    At 100 TB: canonicalization is a map-only expression; the single
    shuffle is ``dedup_exact``'s, keyed on the 16-byte digest of the
    canonical URL — never on page payloads.
    """
    from ml_hadoop_experiment_spark.functions.url import canonicalize_url

    with_canon = df.withColumn(out_col, canonicalize_url(F.col(url_col)))
    return dedup_exact(with_canon, [out_col], id_col)
