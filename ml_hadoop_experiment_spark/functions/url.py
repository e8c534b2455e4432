"""URL canonicalization — pure-codegen column expressions.

The standard first pass of every web-crawl pipeline (CCNet / RefinedWeb
publish the recipe): collapse the cosmetic variation crawlers see —
scheme/host case, ``www.`` prefixes, default ports, fragments, tracking
parameters, parameter order, trailing slashes — so URL-level dedup can
run on a canonical key BEFORE any content is fetched or compared.

Extension beyond the reference (BASELINE.json north-star): the reference
has no URL surface. Everything here is a Spark expression tree (regexp +
higher-order array functions, no UDF) with a DuckDB twin built from the
SAME frozen spec, so the canonicalization is oracle-checkable
bit-for-bit.

Frozen canonicalization spec (documented order; both engines):

1.  Trim surrounding whitespace.
2.  PASSTHROUGH: inputs without a ``scheme://`` prefix are returned
    trimmed but otherwise unchanged (they are not URLs we normalize;
    dedup still keys on the trimmed string).
3.  Strip the fragment (first ``#`` to end).
4.  Lowercase the scheme.
5.  Lowercase the authority; strip one leading ``www.``; strip the
    scheme's default port (``:80`` for http, ``:443`` for https).
6.  Strip ALL trailing ``/`` from the path (``http://h/`` == ``http://h``).
7.  Drop empty query params and tracking params (``utm_*`` prefix plus
    the frozen :data:`TRACKING_PARAMS` set, matched on the lowercased
    key); SORT the surviving ``k=v`` strings bytewise; rejoin with
    ``&``; drop the ``?`` entirely when nothing survives.
8.  No percent-decoding and no duplicate-slash collapsing inside the
    path (both alter semantics on some servers; documented non-goals).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Frozen default tracking-parameter keys (lowercased match), beyond the
#: ``utm_*`` prefix family. Google/Facebook/Microsoft/Yandex click ids,
#: Instagram share id, Mailchimp campaign ids, GA cross-domain linkers,
#: and the generic ``ref`` / ``ref_src`` referrer tags.
TRACKING_PARAMS: tuple = (
    "gclid",
    "fbclid",
    "msclkid",
    "yclid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "_ga",
    "_gl",
    "ref",
    "ref_src",
)

_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def canonicalize_url(
    url: Column,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of ``url`` per the module-level frozen spec.

    Pure codegen: regexp extraction for the scheme/authority/path/query
    split, ``filter``/``array_sort`` higher-order functions for the
    query params. NULL in, NULL out. At 100 TB this is a map-only
    expression — no shuffle, no Python.
    """
    u = F.trim(url)
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(nofrag, "^[^:/?#]+://([^/?#]*)", 1)
    )
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    rest = F.regexp_extract(nofrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    path = F.regexp_replace(
        F.regexp_extract(rest, "^([^?]*)", 1), "/+$", ""
    )
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    tracked = [t.lower() for t in tracking_params]

    def keep(p: Column) -> Column:
        key = F.lower(F.regexp_extract(p, "^([^=]*)", 1))
        return (
            (p != F.lit(""))
            & ~key.startswith("utm_")
            & ~key.isin(tracked)
        )

    params = F.array_sort(F.filter(F.split(query, "&"), keep))
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), auth, path, qpart)
    return F.when(u.rlike(_SCHEME_RE), canon).otherwise(u)


def canonicalize_url_sql(
    expr: str,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> str:
    """DuckDB twin of :func:`canonicalize_url` — the same frozen spec
    re-expressed in DuckDB regexp/list functions (independent engine,
    shared contract: the oracle gate passes only if both canonicalizers
    agree bit-for-bit)."""
    tracked = ", ".join(f"'{t.lower()}'" for t in tracking_params)
    u = f"trim({expr})"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    scheme = (
        f"lower(regexp_extract({nofrag},"
        " '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    )
    auth0 = (
        f"regexp_replace(lower(regexp_extract({nofrag},"
        " '^[^:/?#]+://([^/?#]*)', 1)), '^www\\.', '')"
    )
    auth = (
        f"CASE WHEN {scheme} = 'http'"
        f" THEN regexp_replace({auth0}, ':80$', '')"
        f" WHEN {scheme} = 'https'"
        f" THEN regexp_replace({auth0}, ':443$', '')"
        f" ELSE {auth0} END"
    )
    rest = f"regexp_extract({nofrag}, '^[^:/?#]+://[^/?#]*(.*)$', 1)"
    path = (
        f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1),"
        " '/+$', '')"
    )
    query = f"regexp_extract({rest}, '^[^?]*\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        " p -> p != ''"
        " AND NOT starts_with(lower(regexp_extract(p, '^([^=]*)', 1)),"
        " 'utm_')"
        f" AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN"
        f" ({tracked})))"
    )
    qpart = (
        f"CASE WHEN len({params}) > 0"
        f" THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    canon = f"{scheme} || '://' || {auth} || {path} || {qpart}"
    return (
        f"CASE WHEN regexp_matches({u},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://')"
        f" THEN {canon} ELSE {u} END"
    )
