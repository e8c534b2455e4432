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


#: Frozen multi-part effective-TLD suffixes (a common subset of the
#: publicsuffix.org Public Suffix List — public knowledge; NOT the full
#: list: production swaps in a full PSL snapshot via the
#: ``multi_part_suffixes`` parameter). A host's registered domain is its
#: last TWO labels unless those two labels are one of these, in which
#: case it is the last THREE.
MULTI_PART_SUFFIXES: tuple = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.tw", "org.tw", "com.sg", "org.sg", "com.hk", "org.hk",
    "co.za", "org.za", "ac.za", "gov.za",
    "com.ar", "com.tr", "com.sa", "com.eg", "com.my", "com.ph",
    "com.vn", "com.pk", "com.bd", "com.co", "com.pe", "com.ve",
    "co.th", "ac.th", "go.th", "co.id", "or.id", "ac.id",
    "com.ua", "gov.ua", "com.pl",
)

_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def url_host(url: Column) -> Column:
    """Lowercased host of a scheme-bearing URL: the authority with any
    ``user:pass@`` userinfo and any ``:port`` suffix stripped (the
    ``www.`` prefix is KEPT — this is the raw host for per-host crawl
    stats; :func:`canonicalize_url` owns the www-stripping dedup key).
    Non-URL inputs (no ``scheme://``) and NULL yield NULL. Pure
    codegen — map-only at any scale."""
    u = F.trim(url)
    auth = F.lower(F.regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(auth, "^[^@]*@", ""), ":[0-9]*$", ""
    )
    return F.when(u.rlike(_SCHEME_RE), host)


def registered_domain(
    host: Column,
    multi_part_suffixes: Sequence[str] = MULTI_PART_SUFFIXES,
) -> Column:
    """Registrable domain of a lowercased ``host`` (from
    :func:`url_host`): the last two labels, or the last three when the
    last two form a frozen multi-part suffix (``co.uk`` family —
    :data:`MULTI_PART_SUFFIXES`). IPv4 literals and hosts with fewer
    than two labels pass through unchanged. Pure codegen: two anchored
    regexp extractions + one IN — no UDF, no shuffle.

    This is the domain-level rollup key of crawl curation (per-domain
    doc counts, blocklists, CCNet-style per-domain boilerplate
    grouping)."""
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    suffixes = [s.lower() for s in multi_part_suffixes]
    return (
        F.when(host.rlike(_IPV4_RE), host)
        .when((last3 != "") & last2.isin(suffixes), last3)
        .when(last2 != "", last2)
        .otherwise(host)
    )


def url_host_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_host` — same extraction spec, NULL for
    non-URL inputs via the same scheme test."""
    u = f"trim({expr})"
    auth = f"lower(regexp_extract({u}, '^[^:/?#]+://([^/?#]*)', 1))"
    host = (
        f"regexp_replace(regexp_replace({auth}, '^[^@]*@', ''),"
        " ':[0-9]*$', '')"
    )
    return (
        f"CASE WHEN regexp_matches({u}, '^[A-Za-z][A-Za-z0-9+.-]*://')"
        f" THEN {host} END"
    )


def registered_domain_sql(
    expr: str,
    multi_part_suffixes: Sequence[str] = MULTI_PART_SUFFIXES,
) -> str:
    """DuckDB twin of :func:`registered_domain` — same anchored
    extractions, same frozen suffix set, same IPv4 passthrough."""
    suffixes = ", ".join(f"'{s.lower()}'" for s in multi_part_suffixes)
    last2 = f"regexp_extract({expr}, '([^.]+\\.[^.]+)$', 1)"
    last3 = f"regexp_extract({expr}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return f"""CASE
 WHEN regexp_matches({expr}, '^\\d{{1,3}}(\\.\\d{{1,3}}){{3}}$') THEN {expr}
 WHEN {last3} <> '' AND {last2} IN ({suffixes}) THEN {last3}
 WHEN {last2} <> '' THEN {last2}
 ELSE {expr} END"""


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
