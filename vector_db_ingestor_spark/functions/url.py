"""URL column expressions for crawl curation — host extraction,
canonical normalization, and domain-blocklist filtering.

Web-scale pipelines (CCNet / RefinedWeb / FineWeb lineage) gate
documents on their URL before any content signal is computed: drop
blocklisted domains, dedup by canonical URL (the cheapest dedup pass —
mirrors and trackers produce the same page under many URLs), stratify
by host.  All expressions here are JVM-side (``parse_url`` +
regexp/string builtins — zero Python), so they ride the scan like
every other filter.

Blocklist scale guidance: ``is_blocked_host`` embeds the list as an
array literal with an ``exists`` suffix-match — right for the
O(10^2-10^4) curated lists that dominate practice (one narrow
expression, no join).  For the O(10^6)+ lists, use
:func:`anti_join_blocklist`: a broadcast anti-join on the registrable
domain, one broadcast + no shuffle of the corpus side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Lowercased hostname of a URL (``try_parse_url(..., 'HOST')`` —
    the try_ variant because crawl URL columns always contain junk and
    ANSI ``parse_url`` raises on it); null for unparseable values."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_normalize(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host, strip
    the fragment, drop tracking query parameters (``utm_*``, ``fbclid``,
    ``gclid``, ``ref``), strip a trailing ``/`` from the path, and drop
    a now-empty ``?``.  Two URLs that differ only in tracking noise or
    case of the host compare equal; real path/query differences are
    preserved."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), r"/$", ""
    )
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    # drop tracking params, then tidy separators left behind
    query = F.regexp_replace(
        query, r"(^|&)(utm_[^=&]*|fbclid|gclid|ref)=[^&]*", "$1"
    )
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def registrable_domain(host: Column) -> Column:
    """Last two labels of a hostname (``example.com`` for
    ``a.b.example.com``) — the practical blocklist join key.  A real
    public-suffix list would special-case ``co.uk``-style suffixes;
    two labels is the standard approximation when the PSL isn't
    shipped, and blocklists are published at this granularity."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def is_blocked_host(host: Column, blocked: list[str]) -> Column:
    """True when ``host`` equals a blocked domain or is a subdomain of
    one.  ``blocked`` enters as an array literal and the test is one
    ``exists`` lambda — a narrow expression for curated-size lists
    (use :func:`anti_join_blocklist` for millions of entries)."""
    blocked_lit = F.lit([b.lower() for b in blocked])
    return F.exists(
        blocked_lit,
        lambda b: (host == b) | host.endswith(F.concat(F.lit("."), b)),
    )


def anti_join_blocklist(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose URL's registrable domain appears in
    ``blocklist`` (a one-column ``domain`` DataFrame).  The blocklist
    side is broadcast (even 10^7 domains are ~100s of MB — executor
    memory, not a corpus shuffle) and the corpus side is filtered in
    place: left_anti, no shuffle, no row widening."""
    keyed = df.withColumn(
        "__rdom", registrable_domain(url_host(F.col(url_col)))
    )
    bl = blocklist.select(F.lower(F.col("domain")).alias("__rdom")).distinct()
    return keyed.join(F.broadcast(bl), "__rdom", "left_anti").drop("__rdom")
