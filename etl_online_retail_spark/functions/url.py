"""URL canonicalization — the crawl-dedup key.

A crawl sees the same page under many spellings: scheme/host case,
explicit default ports, tracking query parameters, parameter order,
fragments, trailing slashes. Deduplicating by CANONICAL URL before any
content dedup is the standard first pass (CCNet, RefinedWeb); at crawl
scale it removes the bulk of exact re-fetches for the cost of one
map-side string pipeline.

Everything here is pure Column algebra — regexp extraction, higher-order
array functions — so the canonicalizer runs JVM-side inside whole-stage
codegen (no Python in the hot path), and every step has a DuckDB SQL
twin built from the same constants so the oracle can never drift.

Canonical form:
  - scheme and host lowercased
  - explicit default port stripped (:80 for http, :443 for https)
  - fragment dropped
  - tracking parameters dropped (utm_*, fbclid, gclid)
  - remaining query parameters sorted bytewise
  - trailing path slashes stripped ("/a/" == "/a"; the root path
    collapses to the empty path, i.e. "http://h/" == "http://h")

HOF discipline (PERFORMANCE.md rule 7): the filter lambda references
only its own argument — the tracking-prefix tests are inlined literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one regex, four capture groups: scheme://hostport path ?query
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"

TRACKING_PREFIX = "utm_"
TRACKING_EXACT = ("fbclid", "gclid")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonical_url(col: Column | str) -> Column:
    u = _col(col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.when(scheme == "http",
                  F.regexp_replace(hostport, ":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", "")) \
            .otherwise(hostport)
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/+$", "")
    rawq = F.regexp_extract(u, _URL_RE, 4)
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (~F.startswith(p, F.lit(TRACKING_PREFIX)))
        & (p != "")
        & (~F.split(p, "=").getItem(0).isin(*TRACKING_EXACT)))
    query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)))


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of canonical_url, same constants and steps."""
    scheme = f"lower(regexp_extract({expr}, '{_URL_RE}', 1))"
    hostport = f"lower(regexp_extract({expr}, '{_URL_RE}', 2))"
    host = (f"CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END")
    path = (f"regexp_replace(regexp_extract({expr}, '{_URL_RE}', 3), "
            f"'/+$', '')")
    rawq = f"regexp_extract({expr}, '{_URL_RE}', 4)"
    exact = ", ".join(f"'{t}'" for t in TRACKING_EXACT)
    params = (f"list_filter(string_split({rawq}, '&'), "
              f"p -> NOT starts_with(p, '{TRACKING_PREFIX}') "
              f"AND p <> '' "
              f"AND NOT list_contains([{exact}], string_split(p, '=')[1]))")
    # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — the empty-query case must not null the URL
    query = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    return (f"({scheme} || '://' || {host} || {path} || "
            f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)")
