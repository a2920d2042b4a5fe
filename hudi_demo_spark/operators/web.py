"""Web-corpus URL operators: canonicalization, host/domain extraction,
URL-keyed dedup.

The CommonCrawl/C4 pipeline preamble: before any text-level dedup, a
web corpus collapses fetch-time URL variants (scheme/host case, default
ports, fragments, tracking parameters, query-parameter order, trailing
slashes) so that one page is one row. Everything here is a pure
`pyspark.sql.functions` composition (codegen, no Python in the hot
path), and every rule is kept to the dialect-portable regex subset so
the DuckDB oracle reimplements it independently (plans/queries.py
`web_url_canonicalize`).

At 100 TB the canonical form is a map-side projection; `dedup_by_url`
then shuffles 8-byte hashes of it, not the URLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify a CAMPAIGN, not a document
TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme ('' if not a URL)."""
    return F.lower(F.regexp_extract(_c(col), _URL_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host WITHOUT the port ('' if not a URL)."""
    host = F.lower(F.regexp_extract(_c(col), _URL_RE, 2))
    return F.regexp_replace(host, r":\d+$", "")


def url_registered_domain(col: Column | str) -> Column:
    """Last two host labels ('example.com') — the cap_per_group /
    per-domain-mix grouping key. Heuristic: multi-label public
    suffixes (co.uk) come back as the suffix pair; a corpus needing
    the public-suffix list should join one in as a dimension table."""
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(F.element_at(labels, -1))


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL form:

    - scheme and host lowercased (path/query case preserved)
    - default port stripped (:80 for http, :443 for https)
    - fragment dropped
    - tracking query parameters dropped (TRACKING_PARAM_RE)
    - remaining query parameters SORTED (byte order) and re-joined
    - trailing slash stripped from the path ('/a/' == '/a'; a bare
      host's empty path stays empty)

    Non-URL strings (no scheme://host match) pass through trimmed but
    otherwise untouched — canonicalization must never destroy a key it
    does not understand."""
    u = F.trim(_c(col))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(
        F.when(
            (scheme == "https"), F.regexp_replace(host, r":443$", "")
        ).otherwise(host)
    )
    path = F.regexp_replace(path, r"/$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(u)


def dedup_by_url(
    df: DataFrame, url_col: str, keep_by: str
) -> DataFrame:
    """One row per canonical URL, deterministic winner = min(keep_by).
    The dedup window partitions on a 64-bit hash of the canonical form
    so the shuffle moves 8-byte keys, not URLs."""
    from hudi_demo_spark.operators.dedup import dedup_exact
    from hudi_demo_spark.operators.util import spread as _spread

    return dedup_exact(
        _spread(df).withColumn(
            "__curl", F.xxhash64(canonicalize_url(url_col))
        ),
        ["__curl"],
        keep_by=keep_by,
    ).drop("__curl")
