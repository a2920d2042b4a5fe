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


# Multi-label public suffixes common enough to matter in a web corpus.
# The heuristic eTLD+1 below treats 'a.b.MULTI' as registrable 'b.MULTI';
# a production corpus should join the full Mozilla public-suffix list in
# as a dimension table (it is data, not code) — this built-in set keeps
# the common two-label country suffixes from collapsing a whole country
# registry ('co.uk') into one "domain".
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk", "com.tw",
)


def url_etld1(col: Column | str) -> Column:
    """Registrable domain (eTLD+1): one extra label in front of the
    public suffix. 'a.b.site.co.uk' → 'site.co.uk';
    'a.b.site.com' → 'site.com'; a bare suffix or single label passes
    through unchanged. Pure codegen (no Python, no dimension join) —
    the per-domain grouping key for domain caps/mixes at 100 TB is a
    map-side projection."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


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


# Block-level elements whose tags imply a line break in the visible text.
_BLOCK_TAGS = (
    "p|div|br|h[1-6]|li|ul|ol|tr|table|thead|tbody|td|th|section|article"
    "|header|footer|nav|aside|blockquote|pre|hr|form|figure|figcaption"
)


def extract_html_text(col: Column | str) -> Column:
    """Visible text of an HTML document (the C4/CCNet text-extraction
    step that precedes every text-level filter): head, script, style
    and comment content dropped; block-level tags become newlines;
    remaining tags stripped; the common named entities decoded; each
    line whitespace-collapsed and blank lines removed.

    Pure chained `regexp_replace` — map-side codegen, no Python — and
    every pattern stays in the RE2-safe subset (no lookaround, no
    backreferences) so the same rules replay verbatim in the DuckDB
    oracle. At 100 TB this is a projection: no shuffle, no UDF."""
    t = _c(col)
    # containers whose CONTENT is invisible (head swallows title/meta
    # plus any head-side script/style in one pass; body-side script,
    # style and comments dropped separately)
    for pat in (
        r"(?is)<head\b[^>]*>.*?</head>",
        r"(?is)<script\b[^>]*>.*?</script>",
        r"(?is)<style\b[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
    ):
        t = F.regexp_replace(t, pat, "")
    # block boundaries → newline, everything else tag-shaped → ''
    t = F.regexp_replace(t, r"(?i)</?(" + _BLOCK_TAGS + r")\b[^>]*>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", "")
    # entities: specific ones first, &amp; LAST so '&amp;lt;' decodes to
    # the literal text '&lt;' (single-level decode, the standard rule)
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # collapse each line, drop blanks, re-join
    lines = F.transform(
        F.split(t, r"\n"),
        lambda x: F.trim(F.regexp_replace(x, r"\s+", " ")),
    )
    return F.array_join(F.filter(lines, lambda x: x != ""), "\n")


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


def domain_stats(
    df: DataFrame, url_col: str, char_col: str | None = None
) -> DataFrame:
    """Per-registrable-domain corpus profile: document count, distinct
    host count, and (optionally) total characters — the table a corpus
    curator reads before setting domain caps/mix weights. One map-side
    eTLD+1 projection + one hash aggregate; partial aggregation makes
    the shuffle O(#domains), not O(#docs)."""
    aggs = [
        F.count("*").alias("n_docs"),
        F.count_distinct(url_host(url_col)).alias("n_hosts"),
    ]
    if char_col is not None:
        aggs.append(F.sum(char_col).cast("long").alias("sum_chars"))
    return df.groupBy(url_etld1(url_col).alias("domain")).agg(*aggs)


def cap_per_domain(
    df: DataFrame, url_col: str, id_col: str, max_per_domain: int
) -> DataFrame:
    """C4/RefinedWeb max-pages-per-domain rule keyed on eTLD+1: at most
    `max_per_domain` docs per registrable domain, kept in deterministic
    portable-hash order (an unbiased sample of each domain, stable
    across runs and engines). Delegates to `cap_per_group`'s keyed
    window — parallel across domains; a hot domain costs O(its size)."""
    from hudi_demo_spark.operators.corpus import cap_per_group

    return (
        df.withColumn("__dom", url_etld1(url_col))
        .transform(
            lambda d: cap_per_group(d, "__dom", id_col, max_per_domain)
        )
        .drop("__dom")
    )
