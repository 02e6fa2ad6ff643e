"""Web-corpus URL operators: canonicalization, host/registered-domain
extraction, per-domain caps — the C4/CommonCrawl-style pipeline steps
that precede URL-keyed dedup and domain mixture weighting.

Beyond the reference's scope (like the text ops). Everything is pure
Catalyst (regexp/split/array higher-order functions in whole-stage
codegen, no Python, no shuffle), and every transformation is chosen to
be replayable verbatim in the DuckDB oracle: anchored single-site
regexps (Java and RE2 agree on these), list sort/filter/join.

Canonicalization rules (documented, deterministic):
- scheme lowercased; missing scheme → ``http``;
- host lowercased, leading ``www.`` stripped, default ``:80``/``:443``
  port stripped;
- fragment dropped;
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
  remaining query params sorted bytewise for order-insensitive
  equality;
- trailing slash stripped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes the tiny built-in table knows; a real
# deployment swaps in the full Mozilla public-suffix list (same logic)
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "com.br", "co.in", "com.cn",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url_expr(url: Column) -> Column:
    """Canonical URL as a pure-Catalyst expression (see module doc)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(pathq, r"^([^?#]*)", 1)
    path = F.when(path == "/", "").otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    query = F.regexp_extract(pathq, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qcanon = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def host_expr(url: Column) -> Column:
    """Lowercased host with ``www.`` and default port stripped."""
    rest = F.regexp_replace(F.trim(url), _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )


def registered_domain_expr(host: Column) -> Column:
    """Registrable domain: last two labels, or last three when the
    two-label tail is a known multi-part public suffix (built-in
    subset; swap in the full PSL at deployment)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds canon_url / host / domain columns — the projection that
    precedes URL-keyed exact dedup (`dedup_exact` on canon_url) and
    per-domain caps at corpus scale."""
    u = F.col(url_col)
    out = df.withColumn("canon_url", canonical_url_expr(u)).withColumn(
        "host", host_expr(u)
    )
    return out.withColumn("domain", registered_domain_expr(F.col("host")))


def cap_per_domain(
    df: DataFrame, url_col: str, order_by, n: int
) -> DataFrame:
    """Keep at most ``n`` rows per registered domain (deterministic
    order) — composition of the URL parts with the WindowGroupLimit
    sampling primitive; the per-group truncation happens partially
    map-side before the shuffle."""
    from pythongis_spark.operators.sampling import cap_per_group

    return cap_per_group(with_url_parts(df, url_col), ["domain"], order_by, n)
