"""URL canonicalization and domain filtering for web-crawl corpora.

Standard preprocessing in large-scale training-data pipelines
(C4/RefinedWeb/DCLM all start from crawl URLs): canonicalize the URL so
near-identical fetches dedup together, extract the registered domain for
dominance caps and blocklist filtering.

Reference scope note: the reference engine (fb64/uquery-rs) exposes no
web-specific operators — this module is part of the beyond-reference
LLM-pipeline surface this repo adds (like operators/text.py).

100 TB shape: everything here is pure JVM expression trees over the
scan (regexp_extract + higher-order filter on the split query string) —
no shuffle, no UDF, scan-fused. The blocklist filter broadcasts the
(tiny) blocklist and anti-joins; the domain cap reuses
operators/corpus.py::per_source_cap on the extracted domain.

Pattern notes: the extraction regexes avoid lookarounds so the SAME
pattern text is valid in both Java regex (Spark) and RE2 (DuckDB) —
the oracle entries run the identical expressions on DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tracking parameters stripped during canonicalization (the adblock
# "tracking params" core set — utm_* family plus the big click ids)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

# approximation of the Public Suffix List for registered-domain
# extraction: common second-level public suffixes. The real PSL is a
# data file (not in this container) — swap in a broadcast lookup built
# from publicsuffix.org for production. Documented deviation.
_TWO_LEVEL_TLDS = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.kr", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.tr", "com.ar",
)

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_parts(url: Column) -> dict:
    """Expression bundle: scheme/host/path/query/canonical columns for a
    URL column. Host lowercases, drops a leading ``www.`` and a default
    ``:80``/``:443`` port; the path drops one trailing slash (root
    stays ``/``, empty becomes ``/``); the query keeps parameter ORDER
    but drops tracking parameters (TRACKING_PARAM_RE); the fragment is
    always dropped. ``canonical`` reassembles scheme://host path
    [?query]."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    raw_host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(raw_host, "^www\\.", ""), ":(80|443)$", ""
    )
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path.isin("", "/"), F.lit("/")).otherwise(
        F.regexp_replace(raw_path, "/$", "")
    )
    raw_query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(kept, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return {
        "scheme": scheme,
        "host": host,
        "path": path,
        "query": query,
        "canonical": canonical,
        "domain": registered_domain(host),
    }


def registered_domain(host: Column) -> Column:
    """Registered domain of an already-normalized host: the last two
    labels, or the last three when the last two form a known two-level
    public suffix (PSL approximation — see module docstring)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_two_level = last2.isin(*_TWO_LEVEL_TLDS)
    return (
        F.when(n <= 2, host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append url_scheme/url_host/url_path/url_query/url_canonical/
    url_domain columns (scan-fused; no shuffle)."""
    parts = url_parts(F.col(url_col))
    return df.select(
        "*",
        parts["scheme"].alias("url_scheme"),
        parts["host"].alias("url_host"),
        parts["path"].alias("url_path"),
        parts["query"].alias("url_query"),
        parts["canonical"].alias("url_canonical"),
        parts["domain"].alias("url_domain"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "url_domain",
) -> DataFrame:
    """Drop rows whose registered domain appears in `blocklist`
    (column ``domain``). The blocklist is dimension-sized (UT1-style
    lists are ~1M rows — megabytes): broadcast LEFT ANTI join, so the
    corpus never reshuffles."""
    return df.join(
        F.broadcast(blocklist.select(F.col("domain").alias(domain_col))),
        on=domain_col,
        how="left_anti",
    )
