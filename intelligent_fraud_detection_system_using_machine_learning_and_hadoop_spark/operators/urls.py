"""URL canonicalization + domain analytics — the URL-dedup stage of a
web-corpus pipeline (C4/CCNet dedupe fetched pages by canonical URL
before any content pass; a crawl frontier needs the same normalization
to avoid re-fetching tracking-param variants).

Canonicalization (the conservative, public recipe — RFC 3986 §6
normalization plus the universally-applied tracking-param strip):

* scheme and host lowercase; leading ``www.`` dropped;
* default ports stripped (``:443`` for https, ``:80`` for http);
* fragment dropped;
* query parameters split, tracking params removed (``utm_*``,
  ``fbclid``, ``gclid``, ``ref``), the rest SORTED and re-joined —
  param order never distinguishes resources in practice;
* empty path → ``/``.

Everything is regex/split/array column expressions portable between
Java regex (Spark) and RE2 (DuckDB oracle): no backreferences, no
lookaround. Zero shuffle — per-row maps; the domain roll-up is one
aggregation keyed on the registrable domain.

The registrable domain here is the last two host labels (a
public-suffix-list lookup is a broadcast join against the PSL table in
a deployment; the 2-label fallback keeps the operator self-contained
and oracle-checkable).

The reference (structured-claims pandas scorer) has no web surface;
this family belongs to the LLM-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query params that never identify a resource (strip before dedup).
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_NAMES = ("fbclid", "gclid", "ref")


def _is_tracking(p: Column) -> Column:
    cond = F.lit(False)
    for pre in TRACKING_PARAM_PREFIXES:
        cond = cond | p.startswith(pre)
    for name in TRACKING_PARAM_NAMES:
        cond = cond | p.startswith(name + "=")
    return cond


def with_url_parts(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Attach parsed + canonicalized URL columns: ``scheme``, ``host``
    (lowercase, www- and default-port-stripped), ``path``,
    ``registered_domain`` (last two host labels), ``path_depth``,
    ``params_kept``/``n_params_dropped`` (tracking strip + sort), and
    ``canonical_url``. Pure per-row column expressions — no UDF, no
    shuffle."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1))
    host_www = F.regexp_replace(hostport, r"^www\.", "")
    # Default-port strip is scheme-conditioned (RFC 3986 §6.2.3):
    # 'http://h:443/' and 'https://h:80/' are NON-default ports naming
    # distinct resources and must NOT collapse with the portless URL.
    host = (
        F.when(scheme == "https", F.regexp_replace(host_www, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host_www, r":80$", ""))
        .otherwise(host_www)
    )
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(F.split(qs, "&"), lambda p: p != "")
    kept = F.array_sort(F.filter(params, lambda p: ~_is_tracking(p)))
    labels = F.split(host, r"\.")
    reg_dom = F.when(
        F.size(labels) >= 2, F.array_join(F.slice(labels, -2, 2), ".")
    ).otherwise(host)
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("path", path)
        .withColumn("registered_domain", reg_dom)
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast(
                "long"
            ),
        )
        .withColumn("n_params_kept", F.size(kept).cast("long"))
        .withColumn(
            "n_params_dropped",
            (F.size(params) - F.size(kept)).cast("long"),
        )
        .withColumn("canonical_url", canonical)
    )


def domain_stats(
    parsed: DataFrame,
    domain_col: str = "registered_domain",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """Per-registrable-domain crawl report over parsed URLs: page
    count, DISTINCT canonical resources (the post-canonicalization
    dedup denominator — tracking-param variants collapse), mean path
    depth (exact-int IEEE division), and total tracking params
    stripped. One aggregation keyed on the domain — scales to any
    corpus; a skewed mega-domain is one hash-agg key (salt if a single
    domain exceeds an executor)."""
    return (
        parsed.groupBy(F.col(domain_col).alias("registered_domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct(canonical_col).cast("long").alias("n_canonical"),
            (
                F.sum("path_depth").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_path_depth"),
            F.sum("n_params_dropped").cast("long").alias("n_tracking_dropped"),
        )
    )
