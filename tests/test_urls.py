"""URL canonicalization (operators/urls.py): hand-built URLs covering
tracking strip, param sorting, default ports, www, fragments, paths."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.urls import (
    domain_stats,
    with_url_parts,
)


def _parse(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    return {r["url"]: r for r in with_url_parts(df).collect()}


def test_canonicalization_rules(spark):
    rows = _parse(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=2&a=1&fbclid=q#frag",
            "http://example.com:80/a/b?a=1&z=2",
            "https://sub.dom.example.co/deep/1/2/3/",
            "https://localhost/",
            "https://example.com",
        ],
    )
    r = rows["HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=2&a=1&fbclid=q#frag"]
    assert r["canonical_url"] == "https://example.com/a/b?a=1&z=2"
    assert r["host"] == "example.com"
    assert r["registered_domain"] == "example.com"
    assert (r["n_params_kept"], r["n_params_dropped"]) == (2, 2)
    assert r["path_depth"] == 2
    # http default port also stripped; same resource as above mod scheme
    assert rows["http://example.com:80/a/b?a=1&z=2"]["canonical_url"] == (
        "http://example.com/a/b?a=1&z=2"
    )
    r3 = rows["https://sub.dom.example.co/deep/1/2/3/"]
    assert r3["registered_domain"] == "example.co"
    assert r3["path_depth"] == 4
    # single-label host: registered domain degrades to the host
    assert rows["https://localhost/"]["registered_domain"] == "localhost"
    # no path -> '/'
    r5 = rows["https://example.com"]
    assert r5["canonical_url"] == "https://example.com/"
    assert (r5["path_depth"], r5["n_params_kept"]) == (0, 0)


def test_tracking_variants_collapse_in_domain_stats(spark):
    urls = [
        "https://a.com/x?utm_source=1",
        "https://a.com/x?utm_source=2&fbclid=zz",
        "https://WWW.A.com/x",
        "https://a.com/y?id=1",
        "https://b.net/only",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    stats = {r["registered_domain"]: r for r in domain_stats(with_url_parts(df)).collect()}
    assert stats["a.com"]["n_urls"] == 4
    assert stats["a.com"]["n_canonical"] == 2  # /x collapses 3-ways
    assert stats["a.com"]["n_tracking_dropped"] == 3
    assert stats["b.net"]["n_urls"] == 1
    assert stats["a.com"]["mean_path_depth"] == 1.0


def test_non_default_ports_not_stripped(spark):
    """ADVICE r9: port stripping is scheme-conditioned. 'https://h:80/'
    and 'http://h:443/' carry NON-default ports — distinct resources
    per RFC 3986 — and must not collapse with the portless URL."""
    rows = _parse(
        spark,
        [
            "https://example.com:80/a",   # non-default: keep
            "http://example.com:443/a",   # non-default: keep
            "https://example.com:8443/a", # never default: keep
            "ftp://example.com:80/a",     # unknown scheme: keep
        ],
    )
    assert rows["https://example.com:80/a"]["host"] == "example.com:80"
    assert rows["http://example.com:443/a"]["host"] == "example.com:443"
    assert rows["https://example.com:8443/a"]["host"] == "example.com:8443"
    assert rows["ftp://example.com:80/a"]["host"] == "example.com:80"
    assert (
        rows["https://example.com:80/a"]["canonical_url"]
        == "https://example.com:80/a"
    )
