"""URL canonicalization / domain extraction / per-domain caps
(operators/web.py) — unit cases for every documented rule plus the
cap composition."""

from pyspark.sql import functions as F

from pythongis_spark.operators.web import cap_per_domain, with_url_parts


CASES = [
    # (raw, canon, host, domain)
    ("HTTPS://WWW.Example.COM:443/a/b/?z=9&a=1#frag",
     "https://example.com/a/b?a=1&z=9", "example.com", "example.com"),
    ("http://www.site.example.co.uk:80/path/",
     "http://site.example.co.uk/path", "site.example.co.uk",
     "example.co.uk"),
    ("bare.example.com/y/?utm_source=x&b=2&",
     "http://bare.example.com/y?b=2", "bare.example.com", "example.com"),
    ("https://host.org/?fbclid=1&gclid=2&ref=3&utm_medium=m",
     "https://host.org", "host.org", "host.org"),
    ("http://localhost:8080/x", "http://localhost:8080/x",
     "localhost:8080", "localhost:8080"),
    ("https://a.b.co.jp/", "https://a.b.co.jp", "a.b.co.jp", "b.co.jp"),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_css) in enumerate(CASES)],
        "i int, url string",
    )
    got = {r.i: r for r in with_url_parts(df).collect()}
    for i, (raw, canon, host, domain) in enumerate(CASES):
        assert got[i].canon_url == canon, (raw, got[i].canon_url)
        assert got[i].host == host, (raw, got[i].host)
        assert got[i].domain == domain, (raw, got[i].domain)


def test_canonical_equality_groups_tracking_variants(spark):
    """URLs differing only in tracking params / param order / case /
    fragments collapse to one canonical key — the URL-dedup contract."""
    variants = [
        "https://www.shop.example.com/item?id=5&color=red",
        "HTTPS://shop.example.COM:443/item?color=red&id=5#top",
        "https://shop.example.com/item/?utm_campaign=x&id=5&color=red",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = with_url_parts(df).select("canon_url").distinct().collect()
    assert len(canon) == 1
    assert canon[0].canon_url == "https://shop.example.com/item?color=red&id=5"


def test_cap_per_domain(spark):
    # subdomains share one registered domain → one group, capped once
    rows = [
        (f"u{i}", f"https://site{i % 3}.example.com/p{i}", i)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id string, url string, rank int")
    kept = cap_per_domain(df, "url", [F.col("rank").asc()], 4).collect()
    assert len(kept) == 4
    assert sorted(r.id for r in kept) == ["u0", "u1", "u2", "u3"]
    # distinct registered domains cap independently
    rows2 = [
        (f"v{i}", f"https://dom{i % 3}.net/p{i}", i) for i in range(30)
    ]
    df2 = spark.createDataFrame(rows2, "id string, url string, rank int")
    assert cap_per_domain(df2, "url", [F.col("rank").asc()], 4).count() == 12
