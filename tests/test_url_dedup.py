"""URL canonicalization + URL-level dedup (web-corpus pipeline)."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.text import canonicalize_url, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["c"] for r in
            df.select(canonicalize_url(F.col("u")).alias("c")).collect()]


def test_canonicalize_goldens(spark):
    cases = {
        # scheme/host case, www, default port, tracking params, fragment
        "HTTP://WWW.Sub.Example.COM:80/Docs/5/?utm_source=x&b=2&a=1#frag":
            "https://sub.example.com/Docs/5?a=1&b=2",
        # already canonical-ish; param order normalized
        "https://sub.example.com/docs/5?b=2&a=1":
            "https://sub.example.com/docs/5?a=1&b=2",
        # default https port dropped, trailing slash stripped
        "https://sub.example.com:443/docs/5/":
            "https://sub.example.com/docs/5",
        # non-default port kept
        "https://sub.example.com:8443/docs/5":
            "https://sub.example.com:8443/docs/5",
        # tracking-only query vanishes entirely
        "http://sub.example.com/docs/5?fbclid=abc&gclid=1":
            "https://sub.example.com/docs/5",
        # root paths collapse to bare host
        "https://example.com": "https://example.com",
        "https://example.com/": "https://example.com",
        "https://example.com/?": "https://example.com",
        # malformed: no host -> NULL, not a shared junk key
        "not a url at all": None,
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_url_dedup_groups(spark):
    rows = [
        (1, "https://a.com/x?b=2&a=1"),
        (2, "HTTP://WWW.A.COM:80/x?a=1&b=2&utm_source=t"),
        (3, "https://a.com/y"),
        (4, "junk"),
        (5, "junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["canonical_url"]: (r["kept_doc"], r["n_dups"])
           for r in url_dedup(df).collect()}
    assert got == {
        "https://a.com/x?a=1&b=2": (1, 2),
        "https://a.com/y": (3, 1),
    }
