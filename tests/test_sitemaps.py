"""Sitemap harvesting (operators/sitemaps)."""

import pytest

from ocrd_segment_spark.operators.sitemaps import (
    robots_sitemap_urls,
    sitemap_entries,
)

URLSET = (
    '<?xml version="1.0"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "<url>\n  <loc> https://a.org/p/1 </loc>\n"
    "  <lastmod>2024-02-03</lastmod>\n</url>\n"
    "<url><loc>https://a.org/p/2</loc><lastmod></lastmod></url>\n"
    "<url><loc>https://a.org/p/2</loc><lastmod>2023-01-01</lastmod></url>\n"
    "<url><loc></loc></url>\n"
    "</urlset>"
)
INDEX = (
    "<sitemapindex>\n"
    "<sitemap><loc>https://a.org/sub1.xml</loc></sitemap>\n"
    "<sitemap>\n<loc>https://a.org/sub2.xml</loc>"
    "<lastmod>2020-01-01</lastmod></sitemap>\n"
    "</sitemapindex>\n<!-- an <urlset> mention after the fact -->"
)


def _entries(spark, *bodies):
    df = spark.createDataFrame(
        [("a.org", b.encode() if b is not None else None) for b in bodies],
        "host string, body binary",
    )
    return {
        (r["loc"], r["is_index"]): r["lastmod"]
        for r in sitemap_entries(df).collect()
    }


def test_urlset_blocks_trim_dedupe(spark):
    got = _entries(spark, URLSET)
    assert got == {
        ("https://a.org/p/1", False): "2024-02-03",
        # duplicate loc collapses; empty lastmod is NULL, min keeps the value
        ("https://a.org/p/2", False): "2023-01-01",
    }


def test_index_children_and_trailing_urlset_comment(spark):
    got = _entries(spark, INDEX)
    assert got == {
        ("https://a.org/sub1.xml", True): None,
        ("https://a.org/sub2.xml", True): "2020-01-01",
    }


def test_urlset_wins_when_first(spark):
    body = URLSET + "\n<!-- see also <sitemapindex> -->"
    assert all(not idx for (_, idx) in _entries(spark, body))


def test_non_sitemap_and_null_yield_no_rows(spark):
    assert _entries(spark, "<html>hi</html>", "", None) == {}


def test_malformed_binary_no_crash(spark):
    df = spark.createDataFrame(
        [("a.org", b"\xff\xfe<urlset><url><loc>https://a.org/x</loc></url>")],
        "host string, body binary",
    )
    rows = sitemap_entries(df).collect()
    assert [r["loc"] for r in rows] == ["https://a.org/x"]


def test_robots_sitemap_lines(spark):
    body = (
        "# policy\n"
        "User-agent: *\r\n"
        "Disallow: /x\n"
        "Sitemap: https://a.org/s1.xml   # primary\r\n"
        "sitemap:https://a.org/s2.xml\n"
        "SITEMAP: https://a.org/s1.xml\n"  # dup after case-fold of the NAME only
        "Sitemap:\n"
    )
    df = spark.createDataFrame([("a.org", body.encode())], "host string, body binary")
    got = sorted(r["sitemap_url"] for r in robots_sitemap_urls(df).collect())
    assert got == ["https://a.org/s1.xml", "https://a.org/s2.xml"]


def test_url_hints_vocab_range_and_merge(spark):
    from ocrd_segment_spark.operators.sitemaps import sitemap_url_hints

    body = (
        "<urlset>"
        "<url><loc>https://a.org/p</loc><lastmod>2024-01-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.org/p</loc><lastmod>2023-01-01</lastmod>"
        "<changefreq>weekly</changefreq><priority>0.5</priority></url>"
        "<url><loc>https://a.org/q</loc>"
        "<changefreq>sometimes</changefreq><priority>1.5</priority></url>"
        "<url><loc>https://a.org/r</loc>"
        "<changefreq> Monthly </changefreq><priority> 0 </priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("a.org", body.encode())], "host string, body binary"
    )
    got = {
        r["loc"]: (r["lastmod"], r["changefreq"], r["priority"])
        for r in sitemap_url_hints(df).collect()
    }
    assert got == {
        # field-wise min across the duplicate declaration
        "https://a.org/p": ("2023-01-01", "daily", 0.5),
        # out-of-vocabulary changefreq and out-of-range priority -> NULL
        "https://a.org/q": (None, None, None),
        # case + whitespace folding; priority 0 is in range
        "https://a.org/r": (None, "monthly", 0.0),
    }
    # index bodies yield no hint rows
    idx = spark.createDataFrame(
        [("a.org", b"<sitemapindex><sitemap><loc>https://a.org/s.xml"
          b"</loc></sitemap></sitemapindex>")],
        "host string, body binary",
    )
    assert sitemap_url_hints(idx).count() == 0
