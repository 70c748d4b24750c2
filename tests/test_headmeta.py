"""Tests for HTML head-metadata harvesting and canonical-URL collapse
(operators/headmeta): canonical <link> harvest under both attribute
orders, the frozen href-resolution rule, robots noindex detection, the
one-shuffle collapse keep rule, and the scan-stage plan shape."""

from pyspark.sql import functions as F

from ocrd_segment_spark.operators.headmeta import (
    canonical_collapse,
    head_meta,
)
from ocrd_segment_spark.plans import audit


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def _page(url, head):
    return (url, f"<html><head>{head}</head><body>t</body></html>".encode())


# ------------------------------------------------------------ harvest
def test_canonical_both_attribute_orders_and_case(spark):
    rows = [
        _page(
            "https://a.org/1",
            '<link rel="canonical" href="https://a.org/c1">',
        ),
        _page(
            "https://a.org/2",
            '<LINK HREF="https://a.org/c2" REL="Canonical">',
        ),
        _page("https://a.org/3", '<link rel="stylesheet" href="/x.css">'),
    ]
    got = {
        r.url: r.canonical_href
        for r in head_meta(_pages(spark, rows)).collect()
    }
    assert got == {
        "https://a.org/1": "https://a.org/c1",
        "https://a.org/2": "https://a.org/c2",
        "https://a.org/3": None,
    }


def test_first_canonical_wins(spark):
    rows = [
        _page(
            "https://a.org/1",
            '<link rel="canonical" href="https://a.org/first">'
            '<link rel="canonical" href="https://a.org/second">',
        )
    ]
    [r] = head_meta(_pages(spark, rows)).collect()
    assert r.canonical_href == "https://a.org/first"


def test_resolution_rule_arms(spark):
    cases = {
        # absolute (any case) kept as-is
        "https://a.org/abs": ("HTTPS://B.Org/x", "HTTPS://B.Org/x"),
        # protocol-relative gets the page scheme
        "https://a.org/rel": ("//cdn.org/y", "https://cdn.org/y"),
        # foreign scheme -> NULL
        "https://a.org/mail": ("mailto:x@y.z", None),
        # rooted path -> page origin
        "https://a.org/root": ("/p/1", "https://a.org/p/1"),
        # relative path -> NULL (frozen rule excludes directory maths)
        "https://a.org/relpath": ("other.html", None),
    }
    rows = [
        _page(url, f'<link rel="canonical" href="{href}">')
        for url, (href, _) in cases.items()
    ]
    got = {
        r.url: r.canonical_url
        for r in head_meta(_pages(spark, rows)).collect()
    }
    assert got == {url: want for url, (_, want) in cases.items()}


def test_robots_orders_and_noindex(spark):
    rows = [
        _page("https://a.org/1", '<meta name="robots" content="NOINDEX">'),
        _page(
            "https://a.org/2",
            '<META CONTENT="index, follow" NAME="robots">',
        ),
        _page("https://a.org/3", '<meta name="viewport" content="w=1">'),
        _page(
            "https://a.org/4",
            '<meta name="robots" content="noindex, nofollow">',
        ),
    ]
    got = {
        r.url: (r.robots, r.noindex)
        for r in head_meta(_pages(spark, rows)).collect()
    }
    assert got == {
        "https://a.org/1": ("NOINDEX", True),
        "https://a.org/2": ("index, follow", False),
        "https://a.org/3": (None, False),
        "https://a.org/4": ("noindex, nofollow", True),
    }


# ----------------------------------------------------------- collapse
def test_collapse_prefers_self_canonical_then_min_url(spark):
    canon = '<link rel="canonical" href="https://a.org/main">'
    rows = [
        _page("https://a.org/zz-alias", canon),
        _page("https://a.org/main", canon),  # self-canonical
        _page("https://a.org/aa-alias", canon),
        _page("https://b.org/loner", ""),  # no canonical: own group
    ]
    got = {
        r.canonical_url: r
        for r in canonical_collapse(_pages(spark, rows)).collect()
    }
    main = got["https://a.org/main"]
    assert (main.url, main.n_pages, main.n_self) == (
        "https://a.org/main",
        3,
        1,
    )
    loner = got["https://b.org/loner"]
    assert (loner.url, loner.n_pages, loner.n_self) == (
        "https://b.org/loner",
        1,
        1,
    )


def test_collapse_min_url_when_canonical_not_crawled(spark):
    canon = '<link rel="canonical" href="https://a.org/elsewhere">'
    rows = [
        _page("https://a.org/b-alias", canon),
        _page("https://a.org/a-alias", canon),
    ]
    [r] = canonical_collapse(_pages(spark, rows)).collect()
    assert (r.canonical_url, r.url, r.n_self) == (
        "https://a.org/elsewhere",
        "https://a.org/a-alias",
        0,
    )


def test_collapse_drops_noindex(spark):
    rows = [
        _page(
            "https://a.org/hidden",
            '<meta name="robots" content="noindex">',
        ),
        _page("https://a.org/seen", ""),
    ]
    out = canonical_collapse(_pages(spark, rows)).collect()
    assert [r.canonical_url for r in out] == ["https://a.org/seen"]
    kept = canonical_collapse(
        _pages(spark, rows), drop_noindex=False
    ).collect()
    assert len(kept) == 2


# -------------------------------------------------------- plan shapes
def test_head_meta_is_scan_stage(spark):
    """head_meta must ride the scan: no Exchange, no Python stage."""
    df = head_meta(
        _pages(spark, [_page("https://a.org/1", "")])
    )
    plan = audit.physical_plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_collapse_is_one_shuffle_partial_agg(spark):
    """canonical_collapse: exactly one Exchange (the group key) and a
    partial_min before it (map-side combine), no window sort."""
    df = canonical_collapse(
        _pages(spark, [_page("https://a.org/1", "")])
    )
    plan = audit.physical_plan(df)
    # formatted plans list each node twice (tree + detail section)
    assert plan.count("Exchange") == 2, plan
    assert "partial_min" in plan
    assert "Window" not in plan
