"""Tests for robots.txt parsing + frontier filtering
(operators/robots): the frozen REP-subset grammar (wildcard groups,
agent runs, comments, empty-value idiom) and the longest-match
decision rule, plus plan shapes (no window in the match path)."""

from pyspark.sql import functions as F

from ocrd_segment_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)
from ocrd_segment_spark.plans import audit


def _robots(spark, rows):
    return spark.createDataFrame(
        [(h, b.encode()) for h, b in rows], "host string, body binary"
    )


def _rules(spark, rows):
    out = parse_robots(_robots(spark, rows))
    return {(r.host, r.rule, r.path) for r in out.collect()}


def test_parse_basic_group_comments_crlf(spark):
    body = (
        "# policy\r\n"
        "User-Agent: *\r\n"
        "Disallow: /private/  # inline\r\n"
        "Allow:   /private/ok\r\n"
    )
    assert _rules(spark, [("h", body)]) == {
        ("h", "disallow", "/private/"),
        ("h", "allow", "/private/ok"),
    }


def test_parse_agent_run_and_foreign_group(spark):
    body = (
        "User-agent: bing\n"
        "User-agent: *\n"
        "Disallow: /a\n"
        "\n"
        "Unknown-directive: x\n"
        "Disallow: /b\n"
        "User-agent: google\n"
        "Disallow: /g\n"
    )
    # blank lines + unknown directives do NOT close the group; the
    # google group contributes nothing
    assert _rules(spark, [("h", body)]) == {
        ("h", "disallow", "/a"),
        ("h", "disallow", "/b"),
    }


def test_parse_star_only_group_and_empty_values(spark):
    body = (
        "User-agent: google\n"
        "Disallow: /g\n"
        "User-agent: *\n"
        "Disallow:\n"  # the allow-everything idiom: no rule
        "Allow:\n"
    )
    assert _rules(spark, [("h", body)]) == set()


def test_parse_no_star_group_anywhere(spark):
    assert (
        _rules(spark, [("h", "User-agent: google\nDisallow: /\n")])
        == set()
    )


def _decide(spark, rules_rows, urls):
    rules = parse_robots(_robots(spark, rules_rows))
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r.url: r.robots_allowed
        for r in robots_allowed(rules, u).collect()
    }


def test_longest_match_and_defaults(spark):
    body = "User-agent: *\nDisallow: /p/\nAllow: /p/ok\n"
    got = _decide(
        spark,
        [("h.org", body)],
        [
            "https://h.org/p/secret",  # disallow matches
            "https://h.org/p/ok/deep",  # allow is longer -> allowed
            "https://h.org/other",  # no match -> allowed
            "https://h.org/",  # root, no match -> allowed
            "https://nobody.org/p/secret",  # no robots -> allowed
        ],
    )
    assert got == {
        "https://h.org/p/secret": False,
        "https://h.org/p/ok/deep": True,
        "https://h.org/other": True,
        "https://h.org/": True,
        "https://nobody.org/p/secret": True,
    }


def test_equal_length_allow_wins(spark):
    body = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    got = _decide(spark, [("h.org", body)], ["https://h.org/abc"])
    assert got == {"https://h.org/abc": True}


def test_pathless_url_is_root(spark):
    body = "User-agent: *\nDisallow: /\n"
    got = _decide(
        spark, [("h.org", body)], ["https://h.org", "https://h.org/x"]
    )
    # a bare authority url is path '/', matched by the root disallow
    assert got == {"https://h.org": False, "https://h.org/x": False}


def test_match_plan_has_no_window(spark):
    rules = parse_robots(_robots(spark, [("h.org", "User-agent: *\nDisallow: /p/\n")]))
    u = spark.createDataFrame([("https://h.org/p/x",)], "url string")
    out = robots_allowed(rules, u)
    plan = audit.physical_plan(out)
    # the decision is a partial-aggregable max(struct); the match side
    # adds NO Window beyond what parse_robots itself uses
    assert "partial_max" in plan, plan
    parse_windows = audit.physical_plan(rules).count("Window")
    assert plan.count("Window") <= parse_windows


def test_duplicate_host_bodies_union_without_interleave(spark):
    """Identical refetched bodies collapse; DIFFERENT bodies for one
    host parse independently — a foreign group in one body must never
    capture rules from the other body's wildcard group."""
    b1 = "User-agent: *\nDisallow: /a\n"
    b2 = "User-agent: google\nDisallow: /g\nUser-agent: *\nAllow: /b\n"
    got = _rules(
        spark, [("h", b1), ("h", b1), ("h", b2), ("H2", b1)]
    )
    assert got == {
        ("h", "disallow", "/a"),
        ("h", "allow", "/b"),
        ("H2", "disallow", "/a"),
    }


def test_mixed_case_rules_host_still_matches(spark):
    got = _decide(
        spark,
        [("Example.ORG", "User-agent: *\nDisallow: /p/\n")],
        ["https://example.org/p/x"],
    )
    assert got == {"https://example.org/p/x": False}


def test_crawl_delays_frozen_rule(spark):
    from ocrd_segment_spark.operators.robots import crawl_delays

    bodies = [
        ("a.org", b"User-agent: *\nCrawl-delay: 2\nCrawl-delay: 1.5\n"),
        # second body for the same host: max across bodies
        ("a.org", b"User-agent: *\nCrawl-delay: 7\n"),
        # only a branded group: no wildcard rule, no row
        ("b.org", b"User-agent: googlebot\nCrawl-delay: 99\n"),
        # invalid + negative only: no row
        ("c.org", b"User-agent: *\nCrawl-delay: fast\nCrawl-delay: -1\n"),
        # inline comment and CRLF survive the line discipline
        ("d.org", b"User-agent: *\r\nCrawl-delay: 3.25  # be nice\r\n"),
    ]
    df = spark.createDataFrame(bodies, "host string, body binary")
    got = {r["host"]: r["crawl_delay"] for r in crawl_delays(df).collect()}
    assert got == {"a.org": 7.0, "d.org": 3.25}


def test_crawl_delays_mixed_case_hosts_merge_lowercased(spark):
    from ocrd_segment_spark.operators.robots import crawl_delays

    df = spark.createDataFrame(
        [
            ("Example.ORG", b"User-agent: *\nCrawl-delay: 10\n"),
            ("example.org", b"User-agent: *\nCrawl-delay: 4\n"),
        ],
        "host string, body binary",
    )
    got = {r["host"]: r["crawl_delay"] for r in crawl_delays(df).collect()}
    assert got == {"example.org": 10.0}


# ---------------------------------------------------------------------------
# crawl-wave planner
# ---------------------------------------------------------------------------


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, lastmod string, crawl_delay double"
    )


def test_crawl_waves_schedule_and_default_delay(spark):
    from ocrd_segment_spark.operators.robots import crawl_waves

    rows = [
        # slow host: delay 30 → one fetch per wave of 60s after 2
        ("https://s.org/a", "s.org", "2026-03-01", 30.0),
        ("https://s.org/b", "s.org", "2026-02-01", 30.0),
        ("https://s.org/c", "s.org", "2026-01-01", 30.0),
        ("https://s.org/d", "s.org", None, 30.0),  # no lastmod → last
        # no declared delay → default 1.0, everything in wave 0
        ("https://f.org/x", "f.org", None, None),
        ("https://f.org/y", "f.org", None, None),
    ]
    out = {
        r["url"]: r
        for r in crawl_waves(
            _frontier(spark, rows), wave_seconds=60.0, default_delay=1.0
        ).collect()
    }
    # freshest first within the host
    assert out["https://s.org/a"]["fetch_seq"] == 1
    assert out["https://s.org/b"]["fetch_seq"] == 2
    assert out["https://s.org/c"]["fetch_seq"] == 3
    assert out["https://s.org/d"]["fetch_seq"] == 4  # NULLS LAST
    assert out["https://s.org/a"]["eta_s"] == 0.0
    assert out["https://s.org/d"]["eta_s"] == 90.0
    assert [out[f"https://s.org/{u}"]["wave"] for u in "abcd"] == [0, 0, 1, 1]
    assert out["https://f.org/x"]["wave"] == 0
    assert out["https://f.org/y"]["eta_s"] == 1.0


def test_crawl_waves_deterministic_tiebreak(spark):
    from ocrd_segment_spark.operators.robots import crawl_waves

    rows = [
        ("https://t.org/b", "t.org", "2026-01-01", 5.0),
        ("https://t.org/a", "t.org", "2026-01-01", 5.0),
    ]
    out = {
        r["url"]: r["fetch_seq"]
        for r in crawl_waves(_frontier(spark, rows)).collect()
    }
    assert out["https://t.org/a"] == 1  # same lastmod → url ASC


def test_crawl_waves_rejects_nonpositive_wave(spark):
    import pytest as _pytest

    from ocrd_segment_spark.operators.robots import crawl_waves

    with _pytest.raises(ValueError):
        crawl_waves(_frontier(spark, []), wave_seconds=0.0)
