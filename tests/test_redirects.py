"""Redirect harvest + chain resolution (operators/redirects)."""

import pytest

from ocrd_segment_spark.operators.redirects import (
    redirect_edges,
    resolve_redirects,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, http_status int, location string"
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_edge_harvest_normalization(spark):
    pages = _pages(
        spark,
        [
            ("https://a.org/x", 301, "https://b.org/y"),
            ("https://a.org/rel", 302, " /target "),
            ("https://a.org/proto", 301, "//cdn.example.net/z"),
            ("https://a.org/mail", 303, "mailto:x@a.org"),
            ("https://a.org/empty", 307, "   "),
            ("https://a.org/ok", 200, "https://b.org/ignored"),
            ("https://a.org/amb", 301, "https://b.org/v2"),
            ("https://a.org/amb", 308, "https://b.org/v1"),
        ],
    )
    got = {(r["src"], r["dst"]) for r in redirect_edges(pages).collect()}
    assert got == {
        ("https://a.org/x", "https://b.org/y"),
        # host-relative rebased on the src origin, trimmed
        ("https://a.org/rel", "https://a.org/target"),
        # ambiguity collapses to min(dst)
        ("https://a.org/amb", "https://b.org/v1"),
    }


def test_chain_cycle_and_cap(spark):
    edges = _edges(
        spark,
        [("u0", "u1"), ("u1", "u2"), ("u2", "u3"),  # 3-chain
         ("s", "s"),                                 # self-loop
         ("a", "b"), ("b", "a")],                    # 2-cycle
    )
    got = {
        r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(edges, max_hops=2).collect()
    }
    assert got == {
        "u0": (None, None, False),  # 3 hops > cap
        "u1": ("u3", 2, True),
        "u2": ("u3", 1, True),
        "s": (None, None, False),
        "a": (None, None, False),
        "b": (None, None, False),
    }


def test_max_hops_validation(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [("a", "b")]), max_hops=0)


def test_doubling_matches_reference_walk(spark):
    # a messy functional graph: two long chains that merge, a lasso
    # (chain into a cycle), and isolated one-hop redirects
    pairs = (
        [(f"c{i}", f"c{i+1}") for i in range(9)]
        + [(f"d{i}", f"d{i+1}") for i in range(4)]
        + [("d4", "c7")]
        + [(f"l{i}", f"l{i+1}") for i in range(3)]
        + [("l3", "l1")]
        + [("solo", "t")]
    )
    cap = 6
    nxt = dict(pairs)

    def walk(s):
        cur, hops = s, 0
        while cur in nxt and hops <= cap:
            cur, hops = nxt[cur], hops + 1
        if cur in nxt or hops > cap:
            return (None, None, False)
        return (cur, hops, True)

    expect = {s: walk(s) for s in nxt}
    got = {
        r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(_edges(spark, pairs), max_hops=cap).collect()
    }
    assert got == expect


def test_relative_rebase_keeps_port(spark):
    # review finding: the origin includes the port (RFC 3986)
    pages = _pages(
        spark, [("https://a.org:8080/x", 301, "/y")]
    )
    got = redirect_edges(pages).collect()
    assert [(r["src"], r["dst"]) for r in got] == [
        ("https://a.org:8080/x", "https://a.org:8080/y")
    ]
