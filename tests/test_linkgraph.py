"""Tests for the round-5 web-graph / corpus-layout operators:
outlink harvesting + host edges + PageRank (operators/linkgraph),
url snapshot collapse (functions/urls.latest_snapshot),
quality-based cluster resolution (dedup.resolve_duplicate_clusters),
and token-balanced sharding (sampling.shard_by_tokens)."""

import math

import pytest
from pyspark.sql import functions as F

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.operators.linkgraph import (
    host_edges,
    outlinks,
    pagerank,
)
from ocrd_segment_spark.plans import audit


# ------------------------------------------------------------- outlinks
def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_outlinks_resolution_rule(spark):
    html = (
        '<html><body>'
        '<a href="https://other.example.org/x">abs</a>'
        '<A HREF-NOT="x" href="//proto.example.org/y">rel</A>'
        '<a class="z" href="/local">self</a>'
        '<a href="page.html">relative-path</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="HTTPS://UPPER.Example.ORG/Z">case</a>'
        '</body></html>'
    ).encode()
    out = outlinks(
        _pages(spark, [("https://src.example.org/p", html)])
    ).collect()
    hosts = sorted(r.dst_host for r in out)
    # mailto/javascript dropped; relative + rooted resolve to src host
    assert hosts == [
        "other.example.org",
        "proto.example.org",
        "src.example.org",
        "src.example.org",
        "upper.example.org",
    ]
    assert all(r.src_host == "src.example.org" for r in out)


def test_outlinks_edge_pages(spark):
    rows = [
        ("https://a.org/p", b"<html><body>no links</body></html>"),
        ("not-a-url", b'<a href="https://x.org/">x</a>'),  # no src host
        ("https://b.org/p", b'<a href="https://ok.org/">y</a>\xff\xfe\x80'),
    ]
    out = outlinks(_pages(spark, rows)).collect()
    # only the valid-src page with links survives; invalid UTF-8 tail
    # does not crash the harvest
    assert len(out) == 1 and out[0].dst_host == "ok.org"


def test_outlinks_on_fixture_corpus(spark):
    """The F1 fixture corpus: every nav link is same-host relative, so
    every resolved dst == src, and host_edges drops them all."""
    pages = spark.createDataFrame(pages_pandas(30))
    links = outlinks(pages)
    assert links.count() > 0
    assert links.filter(F.col("dst_host") != F.col("src_host")).count() == 0
    assert host_edges(links).count() == 0


def test_host_edges_counts(spark):
    rows = [
        ("https://a.org/1", b'<a href="https://b.org/x">1</a><a href="https://b.org/y">2</a>'),
        ("https://a.org/2", b'<a href="https://b.org/z">3</a><a href="/self">s</a>'),
    ]
    e = host_edges(outlinks(_pages(spark, rows))).collect()
    assert len(e) == 1
    assert e[0].src_host == "a.org" and e[0].dst_host == "b.org"
    assert e[0].n_links == 3 and e[0].n_pages == 2


# ------------------------------------------------------------- pagerank
def test_pagerank_two_node_closed_form(spark):
    """a→b, b→a with d=0.85 is the symmetric stationary case: every
    iteration keeps rank = 0.5 exactly."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src_host string, dst_host string"
    )
    ranks = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}
    assert ranks == {"a": pytest.approx(0.5), "b": pytest.approx(0.5)}


def test_pagerank_mass_conserved_and_dangling(spark):
    """a→b, a→c, b→c: c is dangling; total mass stays 1.0 and the
    sink c outranks b outranks a. Hand-checked one iteration:
    r=(1/3 each) → a: .05+.85*(1/9)=.1444…, b: .05+.85*(1/6+1/9),
    c gets the most."""
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")],
        "src_host string, dst_host string",
    )
    rows = pagerank(e, iterations=8).collect()
    total = sum(r.rank for r in rows)
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    ranks = {r.node: r.rank for r in rows}
    assert ranks["c"] > ranks["b"] > ranks["a"]


def test_pagerank_empty_and_validation(spark):
    e = spark.createDataFrame([], "src_host string, dst_host string")
    assert pagerank(e, iterations=2).count() == 0
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)


def test_pagerank_duplicate_edges_collapse(spark):
    """Edge multiplicity must not change the result (spam resistance:
    distinct src→dst counts once)."""
    once = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    spammed = once.unionAll(
        spark.createDataFrame(
            [("a", "b")] * 5, "src_host string, dst_host string"
        )
    )
    r1 = {r.node: r.rank for r in pagerank(once, iterations=4).collect()}
    r2 = {r.node: r.rank for r in pagerank(spammed, iterations=4).collect()}
    assert r1 == r2


# ------------------------------------------------- url latest snapshot
def test_latest_snapshot_picks_latest_then_smallest_url(spark):
    from ocrd_segment_spark.functions.urls import latest_snapshot

    rows = [
        ("http://a.org/x?utm_source=1", 10),
        ("HTTP://A.org/x", 20),          # same canon, later ts → wins
        ("http://a.org/x#frag", 20),     # ts tie → smaller raw url wins
        ("http://b.org/y", 5),
    ]
    d = spark.createDataFrame(rows, "url string, warc_ts int")
    out = latest_snapshot(d).collect()
    by_canon = {r.canonical_url: r for r in out}
    assert set(by_canon) == {"http://a.org/x", "http://b.org/y"}
    win = by_canon["http://a.org/x"]
    assert win.warc_ts == 20 and win.url == "HTTP://A.org/x"


# ------------------------------------------------- keep-best resolution
def test_resolve_duplicate_clusters_rules(spark):
    from ocrd_segment_spark.operators.dedup import (
        resolve_duplicate_clusters,
    )

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, component long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)], "doc_id long, score long"
    )
    out = {r.doc_id: r for r in
           resolve_duplicate_clusters(labels, docs).collect()}
    assert len(out) == 4
    # max score wins, tie → min doc id
    assert out[2].keep and not out[3].keep and not out[1].keep
    # singleton (absent from labels) is its own component and kept
    assert out[9].keep and out[9].component == 9
    assert all(out[i].component == 1 for i in (1, 2, 3))


# ------------------------------------------------------------- sharding
def test_shard_by_tokens_packing(spark):
    from ocrd_segment_spark.operators.sampling import (
        shard_by_tokens,
        token_budget_sample,
    )

    d = spark.range(0, 200).selectExpr(
        "id as doc_id", "(id % 13) * 7 + 20 as n_tokens"
    )
    out = shard_by_tokens(d, 500).collect()
    assert len(out) == 200  # nothing dropped
    sizes = {}
    for r in out:
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + r.n_tokens
    # contiguous shard ids from 0
    assert sorted(sizes) == list(range(len(sizes)))
    # cumulative boundary: the first doc of shard k+1 starts at an
    # offset in [500(k+1), 500(k+1) + max_doc) — shards track the
    # 500-token grid to within one straddling document
    max_doc = max(r.n_tokens for r in out)
    running = 0
    for sid in sorted(sizes):
        running += sizes[sid]
        if sid != max(sizes):
            assert 500 * (sid + 1) <= running < 500 * (sid + 1) + max_doc
    assert sum(sizes.values()) == sum(r.n_tokens for r in out)
    # same salt ⇒ shard 0 ∪ {boundary doc} ⊇ the 500-token budget keep
    kept = {r.doc_id for r in token_budget_sample(
        d, 500, salt="shard").collect()}
    shard0 = {r.doc_id for r in out if r.shard_id == 0}
    assert kept <= shard0


def test_shard_by_tokens_edges(spark):
    from ocrd_segment_spark.operators.sampling import shard_by_tokens

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert shard_by_tokens(empty, 100).count() == 0
    with pytest.raises(ValueError):
        shard_by_tokens(empty, 0)
    one = spark.createDataFrame([(1, 10_000)], "doc_id long, n_tokens long")
    rows = shard_by_tokens(one, 100).collect()
    assert rows[0].shard_id == 0  # straddler stays in its start shard


# ----------------------------------------------------------- plan audits
def test_outlink_harvest_is_scan_stage(spark):
    """Outlink harvesting: no Exchange before the explode (per-page
    column math only) and no Python stage anywhere."""
    pages = spark.createDataFrame(pages_pandas(10))
    links = outlinks(pages)
    plan = audit.physical_plan(links)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_by_tokens_has_no_global_window(spark):
    from ocrd_segment_spark.operators.sampling import shard_by_tokens

    d = spark.range(0, 500).selectExpr(
        "id as doc_id", "id % 97 as n_tokens"
    )
    out = shard_by_tokens(d, 1000)
    assert audit.unpartitioned_window_inputs(out) == []
    assert audit.broadcast_join_count(out) >= 1


def test_pagerank_dangling_mass_is_broadcast(spark):
    """The per-round dangling-mass crossJoin must be a broadcast of a
    1-row aggregate, never a shuffled cartesian."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src_host string, dst_host string"
    )
    out = pagerank(e, iterations=1)
    plan = audit.physical_plan(out)
    assert "CartesianProduct" not in plan
