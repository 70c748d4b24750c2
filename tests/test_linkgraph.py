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


# ------------------------------------------------------------- anchors
def test_anchors_text_and_resolution(spark):
    from ocrd_segment_spark.operators.linkgraph import anchors

    html = (
        '<html><body>'
        '<a href="https://other.example.org/x">visible text</a>'
        '<a href="/local">self nav</a>'
        '<a href="https://b.org/n"><b>nested</b> markup</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '</body></html>'
    ).encode()
    out = anchors(
        _pages(spark, [("https://src.example.org/p", html)])
    ).collect()
    by_href = {r.href: r for r in out}
    # mailto dropped (non-http scheme → NULL dst host)
    assert set(by_href) == {
        "https://other.example.org/x", "/local", "https://b.org/n"
    }
    assert by_href["https://other.example.org/x"].anchor_text == "visible text"
    assert by_href["https://other.example.org/x"].dst_host == "other.example.org"
    assert by_href["/local"].dst_host == "src.example.org"
    # nested markup: only the run before the first '<' is harvested
    assert by_href["https://b.org/n"].anchor_text == ""


def test_anchor_term_stats_topk_and_self(spark):
    from ocrd_segment_spark.operators.linkgraph import (
        anchor_term_stats,
        anchors,
    )

    html = (
        '<a href="https://t.org/1">alpha beta</a>'
        '<a href="https://t.org/2">alpha gamma</a>'
        '<a href="https://t.org/3">Alpha  beta</a>'
        '<a href="/self">home nav</a>'
    ).encode()
    a = anchors(_pages(spark, [("https://s.org/p", html)]))
    rows = anchor_term_stats(a, k=2).collect()
    # self-referential anchor dropped: 'home'/'nav' never appear
    assert all(r.dst_host == "t.org" for r in rows)
    got = {(r.term, r.n_anchors, r.rank) for r in rows}
    # lowercased, space-split (double space → empty term dropped),
    # ties rank by term ascending: alpha(3) then beta(2)
    assert got == {("alpha", 3, 1), ("beta", 2, 2)}
    with pytest.raises(ValueError):
        anchor_term_stats(a, k=0)


def test_anchor_harvest_is_scan_stage(spark):
    from ocrd_segment_spark.operators.linkgraph import anchors

    pages = spark.createDataFrame(pages_pandas(10))
    plan = audit.physical_plan(anchors(pages))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


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


# ------------------------------------------------- corpus_job wiring
def _job_pages(spark, tmp_path, rows):
    src = str(tmp_path / "pages")
    spark.createDataFrame(
        rows, "url string, warc_ts long, html binary"
    ).write.parquet(src)
    return src


def _pg(text, extra=""):
    return f"<html><body>{extra}<p>{text}</p></body></html>".encode()


def test_corpus_job_snapshot_outlinks_shards(spark, tmp_path):
    """--snapshot-collapse drops stale captures before extraction,
    --outlinks writes the host graph of the RAW input (stale captures
    included), --shard-tokens writes the partitioned shard layout;
    every counter lands in the fixed-schema funnel."""
    from jobs.corpus_job import build_corpus

    t = "the children were playing in the garden near the river all afternoon"
    link = '<a href="https://other.example.org/x">x</a>'
    rows = [
        # same canonical url, three captures: only ts=30 survives
        ("http://a.org/x?utm_source=1", 10, _pg(t + " capture one", link)),
        ("HTTP://A.org/x", 30, _pg(t + " capture three", link)),
        ("http://a.org/x#frag", 20, _pg(t + " capture two", link)),
        ("http://b.org/y", 5, _pg(t + " another page entirely", link)),
    ]
    src = _job_pages(spark, tmp_path, rows)
    out = str(tmp_path / "corpus")
    edges_path = str(tmp_path / "edges")
    funnel = build_corpus(
        spark, src, out,
        min_quality=0.0, min_tokens=0,
        snapshot_collapse=True,
        outlinks_path=edges_path,
        shard_tokens=10,
    )
    assert funnel["pages"] == 2  # post-collapse
    assert funnel["dropped_stale_snapshot"] == 2
    assert funnel["corpus_docs"] == 2
    kept = {r.url for r in spark.read.parquet(out).select("url").collect()}
    assert kept == {"HTTP://A.org/x", "http://b.org/y"}
    # the link graph saw the RAW input: a.org→other (3 pages) + b.org→other
    edges = {(r.src_host, r.dst_host): (r.n_links, r.n_pages)
             for r in spark.read.parquet(edges_path).collect()}
    assert edges[("a.org", "other.example.org")] == (3, 3)
    assert edges[("b.org", "other.example.org")] == (1, 1)
    assert funnel["outlink_edges"] == 2
    # shard layout: partitioned dir, every corpus doc present exactly once
    sharded = spark.read.parquet(out + "_sharded")
    assert funnel["shards_written"] >= 2  # 10-token shards, ~12-token docs
    assert sharded.count() == 2
    assert {r.url for r in sharded.select("url").collect()} == kept
    assert (tmp_path / "corpus_sharded" / "shard_id=0").exists()


def test_corpus_job_host_rank_floor(spark, tmp_path):
    """--host-ranks + --host-rank-min: pages on hosts ranking below
    the floor drop BEFORE extraction; unranked hosts are kept."""
    from jobs.corpus_job import build_corpus

    t = "she opened the window and watched the quiet street below the house"
    rows = [
        ("https://good.org/a", 1, _pg(t + " first")),
        ("https://spam.org/b", 2, _pg(t + " second")),
        ("https://unranked.org/c", 3, _pg(t + " third")),
    ]
    src = _job_pages(spark, tmp_path, rows)
    ranks_path = str(tmp_path / "ranks")
    spark.createDataFrame(
        [("good.org", 0.5), ("spam.org", 0.001)], "node string, rank double"
    ).write.parquet(ranks_path)
    out = str(tmp_path / "corpus")
    funnel = build_corpus(
        spark, src, out,
        min_quality=0.0, min_tokens=0,
        host_ranks_path=ranks_path, host_rank_min=0.01,
    )
    assert funnel["dropped_host_rank"] == 1
    assert funnel["pages"] == 2
    kept = {r.url for r in spark.read.parquet(out).select("url").collect()}
    assert kept == {"https://good.org/a", "https://unranked.org/c"}
    # flags off → fixed-schema -1 sentinels
    assert funnel["dropped_stale_snapshot"] == -1
    assert funnel["outlink_edges"] == -1
    assert funnel["shards_written"] == -1


def test_link_reciprocity_hand_case(spark):
    from ocrd_segment_spark.operators.linkgraph import link_reciprocity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),  # mutual
            ("a", "c"),              # one-way
            ("a", "b"),              # duplicate edge must not double-count
        ],
        "src_host string, dst_host string",
    )
    got = {
        r["host"]: (r["n_out"], r["n_reciprocal"], r["reciprocity"])
        for r in link_reciprocity(edges).collect()
    }
    assert got == {"a": (2, 1, 0.5), "b": (1, 1, 1.0)}


def test_pagerank_warm_start_mass_and_convergence(spark):
    from ocrd_segment_spark.operators.linkgraph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src_host string, dst_host string",
    )
    # cold fixed point (enough rounds to settle)
    cold = {r["node"]: r["rank"] for r in pagerank(edges, iterations=40).collect()}
    assert abs(sum(cold.values()) - 1.0) < 1e-9
    init = spark.createDataFrame(
        [(n, r) for n, r in cold.items()], "node string, rank double"
    )
    # warm-starting AT the fixed point: one round must stay there
    warm = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=1, init_ranks=init).collect()
    }
    for n in cold:
        assert abs(warm[n] - cold[n]) < 1e-9
    # partial init (new node joins): mass still normalizes to 1
    part = spark.createDataFrame([("a", 0.9)], "node string, rank double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=2, init_ranks=part).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def test_hits_hub_authority_separation(spark):
    from ocrd_segment_spark.operators.linkgraph import hits

    # two pure hubs pointing at one pure authority: by symmetry the
    # hubs split hub mass 0.5/0.5; 'auth' takes all authority
    edges = spark.createDataFrame(
        [("hub1", "auth"), ("hub2", "auth")],
        "src_host string, dst_host string",
    )
    rows = {r["node"]: r for r in hits(edges, iterations=3).collect()}
    assert rows["auth"]["authority"] == 1.0
    assert rows["auth"]["hub"] == 0.0
    assert rows["hub1"]["hub"] == 0.5
    assert rows["hub2"]["hub"] == 0.5
    assert rows["hub1"]["authority"] == 0.0


def test_hits_l1_mass_conserved(spark):
    from ocrd_segment_spark.operators.linkgraph import hits

    edges = spark.range(0, 200).selectExpr(
        "concat('h', cast(id % 11 as string)) as src_host",
        "concat('h', cast((id * 3 + 1) % 13 as string)) as dst_host",
    ).filter("src_host <> dst_host")
    out = hits(edges, iterations=4).collect()
    assert abs(sum(r["hub"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["authority"] for r in out) - 1.0) < 1e-4


def test_hits_multiplicity_ignored(spark):
    from ocrd_segment_spark.operators.linkgraph import hits

    base = [("a", "b"), ("c", "b"), ("a", "d")]
    e1 = spark.createDataFrame(base, "src_host string, dst_host string")
    e2 = spark.createDataFrame(
        base + [("a", "b")] * 5, "src_host string, dst_host string"
    )
    r1 = sorted(map(tuple, hits(e1, iterations=2).collect()))
    r2 = sorted(map(tuple, hits(e2, iterations=2).collect()))
    assert r1 == r2


def test_hits_empty_edges(spark):
    from ocrd_segment_spark.operators.linkgraph import hits

    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert hits(empty, iterations=2).count() == 0


def test_hits_rejects_zero_iterations(spark):
    import pytest as _pytest

    from ocrd_segment_spark.operators.linkgraph import hits

    edges = spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string"
    )
    with _pytest.raises(ValueError):
        hits(edges, iterations=0)


def test_trustrank_mass_and_unreachable_zero(spark):
    """Total trust stays 1.0; a host not reachable from any seed holds
    exactly 0 trust (the spam-demotion contract pagerank cannot make)."""
    from ocrd_segment_spark.operators.linkgraph import trustrank

    # seed s -> a -> b; isolated farm f1 <-> f2 interlinks densely
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("f1", "f2"), ("f2", "f1")],
        "src_host string, dst_host string",
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    out = {r["node"]: r["trust"] for r in trustrank(edges, seeds, iterations=6).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["f1"] == 0.0 and out["f2"] == 0.0
    assert out["s"] > 0 and out["a"] > 0 and out["b"] > 0
    # trust decays along the chain away from the seed
    assert out["s"] > out["a"] > out["b"]


def test_trustrank_dangling_mass_returns_to_seeds(spark):
    """b is dangling: its mass must flow back to the seed, not leak."""
    from ocrd_segment_spark.operators.linkgraph import trustrank

    edges = spark.createDataFrame(
        [("s", "b")], "src_host string, dst_host string"
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    out = {r["node"]: r["trust"] for r in trustrank(edges, seeds, iterations=8).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["s"] > out["b"] > 0


def test_trustrank_validation(spark):
    import pytest as _pytest

    from ocrd_segment_spark.operators.linkgraph import trustrank

    edges = spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string"
    )
    ghost = spark.createDataFrame([("zz",)], "node string")
    with _pytest.raises(ValueError):
        trustrank(edges, ghost)
    with _pytest.raises(ValueError):
        trustrank(edges, ghost, iterations=0)


def test_outlinks_flagged_nofollow(spark):
    from ocrd_segment_spark.operators.linkgraph import outlinks_flagged

    html = (
        '<html><head><meta name="robots" content="index,follow"></head>'
        '<body>'
        '<a href="https://f.org/x">plain</a>'
        '<a rel="nofollow noopener" href="https://n.org/y">nf</a>'
        '<a href="https://m.org/z" rel="NoFollow">order+case</a>'
        '<abbr href="https://decoy.org/d">decoy</abbr>'
        "</body></html>"
    )
    page_nf = html.replace("index,follow", "index,NOFOLLOW")
    df = spark.createDataFrame(
        [
            ("https://s.org/a", bytearray(html.encode())),
            ("https://s.org/b", bytearray(page_nf.encode())),
        ],
        "url string, html binary",
    )
    got = {
        (r["url"], r["dst_host"]): r["nofollow"]
        for r in outlinks_flagged(df).collect()
    }
    assert got == {
        # anchor-level: rel token in any position/value/case
        ("https://s.org/a", "f.org"): False,
        ("https://s.org/a", "n.org"): True,
        ("https://s.org/a", "m.org"): True,
        # page-level meta robots nofollow voids every edge
        ("https://s.org/b", "f.org"): True,
        ("https://s.org/b", "n.org"): True,
        ("https://s.org/b", "m.org"): True,
    }
    # the <abbr href> decoy never produced a row
    assert not any(d == "decoy.org" for (_, d) in got)
