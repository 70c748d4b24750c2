"""HTTP redirect harvesting + chain resolution.

A crawl observes redirects as (page url, 3xx status, Location header)
triples — the WARC source surfaces them as ``http_status`` +
``location`` columns on the canonical pages table. Downstream systems
need the TRANSITIVE mapping: which final resource does each redirecting
url land on, so duplicate collapse, link-graph edges, and the frontier
seen-set all speak final urls instead of hop-one aliases. The reference
engine has no crawl surface (its sources are PAGE-XML/COCO files,
``/root/reference/ocrd_segment/extract_pages.py``); this is part of the
web-scale graft, composing with ``headmeta.canonical_collapse`` (the
HTML half of aliasing) and ``urls.canonicalize_url``.

Frozen rules (both the Spark operators and the DuckDB oracle restate
them):

- an edge exists for rows with ``300 <= http_status <= 399`` and a
  non-empty trimmed Location; the destination is the trimmed value when
  it starts with ``http://`` or ``https://``, or the src's ORIGIN
  (``scheme://authority``, port included — RFC 3986) ``|| value`` when
  it starts with ``/`` (host-relative form); any other shape
  (protocol-relative ``//``, dotted-relative, mailto:, garbage) is
  dropped — RFC 9110 wants an absolute URI and the long tail is not
  worth a grammar;
- one src observed with several destinations (recrawls, A/B redirects)
  collapses to ``min(dst)`` — the deterministic field-wise-min
  tie-break used across the discovery operators;
- resolution follows edges until a node with NO outgoing edge
  (terminal). A chain that reaches a terminal within ``max_hops`` steps
  is resolved with its exact hop count; anything else — cycles
  (self-loops included) and over-cap chains — reports
  ``resolved = false`` with NULL final/hops, never a half-walked url.

Scale shape (100 TB): the edge table is tiny relative to the corpus
(3xx rows only), and resolution is POINTER DOUBLING — round k maps each
src to the node min(2^k, chain-length) steps ahead by self-joining the
mapping on itself, so a ``max_hops`` cap costs ceil(log2(max_hops))
equi-join rounds instead of max_hops sequential joins. Every join keys
on the url; localCheckpoint per round keeps lineage flat (the
connected-components discipline, operators/dedup.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def redirect_edges(
    pages: DataFrame,
    url_col: str = "url",
    status_col: str = "http_status",
    location_col: str = "location",
) -> DataFrame:
    """Pages → the deduplicated redirect edge set (src, dst).

    Scan-stage column math + one partial-aggregable min group; see the
    module docstring for the frozen Location-normalization rule."""
    base = pages.select(
        F.col(url_col).alias("src"),
        F.col(status_col).alias("__status"),
        F.trim(F.col(location_col)).alias("__loc"),
    ).filter(
        F.col("__status").between(300, 399) & (F.col("__loc") != "")
    )
    # [^/?#] keeps the PORT in the origin (RFC 3986): a host-relative
    # Location on https://h:8080/a must rebase onto the :8080 origin
    origin = F.regexp_extract(
        "src", "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1
    )
    dst = (
        F.when(
            F.col("__loc").startswith("http://")
            | F.col("__loc").startswith("https://"),
            F.col("__loc"),
        )
        .when(
            F.col("__loc").startswith("/")
            & ~F.col("__loc").startswith("//"),
            F.concat(origin, F.col("__loc")),
        )
    )
    return (
        base.select("src", dst.alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """Edge set (src, dst) → (src_url, final_url, hops, resolved), one
    row per redirect source.

    Pointer doubling over the functional graph (after the min-dst
    collapse every src has exactly one outgoing edge): mapping M_k
    sends each src to the node min(2^k, L) steps ahead carrying the
    true hop count, and M_{k+1} = M_k composed with itself. After
    ceil(log2(max_hops)) rounds every chain of length <= max_hops has
    fully walked to its terminal; a row whose endpoint still has an
    outgoing edge (cycle / over-2^r chain) or whose hop count exceeds
    the cap reports unresolved."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    m = (
        edges.select(
            F.col("src"), F.col("dst").alias("cur"), F.lit(1).alias("hops")
        )
        .localCheckpoint()
    )
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        step = m.select(
            F.col("src").alias("__s"),
            F.col("cur").alias("__c"),
            F.col("hops").alias("__h"),
        )
        m = (
            m.join(step, m.cur == step.__s, "left")
            .select(
                "src",
                F.coalesce("__c", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("__h", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    srcs = edges.select(F.col("src").alias("__src")).distinct()
    out = m.join(srcs, m.cur == srcs.__src, "left").select(
        F.col("src").alias("src_url"),
        (
            F.col("__src").isNull() & (F.col("hops") <= max_hops)
        ).alias("resolved"),
        "cur",
        "hops",
    )
    return out.select(
        "src_url",
        F.when(F.col("resolved"), F.col("cur")).alias("final_url"),
        F.when(F.col("resolved"), F.col("hops")).alias("hops"),
        "resolved",
    )
