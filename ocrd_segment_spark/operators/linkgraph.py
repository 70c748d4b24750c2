"""Web link-graph operators: outlink extraction, host graph, PageRank.

The reference engine (OCR-D/ocrd_segment) segments isolated documents
and has no notion of links between them; a web corpus does, and a
host-level link graph is the standard quality prior a crawl pipeline
derives from it (Common-Crawl-style host ranks: a page on a
well-linked host is likelier to be worth keeping than one on a link
farm that nothing points at). This module turns the same ``html``
column the extraction kernel parses into that prior:

1. :func:`outlinks` — per page, every ``<a href=...>`` target resolved
   to a destination HOST under a frozen rule (below). Pure JVM regex
   over the raw html (``regexp_extract_all`` + explode) — no Python,
   no parse tree needed: link harvesting tolerates tag soup because it
   only reads attribute values, so the full kernel parse would be
   wasted work here.
2. :func:`host_edges` — the (src_host, dst_host, n_links) aggregate.
3. :func:`pagerank` — fixed-iteration PageRank over those edges with
   uniform teleport and dangling-mass redistribution.

Frozen href→host resolution rule (per link; order matters):
  - ``http://`` / ``https://`` prefix (any case) → the url's host,
    lowercased (same extraction as ``functions.urls.host_of``);
  - protocol-relative ``//host/...`` → that host, lowercased;
  - any OTHER scheme prefix (``mailto:``, ``javascript:``, ``data:``…)
    → dropped (NULL);
  - everything else (rooted or relative path, ``#frag``, ``?q``) →
    the PAGE's own host (self-link).
  Links that resolve to an empty host are dropped.

Scale shape (100 TB): outlink harvesting is a scan-stage column
expression — zero shuffle, rides the same pass that already reads
``html``. ``host_edges`` is one shuffle on (src_host, dst_host) with
map-side partial aggregation; host-grain output is ~10^7..10^8 rows at
crawl scale, orders of magnitude below page grain. ``pagerank``
iterates one shuffle-join per round over host-grain frames with
``localCheckpoint`` per round to keep the plan tree bounded (the
connected_components discipline, operators/dedup.py:408); the
per-round dangling mass is a 1-row aggregate crossJoined back
broadcast-style, never a driver-side float in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# href attribute values of anchor tags; attribute-value harvesting only,
# so tag soup (unclosed tags, stray '<') cannot derail it. Kept in the
# Java-regex/RE2 common subset (no backslash classes, no lookaround) so
# the DuckDB oracle can state the SAME pattern. '<a' must be followed
# by a NON-letter so <abbr href>/<area href>/<audio src.. href> tag
# lookalikes never harvest (review finding: the decoy fix originally
# landed only in outlinks_flagged, making --drop-nofollow change the
# harvested grammar instead of just the follow semantics).
HREF_PATTERN = '<[Aa][^A-Za-z>][^>]*href="([^"]*)"'

# scheme://host — shared shape with functions.urls.host_of
_ABS_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def resolved_host_sql(href: str, src_host: str) -> str:
    """Spark-SQL expression for the frozen href→host rule (module
    docstring). Shared with the DuckDB oracle, which states the same
    CASE over the same patterns."""
    return f"""CASE
      WHEN {href} RLIKE '^[Hh][Tt][Tt][Pp][Ss]?://'
        THEN lower(regexp_extract({href}, '{_ABS_HOST}', 1))
      WHEN {href} RLIKE '^//'
        THEN lower(regexp_extract({href}, '^//([^/:?#]+)', 1))
      WHEN {href} RLIKE '^[A-Za-z][A-Za-z0-9+.-]*:' THEN NULL
      ELSE {src_host}
    END"""


def outlinks(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, src_host, href, dst_host) — one row per anchor href on the
    page, resolved per the frozen rule; scheme-less pages (no
    resolvable src host) and unresolvable hrefs are dropped. Pages
    with no anchors produce no rows (explode, not explode_outer).

    ``html`` may be binary (the input_hint shape) or string; binary is
    reinterpreted as UTF-8 bytes without validation, so malformed
    pages harvest whatever valid anchors they contain instead of
    erroring (pytest pins the no-crash behavior on the F1f fixtures).
    """
    src = F.expr(
        f"lower(regexp_extract({url_col}, '{_ABS_HOST}', 1))"
    ).alias("src_host")
    # explode fused over the regexp expression (CLAUDE.md Generate
    # trap: exploding the derived __hrefs attribute made
    # InferFiltersFromGenerate re-run the full-page regexp per row)
    base = df.select(
        F.col(url_col).alias("url"),
        src,
        F.explode(
            F.expr(
                f"regexp_extract_all(cast({html_col} as string),"
                f" '{HREF_PATTERN}', 1)"
            )
        ).alias("href"),
    )
    return (
        base.filter(F.col("src_host") != "")
        .withColumn("dst_host", F.expr(resolved_host_sql("href", "src_host")))
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
    )


# full anchor element (tag + inner text up to the closing '<'): the
# same attribute-grammar tolerance as HREF_PATTERN, text harvested
# only when it contains no nested element (nested markup → the inner
# text is not one run; frozen OUT rather than approximated)
ANCHOR_PATTERN = '<[Aa][^A-Za-z>][^>]*href="[^"]*"[^>]*>[^<]*'


def anchors(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, src_host, href, dst_host, anchor_text) — one row per
    anchor element with its visible text: the signal web search and
    crawl-quality pipelines aggregate per TARGET (what the web calls a
    page usually describes it better than the page itself). Same
    frozen href→host rule as :func:`outlinks`; anchor_text is the raw
    inner run (leading tag stripped via the first '>'), untrimmed —
    normalization belongs to the aggregation, not the harvest. Same
    scale shape as outlinks: scan-stage column math, zero shuffle."""
    src = F.expr(
        f"lower(regexp_extract({url_col}, '{_ABS_HOST}', 1))"
    ).alias("src_host")
    # explode fused over the regexp (the outlinks Generate-trap note)
    base = df.select(
        F.col(url_col).alias("url"),
        src,
        F.explode(
            F.expr(
                f"regexp_extract_all(cast({html_col} as string),"
                f" '{ANCHOR_PATTERN}', 0)"
            )
        ).alias("__m"),
    )
    return (
        base.filter(F.col("src_host") != "")
        .withColumn(
            "href", F.expr("regexp_extract(__m, 'href=\"([^\"]*)\"', 1)")
        )
        .withColumn(
            "anchor_text", F.expr("regexp_replace(__m, '^[^>]*>', '')")
        )
        .withColumn("dst_host", F.expr(resolved_host_sql("href", "src_host")))
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
        .drop("__m")
    )


def anchor_term_stats(
    anchor_df: DataFrame, k: int = 3, drop_self: bool = True
) -> DataFrame:
    """Top-``k`` anchor terms per DESTINATION host → (dst_host, term,
    n_anchors, rank): the "what does the web call this host" profile.
    Frozen normalization: lowercase, SPACE-split (other whitespace
    stays inside terms — both engines state the same literal split),
    empty terms dropped; ties rank by term ascending. Self-referential anchors
    (intra-host navigation text — "home", "next") are dropped by
    default for the same reason host_edges drops self-edges.

    Scale shape: explode + ONE shuffle on (dst_host, term) with
    map-side partial counts, then a top-k window per dst_host —
    host-grain partitions, and the window ranks (never collects) so a
    mega-host is AQE-skew, not a buffer risk."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W

    a = anchor_df
    if drop_self:
        a = a.filter(F.col("src_host") != F.col("dst_host"))
    terms = (
        a.select(
            "dst_host",
            F.explode(F.split(F.lower("anchor_text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("dst_host", "term")
        .agg(F.count("*").alias("n_anchors"))
    )
    w = W.partitionBy("dst_host").orderBy(
        F.desc("n_anchors"), F.asc("term")
    )
    return (
        terms.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def host_edges(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_host, dst_host, n_links, n_pages) host-grain edge list.
    ``n_links`` counts anchors, ``n_pages`` distinct linking pages.
    Self-edges (intra-host navigation — the bulk of raw anchors) are
    dropped by default: they carry no cross-host endorsement and would
    dominate every host's mass."""
    e = links
    if drop_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("url").alias("n_pages"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (node,
    rank). Frozen semantics (the textbook power iteration, stated so
    the DuckDB oracle can unroll it):

    - edges dedupe to DISTINCT (src, dst) — link multiplicity is a
      spam vector, not an endorsement weight;
    - nodes = union of both endpoints; initial rank = 1/N each;
    - per round: rank' = (1-d)/N + d * (Σ_in rank/outdeg + D/N)
      where D is the total rank mass on dangling nodes (outdeg 0);
    - exactly ``iterations`` rounds, no convergence test — determinism
      over adaptivity (rank users gate on RELATIVE order; a fixed
      small k is the production shape too, per the original paper);
    - ``init_ranks`` (node, rank) WARM-STARTS the iteration from a
      previous crawl's ranks — the incremental form (index_add_batch
      discipline): re-ranking a slightly-grown graph from the old
      fixed point needs far fewer rounds than from uniform. Frozen
      rule: r0 = coalesce(old rank, 1/N) per node, then normalized to
      total mass 1 (a 1-row aggregate crossJoined back broadcast) —
      nodes new to the graph enter at the uniform prior, departed
      nodes' mass vanishes with the normalization.

    Scale shape: every frame here is host-grain. Each round is one
    shuffle join (ranks ⋈ edges on src) + one aggregation on dst; the
    dangling mass is a 1-row aggregate crossJoined back (broadcast by
    AQE — the 1-row-totals pattern of textstats.py). localCheckpoint
    per round bounds the lineage exactly as connected_components does;
    total rank mass stays 1.0 by construction (pytest asserts it).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame([], "node string, rank double")
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
    )
    if init_ranks is None:
        ranks = base.select(
            "node", F.lit(1.0 / n_nodes).alias("rank"), "outdeg"
        ).localCheckpoint()
    else:
        raw = base.join(
            init_ranks.select("node", F.col("rank").alias("__init")),
            "node",
            "left",
        ).withColumn(
            "__raw", F.coalesce("__init", F.lit(1.0 / n_nodes))
        )
        tot = raw.agg(F.sum("__raw").alias("__tot"))
        ranks = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "node",
                (F.col("__raw") / F.col("__tot")).alias("rank"),
                "outdeg",
            )
            .localCheckpoint()
        )
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            e.join(
                ranks.filter(F.col("outdeg") > 0).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        dangling = ranks.filter(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
                "outdeg",
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return ranks.select("node", "rank")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Seeded TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB 2004)
    over a directed host edge list → (node, trust). The spam-demotion
    counterpart of :func:`pagerank`: teleportation is restricted to a
    hand-vetted TRUSTED seed set, so trust flows outward from known-
    good hosts and link farms that no trusted neighborhood references
    score ~0 no matter how densely they interlink.

    Frozen semantics (stated so the DuckDB oracle can unroll it):

    - edges dedupe to DISTINCT (src, dst), exactly like pagerank;
    - the seed vector s is uniform over the seeds PRESENT in the
      graph (``seeds`` rows naming unknown nodes are ignored; an
      empty intersection raises — trust needs at least one anchor);
    - r0 = s;
    - per round: r' = (1-d)·s + d·(Σ_in r/outdeg + D·s) — dangling
      mass D teleports back to the SEEDS, not uniformly, keeping all
      mass inside the trusted flow (total stays 1.0 by construction);
    - exactly ``iterations`` rounds, no convergence test.

    Non-seed hosts with no in-links therefore hold trust 0 (not
    (1-d)/N as in pagerank) — the score separates "reachable from
    trust" from "merely exists", which is the point.

    Scale shape: identical to :func:`pagerank` — host-grain frames,
    one shuffle-join + one aggregation per round, the seed vector is
    a broadcast-joined flag column, dangling mass is a 1-row
    aggregate, ``localCheckpoint`` per round bounds lineage."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    seed_nodes = (
        nodes.join(seeds.select(F.col("node")).distinct(), "node").cache()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        e.unpersist()
        nodes.unpersist()
        seed_nodes.unpersist()
        raise ValueError("trustrank: no seed is present in the graph")
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    svec = F.when(F.col("is_seed"), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))
    base = (
        nodes.join(outdeg, "node", "left")
        .join(seed_nodes.withColumn("is_seed", F.lit(True)), "node", "left")
        .select(
            "node",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
        )
        .cache()
    )
    ranks = base.select("node", "outdeg", "is_seed", svec.alias("trust"))
    ranks = ranks.localCheckpoint()
    for _ in range(iterations):
        contrib = (
            e.join(
                ranks.filter(F.col("outdeg") > 0).select(
                    F.col("node").alias("src"),
                    (F.col("trust") / F.col("outdeg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        dangling = ranks.filter(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("trust"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            ranks.select("node", "outdeg", "is_seed")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "outdeg",
                "is_seed",
                (
                    F.lit(1.0 - damping) * svec
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dmass") * svec
                    )
                ).alias("trust"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    seed_nodes.unpersist()
    base.unpersist()
    return ranks.select("node", "trust")


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over a directed edge list
    → (node, hub, authority). PageRank's complement as a crawl prior:
    authority separates well-cited content hosts from the DIRECTORY
    hosts that cite them (which get hub mass instead) — a frontier
    that seeds from high-authority hosts and expands via high-hub
    hosts covers a crawl faster than rank alone. Frozen semantics
    (stated so the DuckDB oracle can unroll them):

    - edges dedupe to DISTINCT (src, dst) — multiplicity is a spam
      vector (the pagerank rule);
    - nodes = union of both endpoints; h0 = 1/N each;
    - per round: a_j = Σ_{i→j} h_i then L1-normalized (a /= Σa);
      h_i = Σ_{i→j} a_j over the NEW a, then L1-normalized. L1 instead
      of the paper's L2 is a frozen deviation shared by both engines:
      relative order is identical and the normalizer stays a plain SUM
      (partial-aggregable; no sqrt in the reduce);
    - nodes with no in-edges hold authority 0, no out-edges hub 0;
    - exactly ``iterations`` rounds (determinism over adaptivity, the
      pagerank rule); hub/authority round to 6 at the end only.

    Scale shape: host-grain like pagerank — per round two shuffle
    joins (edges ⋈ scores) + two aggregations, each L1 normalizer a
    1-row aggregate crossJoined back broadcast-style;
    ``localCheckpoint`` per round bounds the lineage."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, hub double, authority double"
        )
    scores = nodes.select(
        "node",
        F.lit(1.0 / n_nodes).alias("hub"),
        F.lit(0.0).alias("authority"),
    ).localCheckpoint()
    for i in range(iterations):
        # round-6 restructure: checkpoint the RAW sum tables, not the
        # joined scores — previously the a-side join+agg re-evaluated
        # three times per round (once under each normalizer broadcast,
        # once under the scores checkpoint; plan-verified). With raws
        # materialized, the normalizer broadcasts are single-stage
        # scans and the scores join stays lazy (its inputs are all
        # materialized, so the per-round lineage growth is two tiny
        # joins; a periodic checkpoint below bounds long runs).
        a_raw = (
            e.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
            .localCheckpoint()
        )
        a_tot = a_raw.agg(F.sum("a_raw").alias("__ta"))
        auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "node", (F.col("a_raw") / F.col("__ta")).alias("authority")
        )
        h_raw = (
            e.join(
                auth.select(F.col("node").alias("dst"), "authority"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("h_raw"))
            .localCheckpoint()
        )
        h_tot = h_raw.agg(F.sum("h_raw").alias("__th"))
        hub = h_raw.crossJoin(F.broadcast(h_tot)).select(
            "node", (F.col("h_raw") / F.col("__th")).alias("hub")
        )
        scores = (
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
        )
        if (i + 1) % 8 == 0 and (i + 1) < iterations:
            # bound lineage on long runs without paying a per-round
            # materialization of the full score table
            scores = scores.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return scores.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def link_reciprocity(edges: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host") -> DataFrame:
    """(host, n_out, n_reciprocal, reciprocity) — per source host, the
    fraction of its distinct out-neighbors that link BACK. A classic
    link-spam signal (public practice: organic link neighborhoods are
    mostly one-directional; link farms and exchange rings reciprocate
    near 1.0), consumed the same way as the PageRank floor
    (corpus_job --host-rank-min's shape). Frozen: edges dedupe to
    distinct ordered host pairs first (multiplicity is a spam
    vector), self-edges are ignored by construction of host_edges;
    reciprocity rounds to 6 decimals.

    Scale shape: host-grain throughout — one distinct, one self-join
    of the edge table against its own reversal (equi-join on the
    pair, AQE-planned), one partial-aggregable group on the source."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(
        rev.withColumn("__back", F.lit(True)), ["src", "dst"], "left"
    )
    return marked.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("n_out"),
        F.coalesce(F.sum(F.col("__back").cast("long")), F.lit(0)).alias(
            "n_reciprocal"
        ),
        F.round(
            F.coalesce(F.sum(F.col("__back").cast("long")), F.lit(0))
            * F.lit(1.0)
            / F.count("*"),
            6,
        ).alias("reciprocity"),
    )


# anchor-level rel=nofollow token (value may carry other tokens:
# rel="nofollow noopener") and the page-level meta robots directive —
# both case-insensitive, both in the shared regex subset
NOFOLLOW_REL = '[Rr][Ee][Ll]="[^"]*[Nn][Oo][Ff][Oo][Ll][Ll][Oo][Ww][^"]*"'
# '<a' followed by a NON-letter (never matches <abbr/<area/...);
# the non-letter class avoids whitespace escapes, which the two
# engines' string literals process differently (CLAUDE.md trap)
_A_TAG = "<[Aa][^A-Za-z>][^>]*>"
_META_NOFOLLOW = (
    '<[Mm][Ee][Tt][Aa][^>]*[Nn][Aa][Mm][Ee]="[Rr][Oo][Bb][Oo][Tt][Ss]"'
    '[^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]="[^"]*[Nn][Oo][Ff][Oo][Ll][Ll]'
    '[Oo][Ww][^"]*"'
)


def outlinks_flagged(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, src_host, href, dst_host, nofollow) — :func:`outlinks`
    plus the link-credit signal search engines honor: ``nofollow`` is
    true when the ANCHOR carries a rel token containing ``nofollow``
    (rel="nofollow noopener" counts) OR the PAGE declares
    ``<meta name="robots" content="...nofollow...">`` (which voids
    every edge on the page, per the robots-meta spec). Whole anchor
    TAGS are harvested so attribute order never matters — the
    headmeta/hreflang discipline; tags without an href produce no
    row. Scan-stage column math, zero shuffle.

    At scale, dropping (or discounting) nofollow edges before
    ``host_edges`` keeps comment/forum spam from minting PageRank —
    jobs/linkgraph_job.py exposes it as ``--drop-nofollow``."""
    src = F.expr(
        f"lower(regexp_extract({url_col}, '{_ABS_HOST}', 1))"
    ).alias("src_host")
    # explode fused over the regexp (the outlinks Generate-trap note)
    base = df.select(
        F.col(url_col).alias("url"),
        src,
        F.expr(
            f"cast({html_col} as string) RLIKE '{_META_NOFOLLOW}'"
        ).alias("__page_nofollow"),
        F.explode(
            F.expr(
                f"regexp_extract_all(cast({html_col} as string),"
                f" '{_A_TAG}', 0)"
            )
        ).alias("__t"),
    )
    return (
        base.filter(F.col("src_host") != "")
        .selectExpr(
            "url",
            "src_host",
            f"regexp_extract(__t, '{HREF_PATTERN}', 1) as href",
            f"(__page_nofollow OR __t RLIKE '{NOFOLLOW_REL}') as nofollow",
        )
        .filter(F.col("href") != "")
        .withColumn("dst_host", F.expr(resolved_host_sql("href", "src_host")))
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
        .select("url", "src_host", "href", "dst_host", "nofollow")
    )
