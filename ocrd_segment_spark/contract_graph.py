"""Contract keys for the round-5 web-graph / corpus-layout operators:
link-graph (outlink harvesting → host edges → PageRank), url snapshot
collapse, quality-based duplicate-cluster resolution, and token-
balanced sharding. Same discipline as contract_ml.py: every Spark
query has a DuckDB oracle stating the SAME frozen computation over the
same synthesized inputs (both sides derive their fixtures from the
``documents`` table with identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .contract_ml import (
    O_DEDUP_COMPONENTS,
    O_URL_CANON,
    _D_STR_HASH,
    _D_SYNTH_URL,
)
from .functions.hashing import P


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Link graph: outlink harvesting → host edges
# ---------------------------------------------------------------------------

# Synthetic link corpus: every page links one absolute https target,
# one protocol-relative target, one same-host path, one mailto (must
# drop); every 5th page adds an UPPER-CASED absolute self-link (must
# lowercase → self → dropped by host_edges). Identical arithmetic on
# both sides; Spark casts the html through BINARY to exercise the
# input_hint column shape.
_LINK_HTML = """concat(
  '<html><body>',
  '<a href="https://h', cast((doc_id * 7 + n_chars) % 11 as string), '.example.org/x">out</a>',
  '<A href="//h', cast((doc_id * 3) % 11 as string), '.example.org/y">rel</A>',
  '<a href="/nav/home">self</a>',
  '<a href="mailto:x@example.org">mail</a>',
  CASE WHEN doc_id % 5 = 0
       THEN concat('<a href="HTTP://H', cast(doc_id % 11 as string), '.EXAMPLE.ORG/Z">case</a>')
       ELSE '' END,
  '</body></html>')"""

_D_LINK_HTML = (
    _LINK_HTML.replace("cast((doc_id * 7 + n_chars) % 11 as string)",
                       "CAST((doc_id * 7 + n_chars) % 11 AS VARCHAR)")
    .replace("cast((doc_id * 3) % 11 as string)",
             "CAST((doc_id * 3) % 11 AS VARCHAR)")
    .replace("cast(doc_id % 11 as string)", "CAST(doc_id % 11 AS VARCHAR)")
)

_LINK_URL = "concat('https://h', cast(doc_id % 11 as string), '.example.org/p/', cast(doc_id as string))"
_D_LINK_URL = (
    "'https://h' || CAST(doc_id % 11 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)"
)


def q_outlink_host_edges(spark, sf_dir):
    """Outlink harvesting + host-grain edge aggregate
    (operators/linkgraph.outlinks → host_edges): anchors regex-
    harvested from raw html (binary), each href resolved to a dst host
    under the frozen rule (absolute → its host lowercased; protocol-
    relative → that host; foreign scheme → dropped; relative → own
    host), self-edges dropped, grouped to (src, dst, n_links,
    n_pages). Scan-stage column math + ONE shuffle on the host pair."""
    from .operators.linkgraph import host_edges, outlinks

    pages = _t(spark, sf_dir, "documents").selectExpr(
        f"{_LINK_URL} as url", f"cast({_LINK_HTML} as binary) as html"
    )
    return host_edges(outlinks(pages))


O_OUTLINK_EDGES = f"""
WITH p AS (
  SELECT {_D_LINK_URL} AS url, {_D_LINK_HTML} AS html FROM documents
), l AS (
  SELECT url,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS src_host,
         unnest(regexp_extract_all(html, '<[Aa][^A-Za-z>][^>]*href="([^"]*)"', 1)) AS href
  FROM p
), r AS (
  SELECT url, src_host,
         CASE
           WHEN regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://')
             THEN lower(regexp_extract(href, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
           WHEN regexp_matches(href, '^//')
             THEN lower(regexp_extract(href, '^//([^/:?#]+)', 1))
           WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
           ELSE src_host
         END AS dst_host
  FROM l
  WHERE src_host <> ''
)
SELECT src_host, dst_host, count(*) AS n_links, count(DISTINCT url) AS n_pages
FROM r
WHERE dst_host IS NOT NULL AND dst_host <> '' AND src_host <> dst_host
GROUP BY src_host, dst_host
"""


# ---------------------------------------------------------------------------
# Anchor-text profiles per destination host
# ---------------------------------------------------------------------------

_ANCHOR_HTML = """concat(
  '<html><body>',
  '<a href="https://t', cast(doc_id % 7 as string), '.example.org/x">', source, ' ', lang, '</a>',
  '<a href="//t', cast((doc_id + 3) % 7 as string), '.example.org/y">', substring(text, 1, 20), '</a>',
  '<a href="/self">home nav</a>',
  '</body></html>')"""

_D_ANCHOR_HTML = (
    _ANCHOR_HTML.replace("cast(doc_id % 7 as string)",
                         "CAST(doc_id % 7 AS VARCHAR)")
    .replace("cast((doc_id + 3) % 7 as string)",
             "CAST((doc_id + 3) % 7 AS VARCHAR)")
)


def q_anchor_text_topk(spark, sf_dir):
    """Anchor-text harvesting + per-destination-host top-k terms
    (operators/linkgraph.anchors → anchor_term_stats): anchor elements
    with their visible text, href resolved under the frozen rule,
    self-referential anchors dropped ('home nav' must not appear),
    terms lowercased + space-split, top-3 per dst host with ties by
    term. Explode + one shuffle on (dst_host, term) + host-grain
    top-k window."""
    from .operators.linkgraph import anchor_term_stats, anchors

    pages = _t(spark, sf_dir, "documents").selectExpr(
        f"{_LINK_URL} as url", f"cast({_ANCHOR_HTML} as binary) as html"
    )
    out = anchor_term_stats(anchors(pages), k=3)
    return out.select(
        "dst_host", "term", "n_anchors", F.col("rank").cast("long").alias("rank")
    )


O_ANCHOR_TOPK = f"""
WITH p AS (
  SELECT {_D_LINK_URL} AS url, {_D_ANCHOR_HTML} AS html FROM documents
), l AS (
  SELECT url,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS src_host,
         unnest(regexp_extract_all(html, '<[Aa][^A-Za-z>][^>]*href="[^"]*"[^>]*>[^<]*', 0)) AS m
  FROM p
), r AS (
  SELECT src_host,
         regexp_extract(m, 'href="([^"]*)"', 1) AS href,
         regexp_replace(m, '^[^>]*>', '') AS atext
  FROM l
  WHERE src_host <> ''
), res AS (
  SELECT src_host, atext,
         CASE
           WHEN regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://')
             THEN lower(regexp_extract(href, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
           WHEN regexp_matches(href, '^//')
             THEN lower(regexp_extract(href, '^//([^/:?#]+)', 1))
           WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
           ELSE src_host
         END AS dst_host
  FROM r
), t AS (
  SELECT dst_host, unnest(string_split(lower(atext), ' ')) AS term
  FROM res
  WHERE dst_host IS NOT NULL AND dst_host <> '' AND src_host <> dst_host
), g AS (
  SELECT dst_host, term, count(*) AS n_anchors
  FROM t WHERE term <> '' GROUP BY dst_host, term
)
SELECT dst_host, term, n_anchors, rank FROM (
  SELECT dst_host, term, n_anchors,
         row_number() OVER (PARTITION BY dst_host
                            ORDER BY n_anchors DESC, term ASC) AS rank
  FROM g
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration power method, unrolled in the oracle)
# ---------------------------------------------------------------------------

_PR_ITERATIONS = 4
_PR_DAMPING = 0.85


def q_linkgraph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (operators/linkgraph.pagerank) over a
    synthesized 29-node host graph where nodes h23..h28 appear only as
    destinations — dangling, so the dangling-mass redistribution path
    is exercised, not just the join. The oracle unrolls the identical
    power iteration; final ranks round to 6 decimals (doubles agree to
    ~1e-15 across engines; intermediate ranks stay unrounded)."""
    from .operators.linkgraph import pagerank

    edges = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "concat('h', cast(doc_id % 23 as string)) as src_host",
            "concat('h', cast((doc_id * 7 + n_chars) % 29 as string)) as dst_host",
        )
        .filter("src_host <> dst_host")
    )
    pr = pagerank(edges, iterations=_PR_ITERATIONS, damping=_PR_DAMPING)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _pagerank_oracle(
    iterations: int, damping: float, r0_sql: str | None = None
) -> str:
    """Unrolled power-iteration SQL: r0 = 1/N (or the warm-start
    clause when ``r0_sql`` is given); r[i] = (1-d)/N +
    d*(in-contributions + dangling_mass/N) — the exact frozen formula
    of operators/linkgraph.pagerank, one CTE trio (dangling mass,
    contributions, ranks) per round."""
    default_r0 = """r0 AS (
  SELECT node, outdeg, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
  FROM base
)"""
    head = """WITH e AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
         'h' || CAST((doc_id * 7 + n_chars) % 29 AS VARCHAR) AS dst
  FROM documents
  WHERE 'h' || CAST(doc_id % 23 AS VARCHAR)
        <> 'h' || CAST((doc_id * 7 + n_chars) % 29 AS VARCHAR)
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
base AS (
  SELECT nodes.node, coalesce(deg.outdeg, 0) AS outdeg
  FROM nodes LEFT JOIN deg ON nodes.node = deg.node
),
""" + (r0_sql if r0_sql is not None else default_r0)
    parts = [head]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", d{i} AS (
  SELECT coalesce(sum(rank), CAST(0 AS DOUBLE)) AS dmass
  FROM r{p} WHERE outdeg = 0
), c{i} AS (
  SELECT e.dst AS node, sum(r.rank / CAST(r.outdeg AS DOUBLE)) AS contrib
  FROM e JOIN r{p} r ON e.src = r.node
  WHERE r.outdeg > 0
  GROUP BY e.dst
), r{i} AS (
  SELECT b.node, b.outdeg,
         (CAST(1 AS DOUBLE) - {damping}) / (SELECT n FROM nn)
         + {damping} * (coalesce(c{i}.contrib, CAST(0 AS DOUBLE))
                        + (SELECT dmass FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM base b LEFT JOIN c{i} ON b.node = c{i}.node
)""")
    parts.append(
        f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
    )
    return "".join(parts)


O_LINKGRAPH_PAGERANK = _pagerank_oracle(_PR_ITERATIONS, _PR_DAMPING)


# ---------------------------------------------------------------------------
# URL snapshot collapse (latest capture per canonical url)
# ---------------------------------------------------------------------------

# ~12 docs share each of 40 canonical urls; the raw variants differ
# ONLY in canonically-invisible ways (scheme/host case, default port,
# tracking params, fragment), so canonicalization is what groups them.
_SNAP_URL = """concat(
  CASE doc_id % 2 WHEN 0 THEN 'http://' ELSE 'HTTP://' END,
  CASE doc_id % 3 WHEN 0 THEN 'Example.COM:80' WHEN 1 THEN 'example.com' ELSE 'EXAMPLE.com:80' END,
  '/doc/', cast(doc_id % 40 as string),
  CASE doc_id % 4 WHEN 0 THEN '?utm_source=x' WHEN 1 THEN '?fbclid=z' ELSE '' END,
  CASE doc_id % 5 WHEN 0 THEN '#top' ELSE '' END)"""

_D_SNAP_URL = _SNAP_URL.replace(
    "cast(doc_id % 40 as string)", "CAST(doc_id % 40 AS VARCHAR)"
)


def q_url_latest_snapshot(spark, sf_dir):
    """Snapshot collapse (functions/urls.latest_snapshot): one row per
    canonical url — the greatest capture "timestamp" (doc_id stands in
    for warc_ts: any orderable column), ties to the smallest raw url.
    The oracle reruns the FULL canonicalization chain (the url_canonicalize
    oracle, resynthesized) so the grouping key is the tested chain,
    not a shortcut."""
    from .functions.urls import latest_snapshot

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_SNAP_URL} as url"
    )
    out = latest_snapshot(d, url_col="url", ts_col="doc_id")
    return out.select("canonical_url", "url", "doc_id")


O_URL_SNAPSHOT = f"""
WITH cu AS (
{O_URL_CANON.replace(_D_SYNTH_URL, _D_SNAP_URL)}
), r AS (
  SELECT doc_id, url, canonical_url,
         row_number() OVER (PARTITION BY canonical_url
                            ORDER BY doc_id DESC, url ASC) AS rn
  FROM cu
)
SELECT canonical_url, url, doc_id FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution by quality
# ---------------------------------------------------------------------------

def q_dedup_keep_best(spark, sf_dir):
    """Quality-based cluster resolution
    (operators/dedup.resolve_duplicate_clusters) composed on the full
    LSH → connected-components pipeline of dedup_components: every doc
    gets its component (singletons are their own), the best-scoring
    member (score = n_chars, ties → min doc id) is kept, the rest are
    the drop list. The oracle extends the components oracle's
    recursive closure with the same window."""
    from .operators import dedup as D

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text", "n_chars").unionAll(
        d.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "n_chars"
        )
    )
    pairs = D.minhash_lsh_candidates(
        corpus.select("doc_id", "text"), k=8, bands=4
    )
    labels = D.connected_components(pairs)
    return D.resolve_duplicate_clusters(
        labels, corpus.select("doc_id", "n_chars"), score_col="n_chars"
    )


O_DEDUP_KEEP_BEST = O_DEDUP_COMPONENTS.replace(
    "SELECT a AS doc_id, least(a, min(b)) AS component\nFROM reach GROUP BY a",
    """, comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS component
  FROM reach GROUP BY a
), docs2 AS (
  SELECT doc_id, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, n_chars FROM documents WHERE doc_id % 50 = 0
), lab AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, d.n_chars
  FROM docs2 d LEFT JOIN comp c ON d.doc_id = c.doc_id
), rk AS (
  SELECT doc_id, component, n_chars,
         row_number() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM lab
)
SELECT doc_id, component, rn = 1 AS keep FROM rk""",
)


# ---------------------------------------------------------------------------
# Token-balanced sharding
# ---------------------------------------------------------------------------

_D_SHARD_B = (
    "(("
    + _D_STR_HASH.format(s="concat('shard', CAST(doc_id AS VARCHAR))")
    + f") * 48271 + 11) % {P} % 1000000"
)

_SHARD_TOKENS = 20000


def q_shard_by_tokens(spark, sf_dir):
    """Token-balanced shard assignment
    (operators/sampling.shard_by_tokens): documents in (hashed key,
    key) order; shard = starting-offset div shard_tokens. Spark runs
    the distributed prefix-sum; the oracle states the one global
    running sum it must equal exactly."""
    from .operators.sampling import shard_by_tokens

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "cast(length(text) as bigint) as n_tokens"
    )
    return shard_by_tokens(d, _SHARD_TOKENS).select(
        "doc_id", "n_tokens", "shard_id"
    )


O_SHARD_BY_TOKENS = f"""
WITH d AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_tokens,
         {_D_SHARD_B} AS b
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY b ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
FROM c
"""


# ---------------------------------------------------------------------------
# Head metadata: canonical link + robots meta → canonical collapse
# ---------------------------------------------------------------------------

# Synthetic head-metadata corpus over `documents` (d = doc_id):
#   d%3=0 (leaders): rooted self-canonical `/p/d` when d even, no
#     canonical when odd;
#   d%3=1: href-before-rel UPPER-CASED attribute names pointing at the
#     leader d-1 — except d%9=1, a mailto: canonical (unresolvable);
#   d%3=2: protocol-relative canonical at the leader d-2;
#   d%11=0: robots noindex meta (name-first);  d%11=5: index,follow
#     (content-before-name order).
# The oracle never runs the regexes: it derives the EXPECTED harvest /
# collapse from the same arithmetic — an independent derivation, so a
# harvest-regex bug cannot cancel out on both sides.

_HM_URL = "concat('https://h', cast(doc_id % 7 as string), '.example.org/p/', cast(doc_id as string))"
_D_HM_URL = "'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)"

_HM_HTML = """concat('<html><head>',
  CASE
    WHEN doc_id % 3 = 0 THEN IF(doc_id % 2 = 0,
        concat('<link rel="canonical" href="/p/', cast(doc_id as string), '">'), '')
    WHEN doc_id % 3 = 1 THEN IF(doc_id % 9 = 1,
        '<link rel="canonical" href="mailto:x@example.org">',
        concat('<LINK HREF="https://h', cast((doc_id - 1) % 7 as string),
               '.example.org/p/', cast(doc_id - 1 as string), '" rel="canonical">'))
    ELSE concat('<link rel="canonical" href="//h', cast((doc_id - 2) % 7 as string),
                '.example.org/p/', cast(doc_id - 2 as string), '">')
  END,
  CASE WHEN doc_id % 11 = 0 THEN '<meta name="robots" content="NOINDEX, nofollow">'
       WHEN doc_id % 11 = 5 THEN '<meta content="index, follow" name="robots">'
       ELSE '' END,
  '</head><body>t</body></html>')"""

# the expected harvest, stated as arithmetic (DuckDB dialect)
_D_HM_LEADER1 = "'https://h' || CAST((doc_id - 1) % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id - 1 AS VARCHAR)"
_D_HM_LEADER2 = "'https://h' || CAST((doc_id - 2) % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id - 2 AS VARCHAR)"

_D_HM_CANON_URL = f"""CASE
  WHEN doc_id % 3 = 0 THEN CASE WHEN doc_id % 2 = 0 THEN {_D_HM_URL} END
  WHEN doc_id % 3 = 1 THEN CASE WHEN doc_id % 9 = 1 THEN NULL ELSE {_D_HM_LEADER1} END
  ELSE {_D_HM_LEADER2}
END"""


def q_head_meta_harvest(spark, sf_dir):
    """Head-metadata harvest (operators/headmeta.head_meta): first
    canonical href (both attribute orders, case-insensitive names) and
    first robots content per page, canonical target resolved under the
    frozen rule (absolute kept; protocol-relative + page scheme;
    rooted + page origin; foreign scheme / relative → NULL). Pure
    scan-stage column math over binary html; the oracle derives the
    expected values from the fixture arithmetic without regexes."""
    from .operators.headmeta import head_meta

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HM_URL} as url", f"cast({_HM_HTML} as binary) as html"
    )
    return head_meta(pages).select(
        "doc_id", "url", "canonical_href", "canonical_url", "robots", "noindex"
    )


O_HEAD_META = f"""
SELECT doc_id,
       {_D_HM_URL} AS url,
       CASE
         WHEN doc_id % 3 = 0 THEN CASE WHEN doc_id % 2 = 0 THEN '/p/' || CAST(doc_id AS VARCHAR) END
         WHEN doc_id % 3 = 1 THEN CASE WHEN doc_id % 9 = 1 THEN 'mailto:x@example.org'
              ELSE {_D_HM_LEADER1} END
         ELSE '//h' || CAST((doc_id - 2) % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id - 2 AS VARCHAR)
       END AS canonical_href,
       {_D_HM_CANON_URL} AS canonical_url,
       CASE WHEN doc_id % 11 = 0 THEN 'NOINDEX, nofollow'
            WHEN doc_id % 11 = 5 THEN 'index, follow' END AS robots,
       (doc_id % 11 = 0) AS noindex
FROM documents
"""


def q_canonical_collapse(spark, sf_dir):
    """Canonical-URL collapse (operators/headmeta.canonical_collapse):
    noindex pages dropped, remaining pages grouped by their resolved
    canonical target (own url when none), ONE representative kept per
    group via a partial-aggregable min(struct(self-first, url)) — no
    per-group sort, skew-safe. One shuffle on the group key."""
    from .operators.headmeta import canonical_collapse

    pages = _t(spark, sf_dir, "documents").selectExpr(
        f"{_HM_URL} as url", f"cast({_HM_HTML} as binary) as html"
    )
    return canonical_collapse(pages)


O_CANONICAL_COLLAPSE = f"""
WITH m AS (
  SELECT {_D_HM_URL} AS url,
         {_D_HM_CANON_URL} AS canonical_url,
         (doc_id % 11 = 0) AS noindex
  FROM documents
), g AS (
  SELECT coalesce(canonical_url, url) AS group_key, url,
         (canonical_url IS NULL OR canonical_url = url) AS is_self
  FROM m WHERE NOT noindex
)
SELECT group_key AS canonical_url,
       coalesce(min(url) FILTER (WHERE is_self), min(url)) AS url,
       count(*) AS n_pages,
       CAST(sum(CASE WHEN is_self THEN 1 ELSE 0 END) AS BIGINT) AS n_self
FROM g GROUP BY group_key
"""


# ---------------------------------------------------------------------------
# Inverted index + BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_QUERY = ["spark", "window", "join"]
_BM25_K = 15


def q_inverted_postings(spark, sf_dir):
    """Inverted postings (operators/index.build_postings): (term,
    doc_id, tf) under the corpus-wide frozen tokenization (lowercase
    space-split, empties dropped — the token-count discipline).
    Explode + ONE shuffle with map-side partial counts."""
    from .operators.index import build_postings

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return build_postings(docs)


O_INVERTED_POSTINGS = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents
)
SELECT term, doc_id, count(*) AS tf FROM t GROUP BY term, doc_id
"""


def q_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (operators/index.bm25_topk) for a fixed
    3-term query over the postings of `documents`. The frozen Lucene
    form: idf = ln(1+(N-df+.5)/(df+.5)), tf-saturation k1=1.2, length
    normalization b=0.75; score rounded to 6 (doubles agree to ~1e-15
    across engines), ties broken by doc_id. Query-term IN prunes the
    postings before ANY aggregate; N/avgdl ride a 1-row broadcast."""
    from .operators.index import build_postings, bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(build_postings(docs), _BM25_QUERY, k=_BM25_K)


O_BM25_TOPK = f"""
WITH p AS (
  SELECT term, doc_id, count(*) AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
    FROM documents
  ) GROUP BY term, doc_id
), dl AS (
  SELECT doc_id, sum(tf) AS dl FROM p GROUP BY doc_id
), c AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), cand AS (
  SELECT * FROM p WHERE term IN ('join', 'spark', 'window')
), dft AS (
  SELECT term, count(DISTINCT doc_id) AS df_t FROM cand GROUP BY term
)
SELECT doc_id,
       round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                 * tf * (1.2 + 1.0)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
FROM cand JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN c
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {_BM25_K}
"""


# ---------------------------------------------------------------------------
# Bloom-filter url seen-set
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 16
_BLOOM_K = 4

# DuckDB twins of bloom.bloom_positions_sql's frozen family
_D_H = _D_STR_HASH.format(s="url")
_D_POS = f"((2*i + 3) * {_D_H} + 5*i + 7) % {P} % {_BLOOM_M}"


def q_bloom_seen_probe(spark, sf_dir):
    """Bloom seen-set (operators/bloom): filter built over the even
    doc_ids' urls (m=2^16, k=4 — small enough that the probe exercises
    real collisions), probed with ALL urls. Every inserted url MUST be
    maybe_seen (no false negatives); non-inserted urls get the exact
    deterministic collision outcome — the oracle restates the identical
    position family, so false positives match bit-for-bit. Build = one
    filter-sized shuffle (map-side partial bit_or); probe = broadcast
    lookups + probe-sized shuffles only."""
    from .operators.bloom import bloom_maybe_seen, build_bloom

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HM_URL} as url"
    )
    bloom = build_bloom(
        docs.filter("doc_id % 2 = 0"), m_bits=_BLOOM_M, k=_BLOOM_K
    )
    return bloom_maybe_seen(
        bloom, docs, m_bits=_BLOOM_M, k=_BLOOM_K
    ).select("doc_id", "url", "maybe_seen")


O_BLOOM_SEEN_PROBE = f"""
WITH ins AS (
  SELECT {_D_HM_URL} AS url FROM documents WHERE doc_id % 2 = 0
), ipos AS (
  SELECT {_D_POS} AS pos FROM (SELECT url, unnest([0,1,2,3]) AS i FROM ins)
), w AS (
  SELECT pos // 32 AS word_id,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM ipos GROUP BY pos // 32
), pr AS (
  SELECT doc_id, {_D_HM_URL} AS url FROM documents
), ppos AS (
  SELECT doc_id, url, {_D_POS} AS pos
  FROM (SELECT doc_id, url, unnest([0,1,2,3]) AS i FROM pr)
), hit AS (
  SELECT doc_id, url,
         CASE WHEN coalesce(bits & (1::BIGINT << CAST(pos % 32 AS INT)), 0) != 0
              THEN 1 ELSE 0 END AS hit
  FROM ppos LEFT JOIN w ON ppos.pos // 32 = w.word_id
)
SELECT doc_id, url, min(hit) = 1 AS maybe_seen
FROM hit GROUP BY doc_id, url
"""


# ---------------------------------------------------------------------------
# hreflang alternate clusters
# ---------------------------------------------------------------------------

# Translation groups of 3 (g = doc_id div 3; members de/en/fr by
# doc_id % 3). Members of g % 4 = 1 declare NOTHING (singletons); the
# rest declare all three members — de absolute, en protocol-relative
# (upper-cased attrs with hreflang-before-href on even doc_ids), fr
# rooted — plus an unresolvable mailto and a non-alternate stylesheet
# that must both be ignored. The oracle derives expected clusters from
# the same arithmetic, never running the harvest.

_HL_G = "doc_id div 3"
_HL_LANG = "CASE doc_id % 3 WHEN 0 THEN 'de' WHEN 1 THEN 'en' ELSE 'fr' END"
_HL_URL = f"concat('https://x.example.org/', {_HL_LANG}, '/p/', cast({_HL_G} as string))"

_HL_HTML = f"""concat('<html><head>',
  CASE WHEN ({_HL_G}) % 4 = 1 THEN ''
  ELSE concat(
    '<link rel="alternate" hreflang="de" href="https://x.example.org/de/p/', cast({_HL_G} as string), '">',
    CASE WHEN doc_id % 2 = 0
         THEN concat('<LINK HREFLANG="en" HREF="//x.example.org/en/p/', cast({_HL_G} as string), '" REL="Alternate">')
         ELSE concat('<link rel="alternate" hreflang="en" href="//x.example.org/en/p/', cast({_HL_G} as string), '">')
    END,
    '<link rel="alternate" hreflang="fr" href="/fr/p/', cast({_HL_G} as string), '">',
    '<link rel="alternate" hreflang="zz" href="mailto:x@y.z">',
    '<link rel="stylesheet" href="/s.css">')
  END, '</head><body>t</body></html>')"""


def q_hreflang_clusters(spark, sf_dir):
    """hreflang translation clusters (operators/headmeta.
    hreflang_clusters): cluster key = least url among self + resolved
    alternates, computed as ROW-LOCAL column math (zero shuffle, no
    graph iteration when declarations are consistent). Exercises both
    attribute orders, case-insensitive names, all three resolution
    arms, unresolvable + non-alternate tags ignored, and singleton
    fallback."""
    from .operators.headmeta import hreflang_clusters

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_HL_URL} as url",
        f"cast({_HL_HTML} as binary) as html",
    )
    return hreflang_clusters(pages).select(
        F.col("url"), "cluster_key", "n_alternates"
    )


O_HREFLANG_CLUSTERS = """
WITH b AS (
  SELECT doc_id, doc_id // 3 AS g,
         CASE doc_id % 3 WHEN 0 THEN 'de' WHEN 1 THEN 'en' ELSE 'fr' END AS lang
  FROM documents
)
SELECT 'https://x.example.org/' || lang || '/p/' || CAST(g AS VARCHAR) AS url,
       CASE WHEN g % 4 = 1
            THEN 'https://x.example.org/' || lang || '/p/' || CAST(g AS VARCHAR)
            ELSE 'https://x.example.org/de/p/' || CAST(g AS VARCHAR) END AS cluster_key,
       CASE WHEN g % 4 = 1 THEN 0 ELSE 3 END AS n_alternates
FROM b
"""


# ---------------------------------------------------------------------------
# robots.txt parsing + frontier filter
# ---------------------------------------------------------------------------

# Five synthetic robots.txt bodies (hosts h0..h4.example.org),
# exercising comments, CRLF, a two-line agent run (Bing + *), value
# trimming, an unknown directive, the empty-Disallow idiom (host 3),
# and a non-wildcard group whose rules must NOT leak. The oracle
# states the EXPECTED rules/decisions from the same arithmetic — it
# never parses.

_RB_HOST = "concat('h', cast(doc_id as string), '.example.org')"
_RB_BODY = """concat(
  '# crawl policy', chr(10),
  CASE WHEN doc_id % 2 = 0 THEN concat('User-Agent: Bing', chr(10)) ELSE '' END,
  'USER-AGENT: *', chr(13), chr(10),
  'Disallow: ', CASE WHEN doc_id = 3 THEN '' ELSE concat('/p', cast(doc_id as string), '/') END, chr(10),
  'Crawl-delay: 5', chr(10),
  'Allow:  /p', cast(doc_id as string), '/ok  # inline comment', chr(10),
  'User-agent: google', chr(10),
  'Disallow: /all/', chr(10))"""


def q_robots_rules_parse(spark, sf_dir):
    """robots.txt parsing (operators/robots.parse_robots): wildcard-
    agent groups only, frozen REP-subset grammar (module docstring).
    Column math + one host-grain window pass over KB-bounded bodies."""
    from .operators.robots import parse_robots

    robots = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id < 5")
        .selectExpr(
            f"{_RB_HOST} as host", f"cast({_RB_BODY} as binary) as body"
        )
    )
    return parse_robots(robots)


O_ROBOTS_RULES = """
WITH h AS (SELECT doc_id AS d FROM documents WHERE doc_id < 5)
SELECT 'h' || CAST(d AS VARCHAR) || '.example.org' AS host,
       'allow' AS rule,
       '/p' || CAST(d AS VARCHAR) || '/ok' AS path
FROM h
UNION ALL
SELECT 'h' || CAST(d AS VARCHAR) || '.example.org',
       'disallow',
       '/p' || CAST(d AS VARCHAR) || '/'
FROM h WHERE d <> 3
"""

_RB_H = "cast(doc_id % 5 as string)"
_RB_URL = f"""concat('https://h', {_RB_H}, '.example.org',
  CASE doc_id % 4
    WHEN 0 THEN concat('/p', {_RB_H}, '/ok/page')
    WHEN 1 THEN concat('/p', {_RB_H}, '/secret')
    WHEN 2 THEN '/other'
    ELSE concat('/p', {_RB_H}, '/ok') END)"""

_D_RB_H = "CAST(doc_id % 5 AS VARCHAR)"
_D_RB_URL = f"""'https://h' || {_D_RB_H} || '.example.org' ||
  CASE doc_id % 4
    WHEN 0 THEN '/p' || {_D_RB_H} || '/ok/page'
    WHEN 1 THEN '/p' || {_D_RB_H} || '/secret'
    WHEN 2 THEN '/other'
    ELSE '/p' || {_D_RB_H} || '/ok' END"""


def q_robots_frontier_filter(spark, sf_dir):
    """Frontier filter (operators/robots.robots_allowed): longest-
    match REP decision per url — /ok paths out-match the broader
    disallow, unruled hosts and unmatched paths default to allowed,
    host 3 (empty Disallow) allows everything. Host equi-join + one
    partial-aggregable max(struct); no window."""
    from .operators.robots import parse_robots, robots_allowed

    robots = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id < 5")
        .selectExpr(
            f"concat('h', cast(doc_id as string), '.example.org') as host",
            f"cast({_RB_BODY} as binary) as body",
        )
    )
    urls = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_RB_URL} as url"
    )
    return robots_allowed(parse_robots(robots), urls).select(
        "doc_id", "url", "robots_allowed"
    )


O_ROBOTS_FRONTIER = f"""
SELECT doc_id, {_D_RB_URL} AS url,
       NOT (doc_id % 4 = 1 AND doc_id % 5 <> 3) AS robots_allowed
FROM documents
"""


# ---------------------------------------------------------------------------
# page metadata: title / description / OpenGraph
# ---------------------------------------------------------------------------

_PM_HTML = """concat('<html><head>',
  CASE WHEN doc_id % 7 = 0 THEN ''
       ELSE concat('<title> T', chr(10), '  ', cast(doc_id as string), ' </title>') END,
  CASE doc_id % 3
    WHEN 0 THEN concat('<meta name="description" content="D', cast(doc_id as string), '">')
    WHEN 1 THEN concat('<meta content="D', cast(doc_id as string), '" name="description">')
    ELSE '' END,
  CASE doc_id % 4
    WHEN 0 THEN concat('<meta property="og:title" content="OT', cast(doc_id as string), '">')
    WHEN 2 THEN concat('<META CONTENT="OT', cast(doc_id as string), '" PROPERTY="og:title">')
    ELSE '' END,
  CASE WHEN doc_id % 5 = 0
       THEN concat('<meta property="og:description" content="OD ', cast(doc_id as string), '">')
       ELSE '' END,
  '</head><body>t</body></html>')"""


def q_page_meta_harvest(spark, sf_dir):
    """Descriptive head metadata (operators/headmeta.page_meta):
    title (whitespace-normalized, spanning a newline in the fixture),
    meta description and og:title/og:description under both attribute
    orders and mixed case, absent fields NULL. Scan-stage column math;
    the oracle derives every field from the fixture arithmetic."""
    from .operators.headmeta import page_meta

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HM_URL} as url", f"cast({_PM_HTML} as binary) as html"
    )
    return page_meta(pages).select(
        "doc_id", "title", "meta_description", "og_title", "og_description"
    )


O_PAGE_META = """
SELECT doc_id,
  CASE WHEN doc_id % 7 = 0 THEN NULL
       ELSE 'T ' || CAST(doc_id AS VARCHAR) END AS title,
  CASE WHEN doc_id % 3 IN (0, 1) THEN 'D' || CAST(doc_id AS VARCHAR) END AS meta_description,
  CASE WHEN doc_id % 4 IN (0, 2) THEN 'OT' || CAST(doc_id AS VARCHAR) END AS og_title,
  CASE WHEN doc_id % 5 = 0 THEN 'OD ' || CAST(doc_id AS VARCHAR) END AS og_description
FROM documents
"""


# ---------------------------------------------------------------------------
# packed training sequences
# ---------------------------------------------------------------------------

_PACK_B = (
    "(("
    + _D_STR_HASH.format(s="concat('pack', CAST(doc_id AS VARCHAR))")
    + f") * 48271 + 11) % {P} % 1000000"
)
_PACK_L = 1000


def q_pack_sequences(spark, sf_dir):
    """Packed-sequence manifest (operators/sampling.pack_sequences):
    documents concatenate in the frozen (hashed key, key) order into a
    token stream sliced into L-token sequences, docs splitting AT
    boundaries — one row per (doc, sequence) overlap with exact slice
    offsets. Spark runs the shared distributed prefix-sum + a
    row-local overlap explode; the oracle states the one global
    running sum + generate_series it must equal exactly."""
    from .operators.sampling import pack_sequences

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "cast(length(text) as bigint) as n_tokens"
    )
    return pack_sequences(d, _PACK_L).select(
        "doc_id", "n_tokens", "seq_id", "doc_from", "doc_to", "seq_offset"
    )


O_PACK_SEQUENCES = f"""
WITH d AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_tokens,
         {_PACK_B} AS b
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY b ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
), s AS (
  SELECT doc_id, n_tokens, cum, cum - n_tokens AS strt
  FROM c WHERE n_tokens > 0
), o AS (
  SELECT doc_id, n_tokens, strt,
         unnest(generate_series(CAST(strt // {_PACK_L} AS BIGINT), CAST((cum - 1) // {_PACK_L} AS BIGINT))) AS seq_id
  FROM s
)
SELECT doc_id, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(0, seq_id * {_PACK_L} - strt) AS BIGINT) AS doc_from,
       CAST(least(n_tokens, (seq_id + 1) * {_PACK_L} - strt) AS BIGINT) AS doc_to,
       CAST(greatest(0, strt - seq_id * {_PACK_L}) AS BIGINT) AS seq_offset
FROM o
"""


# ---------------------------------------------------------------------------
# incremental postings extension
# ---------------------------------------------------------------------------


def q_index_add_batch(spark, sf_dir):
    """Incremental index extension (operators/index.index_add_batch):
    base index over the even doc_ids; the batch is every doc_id % 3 =
    0 document UNIONED WITH a corrupted duplicate of itself ('~'-
    prefixed text — the within-batch min-text rule must keep the
    original), overlapping ids (doc_id % 6 = 0) skipped by the
    anti-join. The returned delta must equal a from-scratch build
    over exactly the fresh documents — the oracle states that build
    directly, never running the merge."""
    from .operators.index import build_postings, index_add_batch

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = build_postings(docs.filter("doc_id % 2 = 0"))
    batch = docs.filter("doc_id % 3 = 0").unionAll(
        docs.filter("doc_id % 3 = 0").selectExpr(
            "doc_id", "concat('~', text) as text"
        )
    )
    return index_add_batch(base, batch)


O_INDEX_ADD_BATCH = """
WITH fresh AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 2 <> 0
), t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM fresh
)
SELECT term, doc_id, count(*) AS tf FROM t GROUP BY term, doc_id
"""


# ---------------------------------------------------------------------------
# unit-grain Bloom dedup (Dolma-style paragraph seen-set)
# ---------------------------------------------------------------------------

_UB_M = 1 << 14
# unit j of doc d = 'u'||(d*4+j) — injective, so exactly the even
# docs' units are inserted and every odd doc's hit is a bloom
# collision, deterministic on both sides
_UB_TEXT = (
    "concat_ws('|', transform(sequence(0, 3),"
    " j -> concat('u', cast(doc_id * 4 + j as string))))"
)
_D_UB_UNIT = "'u' || CAST(doc_id * 4 + j AS VARCHAR)"
_D_UB_H = _D_STR_HASH.format(s="unit")
_D_UB_POS = f"((2*i + 3) * {_D_UB_H} + 5*i + 7) % {P} % {_UB_M}"


def q_paragraph_bloom_flags(spark, sf_dir):
    """Unit-grain Bloom seen-set (operators/bloom.build_unit_bloom +
    unit_seen_stats): filter built over the even docs' '|'-separated
    units, all docs probed — (n_units, n_units_seen, seen_unit_frac)
    per doc. Inserted units always count (no false negatives); odd
    docs' hits are the filter's deterministic collisions, which the
    oracle reproduces bit-for-bit from the same position family."""
    from .operators.bloom import build_unit_bloom, unit_seen_stats

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_UB_TEXT} as text"
    )
    bloom = build_unit_bloom(
        docs.filter("doc_id % 2 = 0"), sep="|", m_bits=_UB_M, k=4
    )
    return unit_seen_stats(bloom, docs, sep="|", m_bits=_UB_M, k=4)


O_PARAGRAPH_BLOOM = f"""
WITH cu AS (
  SELECT DISTINCT {_D_UB_UNIT} AS unit
  FROM documents, (SELECT unnest([0,1,2,3]) AS j) WHERE doc_id % 2 = 0
), ip AS (
  SELECT {_D_UB_POS} AS pos
  FROM cu, (SELECT unnest([0,1,2,3]) AS i)
), w AS (
  SELECT pos // 32 AS word_id,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM ip GROUP BY pos // 32
), pu AS (
  SELECT doc_id, j, {_D_UB_UNIT} AS unit
  FROM documents, (SELECT unnest([0,1,2,3]) AS j)
), pp AS (
  SELECT doc_id, j, {_D_UB_POS} AS pos
  FROM pu, (SELECT unnest([0,1,2,3]) AS i)
), hit AS (
  SELECT doc_id, j,
         min(CASE WHEN coalesce(bits & (1::BIGINT << CAST(pos % 32 AS INT)), 0) <> 0
                  THEN 1 ELSE 0 END) AS s
  FROM pp LEFT JOIN w ON pp.pos // 32 = w.word_id
  GROUP BY doc_id, j
)
SELECT doc_id, count(*) AS n_units,
       CAST(sum(s) AS BIGINT) AS n_units_seen,
       round(sum(s) / (count(*) * 1.0), 6) AS seen_unit_frac
FROM hit GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# cross-snapshot corpus diff (operators/snapshots.corpus_diff)
# ---------------------------------------------------------------------------

# previous corpus = doc_id % 7 <> 0; new snapshot = doc_id % 5 <> 0 —
# so %7-only docs read 'added', %5-only 'removed'. Every 3rd doc's
# text gains a '+' in the new snapshot (changed); %13 docs carry NULL
# text on the prev side and, when even, on the cur side too — the
# NULL-vs-NULL unchanged and NULL-vs-text changed arms both fire.
_DIFF_PREV_TEXT = "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END"
_DIFF_CUR_TEXT = (
    "CASE WHEN doc_id % 13 = 0 AND doc_id % 2 = 0 THEN NULL"
    " WHEN doc_id % 3 = 0 THEN concat(text, '+') ELSE text END"
)


def q_corpus_diff(spark, sf_dir):
    """Snapshot-over-snapshot corpus delta (operators/snapshots.
    corpus_diff): full-outer pairing on the url key with scan-side md5
    digests — added / removed / changed / unchanged per the frozen
    null-safe rule. The shuffle carries (key, digest), never text."""
    from .operators.snapshots import corpus_diff

    d = _t(spark, sf_dir, "documents")
    prev = d.filter("doc_id % 7 <> 0").selectExpr(
        "concat('u', cast(doc_id as string)) as url",
        f"{_DIFF_PREV_TEXT} as text",
    )
    cur = d.filter("doc_id % 5 <> 0").selectExpr(
        "concat('u', cast(doc_id as string)) as url",
        f"{_DIFF_CUR_TEXT} as text",
    )
    return corpus_diff(prev, cur)


O_CORPUS_DIFF = f"""
WITH prev AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS key,
         md5({_DIFF_PREV_TEXT}) AS prev_digest
  FROM documents WHERE doc_id % 7 <> 0
), cur AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS key,
         md5({_DIFF_CUR_TEXT}) AS cur_digest
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT coalesce(prev.key, cur.key) AS key,
       CASE WHEN prev.key IS NULL THEN 'added'
            WHEN cur.key IS NULL THEN 'removed'
            WHEN prev_digest IS NOT DISTINCT FROM cur_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       prev_digest, cur_digest
FROM prev FULL OUTER JOIN cur ON prev.key = cur.key
"""


# ---------------------------------------------------------------------------
# sitemap harvesting (operators/sitemaps)
# ---------------------------------------------------------------------------

# Twelve synthetic sitemap bodies (one host each): doc_id%4==0 → a
# sitemapindex (two children, one with lastmod + padded loc, plus a
# trailing '<urlset' COMMENT — the first-occurrence precedence rule
# must still read it as an index); %4∈{1,3} → a urlset whose four
# blocks exercise newline-spanning entries, loc trimming, the
# empty-lastmod→NULL arm, a duplicate loc (dedupe keeps the non-NULL
# min lastmod) and an empty-loc drop; %4==3 additionally embeds a
# '<sitemapindex' comment AFTER the urlset tag (still a urlset);
# %4==2 → not a sitemap at all (zero rows). The oracle states the
# EXPECTED rows from the same arithmetic — it never parses.

_SM_N = 12
_SM_HOST = "concat('h', cast(doc_id as string), '.example.org')"
_SM_LM = "cast(doc_id % 9 + 1 as string)"
_SM_BODY = f"""CASE doc_id % 4 WHEN 0 THEN concat(
    '<?xml version="1.0"?>', chr(10),
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">', chr(10),
    '<sitemap>', chr(10),
    '<loc> https://', {_SM_HOST}, '/sm', cast(doc_id as string), 'a.xml </loc>', chr(10),
    '<lastmod>2024-01-0', {_SM_LM}, '</lastmod>', chr(10),
    '</sitemap>', chr(10),
    '<sitemap><loc>https://', {_SM_HOST}, '/sm', cast(doc_id as string), 'b.xml</loc></sitemap>', chr(10),
    '</sitemapindex>', chr(10),
    '<!-- mirrors <urlset> elsewhere -->')
  WHEN 2 THEN '<html>not a sitemap</html>'
  ELSE concat(
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">', chr(10),
    '<url>', chr(10),
    '<loc>https://', {_SM_HOST}, '/p/', cast(doc_id as string), '/0</loc>', chr(10),
    '<lastmod>2023-05-0', {_SM_LM}, '</lastmod>', chr(10),
    '</url>', chr(10),
    '<url><loc> https://', {_SM_HOST}, '/p/', cast(doc_id as string), '/1 </loc><lastmod></lastmod></url>', chr(10),
    '<url><loc>https://', {_SM_HOST}, '/p/', cast(doc_id as string), '/1</loc><lastmod>2022-01-01</lastmod></url>', chr(10),
    '<url><loc></loc></url>', chr(10),
    '</urlset>',
    CASE WHEN doc_id % 4 = 3 THEN concat(chr(10), '<!-- index at <sitemapindex> -->') ELSE '' END)
  END"""


def q_sitemap_harvest(spark, sf_dir):
    """Sitemap parsing (operators/sitemaps.sitemap_entries): urlset vs
    sitemapindex by first-tag precedence, (?s) non-greedy block
    harvest, loc trim, empty lastmod → NULL, (host, loc) dedupe to the
    min lastmod. Scan-stage column math + one partial-aggregable
    group; bodies ride as binary (the fetch-table shape)."""
    from .operators.sitemaps import sitemap_entries

    fetched = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_SM_N}")
        .selectExpr(
            f"{_SM_HOST} as host", f"cast({_SM_BODY} as binary) as body"
        )
    )
    return sitemap_entries(fetched)


_D_SM_HOST = "'h' || CAST(doc_id AS VARCHAR) || '.example.org'"
_D_SM_LM = "CAST(doc_id % 9 + 1 AS VARCHAR)"
O_SITEMAP_HARVEST = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_SM_N}),
idx AS (SELECT doc_id FROM d WHERE doc_id % 4 = 0),
us AS (SELECT doc_id FROM d WHERE doc_id % 4 IN (1, 3))
SELECT {_D_SM_HOST} AS host,
       'https://' || {_D_SM_HOST} || '/sm' || CAST(doc_id AS VARCHAR) || 'a.xml' AS loc,
       '2024-01-0' || {_D_SM_LM} AS lastmod, TRUE AS is_index
FROM idx
UNION ALL
SELECT {_D_SM_HOST},
       'https://' || {_D_SM_HOST} || '/sm' || CAST(doc_id AS VARCHAR) || 'b.xml',
       NULL, TRUE
FROM idx
UNION ALL
SELECT {_D_SM_HOST},
       'https://' || {_D_SM_HOST} || '/p/' || CAST(doc_id AS VARCHAR) || '/0',
       '2023-05-0' || {_D_SM_LM}, FALSE
FROM us
UNION ALL
SELECT {_D_SM_HOST},
       'https://' || {_D_SM_HOST} || '/p/' || CAST(doc_id AS VARCHAR) || '/1',
       '2022-01-01', FALSE
FROM us
"""


# ---------------------------------------------------------------------------
# Sitemap: directives in robots.txt (RFC 9309 group-independent)
# ---------------------------------------------------------------------------

_RSM_BODY = """concat(
  'User-agent: *', chr(10),
  'Disallow: /private', chr(10),
  'Sitemap: https://', concat('h', cast(doc_id as string), '.example.org'), '/sitemap.xml   # primary', chr(10),
  'sitemap:https://', concat('h', cast(doc_id as string), '.example.org'), '/sm2.xml', chr(13), chr(10),
  CASE WHEN doc_id % 3 = 0 THEN concat('SITEMAP: https://cdn.example.net/global.xml', chr(10)) ELSE '' END,
  'Sitemap:', chr(10),
  'Sitemap: https://', concat('h', cast(doc_id as string), '.example.org'), '/sitemap.xml', chr(10))"""


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap: directive harvest from robots.txt (operators/sitemaps.
    robots_sitemap_urls): case-insensitive name, inline comments and
    CRLF stripped, empty values dropped, duplicates collapsed,
    user-agent groups ignored entirely (group-independent per RFC
    9309). Column math + one distinct."""
    from .operators.sitemaps import robots_sitemap_urls

    robots = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id < 8")
        .selectExpr(
            "concat('h', cast(doc_id as string), '.example.org') as host",
            f"cast({_RSM_BODY} as binary) as body",
        )
    )
    return robots_sitemap_urls(robots)


O_ROBOTS_SITEMAPS = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 8),
h AS (SELECT doc_id, 'h' || CAST(doc_id AS VARCHAR) || '.example.org' AS host FROM d)
SELECT host, 'https://' || host || '/sitemap.xml' AS sitemap_url FROM h
UNION ALL
SELECT host, 'https://' || host || '/sm2.xml' FROM h
UNION ALL
SELECT host, 'https://cdn.example.net/global.xml' FROM h WHERE doc_id % 3 = 0
"""


# ---------------------------------------------------------------------------
# span-preserving sentence segmentation (operators/sentences)
# ---------------------------------------------------------------------------

# Controlled sentence fixtures: terminator runs ('?!' — the LAST
# terminator hosts the boundary), multi-space gaps, lowercase
# continuations that must NOT split, boundary-free docs (one
# sentence), empty and all-space docs (zero rows). The oracle derives
# the SAME frozen rule by the other route — window prefix-sum over
# unit lengths vs the operator's marker-position transform.
_SS_TEXT = """CASE WHEN doc_id % 11 = 0 THEN ''
  WHEN doc_id % 13 = 1 THEN '   '
  ELSE concat(
    'Hello ', source, '. World no',
    CASE WHEN doc_id % 3 = 0 THEN '?!  Yes way' ELSE ' yes more' END,
    CASE WHEN doc_id % 5 = 0 THEN '' ELSE '. lower stays. Final' END)
  END"""

_D_SS_TEXT = """CASE WHEN doc_id % 11 = 0 THEN ''
  WHEN doc_id % 13 = 1 THEN '   '
  ELSE 'Hello ' || source || '. World no' ||
    CASE WHEN doc_id % 3 = 0 THEN '?!  Yes way' ELSE ' yes more' END ||
    CASE WHEN doc_id % 5 = 0 THEN '' ELSE '. lower stays. Final' END
  END"""


def q_sentence_spans(spark, sf_dir):
    """Sentence segmentation with original-text spans (operators/
    sentences.sentence_spans): frozen ([.!?])( +)([A-Z]) boundary,
    split after the terminator, leading spaces stripped with the span
    following, 0-based renumbering over kept sentences. All JVM column
    math — marker insertion + O(n) marker-position offsets, no
    shuffle, rows explode in place."""
    from .operators.sentences import sentence_spans

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_SS_TEXT} as text"
    )
    return sentence_spans(d)


O_SENTENCE_SPANS = f"""
WITH d AS (SELECT doc_id, {_D_SS_TEXT} AS text FROM documents),
m AS (
  SELECT doc_id,
         regexp_replace(text, '([.!?])( +)([A-Z])',
                        '\\1' || chr(31) || '\\2\\3', 'g') AS marked
  FROM d
), p AS (
  SELECT doc_id, string_split(marked, chr(31)) AS parts FROM m
), u AS (
  SELECT doc_id,
         unnest(generate_series(1, CAST(len(parts) AS BIGINT))) AS i,
         parts
  FROM p
), u2 AS (
  SELECT doc_id, i, parts[CAST(i AS INT)] AS unit FROM u
), w AS (
  SELECT doc_id, i, unit,
         CAST(coalesce(sum(length(unit))
                OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS ust
  FROM u2
), s AS (
  SELECT doc_id, i, ltrim(unit) AS sentence,
         ust + length(unit) - length(ltrim(unit)) AS strt
  FROM w
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) AS sent_idx,
       CAST(strt AS BIGINT) AS start,
       CAST(strt + length(sentence) AS BIGINT) AS "end",
       sentence
FROM s WHERE sentence <> ''
"""


# ---------------------------------------------------------------------------
# BPE merge training (operators/bpe.train_merges)
# ---------------------------------------------------------------------------

_BPE_TRAIN_K = 6


def q_bpe_train_merges(spark, sf_dir):
    """Learned BPE merges (operators/bpe.train_merges, distributed
    path): k rounds of frequency-weighted adjacent-pair argmax +
    left-to-right non-overlapping application over the word-frequency
    table. The oracle unrolls the identical rounds; pytest separately
    pins distributed == driver-loop equality, so all THREE
    derivations of the frozen rule must agree."""
    from .operators.bpe import train_merges

    # every third document: the trainer's cost is rounds × word-table
    # scans and the contract only needs the rule exercised, not the
    # largest possible vocabulary (gate-runtime control)
    docs = _t(spark, sf_dir, "documents").filter("doc_id % 3 = 0").select("text")
    return train_merges(docs, _BPE_TRAIN_K)


def _bpe_train_oracle() -> str:
    from .operators.bpe import train_oracle_sql

    return train_oracle_sql(
        _BPE_TRAIN_K,
        table="(SELECT * FROM documents WHERE doc_id % 3 = 0)",
    )


O_BPE_TRAIN = _bpe_train_oracle()


# ---------------------------------------------------------------------------
# charset sniffing (functions/charset.with_charset)
# ---------------------------------------------------------------------------

# Five body shapes: html5 <meta charset> (quoted, mixed case),
# http-equiv with spaced '=', a UTF-8 BOM page (chr(65279) survives
# the utf-8 cast to binary as EF BB BF — the bom arm really fires),
# a single-quoted declaration, and a declaration pushed past the
# 1024-char sniff window (must fall to default). utf-16 BOM arms are
# not utf-8-encodable and are pytest-pinned instead. Expected-output
# oracle (the robots discipline).
# the U+FEFF literal is bound in Python (Spark SQL chr() is mod-256
# ASCII and cannot produce it); it utf-8-encodes to EF BB BF in the
# binary cast, so the bom arm fires on real bytes.
_CS_BODY = """CASE doc_id % 5
  WHEN 0 THEN '<html><head><meta charset="ISO-8859-1"></head><body>x</body></html>'
  WHEN 1 THEN '<html><head><meta http-equiv="Content-Type" content="text/html; charset = Windows-1252"></head></html>'
  WHEN 2 THEN concat('﻿', '<html><head><title>bom page</title></head></html>')
  WHEN 3 THEN concat('<html><head><meta charset=', chr(39), 'KOI8-R', chr(39), '></head></html>')
  ELSE concat('<html><head><title>', repeat('x', 1100), '</title><meta charset="utf-32"></head></html>')
  END"""


def q_charset_sniff(spark, sf_dir):
    """Charset sniffing (functions/charset.with_charset): BOM >
    meta-charset (first 1024 chars, explicit-whitespace class, either
    quote style, spaced '=') > utf-8 default. One pure-JVM column
    expression over the binary html — hex-prefix compares + one
    regexp_extract, zero Python, zero shuffle."""
    from .functions.charset import with_charset

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"cast({_CS_BODY} as binary) as html"
    )
    return with_charset(pages).select("doc_id", "charset", "charset_source")


O_CHARSET_SNIFF = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'iso-8859-1'
         WHEN 1 THEN 'windows-1252'
         WHEN 2 THEN 'utf-8'
         WHEN 3 THEN 'koi8-r'
         ELSE 'utf-8' END AS charset,
       CASE doc_id % 5
         WHEN 0 THEN 'meta'
         WHEN 1 THEN 'meta'
         WHEN 2 THEN 'bom'
         WHEN 3 THEN 'meta'
         ELSE 'default' END AS charset_source
FROM documents
"""


# ---------------------------------------------------------------------------
# typographic punctuation folding (functions/normalize.punct_fold_col)
# ---------------------------------------------------------------------------

# fixture binds the unicode punctuation as literals in BOTH engines'
# SQL (python-embedded — no chr() games); the oracle restates the
# identical translate()/replace() builtins over the same frozen map.
_PF_DECOR = "“Qu’d” – x… •"


def q_punct_fold(spark, sf_dir):
    """Typographic fold (functions/normalize): 1:1 translate of smart
    quotes/dashes/spaces/bullets (span-safe — length-preserving), plus
    the opt-in 1→3 ellipsis expansion as a second column. Pure JVM
    translate/replace, scan-stage, zero shuffle."""
    from pyspark.sql import functions as F

    from .functions.normalize import punct_fold_col, with_punct_fold

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"concat('{_PF_DECOR} ', text)").alias("text"),
    )
    out = with_punct_fold(d)
    return out.select(
        "doc_id",
        "text_folded",
        "punct_changed",
        punct_fold_col("text", ellipsis=True).alias("text_folded_e"),
    )


def _punct_oracle() -> str:
    from .functions.normalize import PUNCT_FROM, PUNCT_TO

    f = PUNCT_FROM.replace("'", "''")
    t = PUNCT_TO.replace("'", "''")
    return f"""
WITH d AS (
  SELECT doc_id, '{_PF_DECOR} ' || text AS text FROM documents
)
SELECT doc_id,
       translate(text, '{f}', '{t}') AS text_folded,
       translate(text, '{f}', '{t}') <> text AS punct_changed,
       replace(translate(text, '{f}', '{t}'), '…', '...') AS text_folded_e
FROM d
"""


O_PUNCT_FOLD = _punct_oracle()


# ---------------------------------------------------------------------------
# robots crawl-delay harvest (operators/robots.crawl_delays)
# ---------------------------------------------------------------------------

# six hosts: every wildcard group declares d.5 seconds; even hosts add
# a second (larger) integer declaration — max wins; a googlebot group
# declares 99 (must NOT bind the generic crawler); host 3 opens a
# second wildcard group with a non-numeric and a negative value (both
# dropped, the d.5 survives).
_RCD_BODY = """concat(
  'User-agent: *', chr(10),
  'Crawl-delay: ', cast(doc_id as string), '.5', chr(10),
  CASE WHEN doc_id % 2 = 0
       THEN concat('crawl-delay: ', cast(doc_id * 10 as string), chr(10))
       ELSE '' END,
  'User-agent: googlebot', chr(10),
  'Crawl-delay: 99', chr(10),
  CASE WHEN doc_id = 3
       THEN concat('User-agent: *', chr(10), 'Crawl-delay: abc', chr(10),
                   'Crawl-delay: -4', chr(10))
       ELSE '' END)"""


def q_robots_crawl_delay(spark, sf_dir):
    """Crawl-delay harvest (operators/robots.crawl_delays): wildcard
    groups only, try-cast to double seconds, invalid/negative dropped,
    per-host MAX (the conservative pace). Shares the grouping grammar
    with parse_robots via one helper — the two cannot drift."""
    from .operators.robots import crawl_delays

    robots = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id < 6")
        .selectExpr(
            "concat('h', cast(doc_id as string), '.example.org') as host",
            f"cast({_RCD_BODY} as binary) as body",
        )
    )
    return crawl_delays(robots)


O_ROBOTS_CRAWL_DELAY = """
SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.org' AS host,
       greatest(CAST(doc_id AS DOUBLE) + 0.5,
                CASE WHEN doc_id % 2 = 0
                     THEN CAST(doc_id AS DOUBLE) * 10.0
                     ELSE 0.0 END) AS crawl_delay
FROM documents WHERE doc_id < 6
"""


# ---------------------------------------------------------------------------
# temperature-based language mixture weights (operators/sampling)
# ---------------------------------------------------------------------------


def q_lang_mixture_weights(spark, sf_dir):
    """XLM-style alpha-sampling weights (operators/sampling.
    lang_mixture_weights): per-language token totals raised to alpha
    = 0.5 and normalized. sqrt is exactly rounded per IEEE-754 in
    both engines — the reason the contract pins alpha = 0.5 (general
    pow is transcendental and not identically rounded across libm).
    Languages-grain output; one partial agg + the 1-row broadcast
    total."""
    from .operators.sampling import lang_mixture_weights

    d = _t(spark, sf_dir, "documents").selectExpr(
        "lang", "n_chars as n_tokens"
    )
    return lang_mixture_weights(d)


O_LANG_MIXTURE = """
WITH per AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), r AS (
  SELECT lang, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS rr FROM per
), t AS (SELECT sum(rr) AS tot FROM r)
SELECT lang, n_tokens,
       round(CASE WHEN tot > 0 THEN rr / tot ELSE 0.0 END, 6) AS weight
FROM r, t
"""


# ---------------------------------------------------------------------------
# link reciprocity (operators/linkgraph.link_reciprocity)
# ---------------------------------------------------------------------------


def q_link_reciprocity(spark, sf_dir):
    """Reciprocal-link fraction per source host (operators/linkgraph.
    link_reciprocity) over the same synthesized 29-node graph the
    PageRank key uses: distinct ordered pairs, self-join against the
    reversal, per-source partial agg. The link-farm signal consumed
    like the PageRank floor."""
    from .operators.linkgraph import link_reciprocity

    edges = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "concat('h', cast(doc_id % 23 as string)) as src_host",
            "concat('h', cast((doc_id * 7 + n_chars) % 29 as string)) as dst_host",
        )
        .filter("src_host <> dst_host")
    )
    return link_reciprocity(edges)


O_LINK_RECIPROCITY = """
WITH e AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
         'h' || CAST((doc_id * 7 + n_chars) % 29 AS VARCHAR) AS dst
  FROM documents
  WHERE 'h' || CAST(doc_id % 23 AS VARCHAR)
        <> 'h' || CAST((doc_id * 7 + n_chars) % 29 AS VARCHAR)
), m AS (
  SELECT e.src, e.dst,
         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS back
  FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src
)
SELECT src AS host, count(*) AS n_out,
       CAST(sum(back) AS BIGINT) AS n_reciprocal,
       round(sum(back) * 1.0 / count(*), 6) AS reciprocity
FROM m GROUP BY src
"""


# ---------------------------------------------------------------------------
# positional postings + exact phrase retrieval (operators/index)
# ---------------------------------------------------------------------------

# planted phrases over synthetic tokens that cannot occur in the
# natural fixture text: %3==0 docs carry TWO occurrences of the
# phrase, %3==1 docs carry it REVERSED (must not match — the whole
# point of positions), the rest carry the terms separated by filler.
_PH_TEXT = """concat(text, CASE doc_id % 3
  WHEN 0 THEN ' zqx1 zqx2 filler zqx1 zqx2'
  WHEN 1 THEN ' zqx2 zqx1'
  ELSE ' zqx1 pad zqx2' END)"""
_D_PH_TEXT = """text || CASE doc_id % 3
  WHEN 0 THEN ' zqx1 zqx2 filler zqx1 zqx2'
  WHEN 1 THEN ' zqx2 zqx1'
  ELSE ' zqx1 pad zqx2' END"""

_D_PH_TOKS = """
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t AS term FROM (
    SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS t FROM (
      SELECT doc_id,
             list_filter(string_split(lower({text}), ' '), x -> x <> '') AS l
      FROM documents {where}))
"""


def q_positional_postings(spark, sf_dir):
    """Positional postings (operators/index.build_positional_postings):
    one row per token occurrence, pos = 0-based index in the filtered
    token sequence — the frozen build_postings tokenization. Scan-stage
    posexplode, token-grain output."""
    from .operators.index import build_positional_postings

    d = _t(spark, sf_dir, "documents").filter("doc_id < 50").select(
        "doc_id", "text"
    )
    return build_positional_postings(d)


O_POSITIONAL_POSTINGS = (
    "SELECT term, doc_id, pos FROM ("
    + _D_PH_TOKS.format(text="text", where="WHERE doc_id < 50")
    + ")"
)


def q_phrase_topk(spark, sf_dir):
    """Exact phrase retrieval (operators/index.phrase_topk): the
    phrase's terms at consecutive positions, overlaps counted, top-k
    by (n_matches desc, doc_id). Index scan filtered to the phrase
    terms first; one compound equi-join per extra term; TakeOrdered
    top-k. The reversed planting must not match."""
    from .operators.index import (
        build_positional_postings,
        phrase_topk,
    )

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_PH_TEXT} as text"
    )
    return phrase_topk(build_positional_postings(d), ["zqx1", "zqx2"], k=10)


O_PHRASE_TOPK = (
    "WITH toks AS ("
    + _D_PH_TOKS.format(text=_D_PH_TEXT, where="")
    + """), a AS (
  SELECT t0.doc_id, t0.pos FROM toks t0
  JOIN toks t1 ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = 'zqx1' AND t1.term = 'zqx2'
)
SELECT doc_id, count(*) AS n_matches FROM a GROUP BY doc_id
ORDER BY n_matches DESC, doc_id ASC LIMIT 10
"""
)


# ---------------------------------------------------------------------------
# PageRank warm start (incremental re-rank from a previous crawl)
# ---------------------------------------------------------------------------

# previous-crawl ranks for hosts h0..h9 only (synthesized (i+1)/100);
# the other 19 nodes enter at the uniform prior; total mass then
# normalizes to 1 before the (fewer) rounds run.
_PR_WARM_ITERS = 2


def q_pagerank_warm_start(spark, sf_dir):
    """Warm-started PageRank (operators/linkgraph.pagerank with
    init_ranks): r0 = coalesce(previous rank, 1/N) normalized to mass
    1, then the frozen power iteration — the incremental crawl-over-
    crawl form (fewer rounds from the old fixed point). Oracle
    unrolls the identical rounds from the identical r0."""
    from .operators.linkgraph import pagerank

    edges = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "concat('h', cast(doc_id % 23 as string)) as src_host",
            "concat('h', cast((doc_id * 7 + n_chars) % 29 as string)) as dst_host",
        )
        .filter("src_host <> dst_host")
    )
    init = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "concat('h', cast(doc_id % 10 as string)) as node",
            "cast(doc_id % 10 + 1 as double) / 100.0 as rank",
        )
        .distinct()
    )
    pr = pagerank(
        edges, iterations=_PR_WARM_ITERS, damping=_PR_DAMPING,
        init_ranks=init,
    )
    return pr.select("node", F.round("rank", 6).alias("rank"))


_WARM_R0 = """init AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 10 AS VARCHAR) AS node,
         CAST(doc_id % 10 + 1 AS DOUBLE) / 100.0 AS rank
  FROM documents
), rawt AS (
  SELECT base.node, base.outdeg,
         coalesce(init.rank, CAST(1 AS DOUBLE) / (SELECT n FROM nn)) AS raw
  FROM base LEFT JOIN init ON base.node = init.node
),
r0 AS (
  SELECT node, outdeg, raw / (SELECT sum(raw) FROM rawt) AS rank
  FROM rawt
)"""

O_PAGERANK_WARM = _pagerank_oracle(_PR_WARM_ITERS, _PR_DAMPING, _WARM_R0)


# ---------------------------------------------------------------------------
# change-rate recrawl estimation (operators/snapshots.change_rates)
# ---------------------------------------------------------------------------

# Twelve urls, four snapshots at QUADRATIC spacing (ts = base + s^2 h,
# span 32400 s, avg interval 10800 s), scenario by doc_id % 4: (0)
# never changes -> rate 0.0 (the -ln(1) = -0.0 IEEE edge, normalized
# by + 0.0), recrawl NULL; (1) changes every interval; (2) digests
# d0,d0,d1,d1 PLUS a duplicate (url, ts) observation at s=1 with a
# smaller digest -- the min collapse rewrites the pattern to
# d0,a0,d1,d1 = two changes over four collapsed observations; (3) a
# single observation -> no interval, NULL estimates. The oracle
# states the Cho & Garcia-Molina closed form per scenario with the
# identical ROUND/LN arithmetic -- it never windows.

_CR_N = 12
_CR_ROWS = """CASE doc_id % 4
 WHEN 0 THEN transform(sequence(0, 3), s ->
   named_struct('s', s, 'digest', 'd0'))
 WHEN 1 THEN transform(sequence(0, 3), s ->
   named_struct('s', s, 'digest', concat('d', cast(s as string))))
 WHEN 2 THEN concat(
   transform(sequence(0, 3), s -> named_struct(
     's', s, 'digest', concat('d', cast(cast(s / 2 as int) as string)))),
   array(named_struct('s', 1, 'digest', 'a0')))
 ELSE array(named_struct('s', 0, 'digest', 'd0'))
 END"""


def q_change_rates(spark, sf_dir):
    """Per-url change-rate estimation over snapshot history
    (operators/snapshots.change_rates): (url, ts) min-digest collapse,
    null-safe consecutive-change counting, and the Cho &
    Garcia-Molina bias-corrected Poisson rate with a 1/rate recrawl
    interval. One url-keyed exchange serves both the lag window and
    the aggregate."""
    from .operators.snapshots import change_rates

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_CR_N}")
        .selectExpr("doc_id", f"explode({_CR_ROWS}) as r")
        .selectExpr(
            "concat('u', cast(doc_id as string)) as url",
            "timestamp_seconds(bigint(1700000000) + r.s * r.s * 3600)"
            " as snap_ts",
            "r.digest as digest",
        )
    )
    return change_rates(fx)


O_CHANGE_RATES = f"""
WITH d AS (
  SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id < {_CR_N}
), f AS (
  SELECT ROUND(-LN(0.5 / 3.5) / (32400.0 / 3.0) * 86400.0 + 0.0, 6) AS r1,
         ROUND(-LN(1.5 / 3.5) / (32400.0 / 3.0) * 86400.0 + 0.0, 6) AS r2
)
SELECT url, CAST(4 AS BIGINT) AS n_obs, CAST(0 AS BIGINT) AS n_changes,
       CAST(32400 AS BIGINT) AS span_s,
       TIMESTAMP '2023-11-15 07:13:20' AS last_ts, 0.0 AS rate_per_day,
       CAST(NULL AS DOUBLE) AS recrawl_days
FROM d WHERE doc_id % 4 = 0
UNION ALL
SELECT url, 4, 3, 32400, TIMESTAMP '2023-11-15 07:13:20', r1,
       ROUND(1.0 / r1, 6) FROM d, f WHERE doc_id % 4 = 1
UNION ALL
SELECT url, 4, 2, 32400, TIMESTAMP '2023-11-15 07:13:20', r2,
       ROUND(1.0 / r2, 6) FROM d, f WHERE doc_id % 4 = 2
UNION ALL
SELECT url, 1, 0, 0, TIMESTAMP '2023-11-14 22:13:20',
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM d WHERE doc_id % 4 = 3
"""


# ---------------------------------------------------------------------------
# feed autodiscovery (operators/headmeta.feed_links)
# ---------------------------------------------------------------------------

# Sixteen pages on https://hN.example.org/page, scenario by
# doc_id % 4: (0) an absolute rss declaration DUPLICATED verbatim
# (per-page collapse) next to a stylesheet link (ignored); (1)
# type-before-href attribute order, atom, a rooted href rebased on
# the page origin; (2) a protocol-relative href gaining the page
# scheme (TyPe attribute case variance) plus a mailto: drop; (3) no
# feed links at all. The oracle states expected rows closed-form.

_FL_N = 16
_FL_PAGE = "concat('https://h', cast(doc_id as string), '.example.org/page')"
_FL_HTML = f"""CASE doc_id % 4
 WHEN 0 THEN concat('<html><head>',
   '<link rel="alternate" type="application/rss+xml" href="https://h',
   cast(doc_id as string), '.example.org/feed.xml">',
   '<link rel="alternate" type="application/rss+xml" href="https://h',
   cast(doc_id as string), '.example.org/feed.xml">',
   '<link rel="stylesheet" href="/s.css">',
   '</head><body>x</body></html>')
 WHEN 1 THEN concat('<html><head>',
   '<link type="application/atom+xml" rel="alternate" href="/atom.xml">',
   '</head><body>x</body></html>')
 WHEN 2 THEN concat('<html><head>',
   '<link rel="alternate" TyPe="application/rss+xml"',
   ' href="//feeds.example.net/f">',
   '<link rel="alternate" type="application/rss+xml" href="mailto:x@y">',
   '</head><body>x</body></html>')
 ELSE '<html><head><title>t</title></head><body>x</body></html>'
 END"""


def q_feed_discovery(spark, sf_dir):
    """Feed autodiscovery (operators/headmeta.feed_links): whole-tag
    harvest keyed on the declared mime type (attribute order and name
    case never matter), canonical-rule href resolution, row-local
    per-page duplicate collapse. Scan-stage column math, zero
    shuffle."""
    from .operators.headmeta import feed_links

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_FL_N}")
        .selectExpr(
            f"{_FL_PAGE} as url",
            f"cast({_FL_HTML} as binary) as html",
        )
    )
    return feed_links(fx)


_D_FL_PAGE = "'https://h' || CAST(doc_id AS VARCHAR) || '.example.org/page'"
O_FEED_DISCOVERY = f"""
WITH d AS (
  SELECT doc_id, {_D_FL_PAGE} AS url,
         'https://h' || CAST(doc_id AS VARCHAR) || '.example.org' AS origin
  FROM documents WHERE doc_id < {_FL_N}
)
SELECT url, origin || '/feed.xml' AS feed_url, 'rss' AS kind
FROM d WHERE doc_id % 4 = 0
UNION ALL
SELECT url, origin || '/atom.xml', 'atom' FROM d WHERE doc_id % 4 = 1
UNION ALL
SELECT url, 'https://feeds.example.net/f', 'rss' FROM d WHERE doc_id % 4 = 2
"""


# ---------------------------------------------------------------------------
# nofollow-flagged outlinks (operators/linkgraph.outlinks_flagged)
# ---------------------------------------------------------------------------

# Each page carries: a plain followed anchor; a rel="nofollow
# noopener" anchor (token inside a longer value); a REL-before-HREF
# ordered nofollow anchor (attribute order must not matter); an
# <abbr href=..> decoy the '<a non-letter' grammar must skip. Every
# 3rd page adds <meta name="robots" content="index,nofollow"> — the
# page-level directive that voids EVERY edge on the page.

_NF_N = 18
_NF_URL = "concat('https://s', cast(doc_id as string), '.example.org/p')"
_NF_HTML = """concat(
  '<html><head>',
  CASE WHEN doc_id % 3 = 0
       THEN '<meta name="robots" content="index,nofollow">'
       ELSE '<meta name="robots" content="index,follow">' END,
  '</head><body>',
  '<a href="https://f', cast(doc_id as string), '.example.org/x">plain</a>',
  '<a rel="nofollow noopener" href="https://n', cast(doc_id as string),
  '.example.org/y">nf</a>',
  '<a href="https://m', cast(doc_id as string),
  '.example.org/z" rel="NoFollow">nf2</a>',
  '<abbr href="https://decoy.example.org/d">not an anchor</abbr>',
  '</body></html>')"""


def q_outlinks_nofollow(spark, sf_dir):
    """Nofollow-aware outlink harvest (operators/linkgraph.
    outlinks_flagged): whole-anchor-tag harvest ('<a' + non-letter, so
    <abbr href> never matches), anchor rel token in any position/case,
    page-level meta robots nofollow voiding every edge. Scan-stage
    column math, zero shuffle."""
    from .operators.linkgraph import outlinks_flagged

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_NF_N}")
        .selectExpr(
            f"{_NF_URL} as url", f"cast({_NF_HTML} as binary) as html"
        )
    )
    return outlinks_flagged(fx)


_D_NF_URL = "'https://s' || CAST(doc_id AS VARCHAR) || '.example.org/p'"
O_OUTLINKS_NOFOLLOW = f"""
WITH d AS (
  SELECT doc_id, {_D_NF_URL} AS url,
         's' || CAST(doc_id AS VARCHAR) || '.example.org' AS src_host,
         CAST(doc_id AS VARCHAR) AS i,
         doc_id % 3 = 0 AS page_nf
  FROM documents WHERE doc_id < {_NF_N}
)
SELECT url, src_host,
       'https://f' || i || '.example.org/x' AS href,
       'f' || i || '.example.org' AS dst_host,
       page_nf AS nofollow
FROM d
UNION ALL
SELECT url, src_host, 'https://n' || i || '.example.org/y',
       'n' || i || '.example.org', TRUE
FROM d
UNION ALL
SELECT url, src_host, 'https://m' || i || '.example.org/z',
       'm' || i || '.example.org', TRUE
FROM d
"""


# ---------------------------------------------------------------------------
# sitemap scheduler hints (operators/sitemaps.sitemap_url_hints)
# ---------------------------------------------------------------------------

# Ten single-urlset bodies, four blocks each: (a) full hints;
# (b) an out-of-vocabulary changefreq ('sometimes') and an
# out-of-range priority (1.5) -> both NULL; (a again) a duplicate loc
# whose fields merge FIELD-WISE MIN (earlier lastmod, lexicographic
# min changefreq, min priority); (c) case+whitespace folding
# (' Monthly ' -> 'monthly', ' 0 ' -> 0.0) with no lastmod.

_SH_N = 10
_SH_HOST = "concat('m', cast(doc_id as string), '.example.org')"
_SH_BODY = f"""concat('<urlset>',
 '<url><loc>https://', {_SH_HOST}, '/a/', cast(doc_id as string),
 '</loc><lastmod>2024-01-01</lastmod>',
 '<changefreq>daily</changefreq><priority>0.8</priority></url>',
 '<url><loc>https://', {_SH_HOST}, '/b/', cast(doc_id as string),
 '</loc><changefreq>sometimes</changefreq>',
 '<priority>1.5</priority></url>',
 '<url><loc>https://', {_SH_HOST}, '/a/', cast(doc_id as string),
 '</loc><lastmod>2023-01-01</lastmod>',
 '<changefreq>weekly</changefreq><priority>0.5</priority></url>',
 '<url><loc>https://', {_SH_HOST}, '/c/', cast(doc_id as string),
 '</loc><changefreq> Monthly </changefreq><priority> 0 </priority></url>',
 '</urlset>')"""


def q_sitemap_hints(spark, sf_dir):
    """Sitemap scheduler hints (operators/sitemaps.sitemap_url_hints):
    changefreq vocabulary-gated + case-folded, priority range-gated,
    field-wise-min dedupe — the declared-freshness join surface for
    change_rates. Scan-stage + one partial-agg group."""
    from .operators.sitemaps import sitemap_url_hints

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_SH_N}")
        .selectExpr(
            f"{_SH_HOST} as host", f"cast({_SH_BODY} as binary) as body"
        )
    )
    return sitemap_url_hints(fx)


_D_SH_HOST = "'m' || CAST(doc_id AS VARCHAR) || '.example.org'"
O_SITEMAP_HINTS = f"""
WITH d AS (
  SELECT doc_id, {_D_SH_HOST} AS host, CAST(doc_id AS VARCHAR) AS i
  FROM documents WHERE doc_id < {_SH_N}
)
SELECT host, 'https://' || host || '/a/' || i AS loc,
       '2023-01-01' AS lastmod, 'daily' AS changefreq, 0.5 AS priority
FROM d
UNION ALL
SELECT host, 'https://' || host || '/b/' || i, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
FROM d
UNION ALL
SELECT host, 'https://' || host || '/c/' || i, CAST(NULL AS VARCHAR),
       'monthly', 0.0
FROM d
"""


# ---------------------------------------------------------------------------
# host quality priors (operators/hoststats)
# ---------------------------------------------------------------------------

# Thirty docs over five hosts; quality steps by exact binary quarters
# (0/.25/.5/.75 — double sums stay order-independent); languages by
# doc_id % 6 include a NULL arm, so top-lang counting must treat NULL
# as a value (count-distinct excludes it, the SQL rule). Tie-break is
# lexicographic min with NULLS FIRST — stated on both engines.

_HQ_N = 30
_HQ_HOST = "concat('h', cast(doc_id % 5 as string), '.example.org')"
_HQ_URL = f"concat('https://', {_HQ_HOST}, '/p/', cast(doc_id as string))"
_HQ_LANG = ("CASE doc_id % 6 WHEN 2 THEN 'de' WHEN 3 THEN 'fr'"
            " WHEN 4 THEN NULL ELSE 'en' END")
_HQ_Q = "cast(doc_id % 4 as double) * 0.25D"


def q_host_quality_priors(spark, sf_dir):
    """Host-grain content priors (operators/hoststats.
    host_quality_priors): two partial-aggregable groups, round-6 mean
    quality, most-frequent language with min-lex NULLS FIRST
    tie-break, NULL-excluding distinct-language count."""
    from .operators.hoststats import host_quality_priors

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_HQ_N}")
        .selectExpr(
            f"{_HQ_URL} as url",
            f"{_HQ_Q} as quality",
            f"{_HQ_LANG} as pred_lang",
        )
    )
    return host_quality_priors(fx)


O_HOST_QUALITY_PRIORS = f"""
WITH b AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS host,
         CAST(doc_id % 4 AS DOUBLE) * 0.25 AS q,
         {_HQ_LANG} AS lang
  FROM documents WHERE doc_id < {_HQ_N}
), pl AS (
  SELECT host, lang, COUNT(*) AS n, SUM(q) AS sq
  FROM b GROUP BY host, lang
), agg AS (
  SELECT host, CAST(SUM(n) AS BIGINT) AS n_docs,
         ROUND(SUM(sq) / SUM(n), 6) AS mean_quality,
         CAST(COUNT(DISTINCT lang) AS INT) AS n_langs
  FROM pl GROUP BY host
), top AS (
  SELECT host, lang AS top_lang FROM (
    SELECT host, lang,
           ROW_NUMBER() OVER (
             PARTITION BY host ORDER BY n DESC, lang ASC NULLS FIRST
           ) AS rn
    FROM pl
  ) WHERE rn = 1
)
SELECT agg.host, n_docs, mean_quality, top_lang, n_langs
FROM agg JOIN top ON agg.host = top.host
"""


def q_low_quality_hosts(spark, sf_dir):
    """The drop-list view over the host priors (operators/hoststats.
    low_quality_hosts): evidence floor (n_docs >= 6) AND mean-quality
    ceiling (<= 0.3), boundary inclusive on both — the arithmetic of
    the shared fixture puts two hosts exactly at mean 7/24 = 0.291667
    and the rest above the ceiling."""
    from .operators.hoststats import host_quality_priors, low_quality_hosts

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_HQ_N}")
        .selectExpr(
            f"{_HQ_URL} as url",
            f"{_HQ_Q} as quality",
            f"{_HQ_LANG} as pred_lang",
        )
    )
    return low_quality_hosts(
        host_quality_priors(fx), min_docs=6, max_mean_quality=0.3
    )


O_LOW_QUALITY_HOSTS = f"""
WITH b AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS host,
         CAST(doc_id % 4 AS DOUBLE) * 0.25 AS q
  FROM documents WHERE doc_id < {_HQ_N}
), agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(SUM(q) / COUNT(*), 6) AS mean_quality
  FROM b GROUP BY host
)
SELECT host, n_docs, mean_quality
FROM agg WHERE n_docs >= 6 AND mean_quality <= 0.3
"""


# ---------------------------------------------------------------------------
# mirror-host detection (operators/hoststats.mirror_hosts)
# ---------------------------------------------------------------------------

# Six hosts by doc_id % 6; content keyed doc_id % 40 so each content
# unit recurs across the hosts of its parity class; every 5th doc is
# host-unique filler (perturbs per-host sizes) and every 7th doc is an
# all-hosts boilerplate page that the max_hosts_per_fp=5 cap must
# EXCLUDE (on 6 hosts). min_resemblance=0.48 drops exactly one of the
# six surviving pairs (0.470588) — both filter arms exercised.

_MH_N = 300
_MH_HOST = "concat('m', cast(doc_id % 6 as string), '.example.org')"
_MH_TEXT = (
    "CASE WHEN doc_id % 7 = 0 THEN 'allhosts'"
    " WHEN doc_id % 5 = 0 THEN concat('u', cast(doc_id as string))"
    " ELSE concat('content-', cast(doc_id % 40 as string)) END"
)


def q_mirror_hosts(spark, sf_dir):
    """Bharat-Broder mirror detection at host grain (operators/
    hoststats.mirror_hosts): md5 fingerprints distinct per (host, fp),
    boilerplate cap at 5 hosts/fp, host-pair shared counts blocked on
    the fingerprint, Jaccard resemblance round-6 with inclusive
    thresholds."""
    from .operators.hoststats import mirror_hosts

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_MH_N}")
        .selectExpr(
            f"concat('https://', {_MH_HOST}, '/p/', cast(doc_id as string))"
            " as url",
            f"{_MH_TEXT} as text",
        )
    )
    return mirror_hosts(
        fx, max_hosts_per_fp=5, min_shared=2, min_resemblance=0.48
    )


O_MIRROR_HOSTS = f"""
WITH d AS (
  SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) || '.example.org' AS host,
         md5(CASE WHEN doc_id % 7 = 0 THEN 'allhosts'
                  WHEN doc_id % 5 = 0 THEN 'u' || CAST(doc_id AS VARCHAR)
                  ELSE 'content-' || CAST(doc_id % 40 AS VARCHAR) END) AS fp
  FROM documents WHERE doc_id < {_MH_N}
), hf AS (
  SELECT DISTINCT host, fp FROM d
), ok AS (
  SELECT fp FROM hf GROUP BY fp HAVING count(*) <= 5
), h2 AS (
  SELECT host, fp FROM hf JOIN ok USING (fp)
), sizes AS (
  SELECT host, count(*) AS n FROM h2 GROUP BY host
), sh AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
  FROM h2 a JOIN h2 b USING (fp) WHERE a.host < b.host GROUP BY 1, 2
)
SELECT host_a, host_b, shared, sa.n AS n_a, sb.n AS n_b,
       ROUND(shared / (sa.n + sb.n - shared), 6) AS resemblance
FROM sh JOIN sizes sa ON sa.host = sh.host_a
        JOIN sizes sb ON sb.host = sh.host_b
WHERE shared >= 2 AND ROUND(shared / (sa.n + sb.n - shared), 6) >= 0.48
"""
