"""Contract queries + DuckDB oracles: WARC ingestion, seeded
TrustRank, containment near-dup, histogram quantile sketch.

Same discipline as the sibling contract modules: the Spark side runs
the SHIPPED operator over a fixture synthesized in SQL from the
driver's tables; the oracle restates the frozen semantics in portable
SQL with identical aliases, ``AS MATERIALIZED`` on multiply-referenced
CTEs, and double-cast literals. WARC fixture strings are built with
Spark ``'\\r\\n'`` escape literals on one side and DuckDB ``e'...'``
escape strings on the other (plain DuckDB literals do not process
backslashes — the CLAUDE.md regex trap, applied to data this time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .contract_ml import _t

# ---------------------------------------------------------------------------
# WARC ingestion
# ---------------------------------------------------------------------------

# One synthetic WARC/1.0 record per document; every 5th is a request
# record (must be skipped), every 4th response body embeds a CRLFCRLF
# blank line (payload slicing must honour Content-Length, never search
# for the next separator), every 7th is a 404, every 11th speaks
# HTTP/1.0, every 5th-by-2 serves text/plain. 37 segment blobs.

_W_URL = (
    "concat('https://h', cast(doc_id % 23 as string),"
    " '.example.org/p/', cast(doc_id as string))"
)
_W_DATE = (
    "concat('2026-01-01T00:', lpad(cast(doc_id % 60 as string), 2, '0'),"
    " ':', lpad(cast(doc_id % 59 as string), 2, '0'), 'Z')"
)
_W_BODY = (
    "concat('<html><body><p>', text, '</p>',"
    " CASE WHEN doc_id % 4 = 0 THEN concat('\\r\\n\\r\\n<p>tail ',"
    " cast(doc_id as string), '</p>') ELSE '' END, '</body></html>')"
)
_W_PAYLOAD = (
    "CASE WHEN doc_id % 5 = 4 THEN"
    " concat('GET /p/', cast(doc_id as string), ' HTTP/1.1\\r\\nHost: h',"
    " cast(doc_id % 23 as string), '.example.org\\r\\n\\r\\n')"
    " ELSE concat("
    " CASE WHEN doc_id % 11 = 5 THEN 'HTTP/1.0' ELSE 'HTTP/1.1' END, ' ',"
    " CASE WHEN doc_id % 7 = 3 THEN '404 Not Found' ELSE '200 OK' END,"
    " '\\r\\nContent-Type: ',"
    " CASE WHEN doc_id % 5 = 2 THEN 'text/plain'"
    " ELSE 'text/html; charset=UTF-8' END,"
    " '\\r\\nServer: synthetic\\r\\n\\r\\n', " + _W_BODY + ") END"
)
_W_REC = (
    "concat('WARC/1.0\\r\\nWARC-Type: ',"
    " CASE WHEN doc_id % 5 = 4 THEN 'request' ELSE 'response' END,"
    " '\\r\\nWARC-Record-ID: <urn:test:', cast(doc_id as string),"
    " '>\\r\\nWARC-Target-URI: ', " + _W_URL + ","
    " '\\r\\nWARC-Date: ', " + _W_DATE + ","
    " '\\r\\nContent-Length: ', cast(length(__pl) as string),"
    " '\\r\\n\\r\\n', __pl, '\\r\\n\\r\\n')"
)

# DuckDB twins: e'' escape strings for the CRLFs, VARCHAR casts
_DW_URL = (
    "'https://h' || CAST(doc_id % 23 AS VARCHAR)"
    " || '.example.org/p/' || CAST(doc_id AS VARCHAR)"
)
_DW_DATE = (
    "'2026-01-01T00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')"
    " || ':' || lpad(CAST(doc_id % 59 AS VARCHAR), 2, '0') || 'Z'"
)
_DW_BODY = (
    "'<html><body><p>' || text || '</p>' ||"
    " CASE WHEN doc_id % 4 = 0 THEN e'\\r\\n\\r\\n<p>tail '"
    " || CAST(doc_id AS VARCHAR) || '</p>' ELSE '' END || '</body></html>'"
)
_DW_PAYLOAD = (
    "CASE WHEN doc_id % 5 = 4 THEN"
    " 'GET /p/' || CAST(doc_id AS VARCHAR) || ' HTTP/1.1' || e'\\r\\n'"
    " || 'Host: h' || CAST(doc_id % 23 AS VARCHAR) || '.example.org'"
    " || e'\\r\\n\\r\\n'"
    " ELSE"
    " CASE WHEN doc_id % 11 = 5 THEN 'HTTP/1.0' ELSE 'HTTP/1.1' END || ' '"
    " || CASE WHEN doc_id % 7 = 3 THEN '404 Not Found' ELSE '200 OK' END"
    " || e'\\r\\n' || 'Content-Type: '"
    " || CASE WHEN doc_id % 5 = 2 THEN 'text/plain'"
    " ELSE 'text/html; charset=UTF-8' END"
    " || e'\\r\\n' || 'Server: synthetic' || e'\\r\\n\\r\\n'"
    " || " + _DW_BODY + " END"
)
_DW_REC = (
    "'WARC/1.0' || e'\\r\\n' || 'WARC-Type: '"
    " || CASE WHEN doc_id % 5 = 4 THEN 'request' ELSE 'response' END"
    " || e'\\r\\n' || 'WARC-Record-ID: <urn:test:' || CAST(doc_id AS VARCHAR)"
    " || '>' || e'\\r\\n' || 'WARC-Target-URI: ' || " + _DW_URL
    + " || e'\\r\\n' || 'WARC-Date: ' || " + _DW_DATE
    + " || e'\\r\\n' || 'Content-Length: ' || CAST(length(__pl) AS VARCHAR)"
    " || e'\\r\\n\\r\\n' || __pl || e'\\r\\n\\r\\n'"
)


def warc_fixture_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """37 synthetic WARC segment blobs (seg, data:binary) built from
    the documents table — records concatenated in doc_id order."""
    recs = (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_W_PAYLOAD} as __pl", "text")
        .selectExpr("doc_id % 37 as seg", "doc_id", f"{_W_REC} as rec")
    )
    return recs.groupBy("seg").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda s: s["rec"],
            ),
            "",
        )
        .cast("binary")
        .alias("data")
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion (sources/warc.warc_response_pages): synthetic
    segment blobs → the canonical pages table. Request records are
    skipped; Content-Length slicing survives bodies that embed blank
    lines; status/charset/http-version variants all parse. The oracle
    re-synthesizes the IDENTICAL blobs in DuckDB and restates the
    frozen parse rule with strpos/substr arithmetic."""
    from .sources.warc import warc_response_pages

    blobs = warc_fixture_blobs(spark, sf_dir)
    pages = warc_response_pages(blobs, keep_cols=("seg",))
    return pages.select(
        "seg",
        "url",
        "warc_ts",
        "http_status",
        "content_type",
        F.col("html").cast("string").alias("html_text"),
    )


O_WARC_INGEST = f"""
WITH pl AS MATERIALIZED (
  SELECT doc_id, text, {_DW_PAYLOAD} AS __pl FROM documents
), rec0 AS MATERIALIZED (
  SELECT doc_id, doc_id % 37 AS seg, {_DW_REC} AS rec FROM pl
), blob AS MATERIALIZED (
  SELECT seg, string_agg(rec, '' ORDER BY doc_id) AS data FROM rec0 GROUP BY seg
), r AS (
  SELECT seg, unnest(string_split(data, 'WARC/1.0' || e'\\r\\n')) AS rec
  FROM blob
), f AS (
  SELECT seg, rec,
         substr(rec, 1, strpos(rec, e'\\r\\n\\r\\n') - 1) AS hdr,
         substr(rec, strpos(rec, e'\\r\\n\\r\\n') + 4) AS rest
  FROM r WHERE rec <> ''
), g AS (
  SELECT seg,
         regexp_extract(hdr, 'WARC-Type: ([^\\r\\n]*)', 1) AS warc_type,
         regexp_extract(hdr, 'WARC-Target-URI: ([^\\r\\n]*)', 1) AS target_uri,
         regexp_extract(hdr, 'WARC-Date: ([^\\r\\n]*)', 1) AS warc_date,
         substr(rest, 1,
                TRY_CAST(regexp_extract(hdr, 'Content-Length: ([^\\r\\n]*)', 1)
                         AS INT)) AS payload
  FROM f
), h AS (
  SELECT seg, target_uri, warc_date, payload,
         substr(payload, 1, strpos(payload, e'\\r\\n\\r\\n') - 1) AS http_hdr
  FROM g WHERE warc_type = 'response' AND payload IS NOT NULL
)
SELECT seg, target_uri AS url,
       strptime(replace(warc_date, 'Z', ''), '%Y-%m-%dT%H:%M:%S') AS warc_ts,
       TRY_CAST(regexp_extract(payload, '^HTTP/1\\.[01] ([0-9]{{3}})', 1)
                AS INT) AS http_status,
       regexp_extract(http_hdr, 'Content-Type: ([^\\r\\n]*)', 1)
         AS content_type,
       substr(payload, strpos(payload, e'\\r\\n\\r\\n') + 4) AS html_text
FROM h
"""


# ---------------------------------------------------------------------------
# TrustRank — seeded PageRank, trust flows outward from vetted hosts
# ---------------------------------------------------------------------------

_TR_ITERATIONS = 4
_TR_DAMPING = 0.85
TR_SEEDS = ("h1", "h2", "h3")

# same synthetic host-graph shape as the pagerank key (contract_graph):
# ~23 src hosts, ~29 dst hosts, self-loops removed
_TR_SRC = "concat('h', cast(doc_id % 23 as string))"
_TR_DST = "concat('h', cast((doc_id * 7 + n_chars) % 29 as string))"


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded TrustRank (operators/linkgraph.trustrank): teleport mass
    restricted to the trusted seed hosts, dangling mass returned to
    the seeds — hosts unreachable from the seed neighborhood score 0,
    which is the spam-demotion contract. The oracle unrolls the same
    fixed-iteration recurrence with the seed vector stated inline."""
    from .operators.linkgraph import trustrank

    docs = _t(spark, sf_dir, "documents")
    edges = docs.selectExpr(
        f"{_TR_SRC} as src_host", f"{_TR_DST} as dst_host"
    ).filter(F.col("src_host") != F.col("dst_host"))
    seeds = docs.sparkSession.createDataFrame(
        [(s,) for s in TR_SEEDS], "node string"
    )
    out = trustrank(
        edges, seeds, iterations=_TR_ITERATIONS, damping=_TR_DAMPING
    )
    return out.select("node", F.round("trust", 6).alias("trust"))


def _trustrank_oracle(iterations: int, damping: float) -> str:
    d_src = "'h' || CAST(doc_id % 23 AS VARCHAR)"
    d_dst = "'h' || CAST((doc_id * 7 + n_chars) % 29 AS VARCHAR)"
    seeds_rows = ", ".join(f"('{s}')" for s in TR_SEEDS)
    svec = (
        "CASE WHEN b.is_seed THEN CAST(1 AS DOUBLE) / (SELECT n FROM ns)"
        " ELSE CAST(0 AS DOUBLE) END"
    )
    head = f"""WITH e AS MATERIALIZED (
  SELECT DISTINCT {d_src} AS src, {d_dst} AS dst
  FROM documents WHERE {d_src} <> {d_dst}
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
), seedtab(node) AS (VALUES {seeds_rows}),
ns AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM nodes JOIN seedtab USING (node)
),
deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
base AS MATERIALIZED (
  SELECT nodes.node, coalesce(deg.outdeg, 0) AS outdeg,
         seedtab.node IS NOT NULL AS is_seed
  FROM nodes LEFT JOIN deg ON nodes.node = deg.node
  LEFT JOIN seedtab ON nodes.node = seedtab.node
), r0 AS (
  SELECT b.node, b.outdeg, b.is_seed, {svec} AS trust FROM base b
)"""
    parts = [head]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", d{i} AS (
  SELECT coalesce(sum(trust), CAST(0 AS DOUBLE)) AS dmass
  FROM r{p} WHERE outdeg = 0
), c{i} AS (
  SELECT e.dst AS node, sum(r.trust / CAST(r.outdeg AS DOUBLE)) AS contrib
  FROM e JOIN r{p} r ON e.src = r.node
  WHERE r.outdeg > 0
  GROUP BY e.dst
), r{i} AS (
  SELECT b.node, b.outdeg, b.is_seed,
         (CAST(1 AS DOUBLE) - {damping}) * {svec}
         + {damping} * (coalesce(c{i}.contrib, CAST(0 AS DOUBLE))
                        + (SELECT dmass FROM d{i}) * {svec}) AS trust
  FROM base b LEFT JOIN c{i} ON b.node = c{i}.node
)""")
    parts.append(f"\nSELECT node, round(trust, 6) AS trust FROM r{iterations}")
    return "".join(parts)


O_TRUSTRANK = _trustrank_oracle(_TR_ITERATIONS, _TR_DAMPING)


# ---------------------------------------------------------------------------
# containment near-dup: the wrapper-page signal Jaccard misses
# ---------------------------------------------------------------------------

_WRAP_PRE = "home about contact login search "
_WRAP_POST = " copyright terms privacy sitemap newsletter"


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment verify (operators/dedup.containment_verify_pairs):
    every 20th document gets a planted WRAPPER twin (same text inside
    nav/footer boilerplate). The wrapper's chrome dilutes Jaccard, but
    the original's shingles are all inside it — containment1 must be
    exactly 1.0 for every planted pair while jaccard sits well below.
    The oracle restates the shared shingle chain with DuckDB lists."""
    from .operators.dedup import containment_verify_pairs

    d = _t(spark, sf_dir, "documents")
    wrapped = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit(_WRAP_PRE), F.col("text"), F.lit(_WRAP_POST)).alias(
            "text"
        ),
    )
    corpus = d.select("doc_id", "text").unionAll(wrapped)
    pairs = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("doc1"),
        (F.col("doc_id") + 200000).alias("doc2"),
    )
    return containment_verify_pairs(corpus, pairs)


def _o_dedup_containment() -> str:
    from .contract_ml import _D_STR_HASH, _D_TOKS
    from .functions.hashing import P

    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         '{_WRAP_PRE}' || text || '{_WRAP_POST}'
  FROM documents WHERE doc_id % 20 = 0
), t AS (
  SELECT doc_id, {_D_TOKS} AS toks FROM corpus
), tokh AS (
  SELECT doc_id,
         list_transform(toks, s -> {_D_STR_HASH.format(s="s")}) AS th
  FROM t WHERE len(toks) >= 3
), hs AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(th) - 1),
           i -> ((th[i] * 131 + th[i+1]) % {P} * 131 + th[i+2]) % {P})) AS hs
  FROM tokh
), pairs AS (
  SELECT doc_id AS doc1, doc_id + 200000 AS doc2
  FROM documents WHERE doc_id % 20 = 0
)
SELECT p.doc1 AS doc1, p.doc2 AS doc2,
       round(len(list_intersect(a.hs, b.hs)) * CAST(1.0 AS DOUBLE) /
             len(list_distinct(list_concat(a.hs, b.hs))), 6) AS jaccard,
       round(len(list_intersect(a.hs, b.hs)) * CAST(1.0 AS DOUBLE) /
             len(a.hs), 6) AS containment1,
       round(len(list_intersect(a.hs, b.hs)) * CAST(1.0 AS DOUBLE) /
             len(b.hs), 6) AS containment2,
       round(greatest(
             len(list_intersect(a.hs, b.hs)) * CAST(1.0 AS DOUBLE) / len(a.hs),
             len(list_intersect(a.hs, b.hs)) * CAST(1.0 AS DOUBLE) / len(b.hs)
       ), 6) AS containment
FROM pairs p
JOIN hs a ON a.doc_id = p.doc1
JOIN hs b ON b.doc_id = p.doc2
"""


O_DEDUP_CONTAINMENT = _o_dedup_containment()


# ---------------------------------------------------------------------------
# log-histogram quantile sketch
# ---------------------------------------------------------------------------

_HIST_QS = (0.5, 0.9, 0.99)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-histogram quantiles (operators/sketches.
    hist_build/hist_merge/hist_quantiles): per-language doc-length
    p50/p90/p99 from O(bins) state. The Spark side builds TWO shard
    histograms (even/odd doc_id) and MERGES them; the oracle builds
    once over all rows and restates the frozen bin/rank/interpolation
    arithmetic — equality through the typed gate proves both the
    quantile rule and union-mergeability. Binning is exact integer +
    power-of-two double arithmetic (no libm log2 — Spark's
    log(x)/log(2) misrounds at exact powers of two)."""
    from .operators.sketches import hist_build, hist_merge, hist_quantiles

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    h_even = hist_build(d.filter(F.col("doc_id") % 2 == 0), ("lang",), "n_chars")
    h_odd = hist_build(d.filter(F.col("doc_id") % 2 == 1), ("lang",), "n_chars")
    return hist_quantiles(hist_merge(h_even, h_odd), ("lang",), qs=_HIST_QS)


def _o_hist_quantiles(k: int = 8) -> str:
    d_bin = (
        f"(length(bin(CAST(v + 1 AS BIGINT))) - 1) * {k}"
        f" + CAST(floor(((CAST(v + 1 AS DOUBLE)"
        f" / power(CAST(2 AS DOUBLE), length(bin(CAST(v + 1 AS BIGINT))) - 1))"
        f" - CAST(1 AS DOUBLE)) * CAST({k} AS DOUBLE)) AS INT)"
    )

    def d_lo(b: str) -> str:
        return (
            f"(power(CAST(2 AS DOUBLE), ({b}) // {k})"
            f" * (CAST(1 AS DOUBLE) + CAST(({b}) % {k} AS DOUBLE)"
            f" / CAST({k} AS DOUBLE)) - CAST(1 AS DOUBLE))"
        )

    qvals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in _HIST_QS)
    return f"""
WITH v AS (
  SELECT lang, n_chars AS v FROM documents
  WHERE n_chars IS NOT NULL AND n_chars >= 0
), b AS (
  SELECT lang, {d_bin} AS bin, count(*) AS cnt FROM v GROUP BY lang, bin
), c AS MATERIALIZED (
  SELECT lang, bin, cnt,
         sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS n
  FROM b
), qs(q) AS (VALUES {qvals}),
r AS (
  SELECT lang, q, bin, cnt, cum,
         floor(q * (n - 1)) + 1 AS rank
  FROM c CROSS JOIN qs
  WHERE cum >= floor(q * (n - 1)) + 1
), m AS (
  SELECT lang, q,
         min({{'bin': bin, 'cnt': cnt, 'cum': cum, 'rank': rank}}) AS s
  FROM r GROUP BY lang, q
)
SELECT lang, q,
       round({d_lo("s.bin")}
             + ({d_lo("s.bin + 1")} - {d_lo("s.bin")})
             * (s.rank - (s.cum - s.cnt)) / s.cnt, 6) AS est
FROM m
"""


O_HIST_QUANTILES = _o_hist_quantiles()


# ---------------------------------------------------------------------------
# RSS / Atom feed harvesting (operators/feeds)
# ---------------------------------------------------------------------------

# Twelve synthetic feed bodies: %4==0 → RSS 2.0 (item with trimmed
# link + date, item with no date/empty title → NULLs, a duplicate
# link with a LATER date and different title — field-wise min keeps
# the earlier date and the lexicographic-min title, a host-relative
# link rebased as https://host||link, a mailto: drop, an empty-link
# drop, and a trailing '<feed' comment the first-occurrence rule must
# ignore); %4==1 → Atom (attribute links, entry tag with attributes,
# href trimming, trailing '<rss' comment); %4==2 → not a feed (zero
# rows); %4==3 → a '<feed' comment BEFORE the '<rss' tag: kind
# resolves to atom by the frozen precedence rule, no <entry> blocks
# exist, zero rows — the rule's sharp edge, pinned.

_FD_N = 12
_FD_HOST = "concat('h', cast(doc_id as string), '.example.org')"
_FD_X = "cast(doc_id % 9 + 1 as string)"
_FD_BODY = f"""CASE doc_id % 4 WHEN 0 THEN concat(
    '<?xml version="1.0"?>', chr(10),
    '<rss version="2.0"><channel>', chr(10),
    '<title>chan</title><link>https://', {_FD_HOST}, '/</link>', chr(10),
    '<item>', chr(10),
    '<title>post ', cast(doc_id as string), ' a</title>', chr(10),
    '<link> https://', {_FD_HOST}, '/a/', cast(doc_id as string), ' </link>', chr(10),
    '<pubDate>2024-01-0', {_FD_X}, '</pubDate>', chr(10),
    '</item>', chr(10),
    '<item><link>https://', {_FD_HOST}, '/b/', cast(doc_id as string), '</link><title></title></item>', chr(10),
    '<item><link>https://', {_FD_HOST}, '/a/', cast(doc_id as string), '</link><pubDate>2025-09-09</pubDate><title>zzz later</title></item>', chr(10),
    '<item><link>/rel/', cast(doc_id as string), '</link><title>rel post</title></item>', chr(10),
    '<item><link>mailto:x@example.org</link><title>m</title></item>', chr(10),
    '<item><link></link><title>ghost</title></item>', chr(10),
    '</channel></rss>', chr(10), '<!-- mirrors <feed> -->')
  WHEN 1 THEN concat(
    '<feed xmlns="http://www.w3.org/2005/Atom">', chr(10),
    '<title>feed</title>', chr(10),
    '<entry>', chr(10),
    '<title>entry ', cast(doc_id as string), ' zero</title>', chr(10),
    '<link rel="alternate" href="https://', {_FD_HOST}, '/e/', cast(doc_id as string), '/0"/>', chr(10),
    '<updated>2024-02-0', {_FD_X}, '</updated>', chr(10),
    '</entry>', chr(10),
    '<entry xml:lang="en"><link href=" https://', {_FD_HOST}, '/e/', cast(doc_id as string), '/1 "/></entry>', chr(10),
    '</feed>', chr(10), '<!-- <rss inside comment -->')
  WHEN 2 THEN '<html>not a feed</html>'
  ELSE concat('<!-- syndication: <feed --> ',
    '<rss version="2.0"><channel><item><link>https://', {_FD_HOST},
    '/x</link></item></channel></rss>')
  END"""


def q_feed_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed harvesting (operators/feeds.feed_entries): RSS-vs-Atom by
    first-occurrence precedence, (?s) block harvest, element links for
    RSS / attribute hrefs for Atom, trim + empty→NULL, field-wise-min
    dedupe on (host, link). Scan-stage column math + one
    partial-aggregable group; the oracle states the expected rows
    from the same arithmetic — it never parses."""
    from .operators.feeds import feed_entries

    fetched = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_FD_N}")
        .selectExpr(
            f"{_FD_HOST} as host", f"cast({_FD_BODY} as binary) as body"
        )
    )
    return feed_entries(fetched)


_D_FD_HOST = "'h' || CAST(doc_id AS VARCHAR) || '.example.org'"
_D_FD_X = "CAST(doc_id % 9 + 1 AS VARCHAR)"
O_FEED_HARVEST = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_FD_N}),
rss AS (SELECT doc_id FROM d WHERE doc_id % 4 = 0),
atom AS (SELECT doc_id FROM d WHERE doc_id % 4 = 1)
SELECT {_D_FD_HOST} AS host,
       'https://' || {_D_FD_HOST} || '/a/' || CAST(doc_id AS VARCHAR) AS link,
       '2024-01-0' || {_D_FD_X} AS published,
       'post ' || CAST(doc_id AS VARCHAR) || ' a' AS title,
       'rss' AS kind
FROM rss
UNION ALL
SELECT {_D_FD_HOST},
       'https://' || {_D_FD_HOST} || '/b/' || CAST(doc_id AS VARCHAR),
       NULL, NULL, 'rss'
FROM rss
UNION ALL
SELECT {_D_FD_HOST},
       'https://' || {_D_FD_HOST} || '/rel/' || CAST(doc_id AS VARCHAR),
       NULL, 'rel post', 'rss'
FROM rss
UNION ALL
SELECT {_D_FD_HOST},
       'https://' || {_D_FD_HOST} || '/e/' || CAST(doc_id AS VARCHAR) || '/0',
       '2024-02-0' || {_D_FD_X},
       'entry ' || CAST(doc_id AS VARCHAR) || ' zero', 'atom'
FROM atom
UNION ALL
SELECT {_D_FD_HOST},
       'https://' || {_D_FD_HOST} || '/e/' || CAST(doc_id AS VARCHAR) || '/1',
       NULL, NULL, 'atom'
FROM atom
"""


# ---------------------------------------------------------------------------
# Redirect chain resolution (operators/redirects)
# ---------------------------------------------------------------------------

# Sixteen doc groups, scenario by doc_id % 8 on host h<doc_id>: (0) a
# 2-step chain; (1) a self-loop; (2) a 2-cycle; (3) an ambiguous src
# collapsing to min(dst); (4) a host-relative Location; (5) only
# droppable forms (protocol-relative, mailto:, empty, a 200 with a
# Location set) -> zero output rows; (6) a 6-step chain resolved at
# max_hops=4 -> the two deep srcs unresolved, the exact-cap src (4
# hops) resolved; (7) an ambiguity in the MIDDLE of a chain. The
# oracle states the closed-form expected walk per scenario -- it never
# recurses.

_RD_N = 16
_RD_H = "concat('https://h', cast(doc_id as string), '.example.org')"


def _rd_row(path: str, status: int, loc: str) -> str:
    return f"named_struct('path', {path}, 'status', {status}, 'loc', {loc})"


def _rd_rows() -> str:
    h = _RD_H
    return f"""CASE doc_id % 8
 WHEN 0 THEN array(
   {_rd_row("'/c/0'", 301, f"concat({h}, '/c/1')")},
   {_rd_row("'/c/1'", 302, f"concat({h}, '/c/2')")})
 WHEN 1 THEN array({_rd_row("'/self'", 301, f"concat({h}, '/self')")})
 WHEN 2 THEN array(
   {_rd_row("'/cy/a'", 301, f"concat({h}, '/cy/b')")},
   {_rd_row("'/cy/b'", 302, f"concat({h}, '/cy/a')")})
 WHEN 3 THEN array(
   {_rd_row("'/amb'", 301, f"concat({h}, '/z2')")},
   {_rd_row("'/amb'", 307, f"concat({h}, '/z1')")})
 WHEN 4 THEN array({_rd_row("'/rel'", 308, "' /rel/target '")})
 WHEN 5 THEN array(
   {_rd_row("'/drop1'", 301, "'//cdn.example.net/x'")},
   {_rd_row("'/drop2'", 302, "'mailto:x@example.org'")},
   {_rd_row("'/drop3'", 303, "''")},
   {_rd_row("'/notredir'", 200, f"concat({h}, '/t')")})
 WHEN 6 THEN transform(sequence(0, 5), i -> named_struct(
   'path', concat('/l/', cast(i as string)), 'status', 301,
   'loc', concat({h}, '/l/', cast(i + 1 as string))))
 ELSE array(
   {_rd_row("'/e/0'", 301, f"concat({h}, '/e/1')")},
   {_rd_row("'/e/1'", 301, f"concat({h}, '/e/2')")},
   {_rd_row("'/e/1'", 301, f"concat({h}, '/e/9')")})
 END"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect harvest + pointer-doubling chain resolution
    (operators/redirects): 3xx gate, Location normalization (absolute
    kept, host-relative rebased on the src origin, protocol-relative /
    mailto: / empty dropped), min(dst) ambiguity collapse, exact hop
    counts up to max_hops=4, cycles and over-cap chains unresolved."""
    from .operators.redirects import redirect_edges, resolve_redirects

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_RD_N}")
        .selectExpr("doc_id", f"explode({_rd_rows()}) as r")
        .selectExpr(
            f"concat({_RD_H}, r.path) as url",
            "r.status as http_status",
            "r.loc as location",
        )
    )
    out = resolve_redirects(redirect_edges(fx), max_hops=4)
    return out.select(
        "src_url",
        "final_url",
        F.col("hops").cast("int").alias("hops"),
        "resolved",
    )


_D_RD_H = "'https://h' || CAST(doc_id AS VARCHAR) || '.example.org'"
O_REDIRECT_RESOLVE = f"""
WITH d AS (SELECT doc_id, {_D_RD_H} AS h FROM documents WHERE doc_id < {_RD_N})
SELECT h || '/c/0' AS src_url, h || '/c/2' AS final_url,
       CAST(2 AS INT) AS hops, TRUE AS resolved
FROM d WHERE doc_id % 8 = 0
UNION ALL
SELECT h || '/c/1', h || '/c/2', CAST(1 AS INT), TRUE FROM d WHERE doc_id % 8 = 0
UNION ALL
SELECT h || '/self', CAST(NULL AS VARCHAR), CAST(NULL AS INT), FALSE
FROM d WHERE doc_id % 8 = 1
UNION ALL
SELECT h || '/cy/a', CAST(NULL AS VARCHAR), CAST(NULL AS INT), FALSE
FROM d WHERE doc_id % 8 = 2
UNION ALL
SELECT h || '/cy/b', CAST(NULL AS VARCHAR), CAST(NULL AS INT), FALSE
FROM d WHERE doc_id % 8 = 2
UNION ALL
SELECT h || '/amb', h || '/z1', CAST(1 AS INT), TRUE FROM d WHERE doc_id % 8 = 3
UNION ALL
SELECT h || '/rel', h || '/rel/target', CAST(1 AS INT), TRUE
FROM d WHERE doc_id % 8 = 4
UNION ALL
SELECT h || '/l/' || CAST(i AS VARCHAR),
       CASE WHEN 6 - i <= 4 THEN h || '/l/6' END,
       CASE WHEN 6 - i <= 4 THEN CAST(6 - i AS INT) END,
       6 - i <= 4
FROM (SELECT doc_id, h FROM d WHERE doc_id % 8 = 6), generate_series(0, 5) AS t(i)
UNION ALL
SELECT h || '/e/0', h || '/e/2', CAST(2 AS INT), TRUE FROM d WHERE doc_id % 8 = 7
UNION ALL
SELECT h || '/e/1', h || '/e/2', CAST(1 AS INT), TRUE FROM d WHERE doc_id % 8 = 7
"""


# ---------------------------------------------------------------------------
# URL trap-template mining (operators/urltraps)
# ---------------------------------------------------------------------------

# Forty urls, five template families by doc_id % 5: (0) a calendar
# trap whose yyyy/m segments + page= values vary per doc; (1) a
# 32-hex session/content token (md5 -- both engines construct the
# SAME hex) collapsing to {x}; (2) query-order + duplicate-name
# variance collapsing to sorted distinct names; (3) digits embedded
# mid-segment plus a sub-8 hex run ('abc1234' stays 'abc{d}') and a
# fragment to drop; (4) a bare-host url with only a query, incl. a
# value-less flag param -> path '/'. The oracle CONSTRUCTS the same
# urls and restates the full templatization chain (dual derivation).

_UT_N = 40
_UT_URL = """CASE doc_id % 5
 WHEN 0 THEN concat('https://trap.example.org/cal/',
   cast(2000 + doc_id as string), '/', cast(doc_id % 12 as string),
   '?page=', cast(doc_id as string))
 WHEN 1 THEN concat('https://s.example.org/item/',
   md5(cast(doc_id as string)), '/x')
 WHEN 2 THEN concat('https://q.example.org/s',
   CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=9&b=0&a=dup' END)
 WHEN 3 THEN concat('https://m.example.org/p', cast(doc_id as string),
   'q/abc1234#frag')
 ELSE concat('https://b.example.org?flag&x=', cast(doc_id as string))
 END"""


def q_url_trap_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining (operators/urltraps.template_stats): the
    frozen templatization (fragment drop, hex-run {x} before digit-run
    {d}, sorted distinct query names, empty path -> '/') + one
    partial-aggregable group with min-url exemplars."""
    from .operators.urltraps import template_stats

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_UT_N}")
        .selectExpr(f"{_UT_URL} as url")
    )
    return template_stats(fx)


_D_UT_URL = """CASE doc_id % 5
 WHEN 0 THEN 'https://trap.example.org/cal/' ||
   CAST(2000 + doc_id AS VARCHAR) || '/' || CAST(doc_id % 12 AS VARCHAR) ||
   '?page=' || CAST(doc_id AS VARCHAR)
 WHEN 1 THEN 'https://s.example.org/item/' ||
   md5(CAST(doc_id AS VARCHAR)) || '/x'
 WHEN 2 THEN 'https://q.example.org/s' ||
   CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=9&b=0&a=dup' END
 WHEN 3 THEN 'https://m.example.org/p' || CAST(doc_id AS VARCHAR) ||
   'q/abc1234#frag'
 ELSE 'https://b.example.org?flag&x=' || CAST(doc_id AS VARCHAR)
 END"""
# the full templatization chain as reusable DuckDB SQL, shared by the
# contract oracle and the cross-engine fuzz harness
# (tests/test_fuzz_oracle_parity.py) — the input CTE must expose `url`
D_URL_TEMPLATE_CHAIN = """
t AS (
  SELECT url,
    regexp_replace(regexp_replace(url, '#.*$', ''),
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS tail
  FROM u
), parts AS (
  SELECT url,
    CASE WHEN split_part(tail, '?', 1) = '' THEN '/'
         ELSE split_part(tail, '?', 1) END AS path,
    regexp_replace(tail, '^[^?]*\\??', '') AS query
  FROM t
), tpl AS (
  SELECT url,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
      || regexp_replace(regexp_replace(path, '[0-9a-f]{8,}', '{x}', 'g'),
                        '[0-9]+', '{d}', 'g')
      || CASE WHEN names = '' THEN '' ELSE '?' || names END AS template
  FROM (
    SELECT url, path,
      -- DuckDB's list chain yields NULL (not '') on an empty list
      COALESCE(array_to_string(list_sort(list_distinct(list_filter(
        list_transform(string_split(query, '&'),
                       p -> split_part(p, '=', 1)),
        x -> x <> ''))), '&'), '') AS names
    FROM parts
  )
)
"""

O_URL_TRAP_TEMPLATES = f"""
WITH u AS (SELECT {_D_UT_URL} AS url FROM documents WHERE doc_id < {_UT_N}),
{D_URL_TEMPLATE_CHAIN.strip()}
SELECT template, COUNT(*) AS n_urls, MIN(url) AS exemplar
FROM tpl GROUP BY template
"""


# ---------------------------------------------------------------------------
# PDF text extraction (sources/pdf)
# ---------------------------------------------------------------------------

# Twelve synthetic PDFs (uncompressed content streams so the whole
# fixture lives in SQL; the FlateDecode lane is pytest-pinned with
# real zlib bytes, tests/test_pdf.py): %3==0 -> no /Length (tolerant
# endstream scan), Tj + Td newline, a second non-stream object;
# %3==1 -> /Length EXACTLY covers the first 29 bytes, proving the
# declared length beats the endstream scan (a second BT block past
# the cutoff must vanish), TJ array concat + the ' newline-then-show
# operator; %3==2 -> a content stream with no BT at all (zero text,
# parse_ok stays true). The oracle states expected rows closed-form.

_PDF_N = 12
_PDF_BODY = """CASE doc_id % 3
 WHEN 0 THEN concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10), '<< >>', chr(10), 'stream', chr(10),
   'BT (Hello ', cast(doc_id as string), ') Tj 0 -14 Td (World) Tj ET',
   chr(10), 'endstream', chr(10), 'endobj', chr(10),
   '2 0 obj', chr(10), '<< /Type /Catalog >>', chr(10), 'endobj', chr(10))
 WHEN 1 THEN concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10), '<< /Length 29 >>', chr(10), 'stream', chr(10),
   'BT [(A) -200 (B)] TJ (C) '' ET', chr(10),
   'BT (past the length) Tj ET', chr(10),
   'endstream', chr(10), 'endobj', chr(10))
 ELSE concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10), '<< >>', chr(10), 'stream', chr(10),
   'q 1 0 0 1 0 0 cm Q', chr(10), 'endstream', chr(10), 'endobj', chr(10),
   '2 0 obj', chr(10), '<< /Pages 3 0 R >>', chr(10), 'endobj', chr(10))
 END"""


def q_pdf_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction (sources/pdf.pdf_text): object/stream
    framing in file order, /Length honored over the endstream scan,
    BT/ET block harvest with Tj / TJ-array / quote-op / Td-newline
    semantics. One Arrow-batched python stage (the codec lane)."""
    from .sources.pdf import pdf_text

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_PDF_N}")
        .selectExpr(
            "concat('u', cast(doc_id as string)) as url",
            f"cast({_PDF_BODY} as binary) as data",
        )
    )
    # block_spans projected to a canonical string (the gate compares
    # flat values; the nested form is pytest-covered)
    return pdf_text(fx).select(
        "url", "n_objects", "n_streams", "n_text_streams", "text",
        "parse_ok",
        F.expr(
            "array_join(transform(block_spans,"
            " s -> concat(s.start, '-', s.end)), ',')"
        ).alias("spans_repr"),
    )


O_PDF_TEXT_EXTRACT = f"""
WITH d AS (
  SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id < {_PDF_N}
)
SELECT url, CAST(2 AS INT) AS n_objects, CAST(1 AS INT) AS n_streams,
       CAST(1 AS INT) AS n_text_streams,
       'Hello ' || CAST(doc_id AS VARCHAR) || chr(10) || 'World' AS text,
       TRUE AS parse_ok,
       '0-' || CAST(12 + length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
         AS spans_repr
FROM d WHERE doc_id % 3 = 0
UNION ALL
SELECT url, 1, 1, 1, 'AB' || chr(10) || 'C', TRUE, '0-4'
FROM d WHERE doc_id % 3 = 1
UNION ALL
SELECT url, 2, 1, 0, '', TRUE, '' FROM d WHERE doc_id % 3 = 2
"""


# ---------------------------------------------------------------------------
# PDF metadata + link actions (sources/pdf.pdf_doc_meta)
# ---------------------------------------------------------------------------

# %3==0 -> an Info dict with /Title and /Author plus two /URI actions
# (one duplicated -> first-seen dedupe); %3==1 -> no Info, a /URI
# inside an (uncompressed) content stream, found on the raw surface;
# %3==2 -> no metadata at all (NULLs, zero uris). UTF-16BE strings
# and Flate surfaces are pytest-pinned (bytes SQL cannot synthesize).

_PM_N = 12
_PM_BODY = """CASE doc_id % 3
 WHEN 0 THEN concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10),
   '<< /Title (Report ', cast(doc_id as string),
   ') /Author (Au ', cast(doc_id as string), ') >>', chr(10),
   'endobj', chr(10),
   '2 0 obj', chr(10),
   '<< /A << /S /URI /URI (https://x.org/', cast(doc_id as string),
   ') >> >>', chr(10), 'endobj', chr(10),
   '3 0 obj', chr(10),
   '<< /A << /URI (https://x.org/', cast(doc_id as string),
   ') >> /B << /URI (https://y.org/', cast(doc_id as string),
   ') >> >>', chr(10), 'endobj', chr(10))
 WHEN 1 THEN concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10), '<< >>', chr(10), 'stream', chr(10),
   'BT (t) Tj ET << /URI (https://s.org/', cast(doc_id as string),
   ') >>', chr(10), 'endstream', chr(10), 'endobj', chr(10))
 ELSE concat('%PDF-1.4', chr(10),
   '1 0 obj', chr(10), '<< /Type /Catalog >>', chr(10), 'endobj', chr(10))
 END"""


def q_pdf_meta_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF descriptive metadata + /URI link actions
    (sources/pdf.pdf_doc_meta): first /Title and /Author in file
    order, URIs deduplicated first-seen across raw object bodies and
    decoded streams. One Arrow-batched codec stage."""
    from .sources.pdf import pdf_doc_meta

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_PM_N}")
        .selectExpr(
            "concat('u', cast(doc_id as string)) as url",
            f"cast({_PM_BODY} as binary) as data",
        )
    )
    return pdf_doc_meta(fx).select(
        "url", "title", "author",
        F.array_join("uris", ",").alias("uris_repr"),
    )


O_PDF_META_LINKS = f"""
WITH d AS (
  SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id AS VARCHAR) AS i
  FROM documents WHERE doc_id < {_PM_N}
)
SELECT url, 'Report ' || i AS title, 'Au ' || i AS author,
       'https://x.org/' || i || ',https://y.org/' || i AS uris_repr
FROM d WHERE doc_id % 3 = 0
UNION ALL
SELECT url, NULL, NULL, 'https://s.org/' || i FROM d WHERE doc_id % 3 = 1
UNION ALL
SELECT url, NULL, NULL, '' FROM d WHERE doc_id % 3 = 2
"""


def q_warc_bytes_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact WARC walk (sources/warc.warc_pages_bytes) over the
    SAME synthetic blobs as warc_ingest, against the SAME restated
    oracle — dual-implementation parity: the python byte walk and the
    JVM string scan must agree wherever chars == bytes (the fixture is
    ASCII; the byte walk's reason to exist — gzip / multibyte payloads
    — is pytest-pinned, tests/test_warc_location.py)."""
    from .sources.warc import warc_pages_bytes

    blobs = warc_fixture_blobs(spark, sf_dir)
    pages = warc_pages_bytes(blobs, keep_cols=("seg",))
    return pages.select(
        "seg",
        "url",
        "warc_ts",
        "http_status",
        "content_type",
        F.col("html").cast("string").alias("html_text"),
    )


O_WARC_BYTES_PARITY = O_WARC_INGEST


# ---------------------------------------------------------------------------
# audio/video container metadata (functions/multimodal.media_meta)
# ---------------------------------------------------------------------------

# ASCII-safe container bytes (every byte < 0x80, so the SQL string ->
# binary cast is byte-exact — the chr() trick): %3==0 a canonical WAV
# (fmt + data chunks; channels alternate 1/2 by doc, 8000 Hz 16-bit,
# data sized to EXACTLY 1 s); %3==1 an ISO-BMFF mp4 (ftyp isom + moov
# -> mvhd v0, timescale 600, duration 1800 -> 3.0 s); %3==2 not a
# container at all -> NULL fields, row kept. Multi-byte fields whose
# values would set the high bit are pytest territory.

_MM_N = 12
_MM_WAV = (
    "concat('RIFF', chr(36), chr(0), chr(0), chr(0), 'WAVE',"
    " 'fmt ', chr(16), chr(0), chr(0), chr(0),"
    " chr(1), chr(0),"                        # PCM
    " chr(1 + cast(doc_id % 2 as int)), chr(0),"  # channels 1|2
    " chr(64), chr(31), chr(0), chr(0),"      # 8000 Hz LE
    " chr(0), chr(125), chr(0), chr(0),"      # byte rate 32000 LE
    " chr(4), chr(0), chr(16), chr(0),"       # block align, 16 bits
    " 'data', chr(0), chr(125), chr(0), chr(0))"  # data size 32000
)
_MM_MP4 = (
    "concat(chr(0), chr(0), chr(0), chr(16), 'ftyp', 'isom',"
    " chr(0), chr(0), chr(0), chr(0),"
    " chr(0), chr(0), chr(0), chr(36), 'moov',"
    " chr(0), chr(0), chr(0), chr(28), 'mvhd',"
    " repeat(chr(0), 12),"                    # v0 + flags + times
    " chr(0), chr(0), chr(2), chr(88),"       # timescale 600 BE
    " chr(0), chr(0), chr(7), chr(8))"        # duration 1800 BE
)
_MM_BODY = f"""CASE doc_id % 3
 WHEN 0 THEN {_MM_WAV}
 WHEN 1 THEN {_MM_MP4}
 ELSE '<html>'
 END"""


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video container metadata (functions/multimodal.
    media_meta): WAV RIFF chunk walk (fmt + data, duration = data
    bytes / byte rate) and MP4 box walk (ftyp brand, moov→mvhd
    timescale/duration) — header arithmetic only, unknown containers
    keep NULL-field rows."""
    from .functions.multimodal import media_meta

    fx = (
        _t(spark, sf_dir, "documents")
        .filter(f"doc_id < {_MM_N}")
        .selectExpr("doc_id", f"cast({_MM_BODY} as binary) as blob")
    )
    # 'aid' sorts alphabetically FIRST so the gate's column-sorted
    # row tuples compare on the unique key before any NULL-mixed field
    return media_meta(fx).withColumnRenamed("doc_id", "aid")


O_MEDIA_META = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_MM_N})
SELECT doc_id AS aid, CAST(44 AS BIGINT) AS n_bytes, 'wav' AS kind,
       CAST(1 + doc_id % 2 AS INT) AS channels, CAST(8000 AS INT)
         AS sample_rate, CAST(16 AS INT) AS bits,
       CAST(NULL AS VARCHAR) AS brand, ROUND(32000.0 / 32000.0, 6)
         AS duration_s
FROM d WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 52, 'mp4', NULL, NULL, NULL, 'isom',
       ROUND(1800.0 / 600.0, 6)
FROM d WHERE doc_id % 3 = 1
UNION ALL
SELECT doc_id, 6, CAST(NULL AS VARCHAR), NULL, NULL, NULL, NULL,
       CAST(NULL AS DOUBLE)
FROM d WHERE doc_id % 3 = 2
"""
