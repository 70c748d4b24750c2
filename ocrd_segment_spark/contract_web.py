"""Contract queries + DuckDB oracles: sketches, HITS, crawl waves,
JSON-LD structured data.

Same discipline as contract_ml/contract_graph: every Spark query runs
the SHIPPED operator; every oracle restates the frozen semantics in
portable SQL with identical column aliases, double-cast literals
(DuckDB decimal literals must not leak DECIMAL arithmetic into a
double pipeline — the CLAUDE.md typed-hash trap, reversed), and
``AS MATERIALIZED`` on every CTE referenced more than once (DuckDB
inlines per REFERENCE; an unrolled iteration chain re-executes
exponentially without it — the session-3 trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .contract_ml import _D_STR_HASH, _t
from .functions.hashing import P

# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

_HLL_R = 32

# host mix: ~10% of docs land on ~97 tiny 't' hosts (1 url each → the
# linear-counting branch, V large), the rest on 5 big 'h' hosts
# (~90 urls each → the raw harmonic-mean branch at r=32: E > 2.5r)
_HLL_HOST = (
    "CASE WHEN doc_id % 10 = 0 THEN concat('t', cast(doc_id % 97 as string))"
    " ELSE concat('h', cast(doc_id % 5 as string)) END"
)
_HLL_KEY = "concat('u', cast(doc_id % 163 as string))"

_D_HLL_HOST = (
    "CASE WHEN doc_id % 10 = 0 THEN 't' || CAST(doc_id % 97 AS VARCHAR)"
    " ELSE 'h' || CAST(doc_id % 5 AS VARCHAR) END"
)
_D_HLL_KEY = "'u' || CAST(doc_id % 163 AS VARCHAR)"


def _d_hll_estimate(r: int) -> str:
    """DuckDB twin of sketches.hll_estimate's frozen formula over a
    per-group (cnt, sum_pow) aggregate named ``est`` — every literal
    double-cast so no DECIMAL arithmetic sneaks in."""
    alpha = f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / {r}))"
    denom = f"(({r} - cnt) * CAST(1.0 AS DOUBLE) + sum_pow)"
    raw = f"({alpha} * {r} * {r} / {denom})"
    v = f"({r} - cnt)"
    return (
        f"round(CASE WHEN {raw} <= CAST(2.5 AS DOUBLE) * {r} AND {v} > 0"
        f" THEN {r} * ln(CAST({r} AS DOUBLE) / {v}) ELSE {raw} END, 6)"
    )


def _d_hll_mix_and_regs(src: str, r: int, group: str = "host") -> str:
    """DuckDB CTE chain (m1, m2, mx, regs) over ``src`` rows carrying
    (group, hv): the Mueller mix (sketches.hll_mix_steps restated —
    xor() is DuckDB's spelling of Spark's ^), then reg = top p bits,
    rho = (32-p) - floor(log2(low-bits + 0.5)) with the w = 0 cap
    (sketches.hll_rho_sql restated)."""
    from .operators.sketches import MIX_C, MIX_MOD, _wbits

    wb = _wbits(r)
    m = 1 << wb
    w = f"(v % {m})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {wb + 1}"
        f" ELSE {wb} - CAST(floor(log2({w} + CAST(0.5 AS DOUBLE))) AS INT) END"
    )
    return f"""m1 AS (
  SELECT {group}, (xor(hv >> 16, hv) * {MIX_C}) % {MIX_MOD} AS v FROM {src}
), m2 AS (
  SELECT {group}, (xor(v >> 16, v) * {MIX_C}) % {MIX_MOD} AS v FROM m1
), mx AS (
  SELECT {group}, xor(v >> 16, v) AS v FROM m2
), regs AS (
  SELECT {group}, v // {m} AS reg, max({rho}) AS rho
  FROM mx GROUP BY {group}, v // {m}
)"""


def q_hll_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-url estimate (operators/sketches.
    hll_distinct_by, r=32) next to the exact count: the sketch answers
    "how many distinct urls does this host contribute" with r rows of
    state per host instead of a distinct over the url column. The
    fixture exercises BOTH estimator branches (module constants);
    the oracle restates the identical register/rho/alpha arithmetic,
    so estimates match bit-for-bit including branch choice."""
    from .operators.sketches import hll_distinct_by

    d = _t(spark, sf_dir, "documents").selectExpr(
        f"{_HLL_HOST} as host", f"{_HLL_KEY} as url"
    )
    est = hll_distinct_by(d, ("host",), key_col="url", r=_HLL_R)
    exact = d.groupBy("host").agg(
        F.countDistinct("url").alias("exact_distinct")
    )
    return est.join(exact, "host").select(
        "host", "est_distinct", "exact_distinct"
    )


O_HLL_HOST_CARDINALITY = f"""
WITH b AS MATERIALIZED (
  SELECT {_D_HLL_HOST} AS host, {_D_HLL_KEY} AS url FROM documents
), h AS (
  SELECT host, {_D_STR_HASH.format(s="url")} AS hv FROM b
), {_d_hll_mix_and_regs("h", _HLL_R)}, est AS (
  SELECT host, count(*) AS cnt, sum(power(CAST(0.5 AS DOUBLE), rho)) AS sum_pow
  FROM regs GROUP BY host
), ex AS (
  SELECT host, count(DISTINCT url) AS exact_distinct FROM b GROUP BY host
)
SELECT est.host, {_d_hll_estimate(_HLL_R)} AS est_distinct, ex.exact_distinct
FROM est JOIN ex ON est.host = ex.host
"""


_HLL_GRP = "concat('g', cast(doc_id % 3 as string))"
_HLL_MKEY = "concat('k', cast(doc_id % 211 as string))"
_D_HLL_GRP = "'g' || CAST(doc_id % 3 AS VARCHAR)"
_D_HLL_MKEY = "'k' || CAST(doc_id % 211 AS VARCHAR)"


def q_hll_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge associativity proven THROUGH the gate: the Spark side
    builds separate register tables for the even and odd doc_ids and
    merges them (operators/sketches.hll_merge, register-wise max); the
    oracle builds ONE sketch over all rows. Equal estimates == the
    sketch of a union is the merge of the sketches — the property that
    lets 100 TB shards sketch locally and combine without re-scanning."""
    from .operators.sketches import hll_estimate, hll_merge, hll_registers

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HLL_GRP} as grp", f"{_HLL_MKEY} as k"
    )
    ra = hll_registers(
        d.filter("doc_id % 2 = 0"), key_col="k", r=_HLL_R, group_cols=("grp",)
    )
    rb = hll_registers(
        d.filter("doc_id % 2 = 1"), key_col="k", r=_HLL_R, group_cols=("grp",)
    )
    merged = hll_merge(ra, rb, group_cols=("grp",))
    return hll_estimate(merged, r=_HLL_R, group_cols=("grp",)).select(
        "grp", "est_distinct"
    )


O_HLL_MERGE_PARITY = f"""
WITH b AS (
  SELECT {_D_HLL_GRP} AS grp, {_D_HLL_MKEY} AS k FROM documents
), h AS (
  SELECT grp, {_D_STR_HASH.format(s="k")} AS hv FROM b
), {_d_hll_mix_and_regs("h", _HLL_R, group="grp")}, est AS (
  SELECT grp, count(*) AS cnt, sum(power(CAST(0.5 AS DOUBLE), rho)) AS sum_pow
  FROM regs GROUP BY grp
)
SELECT grp, {_d_hll_estimate(_HLL_R)} AS est_distinct FROM est
"""


# ---------------------------------------------------------------------------
# count-min heavy hitters
# ---------------------------------------------------------------------------

_CMS_D = 3
_CMS_W = 16
_CMS_THRESHOLD = 920


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-first heavy hitters (operators/sketches.
    cms_heavy_hitters): d=3×w=16 counters over ~15k token occurrences
    of a 31-term vocabulary — collisions are REAL at w=16, so
    cms_count genuinely overestimates and the exact-verify pass
    genuinely prunes; the oracle restates the same affine counter
    family, so estimates (and which false positives get pruned) match
    exactly."""
    from .operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(
        _t(spark, sf_dir, "documents"),
        threshold=_CMS_THRESHOLD,
        d=_CMS_D,
        w=_CMS_W,
    )


O_CMS_HEAVY_HITTERS = f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), th AS MATERIALIZED (
  SELECT term, {_D_STR_HASH.format(s="term")} AS hv FROM toks
), pos AS (
  SELECT term, hv, i, ((2*i + 3) * hv + 5*i + 7) % {P} % {_CMS_W} AS col
  FROM (SELECT term, hv, unnest([0, 1, 2]) AS i FROM th)
), sk AS MATERIALIZED (
  SELECT i, col, count(*) AS cnt FROM pos GROUP BY i, col
), lk AS (
  SELECT t.term, ii.i,
         ((2*ii.i + 3) * t.hv + 5*ii.i + 7) % {P} % {_CMS_W} AS col
  FROM (SELECT DISTINCT term, hv FROM th) t
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) ii
), cand AS MATERIALIZED (
  SELECT term, min(coalesce(sk.cnt, 0)) AS cms_count
  FROM lk LEFT JOIN sk ON sk.i = lk.i AND sk.col = lk.col
  GROUP BY term
  HAVING min(coalesce(sk.cnt, 0)) >= {_CMS_THRESHOLD}
), exact AS (
  SELECT term, count(*) AS exact_count FROM toks
  WHERE term IN (SELECT term FROM cand) GROUP BY term
)
SELECT cand.term, cms_count, exact_count
FROM cand JOIN exact ON cand.term = exact.term
WHERE exact_count >= {_CMS_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# HITS hubs / authorities
# ---------------------------------------------------------------------------

_HITS_ITERATIONS = 4

# the pagerank fixture's 29-node host graph shape with different
# multipliers: h23..h30 appear only as destinations (authority-only,
# hub 0), plus the mod-17 source classes give hub-only nodes too
_HITS_SRC = "concat('h', cast(doc_id % 17 as string))"
_HITS_DST = "concat('h', cast((doc_id * 5 + n_chars) % 31 as string))"
_D_HITS_SRC = "'h' || CAST(doc_id % 17 AS VARCHAR)"
_D_HITS_DST = "'h' || CAST((doc_id * 5 + n_chars) % 31 AS VARCHAR)"


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS (operators/linkgraph.hits) over a
    synthesized 31-node host graph with authority-only sinks (hub 0)
    and hub-only sources (authority 0). The oracle unrolls the
    identical L1-normalized alternation; scores round to 6 at the end
    only (pagerank's double-parity precedent)."""
    from .operators.linkgraph import hits

    edges = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            f"{_HITS_SRC} as src_host", f"{_HITS_DST} as dst_host"
        )
        .filter("src_host <> dst_host")
    )
    return hits(edges, iterations=_HITS_ITERATIONS)


def _hits_oracle(iterations: int) -> str:
    """Unrolled HITS SQL: h0 = 1/N; per round a_i = L1-normalized
    in-sums of h_{i-1}, h_i = L1-normalized out-sums of a_i — the
    exact frozen alternation of operators/linkgraph.hits. Every CTE
    in the chain is MATERIALIZED (each is referenced twice: once by
    the next step, once by its own normalizer subquery)."""
    head = f"""WITH e AS MATERIALIZED (
  SELECT DISTINCT {_D_HITS_SRC} AS src, {_D_HITS_DST} AS dst
  FROM documents
  WHERE {_D_HITS_SRC} <> {_D_HITS_DST}
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
h0 AS MATERIALIZED (
  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS hub FROM nodes
)"""
    parts = [head]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.hub) AS raw
  FROM e JOIN h{p} h ON e.src = h.node GROUP BY e.dst
), a{i} AS MATERIALIZED (
  SELECT node, raw / (SELECT sum(raw) FROM ar{i}) AS authority FROM ar{i}
), hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.authority) AS raw
  FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
), h{i} AS MATERIALIZED (
  SELECT node, raw / (SELECT sum(raw) FROM hr{i}) AS hub FROM hr{i}
)""")
    parts.append(f"""
SELECT n.node,
       round(coalesce(h.hub, CAST(0 AS DOUBLE)), 6) AS hub,
       round(coalesce(a.authority, CAST(0 AS DOUBLE)), 6) AS authority
FROM nodes n
LEFT JOIN h{iterations} h ON n.node = h.node
LEFT JOIN a{iterations} a ON n.node = a.node""")
    return "".join(parts)


O_HITS_SCORES = _hits_oracle(_HITS_ITERATIONS)


# ---------------------------------------------------------------------------
# crawl-wave politeness planner
# ---------------------------------------------------------------------------

_WAVE_SECONDS = 60.0

# host-constant delay (doc_id % 7 IS the host id); host h0 declares
# none → default_delay 1.0; lastmod missing on every 5th url → NULLS
# LAST ordering exercised
_WAVE_HOST = "concat('h', cast(doc_id % 7 as string))"
_WAVE_URL = "concat('https://h', cast(doc_id % 7 as string), '.example.org/p/', cast(doc_id as string))"
_WAVE_LASTMOD = (
    "CASE WHEN doc_id % 5 = 0 THEN NULL"
    " ELSE concat('2026-0', cast(1 + doc_id % 4 as string), '-01') END"
)
_WAVE_DELAY = (
    "CASE WHEN doc_id % 7 = 0 THEN NULL"
    " ELSE cast(doc_id % 7 as double) * 2.5D END"
)

_D_WAVE_HOST = "'h' || CAST(doc_id % 7 AS VARCHAR)"
_D_WAVE_URL = "'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)"
_D_WAVE_LASTMOD = (
    "CASE WHEN doc_id % 5 = 0 THEN NULL"
    " ELSE '2026-0' || CAST(1 + doc_id % 4 AS VARCHAR) || '-01' END"
)
_D_WAVE_DELAY = (
    "CASE WHEN doc_id % 7 = 0 THEN NULL"
    " ELSE CAST(doc_id % 7 AS DOUBLE) * CAST(2.5 AS DOUBLE) END"
)


def q_crawl_wave_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling (operators/robots.crawl_waves): the
    frontier becomes dispatch rounds — per host, freshest-first
    row_number, eta = (seq-1)·delay, wave = floor(eta / 60 s). Hosts
    without a declared crawl-delay run at the 1.0 s default; eta
    values are exact binary multiples of 0.5 so the round-6 is
    numerically inert (no half-rounding exposure)."""
    from .operators.robots import crawl_waves

    frontier = _t(spark, sf_dir, "documents").selectExpr(
        f"{_WAVE_URL} as url",
        f"{_WAVE_HOST} as host",
        f"{_WAVE_LASTMOD} as lastmod",
        f"{_WAVE_DELAY} as crawl_delay",
    )
    return crawl_waves(
        frontier, wave_seconds=_WAVE_SECONDS, default_delay=1.0
    ).select(
        "url",
        "host",
        F.col("fetch_seq").cast("long").alias("fetch_seq"),
        "eta_s",
        "wave",
    )


O_CRAWL_WAVE_PLAN = f"""
WITH f AS (
  SELECT {_D_WAVE_URL} AS url, {_D_WAVE_HOST} AS host,
         {_D_WAVE_LASTMOD} AS lastmod, {_D_WAVE_DELAY} AS crawl_delay
  FROM documents
), s AS (
  SELECT url, host, crawl_delay,
         row_number() OVER (PARTITION BY host
                            ORDER BY lastmod DESC NULLS LAST, url ASC)
           AS fetch_seq
  FROM f
)
SELECT url, host, fetch_seq,
       round((fetch_seq - 1) * coalesce(crawl_delay, CAST(1.0 AS DOUBLE)), 6)
         AS eta_s,
       CAST(floor((fetch_seq - 1) * coalesce(crawl_delay, CAST(1.0 AS DOUBLE))
                  / CAST({_WAVE_SECONDS} AS DOUBLE)) AS INT) AS wave
FROM s
"""


# ---------------------------------------------------------------------------
# JSON-LD structured data
# ---------------------------------------------------------------------------

# block mix per doc_id % 4: 0 → one Article block (uppercase SCRIPT +
# extra attr on even ids); 1 → Article plus a second block with
# array @type and numeric name (both stringify identically in both
# engines — verified); 2 → Article plus a MALFORMED block (NULL
# columns, row kept); 3 → no JSON-LD, only a javascript script that
# must not match
_JSONLD_HTML = """concat('<html><head>',
  CASE WHEN doc_id % 2 = 0
       THEN concat('<SCRIPT defer type="application/ld+json">',
                   '{"@type":"Article","name":"Doc ', cast(doc_id as string), '"}</SCRIPT>')
       ELSE concat('<script type="application/ld+json">',
                   '{"@type":"Article","name":"Doc ', cast(doc_id as string), '"}</script>')
  END,
  CASE doc_id % 4
    WHEN 1 THEN '<script type="application/ld+json">{"@type":["Product","Offer"],"name":7}</script>'
    WHEN 2 THEN '<script type="application/ld+json">not json {</script>'
    ELSE ''
  END,
  CASE WHEN doc_id % 4 = 3 THEN '<script type="text/javascript">var x=1;</script>' ELSE '' END,
  '</head><body>t</body></html>')"""

_D_JSONLD_HTML = _JSONLD_HTML.replace(
    "cast(doc_id as string)", "CAST(doc_id AS VARCHAR)"
)


def q_jsonld_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-LD harvest (operators/headmeta.jsonld_types): script
    blocks matched case-insensitively with the frozen non-'<' payload
    rule, parsed JVM-side — @type/name strings bare, array/number
    values as JSON text, malformed blocks kept with NULLs. Every page
    carries one Article block (uppercase tag + extra attribute on
    even ids); the doc_id % 4 = 3 pages additionally carry a
    javascript script element that must NOT be harvested."""
    from .operators.headmeta import jsonld_types

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) as url",
        f"cast({_JSONLD_HTML} as binary) as html",
    )
    return jsonld_types(pages).select(
        "url", F.col("block_idx").cast("long").alias("block_idx"),
        "jsonld_type", "name",
    )


_D_JSONLD_PAT = (
    "<[Ss][Cc][Rr][Ii][Pp][Tt][^>]*"
    '[Tt][Yy][Pp][Ee]="application/ld[+]json"[^>]*>([^<]*)'
)

O_JSONLD_TYPES = f"""
WITH p AS (
  SELECT CAST(doc_id AS VARCHAR) AS url, {_D_JSONLD_HTML} AS html
  FROM documents
), b AS (
  SELECT url,
         generate_subscripts(l, 1) - 1 AS block_idx,
         unnest(l) AS payload
  FROM (SELECT url, regexp_extract_all(html, '{_D_JSONLD_PAT}', 1) AS l FROM p)
)
SELECT url, CAST(block_idx AS BIGINT) AS block_idx,
       CASE WHEN json_valid(payload)
            THEN json_extract_string(payload, '$."@type"') END AS jsonld_type,
       CASE WHEN json_valid(payload)
            THEN json_extract_string(payload, '$.name') END AS name
FROM b
"""


# ---------------------------------------------------------------------------
# index tombstone deletes (exact stats parity with a rebuild)
# ---------------------------------------------------------------------------


def q_index_delete_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index deletes (operators/index.delete_docs): build the full
    postings index, tombstone every doc_id % 3 = 0, then BM25-score
    the SAME query as the bm25_topk key. The oracle never indexed the
    deleted docs at all — equality proves a tombstone anti-join keeps
    every corpus statistic (N, avgdl, df_t, idf) consistent with the
    surviving set: no stale-idf poisoning."""
    from .contract_graph import _BM25_K, _BM25_QUERY
    from .operators.index import bm25_topk, build_postings, delete_docs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    postings = build_postings(docs)
    tombstones = docs.filter("doc_id % 3 = 0").select("doc_id")
    return bm25_topk(
        delete_docs(postings, tombstones), _BM25_QUERY, k=_BM25_K
    )


def _o_index_delete_parity() -> str:
    from .contract_graph import O_BM25_TOPK

    assert O_BM25_TOPK.count("FROM documents") == 1
    return O_BM25_TOPK.replace(
        "FROM documents", "FROM documents WHERE doc_id % 3 <> 0"
    )


O_INDEX_DELETE_PARITY = _o_index_delete_parity()


# ---------------------------------------------------------------------------
# content-type sniffing (magic bytes)
# ---------------------------------------------------------------------------

# blob per doc_id % 10 (Spark builds REAL bytes via unhex/concat; the
# oracle derives the expected label from the same arithmetic — the
# hreflang-oracle style: never runs the harvest)
_CT_BLOB = """CASE doc_id % 10
  WHEN 0 THEN cast(concat('%PDF-1.4 ', cast(doc_id as string)) as binary)
  WHEN 1 THEN concat(unhex('1F8B08'), cast('gz' as binary))
  WHEN 2 THEN concat(unhex('504B0304'), cast('zip' as binary))
  WHEN 3 THEN concat(unhex('89504E470D0A1A0A'), cast('png' as binary))
  WHEN 4 THEN cast('GIF89a-body' as binary)
  WHEN 5 THEN concat(unhex('FFD8FFE0'), cast('jpeg' as binary))
  WHEN 6 THEN concat(cast('RIFF' as binary), unhex('AA000000'), cast('WEBPVP8 ' as binary))
  WHEN 7 THEN concat(unhex('EFBBBF'), cast(concat('\\n  <!DOCTYPE html><html>', cast(doc_id as string)) as binary))
  WHEN 8 THEN cast('  <?xml version="1.0"?><r/>' as binary)
  ELSE cast(concat('plain text ', cast(doc_id as string)) as binary)
END"""


def q_content_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte dispatch (functions/multimodal.with_content_type):
    real byte blobs for all ten arms — pdf, gzip, zip, png, gif,
    jpeg(+marker tail), webp (RIFF with size bytes between the two
    tags), BOM+whitespace html, leading-space xml, and a plain-text
    fallthrough to octet-stream. All classification runs in the hex
    domain; the oracle derives the expected label from the doc_id
    arithmetic that built each blob."""
    from .functions.multimodal import with_content_type

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_CT_BLOB} as blob"
    )
    return with_content_type(pages, blob_col="blob").select(
        "doc_id", "content_type"
    )


O_CONTENT_TYPE_SNIFF = """
SELECT doc_id,
       CASE doc_id % 10
         WHEN 0 THEN 'application/pdf'
         WHEN 1 THEN 'application/gzip'
         WHEN 2 THEN 'application/zip'
         WHEN 3 THEN 'image/png'
         WHEN 4 THEN 'image/gif'
         WHEN 5 THEN 'image/jpeg'
         WHEN 6 THEN 'image/webp'
         WHEN 7 THEN 'text/html'
         WHEN 8 THEN 'text/xml'
         ELSE 'application/octet-stream'
       END AS content_type
FROM documents
"""


# ---------------------------------------------------------------------------
# deterministic epoch shuffle
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 8
_SHUF_SEED = "e1"


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order assignment (operators/sampling.
    shuffle_assignment): shard = scrambled-hash mod 8, pos = rank
    within the shard by (hash, id) — a reproducible permutation
    without a global sort. The oracle restates the fold + LCG
    scramble and the same window."""
    from .operators.sampling import shuffle_assignment

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_assignment(
        d, id_col="doc_id", seed=_SHUF_SEED, n_shards=_SHUF_SHARDS
    ).select("doc_id", F.col("shard").cast("int").alias("shard"), "pos")


O_EPOCH_SHUFFLE = f"""
WITH b AS (
  SELECT doc_id,
         (({_D_STR_HASH.format(s=f"concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))")})
          * 48271 + 11) % {P} % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, CAST(bucket % {_SHUF_SHARDS} AS INT) AS shard,
       row_number() OVER (PARTITION BY bucket % {_SHUF_SHARDS}
                          ORDER BY bucket ASC, doc_id ASC) AS pos
FROM b
"""


# ---------------------------------------------------------------------------
# mixture application: target shares → keep probs → deterministic rows
# ---------------------------------------------------------------------------


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full data-mixture loop (operators/sampling): temperature
    weights (alpha = 0.5 — the sqrt arm, identically rounded in every
    IEEE engine) → maximal-retention keep probabilities (c = min
    p/q; the most-upweighted language keeps 100%) → content-addressed
    row filter. The oracle restates the whole chain including the
    round-6 on the intermediate weight (lang_mixture_weights rounds
    its output; the keep-prob math consumes the ROUNDED value)."""
    from .operators.sampling import apply_mixture, lang_mixture_weights

    d = _t(spark, sf_dir, "documents")
    w = lang_mixture_weights(d, lang_col="lang", tokens_col="n_chars")
    return apply_mixture(
        d, w, lang_col="lang", key_col="doc_id", salt="mix"
    ).select("doc_id", "lang")


O_MIXTURE_SAMPLE = f"""
WITH per AS MATERIALIZED (
  SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS n FROM documents GROUP BY lang
), w AS MATERIALIZED (
  SELECT lang, n,
         round(sqrt(n) / (SELECT sum(sqrt(n)) FROM per), 6) AS q
  FROM per
), r AS MATERIALIZED (
  SELECT lang, n / (SELECT sum(n) FROM per) AS p, q FROM w
), c AS (
  SELECT min(p / q) AS c FROM r WHERE q > 0
), kp AS (
  SELECT lang,
         CASE WHEN q <= 0 THEN CAST(0 AS DOUBLE)
              ELSE least(CAST(1 AS DOUBLE), (SELECT c FROM c) * q / p) END
           AS keep_prob
  FROM r
)
SELECT doc_id, documents.lang
FROM documents JOIN kp ON documents.lang = kp.lang
WHERE (({_D_STR_HASH.format(s="concat('mix', CAST(doc_id AS VARCHAR))")})
      * 48271 + 11) % {P} % 1000000
      < CAST(floor(keep_prob * 1000000) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# mixed-language detection: unit-grain language spans
# ---------------------------------------------------------------------------

# two seed sentences (operators/langid.SEED_CORPUS de[0] / zh[0]) —
# the fixture needs units whose language the frozen model decides
# deterministically; training seeds are exactly that
_MIX_DE = "der schnelle braune fuchs springt über den faulen hund am flussufer"
_MIX_ZH = "敏捷的棕色狐狸跳过了河边那只懒惰的狗"

# doc text + an injected second unit: % 3 == 0 → German unit,
# % 3 == 1 → Chinese unit, % 3 == 2 → nothing (trailing sep splits to
# an empty unit, which the frozen rule drops → single-unit doc)
_MIX_TEXT = (
    "concat(text, '\\n', CASE doc_id % 3"
    f" WHEN 0 THEN '{_MIX_DE}'"
    f" WHEN 1 THEN '{_MIX_ZH}'"
    " ELSE '' END)"
)
_D_MIX_TEXT = (
    "text || chr(10) || CASE doc_id % 3"
    f" WHEN 0 THEN '{_MIX_DE}'"
    f" WHEN 1 THEN '{_MIX_ZH}'"
    " ELSE '' END"
)


def q_lang_mix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language detection (operators/langid.lang_mix_stats):
    every unit scored under the SAME frozen 11-language model as the
    document pass, aggregated to (n_units, n_langs, majority_lang,
    majority_frac) — the code-switching signal document-level argmax
    cannot see. Two thirds of the fixture docs carry an injected
    second unit in another language; the oracle reruns the IDENTICAL
    model chain (contract_ml._lang_ngram_oracle, parameterized) over
    the exploded units."""
    from .operators.langid import lang_mix_stats

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_MIX_TEXT} as text"
    )
    return lang_mix_stats(d).select(
        "doc_id", "n_units", "n_langs", "majority_lang", "majority_frac"
    )


def _o_lang_mix_stats() -> str:
    from .contract_ml import _lang_ngram_oracle

    scored = _lang_ngram_oracle(src="u", key="k")
    return f"""
WITH docs2 AS MATERIALIZED (
  SELECT doc_id, {_D_MIX_TEXT} AS text FROM documents
), u AS MATERIALIZED (
  SELECT doc_id * 10 + (i - 1) AS k, unit AS text
  FROM (
    SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS unit
    FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2)
  ) WHERE unit <> ''
), scored AS MATERIALIZED (
  {scored}
), per AS (
  SELECT k // 10 AS doc_id, pred_lang, count(*) AS n
  FROM scored GROUP BY k // 10, pred_lang
)
SELECT doc_id, sum(n) AS n_units,
       count(DISTINCT pred_lang) AS n_langs,
       max({{'c': n, 'lang': pred_lang}}).lang AS majority_lang,
       round(max({{'c': n, 'lang': pred_lang}}).c * CAST(1.0 AS DOUBLE)
             / sum(n), 6) AS majority_frac
FROM per GROUP BY doc_id
"""


O_LANG_MIX_STATS = _o_lang_mix_stats()
