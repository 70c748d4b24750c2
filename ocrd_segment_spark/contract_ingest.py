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
