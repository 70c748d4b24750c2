"""WARC record source: Common-Crawl-native ingestion.

The engine's canonical input (BASELINE input_hint) is an Iceberg-style
table of pages ``(url, warc_ts, html:binary, ...)`` — but what Common
Crawl actually ships is WARC/1.0 streams: concatenated records, each a
named-field header block, a blank line, then ``Content-Length`` bytes
of payload (for ``WARC-Type: response`` the payload is a full HTTP
response: status line, headers, blank line, body). This module turns a
table of raw WARC segment blobs into that canonical pages table, so
the extraction pipeline composes directly onto crawl archives.

Frozen parse rule (both the Spark operator and the DuckDB oracle
restate it):

- records split on the literal ``WARC/1.0\\r\\n`` version line; the
  leading empty fragment is dropped;
- the header block ends at the first ``\\r\\n\\r\\n``; named fields are
  harvested with ``Name: ([^\\r\\n]*)`` — first occurrence wins, Java/
  RE2 common subset, no multiline flags (CRLF stays out of the
  capture by the negated class, not by ``$`` semantics);
- the payload is exactly ``Content-Length`` characters after the
  blank line (NEVER a search for the next separator — bodies may
  contain blank lines); records with a non-numeric length parse to
  NULL payload and are dropped with ``warc_type`` kept for auditing;
- only ``WARC-Type: response`` records become pages; the HTTP status
  is ``^HTTP/1\\.[01] ([0-9]{3})``, HTTP headers end at the first
  ``\\r\\n\\r\\n`` inside the payload, the body is everything after;
- ``warc_ts`` parses the ``WARC-Date`` ISO-8601 instant with the
  trailing ``Z`` stripped (WARC dates are UTC by spec).

Scale shape: everything is scan-stage JVM column math — one
``split``+``explode`` (row expansion, no shuffle) and per-record
regexp/substr expressions; a segment blob maps to its records inside
the partition that read it, so a 100 TB crawl parses embarrassingly
parallel with zero exchanges before the first downstream aggregation.
Real ``.warc.gz`` members are decompressed by :func:`decode_warc_gz`
(zlib member-stream walk, Arrow-batched) — compression is the one step
SQL cannot express, exactly like the compression_ratio signal.

Reference: the reference engine has no crawl ingestion (its sources
are PAGE-XML/COCO/image files, ocrd_segment/extract_pages.py) — this
is part of the web-scale surface the graft adds.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

CRLF = "\r\n"
_SEP = CRLF + CRLF


def _field(block, name: str):
    """First ``Name: value`` occurrence in a header block (value =
    everything up to the CRLF, captured by a negated class so the
    pattern stays in the Java/RE2 common subset)."""
    return F.regexp_extract(block, name + ": ([^\r\n]*)", 1)


def warc_records(
    blobs: DataFrame, data_col: str = "data", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Split WARC segment blobs into one row per record:
    (``warc_type``, ``target_uri``, ``warc_date``, ``content_length``,
    ``payload``) plus any ``keep_cols`` carried through from the blob
    row (e.g. the segment path for lineage).

    ``payload`` is NULL when ``Content-Length`` is missing or
    non-numeric (try_cast semantics) — callers filter or audit."""
    rec = blobs.select(
        *keep_cols,
        F.explode(
            F.split(F.col(data_col).cast("string"), "WARC/1\\.0\r\n")
        ).alias("rec"),
    ).filter(F.col("rec") != "")
    hdr = F.substring_index("rec", _SEP, 1)
    # payload starts after header block + the CRLFCRLF separator
    # (1-based substr: header length + 4 separator chars + 1)
    rest = F.expr(
        "substr(rec, length(substring_index(rec, '\\r\\n\\r\\n', 1)) + 5)"
    )
    out = rec.select(
        *keep_cols,
        _field(hdr, "WARC-Type").alias("warc_type"),
        _field(hdr, "WARC-Target-URI").alias("target_uri"),
        _field(hdr, "WARC-Date").alias("warc_date"),
        _field(hdr, "Content-Length").try_cast("int").alias("content_length"),
        rest.alias("__rest"),
    )
    return out.select(
        *keep_cols,
        "warc_type",
        "target_uri",
        "warc_date",
        "content_length",
        F.when(
            F.col("content_length").isNotNull(),
            F.expr("substr(__rest, 1, content_length)"),
        ).alias("payload"),
    )


def warc_response_pages(
    blobs: DataFrame, data_col: str = "data", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """WARC blobs → the canonical pages table: one row per
    ``WARC-Type: response`` record with a parsable payload —
    (url, warc_ts, http_status, content_type, html:binary).

    ``http_status`` is NULL when the payload is not an HTTP/1.x
    response (try_cast of the frozen status regexp); ``content_type``
    is the raw ``Content-Type`` HTTP header value ('' when absent —
    pair with functions/multimodal.with_content_type to sniff the
    magic bytes instead of trusting the server); ``location`` is the
    raw ``Location`` header ('' when absent) — 3xx rows feed
    operators/redirects for chain resolution. Downstream gating on
    status/type is the caller's policy, not the parser's."""
    r = warc_records(blobs, data_col=data_col, keep_cols=keep_cols).filter(
        (F.col("warc_type") == "response") & F.col("payload").isNotNull()
    )
    http_hdr = F.substring_index("payload", _SEP, 1)
    return r.select(
        *keep_cols,
        F.col("target_uri").alias("url"),
        F.try_to_timestamp(
            F.regexp_replace("warc_date", "Z$", ""),
            F.lit("yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("warc_ts"),
        F.regexp_extract("payload", "^HTTP/1\\.[01] ([0-9]{3})", 1)
        .try_cast("int")
        .alias("http_status"),
        _field(http_hdr, "Content-Type").alias("content_type"),
        _field(http_hdr, "Location").alias("location"),
        F.expr(
            "substr(payload,"
            " length(substring_index(payload, '\\r\\n\\r\\n', 1)) + 5)"
        )
        .cast("binary")
        .alias("html"),
    )


def decode_warc_gz(
    blobs: DataFrame, data_col: str = "data", python_parallelism: int | None = None
) -> DataFrame:
    """Decompress per-record-gzipped WARC segments (the actual
    ``.warc.gz`` layout: one gzip MEMBER per record, members
    concatenated) into plain-text segment blobs for
    :func:`warc_records`.

    zlib member-stream walk: inflate with wbits=31 (gzip wrapper),
    feed ``unused_data`` to a fresh decompressobj per member —
    the standard multi-member idiom; truncated trailing members
    surface as ``decode_ok = false`` with the successfully-decoded
    prefix kept. Arrow-batched mapInPandas, capped like every other
    python stage (CLAUDE.md: python-UDF stages cost ~2 hardware
    threads per task)."""
    import pandas as pd

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}"
                  for f in blobs.schema.fields if f.name != data_col)
        + ", data binary, decode_ok boolean"
    )
    other = [f.name for f in blobs.schema.fields if f.name != data_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            texts, oks = [], []
            for raw in pdf[data_col]:
                buf = bytes(raw) if raw is not None else b""
                out, ok = bytearray(), True
                while buf:
                    d = zlib.decompressobj(31)
                    try:
                        out += d.decompress(buf)
                        out += d.flush()
                    except zlib.error:
                        ok = False
                        break
                    if not d.eof:  # truncated final member
                        ok = False
                        break
                    buf = d.unused_data
                texts.append(bytes(out))
                oks.append(ok)
            res = pdf[other].copy()
            res["data"] = texts
            res["decode_ok"] = oks
            yield res

    src = blobs
    if python_parallelism:
        src = src.repartition(python_parallelism)
    return src.mapInPandas(gen, schema)
