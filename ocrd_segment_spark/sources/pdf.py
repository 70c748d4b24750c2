"""PDF text source: layout-document ingestion without a PDF library.

The crawl's second document format after HTML (BASELINE north rule:
"HTML boilerplate strip, PDF/layout parse"). No PDF library ships in
the runtime, and none is needed for the text lane: PDF is a frozen,
regular container (objects + streams) whose only non-regular step is
FlateDecode — and zlib is in the standard library, exactly like the
``.warc.gz`` member walk (sources/warc.decode_warc_gz). The reference
engine reads page IMAGES (``/root/reference/ocrd_segment/
extract_pages.py``); text-first PDF ingestion is part of the web-scale
graft.

Frozen parse rule (the subset both the tests and the contract oracle
restate; spec references are ISO 32000-1):

- objects are ``N G obj … endobj`` spans, processed in FILE ORDER
  (byte offset), which is the deterministic document order for the
  subset — no xref chasing, so damaged/linearized files degrade
  gracefully instead of failing on a stale table;
- a stream object's data starts after the first ``stream\\r\\n`` or
  ``stream\\n`` in the object; its extent is ``/Length N`` bytes when
  the dict carries a literal integer length, else everything up to
  the nearest ``endstream`` (tolerant form, trailing EOL stripped);
- dicts naming ``/FlateDecode`` inflate via zlib; a stream that fails
  to inflate is skipped and flags ``parse_ok = false`` (the decoded
  prefix of OTHER streams is kept — partial extraction beats a lost
  document);
- text lives in ``BT … ET`` blocks of content streams. Within a
  block, tokens apply in positional order: ``(string) Tj`` appends,
  ``(string) '`` and ``(string) "`` append a newline THEN the string
  (their T* semantics), ``<hex> Tj`` appends the hex-decoded bytes,
  ``[…] TJ`` appends the array's literal strings concatenated
  (kerning numbers ignored), and ``T*`` / ``x y Td`` / ``x y TD``
  append a newline;
- literal strings decode the spec's escapes: ``\\n \\r \\t \\b \\f
  \\( \\) \\\\``, 1-3 digit octal ``\\ddd``, backslash-newline erased
  (line continuation), any other ``\\x`` → ``x``;
- bytes map to text as latin-1 (1:1, lossless) — font encodings and
  CID-keyed text are OUT of the subset and documented as such: real
  Unicode extraction needs the font's ToUnicode CMap, which is a
  rendering concern, not a dataflow one;
- block texts join with ``\\n``, text-bearing streams join with
  ``\\n`` (one separator between ANY two adjacent blocks, so blocks
  flatten across streams); a document with no BT block yields
  ``text = ''``;
- each BT block is a LAYOUT REGION: ``block_spans`` carries its
  [start, end) character interval in ``text`` (latin-1 is 1:1, so
  char offsets == byte offsets), and the extracted-table adapter
  turns them into ordinary ``region_spans`` rows (rtype ``block``) —
  PDFs keep the engine's span-centric contract.

Scale shape (100 TB): one Arrow-batched mapInPandas stage (the codec
lane — same cost model as decode_warc_gz), capped via
``python_parallelism`` per the measured ~2-hardware-threads-per-task
rule. Everything downstream (quality, language, dedup) consumes the
ordinary documents shape.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

OBJ = re.compile(rb"(?s)\d+ \d+ obj(.*?)endobj")
STREAM_START = re.compile(rb"stream\r?\n")
LENGTH = re.compile(rb"/Length\s+(\d+)(?![^/>]*R)")
TOKENS = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*(Tj|'|\")"
    rb"|<([0-9A-Fa-f\s]*)>\s*Tj"
    rb"|\[((?:\\.|[^\]\\])*)\]\s*TJ"
    rb"|(T\*)"
    rb"|(?:[-\d.]+\s+[-\d.]+\s+(Td|TD))",
    re.S,
)
LITERAL = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
ESCAPE = re.compile(rb"\\(\r\n|\r|\n|[0-7]{1,3}|.)", re.S)
BLOCK = re.compile(rb"(?s)\bBT\b(.*?)\bET\b")

_SIMPLE = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        e = m.group(1)
        if e in (b"\r\n", b"\r", b"\n"):
            return b""  # line continuation
        if e in _SIMPLE:
            return _SIMPLE[e]
        if e.isdigit() and all(c in b"01234567" for c in e):
            return bytes([int(e, 8) & 0xFF])
        return e
    return ESCAPE.sub(sub, raw)


def _block_text(block: bytes) -> bytes:
    out = bytearray()
    for m in TOKENS.finditer(block):
        lit, op, hx, arr, tstar, td = m.groups()
        if lit is not None:
            if op in (b"'", b'"'):
                out += b"\n"
            out += _unescape(lit)
        elif hx is not None:
            clean = bytes(c for c in hx if c not in b" \t\r\n")
            if len(clean) % 2:
                clean += b"0"
            out += bytes.fromhex(clean.decode("ascii"))
        elif arr is not None:
            for s in LITERAL.finditer(arr):
                out += _unescape(s.group(1))
        elif tstar is not None or td is not None:
            out += b"\n"
    return bytes(out)


def _extract_one(
    blob: bytes,
) -> tuple[int, int, int, str, bool, list[tuple[int, int]]]:
    n_objects = n_streams = n_text = 0
    blocks: list[str] = []
    ok = True
    for om in OBJ.finditer(blob):
        n_objects += 1
        body = om.group(1)
        sm = STREAM_START.search(body)
        if sm is None:
            continue
        n_streams += 1
        head, data = body[: sm.start()], body[sm.end():]
        lm = LENGTH.search(head)
        if lm is not None:
            data = data[: int(lm.group(1))]
        else:
            end = data.find(b"endstream")
            if end >= 0:
                data = data[:end]
            data = data.rstrip(b"\r\n")
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                ok = False
                continue
        stream_blocks = [
            _block_text(b.group(1)).decode("latin-1")
            for b in BLOCK.finditer(data)
        ]
        if stream_blocks:
            n_text += 1
            blocks.extend(stream_blocks)
    spans, pos = [], 0
    for b in blocks:
        spans.append((pos, pos + len(b)))
        pos += len(b) + 1
    return n_objects, n_streams, n_text, "\n".join(blocks), ok, spans


def pdf_text(
    blobs: DataFrame,
    data_col: str = "data",
    python_parallelism: int | None = None,
) -> DataFrame:
    """PDF blobs → one row per document:
    carried columns + (``n_objects``, ``n_streams``, ``n_text_streams``,
    ``text``, ``parse_ok``, ``block_spans``) under the frozen subset
    rule above."""
    import pandas as pd

    other = [f.name for f in blobs.schema.fields if f.name != data_col]
    schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in blobs.schema.fields
            if f.name != data_col
        )
        + ", n_objects int, n_streams int, n_text_streams int,"
        " text string, parse_ok boolean,"
        " block_spans array<struct<start: long, end: long>>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = [
                _extract_one(bytes(b) if b is not None else b"")
                for b in pdf_batch[data_col]
            ]
            res = pdf_batch[other].copy()
            res["n_objects"] = [r[0] for r in rows]
            res["n_streams"] = [r[1] for r in rows]
            res["n_text_streams"] = [r[2] for r in rows]
            res["text"] = [r[3] for r in rows]
            res["parse_ok"] = [r[4] for r in rows]
            res["block_spans"] = [r[5] for r in rows]
            yield res

    src = blobs
    if python_parallelism:
        src = src.repartition(python_parallelism)
    return src.mapInPandas(gen, schema)


def pdf_pages(
    blobs: DataFrame,
    url_col: str = "url",
    data_col: str = "data",
    python_parallelism: int | None = None,
) -> DataFrame:
    """PDF blobs → the EXTRACTED-table shape (url, extracted_text,
    region_spans, lineage) so the corpus filter chain consumes the PDF
    lane exactly like the HTML lane (jobs/corpus_job.py
    ``--input-format pdf``).

    Each BT block is a layout region: ``region_spans`` carries one
    ``rtype = 'block'`` row per block with its [start, end) interval
    in ``extracted_text`` (the engine's span contract — S3-style
    per-region crops slice PDF text exactly like HTML text).
    ``lineage`` reports the stream funnel — ``parse_failed`` mirrors
    an inflate failure, candidates/kept/dropped count content
    streams."""
    from pyspark.sql import functions as F

    t = pdf_text(
        blobs.select(url_col, data_col),
        data_col=data_col,
        python_parallelism=python_parallelism,
    )
    spans = F.expr(
        "transform(block_spans, (s, i) -> named_struct("
        " 'region_id', format_string('b%04d', i + 1),"
        " 'rtype', 'block', 'subtype', '',"
        " 'start', s.start, 'end', s.end,"
        " 'parent_id', '', 'order', i,"
        " 'score', 1.0D, 'dir', cast(null as string)))"
    )
    return t.select(
        F.col(url_col).alias("url"),
        F.col("text").alias("extracted_text"),
        spans.alias("region_spans"),
        # field-by-field (a whole-struct cast to LINEAGE_TYPE trips on
        # nullable-to-NOT-NULL; names and types match field-wise)
        F.struct(
            F.lit("pdf-subset-1").alias("kernel_version"),
            F.spark_partition_id().alias("partition_id"),
            (~F.col("parse_ok")).alias("parse_failed"),
            F.col("n_streams").alias("n_candidates"),
            F.col("n_text_streams").alias("n_kept"),
            (F.col("n_streams") - F.col("n_text_streams")).alias(
                "n_dropped"
            ),
        ).alias("lineage"),
    )
