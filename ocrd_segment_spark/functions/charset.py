"""Charset sniffing + decoding for binary web pages.

The input_hint column is ``html:binary`` and the extraction kernel
casts it through UTF-8 (invalid sequences → replacement chars) — the
right default for a modern crawl, but a Common-Crawl-style fetch
table carries a long tail of legacy encodings (windows-125x,
iso-8859-x, utf-16 with BOM) whose pages would otherwise extract as
mojibake. This module adds the standard two-step ingestion repair:

1. :func:`with_charset` — pure-JVM sniff, one column expression, no
   Python. Frozen precedence (WHATWG-encoding-inspired subset,
   stated so the oracle can restate the string-level arms):

   - byte-order mark wins: EF BB BF → utf-8, FF FE → utf-16le,
     FE FF → utf-16be (source ``bom``); hex-prefix compare on the
     raw binary, so invalid-UTF8 bodies cannot derail it;
   - else the first ``charset = value`` attribute (optionally
     quoted) in the first 1024 CHARS of the UTF-8-cast body,
     lowercased — one regex covers both ``<meta charset=...>`` and
     ``http-equiv`` ``content="...; charset=..."`` because only the
     ``charset=`` token matters; the whitespace class is the
     explicit ``[ \\t\\n\\r\\f]`` (Java ``\\s`` and RE2 ``\\s``
     disagree on VT — the repo-wide trap);
   - else ``utf-8`` (source ``default``).

   The sniffed token is the page's RAW claim (lowercased, charset
   alias resolution belongs to the decoder — Python's codec registry
   already owns that table).

2. :func:`decode_pages` — Arrow-batched ``mapInPandas`` decode of the
   non-UTF-8 tail: per batch, bytes → str via the sniffed codec
   (``errors='replace'``, leading U+FEFF stripped), unknown codecs
   fall back to utf-8 with ``decode_ok=false``. At crawl scale the
   sniff routes >95% of pages down the existing zero-Python UTF-8
   path: call decode only on the ``charset != 'utf-8'`` partition
   (the filter is a scan-stage predicate), so the Python stage is
   tail-sized, and cap it with ``python_parallelism`` exactly like
   extract_pages (Python stages cost ~2 hardware threads per task).
"""

from __future__ import annotations

import codecs
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

CHARSET_RE = "charset[ \\t\\n\\r\\f]*=[ \\t\\n\\r\\f]*[\"']?([a-zA-Z0-9_.:-]+)"
SNIFF_CHARS = 1024


def with_charset(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Append ``charset`` (lowercased token) and ``charset_source``
    (``bom`` | ``meta`` | ``default``) per the frozen precedence."""
    bom3 = F.expr(f"upper(hex(substring({html_col}, 1, 3)))")
    bom2 = F.expr(f"upper(hex(substring({html_col}, 1, 2)))")
    meta = F.lower(
        F.regexp_extract(
            F.expr(f"substring(cast({html_col} as string), 1, {SNIFF_CHARS})"),
            CHARSET_RE,
            1,
        )
    )
    charset = (
        F.when(bom3 == "EFBBBF", F.lit("utf-8"))
        .when(bom2 == "FFFE", F.lit("utf-16le"))
        .when(bom2 == "FEFF", F.lit("utf-16be"))
        .when(meta != "", meta)
        .otherwise(F.lit("utf-8"))
    )
    source = (
        F.when(
            (bom3 == "EFBBBF") | (bom2 == "FFFE") | (bom2 == "FEFF"),
            F.lit("bom"),
        )
        .when(meta != "", F.lit("meta"))
        .otherwise(F.lit("default"))
    )
    return df.withColumn("charset", charset).withColumn(
        "charset_source", source
    )


def decode_pages(
    df: DataFrame,
    html_col: str = "html",
    python_parallelism: int | None = None,
) -> DataFrame:
    """``df`` (already carrying ``charset`` from :func:`with_charset`)
    + ``decoded_text`` (string) + ``decode_ok`` (false when the
    claimed codec is unknown to the registry and utf-8 was used
    instead). Deterministic: codec resolution is Python's codec
    registry (alias handling included), errors='replace'."""
    from ..pipeline import _cap_python_tasks

    cols = df.columns
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols
    ) + ", decoded_text string, decode_ok boolean"

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            texts, oks = [], []
            for raw, cs in zip(pdf[html_col], pdf["charset"]):
                if raw is None:
                    texts.append(None)
                    oks.append(False)
                    continue
                # the whole resolve+decode is guarded: the sniff regex
                # accepts any token, and the registry resolves several
                # NON-text codecs (hex, base64, idna, undefined) whose
                # decode raises LookupError/UnicodeError/ValueError even
                # with errors='replace' — one hostile page must never
                # fail the task (review-found, pinned by pytest)
                try:
                    text = bytes(raw).decode(
                        codecs.lookup(cs or "utf-8").name, errors="replace"
                    )
                    ok = True
                except (LookupError, UnicodeError, ValueError):
                    text = bytes(raw).decode("utf-8", errors="replace")
                    ok = False
                texts.append(text.lstrip("\ufeff"))
                oks.append(ok)
            pdf = pdf.copy()
            pdf["decoded_text"] = texts
            pdf["decode_ok"] = oks
            yield pdf

    capped = _cap_python_tasks(df, python_parallelism)
    return capped.mapInPandas(batches, out_schema)


def reencode_non_utf8(
    df: DataFrame,
    html_col: str = "html",
    python_parallelism: int | None = None,
) -> DataFrame:
    """Charset-repair pre-stage for the extraction jobs: sniff every
    page, route the already-clean majority (``charset = utf-8`` with
    no BOM) straight through untouched, and send only the tail —
    legacy encodings and BOM'd pages — through the Python decode +
    UTF-8 re-encode. Returns the input schema plus ``charset`` /
    ``charset_source`` lineage columns; downstream extraction reads
    the repaired ``html`` bytes and needs no other change.

    Scale shape, stated honestly: Spark does NOT reuse a scan across
    union branches, so the source is read TWICE with complementary
    filters (the sniff predicate is not parquet-pushable). The
    trade is deliberate: the clean >95% majority carries ZERO Python
    cost, while the alternative single-pass shape would ship every
    page's bytes through an extra Arrow round-trip on top of the one
    the extraction kernel already pays. If a pipeline is scan-I/O
    bound rather than Python-bound, sniff once into a persisted
    charset column instead and filter on that. Row order across the
    union is not preserved — extraction is url-keyed and
    order-independent.
    """
    sniffed = with_charset(df, html_col)
    clean = sniffed.filter(
        (F.col("charset") == "utf-8") & (F.col("charset_source") != "bom")
    )
    tail = sniffed.filter(
        (F.col("charset") != "utf-8") | (F.col("charset_source") == "bom")
    )
    repaired = (
        decode_pages(tail, html_col, python_parallelism)
        .withColumn(html_col, F.encode("decoded_text", "UTF-8"))
        .drop("decoded_text", "decode_ok")
    )
    return clean.unionByName(repaired)
