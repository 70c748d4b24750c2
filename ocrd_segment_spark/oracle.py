"""Single-process oracle — the canonical serialization (SURVEY.md §7.1 M0).

Runs the frozen kernel sequentially over a corpus, with no Spark, no
threads, no Arrow. The Spark pipeline must match this byte-for-byte per
url (BASELINE.json north_rule: "byte-identical extracted text per
url"). Golden parquet written by tests carries ``oracle_version`` in
lineage so regeneration is detectable (FIXTURES.md F2).
"""

from __future__ import annotations

from . import KERNEL_VERSION
from .config import DEFAULT_PARAMS, ExtractParams
from .kernel.extract import extract_document

ORACLE_VERSION = KERNEL_VERSION


def extract_corpus(rows, params: ExtractParams = DEFAULT_PARAMS) -> list[dict]:
    """rows: iterable of dicts with at least (url, html). Returns golden
    rows of the F2 schema (url, extracted_text, region_spans, lineage)."""
    out = []
    for row in rows:
        text, regions, metrics = extract_document(row["html"], params)
        out.append(
            {
                "url": row["url"],
                "extracted_text": text,
                "region_spans": regions,
                "lineage": {
                    "oracle_version": ORACLE_VERSION,
                    "parse_failed": metrics["parse_failed"],
                    "n_candidates": metrics["n_candidates"],
                    "n_kept": metrics["n_kept"],
                    "n_dropped": metrics["n_dropped"],
                },
            }
        )
    return out
