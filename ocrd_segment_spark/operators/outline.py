"""Heading outline extraction: the document's section tree.

The extraction kernel keeps headings as reading-order regions
(kernel/extract.py classifies ``h1``-``h6`` as heading regions, the
analog of the reference's heading TextRegion @type —
/root/reference/ocrd_segment/extract_regions.py keeps region
subtypes); this module derives the STRUCTURE those headings imply:
one row per heading with its level, cleaned text, document ordinal,
and the ordinal of its PARENT heading (the closest preceding heading
of a smaller level) — the section tree that section-aware chunking,
table-of-contents generation, and hierarchical retrieval all consume.

Frozen grammar + rule (stated so the DuckDB oracle restates it 1:1):

  - headings are ``(?is)<h[1-6][^>]*>.*?</h[1-6]>`` whole matches in
    document order; the closing tag's level is NOT checked against
    the opener (first-close wins — tag-soup reality, stated);
  - ``level`` = the digit after ``<h`` (position 3 of the match);
  - ``heading`` = the match run through the SAME frozen cleanup as
    table cells (tag strip → 5-entity decode → whitespace-normalize
    → trim, operators/tables.clean_cell_text);
  - ``seq`` = 0-based heading ordinal within the page;
  - ``parent_seq`` = max seq among STRICTLY-PRECEDING headings with
    strictly smaller level; NULL when none (top-level headings, and
    any heading that out-ranks everything before it).

Scale shape (100 TB): scan-stage regexp harvest + ONE page-keyed
window (five running-max frames over the same sort — Spark plans
them as a single Window operator); page-grain keys mean zero skew.
No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .tables import clean_cell_text

HEADING_BLOCK = "(?is)<h[1-6](?:>|[ \\t\\n\\r][^>]*>).*?</h[1-6]>"


def heading_outline(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, seq, level, heading, parent_seq) — one row per heading,
    parent = closest preceding smaller-level heading."""
    pages = df.select(
        F.col(id_col),
        F.col(html_col).cast("string").alias("__html"),
    )
    hs = pages.select(
        id_col,
        F.posexplode(
            F.expr(f"regexp_extract_all(__html, '{HEADING_BLOCK}', 0)")
        ).alias("seq", "__h"),
    ).select(
        id_col,
        "seq",
        F.substring("__h", 3, 1).cast("int").alias("level"),
        clean_cell_text(F.col("__h")).alias("heading"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last preceding seq AT each smaller level; -1 sentinel so
    # greatest() needs no engine-specific NULL semantics
    last = {
        k: F.coalesce(
            F.max(F.when(F.col("level") == k, F.col("seq"))).over(w),
            F.lit(-1),
        )
        for k in range(1, 6)
    }
    cases = F.when(F.col("level") == 1, F.lit(-1))
    for lvl in range(2, 7):
        cases = cases.when(
            F.col("level") == lvl,
            F.greatest(*[last[k] for k in range(1, lvl)])
            if lvl > 2
            else last[1],
        )
    return hs.withColumn(
        "parent_seq", F.nullif(cases, F.lit(-1))
    )
