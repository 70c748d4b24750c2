"""HTML table extraction: cell grids + GitHub-markdown serialization.

The extraction kernel (kernel/extract.py:103) classifies table
regions and keeps/drops them wholesale — the right call for
main-content text. But tables are also first-class TRAINING DATA
(table-QA, text-to-SQL, structured reasoning), and the reference's
segmentation analog keeps table regions as typed zones
(/root/reference/ocrd_segment/extract_regions.py walks TableRegion
like any other region). This module lifts the table INTERNALS into a
relational shape: one row per cell with (table, row, column)
ordinals, plus a per-table GitHub-markdown serialization — the
format LLM corpora actually train on.

Frozen grammar (regular subset, stated so the DuckDB oracle restates
it 1:1; same discipline as operators/sitemaps — both engines speak
the identical ``(?is)`` + non-greedy patterns):

  - tables are ``(?is)<table[^>]*>.*?</table>`` whole matches; a
    NESTED table truncates its outer at the inner's first close —
    the stated limitation of a regular grammar (nested layout
    tables are 1990s markup; modern corpora are fine);
  - rows are ``(?is)<tr[^>]*>(.*?)</tr>`` blocks inside a table;
    cells are ``(?is)<t[dh][^>]*>.*?</t[dh]>`` whole matches inside
    a row (a ``</th>`` may close a ``<td>`` — first-close wins);
  - ``is_header`` = the cell tag is ``<th`` (case-insensitive);
  - ``col_idx`` is the CELL ordinal in its row — ``colspan``/
    ``rowspan`` are ignored (stated: span-aware grid inflation is
    presentation logic; consumers that need it re-derive from the
    kept attributes-free ordinals);
  - ``cell_text``: tags stripped (``(?s)<[^>]*>`` → ''), then the
    frozen 5-entity decode (&lt; &gt; &quot; &#39; &nbsp; then
    &amp; LAST — decoding &amp; first would double-decode
    ``&amp;lt;``), then whitespace-normalize (the explicit class
    incl. NBSP — Java/RE2 ``\\s`` disagree on VT, the repo-wide
    trap) and trim;
  - a ``<tr>`` with no cells emits no rows (``row_idx`` keeps its
    ordinal — gaps are legal and stated);
  - markdown: header line = row 0's cells joined ``| a | b |``
    (pipes in cells escaped as ``\\|``), separator =
    ``'|' + repeat(' --- |', n_cols_of_row_0)``, body = remaining
    rows' lines joined by newline. Ragged rows serialize as-is
    (markdown renderers tolerate them; faithfulness beats
    prettiness).

Scale shape (100 TB): both functions are scan-stage column math —
three chained ``regexp_extract_all`` + ``posexplode`` (row counts
grow by cells-per-page, the same order as the word/glyph sublevel
derivations); markdown regrouping is two partial-aggregable groups
keyed by (id, table_idx[, row_idx]) — the id-grain key means ZERO
skew (no key is hotter than the biggest single page). No Python
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TABLE_BLOCK = "(?is)<table(?:>|[ \\t\\n\\r][^>]*>).*?</table>"
ROW_BLOCK = "(?is)<tr(?:>|[ \\t\\n\\r][^>]*>)(.*?)</tr>"
CELL_BLOCK = "(?is)<t[dh](?:>|[ \\t\\n\\r][^>]*>).*?</t[dh]>"
TAG = "(?s)<[^>]*>"
# explicit whitespace class incl. NBSP; VT spelled \x0B (Java \v is a
# CLASS — the CLAUDE.md trap)
WS_CLASS = "[ \\t\\n\\r\\f\\x0B\\u00a0]+"

# frozen entity-decode order: &amp; LAST
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def clean_cell_text(col: Column) -> Column:
    """Strip tags → decode the frozen entity set → collapse
    whitespace → trim. Pure JVM expression chain."""
    c = F.regexp_replace(col, TAG, "")
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, WS_CLASS, " "))


def table_cells(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, table_idx, row_idx, col_idx, is_header, cell_text) — one
    row per table cell, 0-based ordinals in document order."""
    pages = df.select(
        F.col(id_col),
        F.col(html_col).cast("string").alias("__html"),
    )
    tbls = pages.select(
        id_col,
        F.posexplode(
            F.expr(f"regexp_extract_all(__html, '{TABLE_BLOCK}', 0)")
        ).alias("table_idx", "__tbl"),
    )
    rows = tbls.select(
        id_col,
        "table_idx",
        F.posexplode(
            F.expr(f"regexp_extract_all(__tbl, '{ROW_BLOCK}', 1)")
        ).alias("row_idx", "__row"),
    )
    cells = rows.select(
        id_col,
        "table_idx",
        "row_idx",
        F.posexplode(
            F.expr(f"regexp_extract_all(__row, '{CELL_BLOCK}', 0)")
        ).alias("col_idx", "__cell"),
    )
    return cells.select(
        id_col,
        "table_idx",
        "row_idx",
        "col_idx",
        (F.lower(F.substring("__cell", 1, 3)) == "<th").alias("is_header"),
        clean_cell_text(F.col("__cell")).alias("cell_text"),
    )


def tables_markdown(
    cells: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, table_idx, n_rows, n_cols, markdown): GitHub pipe-table
    serialization of :func:`table_cells` output. ``n_cols`` is row
    0's cell count (the header width that sizes the separator)."""
    lines = (
        cells.withColumn(
            "__esc", F.replace("cell_text", F.lit("|"), F.lit("\\|"))
        )
        .groupBy(id_col, "table_idx", "row_idx")
        .agg(
            F.concat(
                F.lit("| "),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("col_idx", "__esc"))
                        ),
                        lambda s: s.getField("__esc"),
                    ),
                    " | ",
                ),
                F.lit(" |"),
            ).alias("__line"),
            F.count(F.lit(1)).alias("__nc"),
        )
    )
    tbl = lines.groupBy(id_col, "table_idx").agg(
        F.array_sort(
            F.collect_list(F.struct("row_idx", "__line", "__nc"))
        ).alias("__rows")
    )
    first = F.get("__rows", 0)
    n0 = first.getField("__nc")
    sep = F.concat(F.lit("|"), F.repeat(F.lit(" --- |"), n0))
    body = F.array_join(
        F.transform(
            F.expr("slice(__rows, 2, greatest(size(__rows) - 1, 0))"),
            lambda s: s.getField("__line"),
        ),
        "\n",
    )
    return tbl.select(
        id_col,
        "table_idx",
        F.size("__rows").alias("n_rows"),
        n0.alias("n_cols"),
        F.concat(
            first.getField("__line"),
            F.lit("\n"),
            sep,
            F.when(F.size("__rows") > 1, F.concat(F.lit("\n"), body))
            .otherwise(F.lit("")),
        ).alias("markdown"),
    )


# ---------------------------------------------------------------------------
# list extraction: the <ul>/<ol> sibling of the table grammar
# ---------------------------------------------------------------------------

LIST_BLOCK = "(?is)<[ou]l(?:>|[ \\t\\n\\r][^>]*>).*?</[ou]l>"
ITEM_BLOCK = "(?is)<li(?:>|[ \\t\\n\\r][^>]*>).*?</li>"


def list_items(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, list_idx, item_idx, ordered, item_text) — one row per
    ``<li>`` of every ``<ul>``/``<ol>`` block, 0-based ordinals in
    document order. Same frozen regular grammar and cell-cleanup
    chain as :func:`table_cells` (a NESTED list truncates its outer
    at the inner's first close — stated); ``ordered`` = the block
    tag is ``<ol`` (case-insensitive). Scan-stage column math, zero
    Python, zero shuffle."""
    pages = df.select(
        F.col(id_col),
        F.col(html_col).cast("string").alias("__html"),
    )
    blocks = pages.select(
        id_col,
        F.posexplode(
            F.expr(f"regexp_extract_all(__html, '{LIST_BLOCK}', 0)")
        ).alias("list_idx", "__blk"),
    )
    items = blocks.select(
        id_col,
        "list_idx",
        (F.lower(F.substring("__blk", 1, 3)) == "<ol").alias("ordered"),
        F.posexplode(
            F.expr(f"regexp_extract_all(__blk, '{ITEM_BLOCK}', 0)")
        ).alias("item_idx", "__item"),
    )
    return items.select(
        id_col,
        "list_idx",
        "item_idx",
        "ordered",
        clean_cell_text(F.col("__item")).alias("item_text"),
    )


def lists_markdown(
    items: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, list_idx, n_items, ordered, markdown): markdown bullets —
    ``- item`` for unordered, ``1. item`` (1-based running number)
    for ordered. One id-grain partial-aggregable group, zero skew."""
    lines = items.withColumn(
        "__line",
        F.when(
            F.col("ordered"),
            F.concat(
                (F.col("item_idx") + 1).cast("string"),
                F.lit(". "),
                F.col("item_text"),
            ),
        ).otherwise(F.concat(F.lit("- "), F.col("item_text"))),
    )
    return (
        lines.groupBy(id_col, "list_idx")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.max("ordered").alias("ordered"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("item_idx", "__line"))
                    ),
                    lambda s: s.getField("__line"),
                ),
                "\n",
            ).alias("markdown"),
        )
    )
