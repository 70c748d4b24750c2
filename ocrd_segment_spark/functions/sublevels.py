"""Line/word/glyph sub-segment derivation + inheritance fallback
chains — the web-graft analog of the reference's sub-region extractors
(reference extract_lines.py:87-283, extract_words.py:90-201,
extract_glyphs.py:95-205) and their child-overrides-parent attribute
resolution (extract_words.py:150-168, extract_lines.py:224-238,
extract_glyphs.py:163-168).

1-D re-derivation of the hierarchy (SURVEY.md §1.2):

- **word**  = whitespace token inside a region span. The kernel joins
  tokens with single separators (kernel/extract.py:172), so splitting
  on one whitespace char is the exact inverse — offsets are a prefix
  sum of token lengths, no re-search needed.
- **line**  = fixed-width wrap of ``line_width`` consecutive words.
  This is the layout analog: a TextLine is what a renderer produces by
  wrapping a region's words at the region's pixel width; the frozen
  rule wraps at a fixed word count instead.
- **glyph** = one character of a word (the reference's 4-level nested
  loop extract_glyphs.py:95-125 becomes a ``sequence()`` expression).

Scale design: everything here is a pure Column expression over the
extraction output — per-row compute, narrow, ZERO shuffle at any
corpus size. Flat per-level tables are one ``explode`` away (still
narrow). Word offsets come from separator POSITIONS (one linear pass
zipped into spans), not an ``aggregate`` prefix-scan — the scan's
``array_append`` is O(words²) in copies per region and measured 9×
slower at ~1.3k words/region, diverging quadratically beyond that.

Ids use ``format_string('%0Nd')`` — Spark ``lpad`` silently TRUNCATES
past the pad width (lpad('1000',3,'0') = '100'), which would collide
ids and diverge from the Python mirror on 10k-word regions.
Ids are composite ``region_id _l{line} _w{word}`` mirroring the
reference's ``region.id + '_' + line.id + '_' + word.id`` file-name
scheme (extract_words.py:190-193) — deterministic under any
parallelism, no global counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_FIELDS = "region_id string, line_id string, word_id string, start long, end long, w_order int"
LINE_FIELDS = "region_id string, line_id string, start long, end long, l_order int, n_words int"
MEMBER_FIELDS = "ref_id string, index int"
GROUP_FIELDS = (
    f"group_id string, level string, members array<struct<{MEMBER_FIELDS}>>"
)


def _line_id(rid: Column, li) -> Column:
    """Composite line id — the ONE format shared by words_in_region,
    lines_from_words, and reading_order_groups (format_string, never
    lpad: lpad truncates past the pad width)."""
    li = li if isinstance(li, Column) else F.lit(li)
    return F.concat(rid, F.lit("_l"), F.format_string("%03d", li.cast("int")))


def _word_id(rid: Column, wi) -> Column:
    wi = wi if isinstance(wi, Column) else F.lit(wi)
    return F.concat(rid, F.lit("_w"), F.format_string("%04d", wi.cast("int")))


def _n_lines(n: Column, line_width: int) -> Column:
    """ceil(n / line_width) for n >= 0 — the ONE wrap rule."""
    return F.when(
        n > 0, ((n - F.lit(1)) / line_width).cast("int") + F.lit(1)
    ).otherwise(F.lit(0))


def _is_ws(c: Column) -> Column:
    """The Java-regex ``\\s`` class [ \\t\\n\\x0B\\f\\r] spelled out —
    identical to what ``split(seg, '\\s')`` treats as a separator, so
    switching from token-split to separator-positions changes nothing.
    Default-kernel tokens never contain whitespace, so every separator
    is exactly one char wide and offsets are exact. Verbatim-``<pre>``
    regions (kernel 1.6.0 params.preserve_pre) CAN carry consecutive
    whitespace — each run still decomposes into 1-char separators, the
    resulting empty tokens (s == e) are dropped by the existing edge
    rule, and surviving word offsets stay exact (pinned by
    test_sublevels.test_words_exact_over_preserve_pre_text).

    Spelled as ONE ``contains`` probe into the 6-char constant
    (round 6): same truth table as the 6-comparison OR chain over the
    single chars ``split('')`` yields, ~15-20% less interpreted-lambda
    work per character (measured at sf1.0). The '' corner (empty
    segment → split yields ['']) differs per-call — contains('', …) is
    true — but both forms still produce zero word spans there: the
    lone separator position makes (0,0)/(1,0) raw spans that the
    ``e > s`` edge rule drops, exactly like the no-separator path."""
    return F.contains(F.lit(" \t\n\r\x0b\x0c"), c)


def _raw_word_scan(text: Column, start: Column, end: Column) -> Column:
    """array<struct<s,e>> of token spans (ABSOLUTE offsets into the
    document text) inside one region span — the 1-D analog of per-word
    Coords (extract_words.py:96-117), derived instead of re-measured.

    Linear construction: word boundaries ARE the separator positions —
    starts = 0 ∪ (sep+1), ends = sep ∪ len(seg), zipped pairwise. One
    O(chars) pass; no aggregate prefix-scan (whose per-element
    ``array_append`` copy is O(words²) per region — measured 9× slower
    at ~1.3k words/region and diverging quadratically). Empty tokens
    (possible only at span edges after G10 spread, where s == e) are
    dropped at the end, offsets of survivors untouched."""
    seg = F.substring(text, (start + F.lit(1)).cast("int"), (end - start).cast("int"))
    seps = F.filter(
        F.transform(
            F.split(seg, ""),
            lambda c, i: F.when(_is_ws(c), i).otherwise(F.lit(-1)),
        ),
        lambda p: p >= 0,
    )
    starts = F.array_prepend(
        F.transform(seps, lambda p: (p + F.lit(1)).cast("long")),
        F.lit(0).cast("long"),
    )
    ends = F.array_append(
        F.transform(seps, lambda p: p.cast("long")),
        F.length(seg).cast("long"),
    )
    raw = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            (s + start).cast("long").alias("s"),
            (e + start).cast("long").alias("e"),
        ),
    )
    return F.filter(raw, lambda x: x["e"] > x["s"])


def words_in_region(text: Column, region: Column, line_width: int) -> Column:
    """array<struct WORD_FIELDS> for one region struct (fields
    region_id/start/end as produced by the kernel). ``line_width``
    determines each word's line membership (w_order div width)."""
    raw = _raw_word_scan(text, region["start"], region["end"])
    rid = region["region_id"]
    return F.transform(
        raw,
        lambda x, i: F.struct(
            rid.alias("region_id"),
            _line_id(rid, (i / line_width)).alias("line_id"),
            _word_id(rid, i).alias("word_id"),
            x["s"].alias("start"),
            x["e"].alias("end"),
            i.cast("int").alias("w_order"),
        ),
    )


def lines_from_words(words: Column, region: Column, line_width: int) -> Column:
    """array<struct LINE_FIELDS> grouping a region's words into
    fixed-width lines (first word's start .. last word's end — the
    token hull, same shrink discipline as regions).

    PERF CONTRACT: pass ``words`` as a LAMBDA VARIABLE (zip_with /
    transform binding) or a plain column reference, never the raw
    ``words_in_region(...)`` expression tree — interpreted HOFs
    re-evaluate an inline expression at every reference, and this
    function indexes ``words`` twice per line (measured 13× slowdown
    at 10k docs when inlined; see with_sublevels)."""
    n = F.size(words)
    rid = region["region_id"]
    idx = F.sequence(F.lit(0), _n_lines(n, line_width) - F.lit(1))
    make = F.transform(
        idx,
        lambda i: F.struct(
            rid.alias("region_id"),
            _line_id(rid, i).alias("line_id"),
            F.element_at(words, (i * line_width + F.lit(1)).cast("int"))["start"].alias("start"),
            F.element_at(words, F.least((i + F.lit(1)) * line_width, n).cast("int"))["end"].alias("end"),
            i.cast("int").alias("l_order"),
            (F.least((i + F.lit(1)) * line_width, n) - i * line_width).cast("int").alias("n_words"),
        ),
    )
    return F.when(n > 0, make).otherwise(
        F.expr(f"CAST(array() AS ARRAY<STRUCT<{LINE_FIELDS}>>)")
    )


def with_sublevels(df: DataFrame, line_width: int = 8) -> DataFrame:
    """Add ``word_spans``/``line_spans`` arrays (all regions flattened,
    document order) to extraction output ``(url, extracted_text,
    region_spans, ...)``. Narrow — zero shuffle at any scale.

    The per-region word arrays are computed ONCE and bound through
    ``zip_with`` lambda variables; the line derivation then indexes
    them in O(1) per line. Referencing the word expression tree inside
    the per-line lambdas instead re-evaluates the whole word scan per
    line (interpreted HOFs have no common-subexpression elimination) —
    measured 13 s vs 0.7 s on 10k realistic pages."""
    text = F.col("extracted_text")
    nested = F.transform(
        F.col("region_spans"), lambda r: words_in_region(text, r, line_width)
    )
    lines = F.flatten(
        F.zip_with(
            F.col("region_spans"),
            nested,
            lambda r, ws: lines_from_words(ws, r, line_width),
        )
    )
    return df.withColumn("word_spans", F.flatten(nested)).withColumn(
        "line_spans", lines
    )


def words_table(df: DataFrame, line_width: int = 8) -> DataFrame:
    """Flat per-word table (url, region_id, line_id, word_id, start,
    end, w_order, word_text) — the extract-words sink analog
    (extract_words.py:147-201). One explode, still narrow.

    The explode runs FUSED over the inline word-span expression
    (round 6): exploding the ``with_sublevels`` word_spans COLUMN
    instead measured ~2× slower at sf1.0 (3.4 s vs 1.8 s, same
    values) — the derived-array-column explode trap documented in
    CLAUDE.md; array-column consumers keep using with_sublevels."""
    text = F.col("extracted_text")
    nested = F.transform(
        F.col("region_spans"), lambda r: words_in_region(text, r, line_width)
    )
    out = df.select(
        "url", "extracted_text", F.explode(F.flatten(nested)).alias("w")
    )
    return out.select(
        "url",
        F.col("w.region_id").alias("region_id"),
        F.col("w.line_id").alias("line_id"),
        F.col("w.word_id").alias("word_id"),
        F.col("w.start").alias("start"),
        F.col("w.end").alias("end"),
        F.col("w.w_order").alias("w_order"),
        F.expr(
            "substring(extracted_text, CAST(w.start + 1 AS INT), CAST(w.end - w.start AS INT))"
        ).alias("word_text"),
    )


def lines_table(df: DataFrame, line_width: int = 8) -> DataFrame:
    """Flat per-line table — the extract-lines sink analog
    (extract_lines.py:221-283). Explode fused over the inline
    expression — see words_table."""
    text = F.col("extracted_text")
    nested = F.transform(
        F.col("region_spans"), lambda r: words_in_region(text, r, line_width)
    )
    lines = F.flatten(
        F.zip_with(
            F.col("region_spans"),
            nested,
            lambda r, ws: lines_from_words(ws, r, line_width),
        )
    )
    out = df.select(
        "url", "extracted_text", F.explode(lines).alias("l")
    )
    return out.select(
        "url",
        F.col("l.region_id").alias("region_id"),
        F.col("l.line_id").alias("line_id"),
        F.col("l.start").alias("start"),
        F.col("l.end").alias("end"),
        F.col("l.l_order").alias("l_order"),
        F.col("l.n_words").alias("n_words"),
        F.expr(
            "substring(extracted_text, CAST(l.start + 1 AS INT), CAST(l.end - l.start AS INT))"
        ).alias("line_text"),
    )


def glyphs_col(word: Column) -> Column:
    """array<struct<start,end,g_order>> — one char per glyph inside a
    word span (extract_glyphs.py:95-125 analog). A glyph in the 1-D
    frame IS a character, so no kernel round-trip is needed."""
    return F.transform(
        F.sequence(word["start"], word["end"] - F.lit(1)),
        lambda c, i: F.struct(
            c.cast("long").alias("start"),
            (c + F.lit(1)).cast("long").alias("end"),
            i.cast("int").alias("g_order"),
        ),
    )


def inherit_chain(*cols: Column) -> Column:
    """Child-overrides-parent attribute fallback — the reference's
    ``word.get_X() or line.get_X() or region.get_X() or page.get_X()``
    chains (extract_words.py:150-168) as one ``coalesce``. Works for
    scalar attrs AND whole TextStyle structs: the reference coalesces
    the ENTIRE style struct (``word.get_TextStyle() or
    line.get_TextStyle() or ...``, extract_words.py:127), never
    per-field, and so does this."""
    return F.coalesce(*cols)


def reading_order_groups(df: DataFrame, line_width: int = 8) -> DataFrame:
    """Nested reading-order group structure (reference
    repair.py:521-543 recursive Ordered/UnorderedGroup flatten;
    extract_pages.py:435-467 builds the same tree) re-expressed as a
    FLAT adjacency table — the standard relational encoding of a
    recursive type: one row per group, ``members`` ordered by the
    child's reading index (RegionRefIndexed/@index analog).

    Levels: ``#page`` → regions (OrderedGroup per page), each region →
    its lines, each line → its words. All derivation is row-local and
    FULLY ARITHMETIC after ONE per-region word scan (line/word ids are
    index-derived, so every membership list is a ``sequence()`` — no
    filters, O(output) total); the scan is bound through a transform
    lambda variable (interpreted-HOF CSE trap, see with_sublevels)."""
    member = lambda rid, idx: F.struct(  # noqa: E731
        rid.alias("ref_id"), idx.cast("int").alias("index")
    )
    text = F.col("extracted_text")
    nested_words = F.transform(
        F.col("region_spans"),
        lambda r: _raw_word_scan(text, r["start"], r["end"]),
    )

    def n_lines(ws):
        return _n_lines(F.size(ws), line_width)

    def groups_from(nw):
        page_groups = F.array(
            F.struct(
                F.lit("#page").alias("group_id"),
                F.lit("page").alias("level"),
                F.transform(
                    F.col("region_spans"),
                    lambda r: member(r["region_id"], r["order"]),
                ).alias("members"),
            )
        )
        region_groups = F.zip_with(
            F.col("region_spans"),
            nw,
            lambda r, ws: F.struct(
                r["region_id"].alias("group_id"),
                F.lit("region").alias("level"),
                F.when(
                    F.size(ws) > 0,
                    F.transform(
                        F.sequence(F.lit(0), n_lines(ws) - F.lit(1)),
                        lambda li: member(_line_id(r["region_id"], li), li),
                    ),
                )
                .otherwise(F.expr(f"CAST(array() AS ARRAY<STRUCT<{MEMBER_FIELDS}>>)"))
                .alias("members"),
            ),
        )
        line_groups = F.flatten(
            F.zip_with(
                F.col("region_spans"),
                nw,
                lambda r, ws: F.when(
                    F.size(ws) > 0,
                    F.transform(
                        F.sequence(F.lit(0), n_lines(ws) - F.lit(1)),
                        lambda li: F.struct(
                            _line_id(r["region_id"], li).alias("group_id"),
                            F.lit("line").alias("level"),
                            F.transform(
                                F.sequence(
                                    li * line_width,
                                    F.least(
                                        (li + F.lit(1)) * line_width, F.size(ws)
                                    )
                                    - F.lit(1),
                                ),
                                lambda i: member(
                                    _word_id(r["region_id"], i), i
                                ),
                            ).alias("members"),
                        ),
                    ),
                ).otherwise(
                    F.expr(f"CAST(array() AS ARRAY<STRUCT<{GROUP_FIELDS}>>)")
                ),
            )
        )
        return F.concat(page_groups, region_groups, line_groups)

    groups = F.get(
        F.transform(F.array(nested_words), lambda nw: groups_from(nw)), 0
    )
    out = df.select("url", F.explode(groups).alias("g"))
    return out.select(
        "url",
        F.col("g.group_id").alias("group_id"),
        F.col("g.level").alias("level"),
        F.size("g.members").alias("n_members"),
        F.array_join(
            F.transform(F.col("g.members"), lambda m: m["ref_id"]), ","
        ).alias("member_ids"),
    )


def word_style(word: Column, style_spans: Column) -> Column:
    """Resolve a word's TextStyle from the document's style runs —
    the word-level ``get_TextStyle()`` analog (extract_words.py:127):
    the run containing the word, or NULL (inherit) when unstyled.
    Row-local filter over the (short) runs array. ``F.get`` (0-based)
    rather than ``element_at``: under ANSI mode element_at THROWS on
    an empty array; get returns NULL."""
    return F.get(
        F.filter(
            style_spans,
            lambda s: (s["start"] <= word["start"]) & (word["end"] <= s["end"]),
        ),
        0,
    )
