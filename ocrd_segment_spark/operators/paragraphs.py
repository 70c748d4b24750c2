"""Corpus-frequency boilerplate removal (paragraph/line-level dedup).

The C4/RefinedWeb-style pass a web training corpus needs after
extraction: a unit of text (line or paragraph) that occurs in many
DOCUMENTS is boilerplate (cookie banners, nav footers, share buttons)
and is removed from every document, preserving the order of what
remains. The reference has no corpus-global operator (it is page-
complete); this is the engine's cross-document analog of its
boilerplate heuristics (kernel stage 5 drops nav/link-farm regions
WITHIN a page; this drops repeated text ACROSS pages).

Frozen semantics:
- units: split on the LITERAL ``sep`` (escaped before reaching the
  regex-based split — '.' or '|' separators must not explode into
  per-character units), EMPTY UNITS DROPPED (they carry no content
  and would otherwise dominate doc-frequency);
- doc_freq(unit) = number of distinct documents containing the unit
  (repeats inside one document count once);
- a unit is removed from every document iff doc_freq >= min_doc_freq;
- clean_text = surviving units in original order joined by ``sep``;
  documents losing every unit yield '' (and keep their row).

Scale shape (the part that must survive 100 TB):
- explode → per-(doc, unit) distinct → groupBy(unit) count. The
  distinct keys on (unit, doc) pairs — fine-grained; the unit count
  is a partial-aggregating SUM, so a unit present in a billion docs
  is combined map-side, never collected on one reducer.
- frequency join keys on the unit text itself; both sides are
  corpus-sized → plain shuffle hash join that co-partitions. (Hot
  units ARE the boilerplate — they appear once per doc on the explode
  side, so the join key distribution mirrors the corpus, and AQE skew
  splitting covers residual hot spots.)
- rebuild = one groupBy(doc) over kept units — bounded by document
  size, never corpus-wide.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F



def rebuild_with_spans(d, sep: str, spans_col: str):
    """The ONE home of the frozen rebuild-and-remap discipline, shared
    by :func:`remove_frequent_regions` and
    functions/pii.redact_pii_spans (round-5 review: the two had grown
    near-verbatim copies of this machinery, a silent-divergence
    channel).

    Consumes two columns on ``d`` and drops them:

    - ``_arr``: array<struct<orig_start bigint, r <span struct>,
      rtext string>> — the POSITIVE units in final output order,
      ``rtext`` being each unit's NEW text;
    - ``_zeros``: array of original span structs with end == start.

    Appends ``clean_text`` = rtexts joined by ``sep`` and
    ``spans_col`` = every span struct rewritten in place (withField —
    gated extras like ``dir`` survive) with offsets derived O(n) from
    separator positions (zip_with — never the measured O(n²)
    aggregate+array_append prefix scan); zero-length spans re-anchor
    to the new start of the first positive unit at-or-after their
    original position (end of clean_text if none); output spans order
    by (new start, new end, region_id).

    NOTE: the per-character separator lambda references the
    ``clean_text`` COLUMN — safe under whole-stage codegen
    (subexpression-eliminated; measured linear at 10k docs), but a
    codegen-LESS plan (streaming microbatch) would re-evaluate it per
    character (no interpreted CSE) — bind through a transform variable
    first if this ever moves to a stream (the with_char_entropy
    lesson)."""
    assert len(sep) == 1, "sep must be one character (offset derivation)"
    d = d.withColumn(
        "clean_text",
        F.array_join(F.transform("_arr", lambda p: p["rtext"]), sep),
    )
    # new offsets from separator positions: 1-based sep position p =>
    # the next unit starts at 0-based p
    seps = F.filter(
        F.sequence(F.lit(1), F.length("clean_text")),
        lambda i: F.col("clean_text").substr(i, F.lit(1)) == F.lit(sep),
    )
    starts = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(seps, lambda p: p.cast("long")),
    )
    zipped = F.zip_with(
        "_arr",
        starts,
        lambda p, st: F.struct(
            p["orig_start"].alias("orig_start"),
            st.alias("new_start"),
            p["r"]
            .withField("start", st)
            .withField("end", st + F.length(p["rtext"]))
            .alias("span"),
        ),
    )
    # zip_with pads the shorter side with nulls (an empty _arr against
    # starts=[0] would fabricate a null span) — slice to the true size;
    # materialized as a column so the per-zero lambda below references
    # an attribute, not a re-evaluated expression tree (no-CSE trap)
    d = d.withColumn("_rp", F.slice(zipped, 1, F.size("_arr")))
    zero_spans = F.transform(
        "_zeros",
        lambda z: z.withField(
            "start",
            F.coalesce(
                F.get(
                    F.filter("_rp", lambda p: p["orig_start"] >= z["start"]),
                    F.lit(0),
                )["new_start"],
                F.length("clean_text").cast("long"),
            ),
        ).withField(
            "end",
            F.coalesce(
                F.get(
                    F.filter("_rp", lambda p: p["orig_start"] >= z["start"]),
                    F.lit(0),
                )["new_start"],
                F.length("clean_text").cast("long"),
            ),
        ),
    )
    d = d.withColumn(
        "_all", F.concat(F.transform("_rp", lambda p: p["span"]), zero_spans)
    )
    # order by (new start, new end, region_id): sort a keyed wrapper,
    # then strip — array_sort on the raw struct would key on region_id
    final_spans = F.transform(
        F.array_sort(
            F.transform(
                "_all",
                lambda x: F.struct(
                    x["start"].alias("k1"),
                    x["end"].alias("k2"),
                    x["region_id"].alias("k3"),
                    x.alias("span"),
                ),
            )
        ),
        lambda w: w["span"],
    )
    return d.withColumn(spans_col, final_spans).drop(
        "_arr", "_zeros", "_rp", "_all"
    )


def remove_frequent_regions(
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "extracted_text",
    spans_col: str = "region_spans",
    sep: str = "\n",
    min_doc_freq: int = 3,
) -> DataFrame:
    """SPAN-PRESERVING boilerplate removal (round-3 task 5): the unit
    is the REGION — each span's substring of the document text — so
    the output carries (clean_text, REMAPPED region_spans) and a user
    keeps region structure on the cleaned corpus without re-running
    extraction (``remove_frequent_units`` emits clean_text only and
    orphans the spans).

    Frozen semantics:
    - unit text = substring(text, start, end) per span; ZERO-LENGTH
      spans (media anchors, kernel 1.3 structural markers) are never
      counted in frequency, never removed, and never contribute a join
      unit (they would otherwise inject an empty-unit separator and
      mutate clean_text even on a no-op run — review-found);
    - doc_freq(unit) = distinct documents containing that text in any
      region; removed everywhere iff doc_freq >= min_doc_freq;
    - kept positive spans sort by (start, end, region_id, …);
      clean_text joins their texts with ``sep``; every span keeps
      EVERY input field (the structs are rewritten with ``withField``,
      so gated extras like ``dir`` survive) and gets new offsets:
      substring(clean_text, new start, new end) == its original text
      BY CONSTRUCTION (the contract oracle re-derives both sides, so a
      remap bug breaks the hash);
    - a zero-length span re-anchors to the new start of the FIRST kept
      positive span at-or-after its original position (end of
      clean_text if none follows);
    - the output array orders by (new start, new end, region_id);
    - documents losing every region (or having none) keep their row
      with clean_text '' and an empty span array.

    Preconditions (kernel invariants, pytest-pinned): region text never
    contains ``sep`` (extraction joins regions WITH it, region-internal
    whitespace is collapsed), and ``sep`` is one character — that is
    what lets new offsets derive O(n) from separator positions in
    clean_text (zip_with), not an O(n²) prefix scan (the measured
    aggregate+array_append trap). Overlapping (container) spans are
    legal input but serialize once per span, like extraction itself.

    Scale shape: same as remove_frequent_units — fine-grained
    (unit, doc) distinct + unit-keyed count + unit-keyed join, then a
    doc-keyed rebuild bounded by document size; no corpus-wide key.
    """
    assert len(sep) == 1, "sep must be one character (offset derivation)"
    units = extracted.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        F.explode_outer(spans_col).alias("r"),
    ).withColumn(
        "rtext",
        F.expr("substring(_t, cast(r.start + 1 as int), cast(r.end - r.start as int))"),
    )
    freq = (
        units.filter((F.col("r").isNotNull()) & (F.col("rtext") != ""))
        .select("rtext", "id")
        .distinct()
        .groupBy("rtext")
        .agg(F.count("*").alias("doc_freq"))
    )
    tagged = units.join(freq, "rtext", "left").withColumn(
        "_keep", F.coalesce("doc_freq", F.lit(0)) < F.lit(min_doc_freq)
    )
    out = _rebuild_tagged_units(tagged, sep, spans_col)
    return out.select(
        F.col("id").alias(id_col),
        "clean_text",
        spans_col,
        "n_kept",
        "n_removed",
    )


def _rebuild_tagged_units(tagged, sep: str, spans_col: str) -> DataFrame:
    """Shared second half of the span-preserving cleanups: consume a
    per-unit frame (id, _t, r <span struct or null>, rtext, _keep) and
    rebuild per-doc (id, clean_text, spans_col, n_kept, n_removed) via
    :func:`rebuild_with_spans`. Factored out of
    remove_frequent_regions so :func:`c4_clean_regions` (whose _keep
    is a row-local predicate, not a frequency join) cannot drift from
    the frozen rebuild discipline."""
    is_pos = F.col("r").isNotNull() & (F.col("r.end") > F.col("r.start"))
    is_zero = F.col("r").isNotNull() & (F.col("r.end") == F.col("r.start"))
    # one sort-keyed struct per span, FULL original struct carried as
    # payload (field set stays generic — gated extras like `dir`
    # survive); the null-span row of empty documents drops out of
    # collect_list; zero-length spans collect separately (kept always)
    key = lambda: F.struct(  # noqa: E731  (two identical key layouts)
        F.col("r.start").alias("start"),
        F.col("r.end").alias("end"),
        F.col("r.region_id").alias("region_id"),
        F.col("r").alias("r"),
        F.col("rtext").alias("rtext"),
    )
    per_doc = tagged.groupBy("id").agg(
        F.sort_array(
            F.collect_list(F.when(is_pos & F.col("_keep"), key()))
        ).alias("_arr"),
        F.sort_array(F.collect_list(F.when(is_zero, key()))).alias("_zeros"),
        F.sum(
            (F.col("r").isNotNull() & (is_zero | F.col("_keep"))).cast("long")
        ).alias("n_kept"),
        F.sum((is_pos & ~F.col("_keep")).cast("long")).alias("n_removed"),
    )
    shaped = per_doc.withColumn(
        "_arr",
        F.transform(
            "_arr",
            lambda x: F.struct(
                x["start"].alias("orig_start"),
                x["r"].alias("r"),
                x["rtext"].alias("rtext"),
            ),
        ),
    ).withColumn("_zeros", F.transform("_zeros", lambda z: z["r"]))
    return rebuild_with_spans(shaped, sep, spans_col)


def remove_repeated_units_within(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(id_col, clean_text, n_kept, n_removed): drop REPEATS of a unit
    WITHIN each document, keeping the first occurrence — the intra-page
    counterpart of :func:`remove_frequent_units` (cross-page cookie
    banners repeat ACROSS docs; scraped pagination/boilerplate glitches
    repeat INSIDE one). Empty units drop like the cross-doc form.

    Entirely ROW-LOCAL — no shuffle at all: the dedup is an array fold
    over the split units (order-preserving first-keep), evaluated in
    the scan stage. The seen-set is the unit array itself via
    array_position (O(u²) in UNITS per doc — tens, not characters;
    bounded by document size, never corpus size)."""
    # coalesce: NULL text must behave as empty (size(NULL) is -1)
    units = (
        f"filter(split(coalesce({text_col}, ''), '{_sep_rx(sep)}'),"
        f" x -> x != '')"
    )
    # keep unit i iff the FIRST occurrence of its value is at i
    # (array_position is 1-based first-match); u binds ONCE through
    # the transform variable (collapse-safe — the entropy lesson),
    # and the empty-array guard dodges sequence(1, 0)'s descent
    d = df.withColumn(
        "_all",
        F.expr(
            f"get(transform(array({units}), u ->"
            f" CASE WHEN size(u) = 0 THEN u ELSE"
            f" zip_with(u, sequence(1, size(u)),"
            f"          (x, i) -> IF(array_position(u, x) = i, x,"
            f"                       cast(null as string))) END"
            f"), 0)"
        ),
    )
    return (
        d.withColumn("_kept", F.expr("filter(_all, x -> x is not null)"))
        .select(
            F.col(id_col),
            F.array_join("_kept", sep).alias("clean_text"),
            F.size("_kept").cast("long").alias("n_kept"),
            (F.size("_all") - F.size("_kept")).cast("long").alias("n_removed"),
        )
    )


def _sep_rx(sep: str) -> str:
    """Separator → Java-regex pattern embedded in a Spark SQL string
    literal: regex-escape first, then survive the literal parser's
    backslash processing, then spell control chars as escapes."""
    import re as _re

    esc = _re.escape(sep).replace("\\", "\\\\")
    esc = esc.replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
    # a bare quote would TERMINATE the embedded SQL literal
    return esc.replace("'", "\\'")


def unit_doc_frequency(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(unit, doc_freq): distinct-document frequency of every text unit."""
    units = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), re.escape(sep))).alias("unit"),
    ).filter(F.col("unit") != "")
    return (
        units.select("unit", "id")
        .distinct()
        .groupBy("unit")
        .agg(F.count("*").alias("doc_freq"))
    )


def remove_frequent_units(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_doc_freq: int = 3,
) -> DataFrame:
    """(id_col, clean_text, n_kept, n_removed): drop units whose
    distinct-document frequency reaches ``min_doc_freq``; rebuild each
    document from the survivors in original order."""
    ids = df.select(F.col(id_col).alias("id"))
    units = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "unit"),
    ).filter(F.col("unit") != "")
    # frequency from the SAME exploded derivation (unit_doc_frequency(df)
    # would restate the split+explode — a second copy to keep in sync,
    # and a plan subtree Catalyst cannot recognize as shared). NOTE the
    # physical plan still scans the source twice (both join inputs need
    # the exploded rows and there is no common Exchange to reuse); at
    # corpus scale that is the standard trade — a columnar re-scan is
    # far cheaper than materializing the exploded corpus.
    freq = (
        units.select("unit", "id")
        .distinct()
        .groupBy("unit")
        .agg(F.count("*").alias("doc_freq"))
    )
    tagged = units.join(freq, "unit")
    kept = tagged.filter(F.col("doc_freq") < min_doc_freq)
    removed = tagged.filter(F.col("doc_freq") >= min_doc_freq)
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, unit))), x -> x.unit)"),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    n_removed = removed.groupBy("id").agg(F.count("*").alias("n_removed"))
    return (
        ids.join(rebuilt, "id", "left")
        .join(n_removed, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# C4 line-level rules (Raffel et al. 2020, JMLR 21(140) §2.2)
# ---------------------------------------------------------------------------

# the frozen C4 rule set, re-expressed deterministically (the paper's
# prose leaves several choices open; these are this engine's pins, the
# DuckDB oracle restates them):
# - a LINE is kept iff, after rtrim of trailing spaces, it ends in a
#   terminal punctuation mark (period, exclamation, question mark,
#   straight or right-curly double quote), has >= min_words words
#   (split on ' ', empties dropped — the TOKENS discipline), and does
#   not contain 'javascript' case-insensitively;
# - a PAGE is kept iff its ORIGINAL text has no curly bracket ('{' or
#   '}' — "sourced from code") and no 'lorem ipsum'
#   case-insensitively, and its KEPT text has >= min_sentences
#   sentence enders (count of [.!?] occurrences — the paper counted
#   nltk sentences; this engine pins the count to the ender chars so
#   both engines agree byte-for-byte);
# - the paper's bad-words list is NOT bundled (licensing); route that
#   through the domain blocklist / quality_clf stages instead.
C4_TERMINAL_RX = '[.!?"”]$'
C4_SENTENCE_RX = "[.!?]"


def _c4_line_keep(line, min_words: int):
    return (
        F.rtrim(line).rlike(C4_TERMINAL_RX)
        & (
            F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))
            >= F.lit(min_words)
        )
        & ~F.lower(line).contains("javascript")
    )


def _c4_page_flags(d, orig_text, clean_text, min_sentences: int):
    """Append n_sentences + c4_page_keep given original/clean text
    columns (both must be attribute references, not expression trees —
    the no-CSE trap)."""
    return d.withColumn(
        "n_sentences",
        F.size(F.regexp_extract_all(clean_text, F.lit(C4_SENTENCE_RX), 0)).cast(
            "long"
        ),
    ).withColumn(
        "c4_page_keep",
        (F.col("n_sentences") >= F.lit(min_sentences))
        & ~orig_text.contains("{")
        & ~orig_text.contains("}")
        & ~F.lower(orig_text).contains("lorem ipsum"),
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(id, clean_text, n_kept, n_removed, n_sentences, c4_page_keep):
    the C4 cleaning pass for SPAN-LESS corpora — lines split on
    newline, kept under the frozen rule above, rejoined in order.
    Entirely JVM column math (one filter lambda per line, no window,
    no shuffle); page flags are row-local."""
    d = df.select(
        F.col(id_col), F.col(text_col).alias("_t")
    ).withColumn("_lines", F.split("_t", "\n"))
    d = d.withColumn(
        "_kept", F.filter("_lines", lambda l: _c4_line_keep(l, min_words))
    )
    d = (
        d.withColumn("clean_text", F.array_join("_kept", "\n"))
        .withColumn("n_kept", F.size("_kept").cast("long"))
        .withColumn(
            "n_removed", (F.size("_lines") - F.size("_kept")).cast("long")
        )
    )
    d = _c4_page_flags(d, F.col("_t"), F.col("clean_text"), min_sentences)
    return d.select(
        id_col, "clean_text", "n_kept", "n_removed", "n_sentences",
        "c4_page_keep",
    )


def c4_clean_regions(
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "extracted_text",
    spans_col: str = "region_spans",
    sep: str = "\n",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """SPAN-PRESERVING C4 cleaning over extraction output: the unit is
    the REGION (extraction joins regions with ``sep`` and region text
    never contains it — the remove_frequent_regions precondition — so
    C4's "line" IS the region) and the output carries remapped
    ``spans_col`` via the shared rebuild discipline. ``_keep`` is a
    row-local predicate — no frequency join, no shuffle beyond the
    per-doc rebuild; page flags join back at doc grain."""
    assert len(sep) == 1, "sep must be one character (offset derivation)"
    units = extracted.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        F.explode_outer(spans_col).alias("r"),
    ).withColumn(
        "rtext",
        F.expr(
            "substring(_t, cast(r.start + 1 as int),"
            " cast(r.end - r.start as int))"
        ),
    )
    tagged = units.withColumn("_keep", _c4_line_keep(F.col("rtext"), min_words))
    out = _rebuild_tagged_units(tagged, sep, spans_col)
    # page rules need the ORIGINAL text (curly/lorem are page-level on
    # the raw page) — a doc-grain join back, never corpus-wide
    orig = extracted.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_orig")
    )
    joined = out.join(orig, "id")
    joined = _c4_page_flags(
        joined, F.col("_orig"), F.col("clean_text"), min_sentences
    )
    return joined.select(
        F.col("id").alias(id_col),
        "clean_text",
        spans_col,
        "n_kept",
        "n_removed",
        "n_sentences",
        "c4_page_keep",
    )
