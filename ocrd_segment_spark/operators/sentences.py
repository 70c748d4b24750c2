"""Span-preserving sentence segmentation.

The kernel's extraction emits region/line/word/glyph spans
(functions/sublevels); training-data layout wants one level finer —
sentences — because packing (operators/sampling.pack_sequences) and
decontamination windows are cleaner at sentence boundaries than at
arbitrary character offsets. This module segments ``text`` into
sentences WITH their [start, end) character spans in the original
text, so every sentence row can be traced back to (and re-sliced
from) the span-aligned corpus the extraction jobs write.

Frozen segmentation rule (deliberately regular — both engines state
it; a learned splitter would not be portable to a SQL oracle):

  - a boundary is a run position matching ``([.!?])( +)([A-Z])``:
    one terminator, one-or-more SPACES (0x20 — other whitespace does
    not split), an ASCII uppercase letter opening the next sentence;
    matches are found left-to-right non-overlapping (the consumed
    uppercase letter cannot itself host the next boundary — stated,
    both engines' regexp_replace scan this way);
  - the split point is after the terminator: inter-sentence spaces
    lead the FOLLOWING unit and are then stripped, so a sentence span
    covers exactly its trimmed text;
  - a document with no boundary is ONE sentence (trailing punctuation
    not required); empty / all-space documents yield NO rows;
  - ``sent_idx`` renumbers 0..n-1 over the KEPT sentences.

Implementation shape (100 TB): one global regexp_replace inserts a
US (0x1F) marker per boundary; since markers are pure insertions the
original text is the split units concatenated, and each unit's start
is the sum of the unit lengths before it — computed as a per-unit
scalar ``aggregate`` over an int-array slice (no array_append
accumulator, no per-character substring scan; O(u²) integer adds in
the sentence count u, linear in characters). Everything is JVM
column math; the only "shuffle" is none — output rows explode in
place. The DuckDB oracle derives the SAME spans by the other route
(window prefix-sum over unit lengths in the relational form), so the
contract cross-checks two independent derivations of one frozen
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BOUNDARY = "([.!?])( +)([A-Z])"
SEP = "\x1f"


def sentence_spans(
    df: DataFrame, text_col: str = "text", id_cols: tuple = ("doc_id",)
) -> DataFrame:
    """(id_cols…, sent_idx, start, end, sentence) — one row per
    sentence under the frozen rule; ``text_col`` is assumed free of
    the US control character (the kernel's extraction never emits
    control characters; assert upstream if ingesting foreign text)."""
    ids = [F.col(c) for c in id_cols]
    marked = df.select(
        *ids,
        F.expr(
            f"regexp_replace({text_col}, '{BOUNDARY}',"
            f" concat('$1', chr(31), '$2$3'))"
        ).alias("__m"),
    )
    # offsets from UNIT lengths: markers were inserted (nothing was
    # deleted), so the original text is the units concatenated and
    # start_k = Σ length(unit_j) for j < k. The per-start aggregate
    # folds an int slice to a SCALAR — no array_append accumulator
    # (the measured O(n²)-copies trap) and no per-CHARACTER substr
    # scan (UTF8String.substring walks bytes to the index, quadratic
    # on long documents — review-found). Cost is O(u²) integer adds
    # in the SENTENCE count u, linear in characters.
    marked = marked.withColumn("__u", F.split("__m", SEP)).withColumn(
        "__lens",
        F.transform("__u", lambda u: F.length(u).cast("long")),
    )
    starts = F.transform(
        F.sequence(F.lit(0), F.size("__u") - 1),
        lambda k: F.aggregate(
            F.slice("__lens", F.lit(1), k),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    sent = (
        marked.withColumn(
            "__z",
            F.zip_with(
                F.col("__u"),
                starts,
                lambda u, st: F.struct(
                    F.ltrim(u).alias("sentence"),
                    (st + F.length(u) - F.length(F.ltrim(u)))
                    .cast("long")
                    .alias("start"),
                ),
            ),
        )
        .withColumn(
            "__kept", F.filter("__z", lambda s: s["sentence"] != "")
        )
        .select(*ids, F.posexplode("__kept").alias("sent_idx", "__s"))
    )
    return sent.select(
        *[F.col(c) for c in id_cols],
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("__s.start").alias("start"),
        (F.col("__s.start") + F.length("__s.sentence"))
        .cast("long")
        .alias("end"),
        F.col("__s.sentence").alias("sentence"),
    )
