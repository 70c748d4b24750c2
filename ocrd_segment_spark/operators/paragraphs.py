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
