"""Text-file source + replace-text operator (S6/J5/A8; reference
replace_text.py).

The reference globs ``*.gt.txt`` files, matches each file's basename
suffix to a segment id (first match wins, replace_text.py:48-58), and
inserts the content at TextEquiv index 0 (replace_text.py:62), then
counts updates per hierarchy level (replace_text.py:64-80).

Spark form: the files table is broadcast (it is the small side by
construction — correction files, not the corpus) against the exploded
region table with an ``endswith`` non-equi predicate → broadcast
nested-loop join, then first-match-wins via row_number and a rebuild
of the region array. The corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def read_text_files(spark, path_glob: str) -> DataFrame:
    """S6: whole-text files as (path, content)."""
    return (
        spark.read.format("text")
        .option("wholetext", True)
        .load(path_glob)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("content"),
        )
    )


def replace_region_text(extracted: DataFrame, files: DataFrame) -> DataFrame:
    """Update per-region text from a corrections table
    ``(path, content)`` where the path suffix encodes
    ``<url>_<region_id>.gt.txt``. Returns
    (url, region_id, old_text, new_text, level, alternatives) for
    accounting (A8); unmatched files are ignored like the reference
    logs-and-skips (replace_text.py:56-58).

    ``alternatives`` is the TextEquiv HISTORY (reference
    replace_text.py:62 ``insert_TextEquiv_at(0, …)`` — the correction
    is PREPENDED at index 0, prior alternatives shift up and are
    PRESERVED, never overwritten): ``[(0, new_text, 1.0),
    (1, old_text, old_score)]`` — P4 selection (functions/textequiv)
    then reads any level of the history."""
    regions = extracted.select(
        "url",
        F.explode("region_spans").alias("r"),
        F.col("extracted_text"),
    ).select(
        "url",
        F.col("r.region_id").alias("region_id"),
        F.col("r.rtype").alias("level"),
        F.expr("substring(extracted_text, r.start + 1, r.end - r.start)").alias("old_text"),
        F.col("r.score").alias("old_score"),
        F.concat(F.lit("_"), F.col("r.region_id"), F.lit(".gt.txt")).alias("suffix"),
    )
    # the '/' anchor disambiguates numeric-suffix collisions (url '2'
    # must not claim '.../12_r0008.gt.txt') — the reference has the
    # same ambiguity and resolves it by first-match luck; frozen rule
    # here: match on /<url>_<region_id>.gt.txt
    j = regions.join(
        F.broadcast(files),
        F.expr("endswith(path, concat('/', url, suffix))"),
        "inner",
    )
    from ..functions.textequiv import textequiv_insert

    w = W.partitionBy("url", "region_id").orderBy("path")  # first match wins
    matched = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn(
            "_prior",
            F.array(
                F.struct(
                    F.lit(0).alias("index"),
                    F.col("old_text").alias("unicode"),
                    F.col("old_score").alias("conf"),
                )
            ),
        )
    )
    return matched.select(
        "url", "region_id", "level", "old_text",
        F.col("content").alias("new_text"),
        textequiv_insert("_prior", F.col("content")).alias("alternatives"),
    )


def update_level_accounting(replaced: DataFrame) -> DataFrame:
    """A8 (reference replace_text.py:64-80): updates per level."""
    return replaced.groupBy("level").agg(F.count("*").alias("n_updated"))


def gt_review_table(
    extracted: DataFrame,
    line_width: int = 8,
    vocabulary: "list[str] | str | None" = None,
) -> DataFrame:
    """S11 xlsx-sink analog (reference extract_lines.py:108-156,
    264-275: an editable ground-truth spreadsheet — one row per line
    with the transcription, a type dropdown, and locked metadata).
    The spreadsheet machinery is presentation; the DATA contract is
    this table: one row per line, transcription editable, region type
    validated against a vocabulary, and the region_id needed to write
    corrections back through ``replace_region_text`` (whose file-name
    key is ``<url>_<region_id>.gt.txt`` — REGION granularity; line_id
    is review granularity only). Write with ``df.write.csv`` or any
    tabular sink.

    Single-pass: rtype/score attach row-locally from ``region_spans``
    (no self-join — extraction is the expensive stage and must run
    once). ``vocabulary=None`` (the default) uses the kernel's frozen
    rtype vocabulary (kernel/extract.py RTYPE_VOCABULARY) — a pure
    constant, NO driver action, the dropdown simply lists types the
    corpus may not contain. Pass ``vocabulary="derive"`` to narrow the
    dropdown to the observed rtypes instead; that derivation is a
    driver-side ``.collect()`` of the distinct rtypes (bounded by the
    kernel vocabulary, ≤11 values) and costs ONE extra pass over
    ``extracted`` — cache the input if extraction is expensive."""
    from ..functions.sublevels import with_sublevels
    from ..kernel.extract import RTYPE_VOCABULARY

    if vocabulary is None:
        vocabulary = list(RTYPE_VOCABULARY)
    elif isinstance(vocabulary, str) and vocabulary != "derive":
        # a bare string would be '|'.joined per-character below
        raise ValueError(
            f"vocabulary={vocabulary!r}: pass a list of types, None"
            " (kernel vocabulary), or the string 'derive'"
        )
    elif vocabulary == "derive":
        rows = (
            extracted.select(
                F.explode(
                    F.transform("region_spans", lambda r: r["rtype"])
                ).alias("rtype")
            )
            .distinct()
            .collect()
        )
        vocabulary = sorted(r["rtype"] for r in rows)
    validation = "|".join(vocabulary)

    # region_id → (rtype, score) as a per-row map, carried through the
    # line explode — row-local, no shuffle
    meta = F.map_from_arrays(
        F.transform("region_spans", lambda r: r["region_id"]),
        F.transform("region_spans", lambda r: F.struct(r["rtype"], r["score"])),
    )
    src = extracted.withColumn("_rmeta", meta)
    out = with_sublevels(src, line_width).select(
        "url", "extracted_text", "_rmeta", F.explode("line_spans").alias("l")
    )
    looked = F.element_at(F.col("_rmeta"), F.col("l.region_id"))
    return out.select(
        "url",
        F.col("l.region_id").alias("region_id"),
        F.col("l.line_id").alias("line_id"),
        F.expr(
            "substring(extracted_text, CAST(l.start + 1 AS INT),"
            " CAST(l.end - l.start AS INT))"
        ).alias("transcription"),
        looked["rtype"].alias("rtype"),
        F.round(looked["score"], 6).alias("score"),
        F.col("l.n_words").alias("n_words"),
        F.lit(validation).alias("validation"),
    )
