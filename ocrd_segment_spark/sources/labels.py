"""Label-mask segmentation import — the 1-D graft of
``ocrd-segment-from-masks`` (reference import_image_segmentation.py:
connected equally-COLORED mask segments → region polygons, region type
looked up in ``colordict``).

Web analog: the "mask" is a label STRING aligned 1:1 with the document
text (one label char per text char — e.g. from an upstream sequence
tagger). Maximal runs of one label become regions; the label resolves
to a region type through the colordict. Everything is pure column
math: boundary positions come from one linear pass (the same
separator-position construction as functions/sublevels), and both the
char array and the boundary array are bound through transform lambda
variables so interpreted HOFs never re-evaluate them per element (the
measured CSE trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def label_runs(labels: Column) -> Column:
    """array<struct<label string, s long, e long>> of maximal
    equal-char runs in ``labels`` (zero-length runs of an empty string
    excluded). Linear: boundary i is where char[i] != char[i+1];
    starts = 0 ∪ (b+1), ends = (b+1) ∪ len."""

    def boundaries(chars: Column) -> Column:
        return F.transform(
            F.filter(
                F.transform(
                    chars,
                    lambda c, i: F.when(
                        (i < F.size(chars) - F.lit(1))
                        & (F.get(chars, (i + F.lit(1)).cast("int")) != c),
                        i,
                    ).otherwise(F.lit(-1)),
                ),
                lambda p: p >= 0,
            ),
            lambda p: (p + F.lit(1)).cast("long"),
        )

    # bind the char array, then the boundary array, each ONCE via a
    # single-element transform (lambda vars are evaluated once;
    # inlining the trees would re-run them per reference)
    runs = F.get(
        F.transform(
            F.array(F.split(labels, "")),
            lambda chars: F.get(
                F.transform(
                    F.array(boundaries(chars)),
                    lambda b: F.zip_with(
                        F.array_prepend(b, F.lit(0).cast("long")),
                        F.array_append(b, F.length(labels).cast("long")),
                        lambda s, e: F.struct(
                            F.substring(
                                labels, (s + F.lit(1)).cast("int"), 1
                            ).alias("label"),
                            s.alias("s"),
                            e.alias("e"),
                        ),
                    ),
                ),
                0,
            ),
        ),
        0,
    )
    return F.filter(runs, lambda r: r["e"] > r["s"])


def import_label_segmentation(
    df: DataFrame,
    colordict: dict[str, str],
    labels_col: str = "labels",
) -> DataFrame:
    """REPLACE each page's segmentation from a per-char label mask
    (reference import_image_segmentation.py:96-147 loop over mask
    colors; unknown colors are skipped with a warning there — here
    unmapped labels get rtype 'unknown' so they stay auditable).

    Output: df with ``region_spans`` = one region per label run in the
    FULL kernel region schema (region_id/rtype/subtype/start/end/
    parent_id/order/score — drop-in for export_coco, gt_review_table,
    sublevels etc.; the raw label lands in ``subtype``, same contract
    as apply_coco_segmentation). Ids ``s{k:04d}``, document order.
    Narrow — zero shuffle."""
    cmap = F.create_map(
        *[F.lit(x) for kv in colordict.items() for x in kv]
    )
    runs = label_runs(F.col(labels_col))
    spans = F.transform(
        runs,
        lambda r, i: F.struct(
            F.concat(F.lit("s"), F.format_string("%04d", i.cast("int"))).alias(
                "region_id"
            ),
            F.coalesce(
                F.element_at(cmap, r["label"]), F.lit("unknown")
            ).alias("rtype"),
            r["label"].alias("subtype"),
            r["s"].alias("start"),
            r["e"].alias("end"),
            F.lit("").alias("parent_id"),
            i.cast("int").alias("order"),
            F.lit(1.0).alias("score"),
        ),
    )
    return df.withColumn("region_spans", spans)
