"""Label-mask segmentation import — the 1-D graft of
``ocrd-segment-from-masks`` (reference import_image_segmentation.py:
connected equally-COLORED mask segments → region polygons, region type
looked up in ``colordict``).

Web analog: the "mask" is a label STRING aligned 1:1 with the document
text (one label char per text char — e.g. from an upstream sequence
tagger). Maximal runs of one label become regions; the label resolves
to a region type through the colordict. Everything is pure column
math: boundary positions come from one linear pass (the same
separator-position construction as functions/sublevels), the label
array is bound through a transform lambda variable so interpreted HOFs
never re-evaluate it per element (the measured CSE trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

REGION_FIELDS = "region_id string, rtype string, label string, start long, end long, `order` int"


def label_runs(labels: Column) -> Column:
    """array<struct<label string, s long, e long>> of maximal
    equal-char runs in ``labels``. Linear: boundary i is where
    char[i] != char[i+1]; starts = 0 ∪ (b+1), ends = (b+1) ∪ len."""
    # bind the char array ONCE via a single-element transform — inline
    # references inside the inner lambda would re-evaluate split() per
    # element (interpreted HOFs have no CSE)
    return F.get(
        F.transform(
            F.array(F.split(labels, "")),
            lambda chars: F.zip_with(
                F.array_prepend(
                    F.transform(
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
                    ),
                    F.lit(0).cast("long"),
                ),
                F.array_append(
                    F.transform(
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
                    ),
                    F.length(labels).cast("long"),
                ),
                lambda s, e: F.struct(
                    F.substring(labels, (s + F.lit(1)).cast("int"), 1).alias("label"),
                    s.alias("s"),
                    e.alias("e"),
                ),
            ),
        ),
        0,
    )


def _nonempty(runs: Column) -> Column:
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

    Output: df with ``region_spans`` = one region per label run,
    document order, ids ``s{k:04d}``. Narrow — zero shuffle."""
    cmap = F.create_map(
        *[F.lit(x) for kv in colordict.items() for x in kv]
    )
    runs = _nonempty(label_runs(F.col(labels_col)))
    spans = F.transform(
        runs,
        lambda r, i: F.struct(
            F.concat(F.lit("s"), F.format_string("%04d", i.cast("int"))).alias(
                "region_id"
            ),
            F.coalesce(
                F.element_at(cmap, r["label"]), F.lit("unknown")
            ).alias("rtype"),
            r["label"].alias("label"),
            r["s"].alias("start"),
            r["e"].alias("end"),
            i.cast("int").alias("order"),
        ),
    )
    return df.withColumn("region_spans", spans)
