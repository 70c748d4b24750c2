"""COCO-style detection interchange (S4 source / S9 sink,
reference import_coco_segmentation.py and extract_pages.py:177-215).

The reference accumulates ``self.images/annotations/ann_id`` mutably
across its sequential page loop (extract_pages.py:177-198) — page
order leaks into ids. Here ids come from :func:`functions.ids.ranked_ids`
(bucketed windows + cumulative bucket offsets), so output is
deterministic under any parallelism (§3.2 / §4.2 determinism row) AND
no corpus-wide single-partition sort exists anywhere in the export
plan — image and annotation ids scale with the bucket count, not one
task. Only the category vocabulary (bounded, distinct names) keeps a
plain global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.ids import ranked_ids

# order-aligned bucket for url-keyed ids: a 20-char prefix covers
# scheme+host in the corpus — per-host buckets, each a window
# partition. Tune per corpus so no host dominates (see ids.py).
_URL_BUCKET_LEN = 20


def export_coco(extracted: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(images, annotations, categories) flat tables from extraction
    output ``(url, extracted_text, region_spans, lineage)``.

    - images: (image_id, file_name, width) — width = text length
      (1-D analog of raster width, reference extract_pages.py:368-376)
    - annotations: (ann_id, image_id, category_id, start, end, area,
      score) — area = span length (reference 'area' of the polygon)
    - categories: (category_id, name) — dense ids over the observed
      vocabulary (A7, reference evaluate.py:560-567)
    """
    images = ranked_ids(
        extracted.select(
            "url", F.length("extracted_text").cast("long").alias("width")
        ),
        ["url"],
        "image_id",
        F.substring("url", 1, _URL_BUCKET_LEN),
    ).select("image_id", F.col("url").alias("file_name"), "width")
    regions = extracted.select(
        "url", F.explode("region_spans").alias("r")
    ).select(
        "url",
        F.concat(F.col("r.rtype"), F.lit("."), F.col("r.subtype")).alias("cat_name"),
        F.col("r.start").alias("start"),
        F.col("r.end").alias("end"),
        F.col("r.score").alias("score"),
        F.col("r.order").alias("ord"),
    )
    categories = (
        regions.select("cat_name").distinct()
        .select(
            F.row_number().over(W.orderBy("cat_name")).cast("long").alias("category_id"),
            F.col("cat_name").alias("name"),
        )
    )
    # categories broadcast (bounded vocabulary); images NOT broadcast —
    # one row per document, corpus-sized, so the url join is a regular
    # shuffle join (both sides key on url; at scale they co-partition).
    joined = regions.join(
        F.broadcast(categories), regions.cat_name == categories.name
    ).join(images.select("image_id", F.col("file_name").alias("url")), "url")
    annotations = ranked_ids(
        joined, ["url", "ord"], "ann_id", F.substring("url", 1, _URL_BUCKET_LEN)
    ).select(
        "ann_id",
        "image_id",
        "category_id",
        "start",
        "end",
        (F.col("end") - F.col("start")).cast("long").alias("area"),
        "score",
    )
    return images, annotations, categories


def import_coco(images: DataFrame, annotations: DataFrame) -> DataFrame:
    """S4: group annotations per image (reference
    import_coco_segmentation.py:104-131 ``setdefault().append`` →
    groupBy + sorted collect_list for determinism)."""
    return (
        annotations.join(F.broadcast(images), "image_id")
        .groupBy("image_id", "file_name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ann_id", "category_id", "start", "end", "area", "score"))
            ).alias("regions"),
            F.count("*").alias("n_regions"),
        )
    )


def unaccounted_images(images: DataFrame, annotations: DataFrame) -> DataFrame:
    """A9 (reference import_coco_segmentation.py:136-140, 215-217):
    images left over after grouping — the anti-join complement of
    import_coco, reported instead of silently dropped."""
    return images.join(
        annotations.select("image_id").distinct(), "image_id", "left_anti"
    )


def apply_coco_segmentation(
    pages: DataFrame,
    images: DataFrame,
    annotations: DataFrame,
    categories: DataFrame,
) -> DataFrame:
    """The full ``ocrd-segment-from-coco`` processor analog (reference
    import_coco_segmentation.py:104-215): REPLACE each page's
    segmentation with the imported COCO annotations.

    - images match pages by ``file_name == url`` with basename
      fallback (J4 key-fallback, reference :152-159) — pages without a
      match keep an empty segmentation, like the reference's
      log-and-skip;
    - annotations group per image (one shuffle), sorted by (start,
      ann_id) for a deterministic reading order;
    - output: pages with ``region_spans`` REPLACED by the imported
      segmentation (region ids ``a{ann_id}``, rtype = category name,
      order = position in the sorted list).

    Scale: categories broadcast (bounded vocabulary); the annotation
    groupBy and the page join both key on corpus-sized ids — they
    co-partition, no corpus-wide single-partition stage anywhere."""
    ann = annotations.join(
        F.broadcast(categories.select("category_id", F.col("name").alias("cat_name"))),
        "category_id",
    )
    grouped = ann.groupBy("image_id").agg(
        F.array_sort(
            F.collect_list(F.struct("start", "ann_id", "cat_name", "end", "score"))
        ).alias("anns")
    )
    # primary key: exact file_name; fallback: basename (reference
    # :152-159 tries imageFilename then its basename). The basename
    # fallback applies only when UNAMBIGUOUS (one image per basename) —
    # the reference resolves collisions by first-match luck; the frozen
    # rule refuses instead, so the join can never fan out. (The third,
    # numeric-pageId level of the reference chain is the J4 pattern,
    # contract.q_j4_key_fallback_join.)
    # LEFT join: uniqueness must be judged over ALL images, not only
    # annotated ones — a file_name shared by several images where just
    # one happens to carry annotations is still ambiguous (which image
    # did the annotator mean?) and must be refused, not silently
    # matched. Unannotated survivors carry anns = NULL and fall through
    # coalesce() to the empty segmentation below.
    img = images.select("image_id", "file_name").join(grouped, "image_id", "left")
    # file_name is NOT a key in COCO (image_id is) — merged annotation
    # files can repeat it; an unguarded join would fan pages out. Same
    # unambiguous-only rule as the basename level.
    by_name = (
        img.select(F.col("file_name").alias("url"), "anns")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n"), F.first("anns").alias("anns"))
        .filter(F.col("n") == 1)
        .drop("n")
    )
    base = F.element_at(F.split(F.col("file_name"), "/"), -1)
    by_base = (
        img.select(base.alias("burl"), "anns")
        .groupBy("burl")
        .agg(F.count(F.lit(1)).alias("n"), F.first("anns").alias("anns_base"))
        .filter(F.col("n") == 1)
        .drop("n")
    )
    direct = pages.join(by_name, "url", "left")
    direct = direct.join(
        by_base,
        F.element_at(F.split(F.col("url"), "/"), -1) == F.col("burl"),
        "left",
    ).drop("burl")
    spans = F.transform(
        F.coalesce(
            F.col("anns"),
            F.col("anns_base"),
            F.expr(
                "CAST(array() AS ARRAY<STRUCT<start: BIGINT, ann_id: BIGINT,"
                " cat_name: STRING, end: BIGINT, score: DOUBLE>>)"
            ),
        ),
        lambda a, i: F.struct(
            F.concat(F.lit("a"), a["ann_id"].cast("string")).alias("region_id"),
            a["cat_name"].alias("rtype"),
            F.lit("coco").alias("subtype"),
            a["start"].cast("long").alias("start"),
            a["end"].cast("long").alias("end"),
            F.lit("").alias("parent_id"),
            i.cast("int").alias("order"),
            a["score"].cast("double").alias("score"),
        ),
    )
    return direct.withColumn("region_spans", spans).drop("anns", "anns_base")
