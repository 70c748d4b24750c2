"""Image–text pair harvesting: the multimodal lane's candidate table.

CLIP-style image-text training data starts exactly here: every page's
``<img src alt>`` pairs plus its OpenGraph hero image
(``og:image`` captioned by ``og:title``), resolved to absolute urls —
the fetch list whose downloaded bytes the multimodal column machinery
(functions/multimodal: typed metadata, magic-byte sniff, stubbed
decode) then processes. The reference's derived-image lane
(/root/reference/ocrd_segment/extract_pages.py exports per-region
images alongside text) is the segmentation-era analog: text paired
with the raster it describes.

Frozen grammar + rule (stated so the DuckDB oracle restates it 1:1):

  - image tags are ``(?is)<img[ \\t\\n\\r/][^>]*>`` whole matches —
    the linkgraph whole-anchor-tag discipline ('<img' + non-letter,
    so ``<imgx>`` never matches);
  - ``src`` / ``alt`` are attribute values REQUIRING a leading
    whitespace-class char before the name (``data-src=`` and
    ``lowsrc=`` must not match; ``srcset=`` cannot match because the
    pattern demands ``="`` right after the name), first occurrence
    wins, either order;
  - ``alt_text`` is whitespace-normalized and NULL when absent or
    empty (a decorative ``alt=""`` is not a caption);
  - ``image_url`` resolves under the SAME frozen rule as canonical
    hrefs (absolute kept, protocol-relative gains the page scheme,
    rooted paths rebase on the page origin, anything else drops —
    operators/headmeta.resolved_canonical_sql); unresolvable srcs
    emit no row;
  - one extra row per page carrying ``og:image`` (source 'og',
    img_idx NULL) captioned by ``og:title``, resolved the same way —
    publishers curate the hero image, so it is the highest-precision
    pair on the page.

Scale shape (100 TB): scan-stage column math — one
``regexp_extract_all`` + ``posexplode`` per page plus two meta probes;
zero Python, zero shuffle. The output is a FETCH LIST (urls + captions,
no bytes); image bytes stay out of the text pipeline's shuffle paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .headmeta import (
    _ABS_HOST,
    _PROP_OG,
    _SCHEME,
    _meta_pair,
    resolved_canonical_sql,
)

IMG_TAG = "(?is)<[Ii][Mm][Gg][ \\t\\n\\r/][^>]*>"
SRC_ATTR = '[ \\t\\n\\r][Ss][Rr][Cc]="([^"]*)"'
ALT_ATTR = '[ \\t\\n\\r][Aa][Ll][Tt]="([^"]*)"'
# the explicit shared-subset whitespace class (the repo-wide \s trap)
_WS = "[ \\t\\n\\r]+"


def image_pairs(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, source, img_idx, image_url, alt_text) — one row per
    ``<img>`` with a resolvable src (source 'img', 0-based img_idx in
    document order over ALL img tags, resolvable or not) plus one
    og:image row per declaring page (source 'og', img_idx NULL,
    alt_text = og:title)."""
    h = f"cast({html_col} as string)"
    scheme = f"lower(regexp_extract(url, '{_SCHEME}', 1))"
    host = f"lower(regexp_extract(url, '{_ABS_HOST}', 1))"

    base = df.selectExpr(f"{url_col} as url", f"{h} as __h")
    imgs = base.select(
        "url",
        F.posexplode(
            F.expr(f"regexp_extract_all(__h, '{IMG_TAG}', 0)")
        ).alias("img_idx", "__tag"),
    ).selectExpr(
        "url",
        "img_idx",
        f"nullif(regexp_extract(__tag, '{SRC_ATTR}', 1), '') as __src",
        f"nullif(trim(regexp_replace("
        f"  regexp_extract(__tag, '{ALT_ATTR}', 1), '{_WS}', ' ')), '')"
        " as alt_text",
    )
    img_rows = (
        imgs.withColumn(
            "image_url",
            F.expr(resolved_canonical_sql("__src", scheme, host)),
        )
        .filter(F.col("image_url").isNotNull())
        .select(
            "url",
            F.lit("img").alias("source"),
            "img_idx",
            "image_url",
            "alt_text",
        )
    )
    og = base.selectExpr(
        "url",
        f"{_meta_pair('__h', _PROP_OG.format(field='image'))} as __src",
        f"{_meta_pair('__h', _PROP_OG.format(field='title'))} as alt_text",
    )
    og_rows = (
        og.withColumn(
            "image_url",
            F.expr(resolved_canonical_sql("__src", scheme, host)),
        )
        .filter(F.col("image_url").isNotNull())
        .select(
            "url",
            F.lit("og").alias("source"),
            F.lit(None).cast("int").alias("img_idx"),
            "image_url",
            "alt_text",
        )
    )
    return img_rows.unionByName(og_rows)


# ---------------------------------------------------------------------------
# figure captions + caption quality: the LAION-style pair screen
# ---------------------------------------------------------------------------

FIGURE_BLOCK = "(?is)<figure(?:>|[ \\t\\n\\r][^>]*>).*?</figure>"
FIGCAPTION = "(?is)<figcaption(?:>|[ \\t\\n\\r][^>]*>)(.*?)</figcaption>"

MIN_CAPTION_CHARS = 5
GENERIC_CAPTIONS = (
    "image", "photo", "picture", "img", "logo", "icon",
    "thumbnail", "banner",
)
# IMG_1234 / DSC0042 / screenshot-7 shapes, or a bare filename
FILENAME_LIKE = (
    "^(img|image|dsc|dscn|photo|pic|screenshot)[ _-]?[0-9]+$"
)
FILENAME_EXT = "\\.(jpe?g|png|gif|webp|bmp)$"


def figure_pairs(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, source='fig', img_idx, image_url, alt_text) — one row per
    ``<figure>`` block carrying BOTH an img src and a figcaption: the
    author-written caption, higher-precision than alt text. img_idx is
    the 0-based FIGURE ordinal; the caption runs through the shared
    cell-cleanup chain (tags inside figcaption are markup); src
    resolution and attribute guards are identical to
    :func:`image_pairs`. Scan-stage column math, zero shuffle."""
    from .tables import clean_cell_text

    h = f"cast({html_col} as string)"
    scheme = f"lower(regexp_extract(url, '{_SCHEME}', 1))"
    host = f"lower(regexp_extract(url, '{_ABS_HOST}', 1))"
    base = df.selectExpr(f"{url_col} as url", f"{h} as __h")
    figs = base.select(
        "url",
        F.posexplode(
            F.expr(f"regexp_extract_all(__h, '{FIGURE_BLOCK}', 0)")
        ).alias("img_idx", "__fig"),
    ).selectExpr(
        "url",
        "img_idx",
        f"nullif(regexp_extract(__fig, '{SRC_ATTR}', 1), '') as __src",
        f"nullif(regexp_extract(__fig, '{FIGCAPTION}', 1), '') as __cap",
    )
    return (
        figs.withColumn(
            "image_url",
            F.expr(resolved_canonical_sql("__src", scheme, host)),
        )
        .withColumn(
            "alt_text",
            F.nullif(clean_cell_text(F.col("__cap")), F.lit("")),
        )
        .filter(
            F.col("image_url").isNotNull() & F.col("alt_text").isNotNull()
        )
        .select(
            "url",
            F.lit("fig").alias("source"),
            "img_idx",
            "image_url",
            "alt_text",
        )
    )


def with_caption_quality(pairs: DataFrame) -> DataFrame:
    """Append ``caption_ok`` to a pair table: the LAION-style screen
    that keeps only captions worth training on. Frozen rule on the
    lowercased trimmed caption:

    - NULL or under ``MIN_CAPTION_CHARS`` (5) → false;
    - a ``GENERIC_CAPTIONS`` member ('image', 'logo', …) → false;
    - filename-like → false: the camera-roll shape
      (``FILENAME_LIKE``: IMG_1234, DSC0042, screenshot-7) or any
      caption ENDING in a raster extension (``FILENAME_EXT``);
    - everything else → true.

    Pure column math; the flag rides the table so consumers count
    drops before fetching a single image byte."""
    c = F.lower(F.trim(F.col("alt_text")))
    generic = c.isin(*GENERIC_CAPTIONS)
    bad = (
        F.col("alt_text").isNull()
        | (F.length(c) < MIN_CAPTION_CHARS)
        | generic
        | c.rlike(FILENAME_LIKE)
        | c.rlike(FILENAME_EXT)
    )
    return pairs.withColumn("caption_ok", ~bad)
