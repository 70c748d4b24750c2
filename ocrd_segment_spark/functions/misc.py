"""Small scalar functions from the reference's utility layer
(SURVEY.md §2.7 G18-G20) — pure column expressions."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def color_hex_to_rgb(col: str):
    """G18 (reference extract_pages.py:183-186): 'RRGGBB' hex → three
    int columns."""
    return (
        F.conv(F.substring(F.col(col), 1, 2), 16, 10).cast("int").alias("r"),
        F.conv(F.substring(F.col(col), 3, 2), 16, 10).cast("int").alias("g"),
        F.conv(F.substring(F.col(col), 5, 2), 16, 10).cast("int").alias("b"),
    )


def dpi_normalize(resolution: str, unit: str) -> Column:
    """G19 (reference extract_pages.py:247-252): ×2.54 when the
    resolution unit is cm."""
    return F.when(
        F.col(unit) == "cm", F.round(F.col(resolution) * 2.54)
    ).otherwise(F.col(resolution)).cast("double")


def numeric_page_id(col: str, fallback: Column | None = None) -> Column:
    """G20 (reference extract_pages.py:230-233): strip non-digits from
    a page id; fall back to a physical index when digit-free."""
    digits = F.regexp_replace(F.col(col), "[^0-9]", "")
    out = F.when(digits != "", digits.cast("long"))
    return out.otherwise(fallback) if fallback is not None else out


def colordict(categories, name_col: str = "name"):
    """S13 colordict sink (reference extract_pages.py:39-98 fixed
    type→color table; here derived): deterministic 'RRGGBB' per
    category from md5(name) — stable across engines (md5 exists in
    Spark AND DuckDB) and across partitionings."""
    color = F.upper(F.substring(F.md5(F.col(name_col).cast("binary")), 1, 6))
    return categories.select(
        F.col(name_col).alias("name"), color.alias("color")
    )
