"""TextEquiv-alternative selection (P4; reference
extract_lines.py:180-193, ocrd-tool.json:401-406).

PAGE-XML segments carry a LIST of text alternatives
``TextEquiv[@index]/Unicode`` with confidences; processors select by
parameter ``first`` / ``last`` / a digit index, skipping segments
where the requested index is absent. Engine representation:
``array<struct<index:int, unicode:string, conf:double>>`` — selection
is pure column algebra (element_at / filter), no UDF.

The insert-at-0 mutation of replace_text.py:62 is ``textequiv_insert``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def textequiv_select(col: str, which: str = "first") -> Column:
    """Selected alternative struct (null if absent — callers filter,
    mirroring the reference's skip-with-warning)."""
    # try_element_at: an empty/short alternatives array yields null
    # (element_at would raise under ANSI mode — the reference SKIPS
    # segments whose index is absent, extract_lines.py:180-193)
    if which == "first":
        return F.try_element_at(F.col(col), F.lit(1))
    if which == "last":
        return F.try_element_at(F.col(col), F.lit(-1))
    if which.isdigit():
        return F.try_element_at(
            F.expr(f"filter({col}, t -> t.index = {int(which)})"), F.lit(1)
        )
    raise ValueError(f"index-selection must be first/last/digit, got {which!r}")


def textequiv_text(col: str, which: str = "first") -> Column:
    return textequiv_select(col, which).getField("unicode")


def textequiv_insert(col: str, unicode_col, conf: float = 1.0) -> Column:
    """replace_text.py:62 ``insert_TextEquiv_at(0, …)``: prepend a new
    alternative at index 0, shifting existing indices up by one."""
    shifted = F.expr(
        f"transform({col}, t -> named_struct("
        "'index', t.index + 1, 'unicode', t.unicode, 'conf', t.conf))"
    )
    new = F.struct(
        F.lit(0).alias("index"),
        (unicode_col if isinstance(unicode_col, Column) else F.col(unicode_col)).alias("unicode"),
        F.lit(conf).alias("conf"),
    )
    return F.concat(F.array(new), shifted)
