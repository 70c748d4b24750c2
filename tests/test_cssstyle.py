"""Frozen inline-CSS TextStyle rules (kernel/cssstyle.py, kernel
1.5.0) — the reference's 15-field TextStyle vocabulary
(extract_lines.py:201-219) derived from ``style=`` attributes."""

from hypothesis import given, settings, strategies as st

from ocrd_segment_spark.kernel.cssstyle import (
    CSS_DEFAULT,
    STYLE_BOLD,
    STYLE_ITALIC,
    STYLE_MONO,
    STYLE_STRIKE,
    STYLE_SUB,
    STYLE_SUP,
    STYLE_UNDER,
    apply_css,
    parse_css_style,
)


def _state(css_text, base=CSS_DEFAULT):
    return apply_css(base, css_text)


def test_font_weight_set_and_clear():
    assert _state("font-weight: bold")[0] == STYLE_BOLD
    assert _state("font-weight: 700")[0] == STYLE_BOLD
    assert _state("font-weight: 600")[0] == STYLE_BOLD
    assert _state("font-weight: 599")[0] == 0
    assert _state("font-weight: normal")[0] == 0
    # explicit normal CLEARS an inherited bold (CSS override semantics)
    bolded = (STYLE_BOLD, *CSS_DEFAULT[1:])
    assert _state("font-weight: normal", bolded)[0] == 0
    assert _state("font-weight: normal !important", bolded)[0] == 0


def test_font_style_and_decoration():
    assert _state("font-style: italic")[0] == STYLE_ITALIC
    assert _state("font-style: oblique 10deg")[0] == STYLE_ITALIC
    assert _state("text-decoration: underline")[0] == STYLE_UNDER
    s = _state("text-decoration: underline line-through wavy")
    assert s[0] == STYLE_UNDER | STYLE_STRIKE and s[3] == "wavy"
    assert _state("text-decoration-style: dotted")[3] == "dotted"
    cleared = _state(
        "text-decoration: none", (STYLE_UNDER | STYLE_STRIKE, *CSS_DEFAULT[1:])
    )
    assert cleared[0] == 0


def test_vertical_align_exclusive():
    assert _state("vertical-align: sub")[0] == STYLE_SUB
    # super replaces an inherited sub, and baseline clears both
    assert _state("vertical-align: super", (STYLE_SUB, *CSS_DEFAULT[1:]))[0] == STYLE_SUP
    assert _state("vertical-align: baseline", (STYLE_SUP, *CSS_DEFAULT[1:]))[0] == 0


def test_font_family_rules():
    s = _state("font-family: Georgia, 'Times New Roman', serif")
    assert s[1] == "Georgia" and s[6] is True and not (s[0] & STYLE_MONO)
    s = _state('font-family: "Fira Code", monospace')
    assert s[1] == "Fira Code" and (s[0] & STYLE_MONO)
    assert _state("font-family: Arial, sans-serif")[6] is False


def test_font_size_units():
    assert _state("font-size: 16px")[2] == 12.0
    assert _state("font-size: 10.5pt")[2] == 10.5
    assert _state("font-size: 1.2em")[2] is None   # relative: ignored
    assert _state("font-size: larger")[2] is None


def test_variant_spacing_kerning():
    assert _state("font-variant: small-caps")[4] is True
    assert _state("font-variant-caps: small-caps")[4] is True
    assert _state("letter-spacing: 2px")[5] is True
    assert _state("letter-spacing: normal")[5] is False
    assert _state("letter-spacing: 0px")[5] is False
    assert _state("font-kerning: normal")[7] is True
    assert _state("font-kerning: none")[7] is False


def test_inheritance_and_override_chain():
    parent = _state("font-family: Georgia, serif; font-size: 12pt")
    child = apply_css(parent, "font-size: 16px; font-weight: bold")
    assert child[1] == "Georgia"      # family inherited
    assert child[2] == 12.0           # size overridden (16px -> 12pt)
    assert child[0] == STYLE_BOLD


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_never_raises_and_caches_consistently(garbage):
    a = parse_css_style(garbage)
    assert a == parse_css_style(garbage)
    st2 = apply_css(CSS_DEFAULT, garbage)
    assert isinstance(st2, tuple) and len(st2) == 8


def test_duplicate_declarations_last_wins():
    """CSS is last-declaration-wins per property: a later set must undo
    an earlier clear of the same bit and vice versa (review-found:
    clear-over-set made 'font-weight: normal; font-weight: bold'
    resolve not-bold)."""
    from ocrd_segment_spark.kernel.cssstyle import (
        STYLE_BOLD,
        STYLE_UNDER,
        parse_css_style,
    )

    sm, cm, _ = parse_css_style("font-weight: normal; font-weight: bold")
    assert sm & STYLE_BOLD and not cm & STYLE_BOLD
    sm, cm, _ = parse_css_style("font-weight: bold; font-weight: normal")
    assert cm & STYLE_BOLD and not sm & STYLE_BOLD
    sm, cm, _ = parse_css_style(
        "text-decoration: none; text-decoration: underline"
    )
    assert sm & STYLE_UNDER and not cm & STYLE_UNDER
    sm, cm, _ = parse_css_style(
        "text-decoration: underline; text-decoration: none"
    )
    assert cm & STYLE_UNDER and not sm & STYLE_UNDER
