"""Inline-CSS TextStyle parsing — kernel 1.5.0, param-gated
(``ExtractParams.css_styles``, default OFF per the golden-digest
invariant).

The reference emits a 15-field TextStyle struct per segment
(reference extract_lines.py:201-219, identical in
extract_words.py:127-145): fontFamily, fontSize, xHeight, kerning,
serif, monospace, bold, italic, smallCaps, letterSpaced,
strikethrough, underlined, underlineStyle, subscript, superscript.
The web graft derives the same vocabulary from ``style=`` attributes;
xHeight is a raster-only measurement (pixel height of 'x' glyphs) with
no HTML source — the one justified omission.

Everything here is FROZEN: malformed CSS never raises, unknown
properties/units are ignored, and the same rules run in the Spark
kernel and the single-process oracle (both import this module).

Frozen property rules:

- font-weight: bold | bolder | numeric ≥ 600 sets bold;
  normal | lighter | numeric < 600 CLEARS it (an inline
  ``font-weight: normal`` un-bolds an enclosing <b> — CSS override
  semantics, unlike the tag mask's cumulative OR).
- font-style: italic | oblique set; normal clears.
- text-decoration / text-decoration-line: underline / line-through
  set their bits; none clears both; shorthand line-style tokens
  (solid dotted dashed wavy double) set underlineStyle.
- text-decoration-style: sets underlineStyle.
- vertical-align: sub / super set subscript / superscript (mutually
  exclusive); baseline clears both.
- font-family: first comma-separated family (quotes stripped,
  whitespace trimmed, original case kept) becomes fontFamily; any
  generic family token ``monospace`` sets the monospace bit;
  ``serif`` / ``sans-serif`` tokens set serif True / False.
- font-size: absolute units only — px × 0.75 → pt, pt as-is,
  rounded to 2 decimals; relative units (em, %, rem, keywords) are
  ignored (no layout context to resolve them).
- font-variant / font-variant-caps: small-caps sets smallCaps;
  normal clears it.
- letter-spacing: normal or a zero length → False; any other length
  → True.
- font-kerning: normal → True; none → False.
"""

from __future__ import annotations

import re
from functools import lru_cache

# TextStyle bits (reference field vocabulary, extract_words.py:127-145).
STYLE_BOLD, STYLE_ITALIC, STYLE_MONO = 1, 2, 4
STYLE_UNDER, STYLE_STRIKE, STYLE_SUB, STYLE_SUP = 8, 16, 32, 64

STYLE_FLAG_NAMES = (
    (STYLE_BOLD, "bold"),
    (STYLE_ITALIC, "italic"),
    (STYLE_MONO, "monospace"),
    (STYLE_UNDER, "underlined"),
    (STYLE_STRIKE, "strikethrough"),
    (STYLE_SUB, "subscript"),
    (STYLE_SUP, "superscript"),
)

STYLE_TAGS = {
    "b": STYLE_BOLD,
    "strong": STYLE_BOLD,
    "i": STYLE_ITALIC,
    "em": STYLE_ITALIC,
    "code": STYLE_MONO,
    "tt": STYLE_MONO,
    "kbd": STYLE_MONO,
    "samp": STYLE_MONO,
    "pre": STYLE_MONO,
    "u": STYLE_UNDER,
    "s": STYLE_STRIKE,
    "del": STYLE_STRIKE,
    "sub": STYLE_SUB,
    "sup": STYLE_SUP,
}

# css state tuple layout: (mask, font_family, font_size,
# underline_style, small_caps, letter_spaced, serif, kerning)
CSS_DEFAULT = (0, None, None, None, None, None, None, None)

_NUM_RE = re.compile(r"^([0-9]+(?:\.[0-9]+)?)\s*(px|pt)$")
_DECO_LINE = {"underline": STYLE_UNDER, "line-through": STYLE_STRIKE}
_DECO_STYLE = frozenset("solid dotted dashed wavy double".split())


def _first_family(value: str) -> tuple[str | None, bool, bool | None]:
    """(fontFamily, monospace, serif) from a font-family value."""
    family = None
    mono = False
    serif: bool | None = None
    for part in value.split(","):
        name = part.strip().strip("'\"").strip()
        if not name:
            continue
        low = name.lower()
        if family is None and low not in ("inherit", "initial", "unset"):
            family = name
        if low == "monospace":
            mono = True
        elif low == "serif":
            serif = True
        elif low == "sans-serif":
            serif = False
    return family, mono, serif


@lru_cache(maxsize=4096)
def parse_css_style(style_text: str):
    """Parse one ``style=`` attribute value into
    ``(set_mask, clear_mask, overrides)`` where overrides is a dict
    holding only the EXPLICITLY specified non-mask fields
    (font_family, font_size, underline_style, small_caps,
    letter_spaced, serif, kerning). Never raises; cached because
    boilerplate repeats the same strings across a corpus."""
    set_mask = 0
    clear_mask = 0
    overrides: dict = {}

    # CSS is last-declaration-wins PER PROPERTY: a later set must undo
    # an earlier clear of the same bit (and vice versa). Accumulating
    # the two masks independently made clear-over-set order-blind —
    # 'font-weight: normal; font-weight: bold' came out not-bold.
    def _set(bits):
        nonlocal set_mask, clear_mask
        set_mask |= bits
        clear_mask &= ~bits

    def _clr(bits):
        nonlocal set_mask, clear_mask
        clear_mask |= bits
        set_mask &= ~bits

    for decl in style_text.split(";"):
        if ":" not in decl:
            continue
        prop, _, value = decl.partition(":")
        prop = prop.strip().lower()
        value = re.sub(r"\s*!\s*important\s*$", "", value.strip(), flags=re.I)
        if prop != "font-family":
            value = value.lower()
        if not value:
            continue
        if prop == "font-weight":
            if value in ("bold", "bolder"):
                _set(STYLE_BOLD)
            elif value in ("normal", "lighter"):
                _clr(STYLE_BOLD)
            elif value.isdigit():
                if int(value) >= 600:
                    _set(STYLE_BOLD)
                else:
                    _clr(STYLE_BOLD)
        elif prop == "font-style":
            if value == "italic" or value.startswith("oblique"):
                _set(STYLE_ITALIC)
            elif value == "normal":
                _clr(STYLE_ITALIC)
        elif prop in ("text-decoration", "text-decoration-line"):
            if value == "none":
                _clr(STYLE_UNDER | STYLE_STRIKE)
            else:
                for tok in value.split():
                    if tok in _DECO_LINE:
                        _set(_DECO_LINE[tok])
                    elif tok in _DECO_STYLE:
                        overrides["underline_style"] = tok
        elif prop == "text-decoration-style":
            if value in _DECO_STYLE:
                overrides["underline_style"] = value
        elif prop == "vertical-align":
            if value == "sub":
                _set(STYLE_SUB)
                _clr(STYLE_SUP)
            elif value == "super":
                _set(STYLE_SUP)
                _clr(STYLE_SUB)
            elif value == "baseline":
                _clr(STYLE_SUB | STYLE_SUP)
        elif prop == "font-family":
            family, mono, serif = _first_family(value)
            if family is not None:
                overrides["font_family"] = family
            if mono:
                _set(STYLE_MONO)
            if serif is not None:
                overrides["serif"] = serif
        elif prop == "font-size":
            m = _NUM_RE.match(value)
            if m:
                num = float(m.group(1))
                pt = num * 0.75 if m.group(2) == "px" else num
                overrides["font_size"] = round(pt, 2)
        elif prop in ("font-variant", "font-variant-caps"):
            if "small-caps" in value.split():
                overrides["small_caps"] = True
            elif value == "normal":
                overrides["small_caps"] = False
        elif prop == "letter-spacing":
            if value == "normal" or re.fullmatch(
                r"0(?:\.0+)?\s*[a-z%]*", value
            ):
                overrides["letter_spaced"] = False
            else:
                overrides["letter_spaced"] = True
        elif prop == "font-kerning":
            if value == "normal":
                overrides["kerning"] = True
            elif value == "none":
                overrides["kerning"] = False
    return set_mask, clear_mask, overrides


_OVERRIDE_SLOTS = (
    "font_family", "font_size", "underline_style",
    "small_caps", "letter_spaced", "serif", "kerning",
)


def apply_css(state: tuple, style_text: str | None) -> tuple:
    """Fold one element's ``style=`` attribute into the inherited css
    state tuple (see CSS_DEFAULT layout). None/empty → unchanged."""
    if not style_text:
        return state
    set_mask, clear_mask, overrides = parse_css_style(style_text)
    if not set_mask and not clear_mask and not overrides:
        return state
    mask = (state[0] | set_mask) & ~clear_mask
    rest = [
        overrides.get(name, state[i + 1])
        for i, name in enumerate(_OVERRIDE_SLOTS)
    ]
    return (mask, *rest)
