"""Frozen parameter set for the extraction pipeline.

Analog of the reference's JSON-schema-validated processor parameters
(reference ocrd-tool.json:13-57 for ocrd-segment-repair; :287-327 for
extract-regions ``classes``). A frozen dataclass is broadcast-safe and
hashable, so the same instance parameterizes the oracle and the Spark
kernels identically — a prerequisite for byte-identical output.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractParams:
    """Parameters of the per-document extraction kernel.

    Defaults are the frozen v1 semantics; tests pin these.
    """

    # Region classes dropped from extracted_text (boilerplate).
    # Analog of extract-regions' ``classes`` allow-list inverted
    # (reference extract_regions.py:72-77).
    drop_types: tuple[str, ...] = ("nav", "header", "footer", "aside")

    # Maximum link density (linked chars / total chars) for a region to
    # survive. The north-star "link-density scoring" heuristic layer.
    max_link_density: float = 0.5

    # Minimum region text length in characters (joined tokens).
    # Analog of min-line-length (reference extract_lines.py:194-197,
    # ocrd-tool.json:380-399).
    min_region_chars: int = 2

    # Plausibilize: overlap fraction above which two regions merge
    # (reference ocrd-tool.json:38-45 plausibilize_merge_min_overlap).
    merge_min_overlap: float = 0.90

    # Simplify analog: merge surviving regions whose gap in the document
    # text is <= this many chars (reference repair.py:603-630 simplify;
    # 0 disables). 1-D re-derivation per SURVEY.md §2.7 G9.
    simplify_gap_tolerance: int = 0

    # Spread analog: grow each surviving span into the neighbor gap by
    # up to this many chars (reference repair.py:592-601; 0 disables).
    spread_chars: int = 0

    # Separator inserted between regions in extracted_text. Byte-identity
    # contract lives here (reference extract_lines.py:280-283 writes
    # trailing-newline text sinks).
    region_separator: str = "\n"

    # Attach per-region TextStyle runs (reference TextStyle struct,
    # extract_lines.py:201-219 / extract_words.py:127-145): contiguous
    # styled char ranges derived from inline HTML tags (b/strong →
    # bold, i/em → italic, code/tt/kbd/samp/pre → monospace, u →
    # underlined, s/del → strikethrough, sub/sup). Off by default:
    # additive metadata, text is byte-identical either way.
    style_spans: bool = False

    # Full TextStyle struct from inline CSS ``style=`` attributes
    # (reference extract_lines.py:201-219's 15-field vocabulary:
    # fontFamily, fontSize, kerning, serif, smallCaps, letterSpaced,
    # underlineStyle + the seven tag-derived booleans; xHeight is
    # raster-only, justified omission). Requires ``style_spans``;
    # frozen parsing rules in kernel/cssstyle.py. Off by default:
    # kernel 1.5.0, default output byte-identical (golden-pinned).
    css_styles: bool = False

    # Per-region reading direction from HTML ``dir=`` attributes —
    # the orientation/readingDirection analog (reference
    # extract_pages.py:300 page orientation; extract_words.py:150-168
    # readingDirection fallback chains). Nearest ancestor with a VALID
    # dir (ltr|rtl|auto, case-insensitive) wins; none → null =
    # unspecified. Off by default (kernel 1.5.0, additive field).
    reading_direction: bool = False

    # Emit zero-length media-region spans (image/separator/media) for
    # non-text elements, so a bare <figure><img/></figure> survives
    # extraction (reference project.py:50-65 region-type vocabulary:
    # ImageRegion/SeparatorRegion/...). Off by default: media spans are
    # additive metadata; the extracted text is byte-identical either
    # way (kernel 1.3.0).
    media_regions: bool = False

    # Preserve whitespace VERBATIM inside <pre> subtrees (code blocks,
    # ASCII tables) instead of the collapse-and-join rule — the
    # training-data fidelity knob: collapsed code loses indentation.
    # Frozen rule (kernel 1.6.0, default off, default output
    # byte-identical / golden-pinned): the whole <pre> subtree becomes
    # ONE token = its text descendants concatenated in document order
    # (NONTEXT_TAGS subtrees skipped, inline element boundaries add no
    # spaces), with \r\n and \r normalized to \n and exactly one
    # leading \n dropped (the HTML spec's post-<pre> newline rule).
    # Whitespace-only <pre> emits nothing. Inside the subtree no
    # descendant candidates, media spans, or style runs are collected
    # — the region is one run styled by the state at <pre> entry.
    preserve_pre: bool = False


DEFAULT_PARAMS = ExtractParams()
