"""Pure-Python mirror of :mod:`..functions.sublevels` — the per-document
line/word derivation used by the single-process oracle and the
byte-identity tests (same discipline as kernel/extract.py: both sides
import ONE frozen rule; reference extract_lines.py:87-283 /
extract_words.py:90-201 are the semantics source).

Frozen rules (must match functions/sublevels.py exactly):

- words: split the region's text slice on single whitespace chars —
  the six-char ASCII class [ \\t\\n\\r\\x0b\\x0c] EXACTLY, matching
  functions/sublevels._is_ws (NOT Python ``\\s``, which also matches
  Unicode whitespace like NBSP/U+2028 and would diverge on externally
  supplied region text, e.g. replace_region_text or imported
  segmentations); offsets are the prefix sum of token lengths (+1
  separator); empty tokens (possible only at spread-grown span edges)
  are dropped AFTER the scan so surviving offsets stay exact;
- lines: fixed-width wrap of ``line_width`` consecutive words; line
  span = first word's start .. last word's end;
- ids: ``{region_id}_l{l_order:03d}`` / ``{region_id}_w{w_order:04d}``.
"""

from __future__ import annotations

import re

_WS = re.compile(r"[ \t\n\r\x0b\x0c]")


def sublevels_document(
    extracted_text: str, regions: list[dict], line_width: int = 8
) -> tuple[list[dict], list[dict]]:
    """Returns (lines, words) for one extracted document, in document
    order, with the same fields as the Spark structs."""
    all_words: list[dict] = []
    all_lines: list[dict] = []
    for r in regions:
        rid = r["region_id"]
        seg = extracted_text[r["start"] : r["end"]]
        cur = r["start"]
        spans: list[tuple[int, int]] = []
        for tok in _WS.split(seg):
            spans.append((cur, cur + len(tok)))
            cur += len(tok) + 1
        spans = [(s, e) for s, e in spans if e > s]
        words = [
            {
                "region_id": rid,
                "line_id": f"{rid}_l{i // line_width:03d}",
                "word_id": f"{rid}_w{i:04d}",
                "start": s,
                "end": e,
                "w_order": i,
            }
            for i, (s, e) in enumerate(spans)
        ]
        all_words.extend(words)
        n = len(words)
        for li in range((n + line_width - 1) // line_width):
            first = li * line_width
            last = min((li + 1) * line_width, n) - 1
            all_lines.append(
                {
                    "region_id": rid,
                    "line_id": f"{rid}_l{li:03d}",
                    "start": words[first]["start"],
                    "end": words[last]["end"],
                    "l_order": li,
                    "n_words": last - first + 1,
                }
            )
    return all_lines, all_words
