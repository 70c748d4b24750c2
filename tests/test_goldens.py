"""Committed golden digest — the anti-drift lock.

Byte-identity tests compare Spark vs the oracle, but both import the
same kernel, so an accidental semantic change would drift BOTH sides
silently. This digest pins the frozen kernel semantics (parser,
normalization, repair decisions, serialization order) for the
200-page seed-42 corpus. If it changes, that is a DELIBERATE kernel
version bump: update KERNEL_VERSION and this constant in the same
commit, and say why.

Digest history:
- kernel 1.1.0 (fixtures v2): d4602d8d…  (regex parser, struct class)
- kernel 1.1.0 (fixtures v3): df6c272a…  (unicode class added)
- kernel 1.1.1 (fixtures v3): df6c272a…  (same digest; self-closing-tag
  crash fix touches only inputs outside the golden corpus)
- kernel 1.2.0 (fixtures v3): df6c272a…  (same digest; parent_id now
  resolves to the nearest KEPT ancestor — referential integrity fix;
  no golden-corpus page has a dropped candidate between a kept child
  and its kept ancestor, so the digest is unchanged)
- kernel 1.3.0 (fixtures v3): df6c272a…  (same digest; media-region
  spans are gated behind params.media_regions, default OFF — default
  output is bit-identical, verified by this test)
- kernel 1.4.0 (fixtures v3): df6c272a…  (same digest; TextStyle runs
  gated behind params.style_spans, default OFF)
- kernel 1.5.0 (fixtures v3): df6c272a…  (same digest, and the
  full-params digest 1f29a173… is ALSO unchanged; inline-CSS TextStyle
  fields gated behind params.css_styles, default OFF — the css path
  gets its own third digest below over a styled mini-corpus, since the
  fixture corpus carries no style= attributes)
- kernel 1.5.1 (fixtures v3): df6c272a…  (same digest; full-params and
  css digests also unchanged — two review-found bug FIXES inside gated
  paths whose pinned corpora are unaffected: the fast parser's
  unquoted attribute values no longer truncate at '=', matching
  html.parser; and duplicate CSS declarations of one property now
  resolve last-declaration-wins instead of clear-over-set. Version
  bumped so lineage.kernel_version distinguishes outputs for pages
  that DO hit those cases)
- kernel 1.5.2 (fixtures v3): df6c272a…  (same digest; closes the rest
  of the attr-grammar gap found by a second review pass: '=' runs
  collapse, empty unquoted values yield '', and the fast tokenizer
  tolerates lone quotes inside unquoted values — all matching
  html.parser, verified case-by-case in tests/test_fastparse.py)
- kernel 1.5.3 (fixtures v3): df6c272a…  (same digest; deep fuzz found
  the self-close rule diverging from html.parser when '/' follows a
  bare attribute NAME — `<h2 disabled/>` now self-closes like the
  stdlib; the two remaining garbage-only recovery boundaries are
  documented in htmlparse_fast.py instead of chased)
- kernel 1.5.4 (fixtures v3): df6c272a…  (same digest; round-3 advice:
  a trailing '/' after a SPACED '=value' (`<div href = foo/>`) now
  binds to the value like html.parser instead of self-closing — valid
  HTML, not garbage, so the rule is aligned rather than documented;
  the fixture corpus carries no spaced-'=' self-close patterns, so
  all three digests are unchanged)
- kernel 1.5.5 (fixtures v3): df6c272a…  (same digest; review found
  1.5.4's value class excluded quotes, so `<a title=don't/>` wrongly
  self-closed — html.parser only rejects values STARTING with a quote;
  the rule now uses a lookahead. 23 slash-binding shapes re-validated
  against html.parser case-by-case; fixtures unaffected)
- kernel 1.6.0 (fixtures v3): df6c272a…  (same digest — new behavior
  is param-gated default-off per the invariant: params.preserve_pre
  extracts <pre> subtrees as ONE verbatim-whitespace token instead of
  collapse-and-join; default params never enter the new branch, and
  the full-params/css digests below exercise style_spans/css_styles
  only, so all three digests are unchanged)
"""

import hashlib
import os
import subprocess
import sys

from ocrd_segment_spark import KERNEL_VERSION
from ocrd_segment_spark.fixtures import FIXTURES_VERSION, gen_pages
from ocrd_segment_spark.oracle import extract_corpus

GOLDEN_SHA256 = "df6c272a0a81b345a634cc49ec0368d56e30a0ca9fe79ae806ba190bbc9534fa"
GOLDEN_KERNEL = "1.6.0"
GOLDEN_FIXTURES = 3


def corpus_digest(n_pages: int = 200, seed: int = 42) -> str:
    out = extract_corpus(gen_pages(n_pages, seed))
    h = hashlib.sha256()
    for r in sorted(out, key=lambda r: r["url"]):
        h.update(r["url"].encode())
        h.update(b"\x00")
        h.update(r["extracted_text"].encode())
        h.update(b"\x00")
        for sp in r["region_spans"]:
            h.update(
                repr(
                    (sp["region_id"], sp["rtype"], sp["subtype"], sp["start"],
                     sp["end"], sp["parent_id"], sp["order"], sp["score"])
                ).encode()
            )
    return h.hexdigest()


def test_golden_digest_pins_kernel_semantics():
    assert (KERNEL_VERSION, FIXTURES_VERSION) == (GOLDEN_KERNEL, GOLDEN_FIXTURES), (
        "kernel/fixtures version changed — recompute GOLDEN_SHA256 deliberately"
    )
    assert corpus_digest() == GOLDEN_SHA256


def test_digest_stable_across_hash_seeds():
    """No dict/set iteration order leaks into output: identical digest
    under different PYTHONHASHSEED values (fresh interpreters)."""
    code = (
        "import sys; sys.path.insert(0, {!r}); "
        "from tests.test_goldens import corpus_digest; print(corpus_digest(60))"
    ).format(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    digests = set()
    for seed in ("0", "12345", "random"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=120,
        )
        assert out.returncode == 0, out.stderr[-500:]
        digests.add(out.stdout.strip().splitlines()[-1])
    assert len(digests) == 1, digests


# Second digest: the ADDITIVE kernel surfaces (media regions + style
# runs, kernel 1.3/1.4) over the same corpus — params on, style_runs
# and media spans folded into the hash. Pins the new paths against
# drift the default-params digest cannot see.
GOLDEN_SHA256_FULL = "1f29a173bbb423299c7eefca8e3f5a723d058a7ec87d6fb355bad3594993e7a6"


def corpus_digest_full(n_pages: int = 200, seed: int = 42) -> str:
    from ocrd_segment_spark.config import ExtractParams
    from ocrd_segment_spark.kernel.extract import extract_document

    params = ExtractParams(media_regions=True, style_spans=True)
    h = hashlib.sha256()
    for r in sorted(gen_pages(n_pages, seed), key=lambda r: r["url"]):
        text, regions, _ = extract_document(r["html"], params)
        h.update(r["url"].encode())
        h.update(b"\x00")
        h.update(text.encode())
        for sp in regions:
            h.update(
                repr(
                    (sp["region_id"], sp["rtype"], sp["subtype"], sp["start"],
                     sp["end"], sp["parent_id"], sp["order"], sp["score"],
                     sorted(map(tuple, (run.items() for run in sp.get("style_runs", [])))))
                ).encode()
            )
    return h.hexdigest()


def test_golden_digest_full_pins_additive_surfaces():
    assert corpus_digest_full() == GOLDEN_SHA256_FULL


# Third digest: the inline-CSS TextStyle path (kernel 1.5.0,
# params.css_styles). The fixture corpus carries no style= attributes,
# so this digest runs over a deterministic styled mini-corpus that
# exercises every frozen CSS rule (kernel/cssstyle.py): weight
# set/clear, sizes px/pt, families incl. generic tokens, decoration
# lines+styles, vertical-align, small-caps, letter-spacing, kerning.
GOLDEN_SHA256_CSS = "fcfc987ab02f7f308058f7ce0cfd670ec0ec9f6843c76729dc050963c513bb9d"

_CSS_PAGES = [
    '<html><body><p>plain <b style="font-family: Georgia, serif; '
    'font-size: 16px">serif georgia</b> tail</p></body></html>',
    '<html><body><p><span style="font-weight: 700; font-variant: '
    "small-caps; letter-spacing: 0.1em\">caps spaced</span> and "
    '<b style="font-weight: normal !important">unbolded</b></p></body></html>',
    '<html><body><p><u style="text-decoration-style: dashed">dashed '
    'underline</u> <s>struck</s> <span style="text-decoration: '
    'line-through wavy">wavy strike</span></p></body></html>',
    '<html><body><p><span style="vertical-align: sub">subscripted '
    'bit</span> <sup style="vertical-align: baseline">cleared sup</sup> '
    '<code style="font-family: \'Fira Code\', monospace; font-size: '
    '10pt; font-kerning: none">mono fira</code></p></body></html>',
    '<html><body><div style="font-style: italic"><p>inherited italic '
    '<em style="font-style: normal">unitalic</em> words</p></div>'
    "</body></html>",
]


def corpus_digest_css() -> str:
    from ocrd_segment_spark.config import ExtractParams
    from ocrd_segment_spark.kernel.extract import extract_document

    params = ExtractParams(style_spans=True, css_styles=True)
    h = hashlib.sha256()
    for i, html in enumerate(_CSS_PAGES):
        text, regions, _ = extract_document(html.encode(), params)
        h.update(f"css{i}".encode())
        h.update(b"\x00")
        h.update(text.encode())
        for sp in regions:
            h.update(
                repr(
                    (sp["region_id"], sp["start"], sp["end"],
                     sorted(map(tuple, (run.items() for run in sp.get("style_runs", [])))))
                ).encode()
            )
    return h.hexdigest()


def test_golden_digest_css_pins_style_parsing():
    assert corpus_digest_css() == GOLDEN_SHA256_CSS
