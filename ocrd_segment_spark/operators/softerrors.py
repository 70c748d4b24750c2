"""Soft-404 / error-page detection: pages that answer 200 but carry
an error body.

Real crawls are full of them — misconfigured hosts return HTTP 200
for missing resources, so the status column alone under-counts dead
urls (Bar-Yossef et al., "Sic Transit Gloria Telae", WWW 2004,
measured the phenomenon; the practical filter every pipeline ships is
a phrase heuristic over title/body, which is what this module
freezes). Down-stream consumers: the corpus funnel (drop before the
expensive python stages — an error page is never training data) and
the frontier (hosts with high soft-404 *rates* are link-rot farms
whose outstanding urls should be deprioritized).

Frozen rule (stated so the DuckDB oracle restates it 1:1; every
phrase is matched on the LOWERCASED text with plain substring
``instr`` — no regex, so no engine-dialect risk):

  - ``title_hit``: the lowercased title contains any of
    ``TITLE_PHRASES`` ('404', 'page not found', 'not found',
    'file not found', 'error 4'); titles are short and
    deliberately descriptive, so matching is aggressive.
  - ``body_hit``: the lowercased FIRST 2000 characters of the body
    contain any of ``BODY_PHRASES`` ('not found', 'does not exist',
    'no longer available', 'error 404'); bodies legitimately discuss
    404s (documentation, blog posts), so the body arm alone never
    decides —
  - ``is_soft404`` = ``title_hit`` OR (``body_hit`` AND the body is
    TINY, < ``SOFT404_MAX_CHARS`` = 512 characters). Error pages are
    template-sized; a 30 KB article that mentions "does not exist"
    is content.
  - NULL title/text behave as non-matching (empty page with a '404'
    title is still a hit; NULL-safe via coalesce to '').

Scale shape (100 TB): pure scan-stage column math — a handful of
``instr`` probes on two short prefixes per row, zero Python, zero
shuffle. :func:`soft404_host_rates` adds ONE partial-aggregable
group on host. Reference analog: this is the web-document twin of
the reference's plausibility screen (ocrd_segment/repair.py's
"drop implausible regions" gate) applied at page grain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TITLE_PHRASES = (
    "404",
    "page not found",
    "not found",
    "file not found",
    "error 4",
)

BODY_PHRASES = (
    "not found",
    "does not exist",
    "no longer available",
    "error 404",
)

SOFT404_MAX_CHARS = 512
BODY_WINDOW_CHARS = 2000


def _any_phrase(col: Column, phrases: tuple[str, ...]) -> Column:
    """OR-chain of plain substring probes over an already-lowercased
    column — instr, not regex, so both engines agree by construction."""
    hit = F.lit(False)
    for p in phrases:
        hit = hit | (F.instr(col, p) > 0)
    return hit


def with_soft404(
    df: DataFrame,
    text_col: str = "text",
    title_col: str = "title",
) -> DataFrame:
    """Append (soft404_title_hit, soft404_body_hit, is_soft404) per
    the frozen rule above. ``title_col`` may be absent from ``df``
    (pass ``title_col=None``): the title arm is then constant false
    and only the tiny-body arm can fire."""
    if title_col is not None and title_col in df.columns:
        t = F.lower(F.coalesce(F.col(title_col), F.lit("")))
        title_hit = _any_phrase(t, TITLE_PHRASES)
    else:
        title_hit = F.lit(False)
    body = F.coalesce(F.col(text_col), F.lit(""))
    head = F.lower(F.substring(body, 1, BODY_WINDOW_CHARS))
    body_hit = _any_phrase(head, BODY_PHRASES)
    tiny = F.length(body) < SOFT404_MAX_CHARS
    return (
        df.withColumn("soft404_title_hit", title_hit)
        .withColumn("soft404_body_hit", body_hit)
        .withColumn(
            "is_soft404",
            F.col("soft404_title_hit")
            | (F.col("soft404_body_hit") & tiny),
        )
    )


def soft404_host_rates(
    df: DataFrame,
    host_col: str = "host",
    flag_col: str = "is_soft404",
    min_pages: int = 1,
) -> DataFrame:
    """(host, n_pages, n_soft404, soft404_rate): per-host error-page
    rate — the frontier's link-rot prior. Round-6 double rate (the
    repo-wide cross-engine discipline); hosts below ``min_pages``
    observations are dropped (a 1-page host has no rate worth
    acting on at the default, callers raise it). One partial-agg
    shuffle on host."""
    return (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.col(flag_col).cast("long")).alias("n_soft404"),
        )
        .filter(F.col("n_pages") >= min_pages)
        .withColumn(
            "soft404_rate",
            F.round(
                F.col("n_soft404") * F.lit(1.0) / F.col("n_pages"), 6
            ),
        )
    )


BODY_PROXY_CHARS = 4096


def soft404_page_stage(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Pre-extraction soft-404 screen over RAW pages — the ONE shared
    definition for jobs/corpus_job.py --drop-soft404 and
    jobs/stream_job.py (the corpus_filters single-source discipline:
    hand-mirrored stages are how the stream drifts a round behind).

    Error pages should never pay kernel time, so the screen runs on
    scan-stage proxies instead of extracted text: the title via the
    SAME harvest the dataset card uses (operators/headmeta.page_meta,
    whitespace-normalized first <title>), and the body via the
    tag-stripped first ``BODY_PROXY_CHARS`` characters of the raw
    html. The proxy body is what the tiny rule measures — an error
    template strips to well under SOFT404_MAX_CHARS; a content page
    whose head is all nav markup could in principle strip short, but
    it still needs an error PHRASE to fire (stated approximation).

    Appends ``is_soft404`` only; every input column passes through
    unchanged (the harvest uses private temp names — calling
    page_meta here would OVERWRITE a pre-existing ``title`` column on
    a crawl table that carries one). Pure column math, zero Python,
    zero shuffle — streaming-legal by construction."""
    from .headmeta import _TITLE
    from .tables import TAG, WS_CLASS

    h = F.col(html_col).cast("string")
    # identical normalization to page_meta's title (trim + collapse
    # the explicit shared-subset whitespace class), under a temp name
    d = df.withColumn(
        "__sf_title",
        F.nullif(
            F.trim(
                F.regexp_replace(
                    F.regexp_extract(h, _TITLE, 1), "[ \\t\\n\\r]+", " "
                )
            ),
            F.lit(""),
        ),
    )
    d = d.withColumn(
        "__body_head",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.substring(h, 1, BODY_PROXY_CHARS), TAG, " "
                ),
                WS_CLASS,
                " ",
            )
        ),
    )
    flagged = with_soft404(
        d, text_col="__body_head", title_col="__sf_title"
    )
    return flagged.drop(
        "__body_head", "__sf_title",
        "soft404_title_hit", "soft404_body_hit",
    )
