"""Sitemap harvesting: urlset/sitemapindex parsing + robots discovery.

robots.txt (operators/robots) answers "may we fetch it"; sitemaps
answer "what does the host SAY exists" — the discovery half of
frontier curation, and the only crawl input where the host itself
volunteers lastmod freshness hints. Input mirrors the robots table:
``(host, body)`` fetched sitemap documents.

Frozen grammar (the sitemaps.org protocol subset that is regular,
stated so the DuckDB oracle can restate it; both engines speak the
same RE2/Java-regex common subset, ``(?s)`` + non-greedy included):

  - a body whose first ``<urlset`` occurrence precedes any
    ``<sitemapindex`` (or has only ``<urlset``) is a URL set; the
    reverse is a sitemap INDEX; a body with neither yields no rows —
    kind detection is on the raw bytes, namespaces and attributes on
    the root tag are irrelevant because only the prefix is tested;
  - url-set entries are ``(?s)<url>(.*?)</url>`` blocks, index
    entries ``(?s)<sitemap>(.*?)</sitemap>`` blocks — literal
    lowercase tags per the protocol (the spec mandates lowercase;
    tag-soup tolerance here would invent entries the host never
    declared);
  - per block: ``loc`` = first ``<loc>([^<]*)</loc>`` value, trimmed;
    ``lastmod`` = first ``<lastmod>([^<]*)</lastmod>`` value, trimmed,
    absent/empty → NULL. ``lastmod`` stays a STRING — the protocol
    allows several W3C datetime precisions and freshness consumers
    should parse with try-semantics at use time, not lose rows here;
  - blocks with an empty ``loc`` are dropped; entries dedupe on
    (host, loc, is_index) keeping the MIN lastmod string — a loc
    listed twice in one file is one resource (min is an arbitrary but
    deterministic tie-break, stated).

:func:`robots_sitemap_urls` harvests ``Sitemap:`` directives from
robots.txt bodies — per RFC 9309 these are group-independent, so the
harvest ignores user-agent groups entirely (same line/comment
discipline as operators/robots.parse_robots).

Scale shape (100 TB): both harvests are scan-stage column math
(regexp_extract_all + explode) over host-grain tables that are orders
of magnitude below page grain; the dedupe is one partial-aggregable
group on (host, loc). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

URL_BLOCK = "(?s)<url>(.*?)</url>"
INDEX_BLOCK = "(?s)<sitemap>(.*?)</sitemap>"
LOC = "<loc>([^<]*)</loc>"
LASTMOD = "<lastmod>([^<]*)</lastmod>"


def sitemap_entries(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, loc, lastmod, is_index) — one row per declared resource:
    ``is_index`` false for page urls of a url set, true for child
    sitemaps of an index (the rows a crawler must fetch-and-reparse).
    Bodies may be binary (the fetch-table shape) or string."""
    base = df.selectExpr(
        f"{host_col} as host", f"cast({body_col} as string) as __body"
    ).withColumn(
        "__is_index",
        F.expr(
            "CASE WHEN __body LIKE '%<sitemapindex%' THEN"
            "  instr(__body, '<urlset') = 0"
            "  OR instr(__body, '<sitemapindex') < instr(__body, '<urlset')"
            " WHEN __body LIKE '%<urlset%' THEN false END"
        ),
    ).filter(F.col("__is_index").isNotNull())
    blocks = base.select(
        "host",
        F.col("__is_index").alias("is_index"),
        F.explode(
            F.when(
                F.col("__is_index"),
                F.expr(f"regexp_extract_all(__body, '{INDEX_BLOCK}', 1)"),
            ).otherwise(
                F.expr(f"regexp_extract_all(__body, '{URL_BLOCK}', 1)")
            )
        ).alias("__block"),
    )
    return (
        blocks.select(
            "host",
            F.expr(f"trim(regexp_extract(__block, '{LOC}', 1))").alias("loc"),
            F.expr(
                f"nullif(trim(regexp_extract(__block, '{LASTMOD}', 1)), '')"
            ).alias("lastmod"),
            "is_index",
        )
        .filter(F.col("loc") != "")
        .groupBy("host", "loc", "is_index")
        .agg(F.min("lastmod").alias("lastmod"))
        .select("host", "loc", "lastmod", "is_index")
    )


def robots_sitemap_urls(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` directives from robots.txt
    bodies, distinct per host. Group-independent per RFC 9309, so no
    agent-group bookkeeping: every non-comment line whose directive
    name is ``sitemap`` (case-insensitive) contributes its trimmed
    value verbatim (absolute-url validation belongs to the fetcher).
    Line grammar comes from the ONE shared home
    (operators/robots.logical_lines) — review-found drift channel."""
    from .robots import logical_lines

    lines = logical_lines(df, host_col, body_col)
    return (
        lines.filter(
            F.expr(
                "lower(regexp_extract(__line, '^([A-Za-z-]+)\\\\s*:', 1)) = 'sitemap'"
            )
        )
        .selectExpr(
            "host",
            "trim(regexp_extract(__line, '^[A-Za-z-]+\\\\s*:(.*)$', 1)) as sitemap_url",
        )
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


CHANGEFREQ = "<changefreq>([^<]*)</changefreq>"
PRIORITY = "<priority>([^<]*)</priority>"
CHANGEFREQ_VOCAB = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)


def sitemap_url_hints(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, loc, lastmod, changefreq, priority) — the url-set
    entries WITH the scheduler hint fields the protocol defines:
    ``changefreq`` (trimmed, lowercased, values outside the spec
    vocabulary → NULL — a host claiming 'sometimes' declared nothing)
    and ``priority`` (try-cast double, outside [0,1] → NULL per spec
    range). Same frozen block grammar, kind precedence, and
    field-wise-min dedupe as :func:`sitemap_entries`; index bodies
    yield no rows (children carry no hints).

    The scheduler join surface: declared ``changefreq`` pairs with
    the OBSERVED rate from operators/snapshots.change_rates — hosts
    lie about freshness, measurements don't, but the declaration is
    the only signal available before the second crawl."""
    base = df.selectExpr(
        f"{host_col} as host", f"cast({body_col} as string) as __body"
    ).filter(
        F.expr(
            "__body LIKE '%<urlset%' AND ("
            " instr(__body, '<sitemapindex') = 0"
            " OR instr(__body, '<urlset') < instr(__body, '<sitemapindex'))"
        )
    )
    blocks = base.select(
        "host",
        F.explode(
            F.expr(f"regexp_extract_all(__body, '{URL_BLOCK}', 1)")
        ).alias("__block"),
    )
    vocab = ", ".join(f"'{v}'" for v in CHANGEFREQ_VOCAB)
    cf = (
        f"CASE WHEN lower(trim(regexp_extract(__block, '{CHANGEFREQ}', 1)))"
        f" IN ({vocab})"
        f" THEN lower(trim(regexp_extract(__block, '{CHANGEFREQ}', 1)))"
        f" END"
    )
    pr = (
        f"CASE WHEN try_cast(trim(regexp_extract(__block, '{PRIORITY}', 1))"
        f" as double) BETWEEN 0.0D AND 1.0D"
        f" THEN try_cast(trim(regexp_extract(__block, '{PRIORITY}', 1))"
        f" as double) END"
    )
    return (
        blocks.select(
            "host",
            F.expr(f"trim(regexp_extract(__block, '{LOC}', 1))").alias("loc"),
            F.expr(
                f"nullif(trim(regexp_extract(__block, '{LASTMOD}', 1)), '')"
            ).alias("lastmod"),
            F.expr(cf).alias("changefreq"),
            F.expr(pr).alias("priority"),
        )
        .filter(F.col("loc") != "")
        .groupBy("host", "loc")
        .agg(
            F.min("lastmod").alias("lastmod"),
            F.min("changefreq").alias("changefreq"),
            F.min("priority").alias("priority"),
        )
    )
