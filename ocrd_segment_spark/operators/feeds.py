"""RSS / Atom feed harvesting: the freshness half of discovery.

Sitemaps (operators/sitemaps) enumerate what a host says EXISTS;
feeds announce what is NEW — the other crawl-discovery channel, and
the one news/blog recrawl scheduling actually keys on. Input mirrors
the sitemap/robots fetch tables: ``(host, body)`` fetched feed
documents.

Frozen grammar (the regular subset of RSS 2.0 + Atom 1.0, stated so
the DuckDB oracle can restate it; Java-regex/RE2 common subset,
``(?s)`` + non-greedy, no lookaround):

  - kind detection on the raw bytes by FIRST-occurrence precedence,
    exactly like sitemap urlset-vs-index: a body whose first
    ``<rss`` precedes any ``<feed`` (or has only ``<rss``) is RSS;
    the reverse is Atom; neither → no rows;
  - RSS entries are ``(?s)<item>(.*?)</item>`` blocks (the spec's
    bare lowercase tag); per block ``link`` = first
    ``<link>([^<]*)</link>`` value trimmed, ``published`` = first
    ``<pubDate>([^<]*)</pubDate>`` trimmed, ``title`` = first
    ``<title>([^<]*)</title>`` trimmed;
  - Atom entries are ``(?s)<entry[^>]*>(.*?)</entry>`` blocks (the
    root ``<entry`` may carry attributes); ``link`` = first
    ``<link[^>]*href="([^"]*)"`` value trimmed (Atom links are
    attributes, not text), ``published`` = first
    ``<updated>([^<]*)</updated>`` trimmed, ``title`` as in RSS;
  - ``published``/``title`` absent or empty → NULL. ``published``
    stays a STRING — RSS speaks RFC 822 dates, Atom RFC 3339;
    freshness consumers parse with try-semantics at use time, the
    harvest must not lose rows to a date dialect;
  - link normalization (the redirects-operator discipline — relative
    links are common in real feeds and must not reach the frontier
    verbatim): absolute ``http://``/``https://`` links are kept
    trimmed; host-relative links (``/…`` but not ``//…``) rebase as
    ``https://`` || host || link (the feed table carries only the
    host, so the scheme is the modern default — the fetcher follows
    the redirect if the site is http-only); anything else
    (protocol-relative, mailto:, empty, garbage) is dropped;
  - (host, link) dedupes with FIELD-WISE MIN over (published, title,
    kind) — SQL aggregate semantics (NULLs ignored unless all-NULL),
    a deterministic tie-break in the sitemap_entries discipline.

Scale shape (100 TB): scan-stage column math (regexp_extract_all +
explode) over host-grain fetch tables, then one partial-aggregable
group on (host, link). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RSS_BLOCK = "(?s)<item>(.*?)</item>"
ATOM_BLOCK = "(?s)<entry[^>]*>(.*?)</entry>"
RSS_LINK = "<link>([^<]*)</link>"
ATOM_LINK = '<link[^>]*href="([^"]*)"'
RSS_DATE = "<pubDate>([^<]*)</pubDate>"
ATOM_DATE = "<updated>([^<]*)</updated>"
TITLE = "<title>([^<]*)</title>"


def feed_entries(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, link, published, title, kind) — one row per announced
    resource; ``kind`` is 'rss' or 'atom'. Bodies may be binary (the
    fetch-table shape) or string."""
    base = df.selectExpr(
        f"{host_col} as host", f"cast({body_col} as string) as __body"
    ).withColumn(
        "__kind",
        F.expr(
            "CASE WHEN __body LIKE '%<rss%' THEN"
            "  CASE WHEN instr(__body, '<feed') = 0"
            "       OR instr(__body, '<rss') < instr(__body, '<feed')"
            "  THEN 'rss' ELSE 'atom' END"
            " WHEN __body LIKE '%<feed%' THEN 'atom' END"
        ),
    ).filter(F.col("__kind").isNotNull())
    blocks = base.select(
        "host",
        F.col("__kind").alias("kind"),
        F.explode(
            F.when(
                F.col("__kind") == "rss",
                F.expr(f"regexp_extract_all(__body, '{RSS_BLOCK}', 1)"),
            ).otherwise(
                F.expr(f"regexp_extract_all(__body, '{ATOM_BLOCK}', 1)")
            )
        ).alias("__block"),
    )
    raw_link = F.expr(
        f"trim(CASE WHEN kind = 'rss'"
        f" THEN regexp_extract(__block, '{RSS_LINK}', 1)"
        f" ELSE regexp_extract(__block, '{ATOM_LINK}', 1) END)"
    )
    fields = blocks.select(
        "host",
        "kind",
        F.when(
            raw_link.startswith("http://") | raw_link.startswith("https://"),
            raw_link,
        )
        .when(
            raw_link.startswith("/") & ~raw_link.startswith("//"),
            F.concat(F.lit("https://"), F.col("host"), raw_link),
        )
        .alias("link"),
        F.expr(
            f"nullif(trim(CASE WHEN kind = 'rss'"
            f" THEN regexp_extract(__block, '{RSS_DATE}', 1)"
            f" ELSE regexp_extract(__block, '{ATOM_DATE}', 1) END), '')"
        ).alias("published"),
        F.expr(f"nullif(trim(regexp_extract(__block, '{TITLE}', 1)), '')").alias(
            "title"
        ),
    ).filter(F.col("link").isNotNull())
    return fields.groupBy("host", "link").agg(
        F.min("published").alias("published"),
        F.min("title").alias("title"),
        F.min("kind").alias("kind"),
    )
