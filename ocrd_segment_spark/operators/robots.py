"""robots.txt parsing and frontier filtering.

The seen-set (operators/bloom) answers "did we fetch it"; robots.txt
answers "are we ALLOWED to fetch it" — the other half of crawl-
frontier curation, and like noindex honoring a compliance requirement
rather than an optimization. Input is what a crawler actually has: a
table of fetched ``(host, body)`` robots.txt documents.

Frozen grammar (the REP subset that is deterministic without an agent
identity, stated so the DuckDB oracle can restate it):

  - lines split on ``\\n``; a trailing ``\\r`` and surrounding blanks
    are trimmed; everything from the first ``#`` on is comment;
  - directives match ``<name>:<value>`` with case-insensitive names
    ``user-agent`` / ``allow`` / ``disallow``; values trim blanks;
  - consecutive ``user-agent`` lines open ONE group; the group's
    rules run until the next user-agent RUN (blank lines and unknown
    directives do not close a group);
  - only groups whose agent set contains ``*`` contribute rules (the
    engine curates corpora, not a branded crawler — the wildcard
    group is the one every agent is subject to);
  - empty-value ``disallow:`` lines are the REP idiom for "allow
    everything" and yield NO rule; empty ``allow:`` likewise.

Frozen matching rule (:func:`robots_allowed`) — the longest-match
semantics Google's REP reference implementation documents: a url's
path matches a rule when it starts with the rule's path verbatim (no
``*``/``$`` wildcards — a frozen simplification, stated, erring
toward the more conservative plain prefix); the matching rule with
the LONGEST path wins; at equal length ``allow`` beats ``disallow``;
no matching rule (or no robots.txt for the host) → allowed.

Scale shape (100 TB): parsing is per-host column math + one
host-partitioned window pass (robots bodies are KB-bounded, so
partitions are tiny regardless of corpus size); the rules table is
hosts × rules-per-file — orders of magnitude below page grain.
:func:`robots_allowed` is an equi-join on host (AQE broadcasts the
rules side when small; skewed mega-hosts fall under the same AQE
skew handling the extraction path already relies on) followed by a
partial-aggregable ``max(struct)`` per url — no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_ABS_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
# path = everything from the first '/' after the authority; '' → '/'
_URL_PATH = "coalesce(nullif(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$', 1), ''), '/')"


def logical_lines(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, __bid, ln, __line): robots.txt logical lines — split on
    newline, trailing CR stripped, '#'-comments removed, blanks
    trimmed, identical (host, body) pairs collapsed, lines keyed by
    the body digest. The ONE home of the line grammar: the directive
    parser below and the Sitemap: harvest (operators/sitemaps) both
    consume it, so a comment/CRLF fix can never apply to one and not
    the other (review-found drift channel)."""
    return (
        df.selectExpr(
            f"{host_col} as host",
            f"cast({body_col} as string) as __body",
        )
        .distinct()
        .withColumn("__bid", F.md5("__body"))
        .select(
            "host",
            "__bid",
            F.posexplode(F.split("__body", "\n")).alias("ln", "__raw"),
        )
        .withColumn(
            "__line",
            F.expr(
                "trim(regexp_replace(regexp_replace(__raw, '#.*$', ''),"
                " '\r$', ''))"
            ),
        )
        .drop("__raw")
    )


def _wildcard_directives(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """(host, __bid, __name, __value) — every directive line that
    belongs to a wildcard-agent group, the shared front half of
    :func:`parse_robots` and :func:`crawl_delays` (one home for the
    grouping grammar so the two can never drift).

    A host may arrive with SEVERAL bodies (refetch, http+https pair):
    identical bodies collapse to one (distinct), different bodies
    parse independently (windows key on the body digest, so two
    bodies' lines can never interleave into one agent group) and
    their directives union — the conservative read of a conflicted
    fetch table."""
    lines = logical_lines(df, host_col, body_col)
    typed = lines.selectExpr(
        "host",
        "__bid",
        "ln",
        "lower(regexp_extract(__line, '^([A-Za-z-]+)\\\\s*:', 1)) as __name",
        "trim(regexp_extract(__line, '^[A-Za-z-]+\\\\s*:(.*)$', 1)) as __value",
    ).withColumn("__is_agent", F.col("__name") == "user-agent")
    w = W.partitionBy("host", "__bid").orderBy("ln")
    grouped = (
        typed.withColumn(
            "__agent_run_start",
            F.col("__is_agent")
            & ~F.coalesce(F.lag("__is_agent").over(w), F.lit(False)),
        )
        .withColumn(
            "__block",
            F.sum(F.col("__agent_run_start").cast("long")).over(w),
        )
    )
    starred = (
        grouped.filter("__is_agent AND __value = '*'")
        .select("host", "__bid", "__block")
        .distinct()
    )
    return grouped.join(starred, ["host", "__bid", "__block"]).select(
        "host", "__bid", "__name", "__value"
    )


def parse_robots(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, rule, path) rules of every wildcard-agent group —
    ``rule`` is ``allow`` or ``disallow``, ``path`` the verbatim
    rule path. One posexplode + one body-grain window pass (the
    shared :func:`_wildcard_directives` front half). Duplicate
    (rule, path) pairs across bodies stay duplicate rows;
    robots_allowed's max(struct) is insensitive to that."""
    return (
        _wildcard_directives(df, host_col, body_col)
        .filter(
            F.col("__name").isin("allow", "disallow")
            & (F.col("__value") != "")
        )
        .select(
            "host",
            F.col("__name").alias("rule"),
            F.col("__value").alias("path"),
        )
    )


def crawl_delays(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, crawl_delay) — the politeness interval a frontier
    scheduler honors between fetches to one host. Frozen rule:
    ``crawl-delay`` directives of wildcard-agent groups only (the
    same group scope as the path rules — a delay addressed to a
    specific crawler does not bind a generic one), values try-cast
    to DOUBLE seconds (non-numeric dropped), negatives dropped, and
    the per-host MAX wins — when fetch tables conflict, the slowest
    declared pace is the conservative read. Hosts with no valid
    directive emit no row (absence = scheduler default)."""
    return (
        _wildcard_directives(df, host_col, body_col)
        .filter(F.col("__name") == "crawl-delay")
        .withColumn("__d", F.expr("try_cast(__value as double)"))
        .filter(F.col("__d").isNotNull() & (F.col("__d") >= 0))
        # lowercased like robots_allowed's join side: a mixed-case
        # fetch table must neither split one host's max nor miss the
        # (lowercased) frontier join (review-found)
        .groupBy(F.lower(F.col("host")).alias("host"))
        .agg(F.max("__d").alias("crawl_delay"))
    )


def robots_allowed(
    rules: DataFrame, urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """``urls`` + ``robots_allowed`` boolean under the frozen
    longest-match rule. ``rules`` is :func:`parse_robots` output (or
    the persisted table a crawler maintains); its ``host`` values are
    lowercased on the join side, matching the lowercase the probe url
    derivation applies — a mixed-case fetch table must not silently
    match nothing."""
    u = urls.withColumn(
        "__host", F.expr(f"lower(regexp_extract({url_col}, '{_ABS_HOST}', 1))")
    ).withColumn("__path", F.expr(_URL_PATH.format(u=url_col)))
    rules = rules.withColumn("host", F.lower(F.col("host")))
    matched = (
        u.select(url_col, "__host", "__path")
        .join(rules, u["__host"] == rules["host"], "left")
        .withColumn(
            "__hit",
            F.col("path").isNotNull()
            & F.expr("startswith(__path, path)"),
        )
        .groupBy(url_col)
        .agg(
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.length("path").alias("l"),
                        (F.col("rule") == "allow")
                        .cast("int")
                        .alias("a"),
                    ),
                )
            ).alias("__best")
        )
        .select(
            url_col,
            F.coalesce(F.col("__best.a") == 1, F.lit(True)).alias(
                "robots_allowed"
            ),
        )
    )
    return urls.join(matched, url_col, "left")


def crawl_waves(
    frontier: DataFrame,
    wave_seconds: float = 60.0,
    default_delay: float = 1.0,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """``frontier`` + (fetch_seq, eta_s, wave): turn per-host
    politeness intervals into an executable fetch schedule. A frontier
    with crawl delays is not yet a plan — a scheduler needs to know
    WHEN each url may be fetched so it can bin work into dispatch
    rounds without hammering any host. Frozen rule:

    - fetch_seq = position within the host's queue, freshest first:
      row_number over (lastmod DESC NULLS LAST, url ASC) — urls
      without a freshness hint go last, ties are deterministic;
    - eta_s = (fetch_seq - 1) * coalesce(crawl_delay, default_delay)
      — the earliest polite start offset for that fetch, seconds from
      the host's first fetch;
    - wave = floor(eta_s / wave_seconds) as int — the dispatch round
      it lands in. A host with delay 10 and 30 urls spreads over 5
      waves of 60 s; a host with no delay puts everything in wave 0.

    Scale shape: ONE window per host partition (host-grain keys; a
    mega-host is AQE-skew territory, not a buffer risk — row_number
    needs no full-partition buffering) plus row-local column math.
    Downstream, `wave` is the natural write-partition column: each
    dispatch round reads exactly one partition (partition pruning),
    which is the 100 TB reason this is a COLUMN and not a sort order.
    """
    if wave_seconds <= 0:
        raise ValueError(f"wave_seconds must be > 0, got {wave_seconds}")
    from pyspark.sql import Window as W

    w = W.partitionBy(host_col).orderBy(
        F.col("lastmod").desc_nulls_last(), F.col(url_col).asc()
    )
    return (
        frontier.withColumn("fetch_seq", F.row_number().over(w))
        .withColumn(
            "eta_s",
            F.round(
                (F.col("fetch_seq") - 1)
                * F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
                6,
            ),
        )
        .withColumn(
            "wave", F.floor(F.col("eta_s") / F.lit(float(wave_seconds))).cast("int")
        )
    )
