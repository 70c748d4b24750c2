"""Host-level quality priors: content evidence aggregated to the host.

The link graph gives a popularity prior (PageRank/TrustRank floors in
corpus_job); this is its CONTENT twin: what the host's own documents
scored. Real pipelines maintain both — a host whose pages are
consistently boilerplate/spammy gets demoted or blocklisted for the
NEXT crawl regardless of who links to it, and the aggregate is
host-grain (tiny), so it ships to the frontier as a broadcast join
exactly like the domain blocklist.

Frozen semantics (the DuckDB oracle restates them):

- ``host`` is the shared lowercased host derivation
  (functions/urls.host_of); rows with no resolvable host drop;
- ``n_docs`` per host; ``mean_quality`` = round6(avg quality);
- ``top_lang`` = the most frequent predicted language, ties broken by
  LEXICOGRAPHIC MIN (deterministic: min over struct(-count, lang));
  NULL languages count like any value (a host of unidentified docs has
  top_lang NULL);
- ``n_langs`` = distinct predicted languages (NULL counts zero, the
  SQL count-distinct rule).

Scale shape (100 TB): two partial-aggregable groups — (host, lang)
then host — over corpus-grain rows carrying only (host, lang,
quality); no window, no skew sensitivity (a million-page host merges
partial counts map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.urls import host_of


def host_quality_priors(
    corpus: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    lang_col: str = "pred_lang",
) -> DataFrame:
    """(host, n_docs, mean_quality, top_lang, n_langs) — one row per
    host of the corpus, under the frozen rule above."""
    base = corpus.select(
        host_of(url_col).alias("host"),
        F.col(quality_col).alias("__q"),
        F.col(lang_col).alias("__lang"),
    ).filter(F.col("host") != "")
    per_lang = base.groupBy("host", "__lang").agg(
        F.count("*").alias("__n"),
        F.sum("__q").alias("__sq"),
    )
    return per_lang.groupBy("host").agg(
        F.sum("__n").alias("n_docs"),
        F.round(F.sum("__sq") / F.sum("__n"), 6).alias("mean_quality"),
        F.min(
            F.struct((-F.col("__n")).alias("a"), F.col("__lang").alias("b"))
        )["b"].alias("top_lang"),
        F.count_distinct("__lang").cast("int").alias("n_langs"),
    )


def low_quality_hosts(
    priors: DataFrame, min_docs: int = 10, max_mean_quality: float = 0.3
) -> DataFrame:
    """The drop-list view: hosts with enough evidence (``min_docs``)
    whose mean quality sits at or below the floor — the
    content-evidence twin of the domain blocklist, consumable by
    ``functions/urls.with_host_blocked`` or the frontier."""
    return priors.filter(
        (F.col("n_docs") >= min_docs)
        & (F.col("mean_quality") <= max_mean_quality)
    ).select("host", "n_docs", "mean_quality")
