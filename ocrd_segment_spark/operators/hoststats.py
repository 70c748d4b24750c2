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


def mirror_hosts(
    corpus: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    max_hosts_per_fp: int = 20,
    min_shared: int = 2,
    min_resemblance: float = 0.5,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, resemblance): host pairs
    whose CONTENT overlaps — mirror detection in the Bharat & Broder
    "Mirror, mirror on the Web" (WWW 1999) shape: syntactic document
    fingerprints, host-pair overlap, resemblance = |A∩B| / |A∪B|.
    Mirror farms are the single biggest duplication multiplier in a
    crawl (the same site under 50 domains); detecting them at HOST
    grain lets the frontier drop whole hosts instead of paying
    per-document dedup on every mirrored page.

    Frozen semantics (the DuckDB oracle restates them):

    - host: the shared lowercased derivation (functions/urls.host_of),
      unresolvable hosts drop;
    - fingerprint: md5 of the raw text (the exact-dedup key — byte
      equality, the B&B syntactic baseline), one per DISTINCT
      (host, fp);
    - fingerprints on MORE than ``max_hosts_per_fp`` distinct hosts
      are excluded entirely — content on 100 hosts is boilerplate
      (cookie banners, parked-domain lander), not mirroring, and the
      exclusion is also what bounds the pair explosion;
    - per-host sizes n_a/n_b count the SAME post-exclusion universe
      the intersections are drawn from (resemblance stays a true
      Jaccard);
    - pairs ordered host_a < host_b; kept iff shared >= ``min_shared``
      AND resemblance >= ``min_resemblance`` (round-6, boundary
      inclusive).

    Scale shape (100 TB): distinct (host, fp) and both count layers
    are partial aggregates; the only pair-producing join keys on the
    fingerprint and is capped at max_hosts_per_fp² rows per fp by the
    exclusion rule, so no key can explode; the final host-pair /
    host-size joins are host-grain (orders of magnitude below corpus
    grain). No windows, no skew sensitivity.
    """
    hf = (
        corpus.select(
            host_of(url_col).alias("host"),
            F.md5(F.col(text_col)).alias("fp"),
        )
        .filter(F.col("host") != "")
        .distinct()
    )
    ok_fp = (
        hf.groupBy("fp")
        .agg(F.count("*").alias("_nh"))
        .filter(F.col("_nh") <= max_hosts_per_fp)
        .select("fp")
    )
    hf = hf.join(ok_fp, "fp")
    sizes = hf.groupBy("host").agg(F.count("*").alias("n"))
    a = hf.select(F.col("host").alias("host_a"), "fp")
    b = hf.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("n", "n_a")
        .join(sizes.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("n", "n_b")
        .withColumn(
            "resemblance",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("resemblance") >= min_resemblance)
        )
        .select("host_a", "host_b", "shared", "n_a", "n_b", "resemblance")
    )
