"""Crawl-frontier planning job: sitemaps + robots + seen-set → frontier.

    python tools/package.py                       # → dist/engine.zip
    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        jobs/frontier_job.py \\
        --sitemaps /path/to/sitemap_fetches \\
        --output   /path/to/frontier \\
        [--feeds /path/to/feed_fetches] \\
        [--robots /path/to/robots_fetches] \\
        [--seen /path/to/fetched_urls] \\
        [--host-ranks /path/to/host_ranks] \\
        [--child-sitemaps /path/to/children] \\
        [--stats /path/to/stats] \\
        [--bloom-bits 1048576] [--bloom-k 4] \\
        [--drop-confusable-hosts] \\
        [--soft404-rates /path/to/rates --soft404-max 0.3] \\
        [--wave-seconds 60 [--default-delay 1.0]]

Composes the discovery operators into the table a fetch scheduler
consumes: sitemap url sets parsed (operators/sitemaps), child
sitemaps split out for the next fetch round, candidate urls filtered
by the REP longest-match rule (operators/robots), the already-fetched
set excluded through the Bloom seen-set (operators/bloom — no false
negatives, so nothing fetched is refetched; the configured
false-positive rate trades a sliver of discovery recall for never
joining the full corpus), and host PageRank (jobs/linkgraph_job.py
output) attached as the scheduling priority.

Scale shape: every input here is host- or frontier-grain — orders of
magnitude below page grain. The one corpus-sized artifact (the seen
set) enters only as the Bloom bit table (≤ m/32 rows, broadcast). Drop
accounting rides the terminal write as an Observation on the
pre-filter node — single pass, no re-scan, the corpus_job discipline.
The output is NOT globally sorted: rank ordering at 10^9 frontier rows
is the consumer's top-k problem (domain_cap / token-budget style), not
a full sort this job should pay for.
"""

from __future__ import annotations

import argparse

STATS_KEYS = (
    "sitemap_entries",
    "feed_entries",
    "child_sitemaps",
    "candidate_urls",
    "dropped_robots",
    "dropped_seen",
    "dropped_template_cap",
    "dropped_confusable_host",
    "dropped_soft404_host",
    "frontier_urls",
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sitemaps", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--feeds", default=None,
        help="parquet of fetched RSS/Atom feed documents (host, body);"
        " announced links join the candidate set (operators/feeds)",
    )
    ap.add_argument("--robots", default=None)
    ap.add_argument("--seen", default=None, help="parquet of fetched urls (url column)")
    ap.add_argument("--host-ranks", default=None, help="linkgraph_job --ranks output")
    ap.add_argument("--child-sitemaps", default=None)
    ap.add_argument("--stats", default=None)
    ap.add_argument("--bloom-bits", type=int, default=1 << 20)
    ap.add_argument("--bloom-k", type=int, default=4)
    ap.add_argument(
        "--max-per-template",
        type=int,
        default=None,
        help="cap frontier urls per structural url template"
        " (operators/urltraps) — calendar/session/faceted crawler"
        " traps stop owning the frontier; survivors are the"
        " deterministic two-phase top-k (operators/sampling.domain_cap"
        " on the template key)",
    )
    ap.add_argument(
        "--wave-seconds",
        type=float,
        default=None,
        help="bin the frontier into dispatch waves of this many "
        "seconds (operators/robots.crawl_waves); adds fetch_seq / "
        "eta_s / wave columns and partitions the output by wave so "
        "each dispatch round reads exactly one partition",
    )
    ap.add_argument(
        "--drop-confusable-hosts",
        action="store_true",
        help="drop candidates whose host has a mixed Latin/Cyrillic"
        " label (IDN homoglyph spoof, functions/urls"
        ".with_host_script_flags) — a crawler should not spend fetch"
        " budget on registration-squat hosts; pure punycode is KEPT"
        " (legitimate IDNs)",
    )
    ap.add_argument(
        "--soft404-rates", default=None,
        help="parquet from operators/softerrors.soft404_host_rates"
        " (host, soft404_rate, ...); requires --soft404-max",
    )
    ap.add_argument(
        "--soft404-max", type=float, default=None,
        help="drop candidates on hosts whose observed soft-404 rate"
        " exceeds this (link-rot farms); hosts with no observation"
        " are kept",
    )
    ap.add_argument(
        "--default-delay",
        type=float,
        default=1.0,
        help="crawl delay (s) for hosts without a robots directive "
        "(only used with --wave-seconds)",
    )
    args = ap.parse_args()
    if (args.soft404_rates is None) != (args.soft404_max is None):
        ap.error("--soft404-rates and --soft404-max must be given"
                 " together (one alone would silently skip the stage)")

    from pyspark.sql import Observation, functions as F

    from ocrd_segment_spark.functions.urls import host_of
    from ocrd_segment_spark.operators.bloom import (
        bloom_maybe_seen,
        build_bloom,
    )
    from ocrd_segment_spark.operators.robots import (
        crawl_delays,
        parse_robots,
        robots_allowed,
    )
    from ocrd_segment_spark.operators.sitemaps import sitemap_entries
    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-frontier")
    stats = {k: -1 for k in STATS_KEYS}

    entries = sitemap_entries(spark.read.parquet(args.sitemaps))
    e_obs = Observation("entries")
    entries = entries.observe(
        e_obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("is_index").cast("long")).alias("children"),
    )

    children = entries.filter("is_index")
    if args.child_sitemaps is not None:
        children.write.mode("overwrite").parquet(args.child_sitemaps)

    # candidate urls: the loc's OWN host keys robots/rank joins (a
    # cross-host submission schedules against the host it points AT);
    # a loc declared by several sitemaps is one candidate, freshest
    # hint = min lastmod string (the sitemap_entries tie-break). Feed
    # links join the same pool; their freshness hint speaks a
    # different date dialect (RFC 822/3339 vs W3C), so the frozen
    # rule keeps the channels separate and prefers the sitemap one:
    # lastmod = coalesce(min sitemap lastmod, min feed published).
    raw = entries.filter(~F.col("is_index")).select(
        F.col("loc").alias("url"),
        F.col("lastmod").alias("hint"),
        F.lit("sitemap").alias("src"),
    )
    if args.feeds is not None:
        from ocrd_segment_spark.operators.feeds import feed_entries

        feeds = feed_entries(spark.read.parquet(args.feeds))
        fe_obs = Observation("feeds")
        feeds = feeds.observe(fe_obs, F.count(F.lit(1)).alias("total"))
        raw = raw.unionByName(
            feeds.select(
                F.col("link").alias("url"),
                F.col("published").alias("hint"),
                F.lit("feed").alias("src"),
            )
        )
    cands = (
        raw.groupBy("url")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("src") == "sitemap", F.col("hint"))),
                F.min(F.when(F.col("src") == "feed", F.col("hint"))),
            ).alias("lastmod")
        )
        .withColumn("host", host_of("url"))
    )

    robots_df = (
        spark.read.parquet(args.robots) if args.robots is not None else None
    )
    if robots_df is not None:
        cands = robots_allowed(parse_robots(robots_df), cands)
    else:
        cands = cands.withColumn("robots_allowed", F.lit(True))

    if args.seen is not None:
        seen = spark.read.parquet(args.seen).select("url")
        bloom = build_bloom(
            seen, m_bits=args.bloom_bits, k=args.bloom_k
        )
        cands = bloom_maybe_seen(
            bloom, cands, m_bits=args.bloom_bits, k=args.bloom_k
        )
    else:
        cands = cands.withColumn("maybe_seen", F.lit(False))

    if args.drop_confusable_hosts:
        # IDN homoglyph screen on the candidate's own host — column
        # math, no join; counted in the same pre-filter Observation
        from ocrd_segment_spark.functions.urls import (
            with_host_script_flags,
        )

        cands = with_host_script_flags(cands).drop("is_punycode")
    else:
        cands = cands.withColumn("confusable_host", F.lit(False))
    if args.soft404_rates is not None:
        # link-rot prior (operators/softerrors.soft404_host_rates):
        # host-grain table, orders below frontier grain — plain left
        # equi-join, AQE broadcasts it when small; no observation =
        # no evidence = keep
        rates = spark.read.parquet(args.soft404_rates).select(
            "host", "soft404_rate"
        )
        cands = cands.join(rates, "host", "left").withColumn(
            "__rotten",
            F.coalesce(
                F.col("soft404_rate") > args.soft404_max, F.lit(False)
            ),
        ).drop("soft404_rate")
    else:
        cands = cands.withColumn("__rotten", F.lit(False))

    f_obs = Observation("frontier")
    cands = cands.observe(
        f_obs,
        F.count(F.lit(1)).alias("cands"),
        F.sum((~F.col("robots_allowed")).cast("long")).alias("robots"),
        F.sum(
            (F.col("robots_allowed") & F.col("maybe_seen")).cast("long")
        ).alias("seen"),
        F.sum(
            (
                F.col("robots_allowed") & ~F.col("maybe_seen")
                & F.col("confusable_host")
            ).cast("long")
        ).alias("confusable"),
        F.sum(
            (
                F.col("robots_allowed") & ~F.col("maybe_seen")
                & ~F.col("confusable_host") & F.col("__rotten")
            ).cast("long")
        ).alias("rotten"),
    )
    frontier = cands.filter(
        F.col("robots_allowed") & ~F.col("maybe_seen")
        & ~F.col("confusable_host") & ~F.col("__rotten")
    ).select("url", "host", "lastmod")

    t_obs = None
    if args.max_per_template is not None:
        from ocrd_segment_spark.operators.sampling import domain_cap
        from ocrd_segment_spark.operators.urltraps import url_template

        frontier = domain_cap(
            frontier.withColumn("__tpl", url_template("url")),
            args.max_per_template,
            domain_col="__tpl",
            key_col="url",
        ).drop("__tpl")
        t_obs = Observation("template_cap")
        frontier = frontier.observe(t_obs, F.count(F.lit(1)).alias("kept"))

    if args.host_ranks is not None:
        ranks = spark.read.parquet(args.host_ranks).select(
            F.col("node").alias("host"), F.col("rank").alias("host_rank")
        )
        frontier = frontier.join(ranks, "host", "left").withColumn(
            "host_rank", F.coalesce("host_rank", F.lit(0.0))
        )
    else:
        frontier = frontier.withColumn("host_rank", F.lit(0.0))

    if robots_df is not None:
        # politeness interval per host (operators/robots.crawl_delays)
        # joins as a scheduling column; null = scheduler default pace
        frontier = frontier.join(crawl_delays(robots_df), "host", "left")
    else:
        frontier = frontier.withColumn("crawl_delay", F.lit(None).cast("double"))
    if args.wave_seconds is not None:
        from ocrd_segment_spark.operators.robots import crawl_waves

        frontier = crawl_waves(
            frontier,
            wave_seconds=args.wave_seconds,
            default_delay=args.default_delay,
        )
        # each dispatch round reads one partition (partition pruning)
        frontier.write.mode("overwrite").partitionBy("wave").parquet(
            args.output
        )
    else:
        frontier.write.mode("overwrite").parquet(args.output)
    stats["sitemap_entries"] = e_obs.get["total"]
    if args.feeds is not None:
        stats["feed_entries"] = fe_obs.get["total"]
    stats["child_sitemaps"] = e_obs.get["children"] or 0
    stats["candidate_urls"] = f_obs.get["cands"]
    stats["dropped_robots"] = f_obs.get["robots"] or 0
    stats["dropped_seen"] = f_obs.get["seen"] or 0
    if args.drop_confusable_hosts:
        stats["dropped_confusable_host"] = f_obs.get["confusable"] or 0
    if args.soft404_rates is not None:
        stats["dropped_soft404_host"] = f_obs.get["rotten"] or 0
    stats["frontier_urls"] = (
        stats["candidate_urls"] - stats["dropped_robots"] - stats["dropped_seen"]
        - (f_obs.get["confusable"] or 0) - (f_obs.get["rotten"] or 0)
    )
    if t_obs is not None:
        kept = t_obs.get["kept"] or 0
        stats["dropped_template_cap"] = stats["frontier_urls"] - kept
        stats["frontier_urls"] = kept
    print(f"FRONTIER {stats}")
    if args.stats is not None:
        spark.createDataFrame([stats]).write.mode("append").parquet(args.stats)
    spark.stop()


if __name__ == "__main__":
    main()
