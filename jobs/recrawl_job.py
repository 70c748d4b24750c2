"""Recrawl scheduling job: snapshot history → due-for-refetch list.

    python tools/package.py                       # → dist/engine.zip
    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        jobs/recrawl_job.py \\
        --history /path/to/url_snapshots \\
        --as-of   2026-08-18T00:00:00 \\
        --output  /path/to/due \\
        [--default-days 30] [--min-days 0.5] [--max-days 365] \\
        [--stats /path/to/stats]

The freshness half of crawl maintenance: frontier_job discovers what
is NEW; this job decides what already-fetched pages are STALE. Input
is the url-grain observation history ``(url, snap_ts, digest)``
accumulated across crawls (scan-side md5 of each crawl's text — the
corpus_diff discipline); change rates come from
operators/snapshots.change_rates (Cho & Garcia-Molina estimator).

Frozen scheduling policy (deterministic — ``--as-of`` is an explicit
argument, the job never reads the clock):

- interval_days = the estimator's ``recrawl_days`` clamped into
  [min-days, max-days];
- pages never observed changing (rate exactly 0.0) wait ``max-days`` —
  the estimator offers no finite interval, so the policy takes the
  slowest lane rather than the default one;
- pages without an estimate (a single observation) wait
  ``default-days`` from their one sighting;
- due when ``last_ts + interval_days * 86400 <= as-of``.

Output is NOT globally sorted (the frontier_job discipline): priority
ordering at 10^9 urls is the consumer's top-k problem. ``overdue_s``
rides along as the ranking signal.

Scale shape: one url-keyed exchange in change_rates (plan-tested),
then row-local policy math and the due filter. Drop accounting rides
the terminal write as an Observation — single pass, no re-scan.
"""

from __future__ import annotations

import argparse

STATS_KEYS = ("history_urls", "due_urls")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--history", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--as-of", required=True,
        help="scheduling instant, ISO-8601 (explicit so reruns are"
        " deterministic; the job never reads the clock)",
    )
    ap.add_argument("--default-days", type=float, default=30.0)
    ap.add_argument("--min-days", type=float, default=0.5)
    ap.add_argument("--max-days", type=float, default=365.0)
    ap.add_argument("--stats", default=None)
    args = ap.parse_args()

    from pyspark.sql import Observation, functions as F

    from ocrd_segment_spark.operators.snapshots import change_rates
    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-recrawl")
    stats = {k: -1 for k in STATS_KEYS}

    rates = change_rates(spark.read.parquet(args.history))
    interval = (
        F.when(F.col("rate_per_day") == 0.0, F.lit(args.max_days))
        .when(
            F.col("recrawl_days").isNotNull(),
            F.least(
                F.greatest(F.col("recrawl_days"), F.lit(args.min_days)),
                F.lit(args.max_days),
            ),
        )
        .otherwise(F.lit(args.default_days))
    )
    as_of = F.to_timestamp(F.lit(args.as_of))
    scheduled = rates.select(
        "url",
        "last_ts",
        "n_obs",
        "rate_per_day",
        interval.alias("interval_days"),
    ).withColumn(
        "due_ts",
        F.timestamp_seconds(
            F.col("last_ts").cast("long")
            + (F.col("interval_days") * 86400.0).cast("long")
        ),
    )

    obs = Observation("recrawl")
    scheduled = scheduled.observe(
        obs,
        F.count(F.lit(1)).alias("urls"),
        F.sum((F.col("due_ts") <= as_of).cast("long")).alias("due"),
    )
    due = scheduled.filter(F.col("due_ts") <= as_of).withColumn(
        "overdue_s", as_of.cast("long") - F.col("due_ts").cast("long")
    )
    due.write.mode("overwrite").parquet(args.output)

    stats["history_urls"] = obs.get["urls"]
    stats["due_urls"] = obs.get["due"] or 0
    print(f"RECRAWL {stats}")
    if args.stats is not None:
        spark.createDataFrame([stats]).write.mode("append").parquet(args.stats)
    spark.stop()


if __name__ == "__main__":
    main()
