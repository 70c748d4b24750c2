"""Cross-snapshot corpus diffing: what changed between two crawls.

The reference engine processes one workspace at a time and has no
notion of corpus versions; a web pipeline recrawls, and the first
question about a new snapshot is "what did it add, drop, or rewrite
relative to the corpus we already trained on". :func:`corpus_diff`
answers it at url grain; :func:`diff_summary` rolls the answer up to
the four counters an ingestion dashboard wants.

Frozen semantics (stated so the DuckDB oracle can restate them):

  - rows pair on ``key_col`` (callers pass the CANONICAL url — diffing
    raw urls double-counts tracking-param variants; the operator does
    not canonicalize for you because the previous corpus is usually
    already collapsed);
  - ``status`` = ``added`` (current only), ``removed`` (previous
    only), ``changed`` (both sides, md5(text) differs), ``unchanged``
    (both sides, md5 equal);
  - digests compare md5 of the text column verbatim — byte identity,
    no normalization: a one-space edit IS a change (normalize upstream
    if that is not the semantics you want);
  - NULL text hashes like the empty distinct value (digest NULL):
    NULL vs NULL compares unchanged, NULL vs non-NULL changed —
    null-safe equality, both engines state it explicitly.

Scale shape (100 TB): digests are computed in the scan projection, so
the full-outer shuffle join carries (key, 32-byte digest) — never the
document bodies. One shuffle on the key both sides, AQE-planned;
the summary is a partial-aggregable count over the diff's output.
A 10^12-row previous corpus diffed against a 10^10-row snapshot is
exactly the incremental-merge shape operators/dedup.py already uses:
batch-vs-corpus on a hash-distributed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def corpus_diff(
    previous: DataFrame,
    current: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, status, prev_digest, cur_digest) — one row per url seen
    in EITHER snapshot, classified under the frozen rule above. The
    projection to digests happens before the join, so the shuffle is
    digest-width regardless of document size."""
    # presence is carried by marker columns, not digest nullness: a
    # NULL text on a present side must not masquerade as absence.
    prev = previous.select(
        F.col(key_col).alias("key"),
        F.md5(text_col).alias("prev_digest"),
        F.lit(True).alias("__p"),
    )
    cur = current.select(
        F.col(key_col).alias("key"),
        F.md5(text_col).alias("cur_digest"),
        F.lit(True).alias("__c"),
    )
    joined = prev.join(cur, "key", "full_outer")
    status = (
        F.when(F.col("__p").isNull(), F.lit("added"))
        .when(F.col("__c").isNull(), F.lit("removed"))
        .when(F.col("prev_digest").eqNullSafe(F.col("cur_digest")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "key", status.alias("status"), "prev_digest", "cur_digest"
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_urls) for all four statuses — absent statuses emit
    an explicit 0 row (fixed-schema counters, the corpus_job stats
    discipline), ordering left to the caller."""
    spark = diff.sparkSession
    statuses = spark.createDataFrame(
        [(s,) for s in STATUSES], "status string"
    )
    counts = diff.groupBy("status").agg(F.count("*").alias("n_urls"))
    return statuses.join(counts, "status", "left").select(
        "status", F.coalesce("n_urls", F.lit(0)).alias("n_urls")
    )


def change_rates(
    history: DataFrame,
    key_col: str = "url",
    ts_col: str = "snap_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-url change-rate estimation over a MULTI-snapshot history —
    the recrawl-scheduling signal: how often does this page actually
    change, and how soon is a refetch worth it.

    Input is url-grain observation history ``(url, snap_ts, digest)``
    accumulated across crawls (:func:`corpus_diff` digests stacked over
    time, or the pages table with scan-side md5). Frozen estimator
    (stated so the DuckDB oracle restates it exactly):

    - duplicate ``(url, snap_ts)`` observations collapse to
      ``min(digest)`` first (the deterministic field-wise-min
      tie-break used across the discovery operators);
    - per url ordered by ``snap_ts``: ``n_obs`` observations,
      ``n_changes`` = consecutive pairs whose digests differ
      (null-safe: NULL vs NULL is no change, NULL vs value is one),
      ``span_s`` = seconds from first to last observation, ``last_ts``
      = the newest observation (the recrawl scheduler's anchor);
    - the Cho & Garcia-Molina bias-corrected Poisson estimator over
      binary change observations ("Estimating Frequency of Change",
      ACM TOIT 3(3), 2003): with ``I = n_obs - 1`` intervals and
      ``X = n_changes``, the per-interval rate is
      ``r = -ln((I - X + 0.5) / (I + 0.5))`` and the page's rate is
      ``rate_per_day = r / (span_s / I) * 86400``, rounded to 6;
    - ``recrawl_days = 1 / rate_per_day`` (rounded to 6) — NULL when
      the rate is 0 (never observed changing: no evidence supports any
      finite interval; schedule by policy, not by the estimator);
    - urls with a single observation or zero span emit ``n_obs`` with
      NULL rate columns: no interval, no estimate.

    Scale shape (100 TB): digests are 32 bytes, so the history table is
    tiny per row; ONE hash exchange on the url serves everything — the
    (url, ts) collapse rides the SAME url-partitioned sorted window as
    the lag (first row per ts with digests nulls-last == aggregate
    min), and the final aggregate reuses the window's partitioning.
    Plan-tested at exchange_count == 1. Output is url-grain, orders of
    magnitude below page grain."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        "ts", F.col("digest").asc_nulls_last()
    )
    flagged = history.select(
        F.col(key_col).alias("url"),
        # parquet written without Spark carries TIMESTAMP_NTZ, which
        # refuses the epoch cast; normalize to session-tz timestamp
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn(
        # first row of each (url, ts) run carries the min non-null
        # digest (nulls-last sort == SQL aggregate-min semantics)
        "__keep",
        ~F.lag("ts").over(w).eqNullSafe(F.col("ts")),
    )
    obs = flagged.filter("__keep")
    chg = obs.select(
        "url",
        "ts",
        (
            ~F.lag("digest").over(w).eqNullSafe(F.col("digest"))
            & ~F.lag("ts").over(w).isNull()
        ).cast("long").alias("chg"),
    )
    agg = chg.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum("chg").alias("n_changes"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("span_s"),
        F.max("ts").alias("last_ts"),
    )
    i = F.col("n_obs") - 1
    r = -F.log((i - F.col("n_changes") + 0.5) / (i + 0.5))
    # + 0.0 normalizes the IEEE -0.0 that -ln(1) produces at X = 0
    rate = F.round(r / (F.col("span_s") / i) * 86400.0 + 0.0, 6)
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        "span_s",
        "last_ts",
        F.when((i > 0) & (F.col("span_s") > 0), rate).alias("rate_per_day"),
        F.when(
            (i > 0) & (F.col("span_s") > 0) & (F.col("n_changes") > 0),
            F.round(1.0 / rate, 6),
        ).alias("recrawl_days"),
    )
