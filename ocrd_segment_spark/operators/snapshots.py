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
