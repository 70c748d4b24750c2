"""Scale-safe dense-id assignment (the parallel re-expression of the
reference's mutable id counters, extract_pages.py:177-198).

A bare ``row_number().over(W.orderBy(key))`` is a SINGLE-PARTITION
global sort — the whole corpus lands on one task, the classic
100 TB collapse. ``ranked_ids`` computes the exact same ids with the
standard two-phase zipWithIndex-style construction, kept entirely in
the DataFrame API:

1. bucket every row by an ORDER-ALIGNED, DATA-DERIVED expression
   (a key prefix for strings, ``floor(key / width)`` for numerics) —
   deterministic, unlike sampled range partitioning;
2. per-bucket counts → cumulative offsets (tiny table: one row per
   bucket; its own window is single-partition over #buckets rows,
   which is the cheap side by construction);
3. ``row_number`` windows partitioned BY BUCKET (parallel) plus the
   broadcast offset.

Order-aligned means bucket(a) < bucket(b) implies key(a) < key(b), so
(bucket, within-bucket rank) equals the global rank. Choose bucket
granularity so #buckets stays ~1e3-1e6 (offsets must broadcast) while
no single bucket is corpus-sized (a bucket is one window partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def ranked_ids(
    df: DataFrame, order_cols: list[str], id_name: str, bucket: Column
) -> DataFrame:
    """Add ``id_name``: 1-based dense ids identical to
    ``row_number().over(W.orderBy(*order_cols))`` (ties broken by the
    full order_cols list, which must be a total order), without any
    corpus-wide single-partition sort. ``bucket`` must be order-aligned
    with ``order_cols[0]`` (see module docstring)."""
    b = df.withColumn("_bkt", bucket)
    counts = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.select(
        "_bkt", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    w = W.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offs), "_bkt")
        .withColumn(id_name, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_bkt", "_off")
    )
