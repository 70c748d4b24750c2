"""Output compaction job: many small parquet files → size-targeted few.

    python tools/package.py                       # → dist/engine.zip
    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        jobs/compact_job.py \\
        --input  /path/to/table \\
        --output /path/to/compacted \\
        [--target-mb 256] [--sort-by url]

The streaming sink appends one file per microbatch partition and the
extract job appends per resume attempt — after a week of continuous
ingestion a table is thousands of KB-sized files, and every downstream
scan pays per-file open/footer costs (the classic small-files problem;
Iceberg calls the fix "rewrite data files"). This job rewrites the
table at a target file size:

- the partition count is ceil(input bytes / target), computed from the
  FILE LISTING (no data scan) — parquet compresses roughly 1:1 when
  rewritten from parquet, so input bytes are the honest estimate;
- ``--sort-by`` optionally repartitions BY RANGE on the given column
  and sorts within partitions — co-locating a read key (url, host)
  turns downstream point lookups into partition+row-group pruning
  instead of full scans. Without it, a plain repartition round-robins
  rows (pure rebalance, one shuffle, no skew sensitivity);
- the row MULTISET is exactly preserved (pytest-pinned) — compaction
  is a physical rewrite, never a semantic one;
- output goes to a NEW directory: swapping it over the old table is
  the caller's atomic-rename/catalog step, not this job's (a failed
  compaction must never have touched the live table).

Scale shape: one shuffle (rebalance or range), then a straight write.
The listing walk is driver-side metadata only.
"""

from __future__ import annotations

import argparse
import math


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-mb", type=int, default=256)
    ap.add_argument(
        "--sort-by", default=None,
        help="range-partition + sort within partitions on this column"
        " (read-key co-location); default is a plain rebalance",
    )
    args = ap.parse_args()
    if args.target_mb < 1:
        ap.error("--target-mb must be >= 1")

    from pyspark.sql import functions as F

    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-compact")

    # driver-side listing walk (metadata only, no data scan)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(args.input)
    fs = path.getFileSystem(conf)
    total = 0
    n_files = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        total += st.getLen()
        n_files += 1

    n_parts = max(1, math.ceil(total / (args.target_mb * 1024 * 1024)))
    df = spark.read.parquet(args.input)
    if args.sort_by is not None:
        out = df.repartitionByRange(n_parts, F.col(args.sort_by)).sortWithinPartitions(args.sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode("error").parquet(args.output)
    print(
        f"COMPACT {{'files_in': {n_files}, 'bytes_in': {total},"
        f" 'partitions_out': {n_parts}}}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
