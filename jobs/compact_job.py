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


def compact(
    spark,
    input_path: str,
    output_path: str,
    target_mb: int = 256,
    sort_by: str | None = None,
) -> dict:
    """The job body (importable for tests). Returns the stats dict."""
    from pyspark.sql import functions as F

    # driver-side listing walk (metadata only, no data scan). A path
    # COMPONENT check, not a leaf-name check: files under _temporary/
    # or .staging/ directories (a crashed writer's leftovers) carry
    # ordinary leaf names but are invisible to spark.read, and
    # counting them would overestimate the partition count
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(input_path)
    fs = path.getFileSystem(conf)
    base = str(fs.makeQualified(path).toString()).rstrip("/") + "/"
    total = 0
    n_files = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        rel = str(st.getPath().toString())
        rel = rel[len(base):] if rel.startswith(base) else rel
        if any(c.startswith(("_", ".")) for c in rel.split("/")):
            continue
        total += st.getLen()
        n_files += 1

    n_parts = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(input_path)
    if sort_by is not None:
        out = df.repartitionByRange(
            n_parts, F.col(sort_by)
        ).sortWithinPartitions(sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode("error").parquet(output_path)
    stats = {
        "files_in": n_files,
        "bytes_in": total,
        "partitions_out": n_parts,
    }
    print(f"COMPACT {stats}")
    return stats


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

    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-compact")
    compact(
        spark, args.input, args.output,
        target_mb=args.target_mb, sort_by=args.sort_by,
    )
    spark.stop()


if __name__ == "__main__":
    main()
