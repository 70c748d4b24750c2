"""The production entrypoint (north_rule: 'run via spark-submit
--py-files on a multi-executor cluster').

    python tools/package.py                       # → dist/engine.zip
    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        jobs/extract_job.py \\
        --input  /path/to/pages_parquet \\
        --output /path/to/extracted \\
        --metrics /path/to/metrics \\
        [--no-resume] [--python-parallelism N] [--sniff-charset] \\
        [--max-link-density 0.5] [--min-region-chars 2] \\
        [--simplify-gap 0] [--spread 0]

The job is idempotent: re-submitting after a failure resumes from the
committed output (anti-join on url).
"""

from __future__ import annotations

import argparse

def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--python-parallelism", type=int, default=None)
    ap.add_argument(
        "--sniff-charset", action="store_true",
        help="charset-repair pre-stage: decode legacy/BOM pages to"
        " clean utf-8 before extraction (functions/charset)",
    )
    ap.add_argument(
        "--input-format", choices=("pages", "warc", "warc-gz"),
        default="pages",
        help="'pages' = canonical (url, html) parquet; 'warc' ="
        " parquet of WARC segment blobs (binary 'data' column);"
        " 'warc-gz' = per-record-gzipped segments (sources/warc)",
    )
    ap.add_argument(
        "--warc-keep-all", action="store_true",
        help="keep every parsable WARC response record (default gates"
        " on HTTP 200 + text/html)",
    )
    ap.add_argument(
        "--warc-byte-exact", action="store_true",
        help="parse WARC records with the python byte walk + HTTP"
        " Content-Encoding decode: Content-Length slices in BYTES and"
        " gzip/deflate bodies inflate before extraction — use for"
        " archives carrying compressed or non-UTF-8 payloads (the"
        " default JVM string scan is faster but char-sliced)",
    )
    ap.add_argument(
        "--preserve-pre", action="store_true",
        help="extract <pre> subtrees with VERBATIM whitespace (kernel"
        " 1.6.0 params.preserve_pre): code blocks keep indentation"
        " and blank lines instead of the collapse-and-join rule",
    )
    ap.add_argument("--max-link-density", type=float, default=0.5)
    ap.add_argument("--min-region-chars", type=int, default=2)
    ap.add_argument("--simplify-gap", type=int, default=0)
    ap.add_argument("--spread", type=int, default=0)
    args = ap.parse_args()

    from ocrd_segment_spark.config import ExtractParams
    from ocrd_segment_spark.pipeline import run_extract
    from ocrd_segment_spark.session import submit_session

    # submit_session applies the engine tuning (notably the 512-row
    # Arrow batch bound — tens-of-KB html blobs × the 10000-row default
    # is the known Python-worker OOM mode) while leaving master and
    # executor sizing to spark-submit.
    spark = submit_session("ocrd-segment-extract")
    params = ExtractParams(
        max_link_density=args.max_link_density,
        min_region_chars=args.min_region_chars,
        simplify_gap_tolerance=args.simplify_gap,
        spread_chars=args.spread,
        preserve_pre=args.preserve_pre,
    )
    run_extract(
        spark,
        args.input,
        args.output,
        params=params,
        resume=not args.no_resume,
        metrics_path=args.metrics,
        python_parallelism=args.python_parallelism,
        sniff_charset=args.sniff_charset,
        input_format=args.input_format,
        warc_keep_all=args.warc_keep_all,
        warc_byte_exact=args.warc_byte_exact,
    )
    spark.stop()


if __name__ == "__main__":
    main()
