"""Streaming corpus ingestion: the continuous counterpart of
jobs/corpus_job.py, as one spark-submit entrypoint.

    spark-submit --master <cluster> --py-files dist/engine.zip \\
        jobs/stream_job.py \\
        --input  /path/to/pages_parquet_dir \\
        --output /path/to/corpus \\
        --checkpoint /path/to/ckpt \\
        [--min-quality 0.5] [--min-tokens 5] [--gopher] \\
        [--entropy-min X] [--lm-ref PATH --lm-max-bits X] \\
        [--max-compression X] \\
        [--available-now] [--python-parallelism N]

New page files landing in ``--input`` are picked up by the file
source; each microbatch runs the SAME narrow transform chain as the
batch job (extract → quality/lang score → filters → optional Gopher
rules — pytest pins microbatch == batch for every stage), and the
checkpoint gives exactly-once output across restarts (file-source
offsets + sink manifest — the streaming form of the batch job's
resume anti-join).

Exact dedup is deliberately NOT inline here: content-hash dedup
across an unbounded stream is unbounded state. The engine's choice is
the stateful MinHash dedup stream (streaming/dedup_stream.py) as a
downstream stage, or periodic batch compaction with
operators/dedup.merge_corpus — both documented, both tested.

``--available-now`` drains what exists and stops (replay/backfill
mode); omit it for a long-running job.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--langs", default=None, help="comma list; default: keep all")
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--entropy-min", type=float, default=None)
    ap.add_argument("--lm-ref", default=None)
    ap.add_argument("--lm-max-bits", type=float, default=None)
    ap.add_argument("--max-compression", type=float, default=None)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--python-parallelism", type=int, default=None)
    args = ap.parse_args()
    if (args.lm_ref is None) != (args.lm_max_bits is None):
        ap.error("--lm-ref and --lm-max-bits must be given together"
                 " (one alone would silently skip the LM filter stage)")

    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-stream")
    q = run_stream(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        langs=args.langs.split(",") if args.langs else None,
        gopher=args.gopher,
        entropy_min=args.entropy_min,
        lm_ref_path=args.lm_ref,
        lm_max_bits=args.lm_max_bits,
        max_compression=args.max_compression,
        available_now=args.available_now,
        python_parallelism=args.python_parallelism,
    )
    q.awaitTermination()
    spark.stop()


def run_stream(
    spark,
    input_path: str,
    output_path: str,
    checkpoint: str,
    min_quality: float = 0.5,
    min_tokens: int = 5,
    langs: list[str] | None = None,
    gopher: bool = False,
    entropy_min: float | None = None,
    lm_ref_path: str | None = None,
    lm_max_bits: float | None = None,
    max_compression: float | None = None,
    available_now: bool = True,
    python_parallelism: int | None = None,
):
    """Start the streaming query (importable for tests). Returns the
    StreamingQuery handle. The quality-signal stages mirror the batch
    job exactly (same operators, same thresholds, same null-keeps
    rule) — every stage is narrow, so all are streaming-legal."""
    from ocrd_segment_spark.operators.corpus_filters import (
        KEEP_COLS,
        keep_all,
        with_keep_flags,
    )
    from ocrd_segment_spark.streaming.extract_stream import stream_extract

    lm_table = None
    if lm_ref_path is not None and lm_max_bits is not None:
        # per-language reference LMs collected ONCE before the stream
        # starts (model-sized, batch read) — microbatches only fold
        from ocrd_segment_spark.operators.textstats import (
            bigram_lm_models_by_lang,
            collect_lm_surprisal,
        )

        lm_table = collect_lm_surprisal(
            bigram_lm_models_by_lang(spark.read.parquet(lm_ref_path))
        )

    def score_and_filter(extracted):
        # pred_lang arrives from the extraction pass itself
        # (stream_extract(lang_id=True) below). The SAME shared stage
        # chain as jobs/corpus_job.py — the batch job keeps the flags
        # for its funnel Observations; the stream conjoins and drops.
        flagged = with_keep_flags(
            extracted,
            min_quality=min_quality,
            min_tokens=min_tokens,
            langs=langs,
            gopher=gopher,
            entropy_min=entropy_min,
            lm_table=lm_table,
            lm_max_bits=lm_max_bits,
            max_compression=max_compression,
            python_parallelism=python_parallelism,
            # the stream needs no per-stage drop counts, so failing
            # rows drop BEFORE the Python LM/compression stages
            # (predicates don't push through mapInPandas on their own)
            early_filter=True,
        )
        return flagged.filter(keep_all()).drop(*KEEP_COLS)

    # the exactly-once source/sink scaffolding lives in stream_extract;
    # this job only supplies the score/filter chain
    return stream_extract(
        spark,
        input_path,
        output_path,
        checkpoint,
        available_now=available_now,
        transform=score_and_filter,
        python_parallelism=python_parallelism,
        lang_id=True,
    )


if __name__ == "__main__":
    main()
