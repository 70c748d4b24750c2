"""Round-6 optimization harness — isolated stage timings (guide §1.4).

NOT the driver bench (bench.py is frozen): this file exists to time
individual operators/stages with the noop sink and experiment variants
side by side. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        extract_base extract_scan ...

Each experiment prints one JSON line {"name":..., "t": best_sec,
"runs": [...]}. Experiments share one session (matching bench.py's
config: local[$SPARK_GRAFT_CPUS], 4m split size, arrow batch 512).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ocrd_segment_spark.session import build_session
from ocrd_segment_spark.pipeline import extract_pages

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_PAGES = max(1000, int(1_000_000 * _SF))
from ocrd_segment_spark.fixtures import FIXTURES_VERSION

PAGES_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench",
    f"pages_{N_PAGES}_v{FIXTURES_VERSION}",
)
PAR = max(2, CPUS // 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = build_session(
        app="bench_extra",
        master=f"local[{CPUS}]",
        extra={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = lambda: spark.read.parquet(PAGES_DIR)

    def t_extract_base():
        df = extract_pages(pages(), python_parallelism=PAR)
        df.agg(F.sum(F.length("extracted_text"))).collect()

    def t_extract_noop():
        noop(extract_pages(pages(), python_parallelism=PAR))

    def t_extract_lang():
        df = extract_pages(pages(), python_parallelism=PAR, lang_id=True)
        df.agg(F.sum(F.length("extracted_text"))).collect()

    def t_extract_scan():
        # floor: scan + coalesce only, no python stage
        pages().select("url", "html").coalesce(PAR).agg(
            F.sum(F.length("html"))
        ).collect()

    def t_extract_passthrough():
        # Arrow round-trip floor: mapInPandas that only echoes url/html
        import pandas as pd

        src = pages().select("url", "html").coalesce(PAR)

        def fn(it):
            for pdf in it:
                yield pd.DataFrame({"url": pdf["url"], "n": pdf["html"].str.len()})

        df = src.mapInPandas(fn, "url string, n long")
        df.agg(F.sum("n")).collect()

    def t_extract_par32():
        df = extract_pages(pages(), python_parallelism=32)
        df.agg(F.sum(F.length("extracted_text"))).collect()

    def t_extract_par24():
        df = extract_pages(pages(), python_parallelism=24)
        df.agg(F.sum(F.length("extracted_text"))).collect()

    def t_corpus_job():
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        outdir = tempfile.mkdtemp(prefix="bx_corpus_")
        try:
            build_corpus(
                spark,
                PAGES_DIR,
                os.path.join(outdir, "corpus"),
                near_dup_audit=os.path.join(outdir, "neardup"),
                python_parallelism=PAR,
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    def t_corpus_job_signals():
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        outdir = tempfile.mkdtemp(prefix="bx_corpus_sig_")
        try:
            build_corpus(
                spark,
                PAGES_DIR,
                os.path.join(outdir, "corpus"),
                gopher=True,
                entropy_min=1.0,
                lm_ref_path=f"{SF_DIR}/documents.parquet",
                lm_max_bits=20.0,
                max_compression=0.995,
                python_parallelism=PAR,
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    def t_corpus_no_audit():
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        outdir = tempfile.mkdtemp(prefix="bx_corpus_na_")
        try:
            build_corpus(
                spark,
                PAGES_DIR,
                os.path.join(outdir, "corpus"),
                python_parallelism=PAR,
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    def t_neardup_audit():
        # the audit half alone, over a pre-written corpus
        import shutil
        import tempfile

        from pyspark.sql import Observation
        from ocrd_segment_spark.operators.dedup import (
            jaccard_verify_pairs,
            minhash_lsh_candidates,
        )

        outdir = tempfile.mkdtemp(prefix="bx_audit_")
        try:
            corpus = spark.read.parquet(_corpus_cache(spark))
            cands = minhash_lsh_candidates(
                corpus, id_col="url", text_col="extracted_text"
            )
            verified = jaccard_verify_pairs(
                corpus, cands, id_col="url", text_col="extracted_text"
            )
            verified.write.mode("overwrite").parquet(
                os.path.join(outdir, "neardup")
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    _CORPUS_CACHE = []

    def _corpus_cache(spark):
        if not _CORPUS_CACHE:
            from jobs.corpus_job import build_corpus

            path = os.path.join("/tmp", f"bx_corpus_cache_{N_PAGES}")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                build_corpus(
                    spark, PAGES_DIR, path, python_parallelism=PAR
                )
            _CORPUS_CACHE.append(path)
        return _CORPUS_CACHE[0]

    experiments = {
        "extract_base": t_extract_base,
        "extract_noop": t_extract_noop,
        "extract_lang": t_extract_lang,
        "extract_scan": t_extract_scan,
        "extract_passthrough": t_extract_passthrough,
        "extract_par32": t_extract_par32,
        "extract_par24": t_extract_par24,
        "corpus_job": t_corpus_job,
        "corpus_job_signals": t_corpus_job_signals,
        "corpus_no_audit": t_corpus_no_audit,
        "neardup_audit": t_neardup_audit,
    }
    names = sys.argv[1:] or list(experiments)
    # warmup: worker spawn + codegen
    extract_pages(
        pages().limit(1000), python_parallelism=PAR
    ).agg(F.count("*")).collect()
    for name in names:
        fn = experiments[name]
        runs = []
        for _ in range(2):
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"name": name, "t": min(runs), "runs": runs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
