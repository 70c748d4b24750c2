"""Benchmark harness — prints ONE JSON line.

Headline: extraction throughput (pages/sec) over a seeded synthetic
pages corpus sized to the scale factor, plus the heavy contract
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32).

The N→4N scaling-efficiency evidence (north_rule) is produced by
``tools/bench_scaling.py`` which runs the same extraction job at
local[8] and local[32] and writes BENCH/BASELINE.md.
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
from ocrd_segment_spark import contract as C
from ocrd_segment_spark import contract_graph as G
from ocrd_segment_spark import contract_ml as M
from ocrd_segment_spark import contract_web as WB
from ocrd_segment_spark import contract_pages as PG
from ocrd_segment_spark.functions.sublevels import words_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOAD_GATE = 3.0  # external cores above this = co-tenant flare (CLAUDE.md)
MAX_EXTRA_RUNS = 2  # bounded retries per query when every attempt was hot
# pages corpus sized to scale factor: sf0.1 → 100k pages (big enough to
# amortize the ~4s fixed task-launch/Arrow-warmup cost per query)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_PAGES = max(1000, int(1_000_000 * _SF))
from ocrd_segment_spark.fixtures import FIXTURES_VERSION

PAGES_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench",
    f"pages_{N_PAGES}_v{FIXTURES_VERSION}",
)


def _gen_shard(args):
    i, n = args
    from ocrd_segment_spark.fixtures import gen_pages

    rows = gen_pages(n, seed=42 + i)
    for r in rows:
        r["url"] = r["url"].replace("page", f"s{i}p")
    return rows


def ensure_pages(spark) -> str:
    if not os.path.exists(os.path.join(PAGES_DIR, "_SUCCESS")):
        import multiprocessing as mp

        import pandas as pd

        n_shards = 16
        with mp.Pool(n_shards) as p:
            shards = p.map(_gen_shard, [(i, N_PAGES // n_shards) for i in range(n_shards)])
        pdf = pd.DataFrame([r for s in shards for r in s])
        spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(
            PAGES_DIR
        )
    return PAGES_DIR


# realistic-size corpus: Common-Crawl-ish mean page is ~18 KB of HTML;
# the fixture pages are ~1 KB, so bytes/sec there flatters nothing —
# this corpus pins the MB/s headline the 100 TB projection rests on
# (BENCH/BASELINE.md "Realistic page sizes").
N_BIG = 10_000
BIG_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench", f"big_pages_{N_BIG}_v1"
)


def _gen_big_shard(args):
    import random

    i, n = args
    rows = []
    for k in range(n):
        rng = random.Random(7_000_000 + i * 1_000_000 + k)
        vocab = [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 9)))
            for _ in range(500)
        ]
        paras = [
            "<p>" + " ".join(rng.choices(vocab, k=60)) + "</p>" for _ in range(40)
        ]
        rows.append(
            {
                "url": f"big-s{i}p{k}",
                "html": (
                    f"<html><body><h1>section {i} page {k}</h1>"
                    f"{''.join(paras)}</body></html>"
                ).encode(),
            }
        )
    return rows


def ensure_big_pages(spark) -> str:
    if not os.path.exists(os.path.join(BIG_DIR, "_SUCCESS")):
        import multiprocessing as mp

        import pandas as pd

        n_shards = 16
        with mp.Pool(n_shards) as p:
            shards = p.map(
                _gen_big_shard, [(i, N_BIG // n_shards) for i in range(n_shards)]
            )
        pdf = pd.DataFrame([r for s in shards for r in s])
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
            BIG_DIR
        )
    return BIG_DIR


class ExternalLoad:
    """Per-attempt co-tenant load, measured DURING the attempt.

    The 1-min loadavg cannot gate individual attempts: this bench's own
    32-core bursts dominate it for ~2 min after every run, so a
    pre-attempt loadavg sample mostly reads our own decaying load (and
    waiting it out would stretch the bench ~10×). Instead attribute CPU
    directly: host busy jiffies (/proc/stat, host-wide on this box)
    minus this container's cpuacct usage = cores burned by co-tenants
    while the attempt ran. Verified: a 2-core self-burn reads ~0.02
    external cores. Round-4 postmortem: corpus_job recorded 44.8 s at
    gate-passing start-load 1.7 because the flare arrived minutes after
    the single start-of-bench sample; this closes that window.
    """

    def __init__(self) -> None:
        self.hz = os.sysconf("SC_CLK_TCK") or 100
        self.ok = True
        try:
            self._snap()
        except OSError:
            self.ok = False

    def _snap(self):
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        # fields: user nice system idle iowait irq softirq steal guest
        # guest_nice — guest/guest_nice are ALREADY inside user/nice,
        # so summing all ten would double-count co-tenant VMs; sum the
        # first eight only
        busy = sum(vals[:8]) - vals[3] - vals[4]  # minus idle+iowait
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            own_ns = int(f.read())
        return busy, own_ns, time.monotonic()

    def start(self) -> None:
        # a transient read failure mid-bench must disable the feature,
        # never abort a multi-minute run
        if self.ok:
            try:
                self._t0 = self._snap()
            except OSError:
                self.ok = False
                return
            # 1 Hz sampler for the PEAK: a multi-stage job stalled by
            # a 20-core burst for 3 s reads a harmless AVERAGE over a
            # 30 s run — the max 1 s delta is what explains a 3×
            # inflation the mean hides (observed: corpus_job 34.7 s at
            # avg ext 2.0)
            import threading

            self._peak = 0.0
            self._stop_evt = threading.Event()

            def sample():
                prev = self._t0
                while not self._stop_evt.wait(1.0):
                    try:
                        cur = self._snap()
                    except OSError:
                        return
                    b0, o0, w0 = prev
                    b1, o1, w1 = cur
                    wall = max(w1 - w0, 1e-6)
                    e = (b1 - b0) / self.hz / wall - (o1 - o0) / 1e9 / wall
                    self._peak = max(self._peak, e)
                    prev = cur

            self._thr = threading.Thread(target=sample, daemon=True)
            self._thr.start()

    def stop(self):
        """(avg, peak-1s) external cores during start()→stop(), or
        (None, None)."""
        if not self.ok:
            return None, None
        self._stop_evt.set()
        self._thr.join(timeout=2.0)
        try:
            b1, o1, w1 = self._snap()
        except OSError:
            self.ok = False
            return None, None
        b0, o0, w0 = self._t0
        wall = max(w1 - w0, 1e-6)
        ext = (b1 - b0) / self.hz / wall - (o1 - o0) / 1e9 / wall
        return round(max(ext, 0.0), 1), round(max(self._peak, 0.0), 1)


def main() -> None:
    # co-tenant gate (CLAUDE.md: accept perf numbers only when the
    # 1-min load is < ~3): sample BEFORE any Spark work — the finish
    # sample below necessarily includes this bench's own 32-core load,
    # so only the start sample reads the external contention level.
    # If the box is hot, wait BRIEFLY for a calmer window (bounded at
    # 90 s so an unattended driver run can never stall), then proceed
    # and record whatever level we actually started at.
    waited = 0
    while os.getloadavg()[0] >= 3.0 and waited < 90:  # same bar as the gate
        time.sleep(15)
        waited += 15
    load_1m_start = round(os.getloadavg()[0], 1)
    spark = build_session(
        app="bench",
        master=f"local[{CPUS}]",
        extra={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            # testdata tables are single ~10 MB parquet files; default
            # 128 MB split size would scan them on one core
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = ensure_pages(spark)
    big_path = ensure_big_pages(spark)

    def bench_extract():
        df = extract_pages(
            spark.read.parquet(pages_path), python_parallelism=max(2, CPUS // 2)
        )
        # sum(length) forces full kernel execution without driver collect
        df.agg(F.sum(F.length("extracted_text"))).collect()

    def bench_corpus():
        # whole training-corpus pipeline: extract → score → filter →
        # exact dedup → write, plus the LSH-then-verify near-dup audit
        # — the non-extract surface as ONE standing number so
        # regressions there are visible round-over-round
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        outdir = tempfile.mkdtemp(prefix="bench_corpus_")
        try:
            build_corpus(
                spark,
                pages_path,
                os.path.join(outdir, "corpus"),
                near_dup_audit=os.path.join(outdir, "neardup"),
                python_parallelism=max(2, CPUS // 2),
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    def bench_corpus_signals():
        # corpus pipeline with EVERY quality stage on (gopher rules +
        # entropy + per-language reference LM + compression) — the
        # standing number for the round-3/4 signal surface; documents
        # .parquet doubles as the LM reference (it carries text+lang)
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        outdir = tempfile.mkdtemp(prefix="bench_corpus_sig_")
        try:
            build_corpus(
                spark,
                pages_path,
                os.path.join(outdir, "corpus"),
                gopher=True,
                entropy_min=1.0,
                lm_ref_path=f"{SF_DIR}/documents.parquet",
                lm_max_bits=20.0,
                max_compression=0.995,
                python_parallelism=max(2, CPUS // 2),
            )
        finally:
            shutil.rmtree(outdir, ignore_errors=True)

    def corpus_warmup():
        # untimed: the FIRST audited corpus run in a JVM pays one-time
        # JIT/shuffle-codegen cost for the LSH+verify machinery
        # (measured 66 s cold vs 18 s warm); a 5k-page pass absorbs it
        import shutil
        import tempfile

        from jobs.corpus_job import build_corpus

        wdir = tempfile.mkdtemp(prefix="bench_corpus_warm_")
        try:
            sub = os.path.join(wdir, "pages")
            spark.read.parquet(pages_path).limit(5000).coalesce(8).write.parquet(sub)
            build_corpus(
                spark,
                sub,
                os.path.join(wdir, "corpus"),
                near_dup_audit=os.path.join(wdir, "neardup"),
                python_parallelism=max(2, CPUS // 2),
            )
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    def bench_word_spans():
        # sublevel derivation throughput in isolation (pure column
        # expressions over full-document spans; JVM-only, no Python).
        # documents.parquet is a single ~1.5 MB split — repartition so
        # the measurement covers the operator across cores, not one
        # task (at corpus scale the input arrives pre-split).
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        df = d.select(
            F.col("doc_id").cast("string").alias("url"),
            F.col("text").alias("extracted_text"),
            F.expr(
                "array(named_struct('region_id','r0001','rtype','paragraph',"
                "'subtype','p','start',0L,'end',cast(length(text) as bigint),"
                "'parent_id','','order',0,'score',cast(1.0 as double)))"
            ).alias("region_spans"),
        )
        words_table(df, 8).agg(F.count("*"), F.sum("start")).collect()

    def bench_url_templates():
        # templatization + mining over the full documents table:
        # urls synthesized with host/section/hex/query variety so the
        # template group-by sees realistic cardinality
        from ocrd_segment_spark.operators.urltraps import template_stats

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        fx = d.selectExpr(
            "concat('https://h', cast(doc_id % 97 as string), '.org/sec/',"
            " cast(doc_id % 13 as string), '/item/',"
            " md5(cast(doc_id as string)), '?page=',"
            " cast(doc_id % 7 as string), '&ref=x') as url"
        )
        template_stats(fx).agg(F.sum("n_urls")).collect()

    def bench_change_rates():
        # 4 snapshots per url, alternating digests — the full
        # window+aggregate path on one url-keyed exchange
        from ocrd_segment_spark.operators.snapshots import change_rates

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        h = d.selectExpr(
            "concat('u', cast(doc_id as string)) as url",
            "explode(sequence(0, 3)) as s",
        ).selectExpr(
            "url",
            "timestamp_seconds(bigint(1700000000) + s * 86400) as snap_ts",
            "concat('d', cast(cast(s / 2 as int) as string)) as digest",
        )
        change_rates(h).agg(F.sum("n_changes")).collect()

    def bench_redirect_resolve():
        # one 4-hop chain per document: pointer doubling walks every
        # chain in ceil(log2(8)) = 3 join rounds
        from ocrd_segment_spark.operators.redirects import resolve_redirects

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
        edges = d.selectExpr("doc_id", "explode(sequence(0, 3)) as i").selectExpr(
            "concat('https://h', cast(doc_id as string), '.org/r/',"
            " cast(i as string)) as src",
            "concat('https://h', cast(doc_id as string), '.org/r/',"
            " cast(i + 1 as string)) as dst",
        )
        resolve_redirects(edges, max_hops=8).agg(F.sum("hops")).collect()

    def bench_pdf_extract():
        # the PDF codec lane: one uncompressed single-stream pdf per
        # document (delimiter chars stripped so the text is one
        # literal string), full parse + text assembly throughput
        from ocrd_segment_spark.sources.pdf import pdf_text

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        fx = d.selectExpr(
            "cast(doc_id as string) as url",
            "cast(concat('%PDF-1.4\\n1 0 obj\\n<< >>\\nstream\\nBT (',"
            " translate(text, '()\\\\', ''),"
            " ') Tj ET\\nendstream\\nendobj\\n') as binary) as data",
        )
        pdf_text(fx, python_parallelism=max(2, CPUS // 2)).agg(
            F.sum(F.length("text"))
        ).collect()

    # JVM-only queries first — mapInPandas stages spawn 16+ Python
    # worker processes whose residual memory pressure inflates later
    # JVM-side timings ~2× (measured); extraction runs last, after an
    # untimed warmup that absorbs worker spawn + codegen.
    heavies = {
        "pricing_summary": lambda: C.q_a_pricing_summary(spark, SF_DIR).collect(),
        "j2_overlap_theta_join": lambda: C.q_j2_overlap_theta_join(spark, SF_DIR).collect(),
        "g9_simplify_gap_merge": lambda: C.q_g9_simplify_gap_merge(spark, SF_DIR).collect(),
        "dedup_minhash_lsh": lambda: M.q_dedup_minhash_lsh(spark, SF_DIR).collect(),
        "dedup_ngram_jaccard": lambda: M.q_dedup_ngram_jaccard(spark, SF_DIR).count(),
        "dedup_simhash": lambda: M.q_dedup_simhash(spark, SF_DIR).count(),
        "ann_cosine_topk": lambda: M.q_ann_cosine_topk(spark, SF_DIR).collect(),
        "events_hourly_window": lambda: M.q_events_hourly_window(spark, SF_DIR).collect(),
        "paragraph_dedup": lambda: M.q_paragraph_dedup(spark, SF_DIR).count(),
        "decontaminate": lambda: M.q_decontaminate(spark, SF_DIR).count(),
        "substring_dedup": lambda: M.q_dedup_exact_substring(spark, SF_DIR).count(),
        "word_spans_derive": bench_word_spans,
        # round-5 session-3 operators (all JVM-side)
        "sentence_spans": lambda: G.q_sentence_spans(spark, SF_DIR).count(),
        "corpus_diff": lambda: G.q_corpus_diff(spark, SF_DIR).count(),
        "bpe_train_merges": lambda: G.q_bpe_train_merges(spark, SF_DIR).collect(),
        # round-5 session-4 operators (all JVM-side)
        "hits_scores": lambda: WB.q_hits_scores(spark, SF_DIR).collect(),
        "cms_heavy_hitters": lambda: WB.q_cms_heavy_hitters(spark, SF_DIR).collect(),
        "hll_host_cardinality": lambda: WB.q_hll_host_cardinality(spark, SF_DIR).count(),
        # round-5 session-5 operators (JVM-side)
        "url_templates": bench_url_templates,
        "change_rates": bench_change_rates,
        "redirect_resolve": bench_redirect_resolve,
        "pq_adc_topk": lambda: M.q_pq_adc_topk(spark, SF_DIR).collect(),
        # round-5 session-6 operators (all JVM-side): markdown table
        # harvest (3-level regexp explode + 2 id-grain groups),
        # heading outlines (1 page-keyed window), script-mix screen
        # (9 regexp_count probes, zero shuffle)
        "table_harvest": lambda: PG.q_tables_markdown(spark, SF_DIR).count(),
        "heading_outline": lambda: PG.q_heading_outline(spark, SF_DIR).count(),
        "script_mix": lambda: PG.q_script_mix(spark, SF_DIR).count(),
        "w5_score_stable_sort": lambda: M._t(spark, SF_DIR, "events").count()
        and C.q_w5_score_stable_sort(spark, SF_DIR).count(),
        # the PDF codec lane (python stage — keep with the python group)
        "pdf_extract": bench_pdf_extract,
        "extract_pages": bench_extract,
        "extract_pages_18kb": lambda: extract_pages(
            spark.read.parquet(big_path), python_parallelism=max(2, CPUS // 2)
        ).agg(F.sum(F.length("extracted_text"))).collect(),
        "corpus_job": bench_corpus,
        "corpus_job_signals": bench_corpus_signals,
    }

    # untimed JVM warmup: file-index build, parquet footer reads, and
    # whole-stage/decimal codegen dominate the FIRST query (~4-7s
    # measured) and say nothing about per-query cost — the first timed
    # query used to absorb all of it (pricing_summary read 7.4s cold
    # vs 0.08s warm). One cheap scan+agg per table absorbs it here.
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.agg(*[F.count(c) for c in df.columns[:3]]).collect()

    # untimed GC before each timed run: mapInPandas stages leave Arrow /
    # direct buffers that stall later shuffle-heavy JVM stages until
    # collected (measured 72 s vs 12 s on the corpus audit; the
    # System.gc() itself takes ~0.1 s and frees the cleaner-backed
    # direct ByteBuffers)
    timings: dict[str, float] = {}
    per_run: dict[str, list[dict]] = {}
    ext_load = ExternalLoad()
    for name, fn in heavies.items():
        if name == "extract_pages":
            # untimed warmup: python worker spawn + codegen
            extract_pages(
                spark.read.parquet(pages_path).limit(1000),
                python_parallelism=max(2, CPUS // 2),
            ).agg(F.count("*")).collect()
        elif name == "corpus_job":
            corpus_warmup()
        # best-of-2 for every query: the box is shared, and external
        # co-tenant load (observed loadavg 15+ with this container
        # idle) inflates single-shot timings up to ~6x; the second run
        # usually lands in a quieter window. The corpus jobs get a
        # third attempt: at ~25 stages over 12-40 s they are the most
        # flare-exposed queries in the suite (measured: one run 41.7 s
        # while the next query, seconds later, ran clean). On top of
        # that, each attempt carries its own DURING-run external-load
        # measurement (see ExternalLoad), and a query whose every
        # attempt was flare-hit gets up to MAX_EXTRA_RUNS retries — so
        # a co-tenant burst is visible in the artifact instead of
        # silently becoming the headline (round-4 corpus_job lesson).
        # the ~25-stage corpus jobs are the most flare-exposed queries
        # in the suite AND ratio-long enough that even ~2 average
        # external cores hides stage-stalling bursts (measured 34.7 s
        # at avg ext 2.0 vs a 10.7 s quiet floor) — they get a third
        # base attempt and a TIGHTER retry gate
        is_corpus = name.startswith("corpus_job")
        runs = 3 if is_corpus else 2
        gate = 1.0 if is_corpus else LOAD_GATE
        attempts: list[dict] = []
        extra_left = MAX_EXTRA_RUNS
        while True:
            spark._jvm.System.gc()
            ext_load.start()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            avg, peak = ext_load.stop()
            attempts.append(
                {"t": round(dt, 3), "ext_cores": avg, "ext_peak_1s": peak}
            )
            if len(attempts) < runs:
                continue
            # external load only ever SLOWS a run, so the overall
            # minimum is always valid evidence of what the code can do
            # — even when that attempt itself measured hot. The flare
            # risk is one-sided: a best that ran HOT may still be
            # inflated, so grant bounded retries for a chance at a
            # quiet (or simply faster) attempt; a best that ran quiet
            # needs nothing.
            best = min(attempts, key=lambda a: a["t"])
            if (
                best["ext_cores"] is None
                or best["ext_cores"] < gate
                or extra_left == 0
            ):
                break
            extra_left -= 1
        timings[name] = min(a["t"] for a in attempts)
        per_run[name] = attempts

    total = round(sum(timings.values()), 3)
    # input volumes for the MB/s headlines (untimed length scans)
    html_bytes = (
        spark.read.parquet(pages_path).agg(F.sum(F.length("html"))).collect()[0][0]
    )
    big_bytes = (
        spark.read.parquet(big_path).agg(F.sum(F.length("html"))).collect()[0][0]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # per-attempt evidence: every timed run with the
                # external (co-tenant) AVERAGE cores and the PEAK 1 s
                # delta measured DURING that run (the peak is what
                # explains burst-stalled long jobs whose average reads
                # quiet); "queries" above is the fastest attempt —
                # retries were granted while the fastest was flare-hit
                "runs": per_run,
                "load_gate_ext_cores": LOAD_GATE,
                "sf": _SF,
                "pages": N_PAGES,
                "pages_per_sec": round(N_PAGES / timings["extract_pages"], 1),
                "html_mb_per_sec": round(
                    html_bytes / 1e6 / timings["extract_pages"], 1
                ),
                "mb_per_sec_18kb_pages": round(
                    big_bytes / 1e6 / timings["extract_pages_18kb"], 1
                ),
                "corpus_pages_per_sec": round(N_PAGES / timings["corpus_job"], 1),
                "cpus": CPUS,
                # host 1-min loadavg at finish: the box is shared, and
                # external load inflates timings — read regressions
                # against this (idle box ~= CPUS during a bench run;
                # anything far above means co-tenant contention)
                "load_1m": round(os.getloadavg()[0], 1),
                "load_1m_start": load_1m_start,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
