"""Checkpoint-resume: kill-and-rerun output == single-run output
(BASELINE.md resumability row; SURVEY.md §5.2 item 5).

The "kill" is simulated by running the job on only a prefix of the
input (as if the run died after some partitions committed), then
resuming over the full input. Resume must (a) not reprocess done urls,
(b) produce exactly the single-run result set."""

import os

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.pipeline import run_extract


def test_resume_completes_partial_run(spark, tmp_path):
    pdf = pages_pandas(60)
    full_in = str(tmp_path / "pages")
    part_in = str(tmp_path / "pages_prefix")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf).write.parquet(full_in)
    spark.createDataFrame(pdf.iloc[:25]).write.parquet(part_in)

    # "crashed" run: only the first 25 urls were written
    run_extract(spark, part_in, out, resume=True)
    assert spark.read.parquet(out).count() == 25

    # resume over the full input
    run_extract(spark, full_in, out, resume=True)
    resumed = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out).select("url", "extracted_text").collect()
    }
    assert len(resumed) == 60  # no duplicates appended

    # reference: clean single run
    out2 = str(tmp_path / "out_single")
    run_extract(spark, full_in, out2, resume=True)
    single = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out2).select("url", "extracted_text").collect()
    }
    assert resumed == single


def test_resume_from_uncommitted_temporary_only(spark, tmp_path):
    """SIGKILL during the FIRST write attempt leaves the output dir with
    only `_temporary/` (zero committed footers). The resume read then
    raises UNABLE_TO_INFER_SCHEMA, which must be treated as "no output
    yet" — observed live in the round-3 process-level kill experiment."""
    pdf = pages_pandas(20)
    src = str(tmp_path / "pages")
    out = tmp_path / "out"
    spark.createDataFrame(pdf).write.parquet(src)
    # simulate the killed first attempt: dir exists, only _temporary
    attempt = out / "_temporary" / "0" / "_temporary" / "attempt_0_m_000000_0"
    attempt.mkdir(parents=True)
    (attempt / "part-00000.snappy.parquet").write_bytes(b"PAR1partial")
    run_extract(spark, src, str(out), resume=True)
    assert spark.read.parquet(str(out)).count() == 20


def test_resume_is_idempotent_noop_when_done(spark, tmp_path):
    pdf = pages_pandas(20)
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf).write.parquet(src)
    run_extract(spark, src, out)
    run_extract(spark, src, out)  # second run must append nothing
    assert spark.read.parquet(out).count() == 20


def test_metrics_table_appended_per_run(spark, tmp_path):
    pdf = pages_pandas(30)
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    met = str(tmp_path / "metrics")
    spark.createDataFrame(pdf).write.parquet(src)
    run_extract(spark, src, out, metrics_path=met)
    m = spark.read.parquet(met)
    rows = m.collect()
    assert sum(r["pages"] for r in rows) == 30
    assert all(r["run_id"] for r in rows)
    assert {"partition_id", "regions_kept", "regions_dropped",
            "parse_failures", "kernel_version"} <= set(m.columns)


def test_compact_preserves_row_multiset(spark, tmp_path):
    """Runs the ACTUAL job body (review finding: the first version
    re-implemented the logic inline and exercised nothing): the
    listing walk must skip _temporary leftovers, the plain and
    --sort-by paths must both preserve the row multiset, and the
    sorted variant must actually order within partitions."""
    import os

    from jobs.compact_job import compact

    src = str(tmp_path / "small")
    for i in range(8):
        spark.createDataFrame(
            [(f"u{i}_{j:02d}", "x" * 50) for j in range(20)],
            "url string, text string",
        ).coalesce(1).write.mode("append").parquet(src)
    # a crashed writer's leftovers: invisible to spark.read, must be
    # invisible to the size walk too
    os.makedirs(src + "/_temporary/0", exist_ok=True)
    with open(src + "/_temporary/0/part-junk.parquet", "wb") as f:
        f.write(b"\x00" * 10_000_000)

    stats = compact(spark, src, str(tmp_path / "c1"), target_mb=64)
    assert stats["partitions_out"] == 1  # 10 MB of junk NOT counted
    assert stats["files_in"] == 8
    a = sorted(r["url"] for r in spark.read.parquet(src).collect())
    b = sorted(
        r["url"] for r in spark.read.parquet(str(tmp_path / "c1")).collect()
    )
    assert a == b and len(a) == 160

    compact(spark, src, str(tmp_path / "c2"), target_mb=64, sort_by="url")
    srt = [r["url"] for r in spark.read.parquet(str(tmp_path / "c2")).collect()]
    assert sorted(srt) == a
