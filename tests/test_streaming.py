"""Structured Streaming: the streaming extract must be byte-identical
to the batch extract; watermarked windows must equal the batch window
agg on bounded input; the stateful sessionizer must assemble sessions
correctly."""

import datetime as dt

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.pipeline import extract_pages
from ocrd_segment_spark.streaming.extract_stream import (
    sessionize,
    stream_extract,
    windowed_event_stats,
)


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf = pages_pandas(60)
    spark.createDataFrame(pdf).write.parquet(src)

    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(300)

    streamed = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out).select("url", "extracted_text").collect()
    }
    batch = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(spark.read.parquet(src))
        .select("url", "extracted_text")
        .collect()
    }
    assert streamed == batch  # byte identity through the microbatch path


def test_stream_extract_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once: draining the same source twice with the same
    checkpoint appends nothing new."""
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(pages_pandas(20)).write.parquet(src)
    stream_extract(spark, src, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == 20
    stream_extract(spark, src, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == 20


def test_windowed_event_stats_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_stats(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r["event_type"], r["wstart"]): (r["n"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["event_type"], r["wstart"]): (r["n"], r["total"])
        for r in windowed_event_stats(events).collect()
    }
    # append mode may hold back the newest (unexpired) windows
    assert streamed.items() <= batch.items()
    assert len(streamed) >= len(batch) - 10


def test_sessionize_stateful(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap 31 min splits)
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(minutes=41), 4.0),
        (1, base + dt.timedelta(minutes=50), 8.0),
        # user 2: one long session
        (2, base, 1.0),
        (2, base + dt.timedelta(minutes=29), 1.0),
        (2, base + dt.timedelta(minutes=58), 1.0),
    ]
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["n_events"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    # closed sessions only: user 1's first session (2 events, 31-min
    # gap closes it); open tails stay in state at stream end
    assert got == {(1, 2, 3.0)}


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _bucket_fn."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_dedup_bucket_state_ignores_rearrivals():
    """A doc_id re-arriving in a later microbatch must not be stored
    twice, emit pairs again, or consume the max_bucket cap (round-1
    advice: state grew with duplicates)."""
    import pandas as pd
    from ocrd_segment_spark.streaming.dedup_stream import _bucket_fn

    fn = _bucket_fn(max_bucket=3)
    st = _FakeState()
    out1 = list(fn((0, 7), [pd.DataFrame({"doc_id": [1, 2]})], st))
    assert st.get == ([1, 2],)
    assert len(out1) == 1 and set(zip(out1[0]["doc1"], out1[0]["doc2"])) == {(1, 2)}
    # doc 1 re-arrives alongside a genuinely new doc 3
    out2 = list(fn((0, 7), [pd.DataFrame({"doc_id": [1, 1, 3]})], st))
    assert st.get == ([1, 2, 3],)  # distinct members only
    assert set(zip(out2[0]["doc1"], out2[0]["doc2"])) == {(1, 3), (2, 3)}
    # bucket now full: doc 4 pairs against the capped sample but is not stored
    out3 = list(fn((0, 7), [pd.DataFrame({"doc_id": [4]})], st))
    assert st.get == ([1, 2, 3],)
    assert set(zip(out3[0]["doc1"], out3[0]["doc2"])) == {(1, 4), (2, 4), (3, 4)}


def test_minhash_fold_equals_per_lane(spark):
    """minhash_signature_fold (single-pass) must equal the per-lane
    array_min form on every non-empty input."""
    from pyspark.sql import functions as F
    from ocrd_segment_spark.functions import hashing as H

    docs = spark.createDataFrame(
        [(i, f"doc {i} some shared tokens alpha beta gamma {i * 7 % 13}") for i in range(50)],
        "doc_id long, text string",
    )
    hs = (
        docs.withColumn("toks", H.tokens("text"))
        .withColumn("th", H.token_hashes("toks"))
        .withColumn("hs", H.shingle_hashes("th", 3))
        .filter(F.size("hs") > 0)
    )
    both = hs.select(
        H.minhash_signature("hs", 8).alias("a"),
        H.minhash_signature_fold("hs", 8).alias("b"),
    )
    assert both.count() == 50
    assert both.filter("a != b").count() == 0


def test_streaming_incremental_dedup_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER microbatch must pair with the
    original seen earlier (state carries history across batches)."""
    from ocrd_segment_spark.streaming.dedup_stream import streaming_minhash_dedup

    src = str(tmp_path / "docs")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely unrelated words in this one here nothing shared at all"
    import os
    os.makedirs(src, exist_ok=True)
    # batch 1: originals; batch 2: a dup of doc 1 (maxFilesPerTrigger=1
    # forces file-per-microbatch so state must persist between them)
    spark.createDataFrame([(1, base), (2, other)], "doc_id long, text string") \
        .coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(3, base)], "doc_id long, text string") \
        .coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_minhash_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    pairs = {(r["doc1"], r["doc2"]) for r in spark.read.parquet(out).collect()}
    assert (1, 3) in pairs
    assert all(p in {(1, 3)} for p in pairs), pairs


def test_sublevel_derivation_is_streaming_capable(spark, tmp_path):
    """word/line derivation is pure narrow column math, so it composes
    with the streaming extract unchanged — the microbatch word table
    equals the batch word table exactly."""
    from ocrd_segment_spark.functions.sublevels import words_table
    from ocrd_segment_spark.streaming.extract_stream import PAGES_SCHEMA

    src = str(tmp_path / "pages")
    out = str(tmp_path / "words_out")
    ckpt = str(tmp_path / "words_ckpt")
    pdf = pages_pandas(40)
    spark.createDataFrame(pdf).write.parquet(src)

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    words = words_table(extract_pages(pages), line_width=6)
    q = (
        words.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(out)
        .select("url", "word_id", "start", "end", "word_text").collect()
    )
    batch = sorted(
        tuple(r) for r in words_table(extract_pages(spark.read.parquet(src)), line_width=6)
        .select("url", "word_id", "start", "end", "word_text").collect()
    )
    assert streamed == batch and len(batch) > 0


def test_quality_scoring_is_streaming_capable(spark, tmp_path):
    """The corpus-job scoring stage (quality + lang id) is narrow
    column math, so it composes with streaming extraction — microbatch
    scores equal batch scores."""
    from ocrd_segment_spark.operators.textstats import with_lang_id, with_quality
    from ocrd_segment_spark.streaming.extract_stream import PAGES_SCHEMA

    src = str(tmp_path / "pages")
    out = str(tmp_path / "scored_out")
    ckpt = str(tmp_path / "scored_ckpt")
    spark.createDataFrame(pages_pandas(30)).write.parquet(src)

    def score(df):
        return with_lang_id(
            with_quality(df, text_col="extracted_text"),
            text_col="extracted_text",
        ).select("url", "n_tokens", "quality", "pred_lang")

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q = (
        score(extract_pages(pages)).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    streamed = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    batch = sorted(
        tuple(r) for r in score(extract_pages(spark.read.parquet(src))).collect()
    )
    assert streamed == batch and len(batch) == 30


def test_gopher_signals_are_streaming_capable(spark, tmp_path):
    """The Gopher rule stage (repetition signals + pass flag) is pure
    column math — it composes with streaming extraction exactly like
    quality scoring: microbatch output equals batch output."""
    from ocrd_segment_spark.operators.textstats import (
        gopher_filter,
        with_repetition_signals,
    )
    from ocrd_segment_spark.streaming.extract_stream import PAGES_SCHEMA

    src = str(tmp_path / "pages")
    out = str(tmp_path / "sig_out")
    ckpt = str(tmp_path / "sig_ckpt")
    spark.createDataFrame(pages_pandas(30)).write.parquet(src)

    def rules(df):
        return gopher_filter(
            with_repetition_signals(df, text_col="extracted_text"),
            min_tokens=5,
        ).select(
            "url", "n_tokens", "dup_line_fraction", "dup_2gram_fraction",
            "mean_word_length", "passes",
        )

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q = (
        rules(extract_pages(pages)).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    streamed = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    batch = sorted(
        tuple(r) for r in rules(extract_pages(spark.read.parquet(src))).collect()
    )
    assert streamed == batch and len(batch) == 30


def test_stream_job_matches_batch_corpus_filters(spark, tmp_path):
    """jobs/stream_job.py end-to-end (availableNow drain): the
    streaming corpus ingestion must keep exactly the documents the
    batch filter chain keeps, and a second drain with the same
    checkpoint must append nothing (exactly-once)."""
    from jobs.stream_job import run_stream
    from ocrd_segment_spark.operators.textstats import with_lang_id, with_quality

    src = str(tmp_path / "pages")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(pages_pandas(40)).write.parquet(src)

    q = run_stream(spark, src, out, ckpt, min_tokens=5, gopher=True)
    q.awaitTermination(300)
    streamed = {r["url"] for r in spark.read.parquet(out).select("url").collect()}

    # batch reference: same chain via the corpus job's stage functions
    from ocrd_segment_spark.operators.textstats import (
        gopher_filter,
        with_repetition_signals,
    )

    scored = with_lang_id(
        with_quality(
            extract_pages(spark.read.parquet(src)), text_col="extracted_text"
        ),
        text_col="extracted_text",
    ).filter("quality >= 0.5 and n_tokens >= 5")
    batch = {
        r["url"]
        for r in gopher_filter(
            with_repetition_signals(scored, text_col="extracted_text")
        )
        .filter("passes")
        .select("url")
        .collect()
    }
    assert streamed == batch and len(batch) > 0

    # exactly-once: re-drain with the same checkpoint appends nothing
    q2 = run_stream(spark, src, out, ckpt, min_tokens=5, gopher=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == len(batch)


def test_stream_job_quality_signals_match_batch(spark, tmp_path):
    """The round-4 quality-signal stages (--entropy-min, --lm-ref +
    --lm-max-bits, --max-compression) drop the SAME documents on the
    stream as jobs/corpus_job.build_corpus with identical thresholds
    (same operators both sides; all stages narrow → streaming-legal)."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import run_stream

    good0 = "the children were playing in the garden near the river all afternoon"
    good1 = "she opened the window and watched the quiet street below the house"
    pages = [
        ("good0", good0),
        ("good1", good1),
        ("lowent", "aaaaaaaaaaaaaaaaaaaaaaaa aaaaaaaaaaaaaaaaaaaa"),
        ("gibber", "the zzqqxx the wkqzx the jjqzvv the qqzzxx the xxqqzz"),
    ]
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in pages]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    ref = str(tmp_path / "lm_ref")
    spark.createDataFrame(
        [("en", good0), ("en", good1),
         ("en", "there is nothing better than a warm cup of tea in the evening")],
        "lang string, text string",
    ).write.parquet(ref)

    kw = dict(min_quality=0.0, min_tokens=0, entropy_min=2.0,
              lm_ref_path=ref, lm_max_bits=6.5, max_compression=0.98)
    build_corpus(spark, src, str(tmp_path / "bcorpus"), **kw)
    batch = {r["url"] for r in
             spark.read.parquet(str(tmp_path / "bcorpus")).collect()}

    q = run_stream(spark, src, str(tmp_path / "scorpus"),
                   str(tmp_path / "ckpt"), **kw)
    # availableNow MUST terminate — awaitTermination(timeout) returns
    # False on a still-running query, which would silently pass (the
    # chained-column entropy expression actually hung here: interpreted
    # microbatch plans have no CSE, so collapse re-sorted the doc per
    # character until the lambda-bound rewrite)
    assert q.awaitTermination(300), "streaming drain did not terminate"
    streamed = {r["url"] for r in
                spark.read.parquet(str(tmp_path / "scorpus")).collect()}
    assert streamed == batch == {"good0", "good1"}


def test_stream_job_accepts_python_parallelism(spark, tmp_path):
    """--python-parallelism on the streaming job must not touch .rdd
    (illegal on streaming DataFrames — crashed before the fix)."""
    from jobs.stream_job import run_stream

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(10)).write.parquet(src)
    q = run_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        min_tokens=1, python_parallelism=2,
    )
    q.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "out")).count() > 0


def test_stream_job_blocklist_bpe_and_fixed_schema(spark, tmp_path):
    """Round-5 stream/batch parity: --blocklist and --count-bpe keep
    the same documents with the same token counts on the stream as
    jobs/corpus_job.build_corpus, and the sink schema is the frozen
    SINK_COLUMNS set regardless of which stages are enabled (a
    checkpointed parquet sink is append-only — flag changes must not
    fork the schema)."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import SINK_COLUMNS, run_stream

    texts = {
        "https://www.keepme.com/a":
            "the children were playing in the garden near the river all afternoon",
        "https://blocked.example.net/b":
            "she opened the window and watched the quiet street below the house",
        "https://keepme.com/c":
            "there is nothing better than a warm cup of tea in the evening",
    }
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in texts.items()]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    blp = str(tmp_path / "bl")
    # a full-url entry (scheme + subdomain + path, mixed case) must
    # reduce to registered domain 'example.net' — round-4 ADVICE: a
    # verbatim compare silently blocked nothing for such entries
    spark.createDataFrame(
        [("https://ads.EXAMPLE.net/x?y=1",)], "domain string"
    ).write.parquet(blp)

    kw = dict(min_quality=0.0, min_tokens=1, blocklist_path=blp,
              count_bpe=True)
    build_corpus(spark, src, str(tmp_path / "bcorpus"), **kw)
    batch = spark.read.parquet(str(tmp_path / "bcorpus"))
    q = run_stream(spark, src, str(tmp_path / "scorpus"),
                   str(tmp_path / "ckpt"), **kw)
    assert q.awaitTermination(300), "streaming drain did not terminate"
    stream = spark.read.parquet(str(tmp_path / "scorpus"))

    kept = {"https://www.keepme.com/a", "https://keepme.com/c"}
    assert {r["url"] for r in stream.select("url").collect()} == kept
    assert {r["url"] for r in batch.select("url").collect()} == kept
    b = {r["url"]: r["n_bpe_tokens"]
         for r in batch.select("url", "n_bpe_tokens").collect()}
    s = {r["url"]: r["n_bpe_tokens"]
         for r in stream.select("url", "n_bpe_tokens").collect()}
    assert b == s and all(v > 0 for v in s.values())

    # schema freeze: an everything-off drain writes the same columns
    q2 = run_stream(spark, src, str(tmp_path / "s2"),
                    str(tmp_path / "ckpt2"), min_quality=0.0, min_tokens=1)
    assert q2.awaitTermination(300), "streaming drain did not terminate"
    cols2 = spark.read.parquet(str(tmp_path / "s2")).columns
    assert cols2 == stream.columns == [c for c, _ in SINK_COLUMNS]


def test_stream_job_flag_change_restart_one_schema(spark, tmp_path):
    """The round-4 ADVICE scenario end-to-end: a checkpointed sink
    restarted with DIFFERENT stage flags keeps appending one parquet
    schema — pre-restart rows read with null signal columns, new rows
    carry the newly-enabled signals."""
    from jobs.stream_job import SINK_COLUMNS, run_stream

    src, out, ck = (str(tmp_path / p) for p in ("pages", "out", "ck"))
    spark.createDataFrame(
        [("u1", b"<html><body><p>the children were playing in the garden"
                b" near the river all afternoon</p></body></html>")],
        "url string, html binary",
    ).write.parquet(src)
    q = run_stream(spark, src, out, ck, min_quality=0.0, min_tokens=1)
    assert q.awaitTermination(300)

    spark.createDataFrame(
        [("u2", b"<html><body><p>she opened the window and watched the"
                b" quiet street below the house</p></body></html>")],
        "url string, html binary",
    ).write.mode("append").parquet(src)
    q2 = run_stream(spark, src, out, ck, min_quality=0.0, min_tokens=1,
                    quality_clf=True)
    assert q2.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.columns == [c for c, _ in SINK_COLUMNS]
    rows = {r["url"]: r["clf_logit"] for r in got.collect()}
    assert set(rows) == {"u1", "u2"}
    assert rows["u1"] is None and rows["u2"] > 0


def test_stream_job_honor_noindex_parity(spark, tmp_path):
    """--honor-noindex drops robots-noindex pages on the stream exactly
    as --honor-meta does in batch; the canonical-alias collapse is
    batch-only by design (non-time window over an unbounded stream),
    so an alias page streams through — the documented divergence."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import run_stream

    t1 = "the children were playing in the garden near the river all afternoon"
    t2 = "she opened the window and watched the quiet street below the house"
    canon = '<link rel="canonical" href="https://a.org/main">'

    def pg(head, text):
        return (
            f"<html><head>{head}</head><body><p>{text}</p></body></html>"
        ).encode()

    rows = [
        ("https://a.org/main", pg(canon, t1)),
        ("https://a.org/alias", pg(canon, t1 + " mirrored")),
        ("https://a.org/hidden",
         pg('<meta name="robots" content="noindex">', t2)),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)

    build_corpus(spark, src, str(tmp_path / "bcorpus"),
                 min_quality=0.0, min_tokens=1, honor_meta=True)
    batch = {r.url for r in
             spark.read.parquet(str(tmp_path / "bcorpus")).collect()}
    q = run_stream(spark, src, str(tmp_path / "scorpus"),
                   str(tmp_path / "ckpt"),
                   min_quality=0.0, min_tokens=1, honor_noindex=True)
    assert q.awaitTermination(300), "streaming drain did not terminate"
    stream = {r.url for r in
              spark.read.parquet(str(tmp_path / "scorpus")).collect()}

    assert batch == {"https://a.org/main"}
    assert stream == {"https://a.org/main", "https://a.org/alias"}


def test_stream_job_content_type_parity(spark, tmp_path):
    """--sniff-content-type drops non-html bodies on the stream
    exactly as in batch: same kept url set on the same input."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import run_stream

    t1 = "the children were playing in the garden near the river today"
    rows = [
        ("https://a.org/page",
         f"<html><body><p>{t1}</p></body></html>".encode()),
        ("https://a.org/doc.pdf", b"%PDF-1.7 binary payload"),
        ("https://a.org/archive", b"PK\x03\x04zipped"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)

    build_corpus(spark, src, str(tmp_path / "bcorpus"),
                 min_quality=0.0, min_tokens=1, sniff_content_type=True)
    batch = {r.url for r in
             spark.read.parquet(str(tmp_path / "bcorpus")).collect()}
    q = run_stream(spark, src, str(tmp_path / "scorpus"),
                   str(tmp_path / "ckpt"),
                   min_quality=0.0, min_tokens=1, sniff_content_type=True)
    assert q.awaitTermination(300), "streaming drain did not terminate"
    stream = {r.url for r in
              spark.read.parquet(str(tmp_path / "scorpus")).collect()}
    assert batch == stream == {"https://a.org/page"}


def test_stream_batch_parity_preserve_pre(spark, tmp_path):
    """--preserve-pre parity: both jobs extract the <pre> block with
    verbatim whitespace (indentation + blank line survive), and the
    kept text is identical batch vs stream."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import run_stream

    html = (
        "<html><body><p>the children were playing in the garden near"
        " the river all afternoon</p><pre>\ndef f(x):\n    return x\n"
        "\n</pre></body></html>"
    ).encode()
    src = str(tmp_path / "pages")
    spark.createDataFrame(
        [("https://code.example.org/a", html)], "url string, html binary"
    ).write.parquet(src)

    kw = dict(min_quality=0.0, min_tokens=1, preserve_pre=True)
    build_corpus(spark, src, str(tmp_path / "bcorpus"), **kw)
    q = run_stream(spark, src, str(tmp_path / "scorpus"),
                   str(tmp_path / "ckpt"), **kw)
    assert q.awaitTermination(300), "streaming drain did not terminate"

    b = spark.read.parquet(str(tmp_path / "bcorpus")).collect()[0]
    s = spark.read.parquet(str(tmp_path / "scorpus")).collect()[0]
    assert "def f(x):\n    return x\n" in b["extracted_text"]
    assert b["extracted_text"] == s["extracted_text"]
