"""Learned quality classifier (operators/quality_clf): deterministic
training, frozen scoring fold, Spark==Python-reference parity."""

import hashlib

from ocrd_segment_spark.operators.quality_clf import (
    SEED_DROP,
    SEED_KEEP,
    score_text,
    train_weights,
    with_quality_classifier,
)

WEIGHTS_SHA256 = (
    "7963d304726ff28ee61a69d728d901ac490c2e04d1125106000130080136ea18"
)


def test_weights_digest_pinned():
    """The rounded weights are part of the frozen contract surface
    (the oracle embeds them): recompute deliberately, like
    langid.MODEL_SHA256 / the kernel goldens."""
    assert (
        hashlib.sha256(repr(train_weights()).encode()).hexdigest()
        == WEIGHTS_SHA256
    )


def test_separates_training_and_heldout():
    """All committed seeds classify correctly, and held-out probes
    (absent from the seeds) land on the right side — the model
    generalizes beyond memorization."""
    assert all(score_text(s) > 0 for s in SEED_KEEP)
    assert all(score_text(s) < 0 for s in SEED_DROP)
    heldout_keep = [
        "the gardener planted tomatoes along the fence before the first frost",
        "researchers measured the river depth every morning for a whole year",
    ]
    heldout_drop = [
        "best cheap deals buy discount sale online shop click subscribe now",
        "win jackpot bonus slots casino free spins register now win big",
    ]
    assert all(score_text(s) > 0 for s in heldout_keep)
    assert all(score_text(s) < 0 for s in heldout_drop)


def test_no_evidence_scores_null():
    assert score_text("") is None
    assert score_text("   \t\n") is None


def test_spark_column_equals_python_reference(spark):
    texts = (
        list(SEED_KEEP[:3])
        + list(SEED_DROP[:3])
        + ["", "   ", "MiXeD Case    runs\tand\nnewlines here today"]
    )
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clf_logit"], r["clf_keep"])
        for r in with_quality_classifier(df).collect()
    }
    for i, t in enumerate(texts):
        want = score_text(t)
        if want is None:
            assert got[i] == (None, None), (i, t, got[i])
        else:
            assert got[i] == (want, want >= 0), (i, t, got[i], want)


def test_corpus_job_quality_clf_stage(spark, tmp_path):
    """--quality-clf as a funnel stage: the spam page drops with an
    attributable dropped_clf count, prose survives with clf_logit on
    the output row; the stream keeps the same documents (shared
    chain parity)."""
    from jobs.corpus_job import build_corpus
    from jobs.stream_job import run_stream

    pages = [
        ("good", "the children were playing in the garden while their"
                 " parents cooked dinner by the river"),
        ("spam", "cheap deals best price buy now discount offer sale"
                 " casino bonus click here subscribe"),
    ]
    rows = [(u, f"<html><body><p>{t}</p></body></html>".encode())
            for u, t in pages]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)

    funnel = build_corpus(
        spark, src, str(tmp_path / "corpus"),
        min_quality=0.0, min_tokens=1, quality_clf=True,
    )
    assert funnel["dropped_clf"] == 1 and funnel["corpus_docs"] == 1
    out = spark.read.parquet(str(tmp_path / "corpus")).collect()
    assert out[0]["url"] == "good" and out[0]["clf_logit"] > 0
    assert "clf_keep" not in out[0].asDict()

    q = run_stream(spark, src, str(tmp_path / "s"), str(tmp_path / "ck"),
                   min_quality=0.0, min_tokens=1, quality_clf=True)
    assert q.awaitTermination(300), "streaming drain did not terminate"
    srows = spark.read.parquet(str(tmp_path / "s")).collect()
    assert {r["url"] for r in srows} == {"good"}
    assert srows[0]["clf_logit"] > 0

    # stage off: both docs survive, funnel reads -1, clf_logit absent
    f2 = build_corpus(spark, src, str(tmp_path / "c2"),
                      min_quality=0.0, min_tokens=1)
    assert f2["dropped_clf"] == -1 and f2["corpus_docs"] == 2
    assert "clf_logit" not in spark.read.parquet(str(tmp_path / "c2")).columns
