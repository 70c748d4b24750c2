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
