"""DSIR importance resampling (operators/dsir): model shape, weight
direction, quantized-sum exactness arms, Gumbel selection."""

from pyspark.sql import functions as F

from ocrd_segment_spark.operators.dsir import (
    dsir_logweights,
    dsir_select,
    fit_dsir_model,
)

B = 64


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha beta"),
        (2, "alpha beta alpha beta gamma"),
        (3, "zz yy xx ww vv uu"),
        (4, "alpha beta gamma"),
        (5, ""),                      # zero grams
        (6, "  "),                    # whitespace only → zero grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_follow_the_target(spark):
    docs = _docs(spark)
    target = fit_dsir_model(docs.filter("doc_id in (1, 2)"), n_buckets=B)
    raw = fit_dsir_model(docs, n_buckets=B)
    w = {r["doc_id"]: r for r in
         dsir_logweights(docs, target, raw, n_buckets=B).collect()}
    # target-like docs outweigh the off-distribution one (absolute
    # sign is smoothing-dominated at this tiny scale — only order is
    # guaranteed)
    assert w[4]["logw"] > w[3]["logw"]
    assert w[1]["logw"] > w[3]["logw"]
    # zero-gram docs keep rows and score exactly 0
    assert (w[5]["n_grams"], w[5]["logw"]) == (0, 0.0)
    assert (w[6]["n_grams"], w[6]["logw"]) == (0, 0.0)
    # unigrams + bigrams, occurrences not distinct
    assert w[1]["n_grams"] == 5 + 4


def test_dsir_default_arm_for_unseen_buckets(spark):
    """A scored doc whose gram BUCKETS appear in NEITHER model takes
    the constant smoothing ratio ln(Nr+aB)-ln(Nt+aB) per gram — not
    NULL, not zero (the full-range ratio table arm). Collision-free
    at B=8192 for this fixture — asserted, not assumed."""
    big = 8192
    docs = _docs(spark)
    target = fit_dsir_model(docs.filter("doc_id = 1"), n_buckets=big)
    raw = fit_dsir_model(docs.filter("doc_id in (1, 2)"), n_buckets=big)
    novel = spark.createDataFrame(
        [(9, "qqqq1 qqqq2")], "doc_id long, text string"
    )
    novel_model = fit_dsir_model(novel, n_buckets=big)
    seen = {r["bucket"] for r in target.union(raw).collect()}
    assert not seen & {r["bucket"] for r in novel_model.collect()}
    w = dsir_logweights(novel, target, raw, n_buckets=big).collect()[0]
    assert w["n_grams"] == 3
    import math
    nt = target.agg(F.sum("c")).collect()[0][0]
    nr = raw.agg(F.sum("c")).collect()[0][0]
    per = round((math.log(nr + big) - math.log(nt + big)) * 1e6)
    assert w["logw"] == per * 3 / 1e6


def test_dsir_select_is_deterministic_topn(spark):
    docs = _docs(spark)
    target = fit_dsir_model(docs.filter("doc_id in (1, 2)"), n_buckets=B)
    raw = fit_dsir_model(docs, n_buckets=B)
    w = dsir_logweights(docs, target, raw, n_buckets=B)
    a = [r["doc_id"] for r in dsir_select(w, 3).collect()]
    b = [r["doc_id"] for r in dsir_select(w.repartition(7), 3).collect()]
    assert len(a) == 3 and sorted(a) == sorted(b)
    # scores are monotone in the output
    rows = dsir_select(w, 6).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
