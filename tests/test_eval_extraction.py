"""M5 end-to-end: the evaluate module consuming REAL extraction
output. GT = oracle spans, DT = Spark-pipeline spans for the same
corpus — byte-identity implies perfect scores; a perturbed DT
(regions split in half) must show the over-segmentation signal."""

from pyspark.sql import functions as F

from ocrd_segment_spark.fixtures import gen_pages, pages_pandas
from ocrd_segment_spark.operators import evaluate as ev
from ocrd_segment_spark.oracle import extract_corpus
from ocrd_segment_spark.pipeline import extract_pages

N = 60


def _spans_df(spark, rows):
    flat = [
        (r["url"], sp["region_id"], sp["rtype"], sp["start"], sp["end"], sp["score"])
        for r in rows
        for sp in r["region_spans"]
    ]
    return spark.createDataFrame(
        flat, "url string, region_id string, cat string, start long, end long, score double"
    )


def test_pipeline_vs_oracle_eval_is_perfect(spark):
    golden = extract_corpus(gen_pages(N))
    gt = _spans_df(spark, golden)
    out = extract_pages(spark.createDataFrame(pages_pandas(N)))
    dt = out.select(
        "url", F.explode("region_spans").alias("r")
    ).select(
        "url",
        F.col("r.region_id").alias("region_id"),
        F.col("r.rtype").alias("cat"),
        F.col("r.start").alias("start"),
        F.col("r.end").alias("end"),
        F.col("r.score").alias("score"),
    )
    m = ev.match_spans(gt, dt)
    stats = ev.per_cat_stats(gt, dt, m).collect()
    assert stats  # at least one category
    for r in stats:
        assert r["precision"] == 1.0 and r["recall"] == 1.0, r
        assert r["over_seg"] == 0.0 and r["under_seg"] == 0.0, r
    fn, fp = ev.misses(gt, dt, m)
    assert fn.count() == 0 and fp.count() == 0


def test_split_perturbation_shows_over_segmentation(spark):
    golden = extract_corpus(gen_pages(N))
    gt = _spans_df(spark, golden)
    # DT = every GT region split into two halves (same ids suffixed)
    dt = gt.selectExpr(
        "url", "cat",
        "stack(2, concat(region_id, '_a'), start, start + (end - start) div 2,"
        " concat(region_id, '_b'), start + (end - start) div 2, end)"
        " as (region_id, start, end)",
    ).selectExpr("url", "region_id", "cat", "start", "end", "cast(1.0 as double) as score") \
     .filter("end > start")
    m = ev.match_spans(gt, dt)
    stats = {r["cat"]: r.asDict() for r in ev.per_cat_stats(gt, dt, m).collect()}
    # regions of length >= 2 are matched by both halves → over-segmented
    big = [c for c, s in stats.items() if s["n_gt"] > 5]
    assert big
    assert any(stats[c]["over_seg"] > 0.5 for c in big), stats
