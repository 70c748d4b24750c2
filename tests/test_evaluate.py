"""Unit tests for operators/evaluate.py on hand-constructed GT/DT with
known expected outcomes (FIXTURES.md F3; reference evaluate.py
semantics: triple-threshold n:m match, anti-join misses, over/under-
segmentation)."""

import pytest

from ocrd_segment_spark.operators import evaluate as ev

GT = [
    # url, region_id, cat, start, end, score
    ("u1", "g1", "text", 0, 100, 1.0),
    ("u1", "g2", "text", 100, 200, 1.0),
    ("u1", "g3", "figure", 0, 50, 1.0),
    ("u2", "g1", "text", 0, 100, 1.0),
]
DT = [
    ("u1", "d1", "text", 0, 60, 1.0),     # matches g1 (iou .6)
    ("u1", "d2", "text", 60, 100, 1.0),   # matches g1 (io_dt 1.0) → g1 over-segmented
    ("u1", "d3", "text", 105, 195, 1.0),  # matches g2 (iou .9)
    ("u1", "d4", "figure", 200, 260, 1.0),  # no overlap → FP
    ("u2", "d1", "text", 90, 300, 1.0),   # inter 10: iou .03, io_gt .1, io_dt .05 → no match
]
COLS = ["url", "region_id", "cat", "start", "end", "score"]


@pytest.fixture(scope="module")
def frames(spark):
    gt = spark.createDataFrame(GT, COLS)
    dt = spark.createDataFrame(DT, COLS)
    m = ev.match_spans(gt, dt)
    return gt, dt, m


def test_match_pairs(frames):
    _, _, m = frames
    pairs = {(r["url"], r["gt_id"], r["dt_id"]) for r in m.collect()}
    assert pairs == {("u1", "g1", "d1"), ("u1", "g1", "d2"), ("u1", "g2", "d3")}


def test_misses_anti_joins(frames):
    gt, dt, m = frames
    fn, fp = ev.misses(gt, dt, m)
    assert {(r["url"], r["region_id"]) for r in fn.collect()} == {
        ("u1", "g3"), ("u2", "g1")
    }
    assert {(r["url"], r["region_id"]) for r in fp.collect()} == {
        ("u1", "d4"), ("u2", "d1")
    }


def test_per_image_stats(frames):
    gt, dt, m = frames
    stats = {(r["url"], r["cat"]): r.asDict() for r in ev.per_image_stats(gt, dt, m).collect()}
    s = stats[("u1", "text")]
    assert (s["n_gt"], s["n_dt"], s["tp_gt"], s["tp_dt"], s["fp"], s["fn"]) == (2, 3, 2, 3, 0, 0)
    assert s["precision"] == 1.0 and s["recall"] == 1.0
    # pixel: inter = 60+40+90 = 190; gt_chars=200, dt_chars=190
    assert s["pixel_recall"] == pytest.approx(190 / 200)
    assert s["pixel_precision"] == pytest.approx(1.0)
    s2 = stats[("u1", "figure")]
    assert (s2["tp_gt"], s2["fp"], s2["fn"]) == (0, 1, 1)
    s3 = stats[("u2", "text")]
    assert (s3["n_gt"], s3["n_dt"], s3["tp_gt"]) == (1, 1, 0)


def test_per_cat_overseg(frames):
    gt, dt, m = frames
    cats = {r["cat"]: r.asDict() for r in ev.per_cat_stats(gt, dt, m).collect()}
    t = cats["text"]
    # g1 matched by 2 DT → over_seg = 1/2 matched GT
    assert t["gt_matched"] == 2 and t["over_seg"] == 0.5
    assert t["dt_matched"] == 3 and t["under_seg"] == 0.0
    assert t["n_gt"] == 3 and t["n_dt"] == 4
    f = cats["figure"]
    assert f["gt_matched"] == 0 and f["over_seg"] == 0.0
