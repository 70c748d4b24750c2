"""Cross-snapshot corpus diff (operators/snapshots)."""

import pytest

from ocrd_segment_spark.operators.snapshots import (
    STATUSES,
    corpus_diff,
    diff_summary,
)


@pytest.fixture(scope="module")
def diff(spark):
    prev = spark.createDataFrame(
        [
            ("u1", "same"),
            ("u2", "old"),
            ("u3", "dropped"),
            ("u4", None),
            ("u5", None),
        ],
        "url string, text string",
    )
    cur = spark.createDataFrame(
        [
            ("u1", "same"),
            ("u2", "new"),
            ("u4", None),
            ("u5", "now set"),
            ("u6", "fresh"),
        ],
        "url string, text string",
    )
    return corpus_diff(prev, cur)


def test_statuses(diff):
    got = {r["key"]: r["status"] for r in diff.collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "unchanged",  # NULL vs NULL is null-safe equal
        "u5": "changed",  # NULL vs text is a change
        "u6": "added",
    }


def test_digest_sides(diff):
    rows = {r["key"]: r for r in diff.collect()}
    assert rows["u3"]["cur_digest"] is None
    assert rows["u6"]["prev_digest"] is None
    assert rows["u4"]["prev_digest"] is None  # NULL text → NULL digest
    assert rows["u1"]["prev_digest"] == rows["u1"]["cur_digest"]


def test_summary_fixed_schema(spark, diff):
    got = {r["status"]: r["n_urls"] for r in diff_summary(diff).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 2}
    assert set(got) == set(STATUSES)


def test_summary_zero_rows_survive(spark):
    empty = corpus_diff(
        spark.createDataFrame([], "url string, text string"),
        spark.createDataFrame([], "url string, text string"),
    )
    got = {r["status"]: r["n_urls"] for r in diff_summary(empty).collect()}
    assert got == {s: 0 for s in STATUSES}
