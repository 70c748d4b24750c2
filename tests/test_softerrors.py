"""Soft-404 detection: frozen phrase rule, NULL handling, host rates."""

import pytest

from ocrd_segment_spark.operators.softerrors import (
    SOFT404_MAX_CHARS,
    soft404_host_rates,
    with_soft404,
)


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, title string, text string")
    out = with_soft404(df).orderBy("doc_id").collect()
    return [
        (r.soft404_title_hit, r.soft404_body_hit, r.is_soft404) for r in out
    ]


def test_title_arm_is_aggressive(spark):
    # any title phrase fires regardless of body size
    big = "word " * 1000
    got = _flags(
        spark,
        [
            (0, "404 Not Found", big),
            (1, "Page Not Found - Example", ""),
            (2, "File not found", "fine body"),
            (3, "Server Error 4xx guide", big),  # 'error 4' phrase
        ],
    )
    assert all(t and s for t, _, s in got)


def test_body_arm_gated_on_tiny(spark):
    tiny = "The page you requested was not found."
    big = "Mentioning error 404 in a long article. " + "x " * 300
    assert len(big) >= SOFT404_MAX_CHARS
    got = _flags(spark, [(0, "Home", tiny), (1, "Home", big)])
    # tiny body + phrase → soft404; big body + phrase → kept
    assert got[0] == (False, True, True)
    assert got[1] == (False, True, False)


def test_near_miss_and_nulls(spark):
    got = _flags(
        spark,
        [
            (0, "Results found for query", "Short note"),  # ' found' != 'not found'
            (1, None, "File not found on this server"),
            (2, "Support", None),
            (3, None, None),
        ],
    )
    assert got[0] == (False, False, False)
    assert got[1] == (False, True, True)
    assert got[2] == (False, False, False)
    assert got[3] == (False, False, False)


def test_missing_title_column(spark):
    df = spark.createDataFrame(
        [(0, "page not found")], "doc_id int, text string"
    )
    r = with_soft404(df, title_col=None).collect()[0]
    assert not r.soft404_title_hit and r.is_soft404


def test_host_rates(spark):
    rows = [
        (0, "a", "404 Not Found", ""),
        (1, "a", "Home", "fine"),
        (2, "a", "Home", "fine"),
        (3, "b", "Home", "fine"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, host string, title string, text string"
    )
    out = {
        r.host: (r.n_pages, r.n_soft404, r.soft404_rate)
        for r in soft404_host_rates(with_soft404(df)).collect()
    }
    assert out["a"] == (3, 1, pytest.approx(0.333333))
    assert out["b"] == (1, 0, 0.0)


def test_min_pages_filter(spark):
    rows = [(0, "a", "Home", "fine"), (1, "b", "Home", "fine"),
            (2, "b", "Home", "fine")]
    df = spark.createDataFrame(
        rows, "doc_id int, host string, title string, text string"
    )
    out = soft404_host_rates(with_soft404(df), min_pages=2)
    assert [r.host for r in out.collect()] == ["b"]
