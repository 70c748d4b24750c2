"""Change-rate recrawl estimation (operators/snapshots.change_rates)."""

import datetime as dt
import math

from ocrd_segment_spark.operators.snapshots import change_rates
from ocrd_segment_spark.plans import audit


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), d)
         for (u, s, d) in rows],
        "url string, snap_ts timestamp, digest string",
    )


def _by_url(df):
    return {
        r["url"]: (r["n_obs"], r["n_changes"], r["span_s"],
                   r["rate_per_day"], r["recrawl_days"])
        for r in df.collect()
    }


def test_estimator_matches_cho_gm_closed_form(spark):
    # u1: daily observations, changes every time; u2: never changes;
    # u3: one observation; u4: duplicate (url, ts) collapses to min
    day = 86400
    rows = (
        [("u1", i * day, f"d{i}") for i in range(4)]
        + [("u2", i * day, "same") for i in range(4)]
        + [("u3", 0, "only")]
        + [("u4", 0, "d0"), ("u4", day, "d0"), ("u4", day, "a0"),
           ("u4", 2 * day, "d1")]
    )
    got = _by_url(change_rates(_hist(spark, rows)))
    r1 = round(-math.log(0.5 / 3.5) / day * 86400, 6)
    # u4 after collapse: d0, a0, d1 -> 2 changes over 2 intervals
    r4 = round(-math.log(0.5 / 2.5) / day * 86400, 6)
    assert got == {
        "u1": (4, 3, 3 * day, r1, round(1 / r1, 6)),
        "u2": (4, 0, 3 * day, 0.0, None),
        "u3": (1, 0, 0, None, None),
        "u4": (3, 2, 2 * day, r4, round(1 / r4, 6)),
    }
    # the X=0 arm must yield +0.0, not IEEE -0.0
    assert math.copysign(1.0, got["u2"][3]) == 1.0


def test_null_digests_are_null_safe(spark):
    rows = [("u", 0, None), ("u", 3600, None), ("u", 7200, "d")]
    got = _by_url(change_rates(_hist(spark, rows)))
    # NULL vs NULL is no change; NULL vs value is one
    assert got["u"][:3] == (3, 1, 7200)


def test_single_exchange(spark):
    df = _hist(spark, [("u", 0, "a"), ("u", 60, "b")])
    out = change_rates(df)
    # the url-keyed window partitioning is reused by the aggregate
    assert audit.exchange_count(out) == 1
