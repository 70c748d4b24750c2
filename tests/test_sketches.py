"""Tests for the mergeable sketches (operators/sketches): HLL accuracy
within the theoretical error bound, exact merge == whole-build parity,
merge idempotence, count-min's one-sided error (estimate >= truth, no
false negatives at a threshold), exactness when the counter table is
collision-free, and the build plan shapes (one partial-aggregated
shuffle; broadcast-only estimate lookups)."""

import math

import pytest
from pyspark.sql import functions as F

from ocrd_segment_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    hll_distinct_by,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from ocrd_segment_spark.plans import audit

R = 64


def _keys(spark, lo, hi, dup_every=None):
    """urls with ids in [lo, hi); dup_every folds ids onto a smaller
    distinct set."""
    expr = "id" if dup_every is None else f"id % {dup_every}"
    return spark.range(lo, hi).selectExpr(
        f"concat('https://h.org/p/', cast({expr} as string)) as url"
    )


def test_hll_accuracy_within_bound(spark):
    # 5000 rows over 1200 distinct keys; std error 1.04/sqrt(64) = 13%
    true = 1200
    est = hll_distinct_by(
        _keys(spark, 0, 5000, dup_every=true), (), key_col="url", r=R
    ).collect()[0]["est_distinct"]
    assert abs(est - true) / true < 3 * 1.04 / math.sqrt(R)


def test_hll_duplicates_invisible(spark):
    # registers hold a MAX: feeding each key once vs. many times
    # yields the identical register table and estimate
    once = hll_registers(_keys(spark, 0, 300), key_col="url", r=R)
    dup = hll_registers(
        _keys(spark, 0, 3000, dup_every=300), key_col="url", r=R
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, dup.collect())
    )


def test_hll_merge_equals_whole_build(spark):
    whole = hll_registers(_keys(spark, 0, 2000), key_col="url", r=R)
    a = hll_registers(_keys(spark, 0, 1300), key_col="url", r=R)
    b = hll_registers(_keys(spark, 900, 2000), key_col="url", r=R)
    merged = hll_merge(a, b)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # idempotent: re-merging a shard changes nothing
    again = hll_merge(merged, a)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_hll_small_range_linear_counting(spark):
    # far below 2.5*r the linear-counting branch is EXACT-ish: with
    # n=10 distinct keys and r=64 the estimate lands within one key
    est = hll_distinct_by(_keys(spark, 0, 10), (), key_col="url", r=R)
    val = est.collect()[0]["est_distinct"]
    assert abs(val - 10) < 1.5


def test_hll_group_isolation(spark):
    d = spark.range(0, 400).selectExpr(
        "concat('g', cast(id % 2 as string)) as grp",
        # g0 sees 200 distinct keys, g1 sees the SAME 50 repeated
        "concat('k', cast(IF(id % 2 = 0, id, id % 100) as string)) as k",
    )
    out = {
        r["grp"]: r["est_distinct"]
        for r in hll_distinct_by(d, ("grp",), key_col="k", r=R).collect()
    }
    assert out["g0"] > 150
    assert out["g1"] < 80


def test_hll_build_plan_single_shuffle(spark):
    regs = hll_registers(_keys(spark, 0, 100), key_col="url", r=R)
    # scan → project → ONE exchange on (reg) with partial max
    assert audit.exchange_count(regs) == 1
    plan = audit.physical_plan(regs)
    assert "partial_max" in plan or "HashAggregate" in plan


def test_cms_never_underestimates(spark):
    docs = spark.range(0, 200).selectExpr(
        "concat('w', cast(id % 13 as string), ' w0 w1 w', cast(id % 5 as string)) as text"
    )
    toks = docs.select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "term"
        )
    )
    sketch = cms_build(toks, d=3, w=8)  # tiny → heavy collisions
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("term"), d=3, w=8)
    rows = est.join(exact, "term").collect()
    assert rows and all(r["cms_count"] >= r["exact"] for r in rows)


def test_cms_exact_when_collision_free(spark):
    docs = spark.range(0, 100).selectExpr(
        "concat('a b c d', IF(id % 2 = 0, ' e', '')) as text"
    )
    toks = docs.select(
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "term"
        )
    )
    # 5 terms over 2^12 columns: collision probability negligible and
    # DETERMINISTIC (frozen hashes) — estimates are exact
    sketch = cms_build(toks, d=4, w=1 << 12)
    est = cms_estimate(sketch, toks.select("term").distinct(), d=4, w=1 << 12)
    got = {r["term"]: r["cms_count"] for r in est.collect()}
    assert got == {"a": 100, "b": 100, "c": 100, "d": 100, "e": 50}


def test_cms_heavy_hitters_no_false_negatives(spark):
    docs = spark.range(0, 300).selectExpr(
        "concat('hot1 hot2', IF(id % 3 = 0, ' cold', ''),"
        " ' filler', cast(id % 37 as string)) as text"
    )
    out = cms_heavy_hitters(docs, threshold=200, d=3, w=16)
    rows = {r["term"]: r for r in out.collect()}
    # every term with TRUE count >= 200 must surface (one-sided error)
    assert set(rows) == {"hot1", "hot2"}
    for r in rows.values():
        assert r["cms_count"] >= r["exact_count"] == 300
    # cold (100) and the filler terms (<= 9 each) must be verified away
    assert "cold" not in rows


def test_cms_sketch_bounded_size(spark):
    toks = _keys(spark, 0, 5000).select(F.col("url").alias("term"))
    d, w = 4, 32
    sketch = cms_build(toks, d=d, w=w).collect()
    assert len(sketch) <= d * w
    # total counts per row == total occurrences (counter conservation)
    per_row = {}
    for r in sketch:
        per_row[r["i"]] = per_row.get(r["i"], 0) + r["cnt"]
    assert set(per_row.values()) == {5000}


def test_cms_estimate_broadcasts_sketch(spark):
    toks = _keys(spark, 0, 100).select(F.col("url").alias("term"))
    sketch = cms_build(toks, d=3, w=16)
    out = cms_estimate(sketch, toks.select("term").distinct(), d=3, w=16)
    assert audit.broadcast_join_count(out) >= 1
    assert "CartesianProduct" not in audit.physical_plan(out)


def test_hll_estimate_rejects_nothing_but_counts_null_free(spark):
    # NULL keys are ignored at build time, not hashed as a value
    d = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "url string"
    )
    regs = hll_registers(d, key_col="url", r=R)
    est = hll_estimate(regs, r=R).collect()[0]["est_distinct"]
    assert abs(est - 2) < 1.0


# ---------------------------------------------------------------- histogram
def test_hist_quantiles_accuracy_bound(spark):
    """Estimates land within one bin width of the exact nearest-rank
    value (the log-histogram guarantee: rel. error <= 2^(1/k) - 1)."""
    from ocrd_segment_spark.operators.sketches import hist_quantiles_by

    vals = [(i % 7, v) for i, v in enumerate(range(1, 2001))]
    df = spark.createDataFrame(vals, "g int, v long")
    est = {
        (r["g"], r["q"]): r["est"]
        for r in hist_quantiles_by(df, ("g",), "v", qs=(0.5, 0.9)).collect()
    }
    import math
    for g in range(7):
        sorted_vals = sorted(v for gg, v in vals if gg == g)
        n = len(sorted_vals)
        for q in (0.5, 0.9):
            exact = sorted_vals[int(math.floor(q * (n - 1)))]
            rel = abs(est[(g, q)] - exact) / exact
            assert rel <= 2 ** (1 / 8) - 1 + 1e-9, (g, q, est[(g, q)], exact)


def test_hist_merge_equals_whole_build(spark):
    from ocrd_segment_spark.operators.sketches import (
        hist_build,
        hist_merge,
        hist_quantiles,
    )

    df = spark.createDataFrame(
        [(i % 3, (i * 37) % 5000) for i in range(999)], "g int, v long"
    )
    whole = hist_quantiles(hist_build(df, ("g",), "v"), ("g",))
    shards = [df.filter(F.col("v") % 3 == s) for s in range(3)]
    merged = hist_quantiles(
        hist_merge(*[hist_build(s, ("g",), "v") for s in shards]), ("g",)
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hist_build_validation_and_nulls(spark):
    import pytest as _pytest

    from ocrd_segment_spark.operators.sketches import hist_build

    df = spark.createDataFrame(
        [(1, 10), (1, None), (1, -5), (1, 0)], "g int, v long"
    )
    with _pytest.raises(ValueError):
        hist_build(df, ("g",), "v", k=6)
    h = hist_build(df, ("g",), "v")
    assert h.agg(F.sum("cnt")).collect()[0][0] == 2  # NULL and negative excluded
    bins = {r["bin"] for r in h.collect()}
    assert 0 in bins  # v=0 -> bin 0
