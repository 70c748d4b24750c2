"""Tests for the inverted index + BM25 retrieval (operators/index):
postings/doc-length correctness, hand-computed BM25 scores under the
frozen Lucene form, tie-breaking, distinct-query-term semantics, and
the query-time plan shape (term pruning pushed to the index scan, no
global sort for the top-k)."""

import math

import pytest

from ocrd_segment_spark.operators.index import (
    bm25_topk,
    build_postings,
    doc_lengths,
)
from ocrd_segment_spark.plans import audit


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "c c c c")],
        "doc_id long, text string",
    )


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _w(tf, dl, avgdl, k1=1.2, b=0.75):
    return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_postings_and_doc_lengths(spark):
    p = build_postings(_docs(spark))
    got = {(r.term, r.doc_id): r.tf for r in p.collect()}
    assert got == {
        ("a", 1): 2,
        ("b", 1): 1,
        ("b", 2): 1,
        ("c", 2): 1,
        ("c", 3): 4,
    }
    dl = {r.doc_id: r.dl for r in doc_lengths(p).collect()}
    assert dl == {1: 3, 2: 2, 3: 4}


def test_postings_tokenization_case_and_empties(spark):
    d = spark.createDataFrame(
        [(1, "  A  a ")], "doc_id long, text string"
    )
    got = {(r.term, r.doc_id): r.tf for r in build_postings(d).collect()}
    assert got == {("a", 1): 2}


def test_bm25_hand_computed(spark):
    out = bm25_topk(build_postings(_docs(spark)), ["b"], k=10)
    rows = out.collect()
    # N=3, avgdl=3; df(b)=2 → idf=ln(1.6); d1: tf=1,dl=3; d2: tf=1,dl=2
    idf = _idf(3, 2)
    want = {1: idf * _w(1, 3, 3), 2: idf * _w(1, 2, 3)}
    assert [r.doc_id for r in rows] == [2, 1]  # shorter doc ranks first
    for r in rows:
        assert r.score == pytest.approx(want[r.doc_id], abs=1e-6)


def test_bm25_multi_term_and_duplicate_query_terms(spark):
    p = build_postings(_docs(spark))
    once = {r.doc_id: r.score for r in bm25_topk(p, ["b", "c"]).collect()}
    twice = {
        r.doc_id: r.score
        for r in bm25_topk(p, ["b", "c", "c", "b"]).collect()
    }
    assert once == twice  # bag of DISTINCT terms
    assert set(once) == {1, 2, 3}
    # d2 matches both terms; its score is the sum of both contributions
    idf_b, idf_c = _idf(3, 2), _idf(3, 2)
    want_d2 = idf_b * _w(1, 2, 3) + idf_c * _w(1, 2, 3)
    assert once[2] == pytest.approx(want_d2, abs=1e-6)


def test_bm25_tie_break_and_k(spark):
    d = spark.createDataFrame(
        [(i, "x y") for i in range(5)], "doc_id long, text string"
    )
    out = bm25_topk(build_postings(d), ["x"], k=3).collect()
    # identical docs → identical scores → doc_id ascending, first k
    assert [r.doc_id for r in out] == [0, 1, 2]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(build_postings(_docs(spark)), [])


def test_bm25_precomputed_doclens_matches(spark):
    p = build_postings(_docs(spark))
    dl = doc_lengths(p)
    a = sorted(map(tuple, bm25_topk(p, ["b", "c"]).collect()))
    b = sorted(map(tuple, bm25_topk(p, ["b", "c"], doclens=dl).collect()))
    assert a == b


# -------------------------------------------------------- plan shapes
def test_query_term_filter_pushed_to_index_scan(spark, tmp_path):
    """Querying a WRITTEN index must push the term IN-filter into the
    parquet scan (candidate pruning at the source) and take the top-k
    without a global sort exchange."""
    idx = str(tmp_path / "idx")
    build_postings(_docs(spark)).write.parquet(idx)
    p = spark.read.parquet(idx)
    out = bm25_topk(p, ["b", "c"], k=5, doclens=doc_lengths(p))
    plan = audit.physical_plan(out)
    assert "In(term" in audit.pushed_filters(out), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert audit.broadcast_join_count(out) >= 2  # df_t and N/avgdl


# ------------------------------------------------- incremental index
def test_index_add_batch_parity_and_dedup(spark):
    from ocrd_segment_spark.operators.index import index_add_batch

    old = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    base = build_postings(old)
    batch = spark.createDataFrame(
        [
            (2, "zzz corrupted rearrival"),  # already indexed: skipped
            (3, "c d"),
            (3, "~ c d"),  # within-batch dup: min-text copy wins
            (4, "d"),
        ],
        "doc_id long, text string",
    )
    delta = index_add_batch(base, batch)
    got = {(r.term, r.doc_id): r.tf for r in delta.collect()}
    assert got == {("c", 3): 1, ("d", 3): 1, ("d", 4): 1}
    # old ∪ delta == from-scratch over old corpus + fresh docs
    full = build_postings(
        old.unionAll(
            spark.createDataFrame(
                [(3, "c d"), (4, "d")], "doc_id long, text string"
            )
        )
    )
    merged = base.unionAll(delta)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_index_add_batch_indexed_ids_artifact(spark):
    from ocrd_segment_spark.operators.index import index_add_batch

    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    base = build_postings(old)
    batch = spark.createDataFrame(
        [(1, "a"), (5, "e")], "doc_id long, text string"
    )
    via_ids = index_add_batch(
        base, batch, indexed_ids=doc_lengths(base)
    )
    assert {(r.term, r.doc_id) for r in via_ids.collect()} == {("e", 5)}


def test_positional_postings_and_phrase_search(spark):
    from ocrd_segment_spark.operators.index import (
        build_positional_postings,
        doc_lengths,
        build_postings,
        phrase_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "new york new york city"),
            (2, "york new is reversed"),
            (3, "new  york"),  # double space: empties dropped, still adjacent
            (4, "New York uppercase folds"),
            (5, "new not york apart"),
        ],
        "doc_id long, text string",
    )
    pos = build_positional_postings(docs)
    # consistency with the tf index: count(*) per doc == dl
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(build_postings(docs)).collect()}
    cnt = {r["doc_id"]: r["n"] for r in pos.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert cnt == dl

    got = [
        (r["doc_id"], r["n_matches"])
        for r in phrase_topk(pos, ["new", "york"], k=10).collect()
    ]
    assert got == [(1, 2), (3, 1), (4, 1)]  # overlapless double count, gap/reversal excluded

    # overlapping self-phrase: 'a a a' has two overlapping 'a a' matches
    rep = spark.createDataFrame([(9, "a a a")], "doc_id long, text string")
    got2 = phrase_topk(build_positional_postings(rep), ["a", "a"]).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in got2] == [(9, 2)]

    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_topk(pos, [])
