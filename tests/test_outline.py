"""Heading outline: levels, cleanup, parent derivation, resets."""

from ocrd_segment_spark.operators.outline import heading_outline


def _rows(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    return [
        (r.seq, r.level, r.heading, r.parent_seq)
        for r in heading_outline(df).orderBy("seq").collect()
    ]


def test_tree_and_reset(spark):
    html = (
        "<h1>Top</h1><p>x</p><H2 class='a'>Sec &amp; One</H2><h3>Deep</h3>"
        "<h2>Sec Two</h2><h3>D2</h3><h1>Part II</h1><h3>skips h2</h3>"
    )
    assert _rows(spark, html) == [
        (0, 1, "Top", None),
        (1, 2, "Sec & One", 0),
        (2, 3, "Deep", 1),
        (3, 2, "Sec Two", 0),
        (4, 3, "D2", 3),
        (5, 1, "Part II", None),
        # the stale h2 (seq 3) precedes the reset h1 (seq 5): h1 wins
        (6, 3, "skips h2", 5),
    ]


def test_orphan_deep_heading(spark):
    # first heading is h3: nothing smaller precedes it → NULL parent
    assert _rows(spark, "<h3>lead</h3><h2>up</h2><h3>c</h3>") == [
        (0, 3, "lead", None),
        (1, 2, "up", None),
        (2, 3, "c", 1),
    ]


def test_level_gap(spark):
    assert _rows(spark, "<h1>S</h1><h4>leap</h4>") == [
        (0, 1, "S", None),
        (1, 4, "leap", 0),
    ]


def test_no_headings(spark):
    assert _rows(spark, "<p>none</p>") == []


def test_inner_markup_stripped(spark):
    got = _rows(spark, "<h2><em>Styled</em>\n  title&nbsp;here</h2>")
    assert got == [(0, 2, "Styled title here", None)]
