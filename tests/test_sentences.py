"""Span-preserving sentence segmentation (operators/sentences)."""

from ocrd_segment_spark.operators.sentences import sentence_spans


def _rows(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        (r["sent_idx"], r["start"], r["end"], r["sentence"])
        for r in sentence_spans(df).orderBy("sent_idx").collect()
    ]


def test_basic_split_spans(spark):
    #       0123456789012345678
    text = "Hi there. Next one."
    assert _rows(spark, text) == [
        (0, 0, 9, "Hi there."),
        (1, 10, 19, "Next one."),
    ]


def test_spans_slice_back_to_original(spark):
    text = "One two?!  Three four. five six. Seven!"
    for _, s, e, sent in _rows(spark, text):
        assert text[s:e] == sent


def test_terminator_run_splits_after_last(spark):
    text = "Wow?! Next"
    assert _rows(spark, text) == [(0, 0, 5, "Wow?!"), (1, 6, 10, "Next")]


def test_lowercase_continuation_no_split(spark):
    text = "e.g. this stays. one sentence? yes."
    assert _rows(spark, text) == [(0, 0, len(text), text)]


def test_no_terminal_punctuation_single_sentence(spark):
    assert _rows(spark, "no punctuation at all") == [
        (0, 0, 21, "no punctuation at all")
    ]


def test_empty_and_space_only_yield_no_rows(spark):
    assert _rows(spark, "") == []
    assert _rows(spark, "   ") == []
    assert _rows(spark, None) == []


def test_tab_gap_does_not_split(spark):
    text = "One.\tTwo. Three"
    assert _rows(spark, text) == [
        (0, 0, 9, "One.\tTwo."),
        (1, 10, 15, "Three"),
    ]


def test_multi_id_columns(spark):
    df = spark.createDataFrame(
        [("u1", 0, "A b. C d.")], "url string, part long, text string"
    )
    rows = sentence_spans(df, id_cols=("url", "part")).collect()
    assert {(r["url"], r["part"], r["sentence"]) for r in rows} == {
        ("u1", 0, "A b."),
        ("u1", 0, "C d."),
    }
