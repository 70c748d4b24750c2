"""Subword token counting (operators/bpe): the JVM fold, the Python
reference tokenizer, and the DuckDB recursive-CTE oracle are three
statements of ONE frozen greedy longest-match rule."""

import duckdb
import pytest

from ocrd_segment_spark.operators.bpe import (
    VOCAB,
    oracle_sql,
    tokenize_word,
    with_bpe_counts,
)


def test_greedy_longest_match_examples():
    # 'the' matches as one 3-piece, not t+h+e
    assert tokenize_word("the") == ["the"]
    # longest-first: at position 2 'atio' (4) beats 'at' (2)
    assert tokenize_word("nation") == ["n", "atio", "n"]
    # unk: characters outside the vocabulary consume one position each
    assert tokenize_word("cafè") == ["ca", "f", "<unk:è>"]
    assert tokenize_word("знн") == ["<unk:з>", "<unk:н>", "<unk:н>"]
    # punctuation is 1-char vocabulary
    assert tokenize_word("end.") == ["en", "d", "."]


def test_vocab_is_deduplicated_and_bounded():
    assert len(set(VOCAB)) == len(VOCAB)
    assert all(1 <= len(p) <= 4 for p in VOCAB)


def test_spark_counts_equal_python_reference(spark):
    texts = [
        "The Quick brown fox jumps over the lazy dog",
        "internationalization and documentation",
        "mixed CASE with    runs\tand\nnewlines",
        "ünïcödé wörds пример 漢字",
        "",
        "   ",
        "punctuation, everywhere! (really?)",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_unk_pieces"])
        for r in with_bpe_counts(df).collect()
    }
    import re
    import string

    fold = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[ \t\n\r\f\v]+", t.translate(fold)) if w]
        pieces = [p for w in words for p in tokenize_word(w)]
        n_unk = sum(1 for p in pieces if p.startswith("<unk:"))
        assert got[i] == (len(pieces), n_unk), (t, got[i], pieces)


def test_spark_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = with_bpe_counts(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_oracle_matches_python_reference(tmp_path):
    """The recursive CTE alone (no Spark): exact counts on crafted
    words, so an oracle regression cannot hide behind the typed gate's
    sampling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["the nation", "cafè end.", "", "ünïcödé 漢字 mix"]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}), p
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    rows = {
        r[0]: (r[1], r[2])
        for r in con.execute(oracle_sql()).fetchall()
    }
    import re
    import string

    fold = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[ \t\n\r\f\v]+", t.translate(fold)) if w]
        pieces = [pc for w in words for pc in tokenize_word(w)]
        n_unk = sum(1 for pc in pieces if pc.startswith("<unk:"))
        assert rows[i] == (len(pieces), n_unk), (t, rows[i])


def test_loaded_vocabulary_drives_the_fold(spark, tmp_path):
    """Round-5 task 3: the vocabulary is data, not a constant — a
    piece table loaded from parquet drives the fold, CASE arms and max
    piece length derive from the lengths actually present (here
    1/2/5 — no length-3/4 arms), and counts pin exactly against the
    Python reference AND the DuckDB oracle built from the same
    loaded vocab."""
    from ocrd_segment_spark.operators.bpe import load_vocab

    # exotic length set incl. a 5-char piece; 'TIONS' arrives
    # uppercase (loader must fold), ' bad ' carries whitespace
    # (loader must drop), 'er' is duplicated (loader must dedup)
    pieces = ["a", "b", "c", "n", "o", "t", "i", "s", "er",
              "TIONS", "er", " bad ", ""]
    vp = str(tmp_path / "vocab")
    spark.createDataFrame([(p,) for p in pieces], "piece string") \
        .write.parquet(vp)
    vocab = load_vocab(spark, vp)
    assert vocab == ("a", "b", "c", "er", "i", "n", "o", "s", "t", "tions")
    assert sorted({len(p) for p in vocab}, reverse=True) == [5, 2, 1]

    # greedy with the LOADED lengths: 'nations' = n+a+tions (the
    # 5-piece wins over t+i+o+n+s), 'winter' = unk(w)+i+n+t+er
    assert tokenize_word("nations", vocab) == ["n", "a", "tions"]
    assert tokenize_word("winter", vocab) == ["<unk:w>", "i", "n", "t", "er"]

    rows = [(1, "Nations obit winter"), (2, "tions tions x"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_unk_pieces"])
        for r in with_bpe_counts(df, vocab=vocab).collect()
    }
    # doc1: nations=3, obit=o+b+i+t=4, winter=5 (1 unk) → 12 tokens
    # doc2: tions+tions+x → 1+1+1 tokens, x is unk
    assert got == {1: (12, 1), 2: (3, 1), 3: (0, 0)}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES (1, 'Nations obit winter'),"
        " (2, 'tions tions x'), (3, NULL)) t(doc_id, text)"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            oracle_sql(table="d", vocab=vocab)
        ).fetchall()
    }
    assert oracle == got


def test_train_merges_distributed_equals_driver(spark):
    from ocrd_segment_spark.operators.bpe import train_merges

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "wider wide widest lower"),
            (4, "Tab\tand\nnewline   spaced"),
        ],
        "doc_id long, text string",
    )
    d = [tuple(r) for r in train_merges(docs, 8).collect()]
    v = [tuple(r) for r in train_merges(docs, 8, via="driver").collect()]
    assert d == v
    assert len(d) == 8
    # ranks are 1..8 and every merged piece is lhs+rhs
    assert [r[0] for r in d] == list(range(1, 9))
    assert all(r[3] == r[1] + r[2] for r in d)


def test_train_merges_first_merge_is_hand_checkable(spark):
    from ocrd_segment_spark.operators.bpe import train_merges

    # 'aaab' x3: pairs (a,a)x2 per word = 6, (a,b) = 3 → (a,a) wins;
    # round 2 applies left-to-right non-overlap: aa|ab → (aa,ab)? no:
    # seq after merge = [aa, a, b] → pairs (aa,a)=3, (a,b)=3 → tie,
    # lhs 'a' < 'aa' → (a,b) wins round 2.
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in train_merges(docs, 2).collect()
    ]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 3)]


def test_train_merges_early_stop_and_errors(spark):
    from ocrd_segment_spark.operators.bpe import train_merges

    single = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    assert train_merges(single, 5).count() == 0  # no pairs anywhere
    with pytest.raises(ValueError):
        train_merges(single, 0)
    with pytest.raises(ValueError):
        train_merges(single, 3, via="sideways")


def test_train_merges_max_words_cap(spark):
    from ocrd_segment_spark.operators.bpe import train_merges

    docs = spark.createDataFrame(
        [(1, "zz zz zz qq qq xy")], "doc_id long, text string"
    )
    # cap to the single most frequent word: only 'zz' survives
    got = [tuple(r) for r in train_merges(docs, 1, max_words=1).collect()]
    assert got == [(1, "z", "z", "zz", 3)]
    assert got == [
        tuple(r)
        for r in train_merges(docs, 1, via="driver", max_words=1).collect()
    ]


def test_trained_merges_feed_the_meter(spark):
    from ocrd_segment_spark.operators.bpe import (
        merges_to_vocab,
        oracle_sql,
        train_merges,
        with_bpe_counts,
    )

    train = spark.createDataFrame(
        [(1, "banana bandana banana"), (2, "ban ban banana")],
        "doc_id long, text string",
    )
    vocab = merges_to_vocab(train_merges(train, 3))
    assert any(len(p) > 1 for p in vocab)  # learned pieces present

    probe = spark.createDataFrame(
        [(1, "Banana band"), (2, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_unk_pieces"])
        for r in with_bpe_counts(probe, vocab=vocab).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES (1, 'Banana band'),"
        " (2, '')) t(doc_id, text)"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(oracle_sql(table="d", vocab=vocab)).fetchall()
    }
    assert oracle == got
    assert got[2] == (0, 0)


def test_train_merges_suffix_boundary_regression(spark):
    """Review-found: a flat string replace of lhs+SEP+rhs also matches
    when lhs is a proper suffix of the preceding multi-char symbol
    ([ab, c] must NOT satisfy a (b, c) merge). The run-parity array
    application must track the driver loop exactly — including the
    lhs == rhs run case, where greedy non-overlap skips alternate
    positions."""
    from ocrd_segment_spark.operators.bpe import train_merges

    docs = spark.createDataFrame(
        [(1, "ab ab ab abc zbc zbc")], "doc_id long, text string"
    )
    d = [tuple(r) for r in train_merges(docs, 4).collect()]
    assert d == [tuple(r) for r in train_merges(docs, 4, via="driver").collect()]
    assert d == [
        (1, "a", "b", "ab", 4),
        (2, "b", "c", "bc", 2),  # must NOT glue 'ab|c' into 'abc' here
        (3, "z", "bc", "zbc", 2),
        (4, "ab", "c", "abc", 1),
    ]

    runs = spark.createDataFrame(
        [(1, "aaaa aaaaa aa a")], "doc_id long, text string"
    )
    d2 = [tuple(r) for r in train_merges(runs, 3).collect()]
    assert d2 == [tuple(r) for r in train_merges(runs, 3, via="driver").collect()]
    assert d2[0] == (1, "a", "a", "aa", 8)
    assert d2[1] == (2, "aa", "aa", "aaaa", 2)  # greedy pairs, not aaa
