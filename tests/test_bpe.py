"""Subword token counting (operators/bpe): the JVM fold, the Python
reference tokenizer, and the DuckDB recursive-CTE oracle are three
statements of ONE frozen greedy longest-match rule."""

import duckdb

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
