"""Cross-engine fuzz parity for the round-4 frozen-rule operators.

The typed contract gate proves Spark == DuckDB on the sf0.01 corpus,
but that data is ASCII-ish; these tests replay the same oracle SQL
against ~250 seeded adversarial strings (CJK, Cyrillic, Arabic,
combining marks, emoji / supplementary-plane, exotic whitespace incl.
NEL/LS/PS, digit runs, empty) — the inputs where code-point vs
UTF-16-unit vs byte semantics diverge between engines if any frozen
rule leaks an engine-specific behavior. The url/pii chains already
have this treatment (test_corpus_quality); langid and bpe get it here.
"""

import random

import duckdb
import pyarrow as pa


def _fuzz_texts(n=250, seed=1234):
    rng = random.Random(seed)
    pools = [
        "abcdefghij ",
        "the and of to in er on at ",
        "äöüßéèñçà ",
        "привет мир слово ",
        "数据处理系统文档 ",
        "こんにちは世界の ",
        "مرحبا بالعالم كلمة ",
        "0123456789.,!?#@ ",
        "\t\n\x0b\x0c\r \x85   ",
        "".join(chr(c) for c in (0x0301, 0x030A, 0x0308)),  # combining
        "😀🚀🌍🎉",  # supplementary plane
        "ABCDEFG HIJK ",
    ]
    texts = ["", " ", "\t\n", "a", "😀", "e" + chr(0x0301)]
    while len(texts) < n:
        parts = []
        for _ in range(rng.randint(1, 6)):
            pool = rng.choice(pools)
            parts.append(
                "".join(rng.choice(pool) for _ in range(rng.randint(1, 25)))
            )
        texts.append("".join(parts))
    return texts


def _duck_with_docs(texts):
    con = duckdb.connect()
    con.register(
        "fuzz", pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM fuzz")
    return con


def test_langid_oracle_parity_on_fuzz(spark):
    from ocrd_segment_spark.contract_ml import O_LANG_ID_NGRAM
    from ocrd_segment_spark.operators.langid import with_lang_ngram

    texts = _fuzz_texts()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["pred_lang"], r["lang_logp"])
        for r in with_lang_ngram(df).collect()
    }
    con = _duck_with_docs(texts)
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(O_LANG_ID_NGRAM).fetchall()
    }
    assert len(got) == len(want) == len(texts)
    bad = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])


def test_char_entropy_oracle_parity_on_fuzz(spark):
    """Also re-proves the lambda-bound entropy rewrite is value-exact
    on adversarial input, not just on the sf0.01 gate data."""
    from ocrd_segment_spark.contract_ml import O_CHAR_ENTROPY
    from ocrd_segment_spark.operators.textstats import with_char_entropy

    texts = [t for t in _fuzz_texts(seed=42)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars_text"], r["char_entropy"])
        for r in with_char_entropy(df).selectExpr(
            "doc_id", "cast(length(text) as bigint) as n_chars_text",
            "char_entropy"
        ).collect()
    }
    con = _duck_with_docs(texts)
    want = {r[0]: (r[1], r[2]) for r in con.execute(O_CHAR_ENTROPY).fetchall()}
    bad = {i: (got[i], want[i], repr(texts[i])[:60])
           for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])


def test_corpus_card_oracle_parity_on_fuzz(spark):
    """The card's token counts use the explicit ASCII whitespace class
    — this is what catches a \\s slip (Java's includes U+000B)."""
    from ocrd_segment_spark.contract_ml import O_CORPUS_CARD
    from ocrd_segment_spark.operators.langid import with_lang_ngram
    from ocrd_segment_spark.operators.textstats import corpus_card

    texts = _fuzz_texts(seed=9)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["lang"]: (r["n_docs"], r["total_tokens"], r["total_chars"],
                    r["mean_chars"], r["median_chars"])
        for r in corpus_card(with_lang_ngram(df), lang_col="pred_lang").collect()
    }
    con = _duck_with_docs(texts)
    want = {
        r[0]: tuple(r[1:]) for r in con.execute(O_CORPUS_CARD).fetchall()
    }
    assert got == want


def test_bpe_oracle_parity_on_fuzz(spark):
    from ocrd_segment_spark.operators.bpe import oracle_sql, with_bpe_counts

    texts = _fuzz_texts(seed=777)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_unk_pieces"])
        for r in with_bpe_counts(df).collect()
    }
    con = _duck_with_docs(texts)
    want = {r[0]: (r[1], r[2]) for r in con.execute(oracle_sql()).fetchall()}
    assert len(got) == len(want) == len(texts)
    bad = {i: (got[i], want[i], repr(texts[i])[:80])
           for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])


def test_quality_clf_oracle_parity_on_fuzz(spark):
    """Round-5: the learned classifier's normalize + hash-bucket +
    fold + round-6 logit must agree cross-engine on adversarial
    unicode (code-point hashing, exotic whitespace incl. NEL, empty
    and combining-mark inputs)."""
    from ocrd_segment_spark.contract_ml import O_QUALITY_CLF
    from ocrd_segment_spark.operators.quality_clf import (
        with_quality_classifier,
    )

    texts = _fuzz_texts()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clf_logit"], r["clf_keep"])
        for r in with_quality_classifier(df).collect()
    }
    con = _duck_with_docs(texts)
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(O_QUALITY_CLF).fetchall()
    }
    assert len(got) == len(want) == len(texts)
    bad = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])


def test_token_budget_oracle_parity_on_fuzz(spark):
    """The budget operators' bucket/scramble arithmetic and running
    sums must agree cross-engine when keys are adversarial STRINGS
    (the hash folds code points; engines must bucket identically)."""
    from ocrd_segment_spark.contract_ml import _D_STR_HASH, P
    from ocrd_segment_spark.operators.sampling import token_budget_sample

    texts = [t for t in _fuzz_texts(120) if t]  # NULL-free string keys
    rows = [(t, (i * 37) % 23 + 1) for i, t in enumerate(dict.fromkeys(texts))]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    got = sorted(
        r["doc_id"] for r in token_budget_sample(df, 700).collect()
    )
    con = duckdb.connect()
    con.register(
        "d0",
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "n_tokens": [r[1] for r in rows],
            }
        ),
    )
    bucket = (
        "(("
        + _D_STR_HASH.format(s="concat('budget', doc_id)")
        + f") * 48271 + 11) % {P} % 1000000"
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
WITH d AS (SELECT doc_id, n_tokens, {bucket} AS b FROM d0),
c AS (SELECT doc_id, sum(n_tokens) OVER (ORDER BY b, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum FROM d)
SELECT doc_id FROM c WHERE cum <= 700
"""
        ).fetchall()
    )
    assert got == want and 0 < len(got) < len(rows)


def test_url_template_oracle_parity_on_fuzz(spark):
    """The trap-templatization chain is pure regex/string math on both
    engines; replay it over adversarial urls (unicode path segments,
    uppercase hex that must NOT fold, repeated ?/#/&/=, schemeless
    strings) — exactly where char-class and split semantics diverge
    if the frozen rule leaks anything engine-specific."""
    from ocrd_segment_spark.contract_ingest import D_URL_TEMPLATE_CHAIN
    from ocrd_segment_spark.operators.urltraps import url_template

    rng = random.Random(99)
    segs = [
        "abc", "0123456789abcdef", "DEADBEEF00", "p13q", "数据",
        "café", "a-b_c.d", "123", "x" * 30, "", "fe80cafe",
    ]
    qparts = ["a=1", "b", "=v", "a=1&a=2", "&&", "x=й", "page=7",
              "", "sort=desc&page=3"]
    urls = [
        "https://h.org/plain",
        "https://h.org",
        "http://UP.example.ORG/Case/1",
        "no-scheme-at-all/with/123",
        "https://h.org/p?#frag?fake",
        "https://h.org/a#b#c",
    ]
    while len(urls) < 200:
        path = "/" + "/".join(
            rng.choice(segs) for _ in range(rng.randint(0, 4))
        )
        q = "&".join(rng.choice(qparts) for _ in range(rng.randint(0, 3)))
        frag = "#f1" if rng.random() < 0.3 else ""
        urls.append(f"https://h{rng.randrange(5)}.org{path}"
                    + (f"?{q}" if q else "") + frag)

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = sorted(
        (r["url"], r["t"])
        for r in df.select("url", url_template("url").alias("t")).collect()
    )
    con = duckdb.connect()
    con.register("fuzz_urls", pa.table({"url": urls}))
    sql = (
        "WITH u AS (SELECT url FROM fuzz_urls),\n"
        + D_URL_TEMPLATE_CHAIN.strip()
        + "\nSELECT url, template FROM tpl"
    )
    want = sorted(con.execute(sql).fetchall())
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]


def test_cell_cleanup_oracle_parity_on_fuzz(spark):
    """The table/list/heading cleanup chain (tag strip -> 5-entity
    decode with &amp; LAST -> explicit-whitespace collapse incl. NBSP
    and VT) replayed against its DuckDB restatement on adversarial
    markup soup — partial tags, partial entities, double-encoded
    entities, exotic whitespace, unicode."""
    import random

    import pyarrow as pa

    from ocrd_segment_spark.contract_pages import _CLEAN_DUCK
    from ocrd_segment_spark.operators.tables import clean_cell_text
    from pyspark.sql import functions as F

    rng = random.Random(77)
    pools = [
        "plain words here ",
        "<b>", "</b>", "<td class='x'>", "</td>", "<br/>",
        "<a\nhref=\"y\">", "< notag", "tag>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
        "&amp;lt;", "&am", "&;", "&unknown;",
        "\t\n\x0b\x0c\r  ",
        "данные 数据 🚀 ",
    ]
    texts = ["", "<>", "&amp;amp;", "  ", "<td></td>"]
    while len(texts) < 250:
        texts.append(
            "".join(
                rng.choice(pools)
                for _ in range(rng.randint(1, 10))
            )
        )
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, cell string"
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", clean_cell_text(F.col("cell")).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "cells", pa.table({"doc_id": list(range(len(texts))), "cell": texts})
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {_CLEAN_DUCK} AS c FROM cells"
        ).fetchall()
    }
    bad = {i: (got[i], want[i], repr(texts[i])[:60])
           for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])
