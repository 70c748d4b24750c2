"""Script-mix stats: frozen ranges, argmax tie order, confusables."""

from ocrd_segment_spark.operators.scriptmix import (
    MIN_LETTERS,
    script_mix_summary,
    with_script_mix,
)


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    return script_mix_summary(df).collect()[0]


def test_pure_scripts(spark):
    r = _one(spark, "Съешь же ещё этих мягких французских булок")
    assert r.main_script == "cyrillic" and r.main_fraction == 1.0
    assert not r.mixed_script and r.confusable_pairs == 0
    r = _one(spark, "中文网页的正文内容提取质量评估与重复检测流程说明文档")
    assert r.main_script == "han" and not r.mixed_script


def test_homoglyph_spoof(spark):
    # Cyrillic а (U+0430) inside Latin words: confusable adjacencies
    spoof = "Login to pаypаl com and verify your аccount bаlаnce now"
    r = _one(spark, spoof)
    assert r.main_script == "latin"
    # non-overlapping scan: each embedded а joins exactly one pair
    assert r.confusable_pairs == 5
    assert r.mixed_script


def test_no_letters_is_null(spark):
    r = _one(spark, "12345 !!! --- 67890")
    assert r.n_letters == 0
    assert r.main_script is None and r.main_fraction is None
    assert r.mixed_script is False


def test_tiny_fragment_never_mixed(spark):
    # 50/50 split but below the letter floor
    r = _one(spark, "abc где")
    assert r.n_letters < MIN_LETTERS and not r.mixed_script


def test_tie_breaks_by_declaration_order(spark):
    # equal latin and cyrillic counts: latin is declared first
    r = _one(spark, "abcde " + "вгдеж ")
    assert r.main_script == "latin"


def test_null_text(spark):
    df = spark.createDataFrame([(0, None)], "doc_id int, text string")
    r = script_mix_summary(df).collect()[0]
    assert r.n_letters == 0 and r.main_script is None


def test_per_script_counts_present(spark):
    df = spark.createDataFrame(
        [(0, "ab где 中 が 가")], "doc_id int, text string"
    )
    r = with_script_mix(df).collect()[0]
    assert (r.n_latin, r.n_cyrillic, r.n_han, r.n_kana, r.n_hangul) == (
        2, 3, 1, 1, 1,
    )
    assert r.n_letters == 8


def test_host_script_flags(spark):
    from ocrd_segment_spark.functions.urls import with_host_script_flags

    rows = [
        (0, "example.com"),
        (1, "XN--80ak6aa92e.com"),
        (2, "pаypаl.com"),
        (3, "почта.рф"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, host string")
    got = {
        r.doc_id: (r.is_punycode, r.confusable_host)
        for r in with_host_script_flags(df).collect()
    }
    assert got[0] == (False, False)
    assert got[1] == (True, False)  # case-folded ACE prefix
    assert got[2] == (False, True)  # homoglyph label
    assert got[3] == (False, False)  # pure Cyrillic is legit
    assert got[4] == (False, False)  # NULL host
