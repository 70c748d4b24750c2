"""URL template mining (operators/urltraps)."""

from pyspark.sql import functions as F

from ocrd_segment_spark.operators.urltraps import (
    template_stats,
    trap_templates,
    url_template,
)


def _tpl(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["t"] for r in df.select(url_template("url").alias("t")).collect()]


def test_templatization_rules(spark):
    got = _tpl(
        spark,
        "https://a.org/cal/2024/11?page=3",
        "https://a.org/item/0123456789abcdef0123/x",
        "https://a.org/p13q/abc1234#frag",
        "https://a.org/s?b=2&a=1",
        "https://a.org/s?a=9&b=0&a=dup",
        "https://b.org?flag&x=3",
        "https://b.org/plain",
    )
    assert got == [
        "a.org/cal/{d}/{d}?page",
        # 20-char lowercase-hex run -> {x}
        "a.org/item/{x}/x",
        # sub-8 hex run keeps its letters; digits still fold; frag drops
        "a.org/p{d}q/abc{d}",
        # query names sorted + deduped, values dropped
        "a.org/s?a&b",
        "a.org/s?a&b",
        # bare host -> '/'; value-less flag param keeps its name
        "b.org/?flag&x",
        "b.org/plain",
    ]


def test_trap_mining_and_stats(spark):
    urls = [f"https://t.org/cal/{y}/{m}" for y in range(3) for m in range(4)]
    urls += ["https://t.org/about", "https://t.org/contact"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    stats = {r["template"]: (r["n_urls"], r["exemplar"])
             for r in template_stats(df).collect()}
    assert stats["t.org/cal/{d}/{d}"] == (12, "https://t.org/cal/0/0")
    assert stats["t.org/about"] == (1, "https://t.org/about")
    traps = trap_templates(df, min_urls=10).collect()
    assert [t["template"] for t in traps] == ["t.org/cal/{d}/{d}"]
