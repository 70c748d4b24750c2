"""RSS/Atom feed harvesting (operators/feeds)."""

from ocrd_segment_spark.operators.feeds import feed_entries

RSS = (
    '<?xml version="1.0"?>\n'
    '<rss version="2.0"><channel>\n'
    "<title>chan</title><link>https://a.org/</link>\n"
    "<item>\n<title>post one</title>\n"
    "<link> https://a.org/p/1 </link>\n"
    "<pubDate>2024-01-05</pubDate>\n</item>\n"
    "<item><link>https://a.org/p/2</link><title></title></item>\n"
    "<item><link>https://a.org/p/1</link>"
    "<pubDate>2025-09-09</pubDate><title>zzz later</title></item>\n"
    "<item><link>/rel/7</link><title>rel post</title></item>\n"
    "<item><link>mailto:x@a.org</link><title>m</title></item>\n"
    "<item><link></link><title>ghost</title></item>\n"
    "</channel></rss>\n<!-- mirrors <feed> -->"
)
ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom">\n'
    "<title>feed</title>\n"
    "<entry>\n<title>entry zero</title>\n"
    '<link rel="alternate" href="https://a.org/e/0"/>\n'
    "<updated>2024-02-07</updated>\n</entry>\n"
    '<entry xml:lang="en"><link href=" https://a.org/e/1 "/></entry>\n'
    "</feed>\n<!-- <rss inside comment -->"
)


def _rows(spark, *bodies):
    df = spark.createDataFrame(
        [("a.org", b.encode()) for b in bodies], "host string, body binary"
    )
    return {
        (r["link"], r["kind"]): (r["published"], r["title"])
        for r in feed_entries(df).collect()
    }


def test_rss_items_trim_nulls_dedupe(spark):
    got = _rows(spark, RSS)
    assert got == {
        # duplicate link: field-wise MIN keeps the earlier date AND the
        # lexicographic-min title independently (SQL aggregate semantics)
        ("https://a.org/p/1", "rss"): ("2024-01-05", "post one"),
        # empty title and absent pubDate are NULL; empty link row dropped
        ("https://a.org/p/2", "rss"): (None, None),
        # host-relative link rebased on the feed host; mailto dropped
        ("https://a.org/rel/7", "rss"): (None, "rel post"),
    }


def test_atom_attribute_links(spark):
    got = _rows(spark, ATOM)
    assert got == {
        ("https://a.org/e/0", "atom"): ("2024-02-07", "entry zero"),
        # href whitespace trimmed; no <updated>/<title> -> NULLs
        ("https://a.org/e/1", "atom"): (None, None),
    }


def test_kind_precedence_is_first_occurrence(spark):
    # a '<feed' comment BEFORE the '<rss' root resolves to atom (the
    # frozen first-occurrence rule, same discipline as sitemap
    # urlset-vs-index): no <entry> blocks exist, so zero rows.
    tricky = "<!-- syndication: <feed --> " + RSS.split("\n<!--")[0]
    assert _rows(spark, tricky) == {}
    # trailing mentions (already inside the fixtures) change nothing:
    # RSS body carries '<feed' in a comment, ATOM carries '<rss'.
    assert len(_rows(spark, RSS)) == 3
    assert len(_rows(spark, ATOM)) == 2


def test_non_feed_bodies_yield_no_rows(spark):
    assert _rows(spark, "<html>not a feed</html>") == {}


def test_mixed_batch_keeps_host_grain(spark):
    df = spark.createDataFrame(
        [("a.org", RSS.encode()), ("b.org", RSS.encode())],
        "host string, body binary",
    )
    out = feed_entries(df).collect()
    assert len(out) == 6
    assert {r["host"] for r in out} == {"a.org", "b.org"}
